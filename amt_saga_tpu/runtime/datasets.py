"""Real-corpus format ingestion: MAPS, MAESTRO, MusicNet (SURVEY.md C10-C12).

:mod:`.corpus` is corpus-SHAPED (any ``<name>.wav`` + ``<name>.mid``
directory); this module is corpus-SPECIFIC: it understands the three
reference corpora's on-disk conventions so an untouched download tree
works day-1 with no hand conversion:

* **MusicNet** — ``{train,test}_data/<id>.wav`` paired with
  ``{train,test}_labels/<id>.csv`` note labels (columns
  ``start_time,end_time,instrument,note,...``; times are SAMPLE indices
  at the 44.1 kHz release rate, instrument is a 1-based MIDI program).
  ``read_musicnet_csv`` converts one CSV to a :class:`NoteSequence`.
* **MAESTRO v1-v3** — a ``maestro-v*.json`` (v3: columnar dict-of-dicts;
  v2: list of row dicts) or ``maestro-v*.csv`` metadata file defining the
  official train/validation/test splits and the relative
  ``audio_filename``/``midi_filename`` of each performance.
* **MAPS** — nested ``<instrument>/<subset>/...`` directories of
  ``MAPS_<SUBSET>_..._<instrumentID>.wav`` + same-name ``.mid`` pairs;
  the conventional evaluation split holds out the two Disklavier
  instruments (ENSTDkCl, ENSTDkAm) as test.

Every loader returns a :class:`~.corpus.PairedCorpus`, so training,
example generation, and corpus transcription run on real trees exactly
like on synthetic fixtures.  No reference file citations are possible —
the reference mount was empty (SURVEY.md §0); the format conventions
above are the corpora's own public release conventions.
"""

from __future__ import annotations

import csv
import glob
import json
import os

from ..core.notes import NoteSequence
from .corpus import CorpusItem, PairedCorpus, corpus_from_items

MUSICNET_SAMPLE_RATE = 44100  # the release's fixed audio + label rate

# MAPS instrument IDs recorded on a real Disklavier; the conventional
# train/test split evaluates on these and trains on the synthesized rest.
MAPS_REAL_INSTRUMENTS = ("ENSTDkCl", "ENSTDkAm")


def read_musicnet_csv(path: str,
                      sample_rate: int = MUSICNET_SAMPLE_RATE,
                      default_velocity: int = 96) -> NoteSequence:
    """One MusicNet label CSV -> NoteSequence.

    ``start_time``/``end_time`` are sample indices at the release rate;
    ``instrument`` is a 1-based MIDI program (1 = Acoustic Grand Piano);
    ``note`` is the MIDI pitch.  Velocity is not part of the labels.
    """
    seq = NoteSequence()
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        cols = set(reader.fieldnames or ())
        missing = {"start_time", "end_time", "note"} - cols
        if missing:
            raise ValueError(
                f"{path}: not a MusicNet label CSV (missing columns "
                f"{sorted(missing)})")
        for row in reader:
            onset = float(row["start_time"]) / sample_rate
            dur = (float(row["end_time"]) - float(row["start_time"])
                   ) / sample_rate
            program = max(0, int(row.get("instrument") or 1) - 1)
            seq.add(onset, max(dur, 0.0), int(row["note"]),
                    default_velocity, program)
    return seq.sorted()


def open_musicnet(root: str, split: str = "train") -> PairedCorpus:
    """MusicNet release tree -> PairedCorpus of one split.

    Expects ``<root>/{split}_data/<id>.wav`` + ``<root>/{split}_labels/
    <id>.csv`` (the release layout).  ``split`` is ``train`` or ``test``.
    """
    data_dir = os.path.join(root, f"{split}_data")
    label_dir = os.path.join(root, f"{split}_labels")
    items = []
    for wav in sorted(glob.glob(os.path.join(data_dir, "*.wav"))):
        name = os.path.splitext(os.path.basename(wav))[0]
        label = os.path.join(label_dir, name + ".csv")
        if not os.path.exists(label):
            continue
        items.append(CorpusItem(name=name, wav_path=wav, midi_path=None,
                                label_path=label,
                                label_format="musicnet_csv", split=split))
    if not items:
        raise FileNotFoundError(
            f"no MusicNet (wav, csv) pairs under {data_dir!r} / "
            f"{label_dir!r}")
    return corpus_from_items(root, items)


def _maestro_records(meta_path: str) -> list[dict]:
    """Parse MAESTRO metadata (v3 columnar JSON, v2 list JSON, or CSV)."""
    if meta_path.endswith(".csv"):
        with open(meta_path, newline="") as f:
            return list(csv.DictReader(f))
    with open(meta_path) as f:
        meta = json.load(f)
    if isinstance(meta, list):  # v1/v2: list of row dicts
        return meta
    # v3: columnar {"split": {"0": "train", ...}, "midi_filename": {...}}
    cols = list(meta.keys())
    row_ids = list(meta[cols[0]].keys())
    return [{c: meta[c][rid] for c in cols} for rid in row_ids]


def open_maestro(root: str, split: str | None = "train",
                 meta_path: str | None = None) -> PairedCorpus:
    """MAESTRO release tree -> PairedCorpus of one official split.

    ``split`` is ``train`` / ``validation`` / ``test``, or None for all.
    The metadata file is auto-discovered (``maestro-v*.json`` preferred,
    then ``.csv``) unless given.  Items whose audio is missing on disk
    (e.g. a MIDI-only download) are skipped.
    """
    if meta_path is None:
        cands = (sorted(glob.glob(os.path.join(root, "maestro-v*.json")))
                 or sorted(glob.glob(os.path.join(root, "maestro-v*.csv"))))
        if not cands:
            raise FileNotFoundError(
                f"no maestro-v*.json/csv metadata under {root!r}")
        meta_path = cands[-1]  # newest version
    items = []
    for rec in _maestro_records(meta_path):
        if split is not None and rec.get("split") != split:
            continue
        wav = os.path.join(root, rec["audio_filename"])
        mid = os.path.join(root, rec["midi_filename"])
        if not (os.path.exists(wav) and os.path.exists(mid)):
            continue
        name = os.path.splitext(
            os.path.basename(rec["audio_filename"]))[0]
        items.append(CorpusItem(name=name, wav_path=wav, midi_path=mid,
                                split=rec.get("split")))
    if not items:
        raise FileNotFoundError(
            f"no MAESTRO items for split={split!r} with audio+MIDI on "
            f"disk under {root!r} ({meta_path})")
    return corpus_from_items(root, items)


def maps_name_fields(filename: str) -> tuple[str | None, str | None]:
    """``MAPS_<SUBSET>_..._<instrumentID>.wav`` -> (subset, instrument)."""
    base = os.path.splitext(os.path.basename(filename))[0]
    parts = base.split("_")
    if len(parts) < 3 or parts[0] != "MAPS":
        return None, None
    return parts[1], parts[-1]


def open_maps(root: str, *, subsets: tuple[str, ...] | None = None,
              instruments: tuple[str, ...] | None = None,
              split: str | None = None) -> PairedCorpus:
    """MAPS release tree -> PairedCorpus.

    Walks ``<root>/**/MAPS_*.wav`` recursively, pairs each with its
    same-name ``.mid``, and tags items with the subset (ISOL / RAND /
    UCHO / MUS) and instrument ID parsed from the MAPS naming convention.

    * ``subsets`` / ``instruments``: optional include filters.
    * ``split``: ``"train"`` keeps the synthesized instruments,
      ``"test"`` keeps the real Disklavier ones (ENSTDkCl / ENSTDkAm) —
      the conventional MAPS evaluation protocol.  None keeps all.
    """
    items = []
    for wav in sorted(glob.glob(os.path.join(root, "**", "MAPS_*.wav"),
                                recursive=True)):
        base = os.path.splitext(wav)[0]
        mid = next((base + ext for ext in (".mid", ".midi")
                    if os.path.exists(base + ext)), None)
        if mid is None:
            continue
        subset, instrument = maps_name_fields(wav)
        if subset is None:
            continue
        if subsets is not None and subset not in subsets:
            continue
        if instruments is not None and instrument not in instruments:
            continue
        is_test = instrument in MAPS_REAL_INSTRUMENTS
        if split == "train" and is_test:
            continue
        if split == "test" and not is_test:
            continue
        items.append(CorpusItem(
            name=os.path.basename(base), wav_path=wav, midi_path=mid,
            split="test" if is_test else "train"))
    if not items:
        raise FileNotFoundError(
            f"no MAPS_*.wav + .mid pairs under {root!r} matching "
            f"subsets={subsets} instruments={instruments} split={split}")
    return corpus_from_items(root, items)


def open_corpus(root: str, fmt: str = "paired",
                split: str | None = None) -> PairedCorpus:
    """Factory: one entry point for every supported on-disk format.

    fmt: ``paired`` (flat wav+mid directory), ``musicnet``, ``maestro``,
    ``maps``.  ``split`` selects the corpus's official split where one
    exists (defaults: musicnet/maestro ``train``, maps all).
    """
    if fmt == "paired":
        return PairedCorpus(root)
    if fmt == "musicnet":
        return open_musicnet(root, split or "train")
    if fmt == "maestro":
        return open_maestro(root, split or "train")
    if fmt == "maps":
        return open_maps(root, split=split)
    raise ValueError(
        f"unknown corpus format {fmt!r} "
        "(expected paired|musicnet|maestro|maps)")
