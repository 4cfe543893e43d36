"""On-disk dataset loaders (SURVEY.md C10-C12).

The reference ships MAPS / MAESTRO / MusicNet loaders.  Those corpora are
not downloadable in this environment (SURVEY.md §4.3), so the loader here
is CORPUS-SHAPED rather than corpus-specific: any directory of paired
``<name>.wav`` + ``<name>.mid`` files loads the same way — which covers
MAPS (audio+MIDI pairs), MAESTRO v3 (audio+MIDI, long recordings; combine
with :mod:`amt_saga_tpu.stream`), MusicNet (audio + per-note labels
convertible to MIDI), and the synthetic fixture corpora produced by
``python -m amt_saga_tpu fixtures``.

Provides deterministic train/test splits and training-example batches
whose labels come from the paired MIDI (via this package's own SMF
parser), so the classifier can be trained on real corpora exactly like on
fixtures.
"""

from __future__ import annotations

import glob
import hashlib
import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..config import Config
from ..core.midi import read_midi
from ..core.notes import NoteSequence
from ..dsp.audio import load_wav, pad_to_length
from ..golden.dsp_np import spectrogram_np
from .examples import ExampleBatch, _labels_for


@dataclass(frozen=True)
class CorpusItem:
    name: str
    wav_path: str
    midi_path: str | None
    # Real-corpus extensions (runtime/datasets.py): MusicNet labels come
    # as CSV, MAPS/MAESTRO define official splits.
    label_path: str | None = None      # defaults to midi_path
    label_format: str = "midi"         # "midi" | "musicnet_csv"
    split: str | None = None           # official split tag, if any


class PairedCorpus:
    """Directory of <name>.wav [+ <name>.mid] pairs."""

    def __init__(self, root: str, *, require_midi: bool = True):
        self.root = root
        items = []
        for wav in sorted(glob.glob(os.path.join(root, "*.wav"))):
            base = os.path.splitext(wav)[0]
            mid = None
            for ext in (".mid", ".midi"):
                if os.path.exists(base + ext):
                    mid = base + ext
                    break
            if mid is None and require_midi:
                continue
            items.append(CorpusItem(os.path.basename(base), wav, mid))
        if not items:
            raise FileNotFoundError(
                f"no {'paired' if require_midi else ''} WAV files in "
                f"{root!r}")
        self.items = items

    def __len__(self) -> int:
        return len(self.items)

    def split(self, test_fraction: float = 0.2
              ) -> tuple["PairedCorpus", "PairedCorpus"]:
        """Deterministic content-addressed train/test split (stable under
        re-listing and across machines: hash of the item name)."""
        train, test = [], []
        for it in self.items:
            h = int(hashlib.sha1(it.name.encode()).hexdigest(), 16)
            (test if (h % 1000) < test_fraction * 1000 else train).append(it)
        return (_from_items(self.root, train), _from_items(self.root, test))

    def load(self, item: CorpusItem, cfg: Config
             ) -> tuple[np.ndarray, NoteSequence | None]:
        wave, _ = load_wav(item.wav_path, cfg.dsp.sample_rate)
        return wave, load_labels(item)

    def iter_waves(self, cfg: Config, *, batch_size: int,
                   n_samples: int | None = None
                   ) -> Iterator[tuple[list[CorpusItem], np.ndarray]]:
        """Fixed-shape waveform batches (zero-padded), for transcription."""
        if n_samples is None:
            n_samples = max(
                len(load_wav(it.wav_path, cfg.dsp.sample_rate)[0])
                for it in self.items)
        for i in range(0, len(self.items), batch_size):
            chunk = self.items[i:i + batch_size]
            waves = np.stack([
                pad_to_length(load_wav(it.wav_path, cfg.dsp.sample_rate)[0],
                              n_samples)
                for it in chunk])
            if len(chunk) < batch_size:
                waves = np.concatenate([
                    waves, np.zeros((batch_size - len(chunk), n_samples),
                                    np.float32)])
            yield chunk, waves

    def example_batches(self, cfg: Config, *, batch_size: int,
                        seconds: float, seed: int = 0
                        ) -> Iterator[ExampleBatch]:
        """Training batches with labels from the paired MIDI files.

        Random fixed-length crops (frame-aligned) of each recording; the
        label maps are built from notes whose onsets fall in the crop.
        """
        rng = np.random.default_rng(seed)
        n_crop = int(round(seconds * cfg.dsp.sample_rate))
        while True:
            specs, ops, durs, pres, vels = [], [], [], [], []
            for _ in range(batch_size):
                it = self.items[int(rng.integers(len(self.items)))]
                wave, ref = self.load(it, cfg)
                if ref is None:
                    raise ValueError(f"{it.name} has no MIDI labels")
                if len(wave) > n_crop:
                    start = int(rng.integers(
                        0, (len(wave) - n_crop) // cfg.dsp.hop + 1)
                    ) * cfg.dsp.hop
                else:
                    start = 0
                crop = pad_to_length(wave[start:start + n_crop], n_crop)
                t0 = start / cfg.dsp.sample_rate
                local = NoteSequence([
                    n for n in ref.shifted(-t0)
                    if 0 <= n.onset < seconds
                ])
                spec = spectrogram_np(crop, cfg.dsp)
                op, du, pr, ve = _labels_for(local, cfg, spec.shape[0])
                specs.append(spec)
                ops.append(op)
                durs.append(du)
                pres.append(pr)
                vels.append(ve)
            yield ExampleBatch(
                spec=np.stack(specs), onset_pitch=np.stack(ops),
                duration=np.stack(durs), presence=np.stack(pres),
                velocity=np.stack(vels))


def load_labels(item: CorpusItem) -> NoteSequence | None:
    """Ground-truth NoteSequence for an item, whatever its label format."""
    if item.label_format == "musicnet_csv":
        from .datasets import read_musicnet_csv

        if item.label_path is None:
            raise ValueError(f"{item.name}: musicnet_csv needs label_path")
        return read_musicnet_csv(item.label_path)
    path = item.label_path or item.midi_path
    return read_midi(path) if path else None


def corpus_from_items(root: str, items: list[CorpusItem]) -> PairedCorpus:
    """Build a PairedCorpus from an explicit item list (format loaders in
    runtime/datasets.py construct their corpora through this)."""
    if not items:
        raise FileNotFoundError(f"no corpus items under {root!r}")
    c = PairedCorpus.__new__(PairedCorpus)
    c.root = root
    c.items = items
    return c


_from_items = corpus_from_items  # back-compat alias (split() uses it)
