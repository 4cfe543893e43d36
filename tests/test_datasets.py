"""Real-corpus format ingestion tests (SURVEY.md C10-C12).

Each test synthesizes a tiny on-disk tree in the EXACT release layout of
the corpus (MusicNet sample-indexed CSVs, MAESTRO metadata JSON/CSV with
official splits, MAPS nested naming convention) and checks the loaders
feed the existing PairedCorpus machinery.
"""

import json
import os

import numpy as np
import pytest

from amt_saga_tpu.core.midi import write_midi
from amt_saga_tpu.core.notes import NoteSequence
from amt_saga_tpu.dsp.audio import save_wav
from amt_saga_tpu.runtime.corpus import load_labels
from amt_saga_tpu.runtime.datasets import (
    MUSICNET_SAMPLE_RATE,
    maps_name_fields,
    open_corpus,
    open_maestro,
    open_maps,
    open_musicnet,
    read_musicnet_csv,
)


def _tone(seconds: float, sr: int) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return (0.3 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def _ref_sequence() -> NoteSequence:
    seq = NoteSequence()
    seq.add(0.25, 0.5, 60, 96, 0)
    seq.add(1.0, 0.25, 64, 96, 40)  # violin-ish program
    return seq.sorted()


# ---------------------------------------------------------------- MusicNet

@pytest.fixture()
def musicnet_root(tmp_path):
    root = tmp_path / "musicnet"
    for split, name in [("train", "1727"), ("test", "2303")]:
        (root / f"{split}_data").mkdir(parents=True)
        (root / f"{split}_labels").mkdir(parents=True)
        save_wav(str(root / f"{split}_data" / f"{name}.wav"),
                 _tone(1.5, MUSICNET_SAMPLE_RATE), MUSICNET_SAMPLE_RATE)
        rows = ["start_time,end_time,instrument,note,start_beat,"
                "end_beat,note_value"]
        for n in _ref_sequence():
            s = int(round(n.onset * MUSICNET_SAMPLE_RATE))
            e = int(round(n.offset * MUSICNET_SAMPLE_RATE))
            rows.append(f"{s},{e},{n.program + 1},{n.pitch},0,0,Quarter")
        (root / f"{split}_labels" / f"{name}.csv").write_text(
            "\n".join(rows) + "\n")
    return str(root)


def test_musicnet_csv_roundtrip(musicnet_root):
    seq = read_musicnet_csv(
        os.path.join(musicnet_root, "train_labels", "1727.csv"))
    ref = _ref_sequence()
    assert len(seq) == len(ref)
    for got, want in zip(seq, ref):
        assert got.pitch == want.pitch
        assert got.program == want.program
        assert abs(got.onset - want.onset) < 1e-4
        assert abs(got.duration - want.duration) < 1e-4


def test_musicnet_corpus(musicnet_root, tiny_config):
    corpus = open_musicnet(musicnet_root, "train")
    assert len(corpus) == 1 and corpus.items[0].name == "1727"
    assert corpus.items[0].label_format == "musicnet_csv"
    wave, ref = corpus.load(corpus.items[0], tiny_config)
    assert len(wave) > 0 and ref is not None and len(ref) == 2
    # test split is separate
    assert open_musicnet(musicnet_root, "test").items[0].name == "2303"


def test_musicnet_example_batches(musicnet_root, tiny_config):
    corpus = open_musicnet(musicnet_root, "train")
    eb = next(corpus.example_batches(tiny_config, batch_size=2,
                                     seconds=1.0, seed=0))
    assert eb.spec.shape[0] == 2
    assert np.isfinite(eb.spec).all()


# ----------------------------------------------------------------- MAESTRO

@pytest.fixture(params=["json_v3", "json_v2", "csv"])
def maestro_root(tmp_path, request, tiny_config):
    root = tmp_path / "maestro-v3.0.0"
    sr = tiny_config.dsp.sample_rate
    records = []
    for i, split in enumerate(["train", "validation", "test"]):
        rel_wav = f"2018/piece_{i}.wav"
        rel_mid = f"2018/piece_{i}.midi"
        (root / "2018").mkdir(parents=True, exist_ok=True)
        save_wav(str(root / rel_wav), _tone(1.0, sr), sr)
        write_midi(str(root / rel_mid), _ref_sequence())
        records.append({
            "canonical_composer": "Test", "canonical_title": f"Piece {i}",
            "split": split, "year": 2018, "midi_filename": rel_mid,
            "audio_filename": rel_wav, "duration": 1.0,
        })
    if request.param == "json_v3":  # columnar dict-of-dicts
        cols = records[0].keys()
        meta = {c: {str(i): r[c] for i, r in enumerate(records)}
                for c in cols}
        (root / "maestro-v3.0.0.json").write_text(json.dumps(meta))
    elif request.param == "json_v2":  # list of row dicts
        (root / "maestro-v2.0.0.json").write_text(json.dumps(records))
    else:
        import csv as _csv
        with open(root / "maestro-v3.0.0.csv", "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(records[0].keys()))
            w.writeheader()
            w.writerows(records)
    return str(root)


def test_maestro_official_splits(maestro_root, tiny_config):
    train = open_maestro(maestro_root, "train")
    assert len(train) == 1 and train.items[0].split == "train"
    test = open_maestro(maestro_root, "test")
    assert test.items[0].name == "piece_2"
    everything = open_maestro(maestro_root, None)
    assert len(everything) == 3
    wave, ref = train.load(train.items[0], tiny_config)
    assert len(ref) == 2


# -------------------------------------------------------------------- MAPS

@pytest.fixture()
def maps_root(tmp_path, tiny_config):
    root = tmp_path / "MAPS"
    sr = tiny_config.dsp.sample_rate
    layout = [
        ("AkPnBcht/MUS", "MAPS_MUS-chpn_op7_1_AkPnBcht"),
        ("AkPnBcht/ISOL/NO", "MAPS_ISOL_NO_F_S0_M60_AkPnBcht"),
        ("ENSTDkCl/MUS", "MAPS_MUS-bk_xmas1_ENSTDkCl"),
    ]
    for sub, base in layout:
        d = root / sub
        d.mkdir(parents=True, exist_ok=True)
        save_wav(str(d / f"{base}.wav"), _tone(0.5, sr), sr)
        write_midi(str(d / f"{base}.mid"), _ref_sequence())
    return str(root)


def test_maps_name_fields():
    assert maps_name_fields("MAPS_ISOL_NO_F_S0_M60_AkPnBcht.wav") == (
        "ISOL", "AkPnBcht")
    assert maps_name_fields("MAPS_MUS-chpn_op7_1_ENSTDkCl.wav") == (
        "MUS-chpn", "ENSTDkCl")
    assert maps_name_fields("whatever.wav") == (None, None)


def test_maps_walker_and_split(maps_root):
    everything = open_maps(maps_root)
    assert len(everything) == 3
    train = open_maps(maps_root, split="train")
    assert len(train) == 2
    assert all(it.split == "train" for it in train.items)
    test = open_maps(maps_root, split="test")
    assert len(test) == 1 and "ENSTDkCl" in test.items[0].name
    isol = open_maps(maps_root, subsets=("ISOL",))
    assert len(isol) == 1


def test_maps_labels_load(maps_root):
    corpus = open_maps(maps_root, split="test")
    ref = load_labels(corpus.items[0])
    assert len(ref) == 2 and ref.notes[0].pitch == 60


# ----------------------------------------------------------------- factory

def test_open_corpus_factory(maps_root):
    assert len(open_corpus(maps_root, "maps")) == 3
    with pytest.raises(ValueError):
        open_corpus(maps_root, "nope")


# --------------------------------------- evaluate on native label formats

def _cfg_file(tmp_path, tiny_config):
    p = tmp_path / "tiny.json"
    p.write_text(tiny_config.to_json())
    return str(p)


def test_evaluate_musicnet_roundtrip(musicnet_root, tmp_path, tiny_config,
                                     capsys):
    """transcribe-corpus --format musicnet -> evaluate --format musicnet
    with zero hand conversion (round-2 verdict item #8)."""
    from amt_saga_tpu.cli import main

    cfg = _cfg_file(tmp_path, tiny_config)
    out = str(tmp_path / "pred")
    assert main(["transcribe-corpus", musicnet_root, out,
                 "--format", "musicnet", "--split", "train",
                 "--set", "run.batch_size=1", "--config", cfg]) == 0
    assert os.path.exists(os.path.join(out, "1727.mid"))
    assert main(["evaluate", out, musicnet_root, "--format", "musicnet",
                 "--split", "train", "--config", cfg]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_clips"] == 1
    assert rec["n_ref"] == 2  # CSV labels became the reference


@pytest.mark.parametrize("maestro_root", ["json_v3"], indirect=True)
def test_evaluate_maestro_refs(maestro_root, tmp_path, tiny_config,
                               capsys):
    """evaluate --format maestro discovers references via the metadata
    (no flat ref-MIDI directory needed)."""
    import shutil

    from amt_saga_tpu.cli import main

    cfg = _cfg_file(tmp_path, tiny_config)
    # Perfect predictions: copy each item's own reference MIDI.
    corpus = open_maestro(maestro_root, "test")
    pred = tmp_path / "pred"
    pred.mkdir()
    for it in corpus.items:
        shutil.copy(it.midi_path, pred / (it.name + ".mid"))
    assert main(["evaluate", str(pred), maestro_root, "--format",
                 "maestro", "--split", "test", "--config", cfg]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["f1"] == 1.0 and rec["n_clips"] == 1
