"""CLI + manifest tests (SURVEY.md C16, §5).

Driven through the real argv surface (cli.main), on the CPU test backend.
"""

import json
import os

import numpy as np
import pytest

from amt_saga_tpu.cli import main
from amt_saga_tpu.runtime.manifest import Manifest


@pytest.fixture(scope="module")
def tiny_cfg_file(tmp_path_factory, tiny_config):
    p = tmp_path_factory.mktemp("cfg") / "tiny.json"
    p.write_text(tiny_config.to_json())
    return str(p)


def _tiny_args(cfg_file):
    return ["--config", cfg_file]


def test_fixtures_and_transcribe_and_evaluate(tmp_path, tiny_cfg_file):
    fx = str(tmp_path / "fx")
    assert main(["fixtures", fx, "--kind", "isol", "--clips", "2",
                 "--seconds", "3.0"] + _tiny_args(tiny_cfg_file)) == 0
    wavs = sorted(os.listdir(fx))
    assert "isol_0000.wav" in wavs and "isol_0000.mid" in wavs

    out = str(tmp_path / "out")
    os.makedirs(out)
    assert main(["transcribe", os.path.join(fx, "isol_0000.wav"),
                 os.path.join(out, "isol_0000.mid"),
                 "--set", "run.batch_size=2"]
                + _tiny_args(tiny_cfg_file)) == 0
    assert os.path.exists(os.path.join(out, "isol_0000.mid"))

    # evaluate predicted vs fixture ground truth
    assert main(["evaluate", out, fx] + _tiny_args(tiny_cfg_file)) == 0


def test_transcribe_corpus_resumable(tmp_path, tiny_cfg_file, capsys):
    fx = str(tmp_path / "fx")
    main(["fixtures", fx, "--kind", "isol", "--clips", "3",
          "--seconds", "2.0"] + _tiny_args(tiny_cfg_file))
    out = str(tmp_path / "mids")
    args = ["transcribe-corpus", fx, out, "--set", "run.batch_size=2"] + \
        _tiny_args(tiny_cfg_file)
    assert main(args) == 0
    mids = [f for f in os.listdir(out) if f.endswith(".mid")]
    assert len(mids) == 3
    man = Manifest(os.path.join(out, "manifest.jsonl"))
    assert man.n_done == 3
    # second run: everything skipped, no recompile/transcribe needed
    assert main(args) == 0
    assert Manifest(os.path.join(out, "manifest.jsonl")).n_done == 3


def test_config_file_and_overrides(tmp_path, tiny_cfg_file):
    from amt_saga_tpu.cli import load_config

    class A:
        config = tiny_cfg_file
        set = ["loop.max_notes=7", "dsp.hop=128"]

    cfg = load_config(A())
    assert cfg.loop.max_notes == 7
    assert cfg.dsp.hop == 128


def test_override_type_validation(tiny_cfg_file):
    """--set values are validated/coerced against the leaf's type.

    Load-bearing regression: json.loads("False") is invalid JSON, so the
    CLI used to store the truthy STRING "False" — silently ENABLING the
    bool it was asked to clear (observed with loop.restrike_split=False
    leaving the splitter on through a measurement run)."""
    from amt_saga_tpu.cli import load_config

    class A:
        config = tiny_cfg_file
        set = ["loop.restrike_split=False", "loop.min_score_rel0=1e-3",
               "dsp.hop=256"]

    cfg = load_config(A())
    assert cfg.loop.restrike_split is False
    assert cfg.loop.min_score_rel0 == 1e-3
    assert cfg.dsp.hop == 256

    class B:
        config = tiny_cfg_file
        set = ["loop.restrike_split=maybe"]

    with pytest.raises(TypeError):
        load_config(B())

    class C:
        config = tiny_cfg_file
        set = ["dsp.hop=fast"]

    with pytest.raises(TypeError):
        load_config(C())


def test_bad_override_key_fails(tiny_cfg_file):
    from amt_saga_tpu.cli import load_config

    class A:
        config = tiny_cfg_file
        set = ["loop.nonexistent=1"]

    with pytest.raises(KeyError):
        load_config(A())


def test_manifest_roundtrip(tmp_path):
    p = str(tmp_path / "m.jsonl")
    m = Manifest(p)
    assert not m.is_done("a.wav")
    m.mark_done("a.wav", notes=3)
    m2 = Manifest(p)
    assert m2.is_done("a.wav") and m2.n_done == 1


def test_selftest(tiny_cfg_file):
    assert main(["selftest", "--seconds", "3.0"]
                + _tiny_args(tiny_cfg_file)) == 0


def test_config_json_roundtrip(tiny_config):
    from amt_saga_tpu.config import Config

    s = tiny_config.to_json()
    back = Config.from_json(s)
    assert back == tiny_config
    assert back.to_json() == s  # canonical serialization


def test_evaluate_empty_dir_fails_cleanly(tmp_path, tiny_cfg_file):
    import pytest

    with pytest.raises(SystemExit, match="no .pred, ref. MIDI pairs"):
        main(["evaluate", str(tmp_path), str(tmp_path)]
             + _tiny_args(tiny_cfg_file))


def test_set_without_equals_fails_cleanly(tiny_cfg_file):
    import pytest

    from amt_saga_tpu.cli import load_config

    class A:
        config = tiny_cfg_file
        set = ["loop.max_notes"]

    with pytest.raises(SystemExit, match="key=value"):
        load_config(A())


def test_config_leaf_field_sharing_subconfig_name(tiny_config):
    """RunConfig.synth shares its name with the top-level synth subconfig;
    from_dict/override must keep the leaf a plain string."""
    cfg = tiny_config.override(**{"run.synth": "neural"})
    assert cfg.run.synth == "neural"
    assert cfg.synth.pitch_min == tiny_config.synth.pitch_min
    from amt_saga_tpu.config import Config

    back = Config.from_json(cfg.to_json())
    assert back.run.synth == "neural"
    assert back == cfg


def test_transcribe_corpus_sharded(tmp_path, tiny_cfg_file):
    """--shard i/n: N invocations cover the corpus disjointly with
    per-shard manifests (multi-host corpus sharding, SURVEY.md §2.4)."""
    fx = str(tmp_path / "fx")
    main(["fixtures", fx, "--kind", "isol", "--clips", "4",
          "--seconds", "2.0"] + _tiny_args(tiny_cfg_file))
    out = str(tmp_path / "mids")
    base = ["transcribe-corpus", fx, out, "--set", "run.batch_size=2"] + \
        _tiny_args(tiny_cfg_file)
    assert main(base + ["--shard", "0/2"]) == 0
    assert main(base + ["--shard", "1/2"]) == 0
    mids = [f for f in os.listdir(out) if f.endswith(".mid")]
    assert len(mids) == 4  # disjoint shards cover everything
    m0 = Manifest(os.path.join(out, "manifest.shard0of2.jsonl"))
    m1 = Manifest(os.path.join(out, "manifest.shard1of2.jsonl"))
    assert m0.n_done == 2 and m1.n_done == 2
    done0 = set(m0.done_keys())
    done1 = set(m1.done_keys())
    assert not done0 & done1  # disjoint ownership

    # Resume regression: shard ownership must be a function of the
    # corpus, not of the not-yet-done remainder.  A shard resumed with a
    # PARTIAL manifest (one of its clips done) must transcribe only its
    # own remaining clip — not re-stride into the other shard's clips.
    out2 = str(tmp_path / "mids2")
    base2 = ["transcribe-corpus", fx, out2, "--set", "run.batch_size=2"] \
        + _tiny_args(tiny_cfg_file)
    os.makedirs(out2)
    part = Manifest(os.path.join(out2, "manifest.shard0of2.jsonl"))
    first0 = sorted(done0)[0]
    part.mark_done(first0, notes=0, output="pre-existing")
    assert main(base2 + ["--shard", "0/2"]) == 0
    m0b = Manifest(os.path.join(out2, "manifest.shard0of2.jsonl"))
    assert set(m0b.done_keys()) == done0  # same ownership as clean run

    with pytest.raises(SystemExit):
        main(base + ["--shard", "2/2"])  # index out of range
    with pytest.raises(SystemExit):
        main(base + ["--shard", "nope"])


def test_corpus_runner_auto_sharded_parity(tmp_path, tiny_cfg_file):
    """transcribe-corpus with zero flags shards over the visible (8
    virtual) devices and still matches the golden oracle byte-for-byte
    (round-2 verdict item #3)."""
    from amt_saga_tpu.cli import load_config
    from amt_saga_tpu.core.midi import notes_to_midi_bytes
    from amt_saga_tpu.dsp.audio import load_wav
    from amt_saga_tpu.golden.pipeline import transcribe_golden

    fx = str(tmp_path / "fx")
    assert main(["fixtures", fx, "--kind", "isol", "--clips", "4",
                 "--seconds", "3.0"] + _tiny_args(tiny_cfg_file)) == 0
    out = str(tmp_path / "out")
    assert main(["transcribe-corpus", fx, out,
                 "--set", "run.batch_size=4"]
                + _tiny_args(tiny_cfg_file)) == 0

    class _A:  # load_config wants an args-like object
        config = tiny_cfg_file
        set = ["run.batch_size=4"]

    cfg = load_config(_A)
    from amt_saga_tpu.dsp.audio import pad_to_length
    from amt_saga_tpu.runtime.bucketing import (
        bucket_for,
        choose_length_buckets,
    )

    quantum = cfg.dsp.hop * cfg.dsp.pad_frames_to
    wavs = [n for n in sorted(os.listdir(fx)) if n.endswith(".wav")]
    waves = {n: load_wav(os.path.join(fx, n), cfg.dsp.sample_rate)[0]
             for n in wavs}
    buckets = choose_length_buckets(
        [len(w) + cfg.dsp.n_fft for w in waves.values()],
        cfg.run.length_buckets, quantum)
    for name, wave in waves.items():
        # Same samples the runner fed: the clip padded to its bucket.
        blen = bucket_for(len(wave) + cfg.dsp.n_fft, buckets, quantum)
        gold = transcribe_golden(pad_to_length(wave, blen), cfg).sequence
        pred = os.path.join(out, name[:-4] + ".mid")
        assert open(pred, "rb").read() == notes_to_midi_bytes(gold)


def test_train_auto_sharded_smoke(tmp_path, tiny_cfg_file, monkeypatch):
    """cmd_train runs the sharded step on the 8-virtual-device backend."""
    monkeypatch.chdir(tmp_path)
    assert main(["train", "--steps", "2",
                 "--set", "train.batch_size=4",
                 "--set", "train.checkpoint_dir=" + str(tmp_path / "ck")]
                + _tiny_args(tiny_cfg_file)) == 0
