"""Multi-instrument (MusicNet stand-in) tests — BASELINE config 5.

Joint instrument+pitch classification: the flattened class axis is
q = instrument * n_pitches + pitch throughout (templates, coarse scores,
candidate scoring), so instrument attribution falls out of the same
argmax.  Per-instrument spectral templates differ by harmonic rolloff
(SynthConfig.instrument_rolloffs).
"""

import numpy as np
import pytest

from amt_saga_tpu.config import Config, DSPConfig, LoopConfig, SynthConfig
from amt_saga_tpu.core.midi import notes_to_midi_bytes
from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.golden.pipeline import transcribe_golden
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.saga.loop import Transcriber


@pytest.fixture(scope="module")
def multi_config():
    return Config(
        dsp=DSPConfig(sample_rate=8000, n_fft=512, hop=256, fmin=55.0,
                      bins_per_octave=12, n_bins=72, pad_frames_to=8),
        synth=SynthConfig(pitch_min=36, pitch_max=84, n_harmonics=6,
                          template_frames=40,
                          duration_grid=(0.25, 0.5, 1.0),
                          n_instruments=3,
                          instrument_rolloffs=(0.5, 1.25, 2.5)),
        loop=LoopConfig(max_notes=24),
    )


def test_template_bank_has_instrument_axis(multi_config):
    from amt_saga_tpu.synth.templates import template_bank

    bank = template_bank(multi_config.synth, multi_config.dsp)
    assert bank.shape[0] == 3
    # distinct timbres: the same pitch differs across instruments
    a, b = bank[0, 10, 1], bank[2, 10, 1]
    assert not np.allclose(a, b)


def test_multi_instrument_golden_recovers_programs(multi_config):
    wave, ref = make_clip(multi_config, kind="multi", seconds=5.0,
                          n_voices=2, seed=0, programs=(0, 2))
    res = transcribe_golden(wave, multi_config)
    r = note_f1(res.sequence, ref, with_instrument=True)
    assert r.f1 >= 0.7, (r, res.sequence.to_arrays(), ref.to_arrays())
    # programs actually used
    assert set(n.program for n in ref) == {0, 2}


def test_multi_instrument_tpu_parity(multi_config):
    wave, ref = make_clip(multi_config, kind="multi", seconds=4.0,
                          n_voices=2, seed=1, programs=(0, 2))
    tr = Transcriber(multi_config)
    pred = tr.transcribe(wave)
    gold = transcribe_golden(wave, multi_config).sequence
    assert notes_to_midi_bytes(pred) == notes_to_midi_bytes(gold)
    r = note_f1(pred, ref, with_instrument=True)
    assert r.f1 >= 0.7, r


def test_instrument_confusion_penalized(multi_config):
    # Scoring with the *wrong* instrument's template bank must lose to the
    # right one: isolated single-instrument clip, check attribution.
    wave, ref = make_clip(multi_config, kind="isol", seconds=3.0,
                          n_notes=3, seed=2)  # program 0 by default
    res = transcribe_golden(wave, multi_config)
    progs = res.programs[:res.count]
    assert np.all(progs == 0), progs


def test_classifier_q_axis_covers_instruments(multi_config):
    import jax

    from amt_saga_tpu.models.classifier import build_classifier, init_params

    params = init_params(multi_config, jax.random.PRNGKey(0))
    model = build_classifier(multi_config)
    spec = np.zeros((1, 16, multi_config.dsp.n_bins), np.float32)
    out = model.apply({"params": params}, spec)
    n_q = 3 * multi_config.synth.n_pitches
    assert out["onset_pitch"].shape[-1] == n_q


def test_multi_instrument_cli_end_to_end(multi_config, tmp_path):
    """fixtures --kind multi -> transcribe-corpus -> evaluate --instrument."""
    import json
    import os

    from amt_saga_tpu.cli import main

    cfg_file = tmp_path / "cfg.json"
    cfg_file.write_text(multi_config.to_json())
    args = ["--config", str(cfg_file)]
    fx = str(tmp_path / "fx")
    out = str(tmp_path / "out")
    assert main(["fixtures", fx, "--kind", "multi", "--clips", "2",
                 "--seconds", "4.0"] + args) == 0
    assert main(["transcribe-corpus", fx, out,
                 "--set", "run.batch_size=2"] + args) == 0
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["evaluate", out, fx, "--instrument"] + args) == 0
    rec = json.loads(buf.getvalue())
    assert rec["f1"] >= 0.6, rec


def test_instrument_reselection_in_joint_refit(multi_config):
    """The joint power-domain refit re-selects each note's instrument
    against the pristine spectrogram with neighbors' energy explained
    (core.notes.refit_gains_programs_host): instrument-criterion F1 must
    be at least as good as with the refit disabled (measured +2 pts on
    2-instrument golden fixtures), with pitch/onset decisions
    untouched."""
    from amt_saga_tpu.evaluation.f1 import corpus_f1

    cfg = multi_config
    tr = Transcriber(cfg)
    off = Transcriber(cfg.override(**{"loop.refit_gains": False}))
    pw, pn = [], []
    for s in range(3):
        wave, ref = make_clip(cfg, kind="multi", seconds=5.0,
                              n_voices=2, seed=40 + s, programs=(0, 2))
        pw.append((tr.transcribe(wave), ref))
        pn.append((off.transcribe(wave), ref))
    with_r = corpus_f1(pw, with_instrument=True)
    no_r = corpus_f1(pn, with_instrument=True)
    assert with_r.f1 >= no_r.f1, (with_r, no_r)
    # pitch-level results unchanged by the emission-side re-selection
    assert corpus_f1(pw).n_match == corpus_f1(pn).n_match
