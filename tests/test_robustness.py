"""Robustness regressions: the pipeline must degrade gracefully when the
audio does NOT match the template bank's synthesis assumptions (the
real-world condition; measured on-chip at default config: mono F1=1.0,
3-voice F1=0.96 under decay/timbre mismatch)."""

from amt_saga_tpu.evaluation.f1 import corpus_f1
from amt_saga_tpu.runtime.fixtures import make_clip


def _pairs(tr, render_cfg, kind, n, **kw):
    pairs = []
    for s in range(n):
        wave, ref = make_clip(render_cfg, kind=kind, seconds=6.0,
                              seed=700 + s, **kw)
        pairs.append((tr.transcribe(wave), ref))
    return pairs


def test_template_mismatch_decay_and_timbre(tiny_config, tiny_transcriber):
    # Audio rendered with different decay/rolloff/release than the
    # transcriber's bank assumes.
    mismatch = tiny_config.override(**{
        "synth.decay_seconds": 0.45,
        "synth.instrument_rolloffs": [1.4],
        "synth.release_seconds": 0.08,
    })
    r = corpus_f1(_pairs(tiny_transcriber, mismatch, "isol", 3, n_notes=4))
    assert r.f1 >= 0.9, r
    r = corpus_f1(_pairs(tiny_transcriber, mismatch, "mus", 3, n_voices=2))
    assert r.f1 >= 0.75, r


def test_additive_noise(tiny_config, tiny_transcriber):
    r = corpus_f1(_pairs(tiny_transcriber, tiny_config, "isol", 3,
                         n_notes=4, noise=0.01))
    assert r.f1 >= 0.85, r


def test_offgrid_onsets(tiny_config, tiny_transcriber):
    # Onsets NOT on frame boundaries (make_clip snaps; shift the waveform
    # by a third of a hop instead).
    import numpy as np

    pairs = []
    for s in range(3):
        wave, ref = make_clip(tiny_config, kind="isol", seconds=6.0,
                              n_notes=4, seed=800 + s)
        shift = tiny_config.dsp.hop // 3
        shifted = np.concatenate([np.zeros(shift, np.float32), wave])
        pairs.append((tiny_transcriber.transcribe(shifted),
                      ref.shifted(shift / tiny_config.dsp.sample_rate)))
    r = corpus_f1(pairs)
    assert r.f1 >= 0.85, r
