"""recover_absent (saga/snap.py): emission-side recovery of notes the
loop's subtraction absorbed — the function contract, independent of the
loop: given a pre sequence MISSING a note that audibly sounds in the
wave, the scan finds it; given a complete sequence, it adds nothing
(fail-closed)."""

import numpy as np

from amt_saga_tpu.core.notes import NoteSequence
from amt_saga_tpu.runtime.fixtures import render_notes
from amt_saga_tpu.saga.snap import recover_absent


def _cfg_on(tiny_config):
    return tiny_config.override(**{"loop.recover_absent": True})


def test_recovers_missing_note(tiny_config):
    cfg = _cfg_on(tiny_config)
    truth = NoteSequence()
    truth.add(0.15, 1.0, 60, 100, 0)     # loud, emitted
    truth.add(0.50, 0.5, 67, 70, 0)      # quiet, "absorbed" (not emitted)
    wave = render_notes(truth, cfg, cfg.dsp.sample_rate * 2)

    pre = NoteSequence()
    pre.add(0.15, 1.0, 60, 100, 0)
    out, n = recover_absent(pre, wave, cfg)
    assert n == 1
    rec = [m for m in out.notes if m.pitch == 67]
    assert len(rec) == 1
    assert abs(rec[0].onset - 0.50) <= 0.07
    assert rec[0].program == 0
    assert rec[0].velocity >= 30    # implied gain well above the floor


def test_complete_sequence_adds_nothing(tiny_config):
    cfg = _cfg_on(tiny_config)
    truth = NoteSequence()
    truth.add(0.15, 1.0, 60, 100, 0)
    truth.add(0.50, 0.5, 67, 70, 0)
    wave = render_notes(truth, cfg, cfg.dsp.sample_rate * 2)
    out, n = recover_absent(truth, wave, cfg)
    assert n == 0
    assert out is truth


def test_nothing_to_recover_adds_nothing(tiny_config):
    cfg = _cfg_on(tiny_config)
    pre = NoteSequence()
    pre.add(0.15, 1.0, 60, 100, 0)
    wave = render_notes(pre, cfg, cfg.dsp.sample_rate * 2)
    out, n = recover_absent(pre, wave, cfg)
    assert n == 0


def test_disabled_is_identity(tiny_config):
    # Explicitly OFF: the default flipped to True in round 3, so the
    # disabled-identity contract must be pinned by an override.
    cfg = tiny_config.override(**{"loop.recover_absent": False})
    pre = NoteSequence()
    pre.add(0.15, 1.0, 60, 100, 0)
    wave = render_notes(pre, cfg, cfg.dsp.sample_rate * 2)
    out, n = recover_absent(pre, wave, cfg)
    assert n == 0 and out is pre


def test_noise_only_adds_nothing(tiny_config):
    """Fail-closed on content with no harmonic structure: the emitted
    note explains its own regions and white noise must not produce
    sustained template-shaped rises that pass every gate."""
    cfg = _cfg_on(tiny_config)
    pre = NoteSequence()
    pre.add(0.15, 1.0, 60, 100, 0)
    wave = render_notes(pre, cfg, cfg.dsp.sample_rate * 2)
    rng = np.random.default_rng(7)
    noisy = wave + 0.01 * rng.standard_normal(wave.shape).astype(
        wave.dtype)
    out, n = recover_absent(pre, noisy, cfg)
    assert n == 0
