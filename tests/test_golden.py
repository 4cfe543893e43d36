"""Golden CPU pipeline end-to-end tests (SURVEY.md §4.1, §4.3).

The golden path is the parity oracle: on clean synthetic fixtures it must
recover every note exactly (F1 = 1.0 with exact pitch/onset/velocity),
because the fixture audio is rendered by the same synthesizer the
templates come from.
"""

import numpy as np

from amt_saga_tpu.core.midi import midi_bytes_to_notes, notes_to_midi_bytes
from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.golden.pipeline import transcribe_golden
from amt_saga_tpu.runtime.fixtures import make_clip


def test_isol_monophonic_exact(tiny_config):
    wave, ref = make_clip(tiny_config, kind="isol", seconds=6.0,
                          n_notes=5, seed=0)
    res = transcribe_golden(wave, tiny_config)
    r = note_f1(res.sequence, ref)
    assert r.f1 == 1.0, (res.sequence.to_arrays(), ref.to_arrays())
    # Exact recovery: onsets on the frame grid, durations on the grid.
    pred = res.sequence.sorted().notes
    for p, g in zip(pred, ref.sorted().notes):
        assert p.pitch == g.pitch
        assert abs(p.onset - g.onset) < 1e-6
        assert p.velocity == g.velocity


def test_polyphonic_mus(tiny_config):
    wave, ref = make_clip(tiny_config, kind="mus", seconds=6.0,
                          n_voices=2, seed=1)
    res = transcribe_golden(wave, tiny_config)
    r = note_f1(res.sequence, ref)
    assert r.f1 >= 0.75, (r, ref.to_arrays(), res.sequence.to_arrays())


def test_residual_is_silent_after_transcription(tiny_config):
    wave, _ = make_clip(tiny_config, kind="isol", seconds=4.0,
                        n_notes=3, seed=2)
    res = transcribe_golden(wave, tiny_config)
    # Residual energy below the silence threshold relative to the input.
    from amt_saga_tpu.golden.dsp_np import spectrogram_np
    e0 = float(np.sum(np.square(spectrogram_np(wave, tiny_config.dsp))))
    assert res.residual_energy <= tiny_config.loop.silence_rel * e0 * 1.5


def test_silence_yields_no_notes(tiny_config):
    wave = np.zeros(tiny_config.dsp.sample_rate * 2, dtype=np.float32)
    res = transcribe_golden(wave, tiny_config)
    assert res.count == 0


def test_midi_emission_roundtrip(tiny_config):
    wave, ref = make_clip(tiny_config, kind="isol", seconds=4.0,
                          n_notes=3, seed=3)
    res = transcribe_golden(wave, tiny_config)
    data = notes_to_midi_bytes(res.sequence)
    back = midi_bytes_to_notes(data)
    r = note_f1(back, ref)
    assert r.f1 == 1.0


def test_duration_selection_not_fooled_by_clamping(tiny_config):
    # Regression: without the over-subtraction penalty, a 0.5s note scored
    # as well under the 1.0s template (clamped over-subtraction is free),
    # picking the wrong duration and leaving a spurious leftover note.
    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.runtime.fixtures import render_notes

    cfg = tiny_config
    truth = NoteSequence()
    truth.add(0.128, 0.5, 60, 80, 0)  # off-grid velocity, dur on grid
    wave = render_notes(truth, cfg, cfg.dsp.sample_rate * 2)
    res = transcribe_golden(wave, cfg)
    assert res.count == 1
    note = res.sequence.notes[0]
    assert note.pitch == 60
    assert abs(note.duration - 0.5) < 0.1  # picked the 0.5s template
    assert abs(note.velocity - 80) <= 1
