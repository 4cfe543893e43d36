"""Emission-side onset snap (saga/snap.py): rule, guards, parity.

The snap repairs onsets fired gross-early by a harmonically-related
masker's onset (SURVEY.md C9 emission stage).  These tests pin:
the vectorized spectrogram's bit-identity with the golden reference
framing, the snap firing on a genuine octave-masked early onset, every
guard failing closed, and TPU/golden MIDI parity on a clip where the
snap fires.
"""

import numpy as np
import pytest

from amt_saga_tpu import default_config
from amt_saga_tpu.core.notes import Note, NoteSequence
from amt_saga_tpu.golden.dsp_np import spectrogram_np
from amt_saga_tpu.golden.pipeline import transcribe_golden
from amt_saga_tpu.runtime.fixtures import make_corpus, render_notes
from amt_saga_tpu.saga.snap import snap_onsets, snap_spectrogram


@pytest.fixture(scope="module")
def cfg():
    return default_config()


def test_snap_spectrogram_bit_identical_to_golden(cfg):
    """The stride-tricks + batched-rfft spectrogram must equal the
    golden per-frame loop BIT-FOR-BIT — the parity argument rests on
    both emission paths computing the identical array."""
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(cfg.dsp.sample_rate * 2).astype(np.float32)
    a = snap_spectrogram(wave, cfg)
    b = spectrogram_np(wave, cfg.dsp, pad=False)
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def _octave_mask_wave(cfg, low_pitch=64):
    """A long low note whose octave-up neighbor onsets 6 frames
    earlier — the scenario where greedy selection fires the low note at
    the NEIGHBOR's onset.  Onsets are frame-aligned like the loop's."""
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    low_onset = 62 * spf
    ref = NoteSequence()
    ref.add(low_onset - 6 * spf, 0.5, low_pitch + 12, 89, 0)
    ref.add(low_onset, 1.5, low_pitch, 96, 0)
    wave = render_notes(ref.sorted(), cfg, int(5.0 * cfg.dsp.sample_rate))
    return wave, low_onset


def test_snap_fires_on_gross_early_onset(cfg):
    wave, low_onset = _octave_mask_wave(cfg)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    # Claim the low note 6 frames early (at the octave's onset).
    seq = NoteSequence([Note(low_onset - 6 * spf, 1.5 + 6 * spf, 64, 96, 0)])
    out, n = snap_onsets(seq, wave, cfg)
    assert n == 1
    snapped = out.notes[0]
    assert abs(snapped.onset - low_onset) <= spf + 1e-9
    # End of the fitted extent is preserved (duration shrinks).
    assert abs(snapped.offset - (low_onset + 1.5)) <= spf + 1e-9


def test_correct_onset_untouched(cfg):
    wave, low_onset = _octave_mask_wave(cfg)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    seq = NoteSequence([Note(low_onset, 1.5, 64, 96, 0),
                        Note(low_onset - 6 * spf, 0.5, 76, 89, 0)])
    out, n = snap_onsets(seq, wave, cfg)
    assert n == 0
    assert out is seq


def test_same_pitch_guard(cfg):
    """A same-pitch emission inside the window means the rise is
    already explained — the early note must stay untouched."""
    wave, low_onset = _octave_mask_wave(cfg)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    early = Note(low_onset - 6 * spf, 0.4, 64, 96, 0)
    later = Note(low_onset, 1.0, 64, 96, 0)
    out, n = snap_onsets(NoteSequence([early, later]), wave, cfg)
    assert n == 0


def test_absent_note_untouched(cfg):
    """No fundamental evidence anywhere in the window -> no crossing of
    the expected level -> fail closed."""
    wave = np.zeros(int(3.0 * default_config().dsp.sample_rate),
                    dtype=np.float32)
    seq = NoteSequence([Note(1.0, 0.5, 64, 96, 0)])
    out, n = snap_onsets(seq, wave, cfg)
    assert n == 0


def test_disabled_by_config(cfg):
    wave, low_onset = _octave_mask_wave(cfg)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    seq = NoteSequence([Note(low_onset - 6 * spf, 1.5, 64, 96, 0)])
    c0 = cfg.override(**{"loop.onset_snap_frames": 0})
    out, n = snap_onsets(seq, wave, c0)
    assert n == 0


def test_golden_snap_fixes_octave_masked_onset(cfg):
    """On the pinned 4-voice fixture whose clip 2 contains the measured
    octave-mask failure (pitch 64 fired at its octave's onset 2.528
    instead of 2.720), the golden pipeline with the snap emits the
    correct onset."""
    clips = make_corpus(cfg, kind="mus", n_clips=3, seconds=10.0,
                        seed=1234, n_voices=4)
    wave, ref = clips[2]
    seq = transcribe_golden(np.asarray(wave), cfg).sequence
    hits = [n for n in seq if n.pitch == 64
            and abs(n.onset - 2.720) <= 0.05]
    assert hits, "snap should land pitch 64 at its true onset 2.720"
    off = transcribe_golden(
        np.asarray(wave),
        cfg.override(**{"loop.onset_snap_frames": 0})).sequence
    early = [n for n in off if n.pitch == 64
             and abs(n.onset - 2.528) <= 0.02]
    assert early, "without the snap the onset stays at the masker's"


def test_tpu_golden_parity_with_snap(cfg):
    """Bit-for-bit MIDI parity on a clip where the snap fires (the
    snap is shared host code, so parity must survive it)."""
    from amt_saga_tpu.core.midi import notes_to_midi_bytes
    from amt_saga_tpu.saga.loop import Transcriber

    clips = make_corpus(cfg, kind="mus", n_clips=3, seconds=10.0,
                        seed=1234, n_voices=4)
    wave, _ = clips[2]
    tr = Transcriber(cfg)
    seq_tpu = tr.transcribe(np.asarray(wave))
    seq_gold = transcribe_golden(np.asarray(wave), cfg).sequence
    assert notes_to_midi_bytes(seq_tpu) == notes_to_midi_bytes(seq_gold)
