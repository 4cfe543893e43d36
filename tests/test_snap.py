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
    golden per-frame loop BIT-FOR-BIT (dense reference path; the
    production chain reads sparse columns — next test)."""
    rng = np.random.default_rng(3)
    wave = rng.standard_normal(cfg.dsp.sample_rate * 2).astype(np.float32)
    a = snap_spectrogram(wave, cfg)
    b = spectrogram_np(wave, cfg.dsp, pad=False)
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def test_sparse_region_reader_matches_dense(cfg):
    """The chain's evidence (sparse per-column dots off the raw STFT
    magnitude, scipy rfft) must agree with dense spectrogram region
    sums to float32 tolerance — parity itself needs only that both
    paths share the code, but the yardsticks (bank region sums) come
    from the dense path, so the two must measure the same quantity."""
    from amt_saga_tpu.saga.snap import _ColCache, snap_stft_mag

    rng = np.random.default_rng(5)
    wave = rng.standard_normal(cfg.dsp.sample_rate * 2).astype(np.float32)
    dense = spectrogram_np(wave, cfg.dsp, pad=False).astype(np.float64)
    ev = _ColCache(snap_stft_mag(wave, cfg), cfg)
    for reg in [(0, 3), (100, 103), (cfg.dsp.n_bins - 3, cfg.dsp.n_bins)]:
        a = ev.region(3, dense.shape[0] - 2, reg)
        b = dense[3:-2, reg[0]:reg[1]].sum(axis=1)
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-4)


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


def test_dedup_twins(cfg):
    from amt_saga_tpu.saga.snap import dedup_twins

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    seq = NoteSequence([Note(64 * spf, 1.0, 60, 99, 0),
                        Note(64 * spf, 0.9, 60, 21, 0),
                        Note(64 * spf, 0.9, 60, 21, 1),   # other program
                        Note(90 * spf, 0.5, 62, 80, 0)])
    out = dedup_twins(seq, cfg)
    assert len(out) == 3
    kept = [n for n in out if n.pitch == 60 and n.program == 0]
    assert len(kept) == 1 and kept[0].velocity == 99


def test_split_recovers_swallowed_restrike(cfg):
    """A loud strike followed by a soft same-pitch re-strike, emitted
    as ONE long note: the split must emit the re-onset."""
    from amt_saga_tpu.saga.snap import split_restrikes

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    on1, on2 = 31 * spf, 47 * spf            # 0.512 s apart
    ref = NoteSequence()
    ref.add(on1, 0.28, 69, 110, 0)
    ref.add(on2, 0.25, 69, 55, 0)
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    swallowed = NoteSequence([Note(on1, 1.5, 69, 110, 0)])
    out, n = split_restrikes(swallowed, wave, cfg)
    assert n == 1
    new = [x for x in out if x.onset > on1 + 0.1]
    assert len(new) == 1
    assert abs(new[0].onset - on2) <= 0.05
    assert new[0].velocity < 110


def test_split_rejects_harmonic_masker(cfg):
    """A sub-octave neighbor onsetting inside the note's extent covers
    every harmonic region — the bank cross-leak attribution must
    reject the would-be split."""
    from amt_saga_tpu.saga.snap import split_restrikes

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    on1, on2 = 31 * spf, 47 * spf
    ref = NoteSequence()
    ref.add(on1, 1.5, 81, 80, 0)
    ref.add(on2, 0.5, 69, 110, 0)            # octave below, loud
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = NoteSequence([Note(on1, 1.5, 81, 80, 0),
                        Note(on2, 0.5, 69, 110, 0)])
    out, n = split_restrikes(seq, wave, cfg)
    assert n == 0


def test_split_covered_guard(cfg):
    """If the re-strike was already emitted as its own note, no split."""
    from amt_saga_tpu.saga.snap import split_restrikes

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    on1, on2 = 31 * spf, 47 * spf
    ref = NoteSequence()
    ref.add(on1, 0.28, 69, 110, 0)
    ref.add(on2, 0.25, 69, 55, 0)
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = NoteSequence([Note(on1, 1.5, 69, 110, 0),
                        Note(on2, 0.25, 69, 55, 0)])
    out, n = split_restrikes(seq, wave, cfg)
    assert n == 0


def test_golden_restrike_recall(cfg):
    """Default-config golden recall on a small etude (loud strike +
    soft re-strikes): the emission split must recover swallowed
    re-onsets that the greedy pursuit alone misses."""
    from amt_saga_tpu.evaluation.f1 import note_f1

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    rng = np.random.default_rng(9)
    ref = NoteSequence()
    t = 0.3
    for pitch in (52, 64, 71, 47):
        ref.add(round(t / spf) * spf, 0.28, pitch, 110, 0)
        t += float(rng.uniform(0.4, 0.6))
        ref.add(round(t / spf) * spf, 0.25, pitch, 50, 0)
        t += float(rng.uniform(0.5, 0.7))
    wave = render_notes(ref.sorted(), cfg, int((t + 1) * cfg.dsp.sample_rate))
    on = note_f1(transcribe_golden(np.asarray(wave), cfg).sequence,
                 ref.sorted())
    off = note_f1(transcribe_golden(
        np.asarray(wave),
        cfg.override(**{"loop.restrike_split": False})).sequence,
        ref.sorted())
    assert on.recall > off.recall, (on.recall, off.recall)
    assert on.precision >= 0.85


def test_tpu_golden_parity_on_etude(cfg):
    """Parity must survive the split chain on re-strike material."""
    from amt_saga_tpu.core.midi import notes_to_midi_bytes
    from amt_saga_tpu.saga.loop import Transcriber

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    t = 0.3
    for pitch in (52, 64):
        for v in (110, 52, 47):
            ref.add(round(t / spf) * spf, 0.26, pitch, v, 0)
            t += 0.45
        t += 0.3
    wave = render_notes(ref.sorted(), cfg, int(4.5 * cfg.dsp.sample_rate))
    tr = Transcriber(cfg)
    assert notes_to_midi_bytes(tr.transcribe(np.asarray(wave))) == \
        notes_to_midi_bytes(transcribe_golden(np.asarray(wave),
                                              cfg).sequence)


def test_reassign_instrument_on_decisive_evidence():
    """An isolated note rendered with instrument 1's rolloff but
    emitted as instrument 0 must be re-picked from onset harmonic
    shape; with the feature disabled it stays."""
    from amt_saga_tpu.saga.snap import reassign_instruments

    cfg = default_config().override(**{
        "synth.n_instruments": 3,
        "synth.instrument_rolloffs": (0.5, 1.25, 2.5),
        "dsp.n_bins": 294,
    })
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(31 * spf, 1.0, 60, 100, 2)     # steep-rolloff instrument
    wave = render_notes(ref.sorted(), cfg, int(3.0 * cfg.dsp.sample_rate))
    wrong = NoteSequence([Note(31 * spf, 1.0, 60, 100, 0)])
    out, n = reassign_instruments(wrong, wave, cfg)
    assert n == 1 and out.notes[0].program == 2
    c0 = cfg.override(**{"loop.instrument_evidence_margin": 0.0})
    out0, n0 = reassign_instruments(wrong, wave, c0)
    assert n0 == 0 and out0.notes[0].program == 0


def test_reassign_untouched_when_correct():
    from amt_saga_tpu.saga.snap import reassign_instruments

    cfg = default_config().override(**{
        "synth.n_instruments": 3,
        "synth.instrument_rolloffs": (0.5, 1.25, 2.5),
        "dsp.n_bins": 294,
    })
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    for i, p in enumerate((48, 64, 79)):
        ref.add((31 + 40 * i) * spf, 0.8, p, 100, i)
    wave = render_notes(ref.sorted(), cfg, int(6.0 * cfg.dsp.sample_rate))
    out, n = reassign_instruments(ref.sorted(), wave, cfg)
    assert n == 0


def test_trim_fires_on_overlong_duration(cfg):
    """A 0.5-s note emitted with a 1.5-s duration must trim to the
    fundamental-decay end."""
    from amt_saga_tpu.saga.snap import trim_offsets

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(31 * spf, 0.5, 64, 96, 0)
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = NoteSequence([Note(31 * spf, 1.5, 64, 96, 0)])
    out, n = trim_offsets(seq, wave, cfg)
    assert n == 1
    assert abs(out.notes[0].duration - 0.5) <= 2 * spf + 1e-9


def test_trim_keeps_correct_duration(cfg):
    from amt_saga_tpu.saga.snap import trim_offsets

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(31 * spf, 0.75, 64, 96, 0)
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    out, n = trim_offsets(NoteSequence(list(ref.sorted().notes)), wave, cfg)
    assert n == 0


def test_trim_subtracts_explained_region_masker(cfg):
    """A sub-octave neighbor whose 2nd harmonic sits AT our fundamental
    and outlives us energizes the region — but it is an ACCEPTED note,
    so the leak subtraction explains its energy away and the over-long
    duration trims to the true end (round-5: previously this class
    failed closed and the off-grid fresh suite lost 6.5 F1 points to
    exactly these vetoed trims)."""
    from amt_saga_tpu.saga.snap import trim_offsets

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(31 * spf, 0.5, 76, 110, 0)
    ref.add(31 * spf, 2.0, 64, 110, 0)   # octave below, loud, long
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = NoteSequence([Note(31 * spf, 1.5, 76, 110, 0),
                        Note(31 * spf, 2.0, 64, 110, 0)])
    out, n = trim_offsets(seq, wave, cfg)
    trimmed76 = [x for x in out if x.pitch == 76][0]
    assert abs(trimmed76.duration - 0.5) <= 0.15, \
        "explained masker must be subtracted; trim lands at true end"


def test_trim_fails_closed_under_unexplained_masker(cfg):
    """Region energy NOT explained by any accepted note (here: a loud
    sub-octave note present in the AUDIO but absent from the sequence)
    must still veto the trim — the subtraction only removes energy the
    note list claims, so unexplained maskers keep the fail-closed
    physics: a sounding region cannot prove absence."""
    from amt_saga_tpu.saga.snap import trim_offsets

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(31 * spf, 0.5, 76, 110, 0)
    ref.add(31 * spf, 2.0, 64, 110, 0)   # in the audio...
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = NoteSequence([Note(31 * spf, 1.5, 76, 110, 0)])  # ...not the list
    out, n = trim_offsets(seq, wave, cfg)
    trimmed76 = [x for x in out if x.pitch == 76][0]
    assert trimmed76.duration >= 1.0, "unexplained masker must fail closed"


def test_trim_disabled_by_config(cfg):
    from amt_saga_tpu.saga.snap import trim_offsets

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(31 * spf, 0.5, 64, 96, 0)
    wave = render_notes(ref.sorted(), cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = NoteSequence([Note(31 * spf, 1.5, 64, 96, 0)])
    out, n = trim_offsets(seq, wave,
                          cfg.override(**{"loop.offset_trim": False}))
    assert n == 0


def test_batched_stft_mag_bitwise_matches_per_lane(cfg):
    """snap_stft_mag_batch must equal per-lane snap_stft_mag BIT-FOR-BIT
    (pocketfft row transforms are batch-invariant) — the batched call is
    what notes_batch_to_sequences feeds the evidence chain, and any
    deviation would silently split TPU/golden emission parity."""
    from amt_saga_tpu.saga.snap import snap_stft_mag, snap_stft_mag_batch

    rng = np.random.default_rng(11)
    waves = rng.standard_normal((3, cfg.dsp.sample_rate * 2)).astype(
        np.float32)
    batched = snap_stft_mag_batch(waves, cfg)
    for b in range(waves.shape[0]):
        assert np.array_equal(batched[b], snap_stft_mag(waves[b], cfg))
