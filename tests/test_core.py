"""Tests for the note data model and SMF MIDI writer/parser (C5, C6)."""

import numpy as np

from amt_saga_tpu.core.midi import (
    midi_bytes_to_notes,
    notes_to_midi_bytes,
)
from amt_saga_tpu.core.notes import (
    NoteSequence,
    gain_to_velocity,
    note_arrays_to_sequence,
    seconds_to_ticks,
)


def _demo_seq():
    seq = NoteSequence()
    seq.add(0.5, 1.0, 60, 96, 0)
    seq.add(0.0, 0.5, 64, 80, 0)
    seq.add(0.5, 0.25, 55, 70, 0)  # same onset as first, lower pitch
    seq.add(1.25, 0.5, 72, 100, 3)
    return seq


def test_sort_is_deterministic_and_canonical():
    seq = _demo_seq()
    s1 = seq.sorted().notes
    s2 = NoteSequence(list(reversed(seq.notes))).sorted().notes
    assert s1 == s2
    assert [n.pitch for n in s1] == [64, 55, 60, 72]


def test_ticks_quantization():
    # 120 bpm, 480 tpb -> 960 ticks/sec
    assert seconds_to_ticks(1.0) == 960
    assert seconds_to_ticks(0.05) == 48
    assert seconds_to_ticks(0.0005) == 0


def test_midi_roundtrip():
    seq = _demo_seq()
    data = notes_to_midi_bytes(seq)
    back = midi_bytes_to_notes(data)
    orig = seq.sorted().notes
    assert len(back) == len(orig)
    for a, b in zip(back.notes, orig):
        assert a.pitch == b.pitch
        assert a.velocity == b.velocity
        assert a.program == b.program
        assert abs(a.onset - b.onset) < 1.5e-3  # one-tick quantization
        assert abs(a.duration - b.duration) < 3e-3


def test_midi_bytes_deterministic():
    a = notes_to_midi_bytes(_demo_seq())
    b = notes_to_midi_bytes(NoteSequence(list(reversed(_demo_seq().notes))))
    assert a == b
    assert a[:4] == b"MThd"


def test_running_status_used():
    seq = NoteSequence()
    for i in range(4):
        seq.add(0.1 * i, 0.05, 60 + i, 90, 0)
    data = notes_to_midi_bytes(seq)
    # 8 note events; with running status the track must be shorter than
    # the no-running-status encoding (4 bytes per event + deltas).
    back = midi_bytes_to_notes(data)
    assert len(back) == 4


def test_gain_to_velocity_stable_under_float_noise():
    for g in (0.3505, 0.5005, 0.7005, 0.9005):
        v = gain_to_velocity(g)
        assert v == gain_to_velocity(g + 1e-5)
        assert v == gain_to_velocity(g - 1e-5)
        assert 1 <= v <= 127


def test_note_arrays_to_sequence():
    seq = note_arrays_to_sequence(
        onset_frames=np.array([4, 0]),
        dur_frames=np.array([8, 16]),
        pitches=np.array([39, 48]),
        gains=np.array([0.5005, 0.9005]),
        programs=np.array([0, 0]),
        count=2,
        hop=256, sample_rate=8000, pitch_min=21)
    s = seq.sorted().notes
    assert s[0].pitch == 69 and s[1].pitch == 60
    assert abs(s[1].onset - 4 * 256 / 8000) < 1e-9


def test_midi_bytes_match_frozen_golden_file():
    """SURVEY.md §4.2: byte-golden MIDI test — any change to the SMF
    encoding (tick math, ordering, running status, channel mapping) is a
    parity-surface change and must be deliberate (regenerate the fixture
    and update golden/TPU paths together)."""
    import os

    seq = NoteSequence()
    seq.add(0.0, 0.5, 60, 96, 0)
    seq.add(0.5, 0.25, 64, 80, 0)
    seq.add(0.5, 1.0, 55, 70, 3)
    seq.add(1.25, 0.125, 72, 127, 0)
    golden = os.path.join(os.path.dirname(__file__), "fixtures",
                          "golden_demo.mid")
    with open(golden, "rb") as f:
        assert notes_to_midi_bytes(seq) == f.read()


def test_midi_fuzz_roundtrip():
    """Randomized NoteSequences survive write->parse with events intact."""
    rng = np.random.default_rng(7)
    for trial in range(25):
        seq = NoteSequence()
        for _ in range(int(rng.integers(1, 30))):
            seq.add(float(rng.uniform(0, 30)), float(rng.uniform(0.05, 3)),
                    int(rng.integers(0, 128)), int(rng.integers(1, 128)),
                    int(rng.integers(0, 8)))
        data = notes_to_midi_bytes(seq)
        back = midi_bytes_to_notes(data)
        orig = seq.sorted().notes
        assert len(back) == len(orig), trial
        for a, b in zip(back.notes, orig):
            assert (a.pitch, a.velocity, a.program) == (
                b.pitch, b.velocity, b.program)
            assert abs(a.onset - b.onset) < 1.5e-3


def _smf(events):
    """Minimal type-0 SMF from [(tick, bytes), ...] events (no running
    status), for exercising parser features our writer never emits."""
    import struct

    track = bytearray()
    last = 0
    for tick, ev in sorted(events, key=lambda e: e[0]):
        delta = tick - last
        out = [delta & 0x7F]
        d = delta >> 7
        while d:
            out.append(0x80 | (d & 0x7F))
            d >>= 7
        track += bytes(reversed(out)) + ev
        last = tick
    track += b"\x00\xff\x2f\x00"
    return (b"MThd" + struct.pack(">IHHH", 6, 0, 1, 480)
            + b"MTrk" + struct.pack(">I", len(track)) + bytes(track))


def test_cc64_sustain_extends_offsets():
    # Pedal down at 0; note released at 0.5s but pedal held; re-struck at
    # 0.75s; released again at 1.0s; pedal up at 1.5s.  MAESTRO-convention
    # ground truth: note1 sustains until the re-strike (0.75s), note2
    # until the pedal-up (1.5s).
    data = _smf([
        (0, bytes([0xB0, 64, 127])),
        (0, bytes([0x90, 60, 80])),
        (480, bytes([0x80, 60, 64])),
        (720, bytes([0x90, 60, 80])),
        (960, bytes([0x80, 60, 64])),
        (1440, bytes([0xB0, 64, 0])),
    ])
    seq = midi_bytes_to_notes(data)
    assert len(seq) == 2
    n1, n2 = seq.notes
    assert abs(n1.onset - 0.0) < 1e-9 and abs(n1.duration - 0.75) < 1e-9
    assert abs(n2.onset - 0.75) < 1e-9 and abs(n2.duration - 0.75) < 1e-9
    # Opt-out recovers the raw note-off times.
    raw = midi_bytes_to_notes(data, sustain=False)
    assert abs(raw.notes[0].duration - 0.5) < 1e-9
    assert abs(raw.notes[1].duration - 0.25) < 1e-9


def test_cc64_pedal_never_released_is_safe():
    data = _smf([
        (0, bytes([0xB0, 64, 127])),
        (0, bytes([0x90, 60, 80])),
        (480, bytes([0x80, 60, 64])),
    ])
    seq = midi_bytes_to_notes(data)
    assert len(seq) == 1
    assert abs(seq.notes[0].duration - 0.5) < 1e-9  # kept, not dropped


def test_duration_refiner_recovers_offgrid(tiny_config):
    """The rank-1 cross-correlation duration estimator must recover an
    off-grid duration from the winner's grid-score vector to within a
    few percent (VERDICT r1 #5 'continuous duration refinement')."""
    from amt_saga_tpu.golden.pipeline import quantize_decisions_np
    from amt_saga_tpu.synth.templates import (
        fine_duration_grid,
        make_duration_refiner,
    )

    cfg = tiny_config
    ref = make_duration_refiner(cfg.synth, cfg.dsp)
    fine = fine_duration_grid(cfg.synth)
    grid = np.asarray(cfg.synth.duration_grid)
    for q in (0, 12, 30):
        for tau in (0.31, 0.42, 0.63, 0.86):
            # Score vector a true duration-tau note of gain g produces:
            # s_d = <g*W_tau, W_d>^2 / ||W_d||^2 = g^2 K[d,tau]^2 / n_d.
            j = int(np.argmin(np.abs(fine - tau)))
            g = 0.8
            dvec = g * ref.table[q, :, j]
            svec = quantize_decisions_np(
                (np.square(dvec) / ref.norms[q]).astype(np.float32))
            d_idx = int(np.argmax(svec))
            got = ref(d_idx, q % ref.n_p, q // ref.n_p, svec)
            assert got is not None
            true = float(fine[j])
            assert abs(got - true) / true < 0.06, (q, true, got)
            # ...and beats snapping to the winning grid entry.
            snap_err = abs(float(grid[d_idx]) - true)
            assert abs(got - true) <= snap_err + 1e-9, (q, true, got)
    # Degenerate inputs refuse to refine rather than guess.
    assert ref(0, 0, 0, np.zeros(len(grid), np.float32)) is None
    assert ref(0, 0, 0, np.full(len(grid), np.nan, np.float32)) is None


def test_duration_reselection_in_joint_refit():
    """refit_gains_variants_host stage 2 (round-3): an over-long
    duration choice whose energy the joint fit attributes to a
    neighboring note is corrected by one grid step; on a sparse grid
    (step ratio > 1.6) re-selection is gated off."""
    import numpy as np

    from amt_saga_tpu.core.notes import refit_gains_variants_host

    # Two atoms: qd 0 = "short", qd 1 = "long" (same pitch, durations
    # 0: 0.5s, 1: 0.75s), plus a neighbor note at another pitch whose
    # atom overlaps the long variant's tail.  Gram built by hand.
    n_p, n_d, tmax = 2, 2, 4
    nqd = n_p * n_d
    gram = np.zeros((2 * tmax - 1, nqd, nqd), np.float32)
    for qd in range(nqd):
        gram[tmax - 1, qd, qd] = 1.0
    # long variant of pitch 0 (qd=1) overlaps pitch 1's atom (qd=2)
    # when the neighbor starts 2 frames later.
    gram[tmax - 1 + 2, 1, 2] = 0.6
    gram[tmax - 1 - 2, 2, 1] = 0.6

    onset = np.array([0, 2], np.int32)
    pitches = np.array([0, 1], np.int32)
    d_idx = np.array([1, 0], np.int32)     # note 0 chose LONG (wrongly)
    programs = np.zeros(2, np.int32)
    gains = np.array([1.0, 1.0], np.float32)
    # Power dots vs the pristine spec: note 0's SHORT variant fits 1.0;
    # its LONG variant "sees" extra energy that belongs to note 1.
    # dot0 layout [cap, I*3] = objectives at (d-1, d, d+1).
    dot0 = np.array([
        [1.0, 1.3, 1.3],   # note 0 variants d=0(short),1(long),1(clip)
        [0.0, 1.6, 1.6],   # note 1 variants d=0 (clipped at low edge)
    ], np.float32)
    g, p, d, changed = refit_gains_variants_host(
        onset, pitches, d_idx, programs, dot0, gains, 2, gram,
        n_p, n_d, sweeps=4, duration_grid=(0.5, 0.75))
    assert d[0] == 0 and changed[0]        # corrected long -> short
    assert d[1] == 0 and not changed[1]
    # Sparse grid: the same correction is gated off (ratio 2 > 1.6).
    g2, p2, d2, ch2 = refit_gains_variants_host(
        onset, pitches, d_idx, programs, dot0, gains, 2, gram,
        n_p, n_d, sweeps=4, duration_grid=(0.5, 1.0))
    assert d2[0] == 1 and not ch2.any()


def test_harmonic_phantom_gate_golden(tiny_config):
    """A weak simultaneous note one octave above a strong note is
    suppressed by loop.harmonic_shadow_frac; an independent-onset octave
    note survives."""
    import dataclasses

    import numpy as np

    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.golden.pipeline import transcribe_golden
    from amt_saga_tpu.runtime.fixtures import render_notes

    cfg = dataclasses.replace(
        tiny_config, loop=dataclasses.replace(
            tiny_config.loop, harmonic_shadow_frac=0.3))
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref = NoteSequence()
    ref.add(10 * spf, 0.5, 60, 100, 0)
    ref.add(60 * spf, 0.5, 72, 90, 0)  # octave, INDEPENDENT onset
    wave = render_notes(ref, cfg, int(4.0 * cfg.dsp.sample_rate))
    seq = transcribe_golden(wave, cfg).sequence
    pitches = sorted(n.pitch for n in seq)
    assert 60 in pitches and 72 in pitches  # real octave note survives


def test_refine_many_bitwise_matches_scalar():
    """DurationRefiner.refine_many must reproduce __call__ BIT-FOR-BIT
    per note: note_arrays_to_sequence uses the batch form on the
    production path while the scalar form remains the oracle — any ulp
    drift would move emitted ticks and break golden parity."""
    import numpy as np

    from amt_saga_tpu import default_config
    from amt_saga_tpu.synth.templates import make_duration_refiner

    cfg = default_config()
    ref = make_duration_refiner(cfg.synth, cfg.dsp)
    rng = np.random.default_rng(123)
    n = 512
    n_d = len(cfg.synth.duration_grid)
    d_idx = rng.integers(0, n_d, n)
    pitch = rng.integers(0, cfg.synth.n_pitches, n)
    prog = np.zeros(n, np.int64)
    sv = rng.uniform(0.0, 1e-3, (n, n_d))
    sv[rng.random(n) < 0.1] = 0.0                 # all-zero rows -> None
    sv[rng.random((n, n_d)) < 0.02] = np.nan      # non-finite -> None
    batch = ref.refine_many(d_idx, pitch, prog, sv)
    for i in range(n):
        scalar = ref(int(d_idx[i]), int(pitch[i]), int(prog[i]), sv[i])
        if scalar is None:
            assert np.isnan(batch[i])
        else:
            assert batch[i] == scalar, (i, batch[i], scalar)


def test_sort_order_matches_scalar_sort_key_fuzz():
    """sort_order (vectorized lexsort) must equal the scalar
    sorted(key=Note.sort_key) order — including engineered tick ties,
    half-even rounding boundaries, and full-key duplicates (where
    stability decides)."""
    from amt_saga_tpu.core.notes import Note, sort_order

    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(1, 60))
        notes = []
        for _ in range(n):
            # Cluster onsets so tick ties are common; include exact
            # half-tick values (x.5/960s) to exercise round-half-even.
            base = float(rng.integers(0, 8)) / 960.0 * rng.integers(1, 4)
            if rng.random() < 0.3:
                base += 0.5 / 960.0
            notes.append(Note(
                base, float(rng.integers(1, 5)) / 960.0,
                int(rng.integers(60, 64)), int(rng.integers(1, 4)),
                int(rng.integers(0, 2))))
        # Duplicate some notes outright (full-key ties).
        for i in range(0, len(notes), 7):
            notes.append(notes[i])
        ref = sorted(range(len(notes)),
                     key=lambda i: notes[i].sort_key())
        got = list(sort_order(notes))
        assert got == ref, (trial, got, ref)


def test_midi_bytes_match_scalar_reference_fuzz():
    """The vectorized notes_to_midi_bytes must be byte-identical to the
    scalar event-loop construction it replaced, on random sequences
    with tick ties and duplicate notes."""
    import struct as _struct

    from amt_saga_tpu.core.midi import (
        _program_to_channel,
        _var_len,
        notes_to_midi_bytes,
    )
    from amt_saga_tpu.core.notes import (
        TEMPO_US_PER_BEAT,
        TICKS_PER_BEAT,
        NoteSequence,
        seconds_to_ticks,
    )

    def scalar_writer(seq):
        canonical = seq.sorted()
        programs = [n.program for n in canonical] or [0]
        chan_of = _program_to_channel(programs)
        events = []
        for n in canonical:
            on_t = seconds_to_ticks(n.onset)
            off_t = on_t + max(1, seconds_to_ticks(n.duration))
            ch = chan_of[n.program]
            vel = max(1, min(127, int(n.velocity)))
            events.append((on_t, 1, n.pitch, n.program, 0x90 | ch,
                           n.pitch, vel))
            events.append((off_t, 0, n.pitch, n.program, 0x80 | ch,
                           n.pitch, 64))
        events.sort(key=lambda e: (e[0], e[1], e[2], e[3]))
        track = bytearray()
        track += _var_len(0) + bytes([0xFF, 0x51, 0x03])
        track += _struct.pack(">I", TEMPO_US_PER_BEAT)[1:]
        for prog, ch in sorted(chan_of.items(), key=lambda kv: kv[1]):
            track += _var_len(0) + bytes([0xC0 | ch, prog & 0x7F])
        last_tick, last_status = 0, -1
        for tick, _c, _p, _g, status, d1, d2 in events:
            track += _var_len(tick - last_tick)
            if status != last_status:
                track.append(status)
                last_status = status
            track += bytes([d1, d2])
            last_tick = tick
        track += _var_len(0) + bytes([0xFF, 0x2F, 0x00])
        header = b"MThd" + _struct.pack(">IHHH", 6, 0, 1, TICKS_PER_BEAT)
        return header + b"MTrk" + _struct.pack(">I", len(track)) \
            + bytes(track)

    rng = np.random.default_rng(11)
    for trial in range(30):
        seq = NoteSequence()
        for _ in range(int(rng.integers(0, 50))):
            seq.add(float(rng.integers(0, 12)) / 960.0
                    * float(rng.integers(1, 5)),
                    float(rng.integers(1, 8)) / 960.0,
                    int(rng.integers(40, 46)),
                    int(rng.integers(1, 128)), int(rng.integers(0, 3)))
        assert notes_to_midi_bytes(seq) == scalar_writer(seq), trial
