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
