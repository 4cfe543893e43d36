"""Note data model (SURVEY.md C5, layer L1).

Two representations:

* :class:`NoteArrays` — device-side struct-of-arrays with a fixed capacity
  and an explicit ``count``.  This is the shape required to carry notes
  through a batched ``lax.while_loop`` (SURVEY.md §7 step 1): every field is
  a fixed-size array, appends are masked dynamic-index writes.
* :class:`Note` / :class:`NoteSequence` — host-side list of events with
  float seconds, used for MIDI emission and evaluation.

The deterministic ordering rule (the bit-for-bit parity surface, SURVEY.md
C6) is pinned here: notes sort by (onset_tick, pitch, program, dur_tick,
velocity).  Tick quantization is done on the host in float64.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, List, Sequence, Tuple

import numpy as np

# MIDI timing constants shared by writer/parser and the sort rule.
TICKS_PER_BEAT = 480
TEMPO_US_PER_BEAT = 500_000  # 120 bpm -> 960 ticks per second


def seconds_to_ticks(seconds: float) -> int:
    """Quantize seconds to MIDI ticks, rounding in float64 on the host."""
    ticks_per_second = TICKS_PER_BEAT * 1_000_000.0 / TEMPO_US_PER_BEAT
    return int(round(float(seconds) * ticks_per_second))


def ticks_to_seconds(ticks: int) -> float:
    ticks_per_second = TICKS_PER_BEAT * 1_000_000.0 / TEMPO_US_PER_BEAT
    return ticks / ticks_per_second


@dataclass(frozen=True)
class Note:
    """One note event. Times in seconds; pitch/velocity/program MIDI ints."""

    onset: float
    duration: float
    pitch: int
    velocity: int = 96
    program: int = 0

    @property
    def offset(self) -> float:
        return self.onset + self.duration

    def sort_key(self) -> Tuple[int, int, int, int, int]:
        return (
            seconds_to_ticks(self.onset),
            self.pitch,
            self.program,
            seconds_to_ticks(self.duration),
            self.velocity,
        )


@dataclass
class NoteSequence:
    """Ordered container of notes; the host-side L1 data model."""

    notes: List[Note] = field(default_factory=list)

    def add(self, onset: float, duration: float, pitch: int,
            velocity: int = 96, program: int = 0) -> None:
        self.notes.append(Note(onset, duration, int(pitch), int(velocity),
                               int(program)))

    def sorted(self) -> "NoteSequence":
        """Deterministic canonical order (the parity surface)."""
        return NoteSequence(sorted(self.notes, key=Note.sort_key))

    def __len__(self) -> int:
        return len(self.notes)

    def __iter__(self):
        return iter(self.notes)

    def shifted(self, dt: float) -> "NoteSequence":
        return NoteSequence([
            Note(n.onset + dt, n.duration, n.pitch, n.velocity, n.program)
            for n in self.notes
        ])

    def to_arrays(self) -> dict:
        """Struct-of-arrays (host numpy) view, canonical order."""
        s = self.sorted().notes
        return {
            "onset": np.array([n.onset for n in s], dtype=np.float64),
            "duration": np.array([n.duration for n in s], dtype=np.float64),
            "pitch": np.array([n.pitch for n in s], dtype=np.int32),
            "velocity": np.array([n.velocity for n in s], dtype=np.int32),
            "program": np.array([n.program for n in s], dtype=np.int32),
        }

    @classmethod
    def from_notes(cls, notes: Iterable[Note]) -> "NoteSequence":
        return cls(list(notes))


def note_arrays_to_sequence(
    onset_frames: Sequence[int],
    dur_frames: Sequence[int],
    pitches: Sequence[int],
    gains: Sequence[float],
    programs: Sequence[int],
    count: int,
    *,
    hop: int,
    sample_rate: int,
    pitch_min: int = 21,
) -> NoteSequence:
    """Convert device-side note arrays to a host NoteSequence.

    All float work happens here in float64 (SURVEY.md §7 "hard parts": round
    on host at emission so TPU/CPU float-order differences cannot leak into
    onset ticks).  ``gains`` are least-squares template gains; velocity maps
    through a quantized log-ish curve that is robust to tiny float noise.
    """
    seq = NoteSequence()
    spf = hop / float(sample_rate)  # seconds per frame
    n = int(count)
    for i in range(n):
        onset = float(int(onset_frames[i])) * spf
        dur = float(max(1, int(dur_frames[i]))) * spf
        vel = gain_to_velocity(float(gains[i]))
        seq.add(onset, dur, int(pitches[i]) + pitch_min, vel,
                int(programs[i]))
    return seq


def gain_to_velocity(gain: float) -> int:
    """Map a template gain (~[0, 1.5]) to MIDI velocity 1..127.

    Quantized to a coarse grid first so that sub-1e-3 float differences
    between the TPU and golden CPU paths cannot flip the final integer.
    """
    g = max(0.0, min(1.0, float(gain)))
    g = round(g * 512.0) / 512.0
    return int(max(1, min(127, round(g * 127.0))))
