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


def refined_duration_seconds(d_idx: int, s_lo: float, s_mid: float,
                             s_hi: float,
                             duration_grid: Sequence[float]) -> float | None:
    """Continuous duration from the winner's scores at grid neighbors.

    The loop records the winner's (quantized) scores at three CONSECUTIVE
    grid indices ``m-1, m, m+1`` with ``m = clip(d, 1, D-2)`` — centered
    on the winning duration ``d`` in the interior, shifted one step
    inward when ``d`` is a grid boundary (the common real-world case: an
    off-grid duration just below the longest grid entry).  The parabola
    vertex through those samples, in grid-index space, is clamped to
    ``[d-0.5, d+0.5]`` (never overriding the argmax by more than half a
    step) and mapped through log-duration interpolation.

    Pure float64 host arithmetic on decision-quantized inputs — the TPU
    and golden paths record bit-identical inputs, so the refined tick is
    bit-identical too (SURVEY.md §7 "hard parts": round on host at
    emission).  Returns None (caller keeps the grid duration) when the
    grid has <3 entries or the samples are not strictly concave.
    """
    n_d = len(duration_grid)
    if n_d < 3:
        return None
    d = int(d_idx)
    m = min(max(d, 1), n_d - 2)
    a, b, c = float(s_lo), float(s_mid), float(s_hi)
    denom = a - 2.0 * b + c
    if not denom < 0.0:  # not a concave maximum (incl. NaN)
        return None
    p = m + 0.5 * (a - c) / denom  # vertex in grid-index space
    p = max(d - 0.5, min(d + 0.5, p))
    p = max(0.0, min(float(n_d - 1), p))
    import math

    lo = int(math.floor(p))
    hi = min(lo + 1, n_d - 1)
    w = p - lo
    ln_lo = math.log(float(duration_grid[lo]))
    ln_hi = math.log(float(duration_grid[hi]))
    return math.exp((1.0 - w) * ln_lo + w * ln_hi)


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
    d_idx: Sequence[int] | None = None,
    sd3: Sequence[Sequence[float]] | None = None,
    duration_grid: Sequence[float] | None = None,
) -> NoteSequence:
    """Convert device-side note arrays to a host NoteSequence.

    All float work happens here in float64 (SURVEY.md §7 "hard parts": round
    on host at emission so TPU/CPU float-order differences cannot leak into
    onset ticks).  ``gains`` are least-squares template gains; velocity maps
    through a quantized log-ish curve that is robust to tiny float noise.

    With ``d_idx``/``sd3``/``duration_grid`` (LoopConfig.refine_duration),
    emitted durations are refined past the grid by
    :func:`refined_duration_seconds`.
    """
    seq = NoteSequence()
    spf = hop / float(sample_rate)  # seconds per frame
    n = int(count)
    refine = (d_idx is not None and sd3 is not None
              and duration_grid is not None)
    for i in range(n):
        onset = float(int(onset_frames[i])) * spf
        dur = float(max(1, int(dur_frames[i]))) * spf
        if refine:
            r = refined_duration_seconds(
                d_idx[i], sd3[i][0], sd3[i][1], sd3[i][2], duration_grid)
            if r is not None:
                # Snap to the frame lattice: durations stay frame-
                # quantized like the grid path (a frame is ~32 ms, far
                # inside the 50 ms offset tolerance), and rare one-bucket
                # differences in sd3 between backends must also cross a
                # frame boundary before they can move the emitted tick.
                dur = float(max(1, round(r / spf))) * spf
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
