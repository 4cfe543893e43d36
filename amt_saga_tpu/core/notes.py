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


def sort_order(notes: Sequence["Note"]) -> np.ndarray:
    """Indices that put ``notes`` in canonical :meth:`Note.sort_key`
    order — the vectorized equivalent of
    ``sorted(range(n), key=lambda i: notes[i].sort_key())``.

    Identical order is guaranteed: the tick keys use the same f64
    multiply + round-half-even as :func:`seconds_to_ticks` (``np.rint``
    and Python ``round`` both round half to even on float64), lexsort
    compares the same five keys in the same priority, and both sorts
    are stable, so full-key ties keep original order either way.  The
    per-note ``sort_key`` tuple construction was a measured emission
    hot spot (~145k calls per 768-lane batch)."""
    n = len(notes)
    tps = TICKS_PER_BEAT * 1_000_000.0 / TEMPO_US_PER_BEAT
    onset = np.fromiter((m.onset for m in notes), np.float64, n)
    dur = np.fromiter((m.duration for m in notes), np.float64, n)
    pitch = np.fromiter((m.pitch for m in notes), np.int64, n)
    vel = np.fromiter((m.velocity for m in notes), np.int64, n)
    prog = np.fromiter((m.program for m in notes), np.int64, n)
    ot = np.rint(onset * tps).astype(np.int64)
    dt = np.rint(dur * tps).astype(np.int64)
    # lexsort: LAST key is primary; stable.
    return np.lexsort((vel, dt, prog, pitch, ot))


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
        notes = self.notes
        if len(notes) < 8:
            return NoteSequence(sorted(notes, key=Note.sort_key))
        return NoteSequence([notes[i] for i in sort_order(notes)])

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
    d_idx: Sequence[int] | None = None,
    sd: Sequence[Sequence[float]] | None = None,
    refiner=None,
    refine_programs: Sequence[int] | None = None,
    refine_mask: Sequence[bool] | None = None,
    velocity_override: Sequence[int] | None = None,
    refined: np.ndarray | None = None,
) -> NoteSequence:
    """Convert device-side note arrays to a host NoteSequence.

    All float work happens here in float64 (SURVEY.md §7 "hard parts": round
    on host at emission so TPU/CPU float-order differences cannot leak into
    onset ticks).  ``gains`` are least-squares template gains; velocity maps
    through a quantized log-ish curve that is robust to tiny float noise.

    With ``d_idx``/``sd``/``refiner`` (LoopConfig.refine_duration), emitted
    durations are refined past the grid by the continuous duration
    estimator (``synth.templates.DurationRefiner``) — a deterministic
    float64 function of the decision-quantized score vector recorded
    identically by the TPU and golden paths, so MIDI parity survives.
    ``refine_mask`` limits refinement to selected notes: a note whose
    duration the joint refit RE-SELECTED emits its corrected grid
    duration instead (its sd was recorded under the mis-ranking).
    """
    seq = NoteSequence()
    spf = hop / float(sample_rate)  # seconds per frame
    n = int(count)
    refine = d_idx is not None and sd is not None and (
        refiner is not None or refined is not None)
    if refined is not None:
        # Caller-precomputed continuous fits (one refine_many call for a
        # WHOLE batch of lanes — see saga.loop.notes_batch_to_sequences;
        # refine_many is elementwise-identical regardless of batch
        # composition, so the values match the per-lane call exactly).
        refined = np.asarray(refined)[:n]
    elif refine and n and hasattr(refiner, "refine_many"):
        # One vectorized fit for the lane (bit-identical per note to the
        # scalar call — see DurationRefiner.refine_many); the per-note
        # scalar path below stays for custom refiners and is the
        # equality oracle in tests.
        rp = refine_programs if refine_programs is not None else programs
        refined = refiner.refine_many(
            np.asarray(d_idx[:n], np.int64),
            np.asarray(pitches[:n], np.int64),
            np.asarray(rp[:n], np.int64), np.asarray(sd[:n]))
    if refined is not None:
        # Fully vectorized lane: same f64 expressions as the scalar
        # loop below, batched (np.round / np ufuncs are elementwise-
        # identical to Python round on f64 — round-half-even both).
        on_v = (np.asarray(onset_frames[:n], np.int64).astype(np.float64)
                * spf)
        dur_v = (np.maximum(np.asarray(dur_frames[:n], np.int64), 1)
                 .astype(np.float64) * spf)
        use = ~np.isnan(refined)
        if refine_mask is not None:
            use &= np.asarray(refine_mask[:n], bool)
        with np.errstate(invalid="ignore"):
            # Snap to the frame lattice: durations stay frame-quantized
            # like the grid path (a frame is ~32 ms, far inside the
            # 50 ms offset tolerance), and rare one-bucket differences
            # in sd between backends must also cross a frame boundary
            # before they can move the emitted tick.
            snap_v = np.maximum(
                np.round(np.where(use, refined, 1.0) / spf), 1.0) * spf
        dur_v = np.where(use, snap_v, dur_v)
        g_v = np.maximum(0.0, np.minimum(1.0, np.asarray(
            gains[:n], np.float64)))
        g_v = np.round(g_v * 512.0) / 512.0
        vel_v = np.maximum(1, np.minimum(127, np.round(
            g_v * 127.0))).astype(np.int64)
        if velocity_override is not None:
            ov = np.asarray(velocity_override[:n], np.int64)
            vel_v = np.where(ov > 0, ov, vel_v)
        pit_v = (np.asarray(pitches[:n], np.int64) + pitch_min).tolist()
        prg_v = np.asarray(programs[:n], np.int64).tolist()
        for o, du, pi, ve, pg in zip(on_v.tolist(), dur_v.tolist(),
                                     pit_v, vel_v.tolist(), prg_v):
            seq.add(o, du, pi, ve, pg)
        return seq
    for i in range(n):
        onset = float(int(onset_frames[i])) * spf
        dur = float(max(1, int(dur_frames[i]))) * spf
        if refine and (refine_mask is None or bool(refine_mask[i])):
            # The score vector sd was recorded with the note's ORIGINAL
            # instrument's atoms; when the joint refit re-assigns the
            # emitted program, the duration fit must still read the
            # table row that produced sd (refine_programs).
            rp = refine_programs if refine_programs is not None \
                else programs
            r = refiner(int(d_idx[i]), int(pitches[i]), int(rp[i]),
                        sd[i])
            if r is not None:
                # (see the lattice-snap comment above)
                dur = float(max(1, round(r / spf))) * spf
        vel = gain_to_velocity(float(gains[i]))
        if velocity_override is not None and int(velocity_override[i]) > 0:
            # CNN velocity head / blend (RunConfig.velocity_source);
            # 0 = no override for this note.
            vel = int(velocity_override[i])
        seq.add(onset, dur, int(pitches[i]) + pitch_min, vel,
                int(programs[i]))
    return seq


def refit_gains_host(
    onset_frames: Sequence[int],
    qd: Sequence[int],
    dot0: Sequence[float],
    gains: Sequence[float],
    count: int,
    gram: np.ndarray,
    sweeps: int = 2,
) -> np.ndarray:
    """Joint nonnegative gain re-projection over the accepted notes.

    Cyclic coordinate descent on ``||spec - sum_a g_a W_a||^2`` with
    ``g >= 0`` (the orthogonal-projection step of orthogonal matching
    pursuit, warm-started at the greedy gains): per sweep, each gain is
    set to its exact 1-D minimizer

        g_a = max(0, (dot0_a - sum_{b != a} g_b G_ab) / G_aa)

    where ``dot0_a = <spec, W_a at onset_a>`` (device-recorded, decision-
    quantized) and ``G_ab = gram[t_a - t_b, qd_a, qd_b]`` gathered from
    the precomputed template-overlap Gram (``synth.templates
    .gram_from_bank`` — the same host-computed array both paths use, so
    the gather is bit-exact).  Greedy gains are fitted against the
    mid-extraction residual and absorb the energy of not-yet-extracted
    overlapping neighbors; the joint refit removes that bias.

    Pure float64 host arithmetic in a pinned order: identical inputs on
    the TPU and golden paths give bit-identical refit gains, preserving
    MIDI parity.  Returns a float64 copy of ``gains`` with the first
    ``count`` entries replaced.
    """
    out = np.asarray(gains, dtype=np.float64).copy()
    n = int(count)
    if n == 0:
        return out
    tmax = (gram.shape[0] + 1) // 2
    t = np.asarray(onset_frames[:n], dtype=np.int64)
    a_qd = np.asarray(qd[:n], dtype=np.int64)
    # gram[dt, a, b] = sum_tau W_a[tau + dt] W_b[tau] (gram_from_bank), so
    # the overlap of atom a at t_a with atom b at t_b is gram[t_b - t_a].
    dt = t[None, :] - t[:, None]
    in_band = np.abs(dt) < tmax
    k = np.clip(dt + tmax - 1, 0, gram.shape[0] - 1)
    G = np.where(in_band,
                 gram[k, a_qd[:, None], a_qd[None, :]], 0.0
                 ).astype(np.float64)
    diag = np.maximum(np.diagonal(G), 1e-12)
    d0 = np.asarray(dot0[:n], dtype=np.float64)
    g = out[:n]
    # Native fast path (amt_saga_tpu/native): same update rule, C++
    # accumulation order; both emission paths share the dispatch (see
    # refit_gains_variants_host for the parity argument).
    from .. import native

    # Native only when the in-place target is already f64 C-contiguous:
    # the wrapper asserts (loud), but this path should degrade to the
    # identical numpy descent instead (ADVICE r3: mirror the variants-
    # path guard).  G/diag/d0 are copied by the wrapper as needed.
    if (native.available() and g.dtype == np.float64
            and g.flags.c_contiguous and d0.flags.c_contiguous):
        native.refit_gains(np.ascontiguousarray(G), diag, d0, g,
                           int(sweeps))
        return out
    for _ in range(int(sweeps)):
        for a in range(n):
            num = d0[a] - (float(G[a] @ g) - G[a, a] * g[a])
            g[a] = max(0.0, num / diag[a])
    return out


def refit_gains_power_host(
    onset_frames: Sequence[int],
    qd: Sequence[int],
    dot0_pow: Sequence[float],
    gains: Sequence[float],
    count: int,
    gram_pow: np.ndarray,
    sweeps: int = 4,
) -> np.ndarray:
    """Power-domain joint gain refit (the production variant).

    Overlapping notes' magnitudes add in QUADRATURE, not linearly: two
    harmonics colliding in one bin with random relative phase satisfy
    ``E|A+B|^2 = |A|^2 + |B|^2``.  So the correct superposition model is
    ``spec^2 ~= sum_a g_a^2 W_a^2`` — fit the SQUARED gains to the
    squared spectrogram (``dot0_pow = <spec^2, W_a^2>``, ``gram_pow`` =
    Gram of the squared atoms) with :func:`refit_gains_host`, warm-
    started at the squared greedy gains, then take the square root.
    Identical to the linear fit where supports are disjoint (isolated
    notes stay exact); far better under overlap — 3-voice velocity MAE
    14.3 (greedy) / 12.4 (linear-domain fit) / 4.6 (this).
    """
    h = refit_gains_host(
        onset_frames, qd, dot0_pow,
        np.square(np.asarray(gains, dtype=np.float64)), count,
        gram_pow, sweeps)
    return np.sqrt(np.maximum(h, 0.0))


def refit_gains_programs_host(
    onset_frames: Sequence[int],
    pitches: Sequence[int],
    d_idx: Sequence[int],
    programs: Sequence[int],
    dot0_pow: np.ndarray,
    gains: Sequence[float],
    count: int,
    gram_pow: np.ndarray,
    n_pitches: int,
    n_durations: int,
    sweeps: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """Power-domain joint gain refit WITH instrument re-selection.

    The loop picks each note's instrument against a partially-subtracted
    residual; on colliding voices that choice is noisy (measured ~5% of
    matched notes flip).  Comparing the variants against the PRISTINE
    spectrogram alone is worse (the mixture's other voices tilt the
    single-atom fit — measured 0.91 -> 0.82 instrument-F1), but
    comparing them inside the JOINT fit — each variant scored by its
    1-D optimal objective against the residual with every OTHER note's
    explained energy removed via the Gram — recovers flips: measured
    instrument-criterion F1 0.905 -> 0.926 on 2-instrument fixtures.

    ``dot0_pow`` is [cap, I]: quantized ``<spec^2, W_{i,p,d}^2>`` for
    every instrument variant of each note's (pitch, duration) atom,
    recorded on device (golden mirrors it).  Per sweep, per note, each
    variant's nonnegative 1-D optimum and objective gain are computed
    with the other notes held at their current (variant, gain); the
    best variant wins (first-max).  Pure float64, pinned order — bit
    parity preserved.  Returns (gains, programs) copies with the first
    ``count`` entries refit.

    With one instrument this reduces exactly to the plain power-domain
    gain refit (:func:`refit_gains_power_host`).
    """
    out_g = np.asarray(gains, dtype=np.float64).copy()
    out_p = np.asarray(programs, dtype=np.int64).copy()
    n = int(count)
    n_i = dot0_pow.shape[1]
    if n == 0:
        return out_g, out_p
    if n_i == 1:
        qd = (0 * n_pitches + np.asarray(pitches, np.int64)) \
            * n_durations + np.asarray(d_idx, np.int64)
        g = refit_gains_power_host(onset_frames, qd, dot0_pow[:, 0],
                                   gains, count, gram_pow, sweeps)
        return g, out_p
    tmax = (gram_pow.shape[0] + 1) // 2
    t = np.asarray(onset_frames[:n], dtype=np.int64)
    p = np.asarray(pitches[:n], dtype=np.int64)
    d = np.asarray(d_idx[:n], dtype=np.int64)
    prog = out_p[:n]
    # gram index convention: overlap(a@t_a, b@t_b) = gram[t_b - t_a].
    dt = t[None, :] - t[:, None]
    in_band = np.abs(dt) < tmax
    k = np.clip(dt + tmax - 1, 0, gram_pow.shape[0] - 1)
    qd_var = (np.arange(n_i)[None, :] * n_pitches + p[:, None]) \
        * n_durations + d[:, None]                       # [n, I]
    d0 = np.asarray(dot0_pow[:n], dtype=np.float64)      # [n, I]
    h = np.square(out_g[:n])
    for _ in range(int(sweeps)):
        for a in range(n):
            qb = qd_var[np.arange(n), prog]              # [n]
            rows = gram_pow[k[a][None, :], qd_var[a][:, None],
                            qb[None, :]].astype(np.float64)  # [I, n]
            rows = np.where(in_band[a][None, :], rows, 0.0)
            gaa = np.maximum(
                gram_pow[tmax - 1, qd_var[a], qd_var[a]].astype(
                    np.float64), 1e-12)                  # [I]
            s = rows @ h - rows[:, a] * h[a]             # exclude self
            g = np.maximum(0.0, (d0[a] - s) / gaa)
            obj = g * g * gaa
            # The variant choice is a DISCRETE decision emitted into
            # MIDI: quantize the objectives (same mantissa-truncation
            # contract as every other decision — the warm-start gains
            # differ in last ulps between the TPU and golden paths) and
            # break ties in favor of the INCUMBENT program, so an
            # all-zero / tied objective keeps the loop's choice instead
            # of collapsing to instrument 0.
            obj_q = _quantize_decisions_f32(obj)
            i_best = int(np.argmax(obj_q))               # first-max
            if obj_q[i_best] == obj_q[prog[a]]:
                i_best = int(prog[a])
            prog[a] = i_best
            h[a] = g[i_best]
    out_g[:n] = np.sqrt(np.maximum(h, 0.0))
    return out_g, out_p


# Duration re-selection replaces the continuous sd-refined duration
# with a GRID value, so it only pays when the grid is locally dense
# enough that a one-step correction lands inside the offset tolerance
# (20% of duration): a neighbor is only eligible when its grid ratio to
# the incumbent is at most this.  The default 8-entry grid (ratios
# 1.33-1.5) qualifies everywhere; a sparse grid (ratio 2) keeps the
# refiner instead — measured: gating recovers the off-grid suite's
# +3.1pt without the sparse-grid regression a flat margin couldn't
# separate (objective gaps between adjacent-duration variants are
# sub-1% either way).
DURATION_RESELECT_MAX_STEP = 1.6

# Stage-3 instrument context vote: a note is timbre-AMBIGUOUS when its
# runner-up instrument's joint-fit objective reaches this fraction of
# the winner's (near-identical atoms — e.g. high pitches with one or
# two harmonics under fmax carry no rolloff information).
INSTRUMENT_AMBIGUITY = 0.98


def refit_gains_variants_host(
    onset_frames: Sequence[int],
    pitches: Sequence[int],
    d_idx: Sequence[int],
    programs: Sequence[int],
    dot0_pow: np.ndarray,
    gains: Sequence[float],
    count: int,
    gram_pow: np.ndarray,
    n_pitches: int,
    n_durations: int,
    sweeps: int = 4,
    duration_grid: Sequence[float] | None = None,
    context_frames: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Joint power-domain refit with instrument AND duration re-selection.

    TWO decoupled stages of variant-comparing coordinate descent, both
    mirroring :func:`refit_gains_programs_host`'s quantized-incumbent
    rules:

    1. INSTRUMENT re-selection at the loop's duration — semantically
       identical to refit_gains_programs_host (timbre attribution is
       not disturbed by duration variants: jointly maximizing over
       (i, d) let an over-long wrong-instrument variant outscore the
       right instrument — measured config-5 instrument-F1 0.8725 ->
       0.8591 — so the stages are sequential, not joint).
    2. DURATION re-selection at the chosen instrument, over the
       {-1, 0, +1} grid neighbors of the LOOP's choice (clipped at the
       edges — never moved by more than one step, mirroring the
       DurationRefiner's discipline).  The greedy pass scores durations
       against a residual that still contains unextracted neighbors, so
       an over-long template that "explains" the next note's energy can
       win; inside the joint fit that energy is attributed to the
       neighbor's own atom and the over-long variant loses.

    ``dot0_pow`` is [cap, I*3] (variant order i*3 + dd+1).

    Returns (gains, programs, d_idx, changed): refit copies with the
    first ``count`` entries updated, plus a changed-duration mask — the
    sd-based continuous refiner reads greedy-time scores, which are
    exactly what mis-ranked a re-selected note's duration, so callers
    emit changed notes at their (corrected) grid duration instead of
    refining.  Pure float64, pinned order, quantized discrete
    decisions: parity preserved.
    """
    out_g = np.asarray(gains, dtype=np.float64).copy()
    out_p = np.asarray(programs, dtype=np.int64).copy()
    out_d = np.asarray(d_idx, dtype=np.int64).copy()
    n = int(count)
    if n == 0:
        return out_g, out_p, out_d, np.zeros(0, dtype=bool)
    n_i = dot0_pow.shape[1] // 3
    tmax = (gram_pow.shape[0] + 1) // 2
    t = np.asarray(onset_frames[:n], dtype=np.int64)
    p = np.asarray(pitches[:n], dtype=np.int64)
    d_orig = np.asarray(d_idx[:n], dtype=np.int64)
    prog = out_p[:n]
    dsel = d_orig.copy()
    d0_all = np.asarray(dot0_pow[:n], dtype=np.float64)  # [n, I*3]
    h = np.square(out_g[:n])

    # The [n, n] pair tables feed only the numpy descent fallback and
    # the stage-3 context vote — when the native kernel runs a single-
    # instrument config, building them is pure per-lane overhead
    # (measured on the 768-lane emission path).  Values are identical
    # whenever they ARE built.
    dt = in_band = k = None

    def _pair_tables():
        nonlocal dt, in_band, k
        if dt is None:
            dt = t[None, :] - t[:, None]
            in_band = np.abs(dt) < tmax
            k = np.clip(dt + tmax - 1, 0, gram_pow.shape[0] - 1)

    def descend(qd_var, d_var, i_var, d0, allowed=None):
        """Variant-comparing sweeps over the given per-note variant set
        (qd index, duration index, instrument index: each [n, V]).
        ``allowed`` [n, V] masks variants out of contention (the
        incumbent is always in).

        The per-note update order and every float op are pinned (parity
        surface); the hoists below only remove redundant recomputation
        of values that are bit-identical across iterations: gaa depends
        only on the static variant set, and qb changes one entry per
        accepted update."""
        _pair_tables()
        gaa_all = np.maximum(
            gram_pow[tmax - 1, qd_var, qd_var].astype(np.float64),
            1e-12)                                               # [n, V]
        qb = (prog * n_pitches + p) * n_durations + dsel
        for _ in range(int(sweeps)):
            for a in range(n):
                rows = gram_pow[k[a][None, :], qd_var[a][:, None],
                                qb[None, :]].astype(np.float64)  # [V, n]
                rows = np.where(in_band[a][None, :], rows, 0.0)
                gaa = gaa_all[a]                                 # [V]
                s = rows @ h - rows[:, a] * h[a]                 # no self
                g = np.maximum(0.0, (d0[a] - s) / gaa)
                obj = g * g * gaa
                obj_q = _quantize_decisions_f32(obj)
                inc = int(np.argmax(qd_var[a] == qb[a]))
                if allowed is not None:
                    inc_q = obj_q[inc]
                    obj_q = np.where(allowed[a], obj_q, -np.inf)
                    obj_q[inc] = inc_q
                v_best = int(np.argmax(obj_q))                   # 1st-max
                if obj_q[v_best] == obj_q[inc]:
                    v_best = inc
                prog[a] = i_var[a, v_best]
                dsel[a] = d_var[a, v_best]
                h[a] = g[v_best]
                qb[a] = (prog[a] * n_pitches + p[a]) * n_durations \
                    + dsel[a]

    # Native (C++) fast path for the two descent stages: identical
    # DISCRETE decisions (both paths quantize with the same mantissa
    # truncation before comparing), gains equal up to summation-order
    # ulps vs numpy's BLAS.  Both the TPU and golden emission paths call
    # THIS function, so whichever implementation runs, they share it and
    # MIDI parity between them is untouched.  AMT_NO_NATIVE=1 or a
    # failed build falls back to the numpy closure (tests compare both).
    from .. import native

    use_native = (native.available() and gram_pow.dtype == np.float32
                  and gram_pow.flags.c_contiguous)
    tmax_i = int(tmax)

    def descend_native(qd_var, d_var, i_var, d0, allowed=None):
        qb = (prog * n_pitches + p) * n_durations + dsel
        native.refit_descend(
            np.ascontiguousarray(t), np.ascontiguousarray(qd_var),
            np.ascontiguousarray(d_var), np.ascontiguousarray(i_var),
            np.ascontiguousarray(d0, dtype=np.float64),
            np.ascontiguousarray(allowed, dtype=np.uint8)
            if allowed is not None else None,
            gram_pow, tmax_i, int(n_pitches), int(n_durations),
            int(sweeps), np.ascontiguousarray(p), prog, dsel, h,
            np.ascontiguousarray(qb))

    run_stage = descend_native if use_native else descend

    # Stage 1: instruments (dd = 0 columns of dot0), duration fixed.
    i_var = np.broadcast_to(np.arange(n_i, dtype=np.int64)[None, :],
                            (n, n_i))
    d_var1 = np.broadcast_to(dsel[:, None], (n, n_i))
    qd_var1 = (i_var * n_pitches + p[:, None]) * n_durations + d_var1
    run_stage(qd_var1, d_var1, i_var, d0_all[:, 1::3])

    # Stage 2: duration neighbors at the chosen instrument.
    dd = np.array([-1, 0, 1], dtype=np.int64)
    d_var2 = np.clip(d_orig[:, None] + dd[None, :], 0, n_durations - 1)
    i_var2 = np.broadcast_to(prog[:, None], (n, 3)).copy()
    qd_var2 = ((i_var2 * n_pitches + p[:, None]) * n_durations + d_var2)
    d0_2 = np.take_along_axis(d0_all, prog[:, None] * 3
                              + np.arange(3)[None, :], axis=1)
    allowed = None
    if duration_grid is not None:
        gsec = np.asarray(duration_grid, dtype=np.float64)
        ratio = np.maximum(gsec[d_var2], gsec[d_orig[:, None]]) \
            / np.maximum(np.minimum(gsec[d_var2], gsec[d_orig[:, None]]),
                         1e-12)
        allowed = ratio <= DURATION_RESELECT_MAX_STEP
    run_stage(qd_var2, d_var2, i_var2, d0_2, allowed=allowed)

    if context_frames > 0 and n_i > 1:
        # Stage 3: context vote for AMBIGUOUS instruments.  At high
        # pitches few harmonics sit below fmax and the instrument
        # variants' atoms are near-identical — the per-note objective
        # carries no timbre information and the choice is noise.  A
        # note whose runner-up instrument objective is within
        # INSTRUMENT_AMBIGUITY of the winner's is reassigned to the
        # majority instrument of the UNambiguous notes within
        # ``context_frames`` (instruments play contiguous phrases);
        # ties keep the joint-fit choice.  Deterministic f64, shared by
        # both paths: parity preserved.
        _pair_tables()
        obj_i = np.zeros((n, n_i), dtype=np.float64)
        for a in range(n):
            qd_a = (np.arange(n_i, dtype=np.int64) * n_pitches + p[a]) \
                * n_durations + dsel[a]
            qb = (prog * n_pitches + p) * n_durations + dsel
            rows = gram_pow[k[a][None, :], qd_a[:, None],
                            qb[None, :]].astype(np.float64)
            rows = np.where(in_band[a][None, :], rows, 0.0)
            gaa = np.maximum(gram_pow[tmax - 1, qd_a, qd_a].astype(
                np.float64), 1e-12)
            s = rows @ h - rows[:, a] * h[a]
            # dsel is within one step of d_orig by construction.
            d0_i = d0_all[a][np.arange(n_i) * 3
                             + int(dsel[a] - d_orig[a]) + 1]
            g = np.maximum(0.0, (d0_i - s) / gaa)
            obj_i[a] = g * g * gaa
        top = np.max(obj_i, axis=1)
        second = np.partition(obj_i, -2, axis=1)[:, -2] if n_i > 1 else 0
        ambiguous = (top > 0) & (
            _quantize_decisions_f32(np.float64(second))
            >= _quantize_decisions_f32(INSTRUMENT_AMBIGUITY * top))
        for a in range(n):
            if not ambiguous[a]:
                continue
            votes = np.zeros(n_i, dtype=np.int64)
            for b2 in range(n):
                if b2 == a or ambiguous[b2]:
                    continue
                if abs(int(t[a]) - int(t[b2])) <= context_frames:
                    votes[prog[b2]] += 1
            if votes.max() > 0:
                best = int(np.argmax(votes))          # first-max
                if votes[best] > votes[prog[a]] or (
                        votes[best] == votes[prog[a]]
                        and best == prog[a]):
                    prog[a] = best

    out_g[:n] = np.sqrt(np.maximum(h, 0.0))
    out_p[:n] = prog
    out_d[:n] = dsel
    return out_g, out_p, out_d, dsel != d_orig


def refit_gains_variants_batch_host(
    onset_frames: np.ndarray,
    pitches: np.ndarray,
    d_idx: np.ndarray,
    programs: np.ndarray,
    dot0_pow: np.ndarray,
    gains: np.ndarray,
    counts: np.ndarray,
    gram_pow: np.ndarray,
    n_pitches: int,
    n_durations: int,
    sweeps: int = 4,
    duration_grid: Sequence[float] | None = None,
    context_frames: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray] | None:
    """Whole-batch :func:`refit_gains_variants_host` — ONE native call
    for every lane (all arrays [B, cap]; ``counts`` [B]).

    Returns (gains, programs, d_idx, changed) with [B, cap] layout, or
    None when the batch fast path does not apply (no native library,
    non-f32 gram, or an active stage-3 context vote — the vote is
    per-lane Python and multi-instrument only).  Per-lane results are
    bit-identical to calling the per-lane function: the native batch
    driver shares the exact descent core and variant-set construction,
    and rows past ``counts[b]`` keep the caller's original values (no
    sqrt(square(x)) round-trip)."""
    from .. import native

    n_i = int(dot0_pow.shape[-1]) // 3
    if (not native.available() or gram_pow.dtype != np.float32
            or not gram_pow.flags.c_contiguous
            or duration_grid is None
            or (context_frames > 0 and n_i > 1)):
        return None
    B, cap = onset_frames.shape[:2]
    t = np.ascontiguousarray(onset_frames, dtype=np.int64)
    p = np.ascontiguousarray(pitches, dtype=np.int64)
    d_orig = np.ascontiguousarray(d_idx, dtype=np.int64)
    cnt = np.ascontiguousarray(counts, dtype=np.int64)
    d0 = np.ascontiguousarray(dot0_pow, dtype=np.float64)
    g64 = np.asarray(gains, dtype=np.float64)
    out_p = np.ascontiguousarray(programs, dtype=np.int64).copy()
    out_d = d_orig.copy()
    h = np.ascontiguousarray(np.square(g64))
    changed = np.zeros((B, cap), dtype=np.uint8)
    tmax = (gram_pow.shape[0] + 1) // 2
    native.refit_variants_batch(
        t, p, d_orig, cnt, d0, gram_pow, int(tmax), n_i,
        int(n_pitches), int(n_durations), int(sweeps),
        np.asarray(duration_grid, dtype=np.float64),
        float(DURATION_RESELECT_MAX_STEP), out_p, out_d, h, changed)
    valid = np.arange(cap)[None, :] < cnt[:, None]
    out_g = np.where(valid, np.sqrt(np.maximum(h, 0.0)), g64)
    out_p = np.where(valid, out_p,
                     np.asarray(programs, dtype=np.int64))
    out_d = np.where(valid, out_d, np.asarray(d_idx, dtype=np.int64))
    return out_g, out_p, out_d, changed.astype(bool) & valid


# Must match saga.loop.DECISION_DROP_BITS / golden.pipeline (see the
# comment there): discrete decisions compare mantissa-truncated floats
# so cross-backend last-ulp differences cannot flip them.
_DECISION_DROP_BITS = 13


def _quantize_decisions_f32(x: np.ndarray) -> np.ndarray:
    i = np.ascontiguousarray(x, dtype=np.float32).view(np.int32)
    mask = np.int32(~((1 << _DECISION_DROP_BITS) - 1))
    return (i & mask).view(np.float32)


def gain_to_velocity(gain: float) -> int:
    """Map a template gain (~[0, 1.5]) to MIDI velocity 1..127.

    Quantized to a coarse grid first so that sub-1e-3 float differences
    between the TPU and golden CPU paths cannot flip the final integer.
    """
    g = max(0.0, min(1.0, float(gain)))
    g = round(g * 512.0) / 512.0
    return int(max(1, min(127, round(g * 127.0))))
