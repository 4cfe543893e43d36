"""The SAGA generative-subtractive transcription loop, TPU-native.

This is the core algorithm (SURVEY.md C9, call stack 3.1) re-designed for
XLA: the reference's host-Python ``while`` loop (classify -> synthesize ->
subtract -> repeat until silence) compiles into ONE ``lax.while_loop``
whose carry holds (residual, note arrays, counts, done-masks) for a whole
BATCH of clips, so many clips transcribe in lockstep on one chip and the
host<->device boundary is crossed exactly twice per batch (waveforms in,
note arrays out) — per BASELINE.json's north star.

Decision parity: every scoring/selection step mirrors
:mod:`amt_saga_tpu.golden.pipeline` op-for-op (same candidate flattening
order, same first-max tie-breaking, same thresholds), so on clean fixtures
the emitted note events — and therefore the MIDI bytes — are identical.

Structure of one loop iteration (all lanes in lockstep, done lanes no-op):

1. score_fn: residual [B, Tp, F] -> coarse score map [B, T, Q] over
   (frame, instrument*pitch).  The default is the matched-filter heuristic
   (temporal-envelope conv + spectral-profile matmul — two MXU ops); a
   trained CNN classifier plugs in through the same signature
   (``RunConfig.classifier``).
2. Peak picking: up to ``n_extract`` coarse-score local maxima per lane
   (masked argmax, small radius).  One coarse map — the two expensive
   full-residual matmuls — is shared by all of them; iteration count,
   not per-iteration FLOPs, dominates TPU wall time.
3. Batched exact refit (v5): ALL (instrument*pitch, duration,
   onset-offset) candidate dot products for ALL n_extract peaks come from
   ONE matmul against the iteration-start residual (the template bank
   streams from HBM once per iteration), then the peaks extract
   SEQUENTIALLY — greedy matching pursuit — with the dots kept exact by
   Gram updates (``tmpl.gram`` precomputed template overlaps): each peak
   is scored against the UNCLAMPED virtual residual
   ``res - sum_i g_i*W_i``.  Scores use the closed form
   ``score = 2*g*<w,W> - g^2*||W||^2`` (== clamped energy reduction minus
   over-subtraction energy; see LoopConfig); flat argmax picks the
   winner; gates: min_gain, min_score_rel, shadow suppression.
4. Masked subtract (clamped at 0, K2 Pallas kernel) + masked note append;
   clamping re-enters through the fresh windows of the NEXT iteration.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, runtime_use_pallas
from ..core.notes import (
    NoteSequence,
    gain_to_velocity,
    note_arrays_to_sequence,
    refit_gains_variants_host,
)
from ..dsp.cqt import logf_spectrogram
from ..dsp.residual import energy as residual_energy
from ..dsp.residual import section as residual_section
from ..dsp.residual import subtract as residual_subtract
from ..dsp.stft import stft_magnitude
from ..synth.templates import (
    duration_grid_frames,
    gram_from_bank,
    make_duration_refiner,
    onset_envelope,
    spectral_profiles,
    template_bank,
    template_lead,
    template_sq_norms,
)

# Candidate onset offsets live in LoopConfig.onset_offsets (shared with
# golden.pipeline through the same config object).

# Decision values (scores, peak heights, energies) are mantissa-truncated
# before every comparison: TPU and CPU float reductions differ in the last
# few ulps, and a single flipped argmax cascades through the greedy loop.
# Truncation makes near-ties land in the same bucket on both backends,
# where the shared first-max rule resolves them identically.  Gains and
# residuals stay full precision.  Must match golden.pipeline.
DECISION_DROP_BITS = 13


def quantize_decisions(x: jnp.ndarray) -> jnp.ndarray:
    i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    mask = jnp.int32(~((1 << DECISION_DROP_BITS) - 1))
    return jax.lax.bitcast_convert_type(i & mask, jnp.float32)


class TemplateArrays(NamedTuple):
    """Device-resident template bank (flattened over instrument*pitch)."""

    bank: jnp.ndarray    # [Q, D, Tmax, F]
    norms: jnp.ndarray   # [Q, D]
    prof: jnp.ndarray    # [Q, F]
    env: jnp.ndarray     # [Tmax]
    durs: jnp.ndarray    # [D] int32
    gram: jnp.ndarray    # [2*Tmax-1, QD, QD] template-overlap Gram


def load_template_arrays(cfg: Config) -> TemplateArrays:
    bank = template_bank(cfg.synth, cfg.dsp)
    n_i, n_p, n_d, tmax, f = bank.shape
    bank = bank.reshape(n_i * n_p, n_d, tmax, f)
    prof = spectral_profiles(cfg.synth, cfg.dsp).reshape(n_i * n_p, f)
    # Gram from the UNPADDED bank: zero F-padding columns contribute zero
    # to every overlap, so padded/unpadded banks share one cache entry.
    gram = gram_from_bank(bank.reshape(n_i * n_p * n_d, tmax, f))
    if runtime_use_pallas(cfg) and f % 128:
        # The Pallas path carries F padded to the 128-lane tiling (sliced
        # DMA alignment).  Zero columns contribute zero to every dot
        # product / energy, so all decisions are unchanged.
        pad = 128 - f % 128
        bank = np.pad(bank, ((0, 0), (0, 0), (0, 0), (0, pad)))
        prof = np.pad(prof, ((0, 0), (0, pad)))
    return TemplateArrays(
        bank=jnp.asarray(bank),
        norms=jnp.asarray(
            template_sq_norms(cfg.synth, cfg.dsp).reshape(n_i * n_p, n_d)),
        prof=jnp.asarray(prof),
        env=jnp.asarray(onset_envelope(cfg.synth, cfg.dsp)),
        durs=jnp.asarray(duration_grid_frames(cfg.synth, cfg.dsp)),
        gram=jnp.asarray(gram),
    )


class NotesBatch(NamedTuple):
    """Device-side struct-of-arrays note container (SURVEY.md §7 step 1)."""

    onset: jnp.ndarray    # [B, cap] int32 frame index
    dur: jnp.ndarray      # [B, cap] int32 frames
    pitch: jnp.ndarray    # [B, cap] int32 pitch index (0-based)
    gain: jnp.ndarray     # [B, cap] float32
    program: jnp.ndarray  # [B, cap] int32 instrument index
    d_idx: jnp.ndarray    # [B, cap] int32 duration-grid index
    sd: jnp.ndarray       # [B, cap, D] float32 quantized scores at ALL
    #                       grid durations (winner's pitch/onset), for the
    #                       host-side continuous duration fit
    dot0: jnp.ndarray     # [B, cap, I*3] float32 quantized <spec^2,
    #                       W^2> of each note's SQUARED atom — for every
    #                       instrument x {-1,0,+1}-duration variant of
    #                       its (pitch, duration) — in the squared
    #                       ORIGINAL spectrogram: the power-domain dots
    #                       for the host-side joint gain refit +
    #                       instrument/duration re-selection
    #                       (LoopConfig.refit_gains; see core.notes
    #                       .refit_gains_variants_host); zeros when off
    # Velocity-head predictions at each note's (onset, q) cell, in
    # [0, 1] — recorded once post-loop in CNN mode for the emission-side
    # velocity blend (RunConfig.velocity_source); zeros otherwise.
    vel_pred: jnp.ndarray  # [B, cap] float32
    count: jnp.ndarray    # [B] int32
    residual_energy: jnp.ndarray  # [B] float32
    # Sanitizer state (SURVEY.md §5): a lane whose residual energy or
    # candidate dots go non-finite is POISONED — it stops extracting and
    # the host emits an empty sequence + a logged event instead of silent
    # garbage notes.
    poison: jnp.ndarray   # [B] bool
    # Saturation flag (SURVEY.md §5 failure detection): true when a
    # candidate passed EVERY acceptance gate but was dropped because the
    # lane's note array was full (count == max_notes).  The host logs a
    # warning and a metric instead of silently truncating the
    # transcription — the "no silent caps" discipline.
    saturated: jnp.ndarray  # [B] bool
    iterations: jnp.ndarray  # [] int32 while_loop trip count (for MFU)
    # Emission-evidence round-A windows (saga/evidence.py), computed
    # post-loop from the ORIGINAL spectrogram and the final note table
    # so the host mid-chain decisions (onset snap, instrument re-pick)
    # need no extra device program — on the axon tunnel every program
    # round-trip costs a sync (~tens of ms), which dominated the
    # evidence pass's wall when round A was standalone.  Zero-size
    # when the config's emission chain cannot use them.
    snap_w: jnp.ndarray   # [B, cap, W+1] f32 e1 at t0..t0+W (or [B,0,0])
    obs_w: jnp.ndarray    # [B, cap, 3, W+3] f32 harmonic onset strips
    #                       (multi-instrument configs; else [B,0,0,0])


class _Carry(NamedTuple):
    res: jnp.ndarray
    notes: NotesBatch
    done: jnp.ndarray
    e0: jnp.ndarray
    it: jnp.ndarray
    # Peak-rejection mask (LoopConfig.peak_rejection_mask): quantized
    # coarse value at which each frame's best candidate was last
    # quality-rejected — the frame is skipped in peak selection while
    # its coarse value still equals this (NaN = never rejected; any
    # subtraction touching the window changes the value and re-arms).
    rej_val: jnp.ndarray  # [B, T] f32
    # Consecutive all-rejected iterations per lane (stop_patience).
    no_acc: jnp.ndarray   # [B] int32


def spectrogram_batch(waves: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """[B, N] waveforms -> [B, T, n_bins] linear log-freq magnitude.

    With ``run.use_pallas`` the fused K1 kernel (framing + window + DFT +
    magnitude + log-binning in one VMEM pass) replaces the rfft path.
    """
    if runtime_use_pallas(cfg):
        from ..ops.spectrogram_pallas import spectrogram_pallas

        # Keep the 128-aligned padded bins (see load_template_arrays).
        return spectrogram_pallas(waves, cfg.dsp, keep_padded_bins=True)
    mag = jax.vmap(lambda w: stft_magnitude(w, cfg.dsp))(waves)
    return logf_spectrogram(mag, cfg.dsp)


def pad_residual(spec: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Front-pad by the template lead, back-pad by the template extent so a
    template placed at padded index p models a note at true frame p.

    The extra 8 rows give the K2 Pallas kernel room for its 8-aligned
    enclosing-window DMA; they are zero and change no computed value
    (energies, matched filter, and windows are unaffected), so golden
    parity is preserved.
    """
    lead = template_lead(cfg.dsp)
    tmax = cfg.synth.template_frames
    return jnp.pad(spec, ((0, 0), (lead, tmax + 8), (0, 0)))


def band_matrix(env: jnp.ndarray, n_frames: int, tp: int) -> jnp.ndarray:
    """[T, Tp] banded envelope matrix: band[t, t+tau] = env[tau].

    Built ONCE outside the while_loop: constructed inside the loop body,
    XLA fused the iota/where/gather construction into the score fusion
    and rebuilt it every iteration off the MXU (~1 ms/iteration, the
    single largest item in the round-1 profile).
    """
    tmax = env.shape[0]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, tp), 0)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (n_frames, tp), 1)
    d = s_idx - t_idx
    return jnp.where((d >= 0) & (d < tmax),
                     env[jnp.clip(d, 0, tmax - 1)], 0.0)


def matmul_precision(cfg: Config) -> jax.lax.Precision:
    """MXU precision for the hot matmuls (see RunConfig.matmul_precision)."""
    if cfg.run.matmul_precision == "high":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.HIGHEST


def heuristic_scores(res: jnp.ndarray, tmpl: TemplateArrays,
                     n_frames: int,
                     band: jnp.ndarray | None = None,
                     precision: jax.lax.Precision =
                     jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Matched-filter coarse scores [B, T, Q] (golden step a).

    Two MXU matmuls instead of a temporal conv (an 80-tap conv over
    [B, Tp, F] compiled ~30x slower than this): project onto spectral
    profiles first, then apply the temporal envelope as a banded [T, Tp]
    matrix — associativity pinned to match the golden path.  Explicit 2D
    dots (reshape/transpose) rather than einsum: the einsum form lowered
    off the MXU inside the loop.
    """
    hi = precision
    b, tp, f = res.shape
    if band is None:
        band = band_matrix(tmpl.env, n_frames, tp)
    n_q = tmpl.prof.shape[0]
    cp = jnp.dot(res.reshape(b * tp, f), tmpl.prof.T, precision=hi,
                 preferred_element_type=jnp.float32).reshape(b, tp, n_q)
    cpt = jnp.transpose(cp, (1, 0, 2)).reshape(tp, b * n_q)
    out = jnp.dot(band, cpt, precision=hi,
                  preferred_element_type=jnp.float32)
    return out.reshape(n_frames, b, n_q).transpose(1, 0, 2)


ScoreFn = Callable[[jnp.ndarray, TemplateArrays, int], jnp.ndarray]


@lru_cache(maxsize=8)
def _duration_groups(cfg: Config) -> tuple:
    """Contiguous duration-grid groups ((d_lo, d_hi, ext), ...) for the
    candidate-dots matmul.

    A 0.125 s atom occupies ~13 of the default 80 template frames; the
    tail is EXACT zeros (synth.templates.bank_frame_extents), so dotting
    it against the full window wastes >80% of that column's MXU work.
    Grouping durations by extent and running one matmul per group against
    the window truncated to the group's extent drops ~40% of the padded
    FLOPs at the default grid — bit-identical dots, since dropped terms
    are exact zeros (adding 0.0 never changes an f32 partial sum).

    The partition minimizes sum(ext_g * pad128(n_q * group_size)) over
    all contiguous partitions into <= 3 groups (the 128-lane pad makes
    many small groups counterproductive).  Only the analytic bank has
    certified extents — the neural bank's learned atoms have no exact
    zeros, so ``run.synth != "analytic"`` gets one full-extent group.
    """
    from ..synth.templates import bank_frame_extents

    n_d = len(cfg.synth.duration_grid)
    tmax = cfg.synth.template_frames
    if cfg.run.synth != "analytic":
        return ((0, n_d, tmax),)
    exts = bank_frame_extents(cfg.synth, cfg.dsp)
    n_q = cfg.synth.n_instruments * cfg.synth.n_pitches

    def cost(parts):
        return sum(max(exts[lo:hi]) *
                   (-(-(n_q * (hi - lo)) // 128) * 128)
                   for lo, hi in parts)

    best = [(0, n_d)]
    for i in range(1, n_d):
        two = [(0, i), (i, n_d)]
        if cost(two) < cost(best):
            best = two
        for j in range(i + 1, n_d):
            three = [(0, i), (i, j), (j, n_d)]
            if cost(three) < cost(best):
                best = three
    return tuple((lo, hi, min(max(exts[lo:hi]), tmax)) for lo, hi in best)


def _group_bank_mats(cfg: Config, tmpl: TemplateArrays) -> tuple:
    """Per-group flattened bank matrices [n_q*(d_hi-d_lo), ext*F] —
    precomputed OUTSIDE the while_loop (see _run_loop) so the slices are
    materialized once, not re-sliced every iteration."""
    n_q = tmpl.norms.shape[0]
    return tuple(
        tmpl.bank[:, lo:hi, :ext, :].reshape(n_q * (hi - lo), -1)
        for lo, hi, ext in _duration_groups(cfg))


def _loop_body(carry: _Carry, *, cfg: Config, tmpl: TemplateArrays,
               n_frames: int, score_fn: ScoreFn,
               bank_mats: tuple | None = None) -> _Carry:
    loop = cfg.loop
    tmax = cfg.synth.template_frames
    n_q, n_d = tmpl.norms.shape
    n_o = len(loop.onset_offsets)
    offsets = jnp.asarray(loop.onset_offsets, dtype=jnp.int32)
    hi = matmul_precision(cfg)

    res, notes = carry.res, carry.notes
    e_cur = residual_energy(res)
    e_q = quantize_decisions(e_cur)
    active = (~carry.done) & (carry.e0 > 0.0) & (
        e_q > quantize_decisions(loop.silence_rel * carry.e0))

    # (1) coarse scores -> up to n_extract peak frames per lane.
    with jax.named_scope("saga_classify"):
        coarse = score_fn(res, tmpl, n_frames)                # [B, T, Q]
    b = coarse.shape[0]
    n_k = max(1, loop.n_extract)
    radius = max(1, loop.peak_mask_radius)
    m_raw = quantize_decisions(jnp.max(coarse, axis=2))       # [B, T]
    # Only LOCAL MAXIMA are eligible peaks: the shoulder of a stronger
    # (masked) peak must not be picked as a separate onset — a masked true
    # onset is simply extracted on a later iteration instead.
    left = jnp.pad(m_raw[:, :-1], ((0, 0), (1, 0)),
                   constant_values=-np.inf)
    right = jnp.pad(m_raw[:, 1:], ((0, 0), (0, 1)),
                    constant_values=-np.inf)
    m0 = jnp.where((m_raw >= left) & (m_raw >= right), m_raw, -jnp.inf)
    if loop.peak_rejection_mask:
        # Skip frames whose best candidate was quality-rejected at this
        # exact (quantized) coarse value — unchanged value means the
        # same rejection would just recur and crowd out weaker true
        # peaks (see LoopConfig.peak_rejection_mask).  NaN never
        # compares equal, so never-rejected frames are unaffected.
        m0 = jnp.where(m_raw == carry.rej_val, -jnp.inf, m0)
    tt = jax.lax.broadcasted_iota(jnp.int32, (b, n_frames), 1)

    def pick(m_cur, _):
        t_i = jnp.argmax(m_cur, axis=1).astype(jnp.int32)     # first-max
        peak = jnp.take_along_axis(m_cur, t_i[:, None], 1)[:, 0]
        m_next = jnp.where(jnp.abs(tt - t_i[:, None]) <= radius,
                           -jnp.inf, m_cur)
        return m_next, (t_i, peak)

    _, (t_sel, peaks) = jax.lax.scan(pick, m0, None, length=n_k,
                                     unroll=True)
    t_sel = jnp.transpose(t_sel)                              # [B, K]
    valid = jnp.transpose(jnp.isfinite(peaks))                # [B, K]

    # (2) batched exact refit (v5): candidate dot products for ALL
    # n_extract peaks are computed in ONE matmul against the
    # iteration-start residual — the template bank streams from HBM once
    # per ITERATION, not once per peak (the round-1 ~0.21 ms/peak floor).
    # The sequential extractions stay exact greedy via Gram updates:
    # subtracting g*W_a at frame t* shifts every candidate dot <w(t), W_b>
    # by -g*gram[t-t*, a, b] (precomputed template overlaps), i.e. each
    # peak is scored against the UNCLAMPED virtual residual
    # res - sum_i g_i*W_i; the real residual is clamped at 0 between
    # iterations as before.  Mirrored op-for-op in golden.pipeline via an
    # explicit virtual residual.
    n_p = cfg.synth.n_pitches
    cap = notes.onset.shape[1]
    thr = quantize_decisions(loop.min_score_rel * e_cur)      # [B]
    if loop.min_score_rel0 > 0:
        # Absolute floor vs INITIAL energy (see LoopConfig): the
        # e_cur-relative bar collapses late in the loop and admits
        # deep-residual junk once the rejection mask extends
        # extraction into the quiet tail.
        thr = jnp.maximum(
            thr, quantize_decisions(loop.min_score_rel0 * carry.e0))

    t_cand = jnp.clip(t_sel[:, :, None] + offsets[None, None, :], 0,
                      n_frames - 1)                           # [B, K, O]

    def lane_windows(res_b, t_b):
        return jax.vmap(lambda t: residual_section(res_b, t, tmax))(t_b)

    windows = jax.vmap(lane_windows)(
        res, t_cand.reshape(b, n_k * n_o))       # [B, K*O, Tmax, F]
    # Duration-grouped dots (see _duration_groups): one matmul per
    # extent group against the window truncated to that group's frames —
    # the dropped template tails are exact zeros, so each dot is
    # bit-identical to the full-window product.
    groups = _duration_groups(cfg)
    mats = (_group_bank_mats(cfg, tmpl) if bank_mats is None
            else bank_mats)
    with jax.named_scope("saga_candidate_scoring"):
        parts = []
        for (lo, hi_d, ext), mat in zip(groups, mats):
            w = windows[:, :, :ext, :].reshape(b * n_k * n_o, -1)
            p = jnp.dot(w, mat.T, precision=hi,
                        preferred_element_type=jnp.float32)
            parts.append(p.reshape(b, n_k, n_o, n_q, hi_d - lo))
        dots0 = jnp.concatenate(parts, axis=-1) if len(parts) > 1 \
            else parts[0]
    dots0 = dots0.reshape(b, n_k, n_o, n_q * n_d)             # [B,K,O,QD]

    # Sanitizer (SURVEY.md §5): a non-finite residual energy or candidate
    # dot poisons the lane — it stops extracting (masked out of `active`)
    # and is flagged for the host instead of feeding NaNs into the greedy
    # argmax (whose NaN comparisons would silently mis-select).
    lane_finite = jnp.isfinite(e_cur) & jnp.all(
        jnp.isfinite(dots0), axis=(1, 2, 3))
    poison = notes.poison | (~lane_finite & ~carry.done)
    active = active & lane_finite

    # Deferred-subtract selection (round-3 restructure): within one
    # iteration the residual is never READ after the coarse/windows
    # stage — greedy selection rides the Gram-updated dots — so the K
    # subtractions and the K note-appends move OFF the selection-
    # critical chain.  The chain keeps only what feeds the next
    # argmax (gates + Gram update); winners are held in registers and
    # appended/subtracted in ONE batched tail.  Bit-identical to the
    # per-step form: same arithmetic in the same order, gates compare
    # the same sets (pre-iteration notes + accepted pending winners),
    # the tail subtracts in k order with per-window clamp.  The profile
    # motivating this: ~0.38 ms of op-launch latency per chained
    # extract step (benchmarks/profile_body.py, round 3).
    allowed = (None if loop.onset_refractory_frac <= 0 else
               _refractory_mask(coarse, t_cand, cfg, tmpl))
    with jax.named_scope("saga_select"):
        # XLA selection chain.  A fused Pallas selection kernel
        # (ops/select_pallas.py, 435 lines) was built, measured ~4-27%
        # SLOWER than this chain after the deferred-subtract
        # restructure removed the op-launch tail it targeted, and
        # DELETED in round 4 (docs/PERFORMANCE.md round-3 negative
        # result; retrievable from git history).
        (t_st, q_st, d_st, g_st, acc_st, sd_st, acc_cum, sat,
         any_acc, rej_st) = _select_chain_xla(
            dots0, t_cand, valid, active, thr, notes, cfg, tmpl,
            allowed=allowed)
    count0 = notes.count

    with jax.named_scope("saga_subtract_append"):
        acc_i32 = acc_st.astype(jnp.int32)
        idx = count0[:, None] + jnp.cumsum(acc_i32, axis=1) - acc_i32
        idx_eff = jnp.where(acc_st, idx, cap)   # OOB -> dropped update
        barr = jnp.arange(b)[:, None]

        def put(arr, val):
            return arr.at[barr, idx_eff].set(val.astype(arr.dtype),
                                             mode="drop")

        notes_new = notes._replace(
            onset=put(notes.onset, t_st),
            dur=put(notes.dur, tmpl.durs[d_st]),
            pitch=put(notes.pitch, q_st % n_p),
            gain=put(notes.gain, g_st),
            program=put(notes.program, q_st // n_p),
            d_idx=put(notes.d_idx, d_st),
            sd=notes.sd.at[barr, idx_eff].set(
                sd_st.astype(notes.sd.dtype), mode="drop"),
            count=count0 + acc_cum,
            saturated=sat,
        )

        gain_eff_st = jnp.where(acc_st, g_st, 0.0)
        w_st = tmpl.bank[q_st, d_st]                      # [B, K, Tmax, F]
        if runtime_use_pallas(cfg):
            from ..ops.subtract_pallas import subtract_multi_pallas

            res_new = subtract_multi_pallas(res, w_st, gain_eff_st, t_st)
        else:
            res_new = res
            for k in range(n_k):
                res_new = jax.vmap(residual_subtract)(
                    res_new, w_st[:, k], gain_eff_st[:, k], t_st[:, k])
    notes_new = notes_new._replace(
        residual_energy=residual_energy(res_new), poison=poison)
    if loop.peak_rejection_mask:
        # Record each quality-rejected peak's (frame, quantized coarse
        # value); the frame is skipped while the value is unchanged.
        # A lane stops only when an iteration neither accepts nor
        # masks anything new, or after stop_patience consecutive
        # all-rejected iterations.
        m_at = jnp.take_along_axis(m_raw, t_sel, axis=1)      # [B, K]
        t_upd = jnp.where(rej_st, t_sel, n_frames)            # OOB drop
        rej_val_new = carry.rej_val.at[
            jnp.arange(b)[:, None], t_upd].set(m_at, mode="drop")
        any_rej = jnp.any(rej_st, axis=1)
    else:
        rej_val_new = carry.rej_val
        any_rej = jnp.zeros_like(any_acc)
    no_acc_new = jnp.where(any_acc, 0,
                           carry.no_acc + active.astype(jnp.int32))
    stop = (~any_acc) & (
        ~any_rej | (no_acc_new >= max(1, loop.stop_patience)))
    return _Carry(res_new, notes_new, stop | carry.done, carry.e0,
                  carry.it + 1, rej_val_new, no_acc_new)


def _refractory_mask(coarse: jnp.ndarray, t_cand: jnp.ndarray,
                     cfg: Config, tmpl: TemplateArrays) -> jnp.ndarray:
    """Onset-refractory duration gate (LoopConfig.onset_refractory_frac).

    For every candidate (peak-slot, offset, pitch) find the next coarse
    local maximum of the same column whose QUANTIZED height reaches
    ``frac`` of the candidate onset's own coarse value; durations whose
    atom would span it are disallowed (shortest grid duration always
    allowed).  All comparisons quantized -> decision-stable across
    backends; golden.pipeline mirrors op-for-op.

    coarse [B, T, Q]; t_cand [B, K, O] -> allowed [B, K, O, Q*D] bool.

    Cost note: only peaks within the LONGEST grid duration of the
    candidate can disallow anything (``durs <= gap`` is vacuously true
    past it), so the scan gathers a static [W]-frame window per
    candidate instead of broadcasting against the full time axis —
    decision-identical, ~T/W× less traffic inside the while body.
    """
    loop = cfg.loop
    b, n_frames, n_q = coarse.shape
    n_d = tmpl.norms.shape[1]
    ko = t_cand.shape[1] * t_cand.shape[2]
    tc = t_cand.reshape(b, ko)

    cq = quantize_decisions(coarse)
    left = jnp.pad(cq[:, :-1], ((0, 0), (1, 0), (0, 0)),
                   constant_values=-np.inf)
    right = jnp.pad(cq[:, 1:], ((0, 0), (0, 1), (0, 0)),
                    constant_values=-np.inf)
    # STRICT rise into the maximum: quantization turns smooth decays
    # into flat steps, and a >= test would mark every step point a
    # "new onset" and shred sustained notes.  A true re-strike rises.
    is_peak = (cq > left) & (cq >= right)
    # ... and must be a PITCH-axis local max within its instrument
    # block: a neighbor pitch's onset leaks into this column through
    # the overlapping log-f bins (measured: a semitone neighbor's
    # onset chopped a held note to its own onset and spawned ghost
    # re-extractions — the round-3 off-grid regression), but the leak
    # peaks at the TRUE pitch, so the cross-talk column is never the
    # local max across pitch.
    n_i = int(cfg.synth.n_instruments)
    n_p = n_q // n_i
    cq4 = cq.reshape(b, n_frames, n_i, n_p)
    pleft = jnp.pad(cq4[..., :-1], ((0, 0), (0, 0), (0, 0), (1, 0)),
                    constant_values=-np.inf)
    pright = jnp.pad(cq4[..., 1:], ((0, 0), (0, 0), (0, 0), (0, 1)),
                     constant_values=-np.inf)
    is_pmax = ((cq4 >= pleft) & (cq4 >= pright)).reshape(
        b, n_frames, n_q)
    is_peak = is_peak & is_pmax

    v0 = jnp.take_along_axis(
        cq, jnp.broadcast_to(tc[:, :, None], (b, ko, n_q)),
        axis=1)                                            # [B, KO, Q]
    thrv = quantize_decisions(loop.onset_refractory_frac * v0)

    sep = max(1, loop.peak_mask_radius)
    w_hi = int(np.max(duration_grid_frames(cfg.synth, cfg.dsp)))
    offs = jnp.arange(sep + 1, w_hi + 1, dtype=jnp.int32)  # [W]
    n_w = int(offs.shape[0])
    far = jnp.int32(w_hi + 1)                # > every grid duration
    if n_w == 0:
        gap = jnp.full((b, ko, n_q), far, jnp.int32)
    else:
        idx = tc[:, :, None] + offs[None, None, :]         # [B, KO, W]
        in_rng = (idx < n_frames).reshape(b, ko * n_w)
        idx_f = jnp.clip(idx, 0, n_frames - 1).reshape(b, ko * n_w)
        gat = lambda x: jnp.take_along_axis(
            x, jnp.broadcast_to(idx_f[:, :, None],
                                (b, ko * n_w, n_q)), axis=1
        ).reshape(b, ko, n_w, n_q)
        cond = (in_rng.reshape(b, ko, n_w)[..., None]
                & gat(is_peak)
                & (gat(cq) >= thrv[:, :, None, :]))        # [B,KO,W,Q]
        gap = jnp.min(jnp.where(cond, offs[None, None, :, None], far),
                      axis=2)                              # [B, KO, Q]
    allowed = tmpl.durs[None, None, None, :] <= gap[..., None]
    allowed = allowed.at[..., 0].set(True)       # [B, KO, Q, D]
    return allowed.reshape(b, t_cand.shape[1], t_cand.shape[2],
                           n_q * n_d)


def _select_chain_xla(dots0: jnp.ndarray, t_cand: jnp.ndarray,
                      valid: jnp.ndarray, active: jnp.ndarray,
                      thr: jnp.ndarray, notes: NotesBatch, cfg: Config,
                      tmpl: TemplateArrays,
                      allowed: jnp.ndarray | None = None) -> tuple:
    """Greedy K-step winner selection over Gram-updated candidate dots.

    Pure function of (dots0 [B,K,O,QD], t_cand [B,K,O], valid [B,K],
    active [B], thr [B], pre-iteration notes).  Returns
    ``(t_st, q_st, d_st, g_st [B,K], acc_st [B,K] bool, sd_st [B,K,D],
    acc_cum [B] i32, sat [B] bool, any_acc [B] bool, rej_st [B,K]
    bool)``.  ``rej_st`` marks peaks whose best candidate failed a
    QUALITY gate (not capacity) — input to the peak-rejection mask.
    """
    loop = cfg.loop
    tmax = cfg.synth.template_frames
    n_q, n_d = tmpl.norms.shape
    n_o = len(loop.onset_offsets)
    n_p = cfg.synth.n_pitches
    b = dots0.shape[0]
    n_k = max(1, loop.n_extract)
    cap = notes.onset.shape[1]
    nrm_flat = jnp.maximum(tmpl.norms.reshape(n_q * n_d), 1e-12)

    count0 = notes.count
    slot = jnp.arange(cap)[None, :]
    prev = slot < count0[:, None]                             # [B, C]
    q_notes = notes.program * n_p + notes.pitch               # [B, C]

    dots_i = dots0
    acc_cum = jnp.zeros((b,), jnp.int32)
    any_acc = jnp.zeros((b,), bool)
    sat = notes.saturated
    win_t, win_q, win_d, win_g, win_acc, win_sd = [], [], [], [], [], []
    win_dur = []  # winner duration in frames (duration-aware shadow)
    win_rej = []  # quality-rejected flags (peak-rejection mask)

    with jax.named_scope("select_steps"):
        for i in range(n_k):
            dots = dots_i[:, i]                               # [B, O, QD]
            g_all = jnp.maximum(dots / nrm_flat[None, None, :], 0.0)
            s_all = (2.0 * g_all * dots
                     - jnp.square(g_all) * nrm_flat[None, None, :])
            # -> [B, Q*D*O] in golden's C-order (q, d, o)
            g_flat = jnp.transpose(
                g_all.reshape(b, n_o, n_q, n_d),
                (0, 2, 3, 1)).reshape(b, -1)
            s_flat = quantize_decisions(jnp.transpose(
                s_all.reshape(b, n_o, n_q, n_d),
                (0, 2, 3, 1))).reshape(b, -1)

            if allowed is not None:
                # Refractory-disallowed durations never win; the
                # recorded sd curve (below) stays unmasked so the
                # host-side continuous fit sees the raw scores.
                a_flat = jnp.transpose(
                    allowed[:, i].reshape(b, n_o, n_q, n_d),
                    (0, 2, 3, 1)).reshape(b, -1)
                s_sel = jnp.where(a_flat, s_flat, -jnp.inf)
            else:
                s_sel = s_flat
            best = jnp.argmax(s_sel, axis=1)                  # [B]
            g_best = jnp.take_along_axis(g_flat, best[:, None], 1)[:, 0]
            s_best = jnp.take_along_axis(s_flat, best[:, None], 1)[:, 0]
            q_best = best // (n_d * n_o)
            d_best = (best // n_o) % n_d
            o_best = best % n_o
            t_best = jnp.take_along_axis(t_cand[:, i], o_best[:, None],
                                         1)[:, 0]

            gq = quantize_decisions(g_best)
            want = (active & valid[:, i]
                    & (gq >= loop.min_gain)
                    & (s_best >= thr))

            if loop.shadow_gain_frac > 0:
                # Shadow suppression (see LoopConfig) against ALL notes
                # extracted so far: committed ones via the [B, C]
                # arrays, this iteration's accepted winners via the
                # pending registers.  LoopConfig.shadow_window picks
                # the blanket template-extent window (default) or the
                # duration-aware one (residue lives where the
                # subtracted atom had energy — pairs with the
                # refractory gate for repeated-note material).
                if loop.shadow_window == "duration":
                    near = ((t_best[:, None]
                             >= notes.onset - loop.shadow_lead_frames)
                            & (t_best[:, None]
                               <= notes.onset + notes.dur
                               + loop.shadow_tail_frames))
                else:
                    near = jnp.abs(t_best[:, None] - notes.onset) <= tmax
                weak = gq[:, None] < quantize_decisions(
                    loop.shadow_gain_frac * notes.gain)
                hit = jnp.any(prev & (q_best[:, None] == q_notes)
                              & near & weak, axis=1)
                for j in range(i):
                    if loop.shadow_window == "duration":
                        near_j = ((t_best
                                   >= win_t[j] - loop.shadow_lead_frames)
                                  & (t_best <= win_t[j] + win_dur[j]
                                     + loop.shadow_tail_frames))
                    else:
                        near_j = jnp.abs(t_best - win_t[j]) <= tmax
                    hit = hit | (win_acc[j] & (q_best == win_q[j])
                                 & near_j
                                 & (gq < quantize_decisions(
                                     loop.shadow_gain_frac * win_g[j])))
                want = want & ~hit

            if loop.harmonic_shadow_frac > 0:
                # Harmonic-phantom suppression (see LoopConfig): pitch
                # on a low harmonic of a concurrent same-instrument
                # stronger note, gain below the fraction -> mismatch
                # energy, not a note.  Order pinned: after shadow,
                # before capacity (golden mirrors).
                same_prog = notes.program == (q_best // n_p)[:, None]
                ivl = (q_best % n_p)[:, None] - notes.pitch    # [B, C]
                harm = jnp.zeros_like(same_prog)
                for iv in loop.harmonic_intervals:
                    harm = harm | (ivl == iv)
                near = (jnp.abs(t_best[:, None] - notes.onset)
                        <= loop.harmonic_shadow_radius)
                hweak = gq[:, None] < quantize_decisions(
                    loop.harmonic_shadow_frac * notes.gain)
                hit = jnp.any(prev & same_prog & harm & near & hweak,
                              axis=1)
                for j in range(i):
                    ivl_j = q_best % n_p - win_q[j] % n_p
                    harm_j = jnp.zeros_like(hit)
                    for iv in loop.harmonic_intervals:
                        harm_j = harm_j | (ivl_j == iv)
                    hit = hit | (win_acc[j]
                                 & ((q_best // n_p) == (win_q[j] // n_p))
                                 & harm_j
                                 & (jnp.abs(t_best - win_t[j])
                                    <= loop.harmonic_shadow_radius)
                                 & (gq < quantize_decisions(
                                     loop.harmonic_shadow_frac
                                     * win_g[j])))
                want = want & ~hit

            # Quality rejection (for the peak-rejection mask): an
            # eligible peak whose best candidate failed min_gain /
            # min_score / shadow / harmonic-shadow.  Capacity drops
            # (below) are NOT rejections — the candidate was good.
            rej = active & valid[:, i] & ~want

            # Capacity gate LAST: a candidate that passes every quality
            # gate but finds the note array full marks the lane
            # saturated — the host warns instead of silently truncating.
            under_cap = (count0 + acc_cum) < cap
            acc = want & under_cap
            sat = sat | (want & ~under_cap)
            acc_cum = acc_cum + acc.astype(jnp.int32)
            any_acc = any_acc | acc

            # Winner's quantized scores at ALL duration-grid indices
            # (same pitch/onset candidate), recorded for the HOST-side
            # continuous duration fit (f64 rank-1 cross-correlation
            # estimator, shared with the golden path; see
            # synth.templates.DurationRefiner).
            dd = jax.lax.broadcasted_iota(jnp.int32, (b, n_d), 1)
            j_all = (q_best[:, None] * (n_d * n_o) + dd * n_o
                     + o_best[:, None])
            sd_val = jnp.take_along_axis(s_flat, j_all, axis=1)

            win_t.append(t_best)
            win_q.append(q_best)
            win_d.append(d_best)
            win_g.append(g_best)
            win_acc.append(acc)
            win_sd.append(sd_val)
            win_dur.append(tmpl.durs[d_best])
            win_rej.append(rej)

            if i + 1 < n_k:
                # Gram update: keep every candidate dot exact w.r.t.
                # the virtual residual after subtracting
                # gain_eff * W_[q,d]_best at t_best.  Skipped on the
                # last step — the updated dots are never re-read.
                gain_eff = jnp.where(acc, g_best, 0.0)
                qd_best = q_best * n_d + d_best               # [B]
                dt = t_cand - t_best[:, None, None]           # [B, K, O]
                k_idx = jnp.clip(dt + (tmax - 1), 0, 2 * tmax - 2)
                gv = tmpl.gram[k_idx, qd_best[:, None, None], :]
                upd = jnp.where((jnp.abs(dt) < tmax)[..., None], gv, 0.0)
                dots_i = dots_i - gain_eff[:, None, None, None] * upd

    return (jnp.stack(win_t, axis=1), jnp.stack(win_q, axis=1),
            jnp.stack(win_d, axis=1), jnp.stack(win_g, axis=1),
            jnp.stack(win_acc, axis=1), jnp.stack(win_sd, axis=1),
            acc_cum, sat, any_acc, jnp.stack(win_rej, axis=1))


def _run_loop(spec: jnp.ndarray, cfg: Config, tmpl: TemplateArrays,
              score_fn: ScoreFn, max_iters: jnp.ndarray | None) -> _Carry:
    """Run the SAGA while_loop; returns the final carry (residual
    included).  ``max_iters`` (traced scalar, optional) caps the trip
    count — the mid-transcription state capture used to train the
    classifier on the loop's OWN residual distribution."""
    n_frames = spec.shape[1]
    cap = cfg.loop.max_notes
    b = spec.shape[0]
    res = pad_residual(spec, cfg)
    e0 = jnp.sum(jnp.square(res), axis=(1, 2))
    notes0 = NotesBatch(
        onset=jnp.zeros((b, cap), jnp.int32),
        dur=jnp.zeros((b, cap), jnp.int32),
        pitch=jnp.zeros((b, cap), jnp.int32),
        gain=jnp.zeros((b, cap), jnp.float32),
        program=jnp.zeros((b, cap), jnp.int32),
        d_idx=jnp.zeros((b, cap), jnp.int32),
        sd=jnp.zeros((b, cap, len(cfg.synth.duration_grid)), jnp.float32),
        dot0=jnp.zeros((b, cap, cfg.synth.n_instruments * 3),
                       jnp.float32),
        vel_pred=jnp.zeros((b, cap), jnp.float32),
        count=jnp.zeros((b,), jnp.int32),
        residual_energy=e0,
        poison=jnp.zeros((b,), bool),
        saturated=jnp.zeros((b,), bool),
        iterations=jnp.zeros((), jnp.int32),
        snap_w=jnp.zeros((b, 0, 0), jnp.float32),
        obs_w=jnp.zeros((b, 0, 0, 0), jnp.float32),
    )
    carry0 = _Carry(res, notes0, jnp.zeros((b,), bool), e0,
                    jnp.zeros((), jnp.int32),
                    jnp.full((b, n_frames), jnp.nan, jnp.float32),
                    jnp.zeros((b,), jnp.int32))

    if score_fn is heuristic_scores:
        # Precompute the loop-invariant band matrix OUTSIDE the while_loop
        # (see band_matrix); it enters the loop as a carried constant.
        band = band_matrix(tmpl.env, n_frames, res.shape[1])
        score_fn = partial(heuristic_scores, band=band,
                           precision=matmul_precision(cfg))
    elif getattr(score_fn, "needs_band", False):
        # Same hoist for score fns that consume the band matrix (the CNN
        # path's matched-filter term — see models.classifier).
        band = band_matrix(tmpl.env, n_frames, res.shape[1])
        pre = getattr(score_fn, "precompute_gate", None)
        if pre is not None:
            # Static-gate CNN mode (run.cnn_gate="static"): the conv
            # tower runs ONCE on the pristine spectrogram; the gate map
            # enters the while_loop as a carried constant, leaving only
            # the matched-filter matmuls per iteration.
            gate_rel = pre(spec[:, :, :cfg.dsp.n_bins])
            score_fn = partial(score_fn, band=band, gate_rel=gate_rel)
        else:
            score_fn = partial(score_fn, band=band)

    lim = cap if max_iters is None else jnp.minimum(cap, max_iters)
    body = partial(_loop_body, cfg=cfg, tmpl=tmpl, n_frames=n_frames,
                   score_fn=score_fn,
                   bank_mats=_group_bank_mats(cfg, tmpl))
    out = jax.lax.while_loop(
        lambda c: (c.it < lim) & jnp.any(~c.done), body, carry0)
    # (An OMP debias-then-resweep second pass lived here in round 3
    # (loop.rescan_iterations), measured quality-NEGATIVE on the pinned
    # suites — 4-voice F1 0.9501 -> 0.9463, multi-instrument FP bursts —
    # shipped default-off, and was DELETED in round 4; see
    # docs/PERFORMANCE.md and git history.)
    if cfg.loop.refit_gains:
        # Inputs for the host-side joint gain re-projection
        # (core.notes.refit_gains_host): each accepted note's atom dotted
        # with the ORIGINAL padded spectrogram (res is the pre-loop
        # residual, untouched by the while_loop's carried copy).
        dot0 = _original_spec_dots(res, out.notes, cfg, tmpl)
        out = out._replace(notes=out.notes._replace(dot0=dot0))
    return out


def _original_spec_dots(spec_padded: jnp.ndarray, notes: NotesBatch,
                        cfg: Config, tmpl: TemplateArrays) -> jnp.ndarray:
    """[B, cap, I*3] quantized POWER-domain dots <spec^2, W^2> for every
    note slot x variant (garbage beyond ``count`` — the host refit only
    reads the first ``count`` entries).  Squared because overlapping
    magnitudes add in quadrature; the variants are every instrument x
    the {-1, 0, +1} duration-grid neighbors of the note's choice
    (clipped at the edges), so the host refit can RE-SELECT instrument
    AND duration inside the joint fit (see
    core.notes.refit_gains_variants_host).

    One while_loop step per USED slot (bounded by the batch's max note
    count, not the static capacity): I*3 x [B, Tmax, F] atom gathers +
    one window gather + elementwise dots.  Runs ONCE per batch after the
    while_loop (not per iteration).
    """
    tmax = cfg.synth.template_frames
    n_q, n_d = tmpl.norms.shape
    n_p = cfg.synth.n_pitches
    n_i = cfg.synth.n_instruments
    b = notes.onset.shape[0]
    cap = notes.onset.shape[1]
    bank_flat = tmpl.bank.reshape(n_q * n_d, tmax, -1)
    n_used = jnp.max(notes.count)

    dd = jnp.asarray([-1, 0, 1], jnp.int32)
    # Squared inputs hoisted OUT of the loop: squaring inside the body
    # applies to the gathered window/atoms, which XLA cannot hoist.
    spec2 = jnp.square(spec_padded)                     # [B, Tp, F]
    bank2 = jnp.square(bank_flat)                       # [QD, Tmax, F]

    # CHUNK independent single-slot computations per while step: the
    # slots have no data dependency on each other, so unrolling them
    # inside one step lets XLA overlap their gathers — amortizing the
    # ~0.1 ms/step of serialized dispatch this stage measured when it
    # ran one slot per step (on dense sorted sub-batches, n_used ~40,
    # this stage was ~25% of the whole wall).  A batched [B, chunk, ...]
    # gather form measured ~5% SLOWER (it materialized the atoms tensor
    # instead of fusing gather -> multiply-reduce) — replicating the
    # fused single-slot program is the shape XLA compiles well.  Slots
    # in the round-up tail compute garbage, which the contract permits
    # (the host refit reads only the first ``count`` entries).
    chunk = 8 if cap % 8 == 0 else 1

    def one(a, acc):
        win2 = jax.vmap(
            lambda r2, t: residual_section(r2, t, tmax))(
                spec2, notes.onset[:, a])                # [B, Tmax, F]
        d_var = jnp.clip(notes.d_idx[:, a, None] + dd[None, :],
                         0, n_d - 1)                     # [B, 3]
        qd_all = ((jnp.arange(n_i)[None, :, None] * n_p
                   + notes.pitch[:, a, None, None]) * n_d
                  + d_var[:, None, :]).reshape(-1, n_i * 3)  # [B, I*3]
        atoms2 = bank2[qd_all]                         # [B, I*3, Tmax, F]
        d = jnp.sum(atoms2 * win2[:, None], axis=(2, 3))
        return acc.at[:, a, :].set(d)

    def step(state):
        a, acc = state
        for j in range(chunk):
            acc = one(a + j, acc)
        return a + chunk, acc

    _, dots = jax.lax.while_loop(
        lambda s: s[0] < n_used, step,
        (jnp.zeros((), jnp.int32),
         jnp.zeros((b, cap, n_i * 3), jnp.float32)))
    return quantize_decisions(dots)


def transcribe_spectrograms(spec: jnp.ndarray, cfg: Config,
                            tmpl: TemplateArrays,
                            score_fn: ScoreFn = heuristic_scores,
                            ) -> NotesBatch:
    """[B, T, F] linear log-freq spectrograms -> NotesBatch (jittable)."""
    out = _run_loop(spec, cfg, tmpl, score_fn, None)
    notes = out.notes
    vfn = getattr(score_fn, "velocity_fn", None)
    if vfn is not None and cfg.run.velocity_source != "gain":
        # CNN mode: record the velocity head at each accepted note's
        # (onset, q) cell — one model pass over the ORIGINAL spectrogram
        # post-loop (RunConfig.velocity_source consumes it at emission).
        q = notes.program * cfg.synth.n_pitches + notes.pitch
        notes = notes._replace(vel_pred=vfn(
            spec[:, :, :cfg.dsp.n_bins], notes.onset, q))
    return notes._replace(iterations=out.it)


def transcribe_partial(spec: jnp.ndarray, cfg: Config,
                       tmpl: TemplateArrays, max_iters: jnp.ndarray,
                       score_fn: ScoreFn = heuristic_scores,
                       ) -> tuple[NotesBatch, jnp.ndarray]:
    """Run at most ``max_iters`` loop iterations; returns (notes-so-far,
    UNPADDED residual [B, T, F] sliced back to true frames/bins).

    ``max_iters`` is a traced scalar, so ONE compiled program serves every
    cut point — the classifier trainer samples random cuts per batch
    (runtime/examples.make_loop_state_batch) to cover the loop's whole
    residual state distribution.
    """
    out = _run_loop(spec, cfg, tmpl, score_fn, max_iters)
    lead = template_lead(cfg.dsp)
    res = out.res[:, lead:lead + spec.shape[1], :spec.shape[2]]
    return out.notes._replace(iterations=out.it), res


def transcribe_waves(waves: jnp.ndarray, cfg: Config, tmpl: TemplateArrays,
                     score_fn: ScoreFn = heuristic_scores) -> NotesBatch:
    """[B, N] waveforms -> NotesBatch; the full jittable device program.

    A [M, B, N] input runs M sub-batches SEQUENTIALLY on device inside
    ONE program (lax.map; every NotesBatch field gains a leading [M]
    axis).  Each sub-batch keeps its own lockstep trip count — unlike
    one giant [M*B] batch, a dense sub-batch does not inflate the
    others' iterations — while the per-dispatch host/RPC cost (~36 ms
    measured through the axon tunnel, > 3x the device time of a
    64-clip batch) amortizes over all M."""
    if waves.ndim == 3:
        return jax.lax.map(
            lambda w: transcribe_waves(w, cfg, tmpl, score_fn), waves)
    spec = spectrogram_batch(waves, cfg)
    notes = transcribe_spectrograms(spec, cfg, tmpl, score_fn)
    loop = cfg.loop
    if (loop.onset_snap_frames > 0
            or (loop.instrument_evidence_margin > 0
                and cfg.synth.n_instruments > 1)):
        from .evidence import emission_windows

        t_raw = cfg.dsp.raw_num_frames(int(waves.shape[-1]))
        snap_w, obs_w = emission_windows(
            spec[:, :t_raw, :cfg.dsp.n_bins], notes.onset, notes.pitch,
            cfg)
        notes = notes._replace(snap_w=snap_w, obs_w=obs_w)
    return notes


class Transcriber:
    """Host-facing transcription front door (SURVEY.md L5/L6).

    Compiles one XLA program per (batch, n_samples) shape; feeds waveform
    batches in, converts note arrays to NoteSequences on the host (float64
    tick/velocity quantization — shared with the golden path).
    """

    def __init__(self, cfg: Config, score_fn: ScoreFn = heuristic_scores,
                 tmpl: TemplateArrays | None = None,
                 aot_dir: str | None = None, mesh=None):
        self.cfg = cfg
        # tmpl override: e.g. a bank generated by the SING-style neural
        # synthesizer (models/synth_decoder.py) instead of the analytic one.
        self._tmpl_overridden = tmpl is not None
        self.tmpl = tmpl if tmpl is not None else load_template_arrays(cfg)
        self._score_fn = score_fn
        self.mesh = mesh
        # Input placement for the feeder: the data-sharded spec in
        # multi-device mode, default single-device placement otherwise.
        self.input_sharding = None
        # Templates enter as a jit ARGUMENT, not a closure constant: the
        # Gram tensor is hundreds of MB at default config, and baking it
        # into the program blows the axon remote-compile request limit
        # (HTTP 413); as an argument only its SHAPE is compiled and the
        # data uploads once via device_put.
        aot_dir = aot_dir or cfg.run.aot_cache or None
        if mesh is not None:
            # Multi-device mode (SURVEY.md §2.3 DP row): batch shards
            # over the mesh's 'data' axis, note arrays likewise,
            # templates replicate.  With an AOT cache dir the SHARDED
            # executable serializes too (keyed on the mesh's device
            # count), so a later mesh-mode process skips the compile —
            # round-3 verdict item 6: a v4-8 corpus run paid the
            # worst-case axon compile on every launch.
            from ..parallel.sharding import sharded_transcribe_fn

            fn, repl, self.input_sharding = sharded_transcribe_fn(
                cfg, mesh, self.tmpl, self._score_fn)
            if aot_dir:
                from ..runtime.aot import AotCache

                fn = AotCache(None, cfg.to_json(), aot_dir, jit_fn=fn,
                              devices=list(mesh.devices.flat))
            self._call = fn
            self._tmpl_dev = jax.device_put(self.tmpl, repl)
            return
        self._tmpl_dev = jax.device_put(self.tmpl)
        fn = lambda waves, tmpl: transcribe_waves(waves, cfg, tmpl,  # noqa: E731
                                                  self._score_fn)
        if aot_dir:
            # AOT executable cache (runtime/aot.py): reload the COMPILED
            # program in later processes — no tracing, no backend compile.
            from ..runtime.aot import AotCache

            self._call = AotCache(fn, cfg.to_json(), aot_dir)
        else:
            self._call = jax.jit(fn)

    def _fn(self, waves):
        """Async-dispatch the jitted program on a device waveform batch."""
        return self._call(waves, self._tmpl_dev)

    def warmup(self, batch: int, lengths, stack: int = 1) -> None:
        """Start resolving the compiled program(s) for these
        (batch, n_samples) shapes on a background thread, so the serving
        path never pays load/compile/first-execution (the axon
        server-side finalize can cost minutes) synchronously.  The
        corpus runner calls this right after planning its batch shapes;
        the warmup overlaps WAV loading and spectrogram feeding.  A
        serving call that arrives first simply does the work itself
        (per-key lock — never duplicated).  ``stack > 1`` warms the
        stacked-dispatch [stack, batch, n] program instead (the bench's
        shape; the evidence pass always runs per sub-batch)."""
        from ..runtime.aot import AotCache

        def shape(n):
            return ((stack, batch, int(n)) if stack > 1
                    else (batch, int(n)))

        ev = self.evidence_runner()
        if ev is not None:
            for n in lengths:
                ev.warmup_async(batch, int(n))
        if isinstance(self._call, AotCache):
            for n in lengths:
                self._call.warmup_async(
                    jnp.zeros(shape(n), jnp.float32),
                    self._tmpl_dev)
        else:
            # Plain jit / sharded mode: dispatch a dummy batch per shape
            # from a daemon thread; jit's internal locking makes a
            # concurrent serving call wait for (not repeat) the compile.
            import threading

            def run():
                for n in lengths:
                    try:
                        jax.device_get(self._fn(
                            jnp.zeros(shape(n), jnp.float32)))
                    except Exception as e:  # surfaces on the real call
                        from ..utils.logging import get_logger

                        get_logger("amt_saga_tpu.saga").warning(
                            "warmup failed (%s)", e)
                        return

            threading.Thread(target=run, daemon=True,
                             name="jit-warmup").start()

    def startup_stats(self) -> dict:
        """Per-shape startup cost breakdown (load_s / compile_s /
        first_exec_s / source) when the AOT cache is active; {} otherwise."""
        return dict(getattr(self._call, "stats", {}) or {})

    # Note-axis shrink buckets for fetch_notes (< loop.max_notes cap).
    _FETCH_BUCKETS = (32, 64, 128)

    def _shrink_fn(self, m: int):
        fns = getattr(self, "_shrink_fns", None)
        if fns is None:
            fns = self._shrink_fns = {}
        fn = fns.get(m)
        if fn is None:
            fields = ("onset", "dur", "pitch", "gain", "program",
                      "d_idx", "sd", "dot0", "vel_pred", "snap_w",
                      "obs_w")

            def s(nb):
                return nb._replace(**{f: getattr(nb, f)[:, :m]
                                      for f in fields})

            fn = fns[m] = jax.jit(s)
        return fn

    def fetch_notes(self, notes):
        """device_get with a count-bucketed device-side shrink along
        the notes axis.  The note arrays are padded to loop.max_notes,
        but typical content fills < 32 rows — and the axon tunnel
        moves ~30 MB/s, so fetching the full [B, cap, ...] tree costs
        ~90 ms/batch in pure transfer (measured).  The smallest-bucket
        slice is dispatched EAGERLY (async) so the common path is ONE
        device_get (counts + sliced tree) — the count-first two-leg
        fetch paid a second axon execute-to-ready sync per batch; only
        a batch whose fullest lane overflows the first bucket pays a
        second, larger fetch.  Mesh mode keeps the plain fetch (sliced
        gathers would need their own shardings for marginal gain at
        multi-host scale)."""
        if self.mesh is not None:
            return jax.device_get(notes)
        return self.fetch_notes_shrunk(notes, self.dispatch_shrink(notes))

    def dispatch_shrink(self, notes):
        """Asynchronously dispatch the smallest-bucket note-axis slice
        (or None when the cap is already small / mesh mode).  Call on
        the MAIN thread at dispatch time: the jit dispatch needs the
        GIL, so doing it on the fetcher thread made the fetch stall
        behind the host emission Python instead of overlapping it."""
        if self.mesh is not None:
            return None
        b0 = self._FETCH_BUCKETS[0]
        if b0 < int(notes.onset.shape[1]):
            return self._shrink_fn(b0)(notes)
        return None

    def fetch_notes_shrunk(self, notes, small):
        """device_get of a dispatched (notes, small) pair — one
        transfer on the common path (see fetch_notes); GIL-free, safe
        for a fetcher thread."""
        if small is not None:
            count, small_host = jax.device_get((notes.count, small))
            mx = int(np.max(count))
            if mx <= int(small.onset.shape[1]):
                return small_host
        else:
            mx = int(np.max(jax.device_get(notes.count)))
        cap = int(notes.onset.shape[1])
        for m in self._FETCH_BUCKETS:
            if mx <= m < cap:
                notes = self._shrink_fn(m)(notes)
                break
        return jax.device_get(notes)

    def host_gram(self) -> np.ndarray | None:
        """Host-side POWER-domain Gram of THIS transcriber's bank (for
        the joint gain refit) — consistent with a neural-bank tmpl
        override, unlike the analytic default inside
        notes_batch_to_sequences.  Squared-atom overlaps, computed once
        (content-addressed disk cache inside gram_from_bank)."""
        if not self.cfg.loop.refit_gains:
            return None
        if not hasattr(self, "_gram_pow_np"):
            # Slice the Pallas F-padding columns off BEFORE squaring:
            # the zero columns are value-neutral, but keeping them would
            # change the content-address (a duplicate multi-hundred-MB
            # cache entry) and the sgemm K extent (summation order — and
            # these floats feed the refit UNquantized, so the golden
            # path's unpadded computation must be matched exactly).
            bank = np.asarray(self.tmpl.bank)[..., :self.cfg.dsp.n_bins]
            q, d, tmax, f = bank.shape
            self._gram_pow_np = gram_from_bank(
                np.square(bank).reshape(q * d, tmax, f))
        return self._gram_pow_np

    def duration_refiner(self):
        """The continuous-duration estimator consistent with THIS
        transcriber's bank — or None when refinement must stay off: the
        fit table is built from the ANALYTIC bank's fine-duration
        renders, so with a tmpl override (e.g. the neural bank) the
        recorded scores follow a different model and refinement would
        bias durations; such banks keep grid durations."""
        if not self.cfg.loop.refine_duration or self._tmpl_overridden:
            return None
        return make_duration_refiner(self.cfg.synth, self.cfg.dsp)

    def snaps_onsets(self) -> bool:
        """Emission refinement (onset snap / twin dedup / re-strike
        split) active for this transcriber?  Mirrors duration_refiner:
        all three read the ANALYTIC harmonic model (integer-multiple
        partials), so a template-bank override keeps them off."""
        loop = self.cfg.loop
        return ((loop.onset_snap_frames > 0 or loop.restrike_split
                 or loop.dedup_twins)
                and not self._tmpl_overridden)

    def evidence_runner(self):
        """The device emission-evidence pass for this transcriber, or
        None when the pure-host chain applies (CPU backend /
        run.emission_evidence=False / template-bank override / extents
        beyond the device window cap) — saga/evidence.py."""
        if not self.snaps_onsets():
            return None
        if getattr(self, "_evidence", None) is None:
            from .evidence import EvidenceRunner, runtime_emission_device

            if not runtime_emission_device(self.cfg):
                self._evidence = False
            else:
                runner = EvidenceRunner(self.cfg, mesh=self.mesh)
                self._evidence = runner if runner.usable else False
        return self._evidence or None

    def transcribe_batch(self, waves: np.ndarray) -> list[NoteSequence]:
        waves = np.asarray(waves)
        dev = jnp.asarray(waves)
        notes = jax.device_get(self._fn(dev))
        ev = self.evidence_runner()
        if ev is not None:
            seqs = notes_batch_to_sequences(
                notes, self.cfg, gram=self.host_gram(),
                refiner=self.duration_refiner(), snap_waves=None)
            return ev.refine_batch(seqs, dev, waves,
                                   snap_w=np.asarray(notes.snap_w),
                                   obs_w=np.asarray(notes.obs_w))
        return notes_batch_to_sequences(
            notes, self.cfg, gram=self.host_gram(),
            refiner=self.duration_refiner(),
            snap_waves=waves if self.snaps_onsets() else None)

    def transcribe(self, wave: np.ndarray) -> NoteSequence:
        return self.transcribe_batch(np.asarray(wave)[None])[0]


def _host_gram_analytic(cfg: Config) -> np.ndarray:
    """Host-side POWER-domain analytic-bank Gram for the joint gain
    refit (content-addressed disk cache inside gram_from_bank makes
    repeat calls a file load; module-level memo makes them free)."""
    key = (cfg.synth, cfg.dsp)
    hit = _HOST_GRAM_MEMO.get(key)
    if hit is None:
        bank = template_bank(cfg.synth, cfg.dsp)
        n_i, n_p, n_d, tmax, f = bank.shape
        hit = gram_from_bank(
            np.square(bank).reshape(n_i * n_p * n_d, tmax, f))
        _HOST_GRAM_MEMO.clear()  # keep at most one (hundreds of MB)
        _HOST_GRAM_MEMO[key] = hit
    return hit


_HOST_GRAM_MEMO: dict = {}


_AUTO_REFINER = object()  # sentinel: build the analytic-bank refiner


def notes_batch_to_sequences(notes: NotesBatch, cfg: Config,
                             gram: np.ndarray | None = None,
                             refiner=_AUTO_REFINER,
                             snap_waves: np.ndarray | None = None
                             ) -> list[NoteSequence]:
    if refiner is _AUTO_REFINER:
        refiner = (make_duration_refiner(cfg.synth, cfg.dsp)
                   if cfg.loop.refine_duration else None)
    refine = cfg.loop.refine_duration and refiner is not None
    refit = cfg.loop.refit_gains
    if refit and gram is None:
        gram = _host_gram_analytic(cfg)
    n_p, n_d = cfg.synth.n_pitches, len(cfg.synth.duration_grid)
    poison = np.asarray(notes.poison)
    saturated = np.asarray(notes.saturated)
    if saturated.any():
        # Failure detection (SURVEY.md §5): the note array filled while
        # acceptable candidates remained — the transcription is
        # truncated.  Warn (per batch) instead of failing: the notes
        # emitted so far are still valid; raise loop.max_notes (or use
        # stream chunking) to capture the tail.
        from ..utils.logging import get_logger

        get_logger("amt_saga_tpu.saga").warning(
            "%d/%d lanes hit loop.max_notes=%d with candidates left "
            "(truncated transcription); raise loop.max_notes or chunk "
            "the input", int(saturated.sum()), len(saturated),
            cfg.loop.max_notes)
    _ctx_frames = round(cfg.loop.instrument_context_seconds
                        * cfg.dsp.sample_rate / cfg.dsp.hop)
    refit_all = None
    if refit:
        # Whole-batch native joint refit: one C call for all lanes
        # (per-lane Python orchestration + two ctypes crossings per
        # lane measured ~0.3 s per 768-lane batch).  None when the
        # fast path does not apply; lanes then refit individually.
        from ..core.notes import refit_gains_variants_batch_host
        from ..utils import stages as _st

        with _st.timed("emit.refit"):
            refit_all = refit_gains_variants_batch_host(
                np.asarray(notes.onset), np.asarray(notes.pitch),
                np.asarray(notes.d_idx), np.asarray(notes.program),
                np.asarray(notes.dot0), np.asarray(notes.gain),
                np.asarray(notes.count), gram, n_p, n_d,
                cfg.loop.refit_sweeps,
                duration_grid=cfg.synth.duration_grid,
                context_frames=_ctx_frames)

    def prep_lane(b: int):
        """Per-lane refit + velocity staging; returns the emit inputs
        (None for a poisoned lane) so the continuous duration fit can
        run ONCE for the whole batch between prep and emit."""
        if poison[b]:
            # Sanitizer: non-finite values were detected in this lane on
            # device — emit an empty sequence + a logged event instead of
            # whatever partial garbage preceded the NaN (SURVEY.md §5).
            from ..utils.logging import get_logger

            get_logger("amt_saga_tpu.saga").warning(
                "lane %d poisoned (non-finite residual/scores); "
                "emitting empty sequence", b)
            return None
        from ..utils import stages

        gains_b = np.asarray(notes.gain[b])
        progs_b = np.asarray(notes.program[b])
        didx_b = np.asarray(notes.d_idx[b])
        dur_b = np.asarray(notes.dur[b])
        refine_mask = None
        if refit:
            if refit_all is not None:
                # Whole-batch native refit ran once before the lane
                # loop (bit-identical to the per-lane call).
                gains_b, progs_b, didx_b = (refit_all[0][b],
                                            refit_all[1][b],
                                            refit_all[2][b])
                changed = refit_all[3][b][:int(notes.count[b])]
            else:
                with stages.timed("emit.refit"):
                    gains_b, progs_b, didx_b, changed = \
                        refit_gains_variants_host(
                            np.asarray(notes.onset[b]),
                            np.asarray(notes.pitch[b]),
                            np.asarray(notes.d_idx[b]), progs_b,
                            np.asarray(notes.dot0[b]), gains_b,
                            int(notes.count[b]), gram, n_p, n_d,
                            cfg.loop.refit_sweeps,
                            duration_grid=cfg.synth.duration_grid,
                            context_frames=_ctx_frames)
            if changed.any():
                # Re-selected durations: emit the corrected grid frames;
                # the sd-based refiner is skipped for those notes (their
                # sd was recorded under the mis-ranking).
                grid_frames = duration_grid_frames(cfg.synth, cfg.dsp)
                n_ch = len(changed)
                dur_b = dur_b.copy()
                dur_b[:n_ch] = np.where(changed,
                                        grid_frames[didx_b[:n_ch]],
                                        dur_b[:n_ch])
                refine_mask = np.ones(len(dur_b), dtype=bool)
                refine_mask[:n_ch] = ~changed
        vel_override = None
        if cfg.run.velocity_source != "gain":
            vp = np.asarray(notes.vel_pred[b], dtype=np.float64)
            if np.any(vp > 0):
                # Velocity head consumed at emission (round-2 verdict
                # #6): "head" replaces the gain-derived velocity;
                # "blend" averages the two ONLY for notes overlapping
                # another note in time (shared energy makes the gain
                # ambiguous; isolated notes keep the exact gain).
                n_cnt = int(notes.count[b])
                onset_b = np.asarray(notes.onset[b][:n_cnt])
                v_head = np.clip(np.round(vp * 127.0), 1, 127)
                v_gain = np.array([gain_to_velocity(float(g))
                                   for g in gains_b])
                tmax_f = cfg.synth.template_frames
                vel_override = np.zeros(len(gains_b), dtype=np.int64)
                for a in range(n_cnt):
                    overlap = np.any(
                        np.abs(onset_b - onset_b[a])[np.arange(n_cnt)
                                                     != a] <= tmax_f)
                    if cfg.run.velocity_source == "head":
                        vel_override[a] = v_head[a]
                    elif overlap:  # "blend"
                        vel_override[a] = int(np.clip(round(
                            0.5 * (v_gain[a] + v_head[a])), 1, 127))
        return gains_b, progs_b, didx_b, dur_b, refine_mask, vel_override

    def emit_lane(b: int, pr, refined_b) -> NoteSequence:
        if pr is None:
            return NoteSequence()
        from ..utils import stages

        gains_b, progs_b, didx_b, dur_b, refine_mask, vel_override = pr
        with stages.timed("emit.to_sequence"):
            seq = note_arrays_to_sequence(
                np.asarray(notes.onset[b]), dur_b,
                np.asarray(notes.pitch[b]), gains_b,
                progs_b, int(notes.count[b]),
                hop=cfg.dsp.hop, sample_rate=cfg.dsp.sample_rate,
                pitch_min=cfg.synth.pitch_min,
                d_idx=didx_b if refine else None,
                sd=np.asarray(notes.sd[b]) if refine else None,
                refiner=refiner,
                refine_programs=(np.asarray(notes.program[b])
                                 if refine else None),
                refine_mask=refine_mask,
                velocity_override=vel_override,
                refined=refined_b)
        if snap_waves is not None:
            from .snap import refine_emission

            seq = refine_emission(
                seq, snap_waves[b], cfg,
                mag=None if snap_mags is None else snap_mags[b])
        return seq

    n_lanes = notes.onset.shape[0]
    snap_mags = None
    if snap_waves is not None and n_lanes > 1:
        # One batched pocketfft call for every lane's evidence STFT
        # (bitwise-identical per lane — see snap_stft_mag_batch);
        # per-lane calls paid ~19 ms each on the 1-core host.
        from ..utils import stages
        from .snap import snap_stft_mag_batch

        with stages.timed("snap.stft_batch"):
            snap_mags = snap_stft_mag_batch(np.asarray(snap_waves), cfg)
    def batch_refined(preps):
        """One refine_many call for ALL lanes' notes (refine_many is
        elementwise-identical regardless of batch composition, and the
        per-note dgemv stays per note inside it — bit-parity preserved;
        the per-lane calls paid ~0.3 ms of fixed numpy overhead each on
        the 1-core host)."""
        if not (refine and hasattr(refiner, "refine_many")):
            return [None] * len(preps)
        lanes = []
        d_l, p_l, rp_l, sd_l = [], [], [], []
        for b, pr in enumerate(preps):
            n = int(notes.count[b]) if pr is not None else 0
            if n > 0:
                lanes.append(b)
                d_l.append(np.asarray(pr[2][:n], np.int64))
                p_l.append(np.asarray(notes.pitch[b][:n], np.int64))
                rp_l.append(np.asarray(notes.program[b][:n], np.int64))
                sd_l.append(np.asarray(notes.sd[b][:n]))
        out = [None] * len(preps)
        if not lanes:
            return out
        refined_all = refiner.refine_many(
            np.concatenate(d_l), np.concatenate(p_l),
            np.concatenate(rp_l), np.concatenate(sd_l))
        offs = np.concatenate([[0], np.cumsum([len(x) for x in d_l])])
        for j, b in enumerate(lanes):
            out[b] = refined_all[offs[j]:offs[j + 1]]
        return out

    workers = cfg.run.emission_workers
    if workers < 0:                       # auto
        workers = min(8, max(1, (os.cpu_count() or 1) - 1))
    if workers > 1 and n_lanes > 1:
        # Lanes are independent; the heavy parts (refit descent,
        # duration fit, the evidence chain's rfft/BLAS) release the
        # GIL, so on a multi-core host emission scales with cores.
        # map() preserves lane order -> outputs identical to serial.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(workers, n_lanes)) as ex:
            preps = list(ex.map(prep_lane, range(n_lanes)))
            refined = batch_refined(preps)
            return list(ex.map(emit_lane, range(n_lanes), preps,
                               refined))
    preps = [prep_lane(b) for b in range(n_lanes)]
    refined = batch_refined(preps)
    return [emit_lane(b, preps[b], refined[b]) for b in range(n_lanes)]
