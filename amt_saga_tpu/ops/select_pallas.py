"""Fused selection-chain Pallas kernel (SURVEY.md §2.2 K-family).

Runs the K greedy winner-selection steps of one SAGA loop iteration —
score -> order-exact argmax -> acceptance gates -> Gram dot update —
in ONE kernel launch.  The XLA form (saga.loop._select_chain_xla) emits
~30 small ops per step whose launch latency dominates the loop body
(~0.25 ms/step measured in benchmarks/profile_body.py); this kernel
collapses the chain, fetches each ACCEPTING lane's Gram slab with a
single contiguous DMA, and applies the dot update as one batched
one-hot matmul on the MXU (no per-row gathers, no scalar loads on the
update path).

Parity contract: identical DECISION outputs to ``_select_chain_xla``
for finite inputs (tests/test_select_pallas.py fuzzes this; `selftest
--on-chip` gates the compiled kernel).  The two argmax implementations
agree exactly: XLA takes the first maximum of the quantized scores in
(q, d, o) C-order; the kernel computes the max ``m`` and then the
minimum (q, d, o)-order index among positions with ``s == m`` — the
same element, because quantized f32 compare exactly.  The unquantized
gain and the updated dots may drift by float-contraction ulps (the
one-hot product rides the MXU at HIGHEST precision; XLA multiplies on
the VPU) — the same drift class the DECISION_DROP_BITS quantization
already absorbs between the CPU golden oracle and the TPU.

Gram layout: the kernel wants the winner-major transpose
``gram_t[qd, dt, :]`` so one winner's full slab ``gram_t[qd]`` is a
contiguous [Gp, QDpad] DMA.  Row ``2*Tmax - 1`` is a pinned ZERO row
used as the out-of-range sentinel: candidate offsets with
``|dt| >= tmax`` (and the padded candidate slots) point their one-hot
column at it, making the masked update branch-free — it reproduces the
XLA path's ``where(|dt| < tmax, gv, 0)``.

Mosaic notes (verified by bisection on this toolchain): multi-axis
reductions SIGABRT the layout pass — every (1, 2) reduction here is a
chained pair of single-axis reductions (_red12); unaligned sublane
slice reads, batched rank-3 dot_general, f32<->i32 bitcast, dynamic
HBM indices read from VMEM scratch, and indexed DMA-semaphore arrays
all lower fine.

Cites SURVEY.md §2.2 (native-equivalent kernels) and §7 (hard part:
"dynamic loop under jit").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 8        # lane-block size (grid steps process LANES clips at once)
NEG_T = -(1 << 20)  # padded candidate-slot onset: |dt| >= tmax always


def _q(x: jnp.ndarray, drop_bits: int) -> jnp.ndarray:
    """quantize_decisions, inlined (ops/ must not import saga/)."""
    i = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jax.lax.bitcast_convert_type(
        i & jnp.int32(~((1 << drop_bits) - 1)), jnp.float32)


def _red12(op, x):
    """Reduce a [L, A, B] array over axes (1, 2) -> [L, 1] via two
    single-axis reductions (multi-axis reduce aborts Mosaic; see module
    docstring).  Value-identical for max/min and for the masked sums
    here, which have at most one nonzero element per lane."""
    return op(op(x, axis=2, keepdims=True), axis=1)


def _kernel(dots_ref, nrm_ref, tcf_ref, valid_ref, active_ref, thr_ref,
            qn_ref, on_ref, gn_ref, dn_ref, durs_ref, cnt_ref, sat_ref,
            gram_hbm,
            t_out, q_out, d_out, g_out, acc_out, sd_out,
            acccum_out, satout, anyout,
            dscr, slab, scr_i, scr_f, sems, *,
            n_q: int, n_d: int, n_o: int, n_k: int, n_p: int,
            tmax: int, cap: int, qd_pad: int, ko_pad: int,
            drop_bits: int, min_gain: float,
            shadow_frac: float, shadow_window: str,
            shadow_lead: int, shadow_tail: int,
            harm_frac: float, harm_intervals: tuple, harm_radius: int):
    qd = n_q * n_d
    g_pad = slab.shape[1]
    big = jnp.int32(n_q * n_d * n_o)          # > any real (q, d, o) index
    sent = 2 * tmax - 1                       # zero sentinel row in gram_t

    @pl.when(pl.program_id(0) == 0)
    def _():
        # A lane that never accepts never DMAs its slab; its one-hot
        # gain column is exactly 0.0, but 0 * garbage could still be
        # NaN — pin the scratch finite once.
        slab[...] = jnp.zeros_like(slab)

    # Local mutable copy of this block's candidate dots,
    # [L, KOpad, QDp] with candidate slot j = k * n_o + o on sublanes.
    dscr[...] = dots_ref[...]

    nrm = nrm_ref[...][:, None, :]                        # [1, 1, QDp]
    qd_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, n_o, qd_pad), 2)
    o_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, n_o, qd_pad), 1)
    ordv = ((qd_ids // n_d) * (n_d * n_o) + (qd_ids % n_d) * n_o + o_ids)
    real = qd_ids < qd
    ord_eff = jnp.where(real, ordv, big)

    tcf = tcf_ref[...]                                    # [L, KOpad] i32
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, ko_pad), 1)
    o_of_j = j_ids % n_o
    g_iota = jax.lax.broadcasted_iota(jnp.int32,
                                      (LANES, ko_pad, g_pad), 2)

    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, cap), 1)
    cnt = cnt_ref[...]                                    # [L, 1] i32
    prev = slot_ids < cnt                                 # [L, C]
    qn = qn_ref[...]
    onn = on_ref[...]
    gnn = gn_ref[...]
    dnn = dn_ref[...]                                     # [L, C] frames
    durs_b = durs_ref[...]                                # [1, D] frames
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, n_d), 1)
    active = active_ref[...] != 0                         # [L, 1]
    thr = thr_ref[...]                                    # [L, 1]

    acc_cum = jnp.zeros((LANES, 1), jnp.int32)
    any_acc = jnp.zeros((LANES, 1), jnp.bool_)
    sat = sat_ref[...] != 0
    win_t, win_q, win_g, win_acc, win_dur = [], [], [], [], []

    for i in range(n_k):
        dots = dscr[:, i * n_o:(i + 1) * n_o, :]          # [L, O, QDp]
        g_all = jnp.maximum(dots / nrm, 0.0)
        s_all = 2.0 * g_all * dots - jnp.square(g_all) * nrm
        s_qz = _q(s_all, drop_bits)

        m = _red12(jnp.max, s_qz)[:, :, None]             # [L, 1, 1]
        is_max = (s_qz == m) & real
        sel = _red12(jnp.min, jnp.where(is_max, ordv, big))  # [L, 1]
        sel_c = jnp.where(sel >= big, 0, sel)
        o_best = sel_c % n_o
        d_best = (sel_c // n_o) % n_d
        q_best = sel_c // (n_d * n_o)

        pick = ord_eff == sel[:, :, None]                 # [L, O, QDp]
        g_best = _red12(jnp.sum, jnp.where(pick, g_all, 0.0))
        s_best = _red12(jnp.sum, jnp.where(pick, s_qz, 0.0))
        t_best = jnp.sum(jnp.where(
            (j_ids >= i * n_o) & (j_ids < (i + 1) * n_o)
            & (o_of_j == o_best), tcf, 0), axis=1, keepdims=True)

        gq = _q(g_best, drop_bits)
        want = (active & (valid_ref[:, i:i + 1] != 0)
                & (gq >= min_gain) & (s_best >= thr))

        dur_best = jnp.sum(jnp.where(d_iota == d_best, durs_b, 0),
                           axis=1, keepdims=True)         # [L, 1] frames

        if shadow_frac > 0:
            if shadow_window == "duration":
                near = ((t_best >= onn - shadow_lead)
                        & (t_best <= onn + dnn + shadow_tail))
            else:
                near = jnp.abs(t_best - onn) <= tmax      # [L, C]
            weak = gq < _q(shadow_frac * gnn, drop_bits)
            hit = jnp.any(prev & (q_best == qn) & near & weak,
                          axis=1, keepdims=True)
            for j in range(i):
                if shadow_window == "duration":
                    near_j = ((t_best >= win_t[j] - shadow_lead)
                              & (t_best <= win_t[j] + win_dur[j]
                                 + shadow_tail))
                else:
                    near_j = jnp.abs(t_best - win_t[j]) <= tmax
                hit = hit | (win_acc[j] & (q_best == win_q[j])
                             & near_j
                             & (gq < _q(shadow_frac * win_g[j],
                                        drop_bits)))
            want = want & ~hit

        if harm_frac > 0:
            same_prog = (qn // n_p) == (q_best // n_p)
            ivl = (q_best % n_p) - (qn % n_p)
            harm = jnp.zeros_like(same_prog)
            for iv in harm_intervals:
                harm = harm | (ivl == iv)
            near = jnp.abs(t_best - onn) <= harm_radius
            hweak = gq < _q(harm_frac * gnn, drop_bits)
            hit = jnp.any(prev & same_prog & harm & near & hweak,
                          axis=1, keepdims=True)
            for j in range(i):
                ivl_j = q_best % n_p - win_q[j] % n_p
                harm_j = jnp.zeros_like(hit)
                for iv in harm_intervals:
                    harm_j = harm_j | (ivl_j == iv)
                hit = hit | (win_acc[j]
                             & ((q_best // n_p) == (win_q[j] // n_p))
                             & harm_j
                             & (jnp.abs(t_best - win_t[j]) <= harm_radius)
                             & (gq < _q(harm_frac * win_g[j], drop_bits)))
            want = want & ~hit

        under_cap = (cnt + acc_cum) < cap
        acc = want & under_cap
        sat = sat | (want & ~under_cap)
        acc_cum = acc_cum + acc.astype(jnp.int32)
        any_acc = any_acc | acc

        win_t.append(t_best)
        win_q.append(q_best)
        win_g.append(g_best)
        win_acc.append(acc)
        win_dur.append(dur_best)

        t_out[:, i:i + 1] = t_best
        q_out[:, i:i + 1] = q_best
        d_out[:, i:i + 1] = d_best
        g_out[:, i:i + 1] = g_best
        acc_out[:, i:i + 1] = acc.astype(jnp.int32)

        if i + 1 < n_k:
            # Gram update.  Accepting lanes DMA their winner's slab
            # (one contiguous copy; non-accepting lanes skip — their
            # update is exactly zero); the dot shift lands as ONE
            # batched one-hot matmul over all lanes.  Padded candidate
            # slots and |dt| >= tmax offsets point their one-hot column
            # at the zero sentinel row.
            qd_best = jnp.clip(q_best * n_d + d_best, 0, qd - 1)
            scr_i[:, 16:17] = qd_best
            gain_eff = jnp.where(acc, g_best, 0.0)
            scr_f[:, 0:1] = gain_eff

            dt = tcf - t_best                             # [L, KOpad]
            k_idx = jnp.clip(dt + (tmax - 1), 0, 2 * tmax - 2)
            k_eff = jnp.where(jnp.abs(dt) < tmax, k_idx, sent)

            for l in range(LANES):
                @pl.when(scr_f[l, 0] != 0.0)
                def _(l=l):
                    pltpu.make_async_copy(
                        gram_hbm.at[scr_i[l, 16]], slab.at[l],
                        sems.at[l]).start()

            # Winner's quantized scores at every grid duration (the
            # host-side continuous duration fit input) — computed while
            # the slabs are in flight.
            for dp in range(n_d):
                tgt = q_best * (n_d * n_o) + dp * n_o + o_best
                sd_out[:, i, dp:dp + 1] = _red12(jnp.sum, jnp.where(
                    ord_eff == tgt[:, :, None], s_qz, 0.0))

            for l in range(LANES):
                @pl.when(scr_f[l, 0] != 0.0)
                def _(l=l):
                    pltpu.make_async_copy(
                        gram_hbm.at[scr_i[l, 16]], slab.at[l],
                        sems.at[l]).wait()

            onehotf = jnp.where(g_iota == k_eff[:, :, None],
                                gain_eff[:, :, None], 0.0)
            upd = jax.lax.dot_general(
                onehotf, slab[...],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)       # [L, KOp, QDp]
            dscr[...] = dscr[...] - upd
        else:
            for dp in range(n_d):
                tgt = q_best * (n_d * n_o) + dp * n_o + o_best
                sd_out[:, i, dp:dp + 1] = _red12(jnp.sum, jnp.where(
                    ord_eff == tgt[:, :, None], s_qz, 0.0))

    acccum_out[...] = acc_cum
    satout[...] = sat.astype(jnp.int32)
    anyout[...] = any_acc.astype(jnp.int32)


def gram_transpose(gram: np.ndarray, tmax: int,
                   qd_pad: int) -> np.ndarray:
    """[2*Tmax-1, QD, QD] -> winner-major [QD, Gp, QDpad] with a zero
    sentinel row at dt-index 2*Tmax - 1 (see module docstring); Gp is
    2*Tmax rounded up to the sublane tile."""
    n_g, n_qd, _ = gram.shape
    assert n_g == 2 * tmax - 1, (n_g, tmax)
    g_pad = 2 * tmax + (-2 * tmax) % 8
    out = np.zeros((n_qd, g_pad, qd_pad), np.float32)
    out[:, :n_g, :n_qd] = np.transpose(gram, (1, 0, 2))
    return out


def select_chain_pallas(dots0: jnp.ndarray, t_cand: jnp.ndarray,
                        valid: jnp.ndarray, active: jnp.ndarray,
                        thr: jnp.ndarray, notes, cfg, tmpl) -> tuple:
    """Drop-in replacement for saga.loop._select_chain_xla.

    dots0 [B, K, O, QD] f32; t_cand [B, K, O] i32; valid [B, K] bool;
    active [B] bool; thr [B] f32 (quantized); notes = pre-iteration
    NotesBatch; tmpl must carry ``gram_t`` (see gram_transpose).
    Returns the same 9-tuple as the XLA chain — decision outputs
    bit-identical for finite inputs, gains ulp-close (module docstring).
    """
    loop = cfg.loop
    tmax = cfg.synth.template_frames
    n_q, n_d = tmpl.norms.shape
    n_o = len(loop.onset_offsets)
    n_p = cfg.synth.n_pitches
    b, n_k = dots0.shape[0], dots0.shape[1]
    cap = notes.onset.shape[1]
    qd = n_q * n_d
    qd_pad = qd + (-qd) % 128
    ko = n_k * n_o
    ko_pad = ko + (-ko) % 8

    gram_t = tmpl.gram_t
    if gram_t is None:
        raise ValueError("run.pallas_select needs TemplateArrays.gram_t "
                         "(load_template_arrays builds it when "
                         "run.use_pallas is on)")

    nrm_flat = jnp.maximum(tmpl.norms.reshape(qd), 1e-12)
    nrm_p = jnp.concatenate(
        [nrm_flat, jnp.ones((qd_pad - qd,), jnp.float32)]) \
        if qd_pad != qd else nrm_flat

    bp = b + (-b) % LANES
    ext = bp - b

    def padb(x):
        if ext == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((ext,) + x.shape[1:], x.dtype)], axis=0)

    dots_p = jnp.pad(dots0.reshape(b, ko, qd),
                     ((0, ext), (0, ko_pad - ko), (0, qd_pad - qd)))
    tcf = jnp.pad(t_cand.astype(jnp.int32).reshape(b, ko),
                  ((0, ext), (0, ko_pad - ko)),
                  constant_values=NEG_T)
    q_notes = notes.program * n_p + notes.pitch

    kern = partial(
        _kernel, n_q=n_q, n_d=n_d, n_o=n_o, n_k=n_k, n_p=n_p,
        tmax=tmax, cap=cap, qd_pad=qd_pad, ko_pad=ko_pad,
        drop_bits=_loop_drop_bits(),
        min_gain=float(loop.min_gain),
        shadow_frac=float(loop.shadow_gain_frac),
        shadow_window=str(loop.shadow_window),
        shadow_lead=int(loop.shadow_lead_frames),
        shadow_tail=int(loop.shadow_tail_frames),
        harm_frac=float(loop.harmonic_shadow_frac),
        harm_intervals=tuple(loop.harmonic_intervals),
        harm_radius=int(loop.harmonic_shadow_radius))

    nb = bp // LANES
    g_pad = gram_t.shape[1]
    lane_spec = lambda *shape: pl.BlockSpec(
        (LANES,) + shape, lambda bb: (bb,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec(
        (1, qd_pad), lambda bb: (0, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            lane_spec(ko_pad, qd_pad),                    # dots
            full_spec,                                    # nrm
            lane_spec(ko_pad),                            # t_cand flat
            lane_spec(n_k),                               # valid
            lane_spec(1),                                 # active
            lane_spec(1),                                 # thr
            lane_spec(cap),                               # q_notes
            lane_spec(cap),                               # onset
            lane_spec(cap),                               # gain
            lane_spec(cap),                               # dur (frames)
            pl.BlockSpec((1, n_d), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),        # duration grid
            lane_spec(1),                                 # count
            lane_spec(1),                                 # saturated
            pl.BlockSpec(memory_space=pl.ANY),            # gram_t (HBM)
        ],
        out_specs=[
            lane_spec(n_k),                               # t
            lane_spec(n_k),                               # q
            lane_spec(n_k),                               # d
            lane_spec(n_k),                               # g
            lane_spec(n_k),                               # acc
            lane_spec(n_k, n_d),                          # sd
            lane_spec(1),                                 # acc_cum
            lane_spec(1),                                 # sat
            lane_spec(1),                                 # any
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, n_k), jnp.int32),
            jax.ShapeDtypeStruct((bp, n_k), jnp.int32),
            jax.ShapeDtypeStruct((bp, n_k), jnp.int32),
            jax.ShapeDtypeStruct((bp, n_k), jnp.float32),
            jax.ShapeDtypeStruct((bp, n_k), jnp.int32),
            jax.ShapeDtypeStruct((bp, n_k, n_d), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((LANES, ko_pad, qd_pad), jnp.float32),  # dscr
            pltpu.VMEM((LANES, g_pad, qd_pad), jnp.float32),   # slab
            pltpu.VMEM((LANES, 128), jnp.int32),               # scr_i
            pltpu.VMEM((LANES, 128), jnp.float32),             # scr_f
            pltpu.SemaphoreType.DMA((LANES,)),
        ],
        interpret=jax.default_backend() == "cpu",
    )(
        dots_p, nrm_p.reshape(1, qd_pad),
        tcf,
        padb(valid.astype(jnp.int32)),
        padb(active.astype(jnp.int32)).reshape(bp, 1),
        padb(thr.astype(jnp.float32)).reshape(bp, 1),
        padb(q_notes.astype(jnp.int32)),
        padb(notes.onset.astype(jnp.int32)),
        padb(notes.gain.astype(jnp.float32)),
        padb(notes.dur.astype(jnp.int32)),
        tmpl.durs.astype(jnp.int32).reshape(1, n_d),
        padb(notes.count.astype(jnp.int32)).reshape(bp, 1),
        padb(notes.saturated.astype(jnp.int32)).reshape(bp, 1),
        gram_t,
    )
    t_st, q_st, d_st, g_st, acc_i, sd_st, acc_cum, sat_i, any_i = outs
    return (t_st[:b], q_st[:b], d_st[:b], g_st[:b],
            acc_i[:b] != 0, sd_st[:b], acc_cum[:b, 0],
            sat_i[:b, 0] != 0, any_i[:b, 0] != 0)


def _loop_drop_bits() -> int:
    from ..saga.loop import DECISION_DROP_BITS
    return DECISION_DROP_BITS
