"""Golden CPU reference pipeline (SURVEY.md §4.1).

The reference mount was empty (SURVEY.md §0), so THIS deliberately simple
NumPy implementation is the parity oracle: the TPU path must reproduce its
note events exactly (and therefore its MIDI bytes, since the SMF writer is
shared).  It is also the throughput denominator for BASELINE.md.

Algorithm spec (pinned here; :mod:`amt_saga_tpu.saga.loop` mirrors it
op-for-op):

1. ``spec`` = linear-magnitude log-frequency spectrogram [T, F]
   (:mod:`.dsp_np`), front-padded by the template lead, back-padded by the
   template extent (+8 rows of K2 DMA slack; all zeros, value-neutral).
2. Repeat up to ``max_notes`` times, while residual energy
   ``E > silence_rel * E0`` (quantized comparison):
   a. Matched filter: ``C[t, q] = sum_tau env[tau] * (R[t+tau] . prof[q])``
      over flattened (instrument, pitch) q — associativity pinned as
      ``(R . prof) then env``, matching the TPU band-matmul formulation.
   b. Peak picking: up to ``n_extract`` frames that are LOCAL MAXIMA of
      the (quantized) per-frame max coarse score, selected by repeated
      first-max argmax with a +-peak_mask_radius mask — the mask only
      prevents re-picking the same stale peak; selection is the ONLY
      stale quantity in an iteration.
   c. Per peak, SEQUENTIALLY against the VIRTUAL residual (greedy
      matching pursuit): candidates = ALL (q, d, o) triples over
      flattened instrument*pitch, the duration grid, and onset offsets
      {-1, 0, +1} (C-order flattening).  The virtual residual is the
      iteration-start residual minus the UNCLAMPED ``g*W`` of every note
      accepted earlier in the SAME iteration (clamping applies to the
      real residual between iterations); this is what the TPU path
      computes algebraically via precomputed template-overlap Gram
      updates, with the bank streamed once per iteration instead of once
      per peak.  For each candidate: least-squares gain
      ``g = max(<window, W> / ||W||^2, 0)`` and the closed-form score
      ``2*g*<window, W> - g^2*||W||^2`` — which equals the exact clamped
      energy reduction minus the over-subtraction energy (disjoint
      supports; see LoopConfig).  Scores are quantized before argmax.
   d. Accept the first-max candidate iff ``g >= min_gain``,
      ``score >= min_score_rel * E``, and it is not a SHADOW — same
      (instrument, pitch) as a note from a previous iteration within one
      template extent with gain below ``shadow_gain_frac`` of it.
   e. Subtract ``max(window - g*W, 0)`` in place; record
      (onset_frame, dur_frames[d], pitch_idx, g, instrument).
   f. A quality-rejected peak's frame is masked from later peak
      selection while its quantized coarse value is unchanged
      (LoopConfig.peak_rejection_mask) — persistent shadow-rejected
      residue peaks would otherwise crowd out the n_extract slots and
      stall extraction while quieter true notes remain.  Terminate
      when an iteration neither accepts nor masks anything new, or
      after ``stop_patience`` consecutive all-rejected iterations.
3. Convert note arrays to a NoteSequence on the host (shared float64
   tick/velocity quantization in :mod:`amt_saga_tpu.core.notes`).

All comparison operands are mantissa-truncated (``DECISION_DROP_BITS``)
identically in both paths so backend float differences cannot flip any
decision — the basis of the bit-for-bit MIDI parity contract.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Config
from ..core.notes import (
    NoteSequence,
    note_arrays_to_sequence,
    refit_gains_variants_host,
)
from ..synth.templates import (
    duration_grid_frames,
    make_duration_refiner,
    onset_envelope,
    spectral_profiles,
    template_bank,
    template_lead,
    template_sq_norms,
)
from .dsp_np import spectrogram_np

# Candidate onset offsets come from LoopConfig.onset_offsets (shared
# with saga.loop through the same config object).

# Must match saga.loop.DECISION_DROP_BITS (see the comment there): decision
# values are mantissa-truncated before comparisons so CPU/TPU last-ulp
# differences cannot flip the greedy loop's choices.
DECISION_DROP_BITS = 13


def quantize_decisions_np(x: np.ndarray) -> np.ndarray:
    i = np.ascontiguousarray(x, dtype=np.float32).view(np.int32)
    mask = np.int32(~((1 << DECISION_DROP_BITS) - 1))
    return (i & mask).view(np.float32)


def _q_scalar(x: float) -> float:
    return float(quantize_decisions_np(np.array([x], np.float32))[0])


@dataclass
class GoldenResult:
    sequence: NoteSequence
    onset_frames: np.ndarray
    dur_frames: np.ndarray
    pitch_idx: np.ndarray
    gains: np.ndarray
    programs: np.ndarray
    count: int
    residual_energy: float
    # Mirror of NotesBatch.saturated: a candidate passed every quality
    # gate but the note array was full (count == max_notes).
    saturated: bool = False


def _coarse_scores(res: np.ndarray, env: np.ndarray, prof_flat: np.ndarray,
                   n_frames: int) -> np.ndarray:
    """C[t, q] = sum_tau env[tau] * (res[t+tau] . prof[q]).

    Associativity pinned as (res . prof) first, then the env-weighted sum
    over tau — the same order as the TPU band-matmul formulation.
    """
    cp = (res @ prof_flat.T).astype(np.float32)          # [Tp, Q]
    tmax = len(env)
    out = np.empty((n_frames, cp.shape[1]), dtype=np.float32)
    for t in range(n_frames):
        out[t] = env @ cp[t:t + tmax]
    return out


def transcribe_golden(wave: np.ndarray, cfg: Config,
                      atoms: dict | None = None) -> GoldenResult:
    """Golden-oracle transcription.  ``atoms`` optionally overrides the
    template bank (keys bank/norms/prof/env in the analytic shapes, e.g.
    models.synth_decoder.neural_atoms) — the parity contract is about
    the ALGORITHM, not one particular bank."""
    dsp, synth, loop = cfg.dsp, cfg.synth, cfg.loop
    spec = spectrogram_np(np.asarray(wave, dtype=np.float32), dsp)
    n_frames = spec.shape[0]
    tmax = synth.template_frames
    lead = template_lead(dsp)
    # Front pad by the template lead (see template_lead), back pad so a
    # template window fits at any onset; placement index == onset frame.
    res = np.concatenate([
        np.zeros((lead, spec.shape[1]), dtype=np.float32),
        spec,
        np.zeros((tmax, spec.shape[1]), dtype=np.float32),
    ], axis=0)
    spec0 = res.copy()  # pristine padded spectrogram for the gain refit

    if atoms is None:
        bank = template_bank(synth, dsp)          # [I, P, D, Tmax, F]
        norms = template_sq_norms(synth, dsp)     # [I, P, D]
        prof = spectral_profiles(synth, dsp)      # [I, P, F]
        env = onset_envelope(synth, dsp)          # [Tmax]
    else:
        bank, norms = atoms["bank"], atoms["norms"]
        prof, env = atoms["prof"], atoms["env"]
    durs = duration_grid_frames(synth, dsp)   # [D]

    n_i, n_p, n_d = bank.shape[:3]
    prof_flat = prof.reshape(n_i * n_p, -1)   # [Q, F]
    cap = loop.max_notes

    onset_f = np.zeros(cap, dtype=np.int32)
    dur_f = np.zeros(cap, dtype=np.int32)
    pitch_i = np.zeros(cap, dtype=np.int32)
    gains = np.zeros(cap, dtype=np.float32)
    programs = np.zeros(cap, dtype=np.int32)
    d_idx = np.zeros(cap, dtype=np.int32)
    sd = np.zeros((cap, n_d), dtype=np.float32)

    e0 = float(np.sum(np.square(res), dtype=np.float32))
    count = 0
    saturated = False

    def greedy_pass(res: np.ndarray, iters: int) -> None:
        """One greedy extraction pass over ``res`` (in place), appending
        to the enclosing note arrays — the pass-1 loop and the rescan
        pass (mirror of saga/loop.py) share this body."""
        nonlocal count, saturated
        # Peak-rejection mask (mirror of saga/loop.py _Carry.rej_val):
        # quantized coarse value at which a frame's best candidate was
        # last quality-rejected; the frame is skipped while the value
        # is unchanged (NaN never compares equal).  Fresh per pass —
        # the rescan's rebuilt residual re-arms every frame.
        mask_on = loop.peak_rejection_mask
        rej_val = np.full(n_frames, np.nan, dtype=np.float32)
        no_acc_run = 0
        patience = max(1, loop.stop_patience)
        for _ in range(iters):
            e_cur = float(np.sum(np.square(res), dtype=np.float32))
            e_q = _q_scalar(e_cur)
            sil_q = _q_scalar(loop.silence_rel * e0)
            if e0 <= 0.0 or e_q <= sil_q:
                break

            # (a/b) coarse matched-filter score -> up to n_extract time-disjoint
            # peaks (masked argmax, radius template_frames+1: windows of
            # distinct peaks cannot overlap, so extracting them in one
            # iteration equals sequential greedy extraction).
            coarse = _coarse_scores(res, env, prof_flat, n_frames)   # [T, Q]
            n_k = max(1, loop.n_extract)
            radius = max(1, loop.peak_mask_radius)
            m_raw = quantize_decisions_np(np.max(coarse, axis=1))    # [T]
            # Only local maxima are eligible (see saga/loop.py: shoulders of
            # masked stronger peaks must not become separate onsets).
            left = np.concatenate([[-np.inf], m_raw[:-1]])
            right = np.concatenate([m_raw[1:], [-np.inf]])
            m_work = np.where((m_raw >= left) & (m_raw >= right),
                              m_raw, -np.inf)
            if mask_on:
                # Skip frames whose best candidate was rejected at this
                # exact quantized coarse value (mirror of saga/loop.py).
                m_work = np.where(m_raw == rej_val, -np.inf, m_work)
            t_frames = np.arange(n_frames)
            peaks: list[tuple[int, bool]] = []
            for _i in range(n_k):
                t_i = int(np.argmax(m_work))
                peaks.append((t_i, bool(np.isfinite(m_work[t_i]))))
                m_work = np.where(np.abs(t_frames - t_i) <= radius,
                                  -np.inf, m_work)

            if loop.onset_refractory_frac > 0:
                # Onset-refractory duration gate inputs (mirror of
                # saga/loop._refractory_mask): per-column quantized
                # coarse scores + local-max map, shared by every peak
                # this iteration.
                cq_coarse = quantize_decisions_np(coarse)        # [T, Q]
                cleft = np.concatenate(
                    [np.full((1, cq_coarse.shape[1]), -np.inf,
                             np.float32), cq_coarse[:-1]])
                cright = np.concatenate(
                    [cq_coarse[1:],
                     np.full((1, cq_coarse.shape[1]), -np.inf,
                             np.float32)])
                # Strict rise (mirror of saga/loop._refractory_mask):
                # quantized decays are flat steps, not new onsets.
                is_peak_q = (cq_coarse > cleft) & (cq_coarse >= cright)
                # Pitch-axis local max within the instrument block
                # (mirror — kills neighbor-pitch onset cross-talk).
                n_inst = int(synth.n_instruments)
                n_pp = cq_coarse.shape[1] // n_inst
                cq4 = cq_coarse.reshape(-1, n_inst, n_pp)
                pleft = np.concatenate(
                    [np.full(cq4[..., :1].shape, -np.inf, np.float32),
                     cq4[..., :-1]], axis=2)
                pright = np.concatenate(
                    [cq4[..., 1:],
                     np.full(cq4[..., :1].shape, -np.inf, np.float32)],
                    axis=2)
                is_peak_q &= ((cq4 >= pleft) & (cq4 >= pright)).reshape(
                    cq_coarse.shape)
                far_t = n_frames + tmax

            # (c) per peak: ALL (q, d, o) candidates, closed-form scores
            # (C-order), windowed from the VIRTUAL residual — iteration-start
            # residual minus the unclamped g*W of earlier same-iteration
            # acceptances (the TPU path computes the same quantity as
            # dots0 - sum g*gram via precomputed template overlaps; equal up
            # to float rounding, absorbed by decision quantization).
            n_o = len(loop.onset_offsets)
            n_q = n_i * n_p
            bank_mat = bank.reshape(n_q * n_d, -1)                   # [QD, M]
            nrm_flat = np.maximum(norms.reshape(n_q * n_d), 1e-12)   # [QD]
            any_acc = False
            any_rej = False
            vres = res.copy()  # virtual residual: unclamped within-iteration
            for t_star, valid in peaks:
                if not valid:
                    continue
                dots = np.zeros((n_o, n_q * n_d), dtype=np.float32)
                t_cands = np.zeros(n_o, dtype=np.int32)
                for oi, off in enumerate(loop.onset_offsets):
                    t_c = min(max(t_star + off, 0), n_frames - 1)
                    t_cands[oi] = t_c
                    window = vres[t_c:t_c + tmax].reshape(-1)        # [M]
                    dots[oi] = bank_mat @ window
                g_all = np.maximum(dots / nrm_flat[None, :], 0.0)    # [O, QD]
                s_all = (2.0 * g_all * dots
                         - np.square(g_all) * nrm_flat[None, :])
                # -> C-order (q, d, o)
                g_qdo = np.transpose(g_all.reshape(n_o, n_q, n_d), (1, 2, 0))
                s_qdo = quantize_decisions_np(
                    np.transpose(s_all.reshape(n_o, n_q, n_d), (1, 2, 0)))

                if loop.onset_refractory_frac > 0:
                    # Disallowed durations never win; s_qdo itself stays
                    # unmasked (s_best/sd record raw scores — mirror of
                    # saga/loop._select_chain_xla).
                    s_sel = s_qdo.copy()
                    for oi2 in range(n_o):
                        t_c = int(t_cands[oi2])
                        v0 = cq_coarse[t_c]                      # [Q]
                        thrv = quantize_decisions_np(
                            loop.onset_refractory_frac * v0)
                        cond = ((t_frames > t_c + radius)[:, None]
                                & is_peak_q
                                & (cq_coarse >= thrv[None, :]))
                        next_t = np.where(cond, t_frames[:, None],
                                          far_t).min(axis=0)     # [Q]
                        gap = next_t - t_c
                        allowed_qd = durs[None, :] <= gap[:, None]
                        allowed_qd[:, 0] = True
                        s_sel[:, :, oi2] = np.where(
                            allowed_qd, s_qdo[:, :, oi2], -np.inf)
                else:
                    s_sel = s_qdo
                best = int(np.argmax(s_sel.reshape(-1)))
                q, rem = divmod(best, n_d * n_o)
                di, oi = divmod(rem, n_o)
                g_best = float(g_qdo[q, di, oi])
                s_best = float(s_qdo[q, di, oi])
                g_q = _q_scalar(g_best)
                thr_q = _q_scalar(loop.min_score_rel * e_cur)
                if loop.min_score_rel0 > 0:
                    # Mirror of saga/loop.py: absolute floor vs initial
                    # energy, max of the two quantized bars.
                    thr_q = max(thr_q,
                                _q_scalar(loop.min_score_rel0 * e0))
                if g_q < loop.min_gain or s_best < thr_q:
                    if mask_on:
                        rej_val[t_star] = m_raw[t_star]
                        any_rej = True
                    continue

                qi, qp = q // n_p, q % n_p
                t_best = int(t_cands[oi])

                # Shadow suppression (mirror of saga/loop.py; against ALL
                # notes so far, including earlier peaks this iteration).
                if loop.shadow_gain_frac > 0:
                    shadow = False
                    for j in range(count):
                        q_j = programs[j] * n_p + pitch_i[j]
                        if loop.shadow_window == "duration":
                            # Duration-aware window (mirror of
                            # saga/loop.py — see LoopConfig).
                            near_j = (
                                t_best >= int(onset_f[j])
                                - loop.shadow_lead_frames
                                and t_best <= int(onset_f[j])
                                + int(dur_f[j])
                                + loop.shadow_tail_frames)
                        else:
                            near_j = abs(t_best
                                         - int(onset_f[j])) <= tmax
                        if (q_j == q and near_j
                                and g_q < _q_scalar(
                                    loop.shadow_gain_frac * gains[j])):
                            shadow = True
                            break
                    if shadow:
                        if mask_on:
                            rej_val[t_star] = m_raw[t_star]
                            any_rej = True
                        continue
                if loop.harmonic_shadow_frac > 0:
                    # Harmonic-phantom suppression (mirror of
                    # saga/loop.py; order pinned: after shadow, before
                    # capacity).
                    hshadow = False
                    for j in range(count):
                        if (programs[j] == qi
                                and (qp - pitch_i[j])
                                in loop.harmonic_intervals
                                and abs(t_best - int(onset_f[j]))
                                <= loop.harmonic_shadow_radius
                                and g_q < _q_scalar(
                                    loop.harmonic_shadow_frac
                                    * gains[j])):
                            hshadow = True
                            break
                    if hshadow:
                        if mask_on:
                            rej_val[t_star] = m_raw[t_star]
                            any_rej = True
                        continue
                if count >= cap:
                    # Capacity gate LAST (mirror of saga/loop.py): the
                    # candidate passed every quality gate but the note array
                    # is full — flag the truncation, accept nothing.
                    saturated = True
                    continue
                w = bank[qi, qp, di]
                res[t_best:t_best + tmax] = np.maximum(
                    res[t_best:t_best + tmax] - g_best * w, 0.0)
                vres[t_best:t_best + tmax] -= g_best * w  # unclamped

                onset_f[count] = t_best
                dur_f[count] = durs[di]
                pitch_i[count] = qp
                gains[count] = g_best
                programs[count] = qi
                d_idx[count] = di
                # Quantized scores at ALL grid durations (winner's pitch and
                # onset) for the host-side continuous duration fit (mirror of
                # saga/loop.py sd; the shared f64 DurationRefiner keeps MIDI
                # parity).
                sd[count] = s_qdo[q, :, oi]
                count += 1
                any_acc = True

            if not any_acc:
                # Mirror of saga/loop.py stop: a lane ends when an
                # iteration neither accepts nor masks anything new, or
                # after stop_patience consecutive all-rejected
                # iterations (each such iteration masks up to n_extract
                # junk peaks so weaker true peaks can surface).
                no_acc_run += 1
                if not any_rej or no_acc_run >= patience:
                    break
            else:
                no_acc_run = 0

    greedy_pass(res, cap)

    # (The golden mirror of the device rescan pass lived here in round 3;
    # deleted with it in round 4 — see saga/loop.py and git history.)

    emit_gains, emit_programs = gains, programs
    emit_d_idx, emit_dur = d_idx, dur_f
    refine_mask = None
    if loop.refit_gains:
        # Power-domain joint gain re-projection + instrument/duration
        # re-selection (mirror of saga/loop.py): dot every variant
        # (instrument x {-1,0,+1} duration neighbor) of each accepted
        # atom with the squared PRISTINE spectrogram (quantized, like
        # the device recording), then the shared host f64 variant-
        # comparing coordinate descent; overlaps from the same host-
        # computed squared-atom Gram the TPU path's host side uses, so
        # parity holds bit-for-bit.
        from ..synth.templates import gram_from_bank

        spec0_pow = np.square(spec0)
        bank_pow = np.square(bank)
        dot0 = np.zeros((cap, n_i * 3), dtype=np.float32)
        for a in range(count):
            t_a = int(onset_f[a])
            wv = spec0_pow[t_a:t_a + tmax].reshape(-1)
            for i in range(n_i):
                for v, ddv in enumerate((-1, 0, 1)):
                    dv = min(max(int(d_idx[a]) + ddv, 0), n_d - 1)
                    dot0[a, i * 3 + v] = np.float32(
                        wv @ bank_pow[i, pitch_i[a], dv].reshape(-1))
        dot0 = quantize_decisions_np(dot0)
        gram_pow = gram_from_bank(
            bank_pow.reshape(n_i * n_p * n_d, tmax, -1))
        emit_gains, emit_programs, emit_d_idx, changed = \
            refit_gains_variants_host(
                onset_f, pitch_i, d_idx, programs, dot0, gains, count,
                gram_pow, n_p, n_d, loop.refit_sweeps,
                duration_grid=synth.duration_grid,
                context_frames=round(
                    loop.instrument_context_seconds
                    * dsp.sample_rate / dsp.hop))
        if changed.any():
            # Re-selected durations emit the corrected grid frames and
            # skip the sd refiner (mirror of notes_batch_to_sequences).
            emit_dur = dur_f.copy()
            emit_dur[:count] = np.where(changed, durs[emit_d_idx[:count]],
                                        emit_dur[:count])
            refine_mask = np.ones(cap, dtype=bool)
            refine_mask[:count] = ~changed

    # The continuous duration fit is defined by the ANALYTIC bank's
    # fine-duration renders; with an ``atoms`` override the recorded
    # scores follow a different bank and refinement stays off (mirror of
    # Transcriber.duration_refiner).
    refine = loop.refine_duration and atoms is None
    refiner = make_duration_refiner(synth, dsp) if refine else None
    seq = note_arrays_to_sequence(
        onset_f, emit_dur, pitch_i, emit_gains, emit_programs, count,
        hop=dsp.hop, sample_rate=dsp.sample_rate, pitch_min=synth.pitch_min,
        d_idx=emit_d_idx if refine else None, sd=sd if refine else None,
        refiner=refiner, refine_programs=programs if refine else None,
        refine_mask=refine_mask)
    if atoms is None:
        # Emission refinement chain (saga/snap.py): onset snap -> twin
        # dedup -> re-strike split — the same host NumPy function the
        # TPU path runs, on the same wave, so MIDI parity is preserved
        # by construction.  Analytic-bank gate mirrors
        # Transcriber.snaps_onsets.
        from ..saga.snap import refine_emission

        seq = refine_emission(seq, wave, cfg)
    e_final = float(np.sum(np.square(res), dtype=np.float32))
    return GoldenResult(seq, onset_f[:count], dur_f[:count], pitch_i[:count],
                        gains[:count], programs[:count], count, e_final,
                        saturated)
