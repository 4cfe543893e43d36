"""Golden CPU reference pipeline (SURVEY.md §4.1).

The reference mount was empty (SURVEY.md §0), so THIS deliberately simple
NumPy implementation is the parity oracle: the TPU path must reproduce its
note events exactly (and therefore its MIDI bytes, since the SMF writer is
shared).  It is also the throughput denominator for BASELINE.md.

Algorithm spec (pinned here; :mod:`amt_saga_tpu.saga.loop` mirrors it
op-for-op):

1. ``spec`` = linear-magnitude log-frequency spectrogram [T, F]
   (:mod:`.dsp_np`), right-padded with ``template_frames`` zero frames.
2. Repeat up to ``max_notes`` times, while residual energy
   ``E > silence_rel * E0``:
   a. Matched filter: ``A[t, f] = sum_tau env[tau] * R[t+tau, f]`` with the
      unit-L2 temporal envelope; coarse score ``C[t, q] = A[t] . prof[q]``
      over flattened (instrument, pitch) q.
   b. ``t*`` and top-K candidate (instrument, pitch) at ``t*`` — stable
      first-max / stable descending sort.
   c. Candidates = topK x duration-grid x onset offsets {-1, 0, +1}
      (C-order flattening).  For each: least-squares gain
      ``g = <window, W>/||W||^2`` (clamped >= 0); score = exact clamped
      energy reduction minus ``over_penalty`` times the over-subtraction
      energy ``||max(g*W - window, 0)||^2``.
   d. Accept the first-max candidate iff ``g >= min_gain`` and
      ``score >= min_score_rel * E``; else terminate.
   e. Subtract ``max(window - g*W, 0)`` in place; record
      (onset_frame, dur_frames[d], pitch_idx, g, instrument).
3. Convert note arrays to a NoteSequence on the host (shared float64
   tick/velocity quantization in :mod:`amt_saga_tpu.core.notes`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Config
from ..core.notes import NoteSequence, note_arrays_to_sequence
from ..synth.templates import (
    duration_grid_frames,
    onset_envelope,
    spectral_profiles,
    template_bank,
    template_lead,
    template_sq_norms,
)
from .dsp_np import spectrogram_np

ONSET_OFFSETS = (-1, 0, 1)


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


def _matched_filter(res: np.ndarray, env: np.ndarray,
                    n_frames: int) -> np.ndarray:
    """A[t, f] = sum_tau env[tau] * res[t+tau, f] for t in [0, n_frames)."""
    tmax = len(env)
    out = np.empty((n_frames, res.shape[1]), dtype=np.float32)
    for t in range(n_frames):
        out[t] = env @ res[t:t + tmax]
    return out


def _stable_topk(scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the k largest values, ties broken by lower index."""
    order = np.argsort(-scores, kind="stable")
    return order[:k]


def transcribe_golden(wave: np.ndarray, cfg: Config) -> GoldenResult:
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

    bank = template_bank(synth, dsp)          # [I, P, D, Tmax, F]
    norms = template_sq_norms(synth, dsp)     # [I, P, D]
    prof = spectral_profiles(synth, dsp)      # [I, P, F]
    env = onset_envelope(synth, dsp)          # [Tmax]
    durs = duration_grid_frames(synth, dsp)   # [D]

    n_i, n_p, n_d = bank.shape[:3]
    prof_flat = prof.reshape(n_i * n_p, -1)   # [Q, F]
    cap = loop.max_notes

    onset_f = np.zeros(cap, dtype=np.int32)
    dur_f = np.zeros(cap, dtype=np.int32)
    pitch_i = np.zeros(cap, dtype=np.int32)
    gains = np.zeros(cap, dtype=np.float32)
    programs = np.zeros(cap, dtype=np.int32)

    e0 = float(np.sum(np.square(res), dtype=np.float32))
    count = 0
    for _ in range(cap):
        e_cur = float(np.sum(np.square(res), dtype=np.float32))
        if e0 <= 0.0 or e_cur <= loop.silence_rel * e0:
            break

        # (a) coarse matched-filter score over (frame, instrument*pitch)
        filt = _matched_filter(res, env, n_frames)       # [T, F]
        coarse = filt @ prof_flat.T                      # [T, Q]
        flat_best = int(np.argmax(coarse.reshape(-1)))
        t_star = flat_best // coarse.shape[1]

        # (b) top-K (instrument, pitch) candidates at t*
        top_q = _stable_topk(coarse[t_star], loop.n_pitch_candidates)

        # (c) candidate grid: K x D x O, C-order
        n_o = len(ONSET_OFFSETS)
        cand_g = np.zeros((len(top_q), n_d, n_o), dtype=np.float32)
        cand_s = np.zeros((len(top_q), n_d, n_o), dtype=np.float32)
        cand_t = np.zeros((len(top_q), n_d, n_o), dtype=np.int32)
        for ki, q in enumerate(top_q):
            qi, qp = int(q) // n_p, int(q) % n_p
            for di in range(n_d):
                w = bank[qi, qp, di]
                nrm = max(float(norms[qi, qp, di]), 1e-12)
                for oi, off in enumerate(ONSET_OFFSETS):
                    t_c = min(max(t_star + off, 0), n_frames - 1)
                    window = res[t_c:t_c + tmax]
                    g = max(float(np.sum(window * w, dtype=np.float32))
                            / nrm, 0.0)
                    new = np.maximum(window - g * w, 0.0)
                    over = np.maximum(g * w - window, 0.0)
                    s = (float(np.sum(np.square(window), dtype=np.float32))
                         - float(np.sum(np.square(new), dtype=np.float32))
                         - loop.over_penalty
                         * float(np.sum(np.square(over), dtype=np.float32)))
                    cand_g[ki, di, oi] = g
                    cand_s[ki, di, oi] = s
                    cand_t[ki, di, oi] = t_c

        best = int(np.argmax(cand_s.reshape(-1)))
        ki, rem = divmod(best, n_d * n_o)
        di, oi = divmod(rem, n_o)
        g_best = float(cand_g[ki, di, oi])
        s_best = float(cand_s[ki, di, oi])
        if g_best < loop.min_gain or s_best < loop.min_score_rel * e_cur:
            break

        q = int(top_q[ki])
        qi, qp = q // n_p, q % n_p
        t_best = int(cand_t[ki, di, oi])
        w = bank[qi, qp, di]
        res[t_best:t_best + tmax] = np.maximum(
            res[t_best:t_best + tmax] - g_best * w, 0.0)

        onset_f[count] = t_best
        dur_f[count] = durs[di]
        pitch_i[count] = qp
        gains[count] = g_best
        programs[count] = qi
        count += 1

    seq = note_arrays_to_sequence(
        onset_f, dur_f, pitch_i, gains, programs, count,
        hop=dsp.hop, sample_rate=dsp.sample_rate, pitch_min=synth.pitch_min)
    e_final = float(np.sum(np.square(res), dtype=np.float32))
    return GoldenResult(seq, onset_f[:count], dur_f[:count], pitch_i[:count],
                        gains[:count], programs[:count], count, e_final)
