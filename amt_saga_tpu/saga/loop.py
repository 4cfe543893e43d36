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
2. Global argmax -> onset frame t*; ``lax.top_k`` -> K candidate
   (instrument, pitch) at t*.
3. Batched candidate evaluation (BASELINE: "batched candidate-pitch
   evaluation"): a ``lax.scan`` over the K x D(duration) grid evaluates
   least-squares gain + over-subtraction-penalized energy reduction for
   O onset offsets at once; flat argmax picks the winner.
4. Masked subtract (clamped at 0) + masked note append.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.notes import NoteSequence, note_arrays_to_sequence
from ..dsp.cqt import logf_spectrogram
from ..dsp.stft import stft_magnitude
from ..synth.templates import (
    duration_grid_frames,
    onset_envelope,
    spectral_profiles,
    template_bank,
    template_lead,
    template_sq_norms,
)

ONSET_OFFSETS = (-1, 0, 1)  # must match golden.pipeline.ONSET_OFFSETS


class TemplateArrays(NamedTuple):
    """Device-resident template bank (flattened over instrument*pitch)."""

    bank: jnp.ndarray    # [Q, D, Tmax, F]
    norms: jnp.ndarray   # [Q, D]
    prof: jnp.ndarray    # [Q, F]
    env: jnp.ndarray     # [Tmax]
    durs: jnp.ndarray    # [D] int32


def load_template_arrays(cfg: Config) -> TemplateArrays:
    bank = template_bank(cfg.synth, cfg.dsp)
    n_i, n_p, n_d, tmax, f = bank.shape
    return TemplateArrays(
        bank=jnp.asarray(bank.reshape(n_i * n_p, n_d, tmax, f)),
        norms=jnp.asarray(
            template_sq_norms(cfg.synth, cfg.dsp).reshape(n_i * n_p, n_d)),
        prof=jnp.asarray(
            spectral_profiles(cfg.synth, cfg.dsp).reshape(n_i * n_p, f)),
        env=jnp.asarray(onset_envelope(cfg.synth, cfg.dsp)),
        durs=jnp.asarray(duration_grid_frames(cfg.synth, cfg.dsp)),
    )


class NotesBatch(NamedTuple):
    """Device-side struct-of-arrays note container (SURVEY.md §7 step 1)."""

    onset: jnp.ndarray    # [B, cap] int32 frame index
    dur: jnp.ndarray      # [B, cap] int32 frames
    pitch: jnp.ndarray    # [B, cap] int32 pitch index (0-based)
    gain: jnp.ndarray     # [B, cap] float32
    program: jnp.ndarray  # [B, cap] int32 instrument index
    count: jnp.ndarray    # [B] int32
    residual_energy: jnp.ndarray  # [B] float32


class _Carry(NamedTuple):
    res: jnp.ndarray
    notes: NotesBatch
    done: jnp.ndarray
    e0: jnp.ndarray
    it: jnp.ndarray


def spectrogram_batch(waves: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """[B, N] waveforms -> [B, T, n_bins] linear log-freq magnitude."""
    mag = jax.vmap(lambda w: stft_magnitude(w, cfg.dsp))(waves)
    return logf_spectrogram(mag, cfg.dsp)


def pad_residual(spec: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Front-pad by the template lead, back-pad by the template extent so a
    template placed at padded index p models a note at true frame p."""
    lead = template_lead(cfg.dsp)
    tmax = cfg.synth.template_frames
    return jnp.pad(spec, ((0, 0), (lead, tmax), (0, 0)))


def heuristic_scores(res: jnp.ndarray, tmpl: TemplateArrays,
                     n_frames: int) -> jnp.ndarray:
    """Matched-filter coarse scores [B, T, Q] (golden step a)."""
    lhs = res[:, None, :, :]                       # [B, 1, Tp, F]
    rhs = tmpl.env[None, None, :, None]            # [1, 1, Tmax, 1]
    a = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :n_frames, :]                          # [B, T, F]
    return jnp.einsum("btf,qf->btq", a, tmpl.prof,
                      precision=jax.lax.Precision.HIGHEST)


ScoreFn = Callable[[jnp.ndarray, TemplateArrays, int], jnp.ndarray]


def _append_row(row: jnp.ndarray, idx: jnp.ndarray, val: jnp.ndarray,
                acc: jnp.ndarray) -> jnp.ndarray:
    """Masked append at position idx of a [cap] row."""
    cur = row[idx]
    return row.at[idx].set(jnp.where(acc, val.astype(row.dtype), cur))


def _loop_body(carry: _Carry, *, cfg: Config, tmpl: TemplateArrays,
               n_frames: int, score_fn: ScoreFn) -> _Carry:
    loop = cfg.loop
    tmax = cfg.synth.template_frames
    n_q, n_d = tmpl.norms.shape
    n_o = len(ONSET_OFFSETS)
    n_k = loop.n_pitch_candidates
    offsets = jnp.asarray(ONSET_OFFSETS, dtype=jnp.int32)

    res, notes = carry.res, carry.notes
    e_cur = jnp.sum(jnp.square(res), axis=(1, 2))
    active = (~carry.done) & (carry.e0 > 0.0) & (
        e_cur > loop.silence_rel * carry.e0)

    # (1) coarse scores and (2) onset/pitch candidates
    coarse = score_fn(res, tmpl, n_frames)                    # [B, T, Q]
    b = coarse.shape[0]
    flat_best = jnp.argmax(coarse.reshape(b, -1), axis=1)
    t_star = (flat_best // n_q).astype(jnp.int32)             # [B]
    at_t = jnp.take_along_axis(
        coarse, t_star[:, None, None], axis=1)[:, 0, :]       # [B, Q]
    _, top_q = jax.lax.top_k(at_t, n_k)                       # [B, K]

    # Candidate onset frames (clamped like golden) and their windows.
    t_cand = jnp.clip(t_star[:, None] + offsets[None, :], 0,
                      n_frames - 1)                           # [B, O]

    def lane_windows(res_b, t_b):
        return jax.vmap(
            lambda t: jax.lax.dynamic_slice_in_dim(res_b, t, tmax, axis=0)
        )(t_b)

    windows = jax.vmap(lane_windows)(res, t_cand)             # [B, O, Tmax, F]
    win_e = jnp.sum(jnp.square(windows), axis=(2, 3))         # [B, O]

    # (3) scan over the K x D candidate grid (keeps memory at
    # [B, O, Tmax, F] per step instead of materializing all templates).
    def cand_step(_, kd):
        k, d = kd // n_d, kd % n_d
        q = top_q[:, k]                                       # [B]
        w = tmpl.bank[q, d]                                   # [B, Tmax, F]
        nrm = jnp.maximum(tmpl.norms[q, d], 1e-12)            # [B]
        dot = jnp.einsum("botf,btf->bo", windows, w,
                         precision=jax.lax.Precision.HIGHEST)
        g = jnp.maximum(dot / nrm[:, None], 0.0)              # [B, O]
        scaled = g[:, :, None, None] * w[:, None]
        new = jnp.maximum(windows - scaled, 0.0)
        over = jnp.maximum(scaled - windows, 0.0)
        s = (win_e - jnp.sum(jnp.square(new), axis=(2, 3))
             - loop.over_penalty * jnp.sum(jnp.square(over), axis=(2, 3)))
        return None, (g, s)

    _, (g_all, s_all) = jax.lax.scan(
        cand_step, None, jnp.arange(n_k * n_d))               # [KD, B, O]
    # -> [B, K*D*O] in golden's C-order (k, d, o)
    g_flat = jnp.transpose(g_all, (1, 0, 2)).reshape(b, -1)
    s_flat = jnp.transpose(s_all, (1, 0, 2)).reshape(b, -1)

    best = jnp.argmax(s_flat, axis=1)                         # [B]
    g_best = jnp.take_along_axis(g_flat, best[:, None], 1)[:, 0]
    s_best = jnp.take_along_axis(s_flat, best[:, None], 1)[:, 0]
    k_best = best // (n_d * n_o)
    d_best = (best // n_o) % n_d
    o_best = best % n_o
    q_best = jnp.take_along_axis(top_q, k_best[:, None], 1)[:, 0]
    t_best = jnp.take_along_axis(t_cand, o_best[:, None], 1)[:, 0]

    accept = active & (g_best >= loop.min_gain) & (
        s_best >= loop.min_score_rel * e_cur)

    # (4) masked subtract + masked append
    w_best = tmpl.bank[q_best, d_best]                        # [B, Tmax, F]
    gain_eff = jnp.where(accept, g_best, 0.0)

    def lane_subtract(res_b, w_b, g_b, t_b):
        window = jax.lax.dynamic_slice_in_dim(res_b, t_b, tmax, axis=0)
        new = jnp.maximum(window - g_b * w_b, 0.0)
        return jax.lax.dynamic_update_slice_in_dim(res_b, new, t_b, axis=0)

    res_new = jax.vmap(lane_subtract)(res, w_best, gain_eff, t_best)

    # Flattened q = instrument * n_pitches + pitch (golden's C-order).
    n_p = cfg.synth.n_pitches
    idx = notes.count
    app = jax.vmap(_append_row)
    notes_new = NotesBatch(
        onset=app(notes.onset, idx, t_best, accept),
        dur=app(notes.dur, idx, tmpl.durs[d_best], accept),
        pitch=app(notes.pitch, idx, q_best % n_p, accept),
        gain=app(notes.gain, idx, g_best, accept),
        program=app(notes.program, idx, q_best // n_p, accept),
        count=notes.count + accept.astype(jnp.int32),
        residual_energy=jnp.sum(jnp.square(res_new), axis=(1, 2)),
    )
    return _Carry(res_new, notes_new, ~accept | carry.done, carry.e0,
                  carry.it + 1)


def transcribe_spectrograms(spec: jnp.ndarray, cfg: Config,
                            tmpl: TemplateArrays,
                            score_fn: ScoreFn = heuristic_scores,
                            ) -> NotesBatch:
    """[B, T, F] linear log-freq spectrograms -> NotesBatch (jittable)."""
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
        count=jnp.zeros((b,), jnp.int32),
        residual_energy=e0,
    )
    carry0 = _Carry(res, notes0, jnp.zeros((b,), bool), e0,
                    jnp.zeros((), jnp.int32))

    body = partial(_loop_body, cfg=cfg, tmpl=tmpl, n_frames=n_frames,
                   score_fn=score_fn)
    out = jax.lax.while_loop(
        lambda c: (c.it < cap) & jnp.any(~c.done), body, carry0)
    return out.notes


def transcribe_waves(waves: jnp.ndarray, cfg: Config, tmpl: TemplateArrays,
                     score_fn: ScoreFn = heuristic_scores) -> NotesBatch:
    """[B, N] waveforms -> NotesBatch; the full jittable device program."""
    spec = spectrogram_batch(waves, cfg)
    return transcribe_spectrograms(spec, cfg, tmpl, score_fn)


class Transcriber:
    """Host-facing transcription front door (SURVEY.md L5/L6).

    Compiles one XLA program per (batch, n_samples) shape; feeds waveform
    batches in, converts note arrays to NoteSequences on the host (float64
    tick/velocity quantization — shared with the golden path).
    """

    def __init__(self, cfg: Config, score_fn: ScoreFn = heuristic_scores):
        self.cfg = cfg
        self.tmpl = load_template_arrays(cfg)
        self._score_fn = score_fn
        self._fn = jax.jit(
            lambda waves: transcribe_waves(waves, cfg, self.tmpl,
                                           self._score_fn))

    def transcribe_batch(self, waves: np.ndarray) -> list[NoteSequence]:
        notes = jax.device_get(self._fn(jnp.asarray(waves)))
        return notes_batch_to_sequences(notes, self.cfg)

    def transcribe(self, wave: np.ndarray) -> NoteSequence:
        return self.transcribe_batch(np.asarray(wave)[None])[0]


def notes_batch_to_sequences(notes: NotesBatch,
                             cfg: Config) -> list[NoteSequence]:
    out = []
    for b in range(notes.onset.shape[0]):
        out.append(note_arrays_to_sequence(
            np.asarray(notes.onset[b]), np.asarray(notes.dur[b]),
            np.asarray(notes.pitch[b]), np.asarray(notes.gain[b]),
            np.asarray(notes.program[b]), int(notes.count[b]),
            hop=cfg.dsp.hop, sample_rate=cfg.dsp.sample_rate,
            pitch_min=cfg.synth.pitch_min))
    return out
