"""Flax note-classifier CNN (SURVEY.md C7, layer L2).

The reference's classifier is a VGG-ish CNN over spectrogram patches with
heads for onset / pitch / duration (+ instrument for MusicNet)
[SURVEY.md C7].  TPU-native redesign: one FULLY-CONVOLUTIONAL pass over the
whole residual spectrogram per loop iteration (instead of per-window
re-crops) — convs stay large and batched on the MXU, and the output is a
dense per-frame score map that drops directly into the SAGA loop's
``score_fn`` slot (:mod:`amt_saga_tpu.saga.loop`):

* ``onset_pitch``: [B, T, Q] logits — "a note of (instrument*pitch) q
  starts at frame t".  This is the coarse score map the loop argmaxes;
  candidate rescoring-by-subtraction stays exactly the same, so the
  trained classifier and the matched-filter heuristic are drop-in
  interchangeable (golden parity is defined against the heuristic).
* ``duration``: [B, T, D] logits over the duration grid (supervision +
  standalone dense prediction).
* ``presence``: [B, T] logit — "any onset at frame t" (confidence gate).

Input is ``log1p(residual)`` — the residual itself stays linear for
subtraction.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config, ModelConfig


class NoteClassifier(nn.Module):
    """Fully-convolutional onset/pitch/duration/instrument classifier."""

    cfg: ModelConfig
    n_q: int  # instruments * pitches
    n_d: int  # duration-grid size

    @nn.compact
    def __call__(self, spec: jnp.ndarray, *, train: bool = False
                 ) -> dict[str, jnp.ndarray]:
        # spec: [B, T, F] linear magnitude
        dtype = jnp.dtype(self.cfg.dtype)
        x = jnp.log1p(spec)[..., None].astype(dtype)  # [B, T, F, 1]
        for i, ch in enumerate(self.cfg.channels):
            x = nn.Conv(ch, self.cfg.kernel_size,
                        strides=(1, 2) if i > 0 else (1, 1),
                        dtype=dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        b, t = x.shape[0], x.shape[1]
        x = x.reshape(b, t, -1)                        # [B, T, F'*C]
        x = nn.relu(nn.Dense(self.cfg.hidden, dtype=dtype, name="trunk")(x))
        if self.cfg.dropout > 0:
            x = nn.Dropout(self.cfg.dropout, deterministic=not train)(x)
        out = {
            "onset_pitch": nn.Dense(self.n_q, dtype=jnp.float32,
                                    name="head_onset_pitch")(x),
            "duration": nn.Dense(self.n_d, dtype=jnp.float32,
                                 name="head_duration")(x),
            "presence": nn.Dense(1, dtype=jnp.float32,
                                 name="head_presence")(x)[..., 0],
        }
        return out


def build_classifier(cfg: Config) -> NoteClassifier:
    n_q = cfg.synth.n_instruments * cfg.synth.n_pitches
    return NoteClassifier(cfg=cfg.model, n_q=n_q,
                          n_d=len(cfg.synth.duration_grid))


def init_params(cfg: Config, rng: jax.Array, n_frames: int = 64) -> Any:
    model = build_classifier(cfg)
    dummy = jnp.zeros((1, n_frames, cfg.dsp.n_bins), jnp.float32)
    return model.init({"params": rng}, dummy)["params"]


def make_cnn_score_fn(cfg: Config, params: Any):
    """Adapt a trained classifier to the SAGA loop's ``score_fn`` slot.

    Returns scores shaped/ordered exactly like the heuristic
    (``[B, T, Q]``, q = instrument * n_pitches + pitch), gated by the
    presence head so silent frames score low.
    """
    model = build_classifier(cfg)

    from ..synth.templates import template_lead

    lead = template_lead(cfg.dsp)

    def score_fn(res: jnp.ndarray, tmpl, n_frames: int) -> jnp.ndarray:
        # Contract (saga/loop.py): coarse[t] scores "a note whose TRUE
        # onset is frame t".  The residual is front-padded by the template
        # lead, so spec frame t lives at res row t + lead — slice the lead
        # off so the model (trained on unpadded spectrograms) sees frame t
        # at row t.  Feeding the padded rows directly shifts every
        # predicted onset by +lead frames (off by 96 ms at the default
        # config).  Also drop the Pallas path's 128-aligned bin padding.
        x = jax.lax.dynamic_slice_in_dim(res, lead, n_frames, axis=1)
        out = model.apply({"params": params}, x[:, :, :cfg.dsp.n_bins])
        gate = jax.nn.log_sigmoid(out["presence"])[..., None]
        return out["onset_pitch"] + gate

    return score_fn
