"""Flax note-classifier CNN (SURVEY.md C7, layer L2).

The reference's classifier is a VGG-ish CNN over spectrogram patches with
heads for onset / pitch / duration (+ instrument for MusicNet)
[SURVEY.md C7].  TPU-native redesign: one FULLY-CONVOLUTIONAL pass over the
whole residual spectrogram per loop iteration (instead of per-window
re-crops) — convs stay large and batched on the MXU, and the output is a
dense per-frame score map that drops directly into the SAGA loop's
``score_fn`` slot (:mod:`amt_saga_tpu.saga.loop`):

* ``onset_pitch``: [B, T, Q] logits — "a note of (instrument*pitch) q
  starts at frame t".
* ``duration``: [B, T, D] logits over the duration grid (supervision +
  standalone dense prediction).
* ``presence``: [B, T] logit — "any onset at frame t" (confidence gate).
* ``velocity``: [B, T, Q] regression in [0, 1] — MIDI velocity / 127 of
  the note starting at (t, q); supervised at onset cells only (SURVEY.md
  C7 "velocity/gain (regression)" head).

Score head (v2, "CNN-first" classifier): the loop's coarse score map is

    score[t, q] = matched_filter(residual)[t, q] * gate[t, q]
    gate = floor + (1 - floor) * sigmoid(onset_logits + presence_logit)

i.e. the matched filter — itself a 2-matmul linear network with the
template bank as weights — is COMPOSED into the model, and the conv tower
learns the nonlinear gating on top.  Round 1 trained the tower to replace
the matched filter and lost 10 F1 points on clean data to approximation
error; composing the teacher instead of distilling it makes the clean
floor structural: the ``onset_pitch``/``presence`` head kernels are
ZERO-INITIALIZED, so an untrained model has gate == (floor + 1)/2
everywhere — a uniform positive scale of the heuristic map, which leaves
every argmax / local-max / tie-bucket decision of the loop bit-identical
to the heuristic classifier (tested).  Training then only bends the map
away from that baseline where the data says so (noise suppression,
mid-loop residual artifacts).

Input is ``log1p(residual)`` — the residual itself stays linear for
subtraction.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, ModelConfig


class NoteClassifier(nn.Module):
    """Fully-convolutional onset/pitch/duration/velocity classifier."""

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
        # Temporal context: residual dilated 1-D convs over T.  The
        # matched filter integrates ~80 frames of envelope; the gate
        # needs comparable context to judge whether a peak is a real
        # onset or noise/bleed from a neighbour.
        for j, dil in enumerate(self.cfg.temporal_dilations):
            y = nn.Conv(self.cfg.hidden, (3,), kernel_dilation=(dil,),
                        dtype=dtype, name=f"tconv{j}")(x)
            x = nn.relu(x + y)
        if self.cfg.dropout > 0:
            x = nn.Dropout(self.cfg.dropout, deterministic=not train)(x)
        zeros = nn.initializers.zeros
        out = {
            # Zero-init: untrained gate is uniform -> loop decisions are
            # bit-identical to the heuristic classifier (module docstring).
            "onset_pitch": nn.Dense(self.n_q, dtype=jnp.float32,
                                    kernel_init=zeros,
                                    name="head_onset_pitch")(x),
            "duration": nn.Dense(self.n_d, dtype=jnp.float32,
                                 name="head_duration")(x),
            "presence": nn.Dense(1, dtype=jnp.float32, kernel_init=zeros,
                                 name="head_presence")(x)[..., 0],
            "velocity": nn.sigmoid(
                nn.Dense(self.n_q, dtype=jnp.float32,
                         name="head_velocity")(x)),
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
    (``[B, T, Q]``, q = instrument * n_pitches + pitch): the matched
    filter gated by the model's onset/presence heads (module docstring).
    """
    model = build_classifier(cfg)

    from ..synth.templates import template_lead

    lead = template_lead(cfg.dsp)
    floor = float(cfg.model.gate_floor)
    if cfg.run.cnn_gate not in ("residual", "static"):
        raise ValueError(f"unknown run.cnn_gate {cfg.run.cnn_gate!r} "
                         "(residual | static)")
    static_gate = cfg.run.cnn_gate == "static"

    # Normalize by the zero-init gate value COMPUTED WITH THE SAME
    # f32 ops, so an untrained model's gate is elementwise x/x == 1.0
    # and `mf * 1.0` is bit-identical to the heuristic map.  A plain
    # 0.7 multiplier would shift quantization boundaries in the
    # coarse-RATIO decisions (the onset-refractory gate) — argmax
    # decisions are scale-invariant, quantized ratio compares are
    # only invariant under power-of-2 or exact-unit scaling.
    gate0 = np.float32(floor) + ((np.float32(1.0) - np.float32(floor))
                                 * np.float32(0.5))

    def gate_rel_of(x: jnp.ndarray) -> jnp.ndarray:
        """gate/gate0 [B, T, Q] from an UNPADDED [B, T, n_bins] input."""
        out = model.apply({"params": params}, x)
        gate_logits = out["onset_pitch"] + out["presence"][..., None]
        gate = floor + (1.0 - floor) * jax.nn.sigmoid(gate_logits)
        return gate / gate0

    def score_fn(res: jnp.ndarray, tmpl, n_frames: int,
                 band: jnp.ndarray | None = None,
                 gate_rel: jnp.ndarray | None = None) -> jnp.ndarray:
        from ..saga.loop import heuristic_scores, matmul_precision

        if gate_rel is None:
            # Contract (saga/loop.py): coarse[t] scores "a note whose
            # TRUE onset is frame t".  The residual is front-padded by
            # the template lead, so spec frame t lives at res row
            # t + lead — slice the lead off so the model (trained on
            # unpadded spectrograms) sees frame t at row t.  Feeding the
            # padded rows directly shifts every predicted onset by +lead
            # frames (off by 96 ms at the default config).  Also drop
            # the Pallas path's 128-aligned bin padding.
            x = jax.lax.dynamic_slice_in_dim(res, lead, n_frames, axis=1)
            gate_rel = gate_rel_of(x[:, :, :cfg.dsp.n_bins])
        mf = heuristic_scores(res, tmpl, n_frames, band=band,
                              precision=matmul_precision(cfg))
        return mf * gate_rel

    def velocity_fn(spec: jnp.ndarray, onset: jnp.ndarray,
                    q: jnp.ndarray) -> jnp.ndarray:
        """Velocity-head predictions for accepted notes: [B, cap] in
        [0, 1].  ``spec`` is the UNPADDED [B, T, n_bins] spectrogram;
        runs ONCE per batch after the loop (RunConfig.velocity_source
        'head'/'blend' consume it at emission)."""
        out = model.apply({"params": params}, spec)
        vel = out["velocity"]                          # [B, T, Q]
        t_c = jnp.clip(onset, 0, vel.shape[1] - 1)
        return jnp.take_along_axis(
            jnp.take_along_axis(vel, t_c[:, :, None], axis=1),
            q[:, :, None], axis=2)[..., 0]

    # transcribe_spectrograms hoists the loop-invariant band matrix out of
    # the while_loop and passes it in (same treatment as the heuristic —
    # rebuilding it per iteration was the round-1 profile's largest item).
    score_fn.needs_band = True
    score_fn.velocity_fn = velocity_fn
    if static_gate:
        # saga.loop._run_loop calls this ONCE on the pristine unpadded
        # spectrogram and threads the result into every iteration's
        # score_fn call — the conv tower leaves the while_loop entirely.
        score_fn.precompute_gate = gate_rel_of
    return score_fn


def predict_dense(cfg: Config, params: Any, spec) -> dict[str, jnp.ndarray]:
    """Standalone dense per-frame prediction (no SAGA loop): onset
    probabilities [B, T, Q], duration-class probabilities [B, T, D],
    presence probability [B, T], velocity [B, T, Q] in [0, 1].

    The reference exposes the classifier's raw heads for inspection /
    downstream use [SURVEY.md C7]; this is that surface.
    """
    model = build_classifier(cfg)
    out = model.apply({"params": params}, jnp.asarray(spec))
    return {
        "onset_pitch": jax.nn.sigmoid(out["onset_pitch"]),
        "duration": jax.nn.softmax(out["duration"], axis=-1),
        "presence": jax.nn.sigmoid(out["presence"]),
        "velocity": out["velocity"],
    }
