"""Residual-spectrogram operations (SURVEY.md C4, layer L0).

The reference wraps the residual in a mutable class with ``.subtract`` /
``.section`` / ``.is_silent`` methods (SURVEY.md C4).  TPU-native, the
residual is a plain immutable array threaded through ``lax.while_loop``
carries, and these are pure functions on it.

Layout: residual is [T + template_frames, F] (time-major, log-freq bins
last).  The extra ``template_frames`` of zero padding at the end lets a
template window be placed at ANY valid onset frame with a static window
size — no boundary conditionals inside the loop body (SURVEY.md §7 "hard
parts": static shapes under jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_for_templates(spec: jnp.ndarray, template_frames: int) -> jnp.ndarray:
    """[.., T, F] -> [.., T + template_frames, F] zero-padded residual."""
    pad = [(0, 0)] * (spec.ndim - 2) + [(0, template_frames), (0, 0)]
    return jnp.pad(spec, pad)


def energy(res: jnp.ndarray) -> jnp.ndarray:
    """Total energy (sum of squared magnitudes) over the last two axes."""
    return jnp.sum(jnp.square(res), axis=(-2, -1))


def section(res: jnp.ndarray, t0: jnp.ndarray, length: int) -> jnp.ndarray:
    """[Tp, F] -> [length, F] window starting at dynamic frame t0."""
    return jax.lax.dynamic_slice_in_dim(res, t0, length, axis=0)


def subtract(res: jnp.ndarray, patch: jnp.ndarray, gain: jnp.ndarray,
             t0: jnp.ndarray) -> jnp.ndarray:
    """Subtract ``gain * patch`` at frame t0, clamped at zero.

    res: [Tp, F]; patch: [L, F]; gain: scalar; t0: scalar int frame.
    A masked-out lane passes gain=0, making this a no-op (the batched loop
    relies on that for done-lane handling).
    """
    window = section(res, t0, patch.shape[0])
    new = jnp.maximum(window - gain * patch, 0.0)
    return jax.lax.dynamic_update_slice_in_dim(res, new, t0, axis=0)


def ls_gain(window: jnp.ndarray, patch: jnp.ndarray,
            patch_sq_norm: jnp.ndarray) -> jnp.ndarray:
    """Least-squares gain <window, patch> / ||patch||^2, clamped >= 0."""
    dot = jnp.sum(window * patch, axis=(-2, -1))
    return jnp.maximum(dot / jnp.maximum(patch_sq_norm, 1e-12), 0.0)


def energy_reduction(window: jnp.ndarray, patch: jnp.ndarray,
                     gain: jnp.ndarray) -> jnp.ndarray:
    """Exact energy explained by subtracting gain*patch (with clamping)."""
    new = jnp.maximum(window - gain[..., None, None] * patch, 0.0)
    return jnp.sum(jnp.square(window), axis=(-2, -1)) - jnp.sum(
        jnp.square(new), axis=(-2, -1))
