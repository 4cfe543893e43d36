"""Residual-spectrogram operations (SURVEY.md C4, layer L0).

The reference wraps the residual in a mutable class with ``.subtract`` /
``.section`` / ``.is_silent`` methods (SURVEY.md C4).  TPU-native, the
residual is a plain immutable array threaded through ``lax.while_loop``
carries, and these are the pure functions on it that
:mod:`amt_saga_tpu.saga.loop` composes (per-lane; the loop vmaps them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
    relies on that for done-lane handling; res is non-negative).
    """
    window = section(res, t0, patch.shape[0])
    new = jnp.maximum(window - gain * patch, 0.0)
    return jax.lax.dynamic_update_slice_in_dim(res, new, t0, axis=0)


def is_silent(res: jnp.ndarray, e0: jnp.ndarray,
              silence_rel: float) -> jnp.ndarray:
    """Termination test: energy below ``silence_rel`` of the initial."""
    return energy(res) <= silence_rel * e0
