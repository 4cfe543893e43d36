"""STFT front-end (SURVEY.md C2, layer L0) — pure jnp, jit-compatible.

Design (TPU-first): framing is a gather, the window is folded into the
frames, and the DFT is ``jnp.fft.rfft``.  The log-frequency binning
(:mod:`.cqt`) follows as a single matmul, so the whole front-end is
gather + elementwise + FFT + matmul — exactly the shape the fused Pallas
kernel (:mod:`amt_saga_tpu.ops.spectrogram_pallas`) reimplements as two
MXU matmuls (nnAudio formulation, PAPERS.md).

Conventions (pinned for golden-path parity, SURVEY.md §4.1):
* No centering / reflection padding: frame t covers samples
  ``[t*hop, t*hop + n_fft)``; T = 1 + (N - n_fft) // hop, then right-padded
  with zero frames to a multiple of ``pad_frames_to``.
* Periodic Hann window: ``0.5 - 0.5*cos(2*pi*n / n_fft)``.
* Output is LINEAR magnitude, shape [T, n_fft//2 + 1], float32.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig


@lru_cache(maxsize=8)
def hann_window(n_fft: int) -> np.ndarray:
    n = np.arange(n_fft, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / n_fft)).astype(np.float32)


def frame_signal(wave: jnp.ndarray, cfg: DSPConfig) -> jnp.ndarray:
    """[N] -> [T, n_fft] windowed frames (zero frames pad T to tiling)."""
    n = wave.shape[-1]
    t_raw = cfg.raw_num_frames(n)
    t_pad = cfg.num_frames(n)
    starts = jnp.arange(t_raw) * cfg.hop
    idx = starts[:, None] + jnp.arange(cfg.n_fft)[None, :]
    frames = wave[idx] * jnp.asarray(hann_window(cfg.n_fft))
    if t_pad > t_raw:
        frames = jnp.pad(frames, ((0, t_pad - t_raw), (0, 0)))
    return frames


def stft_magnitude(wave: jnp.ndarray, cfg: DSPConfig) -> jnp.ndarray:
    """[N] -> [T, n_fft//2+1] linear magnitude spectrogram."""
    frames = frame_signal(wave, cfg)
    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    return jnp.abs(spec).astype(jnp.float32)
