"""Log-frequency / pseudo-CQT binning (SURVEY.md C3, layer L0).

Variable-Q windows resist fusion (SURVEY.md §7 "hard parts"); instead we
use the STFT -> banded-matmul formulation (one FFT, then a triangular
log-frequency filterbank), matching librosa's pseudo-CQT semantics and
nnAudio's conv/matmul realization (PAPERS.md).  The filterbank is a
precomputed [n_fft//2+1, n_bins] float32 matrix, so on TPU the binning is
one MXU matmul and fuses cleanly with the DFT matmuls in the Pallas kernel.

Bin centers are geometrically spaced: ``f_k = fmin * 2**(k / bins_per_octave)``;
each bin is a triangle between its neighbors' centers (unit peak), like a
mel filterbank but semitone-aligned.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..config import DSPConfig


@lru_cache(maxsize=8)
def logf_filterbank(cfg: DSPConfig) -> np.ndarray:
    """[n_fft//2+1, n_bins] triangular log-frequency filterbank (float32)."""
    n_freqs = cfg.freq_bins
    fft_freqs = np.arange(n_freqs, dtype=np.float64) * (
        cfg.sample_rate / cfg.n_fft)
    centers = cfg.fmin * 2.0 ** (
        np.arange(-1, cfg.n_bins + 1, dtype=np.float64) / cfg.bins_per_octave)
    fb = np.zeros((n_freqs, cfg.n_bins), dtype=np.float64)
    for k in range(cfg.n_bins):
        lo, mid, hi = centers[k], centers[k + 1], centers[k + 2]
        rise = (fft_freqs - lo) / max(mid - lo, 1e-12)
        fall = (hi - fft_freqs) / max(hi - mid, 1e-12)
        fb[:, k] = np.clip(np.minimum(rise, fall), 0.0, 1.0)
    return fb.astype(np.float32)


def bin_center_freqs(cfg: DSPConfig) -> np.ndarray:
    return cfg.fmin * 2.0 ** (np.arange(cfg.n_bins) / cfg.bins_per_octave)


def logf_spectrogram(mag: jnp.ndarray, cfg: DSPConfig) -> jnp.ndarray:
    """[.., T, n_fft//2+1] magnitude -> [.., T, n_bins] log-freq magnitude."""
    fb = jnp.asarray(logf_filterbank(cfg))
    return jnp.matmul(mag, fb, precision="highest")
