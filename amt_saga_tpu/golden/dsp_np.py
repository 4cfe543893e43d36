"""Pure-NumPy mirror of the DSP front-end (SURVEY.md §4.1 golden path).

These functions pin the exact semantics of :mod:`amt_saga_tpu.dsp` in plain
NumPy float32 — same framing, same periodic Hann window, same rfft, same
filterbank matrix object.  The template bank (:mod:`amt_saga_tpu.synth`)
is built through THIS path so the TPU and golden pipelines share
bit-identical atoms.
"""

from __future__ import annotations

import numpy as np

from ..config import DSPConfig
from ..dsp.cqt import logf_filterbank
from ..dsp.stft import hann_window


def frame_signal_np(wave: np.ndarray, cfg: DSPConfig,
                    pad: bool = True) -> np.ndarray:
    n = wave.shape[-1]
    t_raw = cfg.raw_num_frames(n)
    t_out = cfg.num_frames(n) if pad else t_raw
    frames = np.zeros((t_out, cfg.n_fft), dtype=np.float32)
    win = hann_window(cfg.n_fft)
    for t in range(t_raw):
        frames[t] = wave[t * cfg.hop:t * cfg.hop + cfg.n_fft] * win
    return frames


def stft_magnitude_np(wave: np.ndarray, cfg: DSPConfig,
                      pad: bool = True) -> np.ndarray:
    frames = frame_signal_np(np.asarray(wave, dtype=np.float32), cfg, pad=pad)
    spec = np.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    return np.abs(spec).astype(np.float32)


def logf_spectrogram_np(mag: np.ndarray, cfg: DSPConfig) -> np.ndarray:
    return (mag @ logf_filterbank(cfg)).astype(np.float32)


def spectrogram_np(wave: np.ndarray, cfg: DSPConfig,
                   pad: bool = True) -> np.ndarray:
    """waveform -> [T, n_bins] linear-magnitude log-frequency spectrogram."""
    return logf_spectrogram_np(stft_magnitude_np(wave, cfg, pad=pad), cfg)
