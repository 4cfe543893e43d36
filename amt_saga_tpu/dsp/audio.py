"""Audio I/O (SURVEY.md C1, layer L0).

No librosa/soundfile in this environment (SURVEY.md §7): WAV I/O is
vendored on top of ``scipy.io.wavfile``; resampling via
``scipy.signal.resample_poly``.  All host-side, NumPy only — waveforms
cross to the device exactly once per batch (SURVEY.md 3.1).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str, sample_rate: int | None = None) -> tuple[np.ndarray, int]:
    """Load a WAV file as mono float32 in [-1, 1], optionally resampled.

    Returns (waveform, sample_rate).
    """
    sr, data = wavfile.read(path)
    wave = _to_float32(data)
    if wave.ndim == 2:  # downmix stereo
        wave = wave.mean(axis=1)
    if sample_rate is not None and sr != sample_rate:
        frac = Fraction(sample_rate, sr).limit_denominator(1 << 16)
        wave = resample_poly(wave, frac.numerator, frac.denominator)
        wave = np.asarray(wave, dtype=np.float32)
        sr = sample_rate
    return np.ascontiguousarray(wave, dtype=np.float32), sr


def wav_length(path: str, sample_rate: int | None = None) -> int:
    """Samples ``load_wav(path, sample_rate)`` would return, header-only.

    Reads the WAV via mmap (no data decode/copy) and mirrors
    ``resample_poly``'s output-length rule (ceil(n*up/down)), so corpus
    runners can size padding buckets without decoding every file twice.
    """
    sr, data = wavfile.read(path, mmap=True)
    n = int(data.shape[0])
    if sample_rate is not None and sr != sample_rate:
        frac = Fraction(sample_rate, sr).limit_denominator(1 << 16)
        n = -(-n * frac.numerator // frac.denominator)
    return n


def estimate_onset_density(path: str, target_rate: int = 4000) -> float:
    """Cheap onsets-per-second estimate straight off the WAV (mmap read,
    strided — no resample, no full decode).

    Rectified energy-flux peak count on ~32 ms windows.  Used by the
    corpus runner to order clips so lockstep batches group clips of
    similar note density — the batched while_loop runs max-over-lanes
    iterations, so one dense clip in a sparse batch wastes the whole
    batch's time (SURVEY.md §2.3 DP row).
    """
    sr, data = wavfile.read(path, mmap=True)
    if data.ndim == 2:
        data = data[:, 0]
    stride = max(1, sr // target_rate)
    x = np.asarray(data[::stride], dtype=np.float32)
    eff_sr = sr / stride
    win = max(1, int(eff_sr * 0.032))
    n = len(x) // win
    if n < 3:
        return 0.0
    e = np.square(x[:n * win].reshape(n, win)).mean(axis=1)
    flux = np.maximum(np.diff(e), 0.0)
    peak = float(flux.max())
    if peak <= 0.0:
        return 0.0
    # Count flux peaks above a tenth of the clip max — robust to absolute
    # level, biased high on noisy audio (harmless: ordering only).
    onsets = int(np.sum((flux[1:-1] > 0.1 * peak)
                        & (flux[1:-1] >= flux[:-2])
                        & (flux[1:-1] >= flux[2:])))
    return onsets / (n * win / eff_sr)


def save_wav(path: str, wave: np.ndarray, sample_rate: int) -> None:
    wave = np.asarray(wave, dtype=np.float32)
    peak = np.max(np.abs(wave)) if wave.size else 0.0
    if peak > 1.0:
        wave = wave / peak
    wavfile.write(path, sample_rate, (wave * 32767.0).astype(np.int16))


def _to_float32(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.float32 or data.dtype == np.float64:
        return data.astype(np.float32)
    if data.dtype == np.int16:
        return (data / 32768.0).astype(np.float32)
    if data.dtype == np.int32:
        return (data / 2147483648.0).astype(np.float32)
    if data.dtype == np.uint8:
        return ((data.astype(np.float32) - 128.0) / 128.0).astype(np.float32)
    raise ValueError(f"unsupported WAV dtype: {data.dtype}")


def pad_to_length(wave: np.ndarray, n_samples: int) -> np.ndarray:
    """Right-pad (or truncate) a waveform to a fixed static length."""
    if len(wave) >= n_samples:
        return wave[:n_samples]
    return np.pad(wave, (0, n_samples - len(wave)))
