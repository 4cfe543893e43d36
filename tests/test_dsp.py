"""DSP front-end tests: jnp STFT vs scipy + NumPy mirror parity (C2, C3)."""

import numpy as np
import scipy.signal

from amt_saga_tpu.dsp.audio import load_wav, pad_to_length, save_wav
from amt_saga_tpu.dsp.cqt import bin_center_freqs, logf_filterbank
from amt_saga_tpu.golden.dsp_np import spectrogram_np, stft_magnitude_np


def _jnp_spec(wave, cfg):
    import jax.numpy as jnp

    from amt_saga_tpu.dsp.cqt import logf_spectrogram
    from amt_saga_tpu.dsp.stft import stft_magnitude

    mag = stft_magnitude(jnp.asarray(wave), cfg.dsp)
    return np.asarray(logf_spectrogram(mag, cfg.dsp))


def test_stft_matches_scipy(tiny_config):
    cfg = tiny_config.dsp
    rng = np.random.default_rng(0)
    wave = rng.standard_normal(cfg.sample_rate).astype(np.float32)

    ours = stft_magnitude_np(wave, cfg, pad=False)

    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft)
    _, _, z = scipy.signal.stft(
        wave, fs=cfg.sample_rate, window=win, nperseg=cfg.n_fft,
        noverlap=cfg.n_fft - cfg.hop, boundary=None, padded=False,
        detrend=False, return_onesided=True)
    ref = np.abs(z.T) * win.sum()  # scipy normalizes by win.sum()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_jnp_matches_numpy_spectrogram(tiny_config):
    cfg = tiny_config
    rng = np.random.default_rng(1)
    wave = rng.standard_normal(cfg.dsp.sample_rate * 2).astype(np.float32)
    a = _jnp_spec(wave, cfg)
    b = spectrogram_np(wave, cfg.dsp)
    assert a.shape == b.shape
    assert a.shape[0] % cfg.dsp.pad_frames_to == 0
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_filterbank_semitone_alignment(tiny_config):
    cfg = tiny_config.dsp
    fb = logf_filterbank(cfg)
    assert fb.shape == (cfg.n_fft // 2 + 1, cfg.n_bins)
    assert np.all(fb >= 0)
    # A pure tone at a bin center lands most energy in that bin.
    centers = bin_center_freqs(cfg)
    k = cfg.n_bins // 2
    t = np.arange(cfg.sample_rate, dtype=np.float64) / cfg.sample_rate
    tone = np.sin(2 * np.pi * centers[k] * t).astype(np.float32)
    spec = spectrogram_np(tone, cfg, pad=False)
    assert abs(int(np.argmax(spec.sum(axis=0))) - k) <= 1


def test_wav_roundtrip(tmp_path, tiny_config):
    sr = tiny_config.dsp.sample_rate
    t = np.arange(sr, dtype=np.float64) / sr
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    save_wav(path, wave, sr)
    back, sr2 = load_wav(path, sr)
    assert sr2 == sr
    np.testing.assert_allclose(back, wave, atol=1e-3)
    assert len(pad_to_length(back, sr * 2)) == sr * 2
    assert len(pad_to_length(back, sr // 2)) == sr // 2


def test_resample(tmp_path, tiny_config):
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    wave = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "t.wav")
    save_wav(path, wave, sr)
    back, sr2 = load_wav(path, 8000)
    assert sr2 == 8000
    assert abs(len(back) - 8000) <= 1


def test_wav_length_matches_load(tmp_path, tiny_config):
    """Header-only wav_length must equal len(load_wav(...)) incl. resample."""
    from amt_saga_tpu.dsp.audio import wav_length

    for sr_file, sr_target, n in [(16000, 16000, 12345),
                                  (16000, 8000, 12345),
                                  (22050, 16000, 9999),
                                  (8000, 16000, 4001)]:
        rng = np.random.default_rng(n)
        wave = rng.standard_normal(n).astype(np.float32) * 0.1
        path = str(tmp_path / f"t_{sr_file}_{sr_target}_{n}.wav")
        save_wav(path, wave, sr_file)
        decoded, _ = load_wav(path, sr_target)
        assert wav_length(path, sr_target) == len(decoded)


def test_residual_ops(tiny_config):
    """dsp.residual is the L0 public API the loop composes (C4)."""
    import jax.numpy as jnp

    from amt_saga_tpu.dsp.residual import (
        energy,
        is_silent,
        section,
        subtract,
    )

    rng = np.random.default_rng(0)
    res = jnp.asarray(np.abs(rng.standard_normal((20, 8))).astype(
        np.float32))
    patch = jnp.asarray(np.abs(rng.standard_normal((5, 8))).astype(
        np.float32))
    e0 = energy(res)
    assert float(e0) > 0
    win = section(res, jnp.int32(3), 5)
    assert win.shape == (5, 8)
    new = subtract(res, patch, jnp.float32(10.0), jnp.int32(3))
    assert float(energy(new)) < float(e0)
    assert np.all(np.asarray(new) >= 0)  # clamped
    # gain 0 is a no-op (done-lane masking relies on it)
    same = subtract(res, patch, jnp.float32(0.0), jnp.int32(3))
    np.testing.assert_array_equal(np.asarray(same), np.asarray(res))
    assert bool(is_silent(jnp.zeros((4, 4)), jnp.float32(1.0), 1e-3))
    assert not bool(is_silent(res, e0, 1e-3))


def test_estimate_onset_density_orders_clips(tmp_path, tiny_config):
    from amt_saga_tpu.dsp.audio import estimate_onset_density
    from amt_saga_tpu.runtime.fixtures import make_clip

    cfg = tiny_config
    sparse, _ = make_clip(cfg, kind="isol", seconds=6.0, n_notes=3, seed=1)
    dense, _ = make_clip(cfg, kind="mus", seconds=6.0, n_voices=4, seed=1)
    sp = str(tmp_path / "sparse.wav")
    dp = str(tmp_path / "dense.wav")
    save_wav(sp, sparse, cfg.dsp.sample_rate)
    save_wav(dp, dense, cfg.dsp.sample_rate)
    assert estimate_onset_density(dp) > estimate_onset_density(sp)
    silent = str(tmp_path / "silent.wav")
    save_wav(silent, np.zeros(8000, np.float32), cfg.dsp.sample_rate)
    assert estimate_onset_density(silent) == 0.0
