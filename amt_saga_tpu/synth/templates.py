"""Note synthesizer: waveforms + spectral-template bank (SURVEY.md Lsynth/C8).

The reference synthesizes each predicted note (SING-style neural decoder or
per-instrument spectral templates, PAPERS.md / BASELINE config 5) and
subtracts its spectrogram from the residual.  Here the synthesizer is a
damped-harmonic additive model "rendered through the same STFT"
(SURVEY.md §7 step 4):

* :func:`note_waveform` renders one (pitch, duration, instrument) note as
  audio — also used by the test-fixture generator, so templates match
  fixture audio exactly.
* :func:`template_bank` precomputes the log-frequency magnitude patches
  ``[I, P, D, Tmax, F]`` for every (instrument, pitch, duration-grid)
  triple, via the golden NumPy DSP so the TPU and golden paths share
  bit-identical atoms.

At transcription time the bank is a device-resident constant; synthesis of
a candidate note is a pure gather + scale (SURVEY.md 3.4 build note), which
is what lets the SAGA loop compile into a single ``lax.while_loop``.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from functools import lru_cache

import numpy as np

from ..config import DSPConfig, SynthConfig
from ..golden.dsp_np import spectrogram_np


def midi_to_hz(pitch: float) -> float:
    return 440.0 * 2.0 ** ((pitch - 69.0) / 12.0)


def instrument_rolloff(cfg: SynthConfig, instrument: int) -> float:
    rolls = cfg.instrument_rolloffs
    return rolls[instrument % len(rolls)]


def note_waveform(
    pitch: int,
    dur_s: float,
    synth: SynthConfig,
    dsp: DSPConfig,
    *,
    amplitude: float = 1.0,
    instrument: int = 0,
    length_samples: int | None = None,
) -> np.ndarray:
    """Render one note as float32 audio (host NumPy, float64 internally)."""
    sr = dsp.sample_rate
    if length_samples is None:
        length_samples = int(round((dur_s + 4 * synth.release_seconds) * sr))
    t = np.arange(length_samples, dtype=np.float64) / sr
    f0 = midi_to_hz(pitch)
    rolloff = instrument_rolloff(synth, instrument)

    nyq = 0.95 * sr / 2.0
    wave = np.zeros(length_samples, dtype=np.float64)
    norm = 0.0
    for h in range(1, synth.n_harmonics + 1):
        fh = h * f0
        if fh >= nyq:
            break
        a = h ** (-rolloff)
        wave += a * np.sin(2.0 * np.pi * fh * t)
        norm += a
    if norm > 0:
        wave /= norm

    env = np.exp(-t / synth.decay_seconds)
    after = t > dur_s
    env[after] *= np.exp(-(t[after] - dur_s) / synth.release_seconds)
    return (amplitude * wave * env).astype(np.float32)


def template_lead(dsp: DSPConfig) -> int:
    """Leading context frames baked into each template.

    STFT frames overlap (n_fft > hop), so the ``n_fft//hop - 1`` frames
    before a note's onset frame partially cover the onset.  Templates
    include those frames (note placed ``lead`` frames in), and the residual
    is front-padded by ``lead`` so a template placed at padded index ``p``
    models a note whose true onset frame is ``p``.  Without this, partial
    onset energy survives subtraction and is re-detected as spurious notes.
    """
    return dsp.n_fft // dsp.hop - 1


def template_length_samples(synth: SynthConfig, dsp: DSPConfig) -> int:
    """Samples so a no-pad STFT yields exactly ``template_frames`` frames."""
    return (synth.template_frames - 1) * dsp.hop + dsp.n_fft


@lru_cache(maxsize=4)
def template_bank(synth: SynthConfig, dsp: DSPConfig) -> np.ndarray:
    """[I, P, D, Tmax, n_bins] float32 linear-magnitude template patches.

    Rendered from the exact same waveform the fixture generator emits
    (same ``note_waveform`` call, same default length), zero-padded by the
    template lead, so clean fixtures are exactly representable.
    """
    n_samp = template_length_samples(synth, dsp)
    lead_samp = template_lead(dsp) * dsp.hop
    bank = np.zeros(
        (synth.n_instruments, synth.n_pitches, len(synth.duration_grid),
         synth.template_frames, dsp.n_bins),
        dtype=np.float32,
    )
    for i in range(synth.n_instruments):
        for pi in range(synth.n_pitches):
            pitch = synth.pitch_min + pi
            for di, dur in enumerate(synth.duration_grid):
                nw = note_waveform(pitch, dur, synth, dsp,
                                   amplitude=1.0, instrument=i)
                buf = np.zeros(n_samp, dtype=np.float32)
                m = min(len(nw), n_samp - lead_samp)
                buf[lead_samp:lead_samp + m] = nw[:m]
                bank[i, pi, di] = spectrogram_np(buf, dsp, pad=False)
    return bank


@lru_cache(maxsize=4)
def template_sq_norms(synth: SynthConfig, dsp: DSPConfig) -> np.ndarray:
    """[I, P, D] squared L2 norms of each template patch."""
    bank = template_bank(synth, dsp)
    return np.sum(np.square(bank, dtype=np.float64),
                  axis=(-2, -1)).astype(np.float32)


@lru_cache(maxsize=4)
def spectral_profiles(synth: SynthConfig, dsp: DSPConfig) -> np.ndarray:
    """[I, P, n_bins] unit-L2 time-collapsed profiles for coarse scoring."""
    bank = template_bank(synth, dsp)
    prof = bank[:, :, -1].sum(axis=-2)  # longest duration, collapse time
    norms = np.linalg.norm(prof, axis=-1, keepdims=True)
    return (prof / np.maximum(norms, 1e-12)).astype(np.float32)


@lru_cache(maxsize=4)
def onset_envelope(synth: SynthConfig, dsp: DSPConfig) -> np.ndarray:
    """[Tmax] unit-L2 temporal envelope (matched filter for onsets)."""
    bank = template_bank(synth, dsp)
    env = bank[:, :, -1].sum(axis=(0, 1, 3))  # collapse instr/pitch/freq
    return (env / max(np.linalg.norm(env), 1e-12)).astype(np.float32)


def gram_from_bank(bank_flat: np.ndarray) -> np.ndarray:
    """[QD, Tmax, F] flat bank -> [Ndt, QD, QD] template-overlap Gram.

    ``gram[k, a, b] = sum_{tau, f} W_a[tau + dt, f] * W_b[tau, f]`` with
    ``dt = k - (Tmax - 1)`` and templates zero outside ``[0, Tmax)``, so
    ``Ndt = 2*Tmax - 1`` covers every nonzero overlap.  This is what lets
    the SAGA loop keep all candidate dot products exact across the
    sequential within-iteration extractions WITHOUT re-streaming the
    template bank per peak: subtracting ``g * W_a`` at frame ``t*`` shifts
    every candidate dot ``<w(t), W_b>`` by ``-g * gram[t - t*, a, b]``.

    Computed on the host in float32 sgemm using the dt<->-dt transpose
    symmetry (halves the work; the default 88-pitch bank takes a few
    seconds), and content-address cached on disk (``AMT_GRAM_CACHE`` or
    ``~/.cache/amt_saga_tpu``) because it is a pure function of the bank.
    """
    qd, tmax, _f = bank_flat.shape
    digest = hashlib.sha1(b"gram-v1" + bank_flat.tobytes()).hexdigest()[:20]
    cache_dir = os.environ.get(
        "AMT_GRAM_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "amt_saga_tpu"))
    path = os.path.join(cache_dir, f"gram_{digest}.npy")
    if os.path.exists(path):
        try:
            gram = np.load(path)
            if gram.shape == (2 * tmax - 1, qd, qd):
                return gram
        except Exception:
            pass  # unreadable/corrupt cache entry: recompute below
    gram = np.empty((2 * tmax - 1, qd, qd), dtype=np.float32)
    flat = np.ascontiguousarray(bank_flat, dtype=np.float32)
    for dt in range(tmax):
        a = flat[:, dt:].reshape(qd, -1)
        b = flat[:, :tmax - dt].reshape(qd, -1)
        g = a @ b.T
        gram[tmax - 1 + dt] = g
        gram[tmax - 1 - dt] = g.T
    try:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".npy")
        with os.fdopen(fd, "wb") as f:
            np.save(f, gram)
        os.replace(tmp, path)  # atomic: concurrent writers race safely
    except OSError:
        pass  # cache is best-effort
    return gram


def duration_grid_frames(synth: SynthConfig, dsp: DSPConfig) -> np.ndarray:
    """Duration grid converted to whole frames (int32)."""
    spf = dsp.hop / dsp.sample_rate
    return np.maximum(
        1, np.round(np.asarray(synth.duration_grid) / spf)).astype(np.int32)
