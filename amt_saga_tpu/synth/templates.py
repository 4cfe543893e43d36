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
def bank_frame_extents(synth: SynthConfig, dsp: DSPConfig) -> tuple:
    """Per-duration template extent: the number of leading frames of
    the [Tmax, F] patch that contain every nonzero value, over all
    (instrument, pitch) atoms of that duration.

    ``note_waveform`` truncates a note at ``dur + 4*release_seconds``
    samples, so a 0.125 s atom occupies ~13 of the default 80 frames and
    the rest are EXACT zeros — the candidate-dots matmul can skip them
    (see saga.loop._duration_groups); exact zeros contribute exact zeros
    to an f32 accumulation, so truncated dots are bit-identical.
    """
    bank = template_bank(synth, dsp)
    exts = []
    for d in range(bank.shape[2]):
        nz = np.nonzero(np.abs(bank[:, :, d]).sum(axis=(0, 1, 3)))[0]
        exts.append(int(nz[-1]) + 1 if len(nz) else 1)
    return tuple(exts)


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


# ---------------------------------------------------------------------------
# Continuous duration refinement (SURVEY.md C7 "duration regression").
#
# The SAGA loop picks durations from the discrete grid; both paths record
# the winner's decision-quantized closed-form scores at ALL grid durations
# (NotesBatch.sd / golden sd).  Host-side, those scores are fitted against
# a precomputed cross-correlation table between the grid atoms and
# templates rendered at a FINE log-spaced duration grid: for the true
# (off-grid) duration tau, the score vector over grid atoms d is
# s_d = <w, W_d>^2 / ||W_d||^2 with w ~= g * W_tau, so
# sqrt(s_d * ||W_d||^2) ~= g * <W_d, W_tau> = g * K[d, tau] — a rank-1
# model in the unknown gain whose least-squares fit quality
# r(tau) = (sum_d dvec_d K[d,tau])^2 / sum_d K[d,tau]^2 peaks at the true
# duration.  Pure float64 host arithmetic on identically-quantized inputs
# keeps TPU/golden MIDI bit-parity (SURVEY.md §7 "round on host").
# ---------------------------------------------------------------------------

# Fine-grid resolution: log-spaced points per adjacent grid interval.  16
# gives ~2-3% duration steps everywhere — below one STFT frame (the
# emission lattice) for all default grid entries.
FINE_POINTS_PER_INTERVAL = 16


def fine_duration_grid(synth: SynthConfig) -> np.ndarray:
    """[n_fine] float64 log-spaced durations spanning the grid's range."""
    grid = np.asarray(synth.duration_grid, dtype=np.float64)
    if len(grid) < 2:
        return grid.copy()
    segs = [
        np.exp(np.linspace(np.log(grid[i]), np.log(grid[i + 1]),
                           FINE_POINTS_PER_INTERVAL, endpoint=False))
        for i in range(len(grid) - 1)
    ]
    return np.concatenate(segs + [grid[-1:]])


@lru_cache(maxsize=4)
def duration_fit_table(synth: SynthConfig, dsp: DSPConfig) -> np.ndarray:
    """[Q, D, n_fine] float32: K[q, d, j] = <W_{q,d}, W_{q,tau_j}>.

    Cross-correlations (zero lag, shared onset) between each grid template
    and templates rendered at the fine duration grid.  The fine renders
    factor the note envelope out of the harmonic stack — the stack is
    duration-independent, so each (q, tau) render is one envelope multiply
    + spectrogram instead of a full ``note_waveform`` call.  Disk-cached
    like the Gram tensor (pure function of the configs).
    """
    fine = fine_duration_grid(synth)
    key = (f"durfit-v2|{synth!r}|{dsp!r}|{fine.tobytes().hex()[:40]}")
    digest = hashlib.sha1(key.encode()).hexdigest()[:20]
    cache_dir = os.environ.get(
        "AMT_GRAM_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "amt_saga_tpu"))
    path = os.path.join(cache_dir, f"durfit_{digest}.npy")
    n_q = synth.n_instruments * synth.n_pitches
    n_d = len(synth.duration_grid)
    if os.path.exists(path):
        try:
            tab = np.load(path)
            if tab.shape == (n_q, n_d, len(fine)):
                return tab
        except Exception:
            pass  # unreadable cache entry: recompute below

    bank = template_bank(synth, dsp).reshape(n_q, n_d, -1)
    n_samp = template_length_samples(synth, dsp)
    lead_samp = template_lead(dsp) * dsp.hop
    sr = dsp.sample_rate
    t = np.arange(n_samp - lead_samp, dtype=np.float64) / sr
    decay_env = np.exp(-t / synth.decay_seconds)
    tab = np.empty((n_q, n_d, len(fine)), dtype=np.float32)
    for i in range(synth.n_instruments):
        for pi in range(synth.n_pitches):
            q = i * synth.n_pitches + pi
            # Duration-independent harmonic stack (mirrors note_waveform).
            pitch = synth.pitch_min + pi
            f0 = midi_to_hz(pitch)
            rolloff = instrument_rolloff(synth, i)
            nyq = 0.95 * sr / 2.0
            stack = np.zeros_like(t)
            norm = 0.0
            for h in range(1, synth.n_harmonics + 1):
                fh = h * f0
                if fh >= nyq:
                    break
                a = h ** (-rolloff)
                stack += a * np.sin(2.0 * np.pi * fh * t)
                norm += a
            if norm > 0:
                stack /= norm
            fine_mat = np.empty((len(fine), bank.shape[-1]),
                                dtype=np.float32)
            buf = np.zeros(n_samp, dtype=np.float32)
            for j, tau in enumerate(fine):
                env = decay_env.copy()
                after = t > tau
                env[after] *= np.exp(-(t[after] - tau)
                                     / synth.release_seconds)
                # note_waveform truncates the note at tau + 4*release
                # (default length); mirror that so K[d, tau] matches the
                # atoms the bank actually contains near grid durations.
                env[t > tau + 4.0 * synth.release_seconds] = 0.0
                buf[lead_samp:] = (stack * env).astype(np.float32)
                fine_mat[j] = spectrogram_np(buf, dsp, pad=False).reshape(-1)
            tab[q] = bank[q] @ fine_mat.T
    try:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".npy")
        with os.fdopen(fd, "wb") as f:
            np.save(f, tab)
        os.replace(tmp, path)  # atomic: concurrent writers race safely
    except OSError:
        pass  # cache is best-effort
    return tab


class DurationRefiner:
    """Continuous duration from the winner's grid-score vector.

    Callable shared by ``saga.loop`` and ``golden.pipeline`` at emission
    time: ``refiner(d_idx, pitch_idx, program, svec) -> seconds | None``.
    ``svec`` holds the winner's decision-quantized scores at every grid
    duration (same candidate onset/offset); both paths record it
    bit-identically, and everything here is deterministic float64, so the
    refined tick is bit-identical too — MIDI parity is preserved.

    The estimate maximizes the rank-1 fit quality r(tau) over the fine
    grid (see module comment), restricted to [grid[d-1], grid[d+1]]
    around the argmax winner d (the discrete decision is never overridden
    by more than one grid step), then sharpened by a parabolic vertex in
    log-duration through the argmax neighbors.
    """

    def __init__(self, synth: SynthConfig, dsp: DSPConfig):
        self.n_p = synth.n_pitches
        self.grid = np.asarray(synth.duration_grid, dtype=np.float64)
        n_d = len(self.grid)
        self.norms = template_sq_norms(synth, dsp).reshape(
            -1, n_d).astype(np.float64)
        self.fine = fine_duration_grid(synth)
        self.table = duration_fit_table(synth, dsp).astype(np.float64)
        self.den = np.maximum(
            np.sum(np.square(self.table), axis=1), 1e-300)  # [Q, n_fine]

    def __call__(self, d_idx: int, pitch_idx: int, program: int,
                 svec) -> float | None:
        n_d = len(self.grid)
        if n_d < 2:
            return None
        s = np.asarray(svec, dtype=np.float64)
        if s.shape[-1] != n_d or not np.all(np.isfinite(s)):
            return None
        q = int(program) * self.n_p + int(pitch_idx)
        dvec = np.sqrt(np.maximum(s, 0.0) * self.norms[q])
        if not dvec.max() > 0.0:
            return None
        num = dvec @ self.table[q]                       # [n_fine]
        r = np.square(np.maximum(num, 0.0)) / self.den[q]
        d = int(d_idx)
        lo = self.grid[max(d - 1, 0)]
        hi = self.grid[min(d + 1, n_d - 1)]
        masked = np.where((self.fine >= lo) & (self.fine <= hi), r, -np.inf)
        j = int(np.argmax(masked))                       # first-max
        if not np.isfinite(masked[j]):
            return None
        tau = float(self.fine[j])
        # Parabolic vertex through (ln tau, r) at j-1, j, j+1 (general
        # unequal-spacing form; fine points are log-uniform inside one
        # grid interval but not across interval boundaries).
        if 0 < j < len(self.fine) - 1 and np.isfinite(
                masked[j - 1]) and np.isfinite(masked[j + 1]):
            x0, x1, x2 = np.log(self.fine[j - 1:j + 2])
            y0, y1, y2 = r[j - 1:j + 2]
            d01, d12, d02 = x1 - x0, x2 - x1, x2 - x0
            denom = d01 * d12 * d02
            if denom > 0.0:
                a = (y0 * d12 - y1 * d02 + y2 * d01) / denom
                if a < 0.0:  # concave maximum
                    b = (y2 - y0) / d02 - a * (x0 + x2)
                    v = -b / (2.0 * a)
                    v = max(x0, min(x2, v))
                    tau = float(np.exp(v))
        return max(float(lo), min(float(hi), tau))

    def refine_many(self, d_idx: np.ndarray, pitch_idx: np.ndarray,
                    program: np.ndarray, svec: np.ndarray) -> np.ndarray:
        """Vectorized ``__call__`` over n notes -> [n] seconds (NaN =
        None).  BIT-IDENTICAL per note (pinned by
        tests/test_core.py): the per-note ``dvec @ table[q]`` BLAS call
        is kept per note (a batched einsum could change accumulation
        order), and every later step is the same f64 elementwise
        expression batched — np ufuncs produce the same values
        regardless of array length.  The per-note Python came to ~46 us
        x ~27 notes x lane on the 1-core host — half of
        emit.to_sequence (VERDICT r3 item 1)."""
        n_d = len(self.grid)
        n = len(d_idx)
        out = np.full(n, np.nan)
        if n_d < 2 or n == 0:
            return out
        s = np.asarray(svec, dtype=np.float64)
        q = (np.asarray(program, np.int64) * self.n_p
             + np.asarray(pitch_idx, np.int64))
        ok = (s.shape[-1] == n_d) & np.all(np.isfinite(s), axis=-1)
        dvec = np.sqrt(np.maximum(s, 0.0) * self.norms[q])
        ok &= dvec.max(axis=-1) > 0.0
        if not ok.any():
            return out
        n_f = self.table.shape[-1]
        num = np.empty((n, n_f))
        for a in np.nonzero(ok)[0]:        # same dgemv as __call__
            num[a] = dvec[a] @ self.table[int(q[a])]
        num[~ok] = 0.0
        r = np.square(np.maximum(num, 0.0)) / self.den[q]
        d = np.asarray(d_idx, np.int64)
        lo = self.grid[np.maximum(d - 1, 0)]
        hi = self.grid[np.minimum(d + 1, n_d - 1)]
        masked = np.where((self.fine[None, :] >= lo[:, None])
                          & (self.fine[None, :] <= hi[:, None]),
                          r, -np.inf)
        j = np.argmax(masked, axis=-1)
        ok &= np.isfinite(masked[np.arange(n), j])
        tau = self.fine[j].astype(np.float64)
        # Parabolic vertex (same expressions, batched; edge/finite
        # conditions keep the argmax tau exactly as __call__ does).
        inner = ok & (j > 0) & (j < len(self.fine) - 1)
        jm = np.clip(j, 1, len(self.fine) - 2)
        inner &= (np.isfinite(masked[np.arange(n), jm - 1])
                  & np.isfinite(masked[np.arange(n), jm + 1]))
        x = np.log(self.fine[(jm[:, None]
                              + np.arange(-1, 2)[None, :])])   # [n, 3]
        y = r[np.arange(n)[:, None],
              jm[:, None] + np.arange(-1, 2)[None, :]]
        d01 = x[:, 1] - x[:, 0]
        d12 = x[:, 2] - x[:, 1]
        d02 = x[:, 2] - x[:, 0]
        denom = d01 * d12 * d02
        with np.errstate(divide="ignore", invalid="ignore"):
            a_c = (y[:, 0] * d12 - y[:, 1] * d02 + y[:, 2] * d01) / denom
            b_c = (y[:, 2] - y[:, 0]) / d02 - a_c * (x[:, 0] + x[:, 2])
            v = -b_c / (2.0 * a_c)
        use = inner & (denom > 0.0) & (a_c < 0.0)
        v = np.maximum(x[:, 0], np.minimum(x[:, 2], v))
        tau = np.where(use, np.exp(np.where(use, v, 0.0)), tau)
        res = np.maximum(lo, np.minimum(hi, tau))
        out[ok] = res[ok]
        return out


@lru_cache(maxsize=4)
def make_duration_refiner(synth: SynthConfig,
                          dsp: DSPConfig) -> DurationRefiner:
    return DurationRefiner(synth, dsp)
