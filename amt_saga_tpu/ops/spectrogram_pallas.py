"""K1: fused spectrogram Pallas kernel (SURVEY.md §2.2).

Replaces the reference's librosa STFT path (C FFT + Python glue) with ONE
VMEM-resident pass per frame block: framing + Hann window + real DFT +
magnitude + log-frequency binning.  The DFT is two matmuls against
window-folded cos/sin bases (the nnAudio conv/matmul formulation,
PAPERS.md) — MXU-friendly, no FFT butterflies, no dynamic shapes.

Framing trick: with hop | n_fft, the waveform reshaped to [S, hop] rows
makes frame t the concatenation of rows t..t+R-1 (R = n_fft/hop), so the
windowed-DFT matmul decomposes into R *statically sliced* matmuls — no
overlapping BlockSpecs, no gathers:

    mag[t, k] = |sum_r  rows[t+r] @ basis[r, :, k]|

The frequency axis is processed in grid-blocked chunks with the
log-frequency filterbank matmul fused in; the output block accumulates
across frequency steps (TPU grids iterate sequentially).

Numerics: float32 throughout; equals the jnp rfft path to ~1e-4 relative
(different summation order).  The exact-parity pipeline (golden oracle)
keeps the rfft path; this kernel is the performance variant behind
``RunConfig.use_pallas``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DSPConfig
from ..dsp.cqt import logf_filterbank
from ..dsp.stft import hann_window


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _best_time_block(t_pad: int) -> int:
    """Frame-block size: trade MXU M-dim fill against round-up waste.

    ``t_pad`` is a multiple of 16 (``DSPConfig.pad_frames_to``).  tb=128
    fills the MXU but rounds the frame grid up to a 128 multiple — up to
    127 garbage frames (~78% waste at t_pad=144).  Smaller tb wastes MXU
    rows instead (measured ~4x cost/frame at tb=16 vs tb=128, i.e.
    roughly (128/tb)**(2/3)).  Minimize the product; ties go to the
    larger block.
    """
    if t_pad >= 128 * 8:        # waste <= 1/8 of one block; keep full fill
        return 128
    if t_pad <= 16:
        return max(t_pad, 1)
    best, best_cost = 16, float("inf")
    for tb in range(16, min(128, t_pad) + 1, 16):
        cost = _round_up(t_pad, tb) * (128.0 / tb) ** (2.0 / 3.0)
        if cost <= best_cost:
            best, best_cost = tb, cost
    return best


@lru_cache(maxsize=4)
def _bases(cfg: DSPConfig, nf_pad: int) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded DFT bases [R, hop, nf_pad] (cos, sin), float32."""
    n_fft, hop = cfg.n_fft, cfg.hop
    r = n_fft // hop
    win = hann_window(n_fft).astype(np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(nf_pad, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft        # [n_fft, nf_pad]
    cos = (win[:, None] * np.cos(ang)).astype(np.float32)
    sin = (win[:, None] * np.sin(ang)).astype(np.float32)
    n_freqs = cfg.freq_bins
    cos[:, n_freqs:] = 0.0
    sin[:, n_freqs:] = 0.0
    return (cos.reshape(r, hop, nf_pad), sin.reshape(r, hop, nf_pad))


@lru_cache(maxsize=4)
def _used_freqs(cfg: DSPConfig) -> int:
    """Highest DFT bin the log-frequency filterbank reads, + 1.

    At the default config only bins 0..450 of 1025 carry nonzero
    filterbank weight (fmax of the 88-pitch log grid is ~3.5 kHz);
    every bin above contributes an EXACT zero to the output, so the
    kernel computes only the used bins — 2.5x fewer FLOPs in the
    dominant DFT matmuls, bit-identical output."""
    fb = logf_filterbank(cfg)
    nz = np.nonzero(np.abs(fb).sum(axis=1) > 0)[0]
    return int(nz[-1]) + 1 if len(nz) else 1


@lru_cache(maxsize=4)
def _fb_padded(cfg: DSPConfig, nf_pad: int, nb_pad: int) -> np.ndarray:
    fb = logf_filterbank(cfg)                          # [n_freqs, n_bins]
    out = np.zeros((nf_pad, nb_pad), dtype=np.float32)
    k = min(fb.shape[0], nf_pad)  # rows >= _used_freqs are all zero
    out[:k, :fb.shape[1]] = fb[:k]
    return out


def _kernel(rows_hbm, cos_ref, sin_ref, fb_ref, out_ref,
            span, sem, *, tb: int, r: int, hop: int, span_rows: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    f = pl.program_id(2)
    n_t = pl.num_programs(1)

    # Double-buffered span DMA (rounded up to the 8-sublane tiling
    # Mosaic requires for sliced copies).  Handled on the FIRST
    # frequency step only — the f axis is the innermost (sequential)
    # grid dimension, so the scratch span persists across the remaining
    # f steps of the same (b, t) block.  The buffer parity follows the
    # GLOBAL block index b*n_t + t (plain t%2 would break at every b
    # transition with odd n_t): this block's span was started by the
    # previous block (the very first block starts its own), and the
    # next block's copy is started before this block's matmuls run,
    # hiding the DMA setup latency behind the compute.
    slot = jax.lax.rem(b * n_t + t, 2)

    def _copy(bb, tt, sl):
        return pltpu.make_async_copy(
            rows_hbm.at[bb, pl.ds(tt * tb, span_rows), :],
            span.at[sl], sem.at[sl])

    @pl.when((f == 0) & (b == 0) & (t == 0))
    def _():
        _copy(b, t, slot).start()

    @pl.when(f == 0)
    def _():
        _copy(b, t, slot).wait()
        nb = jnp.where(t + 1 < n_t, b, b + 1)
        nt = jnp.where(t + 1 < n_t, t + 1, 0)

        @pl.when(nb < pl.num_programs(0))
        def _():
            _copy(nb, nt, 1 - slot).start()

    # Windowed DFT as R statically-shifted matmuls on the MXU.
    hi = jax.lax.Precision.HIGHEST
    acc_c = jnp.zeros((tb, cos_ref.shape[2]), jnp.float32)
    acc_s = jnp.zeros((tb, cos_ref.shape[2]), jnp.float32)
    for i in range(r):
        rows = span[slot, i:i + tb, :]
        acc_c += jnp.dot(rows, cos_ref[i], precision=hi,
                         preferred_element_type=jnp.float32)
        acc_s += jnp.dot(rows, sin_ref[i], precision=hi,
                         preferred_element_type=jnp.float32)
    mag = jnp.sqrt(acc_c * acc_c + acc_s * acc_s)       # [tb, FB]

    part = jnp.dot(mag, fb_ref[:], precision=hi,
                   preferred_element_type=jnp.float32)

    @pl.when(f == 0)
    def _():
        out_ref[0] = part

    @pl.when(f > 0)
    def _():
        out_ref[0] += part


def spectrogram_pallas(waves: jnp.ndarray, cfg: DSPConfig,
                       freq_block: int = 256,
                       keep_padded_bins: bool = False) -> jnp.ndarray:
    """[B, N] float32 waveforms -> [B, T, n_bins] log-freq magnitude.

    Drop-in equivalent (to fp tolerance) of
    ``logf_spectrogram(stft_magnitude(w, cfg), cfg)``.
    """
    if cfg.n_fft % cfg.hop != 0:
        raise ValueError("K1 requires hop | n_fft")
    b, n = waves.shape
    t_pad = cfg.num_frames(n)
    r = cfg.n_fft // cfg.hop
    # Time block = matmul M dimension.  The MXU is a 128x128 systolic
    # array: a 16-row block uses 1/8 of it (the round-2 profile showed
    # K1 at ~4x off the f32 matmul rate for exactly this reason), so run
    # up to 128 frames per block and pad the frame axis up to a multiple
    # — the pad frames compute garbage from the zero-padded tail and are
    # masked/sliced off below.  For short clips the block size adapts to
    # cap that round-up waste (see _best_time_block).
    tb = _best_time_block(t_pad)
    t_grid = _round_up(t_pad, tb)
    hop = cfg.hop

    span_rows = _round_up(tb + r - 1, 8)
    n_rows = t_grid - tb + span_rows  # last block's span must fit
    n_span = n_rows * hop
    if n < n_span:
        waves = jnp.pad(waves, ((0, 0), (0, n_span - n)))
    rows = waves[:, :n_span].reshape(b, n_rows, hop)

    nf_pad = _round_up(min(cfg.freq_bins, _used_freqs(cfg)), freq_block)
    nb_pad = _round_up(cfg.n_bins, 128)
    cos, sin = _bases(cfg, nf_pad)
    fb = _fb_padded(cfg, nf_pad, nb_pad)
    n_f = nf_pad // freq_block

    out = pl.pallas_call(
        partial(_kernel, tb=tb, r=r, hop=hop, span_rows=span_rows),
        grid=(b, t_grid // tb, n_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # rows (manual DMA)
            pl.BlockSpec((r, hop, freq_block), lambda bb, t, f: (0, 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, hop, freq_block), lambda bb, t, f: (0, 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((freq_block, nb_pad), lambda bb, t, f: (f, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tb, nb_pad), lambda bb, t, f: (bb, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_grid, nb_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, span_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # CPU backend (tests) runs the kernel in interpreter mode.
        interpret=jax.default_backend() == "cpu",
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t_pad * cfg.n_fft * nf_pad,
            bytes_accessed=4 * (b * n_span + b * t_pad * nb_pad),
            transcendentals=b * t_pad * nf_pad,
        ),
    )(rows, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fb))
    # Frames past the last FULL frame are zero-pad frames by convention
    # (dsp.stft), but the row decomposition would compute them from the
    # waveform tail — mask them out (and slice off the block-rounding
    # frames beyond t_pad).
    out = out[:, :t_pad]
    t_raw = cfg.raw_num_frames(n)
    mask = (jnp.arange(t_pad) < t_raw)[None, :, None]
    if not keep_padded_bins:
        out = out[:, :, :cfg.n_bins]
    return jnp.where(mask, out, 0.0)
