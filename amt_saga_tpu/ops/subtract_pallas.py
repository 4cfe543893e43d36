"""K2: fused template-subtract Pallas kernel (SURVEY.md §2.2).

Replaces the loop's per-lane gather -> scale -> subtract -> clamp ->
scatter sequence with one kernel that DMAs each lane's window from the
residual (scalar-prefetched onset frames drive the slicing), applies
``max(window - g*W, 0)`` in VMEM, writes it back in place, and emits the
exact energy removed per lane.

Mosaic requires sliced-DMA offsets aligned to the (8, 128) tile in the
sublane dimension, but note onsets are arbitrary frames — so the kernel
copies the 8-ALIGNED enclosing window of ``tmax + 8`` rows and shifts the
template to the in-window offset with a dynamic_update_slice in VMEM.
Callers must therefore provide a residual with at least 8 rows of slack
after the last valid window (``saga.loop.pad_residual`` does).

In-place semantics via input_output_aliases: the residual is donated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 8


def _kernel(t_ref, res_hbm, w_ref, g_ref, out_hbm, removed_ref,
            window, wbuf, sem_in, sem_out, *, tmax: int, wlen: int):
    b = pl.program_id(0)
    t0 = t_ref[b]
    t0a = (t0 // ALIGN) * ALIGN
    off = t0 - t0a

    dma_in = pltpu.make_async_copy(
        res_hbm.at[b, pl.ds(t0a, wlen), :], window, sem_in)
    dma_in.start()

    # Shift the template to the in-window offset.  Mosaic requires
    # statically 8-aligned store offsets, and off is in {0..7} — so emit 8
    # predicated static-offset stores instead of one dynamic store.
    wbuf[:] = jnp.zeros_like(wbuf)
    for k in range(ALIGN):
        @pl.when(off == k)
        def _(k=k):
            wbuf[k:k + tmax, :] = w_ref[0]

    dma_in.wait()

    g = g_ref[b]
    before = window[:]
    new = jnp.maximum(before - g * wbuf[:], 0.0)
    removed_ref[b] = jnp.sum(before * before) - jnp.sum(new * new)
    window[:] = new

    dma_out = pltpu.make_async_copy(
        window, out_hbm.at[b, pl.ds(t0a, wlen), :], sem_out)
    dma_out.start()
    dma_out.wait()


def _kernel_multi(t_ref, res_hbm, w_ref, g_ref, out_hbm,
                  window, wbuf, sem_in, sem_out,
                  *, tmax: int, wlen: int, n_k: int):
    """K sequential clamped window subtractions per lane, one launch.

    Bit-identical to n_k chained ``subtract_pallas`` calls: each k's
    span is DMA'd AFTER the previous k's write-back completes, so
    overlapping windows within a lane see the clamped intermediate
    exactly as the chained kernels would.  All spans are read from the
    ALIASED output ref: on TPU it is literally the input buffer, and in
    interpret mode (CPU tests) the aliased output starts as a copy of
    the input — reading the input ref there would see stale rows for
    overlapping windows.
    """
    del res_hbm  # aliased with out_hbm; all access goes through out
    b = pl.program_id(0)
    for k in range(n_k):
        t0 = t_ref[b, k]
        t0a = (t0 // ALIGN) * ALIGN
        off = t0 - t0a

        dma_in = pltpu.make_async_copy(
            out_hbm.at[b, pl.ds(t0a, wlen), :], window, sem_in)
        dma_in.start()

        wbuf[:] = jnp.zeros_like(wbuf)
        for j in range(ALIGN):
            @pl.when(off == j)
            def _(j=j, k=k):
                wbuf[j:j + tmax, :] = w_ref[0, k]

        dma_in.wait()
        window[:] = jnp.maximum(window[:] - g_ref[b, k] * wbuf[:], 0.0)

        dma_out = pltpu.make_async_copy(
            window, out_hbm.at[b, pl.ds(t0a, wlen), :], sem_out)
        dma_out.start()
        dma_out.wait()


def subtract_multi_pallas(res: jnp.ndarray, w: jnp.ndarray,
                          g: jnp.ndarray, t0: jnp.ndarray) -> jnp.ndarray:
    """In-place clamped subtraction of K windows per lane, in k order.

    res: [B, Tp, F] (donated; >= 8 rows of slack); w: [B, K, Tmax, F];
    g: [B, K] gains (0 = masked no-op); t0: [B, K] onset frames.
    Returns the new residual.  Replaces K chained ``subtract_pallas``
    launches with ONE kernel — the deferred-subtract loop restructure
    (see saga.loop._loop_body) moves the subtractions off the
    selection-critical chain, and this kernel collapses their launch +
    bank-gather overhead.
    """
    b, tp, f = res.shape
    n_k, tmax = w.shape[1], w.shape[2]
    wlen = tmax + ALIGN
    if tp < wlen:
        raise ValueError(f"residual too short: {tp} < {wlen}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # res
            pl.BlockSpec((1, n_k, tmax, f), lambda bb, *_: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),           # w
            pl.BlockSpec(memory_space=pltpu.SMEM),           # g
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),         # res out
        scratch_shapes=[
            pltpu.VMEM((wlen, f), jnp.float32),
            pltpu.VMEM((wlen, f), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        partial(_kernel_multi, tmax=tmax, wlen=wlen, n_k=n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(res.shape, res.dtype),
        input_output_aliases={1: 0},  # res (after scalar prefetch) -> out
        interpret=jax.default_backend() == "cpu",
    )(t0.astype(jnp.int32), res, w, g.astype(jnp.float32))


def subtract_pallas(res: jnp.ndarray, w: jnp.ndarray, g: jnp.ndarray,
                    t0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched in-place clamped subtraction.

    res: [B, Tp, F] residual (donated; needs >= 8 rows of slack after the
    last valid window); w: [B, Tmax, F] templates; g: [B] gains (0 =
    masked no-op); t0: [B] int32 onset frames.
    Returns (new_res, energy_removed [B]).
    """
    b, tp, f = res.shape
    tmax = w.shape[1]
    wlen = tmax + ALIGN
    if tp < wlen:
        raise ValueError(f"residual too short: {tp} < {wlen}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # res
            pl.BlockSpec((1, tmax, f), lambda bb, *_: (bb, 0, 0),
                         memory_space=pltpu.VMEM),           # w
            pl.BlockSpec(memory_space=pltpu.SMEM),           # g
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # res out
            pl.BlockSpec(memory_space=pltpu.SMEM),           # removed
        ],
        scratch_shapes=[
            pltpu.VMEM((wlen, f), jnp.float32),
            pltpu.VMEM((wlen, f), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, removed = pl.pallas_call(
        partial(_kernel, tmax=tmax, wlen=wlen),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(res.shape, res.dtype),
            jax.ShapeDtypeStruct((b,), jnp.float32),
        ],
        input_output_aliases={1: 0},  # res (after scalar prefetch) -> out
        interpret=jax.default_backend() == "cpu",
    )(t0.astype(jnp.int32), res, w, g.astype(jnp.float32))
    return out, removed
