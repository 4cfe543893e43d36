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
