"""True in-place dynamic stores via Pallas input/output aliasing.

``jax.lax.dynamic_update_slice`` on a scan carry is NOT reliably in-place
on TPU: when the buffer is also read in the same loop body, XLA inserts a
full-buffer copy (profiled: ~150 µs per 1 MB slab written into a 33 MB
staging buffer — the copy, not the write, dominates the serving decode
step).  This kernel bypasses XLA's copy semantics: the buffer is aliased
input→output (guaranteed by ``input_output_aliases``), and one DMA writes
the slab at a scalar-prefetched leading index.

The reference has no analog — closest is its in-place cast
(``FPEmuOp`` inplace mode, pytquant/cpp/fpemu.py:52-59); this is the
TPU-native "write this tile where I say" primitive the serving engine's
staging and cache-merge paths are built on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _store_kernel(idx_ref, buf_ref, slab_ref, out_ref, sem):
    i = idx_ref[0]
    dma = pltpu.make_async_copy(slab_ref, out_ref.at[i], sem)
    dma.start()
    dma.wait()


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=0)
def _dyn_store(buf, slab, idx, interpret):
    n = buf.shape[0]
    out = pl.pallas_call(
        _store_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # buf (stays HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # slab
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(jnp.atleast_1d(idx).astype(jnp.int32) % n, buf, slab)
    return out


def dyn_store(buf: jax.Array, slab: jax.Array, idx, *,
              interpret: bool = False, use_pallas: bool = True
              ) -> jax.Array:
    """``buf[idx] = slab`` without copying ``buf``.

    ``slab.shape`` must equal ``buf.shape[1:]``.  The caller must treat
    ``buf`` as consumed (it is donated/aliased) and use only the returned
    array — exactly the ``lax.dynamic_update_slice`` contract, minus the
    hidden copy.  ``use_pallas=False`` falls back to
    ``dynamic_update_slice`` (CPU tests / non-TPU backends).

    Internally the row is DMA'd as a flat (T, N) view — contiguous-dim
    reshapes are layout bitcasts, so aliasing survives — because Mosaic
    requires DMA slice trailing dims to be tile-aligned.  Rows whose N is
    not 128-aligned fall back to ``dynamic_update_slice``.
    """
    assert slab.shape == buf.shape[1:], (slab.shape, buf.shape)
    # Mosaic DMA requires every non-leading slice dim to be tile-aligned;
    # the sublane tile is 32 for 1-byte dtypes, 16 for 2-byte, 8 for
    # 4-byte.  Misaligned (or non-TPU) cases fall back to XLA.
    sublane = {1: 32, 2: 16, 4: 8}.get(buf.dtype.itemsize, 8)
    aligned = (slab.ndim >= 2 and slab.shape[-1] % 128 == 0
               and slab.shape[-2] % sublane == 0)
    if not use_pallas or not aligned:
        zeros = (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(
            buf, slab[None].astype(buf.dtype), (idx, *zeros))
    return _dyn_store(buf, slab.astype(buf.dtype), idx, interpret)
