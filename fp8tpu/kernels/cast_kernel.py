"""Pallas TPU fake-quantization kernels.

TPU-native replacement for the reference's native cast libraries
(mpemu/pytquant/{cpp,cuda,hip} — ~4.9k lines of AVX512/CUDA/HIP): ONE
kernel family covering every format × rounding mode, parameterized by the
shared format table.  The bit pipeline is the same jnp code the jittable
emulation path uses (numerics/cast.py `cast_array`), traced into the
kernel body, so numerics are identical by construction.

What the Pallas version adds over the XLA-fused jnp path:

* on-chip PRNG (`pltpu.prng_seed` / `prng_random_bits`) — stochastic
  rounding without materializing a threefry bit tensor in HBM;
  reproducible via an explicit (seed, tile-id) scheme instead of the
  reference's 16 mutable global xoroshiro states (fpemu_impl.cpp:41-88);
* per-block (block-norm) scaling with the absmax reduction fused into the
  cast, one HBM round trip total (the reference does a separate reduction
  pass per block, fpemu_impl.cpp:794-799);
* a building block reused by the fused q-matmul kernels.

Tensors are processed as (rows, LANES)-tiled 2D views; arbitrary shapes
are padded to the tile grid and cropped on the way out.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fp8tpu.numerics.cast import cast_array
from fp8tpu.numerics.formats import FORMATS, RoundMode

LANES = 128
# Default tile: 512×512 f32 = 1 MiB in / 1 MiB out — comfortably in VMEM
# with double buffering.
_TILE_ROWS = 512
_TILE_COLS = 512


def _kernel_body(seed_ref, x_ref, scale_ref, o_ref, *, fmt_name, mode, daz,
                 block_cols):
    """One (TILE_ROWS, TILE_COLS) tile: optional per-row-block scale from
    in-tile absmax, optional on-chip random bits, then the shared cast
    pipeline in-register."""
    x = x_ref[:]
    if mode == RoundMode.STOCHASTIC:
        # Unique stream per tile: combine user seed with the tile index.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 7919
                        + pl.program_id(1))
        rbits = pltpu.bitcast(
            pltpu.prng_random_bits(x.shape), jnp.uint32
        ).astype(jnp.uint16)
    else:
        rbits = None

    if block_cols:
        # Block-norm: per contiguous row-segment power-of-two scale
        # (2·2^⌊log2 absmax⌋ / headroom) computed in-tile.
        fmt = FORMATS[fmt_name]
        seg = x.reshape(x.shape[0], x.shape[1] // block_cols, block_cols)
        amax = jnp.max(jnp.abs(seg), axis=2, keepdims=True)
        p2 = jax.lax.bitcast_convert_type(amax, jnp.uint32) & jnp.uint32(
            0x7F800000
        )
        p2f = jax.lax.bitcast_convert_type(p2, jnp.float32)
        scale = 2.0 * p2f / jnp.float32(fmt.block_headroom)
        scale = jnp.where(amax > 0, scale, 1.0)
        scale = jnp.broadcast_to(scale, seg.shape).reshape(x.shape)
    else:
        scale = scale_ref[0]

    rb = rbits.reshape(x.shape) if rbits is not None else None
    o_ref[:] = cast_array(x, scale, rb, fmt_name, mode, daz).astype(
        o_ref.dtype
    )


def _pad2d(x: jax.Array, tr: int, tc: int):
    """Reshape any tensor to a 2D padded tile grid; return (x2d, meta)."""
    n = x.size
    cols = tc
    rows = -(-n // cols)
    pad = rows * cols - n
    flat = jnp.pad(x.reshape(-1), (0, pad))
    rpad = (-rows) % tr
    x2 = jnp.pad(flat.reshape(rows, cols), ((0, rpad), (0, 0)))
    return x2, (n, rows + rpad)


@partial(jax.jit,
         static_argnames=("fmt_name", "mode", "daz", "block_size",
                          "interpret"))
def _pallas_qdq(x, scale, seed, fmt_name, mode, daz, block_size, interpret):
    orig_shape, orig_dtype = x.shape, x.dtype
    tc = _TILE_COLS
    if block_size:
        if block_size > tc or tc % block_size:
            raise ValueError(
                f"block_size {block_size} must divide tile width {tc}"
            )
    x2, (n, rows) = _pad2d(x.astype(jnp.float32), _TILE_ROWS, tc)
    grid = (rows // _TILE_ROWS, 1)

    out = pl.pallas_call(
        partial(_kernel_body, fmt_name=fmt_name, mode=mode, daz=daz,
                block_cols=block_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((_TILE_ROWS, tc), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scale
        ],
        out_specs=pl.BlockSpec((_TILE_ROWS, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
        interpret=interpret,
    )(seed, x2, scale)
    return out.reshape(-1)[:n].reshape(orig_shape).astype(orig_dtype)


def pallas_qdq(
    x: jax.Array,
    fmt,
    mode: RoundMode = RoundMode.RNE,
    scale=1.0,
    daz: bool = False,
    seed: int | jax.Array = 0,
    block_size: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fake-quantize ``x`` on-device with a single Pallas kernel.

    ``scale`` is a per-tensor scalar (use ``block_size`` > 0 for in-kernel
    per-block scaling over the flattened tensor; blocks must divide 512).
    ``seed`` selects the stochastic-rounding stream; results are
    deterministic in (seed, shape).
    """
    fmt_name = fmt if isinstance(fmt, str) else fmt.name
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    scale_arr = jnp.atleast_1d(jnp.asarray(scale, jnp.float32))
    return _pallas_qdq(x, scale_arr, seed_arr, fmt_name, mode, daz,
                       block_size, interpret)
