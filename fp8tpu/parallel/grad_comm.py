"""Quantized-payload gradient all-reduce (fp8/int8 on the wire).

The reference syncs data-parallel gradients with apex DDP /
``torch.distributed.all_reduce`` in full precision
(/root/reference/examples/training/resnet/main_amp.py:210-216,
examples/inference/classifier/utils.py:38-46).  On TPU pods the DP
gradient sync crosses DCN (the slowest link in the system), so the
TPU-native design compresses the wire payload instead: gradients ride
the network as fp8 (or int8) with per-block scales — half the bytes of
bf16, a quarter of f32 — while every accumulation stays in f32 on
device.

Mechanism (single-quantization all-reduce, expressible in shard_map):

1. reduce-scatter as ``all_to_all``: the flat gradient is split into
   ``N`` destination chunks, each quantized ONCE against per-block amax
   scales (the wire analog of the reference cast kernels' ``block_norm``
   mode, /root/reference/mpemu/pytquant/cpp/fpemu_impl.cpp:794-799), and
   ``lax.all_to_all`` delivers chunk ``j`` to device ``j``.  Unlike a
   ring reduce-scatter (whose hop payload is a partial sum that would be
   requantized N-1 times), every wire payload here is a once-quantized
   leaf gradient; the receiver dequantizes and sums in f32.
2. quantized ``all_gather``: the reduced chunk is requantized once and
   gathered.

Total quantization stages per element: 2 (operand + result),
independent of the device count.  Wire bytes per element:
``(N-1)/N * 1B`` each phase vs ``2 * (N-1)/N * 4B`` for an f32 ring
all-reduce — a 4x DCN-byte reduction (2x vs bf16) plus ~0.8% scale
overhead at block=512, which is what the ``dp_projection`` in
tools/scaling_overlap.py credits fp8 gradient streams with.

Use :func:`wire_all_reduce` (or :func:`wire_all_reduce_tree`) inside a
``shard_map`` training step over the ``host``/``data`` axis in place of
``lax.psum`` on the grads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
from jax import lax

from fp8tpu.numerics.blockquant import (dequant_blocks as _dequant_blocks,
                                        quant_blocks as _quant_blocks)


def wire_all_reduce(x: jax.Array, axis_name: str, fmt: Optional[str] = "e4m3",
                    mean: bool = False, block: int = 512) -> jax.Array:
    """All-reduce ``x`` over ``axis_name`` with quantized wire payloads.

    Must run inside ``shard_map``/``pmap`` (it issues collectives).
    ``fmt`` ∈ {"e4m3", "e5m2", "int8", "bf16", None}; ``None`` is an
    exact f32 ``lax.psum``.  ``block`` is the per-scale granularity —
    gradients of different layers land in different blocks, so a raveled
    multi-layer tree keeps per-layer dynamic range.  Accumulation is
    always f32 on-device; only the network payload is quantized.
    """
    if fmt is None:
        out = lax.psum(x.astype(jnp.float32), axis_name)
        out = out / lax.psum(1, axis_name) if mean else out
        return out.astype(x.dtype)

    n = lax.psum(1, axis_name)
    orig_shape, orig_dtype = x.shape, x.dtype
    flat = x.astype(jnp.float32).reshape(-1)
    size = flat.shape[0]
    csz = -(-size // n)            # elements per destination chunk
    nb = -(-csz // block)          # blocks per chunk
    csz = nb * block
    flat = jnp.pad(flat, (0, n * csz - size))
    blocks = flat.reshape(n, nb, block)

    # Phase 1: quantize once per block, all_to_all, f32 sum.  bf16 has
    # no scales to move (they are all-ones) — skip their collectives.
    scaled = fmt != "bf16"
    q, s = _quant_blocks(blocks, fmt)
    q = lax.all_to_all(q, axis_name, split_axis=0, concat_axis=0, tiled=True)
    if scaled:
        s = lax.all_to_all(s, axis_name, split_axis=0, concat_axis=0,
                           tiled=True)
    reduced = jnp.sum(_dequant_blocks(q, s), axis=0)  # (nb, block) f32
    if mean:
        reduced = reduced / n

    # Phase 2: requantize the reduced chunk once, quantized all_gather.
    qr, sr = _quant_blocks(reduced, fmt)
    qg = lax.all_gather(qr, axis_name, tiled=True)   # (n*nb, block)
    if scaled:
        sg = lax.all_gather(sr, axis_name, tiled=True)   # (n*nb,)
    else:
        sg = jnp.ones((qg.shape[0],), jnp.float32)
    out = _dequant_blocks(qg, sg).reshape(-1)[:size]
    out_dtype = (orig_dtype if jnp.issubdtype(orig_dtype, jnp.floating)
                 else jnp.float32)
    return out.reshape(orig_shape).astype(out_dtype)


def wire_all_reduce_tree(tree, axis_name: str, fmt: Optional[str] = "e4m3",
                         mean: bool = False, block: int = 512):
    """``wire_all_reduce`` over a gradient pytree.

    All leaves are raveled into ONE flat vector first so the sync is a
    single pair of collectives (one all_to_all + one all_gather) rather
    than per-leaf dispatches — the DCN analog of gradient bucketing in
    the reference's ``DDP(delay_allreduce=True)``
    (/root/reference/examples/training/resnet/main_amp.py:216).
    Per-block scales keep per-layer dynamic range inside the ravel.
    """
    flat, unravel = jax.flatten_util.ravel_pytree(tree)
    out = wire_all_reduce(flat, axis_name, fmt=fmt, mean=mean, block=block)
    return unravel(out)


def wire_bytes_per_element(fmt: Optional[str], n_devices: int,
                           block: int = 512) -> float:
    """Network bytes moved per gradient element for one all-reduce
    (both phases), for the scaling projection."""
    width = {None: 4.0, "bf16": 2.0, "e4m3": 1.0, "e5m2": 1.0,
             "int8": 1.0}[fmt]
    frac = (n_devices - 1) / n_devices
    scale_overhead = 0.0 if fmt in (None, "bf16") else 4.0 / block
    return 2.0 * frac * (width + scale_overhead)
