"""Single-pass Pallas int4 unpack-matmul (W4A16) with per-channel or
AWQ-class grouped scales.

The XLA formulation (serve/model.py int4_linear) splits the contraction
into even/odd halves, and XLA reads the packed buffer once per half —
doubling effective HBM traffic and erasing int4's byte win (NOTES r1).
This kernel reads each packed tile ONCE into VMEM, unpacks both nibbles
in-register, applies grouped scales to the unpacked tile when requested,
and issues both half-contraction MXU dots from the same resident tile.

**v5e measurement (tools/bench_int4.py, NOTES r2): the kernel is correct
but NOT faster than the fp8 path on this hardware generation.**  Mosaic
supports neither a direct uint8→bf16 convert nor int8-domain shifts
(compiler error / crash), so the unpack must widen to int32 — ~5 VPU
ops per weight, which costs far more than the halved HBM bytes save
(measured ~36-80 GB/s effective vs fp8's ~335-650).  XLA's fused
two-pass unpack (int4_linear) remains the production int4 route: int4
is a CAPACITY option (half the weight HBM) on v5e, not a speed win.
The kernel and its grouped-scale quantizer stay as the accuracy path
(AWQ-class grouping, test-covered) and for hardware with native
sub-byte support.

Packing matches serve.quantize_weights_int4: byte r of row-pair k holds
w[2k] in the low nibble, w[2k+1] in the high nibble, so
``x @ w == x[:, 0::2] @ lo + x[:, 1::2] @ hi`` — the caller passes the
de-interleaved activations (a (M, K) -> 2x(M, K/2) relayout of a few
tens of KB, amortized across the whole weight stream).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def _unpack(wp):
    """(tk2, tn) uint8 -> two (tk2, tn) bf16 nibble planes (signed)."""
    w = wp.astype(jnp.int32)
    lo = (w & 0xF) - ((w & 0x8) << 1)          # sign-extend low nibble
    hi = (w >> 4) - (w & 0x80) // 8            # sign-extend high nibble
    return lo.astype(jnp.bfloat16), hi.astype(jnp.bfloat16)


def _int4_kernel(xe_ref, xo_ref, wp_ref, s_ref, o_ref, acc_ref, *,
                 nk: int, groups_per_tile: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack(wp_ref[:])
    if groups_per_tile > 0:
        # grouped scales: s_ref is (groups_per_tile, tn); each group
        # covers tk2 // groups_per_tile packed rows.  Scale the unpacked
        # planes in-register (scales vary along the contraction).
        tk2, tn = lo.shape
        rows = tk2 // groups_per_tile
        s = s_ref[:].astype(jnp.bfloat16)                # (g, tn)
        s = jnp.repeat(s, rows, axis=0)                  # (tk2, tn)
        lo = lo * s
        hi = hi * s
    acc_ref[:] += jax.lax.dot_general(
        xe_ref[:], lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xo_ref[:], hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        if groups_per_tile > 0:
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)
        else:
            o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group_size", "tm", "tn", "tk2", "out_dtype",
                     "interpret"))
def _int4_matmul(xe, xo, wp, scales, group_size, tm, tn, tk2, out_dtype,
                 interpret):
    m, k2 = xe.shape
    k2w, n = wp.shape
    assert k2 == k2w, (xe.shape, wp.shape)
    mp, kp, np_ = _round_up(m, tm), _round_up(k2, tk2), _round_up(n, tn)
    xe = jnp.pad(xe.astype(jnp.bfloat16), ((0, mp - m), (0, kp - k2)))
    xo = jnp.pad(xo.astype(jnp.bfloat16), ((0, mp - m), (0, kp - k2)))
    wp = jnp.pad(wp, ((0, kp - k2), (0, np_ - n)))

    grid = (mp // tm, np_ // tn, kp // tk2)
    if group_size:
        g2 = group_size // 2                      # packed rows per group
        assert tk2 % g2 == 0, (tk2, group_size)
        groups_per_tile = tk2 // g2
        # Mosaic block shapes need >=8 sublane rows (or the full dim):
        # raise tk2 (default 512 gives 8 groups at group_size=128) or
        # lower group_size so each k-tile spans >=8 scale rows.
        if not interpret:
            assert (groups_per_tile >= 8
                    or groups_per_tile == kp // g2), (
                f"groups_per_tile={groups_per_tile} < 8: raise tk2 or "
                f"lower group_size")
        scales = jnp.pad(scales, ((0, kp // g2 - scales.shape[0]),
                                  (0, np_ - n)), constant_values=1.0)
        s_spec = pl.BlockSpec((groups_per_tile, tn),
                              lambda i, j, kk: (kk, j),
                              memory_space=pltpu.VMEM)
    else:
        groups_per_tile = 0
        scales = jnp.pad(scales.reshape(1, -1), ((0, 0), (0, np_ - n)),
                         constant_values=1.0)
        s_spec = pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_int4_kernel, nk=grid[2],
                          groups_per_tile=groups_per_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk2), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk2), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk2, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * mp * np_ * kp,
            bytes_accessed=2 * mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, wp, scales)
    return out[:m, :n]


def int4_matmul(
    x: jax.Array,
    wp: jax.Array,
    scales: jax.Array,
    group_size: Optional[int] = None,
    out_dtype=jnp.bfloat16,
    tm: int = 64,
    tn: int = 256,
    tk2: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x @ dequant_int4(wp)`` reading the packed buffer once.

    ``x``      (..., K) bf16/f32 activations.
    ``wp``     (K/2, N) uint8 nibble-packed weights
               (serve.quantize_weights_int4 layout).
    ``scales`` per-channel (N,) — applied in the epilogue — or grouped
               (K/group_size, N) with ``group_size`` set (AWQ-class),
               applied to the unpacked tile in-register.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    xe, xo = x2[:, 0::2], x2[:, 1::2]
    m = xe.shape[0]
    tm = min(tm, _round_up(max(m, 16), 16))
    out = _int4_matmul(xe, xo, wp, scales, group_size or 0, tm, tn, tk2,
                       out_dtype, interpret)
    return out.reshape(*lead, wp.shape[1])


def quantize_weights_int4_grouped(w: jax.Array, group_size: int = 128
                                  ) -> tuple:
    """AWQ-class grouped int4 quantization: one scale per
    (K-group, output channel).  Returns (packed (K/2, N) uint8,
    scales (K/group_size, N) f32)."""
    k, n = w.shape
    assert k % group_size == 0 and group_size % 2 == 0
    wf = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    amax = jnp.max(jnp.abs(wf), axis=1)                    # (K/gs, N)
    s = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(wf / s[:, None]), -8, 7).astype(jnp.int32)
    q = q.reshape(k, n)
    packed = ((q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)).astype(jnp.uint8)
    return packed, s.astype(jnp.float32)
