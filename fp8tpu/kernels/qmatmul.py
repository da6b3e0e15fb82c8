"""Fused quantized matmul kernels — the MXU hot path.

Two families, replacing the reference's quantize→op→dequantize sandwich
around framework ops (qutils.py:478-616) and its C-model GEMM engine
(cmodel/simple_gemm_impl.cpp — the MXU *is* the 16×16×64 systolic tile,
scaled up to 128×128):

1. ``dequant_matmul`` — the serving path.  Weights live in HBM as real
   FP8 payloads (half the bytes of bf16 — decode throughput on a
   bandwidth-bound TPU decode step scales accordingly); tiles are DMA'd
   to VMEM, upcast to bf16 in-register, multiplied on the MXU with fp32
   accumulation, and scaled per output channel in the epilogue.  No
   dequantized copy of the weights ever exists in HBM.

2. ``qdq_matmul`` — the emulation-parity path (PTQ / QAT / FP8 training).
   Both operands are fake-quantized *in-register* with the shared bit
   pipeline (numerics/cast.py `cast_array`) as tiles stream through VMEM,
   then contracted at float32 precision, matching the reference semantics
   (cast in fp8 grid, compute in fp32) with zero extra HBM round trips.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fp8tpu.numerics.cast import cast_array
from fp8tpu.numerics.formats import FORMATS, RoundMode

_FP8_DTYPES = {
    "e4m3": jnp.float8_e4m3fn,
    "e5m2": jnp.float8_e5m2,
}


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Weight quantization (producer of serving artifacts)
# ---------------------------------------------------------------------------

def quantize_weights(
    w: jax.Array, fmt: str = "e4m3", axis: int = -1
) -> tuple[jax.Array, jax.Array]:
    """Quantize a weight matrix to real FP8 (or int8) storage.

    Returns ``(payload, scales)`` with ``payload`` in the hardware dtype
    and float32 ``scales`` per slice of ``axis`` (the output-channel
    axis), such that ``w ≈ payload.astype(f32) * scales``.

    This is the *production* quantizer (clamp + IEEE RNE convert), not the
    emulation-parity cast: serving wants spec-exact grid values so the
    payload round-trips the hardware dtype losslessly.
    """
    wf = w.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis % w.ndim)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axes, keepdims=True)
    if fmt == "int8":
        scales = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(wf / scales), -127, 127)
        return q.astype(jnp.int8), scales.astype(jnp.float32)
    if fmt not in _FP8_DTYPES:
        raise ValueError(f"no hardware dtype for {fmt!r}; serve with e4m3, "
                         "e5m2 or int8 (e3m4/fp4 use the emulation path)")
    fdesc = FORMATS[fmt]
    scales = jnp.where(amax > 0, amax / fdesc.max_normal, 1.0)
    q = jnp.clip(wf / scales, -fdesc.max_normal, fdesc.max_normal)
    payload = q.astype(_FP8_DTYPES[fmt])
    return payload, scales.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Serving: dequantize-in-register matmul
# ---------------------------------------------------------------------------

def _dequant_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wt = w_ref[:].astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:], wt, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "tk", "out_dtype", "interpret")
)
def _dequant_matmul(x, w8, scales, tm, tn, tk, out_dtype, interpret):
    m, k = x.shape
    k2, n = w8.shape
    assert k == k2, (x.shape, w8.shape)
    mp, kp, np_ = _round_up(m, tm), _round_up(k, tk), _round_up(n, tn)
    x = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, kp - k)))
    w8 = jnp.pad(w8, ((0, kp - k), (0, np_ - n)))
    scales = jnp.pad(scales.reshape(1, -1), ((0, 0), (0, np_ - n)))

    grid = (mp // tm, np_ // tn, kp // tk)
    out = pl.pallas_call(
        functools.partial(_dequant_matmul_kernel, nk=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w8, scales)
    return out[:m, :n]


def dequant_matmul(
    x: jax.Array,
    w8: jax.Array,
    scales: jax.Array,
    out_dtype=jnp.bfloat16,
    tm: int = 128,
    tn: int = 256,
    tk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """``x @ dequant(w8)`` with the dequant fused into the MXU epilogue.

    ``x``      (M, K) bf16/f32 activations.
    ``w8``     (K, N) fp8 payload (from :func:`quantize_weights`).
    ``scales`` per-output-channel dequant scales, broadcastable to (1, N).
    """
    m = x.shape[0]
    tm = min(tm, _round_up(max(m, 16), 16))
    return _dequant_matmul(x, w8, scales.reshape(1, -1),
                           tm, tn, tk, out_dtype, interpret)


# ---------------------------------------------------------------------------
# Emulation-parity: fused fake-quant matmul
# ---------------------------------------------------------------------------

# Formats whose native convert Mosaic can legalize on v5e (float16 cannot:
# no f32↔f16 converts in Mosaic — numerics/cast.py f32_to_f16_bits).
_HW_KERNEL_FMTS = ("e4m3", "e5m2", "bfloat16")


def _hw_xla_ok(fmt_x, fmt_w) -> bool:
    """The impl="hw" production route runs OUTSIDE Pallas when both
    operands quantize to a mant_bits<=7 format: their SCALED grid values
    are exactly representable in bf16, so the whole computation is a
    full-rate bf16 MXU dot with the casts fused by XLA into the operand
    reads and the 1/(sx*sw) descale in the epilogue.  (The fused Pallas
    formulation was measured SLOWER here: with a (i,j,k) matmul grid
    each x tile is re-cast once per j and each w tile once per i — ~16x
    redundant cast work at 4096³ — while XLA casts each element once
    inside the dot fusion.  MFU 0.065 fused vs ~0.25 XLA, NOTES r3.)

    An unquantized operand has full f32 mantissas, so mixed cases keep
    the f32 HIGHEST contraction (in-kernel), and float16's grid does not
    fit bf16."""
    return (fmt_x is not None and fmt_w is not None
            and FORMATS[fmt_x].mant_bits <= 7
            and FORMATS[fmt_w].mant_bits <= 7)


def _qdq_matmul_kernel(seed_ref, x_ref, w_ref, sx_ref, sw_ref, o_ref,
                       acc_ref, *, nk, fmt_x, mode_x, fmt_w, mode_w,
                       impl):
    from fp8tpu.numerics.cast import hw_qdq, hw_sr

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if mode_x == RoundMode.STOCHASTIC or mode_w == RoundMode.STOCHASTIC:
        pltpu.prng_seed(
            seed_ref[0]
            + pl.program_id(0) * 1000003
            + pl.program_id(1) * 7919
            + k
        )

    def _q(v, fmt, mode, scale):
        if fmt is None:
            return v
        v = v.astype(jnp.float32)
        rb = None
        if mode == RoundMode.STOCHASTIC:
            rb = pltpu.bitcast(
                pltpu.prng_random_bits(v.shape), jnp.uint32
            ).astype(jnp.uint16)
        if impl == "hw" and fmt in _HW_KERNEL_FMTS:
            if mode == RoundMode.STOCHASTIC:
                return hw_sr(v, fmt, scale, rb)
            return hw_qdq(v, fmt, scale)
        return cast_array(v, scale, rb, fmt, mode)

    xq = _q(x_ref[:], fmt_x, mode_x, sx_ref[0])
    # Weight scale is per output channel: broadcast (1, tn) over (tk, tn).
    wq = _q(w_ref[:], fmt_w, mode_w, sw_ref[:])
    acc_ref[:] += jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("fmt_x", "mode_x", "fmt_w", "mode_w", "tm", "tn", "tk",
                     "out_dtype", "interpret", "impl"),
)
def _qdq_matmul(x, w, sx, sw, seed, fmt_x, mode_x, fmt_w, mode_w,
                tm, tn, tk, out_dtype, interpret, impl="bitexact"):
    m, k = x.shape
    k2, n = w.shape
    assert k == k2
    mp, kp, np_ = _round_up(m, tm), _round_up(k, tk), _round_up(n, tn)
    x = jnp.pad(x.astype(jnp.float32), ((0, mp - m), (0, kp - k)))
    w = jnp.pad(w.astype(jnp.float32), ((0, kp - k), (0, np_ - n)))
    sw = jnp.pad(sw.reshape(1, -1), ((0, 0), (0, np_ - n)),
                 constant_values=1.0)

    grid = (mp // tm, np_ // tn, kp // tk)
    out = pl.pallas_call(
        functools.partial(_qdq_matmul_kernel, nk=grid[2], fmt_x=fmt_x,
                          mode_x=mode_x, fmt_w=fmt_w, mode_w=mode_w,
                          impl=impl),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # x scale (scalar)
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),  # w per-channel scales
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seed, x, w, sx, sw)
    return out[:m, :n]


def qdq_matmul(
    x: jax.Array,
    w: jax.Array,
    fmt_x: Optional[str] = "e4m3",
    mode_x: RoundMode = RoundMode.RNE,
    fmt_w: Optional[str] = "e4m3",
    mode_w: RoundMode = RoundMode.RNE,
    scale_x=1.0,
    scale_w=1.0,
    seed: int | jax.Array = 0,
    out_dtype=jnp.float32,
    tm: int = 256,
    tn: int = 256,
    tk: int = 512,
    interpret: bool = False,
    impl: str = "bitexact",
) -> jax.Array:
    """Fused fake-quant matmul: ``qdq(x) @ qdq(w)`` with both casts done
    in-register per tile.  Scales are whole-tensor quantities passed in
    (``scale_w`` may be per-output-channel, shape (N,)), so tiling does
    not change results.

    ``impl``: "bitexact" runs the reference-parity bit pipeline per tile;
    "hw" uses the native convert (clip + f32→fp8 round trip for RNE, the
    f32-domain bit trick for SR — quant.fakequant's cast_impl="hw"
    semantics) where a hardware dtype exists, falling back to the bit
    pipeline per operand otherwise.  When BOTH operands quantize to a
    mant<=7 format the contraction runs as a full-rate bf16 MXU dot over
    the exactly-representable scaled grid values, with the 1/(sx*sw)
    descale in the epilogue — this is what moves the kernel from f32
    (multi-pass) MXU throughput to bf16 throughput.

    ``fmt_x``/``fmt_w`` of None skips quantization of that operand.
    """
    m = x.shape[0]
    tm = min(tm, _round_up(max(m, 16), 16))
    sx = jnp.atleast_1d(jnp.asarray(scale_x, jnp.float32))
    sw = jnp.asarray(scale_w, jnp.float32) * jnp.ones((w.shape[1],),
                                                      jnp.float32)
    seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if impl == "hw" and _hw_xla_ok(fmt_x, fmt_w):
        # Production engine route: XLA fuses the casts into the bf16 dot
        # operand reads (each element cast exactly once) — see
        # _hw_xla_ok.  Backend-independent (no Pallas), so interpret mode
        # takes the same path.
        return _qdq_matmul_hw_xla(x, w, sx, sw, seed_arr, fmt_x, mode_x,
                                  fmt_w, mode_w, out_dtype)
    stochastic = RoundMode.STOCHASTIC in (mode_x, mode_w)
    if interpret and stochastic:
        # Interpret mode (CPU CI) lacks the TPU PRNG primitives; run the
        # semantically equivalent whole-operand jnp path (same grid, same
        # f32 accumulate; the SR random stream differs from the on-chip
        # per-tile stream — both unbiased).
        return _qdq_matmul_jnp(x, w, sx, sw, seed_arr, fmt_x, mode_x,
                               fmt_w, mode_w, out_dtype, impl)
    return _qdq_matmul(x, w, sx, sw, seed_arr, fmt_x, mode_x, fmt_w, mode_w,
                       tm, tn, tk, out_dtype, interpret, impl)


@functools.partial(
    jax.jit, static_argnames=("fmt_x", "mode_x", "fmt_w", "mode_w",
                              "out_dtype"))
def _qdq_matmul_hw_xla(x, w, sx, sw, seed, fmt_x, mode_x, fmt_w, mode_w,
                       out_dtype):
    """impl="hw" fast route: cast each operand ONCE onto its scaled grid
    (exact in bf16 for mant<=7 formats), contract at full bf16 MXU rate
    with f32 accumulation, descale in the epilogue.  The casts fuse into
    the dot's operand reads (XLA), so no quantized copy hits HBM."""
    from fp8tpu.numerics.cast import hw_qdq, hw_sr, sr_bits

    key = jax.random.fold_in(jax.random.key(0), seed[0])

    def _g(v, fmt, mode, scale, tag):
        v = v.astype(jnp.float32)
        rb = None
        if mode == RoundMode.STOCHASTIC:
            rb = sr_bits(jax.random.fold_in(key, tag), v.shape)
        if fmt in _HW_KERNEL_FMTS:
            if mode == RoundMode.STOCHASTIC:
                g = hw_sr(v, fmt, scale, rb, descale=False)
            else:
                g = hw_qdq(v, fmt, scale, descale=False)
        else:
            # e3m4/fp4: no hardware dtype — bit pipeline, then rescale
            # back onto the grid (the bf16 cast snaps the O(2^-23)
            # descale/rescale noise onto the exact grid value).
            g = cast_array(v, scale, rb, fmt, mode) * scale
        return g.astype(jnp.bfloat16)

    xg = _g(x, fmt_x, mode_x, sx[0], 1)
    wg = _g(w, fmt_w, mode_w, sw.reshape(1, -1), 2)
    out = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (out / (sx[0] * sw.reshape(1, -1))).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("fmt_x", "mode_x", "fmt_w", "mode_w",
                              "out_dtype", "impl"))
def _qdq_matmul_jnp(x, w, sx, sw, seed, fmt_x, mode_x, fmt_w, mode_w,
                    out_dtype, impl="bitexact"):
    from fp8tpu.numerics.cast import hw_qdq, hw_sr, sr_bits

    key = jax.random.fold_in(jax.random.key(0), seed[0])

    def _q(v, fmt, mode, scale, tag):
        if fmt is None:
            return v.astype(jnp.float32)
        rb = None
        if mode == RoundMode.STOCHASTIC:
            rb = sr_bits(jax.random.fold_in(key, tag), v.shape)
        if impl == "hw" and fmt in _HW_KERNEL_FMTS:
            if mode == RoundMode.STOCHASTIC:
                return hw_sr(v.astype(jnp.float32), fmt, scale, rb)
            return hw_qdq(v.astype(jnp.float32), fmt, scale)
        return cast_array(v.astype(jnp.float32), scale, rb, fmt, mode)

    xq = _q(x, fmt_x, mode_x, sx[0], 1)
    wq = _q(w, fmt_w, mode_w, sw.reshape(1, -1), 2)
    return jnp.dot(xq, wq, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(out_dtype)
