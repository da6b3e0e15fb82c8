"""Single-entry fake-quantization with straight-through autodiff.

TPU-native replacement for the reference's quantize_tensor + FPEmuOp stack
(qutils.py:264-345; pytquant/cpp/fpemu.py:43-71): one jit-compatible
function that computes scales (per the config's granularity) and casts in
the same fused computation — no per-channel kernel-launch loops, no
device dispatch, no in-place mutation.

Autodiff follows the reference contract: the cast is a straight-through
estimator (FPEmuOp.backward passes gradients unchanged); gradient-stream
quantization is applied explicitly by the training wrappers per the
igrad/ograd/wtgrad role configs (qutils.py:159-189, 551-584).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from fp8tpu.numerics import cast as _cast
from fp8tpu.numerics import integer as _integer
from fp8tpu.numerics import scaling as _scaling
from fp8tpu.numerics.formats import FORMATS
from .config import TensorQuantConfig


_HW_DTYPES = {"e4m3": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2,
              "bfloat16": jnp.bfloat16, "float16": jnp.float16}


def _hw_eligible(cfg: TensorQuantConfig) -> bool:
    return (cfg.cast_impl == "hw" and cfg.dtype in _HW_DTYPES
            and cfg.scheme in ("rne", "stochastic")
            and cfg.scaling != "per-block")


def _sr_hw(x: jax.Array, cfg: TensorQuantConfig, scale,
           key: jax.Array) -> jax.Array:
    """f32-domain stochastic rounding onto the target float grid.

    Normal range (|x| >= 2^emin): classic add-random-bits-below-the-cut-
    then-truncate on the f32 bit pattern (cut = 23 - m bits, always
    within the mantissa field).  Subnormal range: the target grid is
    FIXED-point (k * 2^(emin-m)), so the bit trick would reach into the
    exponent field; instead floor(|x|/g + u) * g with u ~ U[0,1) — exact
    unbiased SR on the subnormal grid, valid down to zero (no flush).
    ~25 HLO ops vs ~100 for the via-fp16 reference pipeline; the random
    stream differs from the reference's (16 uniform bits vs its 8
    f16-domain GRS bits) — both unbiased.

    bf16/f16 note: inputs below the f32 normal range are flushed to zero
    by XLA's DAZ+FTZ f32 arithmetic on both CPU and TPU backends (same as
    real bf16 hardware); the guarantee here is no NaN and no saturation
    for such inputs (ADVICE r1 regression).
    """
    from fp8tpu.numerics.cast import sr_bits

    fmt = FORMATS[cfg.dtype]
    m = fmt.mant_bits
    emin = 1 - fmt.bias
    xs0 = x.astype(jnp.float32) * scale
    xs = jnp.clip(xs0, -fmt.max_normal, fmt.max_normal)

    u = jax.lax.bitcast_convert_type(xs, jnp.uint32)
    sign = u & jnp.uint32(0x80000000)
    mag = u & jnp.uint32(0x7FFFFFFF)
    e = (mag >> 23).astype(jnp.int32) - 127
    rb = sr_bits(key, x.shape).astype(jnp.uint32)

    # -- normal-range branch: bit add-truncate, cut is a static int ----
    cut = 23 - m
    if cut >= 16:
        radd = rb << (cut - 16)
    else:
        radd = rb >> (16 - cut)
    mask = jnp.uint32(0xFFFFFFFF) << cut
    mag_bits = (mag + radd) & mask
    y_norm = jax.lax.bitcast_convert_type(mag_bits, jnp.float32)

    # -- subnormal-range branch: fixed grid g = 2^(emin - m) -----------
    shift = m - emin                      # static python int
    absx = jax.lax.bitcast_convert_type(mag, jnp.float32)
    u01 = rb.astype(jnp.float32) * jnp.float32(2.0 ** -16)
    if shift > 126:
        # bfloat16: 2^(m-emin) = 2^133 overflows f32 to inf (0*inf = NaN,
        # ADVICE r1 — XLA refolds even a split constant product back into
        # one inf constant), and the whole branch domain |x| < 2^-126 is
        # f32-subnormal, which XLA's DAZ+FTZ f32 arithmetic flushes on CPU
        # and TPU alike.  The grid values themselves are f32-subnormal, so
        # the defined result under flush semantics is exactly zero.
        y_sub = jnp.zeros_like(absx)
    else:
        g = jnp.float32(2.0 ** (emin - m))
        inv_g = jnp.float32(2.0 ** shift)
        y_sub = jnp.floor(absx * inv_g + u01) * g

    y = jnp.where(e >= emin, y_norm, y_sub)
    out = jax.lax.bitcast_convert_type(
        sign | jax.lax.bitcast_convert_type(y, jnp.uint32), jnp.float32)
    # SR may round up past the format max: saturate; keep NaN as NaN and,
    # for formats with an inf encoding (e5m2/bf16/f16), pass ±inf through
    # instead of saturating (mirrors _qdq_hw's overflow semantics).
    out = jnp.clip(out, -fmt.max_normal, fmt.max_normal)
    out = jnp.where(jnp.isnan(xs0), xs0, out)
    if fmt.has_inf:
        out = jnp.where(jnp.isinf(xs0), xs0, out)
    return (out / scale).astype(jnp.float32)


def _qdq_hw(x: jax.Array, cfg: TensorQuantConfig, scale) -> jax.Array:
    """Spec-exact single-rounding cast through the hardware dtype (OCP
    fp8 / IEEE semantics; deviates from the reference's denormal-range
    quirks — see TensorQuantConfig.cast_impl)."""
    dt = _HW_DTYPES[cfg.dtype]
    xf = x.astype(jnp.float32) * scale
    fmt = FORMATS[cfg.dtype]
    if not fmt.has_inf:          # e4m3: saturate instead of NaN overflow
        xf = jnp.clip(xf, -fmt.max_normal, fmt.max_normal)
    return (xf.astype(dt).astype(jnp.float32) / scale).astype(jnp.float32)


def _quantize_impl(x: jax.Array, cfg: TensorQuantConfig,
                   key: Optional[jax.Array]) -> jax.Array:
    if cfg.is_int:
        return _integer.qdq_int(x, bits=cfg.bits)

    if _hw_eligible(cfg):
        fmt = FORMATS[cfg.dtype]
        if cfg.scaling == "none":
            hw_scale = 1.0
        elif cfg.scaling == "per-tensor":
            hw_scale = _scaling.per_tensor(x, fmt, cfg.method)
        elif cfg.scaling == "per-channel":
            hw_scale = _scaling.per_channel(x, fmt, cfg.method,
                                            cfg.channel_axis)
        elif cfg.scaling == "fine-grained":
            hw_scale = _scaling.fine_grained(x, fmt, cfg.group_size,
                                             cfg.method)
        else:  # pragma: no cover
            hw_scale = None
        if hw_scale is not None:
            if cfg.scheme == "stochastic":
                if key is None:
                    raise ValueError(
                        f"{cfg.mode_string()} needs a PRNG key")
                return _sr_hw(x, cfg, hw_scale, key)
            return _qdq_hw(x, cfg, hw_scale)

    fmt = FORMATS[cfg.dtype]
    mode = cfg.round_mode
    kw = dict(daz=cfg.daz)
    if cfg.is_stochastic:
        if key is None:
            raise ValueError(
                f"{cfg.mode_string()} needs a PRNG key for stochastic "
                "rounding"
            )
        kw["key"] = key

    if cfg.scaling == "none":
        return _cast.qdq(x, fmt, mode, 1.0, **kw)
    if cfg.scaling == "per-tensor":
        scale = _scaling.per_tensor(x, fmt, cfg.method)
        return _cast.qdq(x, fmt, mode, scale, **kw)
    if cfg.scaling == "per-channel":
        scale = _scaling.per_channel(x, fmt, cfg.method, cfg.channel_axis)
        return _cast.qdq(x, fmt, mode, scale, **kw)
    if cfg.scaling == "fine-grained":
        scale = _scaling.fine_grained(x, fmt, cfg.group_size, cfg.method)
        return _cast.qdq(x, fmt, mode, scale, **kw)
    if cfg.scaling == "per-block":
        return _cast.qdq_blocked(x, fmt, mode, cfg.block_size, **kw)
    raise ValueError(f"unknown scaling {cfg.scaling!r}")


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quant(x: jax.Array, cfg: TensorQuantConfig,
               key: Optional[jax.Array] = None) -> jax.Array:
    """Fake-quantize ``x`` per ``cfg``; gradient is straight-through."""
    return _quantize_impl(x, cfg, key)


def _fq_fwd(x, cfg, key):
    return _quantize_impl(x, cfg, key), None


def _fq_bwd(cfg, _res, g):
    return (g, None)


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def fake_quant_with_scale(x: jax.Array, cfg: TensorQuantConfig, scale,
                          key: Optional[jax.Array] = None) -> jax.Array:
    """Fake-quantize with an externally calibrated scale (inference path:
    scales come from the stats sweep, not from the live tensor).
    Straight-through gradient."""
    return _fixed_scale_ste(x, cfg, scale, key)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fixed_scale_ste(x, cfg, scale, key):
    if cfg.is_int:
        # scale here is (scale, zero_point) from calibration.
        s, zp = scale
        return _integer.qdq_int_with_qparams(x, s, zp, bits=cfg.bits)
    kw = dict(daz=cfg.daz)
    if cfg.is_stochastic:
        kw["key"] = key
    return _cast.qdq(x, FORMATS[cfg.dtype], cfg.round_mode, scale, **kw)


def _fs_fwd(x, cfg, scale, key):
    return _fixed_scale_ste(x, cfg, scale, key), None


def _fs_bwd(cfg, _res, g):
    return (g, None, None)


_fixed_scale_ste.defvjp(_fs_fwd, _fs_bwd)


def quantize_grad(g: jax.Array, cfg: Optional[TensorQuantConfig],
                  key: Optional[jax.Array] = None) -> jax.Array:
    """Quantize a gradient stream (igrad/ograd/wtgrad hook bodies,
    qutils.py:551-584, 159-189).  No-op when cfg is None."""
    if cfg is None:
        return g
    return _quantize_impl(g, cfg, key)


def fake_quant_sparse(x, cfg: TensorQuantConfig,
                      key: Optional[jax.Array] = None):
    """Fake-quantize a sparse array by casting its stored values only.

    The reference's FPEmuOp special-cases torch sparse COO tensors by
    quantizing ``tensor._values()`` and rebuilding the sparse tensor
    (pytquant/cpp/fpemu.py:46-58).  The JAX analog: a BCOO/BCSR array's
    ``data`` leaf is cast (per-tensor/none scaling — data carries no
    channel structure) and the indices pass through untouched.  Dense
    arrays fall through to :func:`fake_quant`.
    """
    from jax.experimental import sparse as jsparse

    if isinstance(x, jsparse.JAXSparse):
        if cfg.scaling not in ("none", "per-tensor"):
            raise ValueError(
                f"sparse fake-quant supports none/per-tensor scaling, "
                f"got {cfg.scaling!r} (matching the reference, which "
                "applies one scale to the COO values)")
        qdata = fake_quant(x.data, cfg, key)
        children, aux = x.tree_flatten()
        return type(x).tree_unflatten(aux, (qdata,) + tuple(children[1:]))
    return fake_quant(x, cfg, key)
