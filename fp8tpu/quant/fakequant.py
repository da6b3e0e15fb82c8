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
    """f32-domain stochastic rounding onto the target float grid —
    counter-based bits + the shared :func:`fp8tpu.numerics.cast.hw_sr`
    core (also used in-register by the fused qdq_matmul kernel)."""
    from fp8tpu.numerics.cast import hw_sr, sr_bits
    return hw_sr(x, cfg.dtype, scale, sr_bits(key, x.shape))


def _qdq_hw(x: jax.Array, cfg: TensorQuantConfig, scale) -> jax.Array:
    """Spec-exact single-rounding cast through the hardware dtype (OCP
    fp8 / IEEE semantics; deviates from the reference's denormal-range
    quirks — see TensorQuantConfig.cast_impl)."""
    from fp8tpu.numerics.cast import hw_qdq
    return hw_qdq(x, cfg.dtype, scale).astype(jnp.float32)


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
    """Fake-quantize ``x`` per ``cfg``; gradient is straight-through.

    Output dtype == input dtype, matching the reference cast op (an
    in-place op on the caller's tensor, pytquant/cpp/fpemu.py:43-66):
    fp8-grid values are exactly representable in bf16/f32 alike, and a
    dtype-changing cast would leak f32 into bf16 graphs whose backward
    muls then fail (found by the gemm-only policy, whose surrounding
    streams stay bf16)."""
    return _quantize_impl(x, cfg, key).astype(x.dtype)


def _fq_fwd(x, cfg, key):
    return _quantize_impl(x, cfg, key).astype(x.dtype), None


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
        return _integer.qdq_int_with_qparams(
            x, s, zp, bits=cfg.bits).astype(x.dtype)
    kw = dict(daz=cfg.daz)
    if cfg.is_stochastic:
        kw["key"] = key
    return _cast.qdq(x, FORMATS[cfg.dtype], cfg.round_mode, scale,
                     **kw).astype(x.dtype)


def _fs_fwd(x, cfg, scale, key):
    return _fixed_scale_ste(x, cfg, scale, key).astype(x.dtype), None


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
