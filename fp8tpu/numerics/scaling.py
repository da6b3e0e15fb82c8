"""Scale computation for fake-quantization.

Replicates the reference's scaling mini-grammar (qutils.py:264-345):

  per-tensor  "max":  scale = flt_max / max|x|, clamped to 6.55e4 when the
                      raw scale exceeds 3.275e4 (covers max|x| == 0 too).
  per-tensor  "mean": scale = flt_min / mean|x| (mean floored to flt_min
                      when ≤ 1e-5), clamped to ≥ 1.
  per-channel:        same formulas per leading-axis slice (the reference
                      launches one kernel per channel, qutils.py:289-311;
                      here it is one reduction + one broadcast cast).
  fine-grained:       per (out-channel × input-channel-group) scales
                      (qutils.py:313-337).
  per-block:          power-of-two block scales (cast.block_scales).

Deviation: the reference's per-channel/fine-grained "mean" actually calls
``torch.mode`` (qutils.py:297,323 — a known defect, SURVEY.md §7.4); we
implement the documented mean semantics.

All functions are jit-compatible and return float32 scales broadcastable
against ``x``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .formats import FORMATS, FPFormat

# Reference clamps (qutils.py:280-287).
_SCALE_CLAMP_THRESHOLD = 3.275e4
_SCALE_CLAMP_VALUE = 6.55e4
_MEAN_EPS_TENSOR = 1e-5
_MEAN_EPS_CHANNEL = 1e-6


def _fmt(fmt) -> FPFormat:
    return FORMATS[fmt] if isinstance(fmt, str) else fmt


def _max_scale(vmax: jnp.ndarray, fmt: FPFormat) -> jnp.ndarray:
    scale = jnp.float32(fmt.max_normal) / vmax
    # Deviation from qutils.py:280-287: the reference replaces any raw
    # scale above 3.275e4 with 6.55e4 even when that OVERSHOOTS the raw
    # (range-exact) scale — for e5m2 and raw in (3.275e4, 6.55e4)
    # (max|x| in [0.875, 1.75)) the scaled max lands past 57344 and the
    # via-fp16 cast mints inf from finite values.  We keep the clamp's
    # intent (pull tiny tensors into fp16's normal range) but never
    # exceed the range-exact scale.
    return jnp.where(scale > _SCALE_CLAMP_THRESHOLD,
                     jnp.minimum(_SCALE_CLAMP_VALUE, scale), scale)


def _mean_scale(mean: jnp.ndarray, fmt: FPFormat, eps: float) -> jnp.ndarray:
    mean = jnp.where(mean > eps, mean, jnp.float32(fmt.min_subnormal))
    scale = jnp.float32(fmt.min_subnormal) / mean
    return jnp.maximum(scale, 1.0)


def per_tensor(x: jnp.ndarray, fmt, method: str = "max") -> jnp.ndarray:
    fmt = _fmt(fmt)
    ax = jnp.abs(x.astype(jnp.float32))
    if method == "max":
        return _max_scale(jnp.max(ax), fmt)
    if method == "mean":
        return _mean_scale(jnp.mean(ax), fmt, _MEAN_EPS_TENSOR)
    raise ValueError(f"unknown scaling method {method!r}")


def per_channel(x: jnp.ndarray, fmt, method: str = "max",
                axis: int = 0) -> jnp.ndarray:
    """One scale per slice of ``axis`` (default 0: out-channels of a
    KCRS/OI weight), shaped for broadcasting against ``x``."""
    fmt = _fmt(fmt)
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    ax = jnp.abs(x.astype(jnp.float32))
    if method == "max":
        scale = _max_scale(jnp.max(ax, axis=reduce_axes), fmt)
    elif method == "mean":
        scale = _mean_scale(jnp.mean(ax, axis=reduce_axes), fmt,
                            _MEAN_EPS_CHANNEL)
    else:
        raise ValueError(f"unknown scaling method {method!r}")
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    return scale.reshape(shape)


def fine_grained(x: jnp.ndarray, fmt, group_size: int,
                 method: str = "max") -> jnp.ndarray:
    """Per (out-channel, input-channel-group) scales for a weight of shape
    (K, C, ...).  ``C`` must divide by ``group_size`` (the reference's
    torch.chunk tolerates ragged groups; we require even groups so the
    computation stays a single reshape+reduce)."""
    fmt = _fmt(fmt)
    if x.ndim < 2:
        raise ValueError("fine-grained scaling needs ndim >= 2")
    k, c = x.shape[0], x.shape[1]
    if c % group_size != 0:
        raise ValueError(f"input channels {c} not divisible by group size "
                         f"{group_size}")
    g = c // group_size
    grouped = jnp.abs(
        x.astype(jnp.float32).reshape(k, g, group_size, -1)
    )
    if method == "max":
        scale = _max_scale(jnp.max(grouped, axis=(2, 3)), fmt)
    elif method == "mean":
        scale = _mean_scale(jnp.mean(grouped, axis=(2, 3)), fmt,
                            _MEAN_EPS_CHANNEL)
    else:
        raise ValueError(f"unknown scaling method {method!r}")
    # (K, G) → broadcast over group members and trailing dims.
    scale = jnp.repeat(scale, group_size, axis=1)
    return scale.reshape((k, c) + (1,) * (x.ndim - 2))
