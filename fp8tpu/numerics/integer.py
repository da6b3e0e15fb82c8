"""INT8/INT4 affine min-max fake-quantization.

Equivalent of the reference's Python integer path (qutils.py:216-247):
asymmetric per-tensor affine quantization with zero-point, round-clamp-
dequantize.  Jit-compatible; also provides the symmetric per-channel
variant used by calibrated inference qconfigs
(stats_collector.py:12-93 TensorFullIntQuantParams semantics).
"""

from __future__ import annotations

import jax.numpy as jnp


def qdq_int(x: jnp.ndarray, bits: int = 8) -> jnp.ndarray:
    """Asymmetric min-max fake-quant, per tensor (qutils.py:216-247)."""
    xf = x.astype(jnp.float32)
    min_val = jnp.min(xf)
    max_val = jnp.max(xf)
    q_min = -(2 ** (bits - 1))
    q_max = 2 ** (bits - 1) - 1
    scale = (max_val - min_val) / (q_max - q_min)
    # Guard the degenerate constant-tensor case (reference divides by 0).
    scale = jnp.where(scale > 0, scale, 1.0)
    zero_point = q_min - (min_val / scale)
    q = jnp.round(xf / scale + zero_point)
    q = jnp.clip(q, q_min, q_max)
    return (scale * (q - zero_point)).astype(jnp.float32)


def qdq_int_with_qparams(x: jnp.ndarray, scale, zero_point,
                         bits: int = 8) -> jnp.ndarray:
    """Fake-quant with precomputed qparams (calibrated inference path)."""
    q_min = -(2 ** (bits - 1))
    q_max = 2 ** (bits - 1) - 1
    q = jnp.round(x.astype(jnp.float32) / scale + zero_point)
    q = jnp.clip(q, q_min, q_max)
    return (scale * (q - zero_point)).astype(jnp.float32)


def int_qparams(min_val, max_val, bits: int = 8, symmetric: bool = False):
    """Compute (scale, zero_point) from observed min/max — the observer →
    qparams step (stats_collector.py:56-93, adapted from PyTorch)."""
    q_min = -(2 ** (bits - 1))
    q_max = 2 ** (bits - 1) - 1
    min_val = jnp.minimum(min_val, 0.0)
    max_val = jnp.maximum(max_val, 0.0)
    if symmetric:
        amax = jnp.maximum(jnp.abs(min_val), jnp.abs(max_val))
        scale = amax / ((q_max - q_min) / 2)
        scale = jnp.where(scale > 0, scale, 1.0)
        zero_point = jnp.zeros_like(scale)
    else:
        scale = (max_val - min_val) / (q_max - q_min)
        scale = jnp.where(scale > 0, scale, 1.0)
        zero_point = q_min - jnp.round(min_val / scale)
        zero_point = jnp.clip(zero_point, q_min, q_max)
    return scale, zero_point
