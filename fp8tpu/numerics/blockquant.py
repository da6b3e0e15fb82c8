"""Shared per-block absmax quantization (storage/wire payloads).

One helper for the per-block absmax → scale → clip → cast pattern used
by the gradient-compression collectives (parallel/grad_comm.py) and the
8-bit optimizer state (training/opt8.py) — the ``block_norm`` concept of
the reference cast kernels
(/root/reference/mpemu/pytquant/cpp/fpemu_impl.cpp:794-799) applied to
payloads that are STORED/transmitted quantized rather than fake-quantized
in place.  (The serving-side quantizers — kv_cache.quantize_kv,
model._quantize_act, qmatmul.quantize_weights — keep their own forms:
their scale conventions and axes are part of measured-perf code paths.)

Convention: ``scale = max(absmax, 1e-30) / grid_max`` — a zero block
dequantizes to exact zeros through a tiny positive scale (no where()
branch in the hot path).
"""

from __future__ import annotations

import jax.numpy as jnp

WIRE_DTYPES = {
    "e4m3": jnp.float8_e4m3fn,
    "e5m2": jnp.float8_e5m2,
    "bf16": jnp.bfloat16,
}
GRID_MAX = {"e4m3": 448.0, "e5m2": 57344.0, "int8": 127.0}


def quant_blocks(x, fmt: str):
    """Quantize ``x`` (..., block) against per-block absmax scales.

    Returns (payload, scales): payload in the target dtype, ``scales``
    f32 of shape ``x.shape[:-1]`` with ``x ≈ payload * scales[..., None]``.
    ``fmt`` ∈ {"int8", "e4m3", "e5m2", "bf16"}; bf16 is the identity
    payload with unit scales.
    """
    amax = jnp.max(jnp.abs(x), axis=-1)
    if fmt == "bf16":
        return x.astype(jnp.bfloat16), jnp.ones_like(amax)
    gmax = GRID_MAX[fmt]
    scale = jnp.maximum(amax, 1e-30) / gmax
    y = jnp.clip(x / scale[..., None], -gmax, gmax)
    if fmt == "int8":
        return jnp.round(y).astype(jnp.int8), scale
    return y.astype(WIRE_DTYPES[fmt]), scale


def dequant_blocks(q, scale):
    """Inverse of :func:`quant_blocks` (f32)."""
    return q.astype(jnp.float32) * scale[..., None]
