"""Mixture-of-Experts FFN with expert parallelism (GShard/Switch style).

The reference has no MoE or expert parallelism (SURVEY.md §2.3); this is
north-star scale-out surface, built the TPU way: capacity-bounded top-k
routing expressed as dense one-hot dispatch/combine einsums, so GSPMD
inserts the expert all-to-alls from sharding constraints alone — no
host-side routing, no dynamic shapes, everything jits.

Expert weights are fp8 (or int8) payloads + per-(expert, output-channel)
scales, exactly like the serving artifact (kernels/qmatmul.
quantize_weights vmapped over the expert axis); payloads shard over the
expert mesh axis, scales shard with them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fp8tpu.kernels.qmatmul import quantize_weights


def quantize_expert_weights(w: jax.Array, fmt: str = "e4m3"):
    """(E, K, N) expert stack → (payload (E, K, N), scales (E, 1, N))."""
    return jax.vmap(lambda we: quantize_weights(we, fmt))(w)


def _dequant(w8, s, dtype):
    return (w8.astype(jnp.float32) * s).astype(dtype)


def top_k_routing(
    logits: jax.Array, top_k: int, capacity: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Capacity-bounded top-k routing (GShard-style, jit-static shapes).

    logits (T, E) → dispatch (T, E, C) {0,1}, combine (T, E, C) f32
    (router probabilities at the dispatched slots), aux load-balancing
    loss (Switch: E · Σ_e fraction_e · mean-prob_e, ≈1 when balanced).
    Tokens overflowing an expert's capacity C are dropped (standard
    GShard semantics; raise ``capacity`` to avoid drops).
    """
    T, E = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    dispatch = jnp.zeros((T, E, capacity), jnp.float32)
    combine = jnp.zeros((T, E, capacity), jnp.float32)
    masked = probs
    # aux loss uses the top-1 assignment fractions (Switch eq. 4-6)
    top1 = jnp.argmax(probs, axis=-1)
    frac = jnp.mean(jax.nn.one_hot(top1, E, dtype=jnp.float32), axis=0)
    aux = E * jnp.sum(frac * jnp.mean(probs, axis=0))

    fill = jnp.zeros((E,), jnp.int32)  # used slots per expert so far
    for _ in range(top_k):
        choice = jnp.argmax(masked, axis=-1)                 # (T,)
        onehot = jax.nn.one_hot(choice, E, dtype=jnp.int32)  # (T, E)
        # position of each token within its chosen expert's queue
        pos = (jnp.cumsum(onehot, axis=0) - 1) + fill[None, :]
        pos_t = jnp.sum(pos * onehot, axis=-1)               # (T,)
        keep = pos_t < capacity
        slot = jax.nn.one_hot(pos_t, capacity, dtype=jnp.float32)
        d = (onehot.astype(jnp.float32) * keep[:, None])[..., None] \
            * slot[:, None, :]
        gate = jnp.take_along_axis(probs, choice[:, None], axis=1)
        dispatch = dispatch + d
        combine = combine + d * gate[..., None]
        fill = fill + jnp.sum(
            onehot * keep[:, None].astype(jnp.int32), axis=0)
        masked = masked * (1.0 - onehot.astype(jnp.float32))
    return dispatch, combine, aux


def moe_ffn(
    x: jax.Array,
    gate_kernel: jax.Array,
    up8: jax.Array, up_s: jax.Array,
    down8: jax.Array, down_s: jax.Array,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    mesh: Optional[Mesh] = None,
    axis: str = "model",
) -> Tuple[jax.Array, jax.Array]:
    """Quantized MoE FFN: route → per-expert fp8 up/gelu/down → combine.

    x (T, D); gate_kernel (D, E); up8/up_s, down8/down_s from
    :func:`quantize_expert_weights` ((E, D, F) and (E, F, D) stacks).
    With ``mesh``, expert-dim tensors carry sharding constraints over
    ``axis`` and GSPMD inserts the dispatch/return all-to-alls.
    Returns (y (T, D), aux_loss).
    """
    T, D = x.shape
    E = gate_kernel.shape[1]
    capacity = max(int(capacity_factor * top_k * T / E), top_k)

    logits = x.astype(jnp.float32) @ gate_kernel.astype(jnp.float32)
    dispatch, combine, aux = top_k_routing(logits, top_k, capacity)

    def ep(t):  # expert-parallel constraint on (E, C, ...) tensors
        if mesh is None:
            return t
        return jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, P(axis, *([None] * (t.ndim - 1)))))

    xe = ep(jnp.einsum("tec,td->ecd", dispatch, x.astype(jnp.float32)))
    h = jnp.einsum("ecd,edf->ecf", xe, _dequant(up8, up_s, jnp.float32))
    h = ep(jax.nn.gelu(h))
    ye = ep(jnp.einsum(
        "ecf,efd->ecd", h, _dequant(down8, down_s, jnp.float32)))
    y = jnp.einsum("ecd,tec->td", ye, combine)
    return y.astype(x.dtype), aux
