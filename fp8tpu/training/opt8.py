"""8-bit optimizer state: quantized Adam moments with per-block scales.

Large-scale FP8 training quantizes the *streams* (this package's MPT
pipeline) but the reference still carries full-precision optimizer
state — at 7B params, f32 Adam moments are 56 GB, twice the model.
This module stores the moments quantized (Dettmers et al., "8-bit
Optimizers via Block-wise Quantization", adapted to the toolkit's own
format machinery):

- **first moment m → int8** with per-block absmax scales: m is
  signed and roughly homogeneous within a block, so linear int8 (255
  levels) is the right grid;
- **second moment v → e4m3** with per-block absmax scales: v is
  non-negative with orders-of-magnitude spread WITHIN a block, and the
  fp8 exponent covers ~2^18 of relative dynamic range per block where
  linear int8 would flush small entries to zero (and a zero v explodes
  the next update through 1/(sqrt(v)+eps)).

All arithmetic is f32 — only the *carried state* is 8-bit; the
dequant→update→requant round-trip fuses into the jitted train step.
State bytes drop 4x vs f32 (plus 4/block scale overhead).  Per-block
scales are the cast kernels' ``block_norm`` analog
(/root/reference/mpemu/pytquant/cpp/fpemu_impl.cpp:794-799) applied to
optimizer state instead of activations.

``scale_by_adam_8bit`` is a drop-in optax transformation: chain it with
``optax.scale_by_learning_rate`` exactly like ``optax.scale_by_adam``,
and feed it to :func:`fp8tpu.training.make_train_step` unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from fp8tpu.numerics.blockquant import dequant_blocks, quant_blocks


def _quant_i8(x: jax.Array, block: int):
    """Flat f32 → (int8 payload, per-block scales)."""
    return quant_blocks(x.reshape(-1, block), "int8")


def _dequant_i8(q: jax.Array, scale: jax.Array) -> jax.Array:
    return dequant_blocks(q, scale).reshape(-1)


def _quant_f8(x: jax.Array, block: int):
    """Flat non-negative f32 → (e4m3 payload, per-block scales)."""
    return quant_blocks(x.reshape(-1, block), "e4m3")


def _dequant_f8(q: jax.Array, scale: jax.Array) -> jax.Array:
    return dequant_blocks(q, scale).reshape(-1)


def _pad(n: int, block: int) -> int:
    return (-(-n // block)) * block


class Moment8(NamedTuple):
    """One quantized moment tensor (flat payload + per-block scales)."""
    payload: jax.Array   # (nblocks, block) int8 or float8_e4m3fn
    scale: jax.Array     # (nblocks,) f32


class Adam8State(NamedTuple):
    count: chex.Array
    m: optax.Params      # pytree of Moment8 (int8)
    v: optax.Params      # pytree of Moment8 (e4m3)


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8, block: int = 256
                       ) -> optax.GradientTransformation:
    """Adam with int8 first / e4m3 second moments (per-block scales).

    Drop-in for ``optax.scale_by_adam``; pair with
    ``optax.add_decayed_weights`` + ``optax.scale_by_learning_rate``
    for a quantized-state AdamW.
    """

    def _zeros_m(p):
        nb = _pad(p.size, block) // block
        return Moment8(jnp.zeros((nb, block), jnp.int8),
                       jnp.zeros((nb,), jnp.float32))

    def _zeros_v(p):
        nb = _pad(p.size, block) // block
        return Moment8(jnp.zeros((nb, block), jnp.float8_e4m3fn),
                       jnp.zeros((nb,), jnp.float32))

    def init_fn(params):
        return Adam8State(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(_zeros_m, params),
            v=jax.tree.map(_zeros_v, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, qm, qv):
            n = g.size
            gf = jnp.pad(g.astype(jnp.float32).reshape(-1),
                         (0, _pad(n, block) - n))
            m = b1 * _dequant_i8(*qm) + (1.0 - b1) * gf
            v = b2 * _dequant_f8(*qv) + (1.0 - b2) * gf * gf
            upd = ((m / bc1) / (jnp.sqrt(v / bc2) + eps))[:n]
            return (upd.reshape(g.shape).astype(g.dtype),
                    Moment8(*_quant_i8(m, block)),
                    Moment8(*_quant_f8(v, block)))

        flat_u, treedef = jax.tree.flatten(updates)
        flat_m = treedef.flatten_up_to(state.m)
        flat_v = treedef.flatten_up_to(state.v)
        outs = [leaf(g, qm, qv)
                for g, qm, qv in zip(flat_u, flat_m, flat_v)]
        return (treedef.unflatten([o[0] for o in outs]),
                Adam8State(count=count,
                           m=treedef.unflatten([o[1] for o in outs]),
                           v=treedef.unflatten([o[2] for o in outs])))

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 1e-4,
               block: int = 256,
               mask=None) -> optax.GradientTransformation:
    """AdamW with 8-bit moments — same chain shape AND defaults as
    ``optax.adamw`` (weight_decay=1e-4), so swapping it in changes only
    the state precision, not the training objective."""
    tx = [scale_by_adam_8bit(b1=b1, b2=b2, eps=eps, block=block)]
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay, mask=mask))
    tx.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*tx)


def state_bytes(state) -> int:
    """Total bytes of an optax state pytree (payloads + scales)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(state)
               if isinstance(x, jax.Array) or hasattr(x, "dtype"))
