"""Decoder-only transformer (the flagship model family).

Llama-class architecture in Flax linen: RMSNorm, rotary position
embeddings, grouped-query attention, SwiGLU MLP.  Written so the
quantization interceptor sees every contraction as a policy-addressable
module: projections are ``nn.Dense`` and the attention score/context
matmuls go through the :mod:`fp8tpu.ops.wrappers` modules — the same
technique the reference's BERT example uses to make torch.matmul
call-sites hookable (examples/inference/bert/modeling_bert.py:251-252).

This is the *emulation/training* form (params in bf16/f32, fake-quant via
policy).  The production serving form with real FP8 payloads + fused
dequant kernels lives in :mod:`fp8tpu.serve`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fp8tpu.ops.wrappers import BatchMatmul


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int = 32000
    d_model: int = 2048
    n_layers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 16
    d_ff: int = 5504           # SwiGLU hidden
    max_seq_len: int = 2048
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dtype: str = "bfloat16"
    tie_embeddings: bool = True
    # Rematerialize each decoder layer in the backward pass
    # (jax.checkpoint): activations per layer are recomputed instead of
    # stashed — the standard HBM lever for long-sequence training.
    remat: bool = False
    # Mixture-of-experts FFN: n_experts > 0 replaces the dense MLP with
    # GShard-style capacity-bounded top-k routing (experts shardable
    # over the mesh — see parallel/moe.py and MOE_PARAM_RULES).
    n_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    def jdtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]


def rope_freqs(cfg: DecoderConfig):
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, jnp.float32) / d))
    return inv  # (d/2,)


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array):
    """x: (B, S, H, D); positions: (B, S)."""
    ang = positions[..., None].astype(jnp.float32) * inv_freq  # (B,S,D/2)
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1)
    return out.astype(x.dtype)


class RMSNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class Attention(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        cfg = self.cfg
        dt = cfg.jdtype()
        B, S, _ = x.shape
        H, KV, D = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

        q = nn.Dense(H * D, use_bias=False, dtype=dt, name="q_proj")(x)
        k = nn.Dense(KV * D, use_bias=False, dtype=dt, name="k_proj")(x)
        v = nn.Dense(KV * D, use_bias=False, dtype=dt, name="v_proj")(x)
        q = q.reshape(B, S, H, D)
        k = k.reshape(B, S, KV, D)
        v = v.reshape(B, S, KV, D)

        inv_freq = rope_freqs(cfg)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)

        if KV != H:
            rep = H // KV
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)

        # Score and context matmuls as interceptable call-sites.
        qh = q.transpose(0, 2, 1, 3)              # (B,H,S,D)
        kh = k.transpose(0, 2, 3, 1)              # (B,H,D,S)
        scores = BatchMatmul(name="attn_scores_matmul")(qh, kh)
        scores = scores.astype(jnp.float32) / jnp.sqrt(D).astype(jnp.float32)
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        vh = v.transpose(0, 2, 1, 3)              # (B,H,S,D)
        ctx = BatchMatmul(name="attn_context_matmul")(probs, vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dt,
                        name="o_proj")(ctx)


class MLP(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.jdtype()
        gate = nn.Dense(cfg.d_ff, use_bias=False, dtype=dt,
                        name="gate_proj")(x)
        up = nn.Dense(cfg.d_ff, use_bias=False, dtype=dt, name="up_proj")(x)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=dt,
                        name="down_proj")(nn.silu(gate) * up)


class MoEMLP(nn.Module):
    """Mixture-of-experts FFN (GShard-style capacity-bounded top-k
    routing; ``parallel/moe.py`` holds the routing math).  The expert
    contractions go through the :class:`BatchMatmul` wrapper, so the
    quantization interceptor covers them with the standard
    batchmatmul-input policy — the same mechanism the reference applies
    to BERT's attention matmuls.  The router aux load-balancing loss is
    sown into the ``intermediates`` collection (retrieve with
    ``model.apply(..., mutable=["intermediates"])``; ignored silently
    otherwise)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x):
        from fp8tpu.parallel.moe import top_k_routing

        cfg = self.cfg
        dt = cfg.jdtype()
        B, S, Dm = x.shape
        E, F = cfg.n_experts, cfg.d_ff
        xt = x.reshape(B * S, Dm)
        T = B * S
        capacity = max(
            int(cfg.moe_capacity_factor * cfg.moe_top_k * T / E),
            cfg.moe_top_k)

        logits = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                          name="router")(xt.astype(jnp.float32))
        dispatch, combine, aux = top_k_routing(logits, cfg.moe_top_k,
                                               capacity)
        self.sow("intermediates", "moe_aux_loss", aux)

        up = self.param(
            "up", nn.initializers.normal(Dm ** -0.5), (E, Dm, F),
            jnp.float32)
        down = self.param(
            "down", nn.initializers.normal(F ** -0.5), (E, F, Dm),
            jnp.float32)

        xe = jnp.einsum("tec,td->ecd", dispatch,
                        xt.astype(jnp.float32)).astype(dt)
        h = BatchMatmul(name="experts_up")(xe, up.astype(dt))
        h = jax.nn.gelu(h.astype(jnp.float32)).astype(dt)
        ye = BatchMatmul(name="experts_down")(h, down.astype(dt))
        y = jnp.einsum("ecd,tec->td", ye.astype(jnp.float32), combine)
        return y.reshape(B, S, Dm).astype(x.dtype)


class DecoderLayer(nn.Module):
    cfg: DecoderConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        h = x + Attention(self.cfg, name="attn")(
            RMSNorm(self.cfg.norm_eps, name="attn_norm")(x), positions, mask)
        ffn = (MoEMLP(self.cfg, name="moe") if self.cfg.n_experts > 0
               else MLP(self.cfg, name="mlp"))
        h = h + ffn(RMSNorm(self.cfg.norm_eps, name="mlp_norm")(h))
        return h


class Decoder(nn.Module):
    """Causal decoder LM.  ``__call__`` returns logits (B, S, V)."""

    cfg: DecoderConfig

    @nn.compact
    def __call__(self, tokens, positions: Optional[jax.Array] = None):
        cfg = self.cfg
        dt = cfg.jdtype()
        B, S = tokens.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S), (B, S))
        mask = nn.make_causal_mask(tokens, dtype=jnp.bool_)  # (B,1,S,S)

        emb = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=dt,
                       name="embed")
        h = emb(tokens)
        layer_cls = nn.remat(DecoderLayer) if cfg.remat else DecoderLayer
        for i in range(cfg.n_layers):
            h = layer_cls(cfg, name=f"layer_{i}")(h, positions, mask)
        h = RMSNorm(cfg.norm_eps, name="final_norm")(h)
        if cfg.tie_embeddings:
            logits = emb.attend(h.astype(dt))
        else:
            logits = nn.Dense(cfg.vocab_size, use_bias=False, dtype=dt,
                              name="lm_head")(h)
        return logits.astype(jnp.float32)


def moe_aux_loss(intermediates) -> jax.Array:
    """Mean of the per-layer Switch load-balancing losses sown by
    :class:`MoEMLP` (≈1 when the router is perfectly balanced).

    Use with ``logits, inter = apply_fn(params, toks,
    mutable=["intermediates"])`` and add ``aux_weight *
    moe_aux_loss(inter)`` to the task loss — without it, capacity-bounded
    routing collapses onto a few experts and drops the rest's tokens
    (Shazeer et al. / GShard; the reference has no MoE surface)."""
    leaves = jax.tree_util.tree_leaves(intermediates)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return jnp.mean(jnp.stack([jnp.asarray(l, jnp.float32).mean()
                               for l in leaves]))


def tiny_config(**kw) -> DecoderConfig:
    """Test-sized decoder."""
    base = dict(vocab_size=256, d_model=128, n_layers=2, n_heads=4,
                n_kv_heads=2, d_ff=256, max_seq_len=128)
    base.update(kw)
    return DecoderConfig(**base)
