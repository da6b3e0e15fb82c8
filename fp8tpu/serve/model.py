"""Production serving decoder: FP8 weights + FP8 KV cache.

This is the *real-quantization* twin of :class:`fp8tpu.models.Decoder`:
weights live in HBM as fp8 payloads with per-output-channel scales
(:func:`fp8tpu.kernels.quantize_weights`), the KV cache stores fp8 with
per-head-vector scales, and a whole decode step for all layers compiles
into one XLA computation (lax.scan over stacked layer params — weight
streaming pipelines across layers).

Decode attention consumes the fp8 cache directly: scales factor out of
the dots (q·(k·s) = (q·k)·s), so the cache is never expanded to bf16 in
HBM.  Every slot has its own position (continuous batching).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fp8tpu.kernels.qmatmul import quantize_weights
from fp8tpu.models.transformer import DecoderConfig, rope_freqs
from .kv_cache import KVCache, quantize_kv

_FP8_DTYPES = {"e4m3": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2}


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    model: DecoderConfig
    weight_fmt: str = "e4m3"
    kv_fmt: str = "e4m3"
    # 'convert': dequantize weights in-register via XLA convert (W8A16).
    # 'direct' : feed fp8 operands straight to the MXU dot (W8A8).
    matmul_impl: str = "convert"


def fp8_linear(x: jax.Array, w8: jax.Array, scale: jax.Array,
               impl: str = "convert") -> jax.Array:
    """x @ dequant(w8) with no bf16 weight copy in HBM.

    x: (..., K) bf16; w8: (K, N) fp8; scale: (1, N) or (N,) f32.
    """
    s = scale.reshape(-1)
    if impl == "direct":
        xq, xs = _quantize_act(x)
        out = jax.lax.dot_general(
            xq, w8, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (out * (xs * s)).astype(x.dtype)
    out = jax.lax.dot_general(
        x, (w8.astype(x.dtype)), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (out * s).astype(x.dtype)


def _quantize_act(x: jax.Array, fmt: str = "e4m3"):
    from fp8tpu.numerics.formats import FORMATS
    fdesc = FORMATS[fmt]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / fdesc.max_normal, 1.0)
    q = jnp.clip(x.astype(jnp.float32) / s, -fdesc.max_normal,
                 fdesc.max_normal).astype(_FP8_DTYPES[fmt])
    return q, s


def _rms(x, scale, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps) * scale
    return y.astype(x.dtype)


def convert_decoder_params(variables, cfg: DecoderConfig,
                           fmt: str = "e4m3") -> Dict:
    """Quantize trained Decoder params (fp8tpu.models.transformer) into the
    serving artifact: stacked per-layer fp8 payloads + scales."""
    p = variables["params"]

    def q(w):  # (K, N)
        payload, s = quantize_weights(w, fmt, axis=-1)
        return payload, s.reshape(-1)

    layers = {k: [] for k in
              ("attn_norm", "mlp_norm", "q8", "qs", "k8", "ks", "v8", "vs",
               "o8", "os", "gate8", "gates", "up8", "ups", "down8", "downs")}
    for i in range(cfg.n_layers):
        lp = p[f"layer_{i}"]
        layers["attn_norm"].append(lp["attn_norm"]["scale"])
        layers["mlp_norm"].append(lp["mlp_norm"]["scale"])
        for name, (tag8, tags) in {
            "q_proj": ("q8", "qs"), "k_proj": ("k8", "ks"),
            "v_proj": ("v8", "vs"), "o_proj": ("o8", "os"),
        }.items():
            payload, s = q(lp["attn"][name]["kernel"])
            layers[tag8].append(payload)
            layers[tags].append(s)
        for name, (tag8, tags) in {
            "gate_proj": ("gate8", "gates"), "up_proj": ("up8", "ups"),
            "down_proj": ("down8", "downs"),
        }.items():
            payload, s = q(lp["mlp"][name]["kernel"])
            layers[tag8].append(payload)
            layers[tags].append(s)

    out = {k: jnp.stack(v) for k, v in layers.items()}
    out["embed"] = p["embed"]["embedding"].astype(jnp.bfloat16)
    out["final_norm"] = p["final_norm"]["scale"]
    return out


def _attend_decode(q, k8, ks, v8, vs, positions, cfg: DecoderConfig):
    """Single-token attention against the fp8 cache.

    q: (B, H, D) bf16; k8/v8: (B, S, KV, D) fp8; ks/vs: (B, S, KV) f32;
    positions: (B,) current position of each slot.
    """
    B, H, D = q.shape
    KV = k8.shape[2]
    G = H // KV
    S = k8.shape[1]
    qg = q.reshape(B, KV, G, D)

    # scores[b,k,g,s] = (q · k8) * ks ; fp8 payload feeds the dot directly.
    scores = jnp.einsum(
        "bkgd,bskd->bkgs", qg.astype(jnp.float32),
        k8.astype(jnp.bfloat16).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    scores = scores * ks.transpose(0, 2, 1)[:, :, None, :]
    scores = scores / jnp.sqrt(D).astype(jnp.float32)
    mask = jnp.arange(S)[None, :] <= positions[:, None]     # (B, S)
    scores = jnp.where(mask[:, None, None, :], scores,
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    # Fold v scales into the probabilities, then contract with fp8 V.
    probs_s = (probs * vs.transpose(0, 2, 1)[:, :, None, :]).astype(
        jnp.float32)
    ctx = jnp.einsum(
        "bkgs,bskd->bkgd", probs_s,
        v8.astype(jnp.bfloat16).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return ctx.reshape(B, H * D).astype(jnp.bfloat16)


@partial(jax.jit, static_argnames=("cfg",))
def decode_step(params: Dict, cache: KVCache, tokens: jax.Array,
                positions: jax.Array, cfg: ServeConfig
                ) -> Tuple[jax.Array, KVCache]:
    """One decode step for all slots.

    tokens: (B,) int32; positions: (B,) int32 per-slot write positions.
    Returns (logits (B, V) f32, updated cache).
    """
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    B = tokens.shape[0]
    impl = cfg.matmul_impl

    h = params["embed"][tokens]                           # (B, Dm)
    inv_freq = rope_freqs(mcfg)
    ang = positions[:, None].astype(jnp.float32) * inv_freq  # (B, D/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope1(x):  # (B, n, D)
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        c, s = cos[:, None], sin[:, None]
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                               axis=-1).astype(x.dtype)

    def layer_step(carry, xs):
        h, cache_k8, cache_v8, cache_ks, cache_vs, li = carry
        (attn_norm, mlp_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw,
         gate8, gates, up8, ups, down8, downs) = xs

        x = _rms(h, attn_norm, mcfg.norm_eps)
        q = fp8_linear(x, q8, qs, impl).reshape(B, H, D)
        k = fp8_linear(x, k8w, ksw, impl).reshape(B, KV, D)
        v = fp8_linear(x, v8w, vsw, impl).reshape(B, KV, D)
        q, k = rope1(q), rope1(k)

        kq8, kqs = quantize_kv(k, cfg.kv_fmt)
        vq8, vqs = quantize_kv(v, cfg.kv_fmt)
        bidx = jnp.arange(B)
        cache_k8 = cache_k8.at[li, bidx, positions].set(kq8)
        cache_v8 = cache_v8.at[li, bidx, positions].set(vq8)
        cache_ks = cache_ks.at[li, bidx, positions].set(kqs[..., 0])
        cache_vs = cache_vs.at[li, bidx, positions].set(vqs[..., 0])

        ctx = _attend_decode(q, cache_k8[li], cache_ks[li], cache_v8[li],
                             cache_vs[li], positions, mcfg)
        h = h + fp8_linear(ctx, o8, osw, impl)

        x = _rms(h, mlp_norm, mcfg.norm_eps)
        act = jax.nn.silu(fp8_linear(x, gate8, gates, impl).astype(
            jnp.float32)).astype(x.dtype) * fp8_linear(x, up8, ups, impl)
        h = h + fp8_linear(act, down8, downs, impl)
        return (h, cache_k8, cache_v8, cache_ks, cache_vs, li + 1), ()

    xs = (params["attn_norm"], params["mlp_norm"],
          params["q8"], params["qs"], params["k8"], params["ks"],
          params["v8"], params["vs"], params["o8"], params["os"],
          params["gate8"], params["gates"], params["up8"], params["ups"],
          params["down8"], params["downs"])
    h = h.astype(jnp.bfloat16)
    (h, ck8, cv8, cks, cvs, _), _ = jax.lax.scan(
        layer_step,
        (h, cache.k8, cache.v8, cache.k_scale, cache.v_scale,
         jnp.int32(0)),
        xs)
    h = _rms(h, params["final_norm"], mcfg.norm_eps)
    logits = jnp.dot(h.astype(jnp.float32),
                     params["embed"].T.astype(jnp.float32))
    return logits, KVCache(ck8, cv8, cks, cvs)


@partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict, cache: KVCache, tokens: jax.Array,
            slot: jax.Array, length: jax.Array, cfg: ServeConfig
            ) -> Tuple[jax.Array, KVCache]:
    """Prefill one slot with a right-padded (S,) prompt of true length
    ``length``; returns (logits at the last valid token, updated cache).
    Positions ≥ length hold garbage k/v but are overwritten by decode
    before the per-slot mask ever exposes them."""
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    S = tokens.shape[0]
    impl = cfg.matmul_impl

    h = params["embed"][tokens]                           # (S, Dm)
    inv_freq = rope_freqs(mcfg)
    pos = jnp.arange(S)
    ang = pos[:, None].astype(jnp.float32) * inv_freq
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope1(x):  # (S, n, D)
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        c, s = cos[:, None], sin[:, None]
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                               axis=-1).astype(x.dtype)

    causal = pos[None, :] <= pos[:, None]                 # (S, S)

    def layer_step(carry, xs):
        h, ck8, cv8, cks, cvs, li = carry
        (attn_norm, mlp_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw,
         gate8, gates, up8, ups, down8, downs) = xs

        x = _rms(h, attn_norm, mcfg.norm_eps)
        q = fp8_linear(x, q8, qs, impl).reshape(S, H, D)
        k = fp8_linear(x, k8w, ksw, impl).reshape(S, KV, D)
        v = fp8_linear(x, v8w, vsw, impl).reshape(S, KV, D)
        q, k = rope1(q), rope1(k)

        kq8, kqs = quantize_kv(k, cfg.kv_fmt)
        vq8, vqs = quantize_kv(v, cfg.kv_fmt)
        z = jnp.zeros((), jnp.int32)
        ck8 = jax.lax.dynamic_update_slice(ck8, kq8[None, None],
                                           (li, slot, z, z, z))
        cv8 = jax.lax.dynamic_update_slice(cv8, vq8[None, None],
                                           (li, slot, z, z, z))
        cks = jax.lax.dynamic_update_slice(cks, kqs[..., 0][None, None],
                                           (li, slot, z, z))
        cvs = jax.lax.dynamic_update_slice(cvs, vqs[..., 0][None, None],
                                           (li, slot, z, z))

        # Dense causal attention on the fresh (bf16) K/V — prefill is
        # compute-bound; the cache write above is for later decode reads.
        G = H // KV
        qg = q.reshape(S, KV, G, D)
        scores = jnp.einsum("skgd,tkd->skgt", qg.astype(jnp.float32),
                            k.astype(jnp.float32)) / jnp.sqrt(D)
        scores = jnp.where(causal[:, None, None, :], scores,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("skgt,tkd->skgd", probs, v.astype(jnp.float32))
        ctx = ctx.reshape(S, H * D).astype(jnp.bfloat16)
        h = h + fp8_linear(ctx, o8, osw, impl)

        x = _rms(h, mlp_norm, mcfg.norm_eps)
        act = jax.nn.silu(fp8_linear(x, gate8, gates, impl).astype(
            jnp.float32)).astype(x.dtype) * fp8_linear(x, up8, ups, impl)
        h = h + fp8_linear(act, down8, downs, impl)
        return (h, ck8, cv8, cks, cvs, li + 1), ()

    xs = (params["attn_norm"], params["mlp_norm"],
          params["q8"], params["qs"], params["k8"], params["ks"],
          params["v8"], params["vs"], params["o8"], params["os"],
          params["gate8"], params["gates"], params["up8"], params["ups"],
          params["down8"], params["downs"])
    h = h.astype(jnp.bfloat16)
    (h, ck8, cv8, cks, cvs, _), _ = jax.lax.scan(
        layer_step,
        (h, cache.k8, cache.v8, cache.k_scale, cache.v_scale,
         jnp.int32(0)),
        xs)
    h_last = jax.lax.dynamic_slice_in_dim(h, length - 1, 1, axis=0)
    h_last = _rms(h_last, params["final_norm"], mcfg.norm_eps)
    logits = jnp.dot(h_last.astype(jnp.float32),
                     params["embed"].T.astype(jnp.float32))[0]
    return logits, KVCache(ck8, cv8, cks, cvs)
