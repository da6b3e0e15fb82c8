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
    # Embedding / tied LM head storage: "bf16" keeps the reference's
    # exempt-classifier-head default; an fp8 fmt stores per-row-scaled
    # payloads (the reference's block_norm embedding mode,
    # e5m2_emu.py:119-137, row = block).
    embed_fmt: str = "bf16"
    # In-place staged-buffer writes: "pallas" aliases buffers via the
    # dyn_store kernel (TPU), "xla" uses dynamic_update_slice (CPU).
    staging_impl: str = "auto"


def _staging_pallas(cfg: "ServeConfig") -> bool:
    if cfg.staging_impl == "auto":
        return jax.default_backend() == "tpu"
    return cfg.staging_impl == "pallas"


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


def _embed_lookup(params, toks):
    e = params["embed"]
    if "embed_s" in params:
        rows = e[toks].astype(jnp.bfloat16)
        return rows * params["embed_s"][toks][:, None].astype(jnp.bfloat16)
    return e[toks].astype(jnp.bfloat16)


def _lm_head(params, h):
    """Tied LM head: contract on the table's feature axis directly — no
    transposed/upcast copy of the (V, Dm) table in HBM."""
    e = params["embed"]
    logits = jax.lax.dot_general(
        h, e.astype(jnp.bfloat16) if e.dtype != jnp.bfloat16 else e,
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if "embed_s" in params:
        logits = logits * params["embed_s"][None, :]
    return logits


def _rms(x, scale, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps) * scale
    return y.astype(x.dtype)


def convert_decoder_params(variables, cfg: DecoderConfig,
                           fmt: str = "e4m3",
                           embed_fmt: str = "bf16") -> Dict:
    """Quantize trained Decoder params (fp8tpu.models.transformer) into the
    serving artifact: stacked per-layer fp8 payloads + scales."""
    p = variables["params"]

    def q(w):  # (K, N)
        if fmt == "bf16":
            return (w.astype(jnp.bfloat16),
                    jnp.ones((w.shape[-1],), jnp.float32))
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
    emb = p["embed"]["embedding"]
    if embed_fmt == "bf16":
        out["embed"] = emb.astype(jnp.bfloat16)
    else:
        payload, es = quantize_weights(emb, embed_fmt, axis=0)
        out["embed"] = payload
        out["embed_s"] = es.reshape(-1)          # per-row (vocab) scales
    out["final_norm"] = p["final_norm"]["scale"]
    return out


def random_serve_params(cfg: DecoderConfig, fmt: str = "e4m3",
                        embed_fmt: str = "bf16", seed: int = 0) -> Dict:
    """Random serving params built DIRECTLY in the target dtype — for
    benchmarks of models whose f32 training-form init would not fit HBM
    (a 3B f32 init is ~12 GB; the fp8 artifact is ~3 GB).  Weight
    streaming cost is value-independent."""
    L, Dm, FF = cfg.n_layers, cfg.d_model, cfg.d_ff
    HD, KVD = cfg.n_heads * cfg.head_dim, cfg.n_kv_heads * cfg.head_dim
    dt = jnp.bfloat16 if fmt == "bf16" else _FP8_DTYPES[fmt]
    key = jax.random.key(seed)

    def w(key, k, n):
        x = jax.random.normal(key, (L, k, n), jnp.bfloat16) * 0.02
        return x.astype(dt)

    ks = jax.random.split(key, 8)
    out = {
        "attn_norm": jnp.ones((L, Dm), jnp.float32),
        "mlp_norm": jnp.ones((L, Dm), jnp.float32),
        "q8": w(ks[0], Dm, HD), "qs": jnp.ones((L, HD), jnp.float32),
        "k8": w(ks[1], Dm, KVD), "ks": jnp.ones((L, KVD), jnp.float32),
        "v8": w(ks[2], Dm, KVD), "vs": jnp.ones((L, KVD), jnp.float32),
        "o8": w(ks[3], HD, Dm), "os": jnp.ones((L, Dm), jnp.float32),
        "gate8": w(ks[4], Dm, FF), "gates": jnp.ones((L, FF), jnp.float32),
        "up8": w(ks[5], Dm, FF), "ups": jnp.ones((L, FF), jnp.float32),
        "down8": w(ks[6], FF, Dm), "downs": jnp.ones((L, Dm), jnp.float32),
        "embed": jax.random.normal(ks[7], (cfg.vocab_size, Dm),
                                   jnp.bfloat16) * 0.02,
        "final_norm": jnp.ones((Dm,), jnp.float32),
    }
    if embed_fmt != "bf16":
        out["embed"] = out["embed"].astype(_FP8_DTYPES[embed_fmt])
        out["embed_s"] = jnp.ones((cfg.vocab_size,), jnp.float32)
    return out


def _attend_decode(q, kq8, kqs, vq8, vqs, k8, ks, v8, vs, positions,
                   cfg: DecoderConfig):
    """Single-token attention: cached fp8 prefix + the fresh token.

    Delegates to :func:`_attend_chunked` with an empty (fully masked)
    staged chunk — the masked terms contribute exact +0.0 everywhere, so
    stepwise decode is BIT-IDENTICAL to the first token of a chunked
    decode (the engine mixes both paths and the chunked-vs-stepwise
    tests rely on trajectory equality).

    q: (B, H, D) bf16; kq8/vq8: (B, KV, D) fp8 with scales kqs/vqs (B,KV);
    k8/v8: (B, KV, S, D) fp8; ks/vs: (B, KV, S) f32;
    positions: (B,) — cached entries are valid at s < position.
    """
    B = q.shape[0]
    KV, D = k8.shape[1], k8.shape[3]
    kv_dt = k8.dtype
    rk8 = jnp.zeros((1, B * KV, D), kv_dt)
    rv8 = jnp.zeros((1, B * KV, D), kv_dt)
    rks = jnp.zeros((1, B * KV), jnp.float32)
    rvs = jnp.zeros((1, B * KV), jnp.float32)
    return _attend_chunked(q, kq8, kqs, vq8, vqs, k8, ks, v8, vs,
                           rk8, rks, rv8, rvs, positions, jnp.int32(0),
                           cfg)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def decode_step(params: Dict, cache: KVCache, tokens: jax.Array,
                positions: jax.Array, cfg: ServeConfig
                ) -> Tuple[jax.Array, KVCache]:
    """One decode step for all slots.

    tokens: (B,) int32; positions: (B,) int32 per-slot write positions.
    Returns (logits (B, V) f32, updated cache).  The input cache is
    DONATED — its buffers are updated in place; keep using the returned
    cache only.
    """
    return _decode_step_impl(params, cache, tokens, positions, cfg)


def _decode_step_impl(params: Dict, cache: KVCache, tokens: jax.Array,
                      positions: jax.Array, cfg: ServeConfig
                      ) -> Tuple[jax.Array, KVCache]:
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    B = tokens.shape[0]
    impl = cfg.matmul_impl

    h = _embed_lookup(params, tokens)                     # (B, Dm)
    inv_freq = rope_freqs(mcfg)
    ang = positions[:, None].astype(jnp.float32) * inv_freq  # (B, D/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope1(x):  # (B, n, D)
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        c, s = cos[:, None], sin[:, None]
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                               axis=-1).astype(x.dtype)

    def layer_step(carry, xs):
        h, li = carry
        (attn_norm, mlp_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw,
         gate8, gates, up8, ups, down8, downs) = xs

        x = _rms(h, attn_norm, mcfg.norm_eps)
        q = fp8_linear(x, q8, qs, impl).reshape(B, H, D)
        k = fp8_linear(x, k8w, ksw, impl).reshape(B, KV, D)
        v = fp8_linear(x, v8w, vsw, impl).reshape(B, KV, D)
        q, k = rope1(q), rope1(k)

        # Quantize the fresh token first and attend its *quantized* form
        # — identical numerics to reading it back from the cache, keeping
        # stepwise and chunked decode consistent.
        kq8, kqs = quantize_kv(k, cfg.kv_fmt)
        vq8, vqs = quantize_kv(v, cfg.kv_fmt)

        # Attend against the pre-step cache + the fresh token; the cache
        # write for all layers happens in ONE scatter after the scan
        # (in-scan scatters cost ~20% of the step, measured).
        ctx = _attend_decode(q, kq8, kqs[..., 0], vq8, vqs[..., 0],
                             cache.k8[li], cache.k_scale[li],
                             cache.v8[li], cache.v_scale[li], positions,
                             mcfg)
        h = h + fp8_linear(ctx, o8, osw, impl)

        x = _rms(h, mlp_norm, mcfg.norm_eps)
        act = jax.nn.silu(fp8_linear(x, gate8, gates, impl).astype(
            jnp.float32)).astype(x.dtype) * fp8_linear(x, up8, ups, impl)
        h = h + fp8_linear(act, down8, downs, impl)

        return (h, li + 1), (kq8, kqs[..., 0], vq8, vqs[..., 0])

    xs = (params["attn_norm"], params["mlp_norm"],
          params["q8"], params["qs"], params["k8"], params["ks"],
          params["v8"], params["vs"], params["o8"], params["os"],
          params["gate8"], params["gates"], params["up8"], params["ups"],
          params["down8"], params["downs"])
    h = h.astype(jnp.bfloat16)
    (h, _), (kq8, kqs, vq8, vqs) = jax.lax.scan(
        layer_step, (h, jnp.int32(0)), xs)

    # One scatter writes every layer's new token.  With separated advanced
    # indices the broadcast (B,) dim lands first: value shape (B,L,KV,·).
    bidx = jnp.arange(B)
    ck8 = cache.k8.at[:, bidx, :, positions].set(kq8.transpose(1, 0, 2, 3))
    cv8 = cache.v8.at[:, bidx, :, positions].set(vq8.transpose(1, 0, 2, 3))
    cks = cache.k_scale.at[:, bidx, :, positions].set(
        kqs.transpose(1, 0, 2))
    cvs = cache.v_scale.at[:, bidx, :, positions].set(
        vqs.transpose(1, 0, 2))

    h = _rms(h, params["final_norm"], mcfg.norm_eps)
    logits = _lm_head(params, h)
    return logits, KVCache(ck8, cv8, cks, cvs)


@partial(jax.jit, static_argnames=("cfg", "n_steps"),
         donate_argnames=("cache",))
def decode_steps(params: Dict, cache: KVCache, tokens: jax.Array,
                 positions: jax.Array, key: jax.Array,
                 temperature: jax.Array, n_steps: int, cfg: ServeConfig
                 ) -> Tuple[jax.Array, KVCache]:
    """``n_steps`` decode steps with on-device sampling in ONE compiled
    program — amortizes dispatch and lets XLA pipeline across steps
    (host only re-enters for admission/retirement between chunks).

    The chunk's fresh k/v are staged in a step-major buffer whose writes
    are large contiguous slabs (per-token scatters into the big cache cost
    ~100ns per 128-byte fragment — measured 4 ms/step at 16×32×16 heads);
    attention covers cached prefix + staged chunk, and the staging buffer
    merges into the cache ONCE per chunk.

    temperature: (B,) float32, 0 → greedy.
    Returns (sampled tokens (B, n_steps), cache).
    """
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    B = tokens.shape[0]
    L = mcfg.n_layers
    impl = cfg.matmul_impl
    kv_dt = cache.k8.dtype
    inv_freq = rope_freqs(mcfg)

    # Step-major staging: (T, 2, L, B*KV, D) — k and v packed so each
    # step issues ONE slab write per buffer, with the (B, KV) dims
    # flattened to keep every trailing dim tile-aligned (fp8's sublane
    # tile is 32; a bare KV=8 dim would be 4x-padded in HBM and every
    # read/write would pay a relayout copy).  Writes go through the
    # aliasing dyn_store kernel on TPU: a plain dynamic_update_slice on
    # a carry that the layer scan also reads makes XLA copy the whole
    # buffer every step (~0.5 ms/step at 3B scale, profiled).
    use_pallas = _staging_pallas(cfg)
    BK = B * KV
    rkv8 = jnp.zeros((n_steps, 2, L, BK, D), kv_dt)
    rsc = jnp.zeros((n_steps, 2, L, BK), jnp.float32)

    def one(carry, step_in):
        toks, pos, rkv8, rsc, t = carry
        step_key = step_in
        h = _embed_lookup(params, toks)

        ang = pos[:, None].astype(jnp.float32) * inv_freq
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rope1(x):
            x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
            c, s = cos[:, None], sin[:, None]
            return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                                   axis=-1).astype(x.dtype)

        def layer_step(lcarry, xs):
            h, li = lcarry
            (attn_norm, mlp_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw,
             gate8, gates, up8, ups, down8, downs) = xs

            x = _rms(h, attn_norm, mcfg.norm_eps)
            q = fp8_linear(x, q8, qs, impl).reshape(B, H, D)
            k = fp8_linear(x, k8w, ksw, impl).reshape(B, KV, D)
            v = fp8_linear(x, v8w, vsw, impl).reshape(B, KV, D)
            q, k = rope1(q), rope1(k)

            kq8, kqs = quantize_kv(k, cfg.kv_fmt)
            vq8, vqs = quantize_kv(v, cfg.kv_fmt)
            kqs0, vqs0 = kqs[..., 0], vqs[..., 0]

            # Attend: cached prefix + staged chunk (t' < t) + the fresh
            # token itself (local, never read back from staging).
            ctx = _attend_chunked(
                q, kq8, kqs0, vq8, vqs0,
                cache.k8[li], cache.k_scale[li], cache.v8[li],
                cache.v_scale[li], rkv8[:, 0, li], rsc[:, 0, li],
                rkv8[:, 1, li], rsc[:, 1, li], positions, t, mcfg)
            kq8, vq8 = kq8.reshape(BK, D), vq8.reshape(BK, D)
            kqs, vqs = kqs.reshape(BK), vqs.reshape(BK)
            h = h + fp8_linear(ctx, o8, osw, impl)

            x = _rms(h, mlp_norm, mcfg.norm_eps)
            act = jax.nn.silu(fp8_linear(x, gate8, gates, impl).astype(
                jnp.float32)).astype(x.dtype) * fp8_linear(x, up8, ups,
                                                           impl)
            h = h + fp8_linear(act, down8, downs, impl)
            return (h, li + 1), (kq8, kqs, vq8, vqs)

        xs = (params["attn_norm"], params["mlp_norm"],
              params["q8"], params["qs"], params["k8"], params["ks"],
              params["v8"], params["vs"], params["o8"], params["os"],
              params["gate8"], params["gates"], params["up8"],
              params["ups"], params["down8"], params["downs"])
        (h, _), (fk8, fks, fv8, fvs) = jax.lax.scan(
            layer_step, (h, jnp.int32(0)), xs)

        # One packed slab write per buffer per step at index t.
        from fp8tpu.kernels.inplace import dyn_store
        rkv8 = dyn_store(rkv8, jnp.stack([fk8, fv8]), t,
                         use_pallas=use_pallas)
        rsc = dyn_store(rsc, jnp.stack([fks, fvs]), t,
                        use_pallas=use_pallas)

        h = _rms(h, params["final_norm"], mcfg.norm_eps)
        logits = _lm_head(params, h)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
        sampled = jax.random.categorical(step_key, scaled,
                                         axis=-1).astype(jnp.int32)
        nxt = jnp.where(temperature > 0, sampled, greedy)
        return (nxt, pos + 1, rkv8, rsc, t + 1), nxt

    keys = jax.random.split(key, n_steps)
    (_, _, rkv8, rsc, _), toks = jax.lax.scan(
        one, (tokens, positions, rkv8, rsc, jnp.int32(0)), keys)

    # Merge the staged chunk into the cache: per-slot contiguous
    # (L, KV, T, D) slabs at each slot's start position.
    rk8u = rkv8[:, 0].reshape(n_steps, L, B, KV, D)
    rv8u = rkv8[:, 1].reshape(n_steps, L, B, KV, D)
    mk8 = rk8u.transpose(2, 1, 3, 0, 4)         # (B, L, KV, T, D)
    mv8 = rv8u.transpose(2, 1, 3, 0, 4)
    mks = rsc[:, 0].reshape(n_steps, L, B, KV).transpose(2, 1, 3, 0)
    mvs = rsc[:, 1].reshape(n_steps, L, B, KV).transpose(2, 1, 3, 0)

    def write_slot(b, arrs):
        ck8, cv8, cks, cvs = arrs
        z = jnp.zeros((), jnp.int32)
        p = positions[b]
        ck8 = jax.lax.dynamic_update_slice(
            ck8, mk8[b][:, None], (z, b, z, p, z))
        cv8 = jax.lax.dynamic_update_slice(
            cv8, mv8[b][:, None], (z, b, z, p, z))
        cks = jax.lax.dynamic_update_slice(
            cks, mks[b][:, None], (z, b, z, p))
        cvs = jax.lax.dynamic_update_slice(
            cvs, mvs[b][:, None], (z, b, z, p))
        return ck8, cv8, cks, cvs

    ck8, cv8, cks, cvs = jax.lax.fori_loop(
        0, B, write_slot,
        (cache.k8, cache.v8, cache.k_scale, cache.v_scale))
    return toks.T, KVCache(ck8, cv8, cks, cvs)


_NEG = -1e30  # finite mask value keeps exp() NaN-free for empty slots


def _attend_chunked(q, kq8, kqs, vq8, vqs, k8, ks, v8, vs, rk8, rks, rv8,
                    rvs, chunk_start, t, cfg: DecoderConfig):
    """Decode attention over (cached prefix) + (staged chunk < t) + the
    fresh token itself, flash-style: unnormalized exp-partials everywhere
    and ONE division on the (B,KV,G,D) context — not on the (·,S+T)-wide
    probabilities (the softmax divide over the concat was ~6 µs/layer).

    q: (B,H,D); fresh kq8/vq8: (B,KV,D) with scales kqs/vqs (B,KV);
    cache k8/v8: (B,KV,S,D) with scales (B,KV,S), valid at s <
    chunk_start; staged rk8/rv8: (T,B*KV,D) with scales (T,B*KV) — the
    (B,KV) dims arrive flattened to keep staging buffers tile-aligned —
    valid at tt < t (the current token attends its local quantized form,
    identical numerics to reading it back from staging).
    """
    B, H, D = q.shape
    KV, S = k8.shape[1], k8.shape[2]
    T = rk8.shape[0]
    G = H // KV
    qg = (q.astype(jnp.float32)
          / jnp.sqrt(D).astype(jnp.float32)).astype(q.dtype)
    qg = qg.reshape(B, KV, G, D)

    scores_c = jnp.einsum(
        "bkgd,bksd->bkgs", qg, k8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * ks[:, :, None, :]
    mask_c = jnp.arange(S)[None, :] < chunk_start[:, None]
    scores_c = jnp.where(mask_c[:, None, None, :], scores_c, _NEG)

    scores_r = jnp.einsum(
        "xgd,txd->xgt", qg.reshape(B * KV, G, D), rk8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, KV, G, T) * rks.T.reshape(B, KV, 1, T)
    mask_r = jnp.arange(T) < t
    scores_r = jnp.where(mask_r[None, None, None, :], scores_r, _NEG)

    score_self = jnp.einsum(
        "bkgd,bkd->bkg", qg, kq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * kqs[:, :, None]                                     # (B,KV,G)

    m = jnp.maximum(
        jnp.maximum(jnp.max(scores_c, axis=-1), jnp.max(scores_r, axis=-1)),
        score_self)                                         # (B,KV,G)
    pc = jnp.exp(scores_c - m[..., None])
    pr = jnp.exp(scores_r - m[..., None])
    ps = jnp.exp(score_self - m)
    l = pc.sum(-1) + pr.sum(-1) + ps                        # (B,KV,G)

    pcs = (pc * vs[:, :, None, :]).astype(q.dtype)
    prs = (pr * rvs.T.reshape(B, KV, 1, T)).astype(q.dtype)
    ctx = jnp.einsum("bkgs,bksd->bkgd", pcs, v8.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    ctx = ctx + jnp.einsum(
        "xgt,txd->xgd", prs.reshape(B * KV, G, T), rv8.astype(q.dtype),
        preferred_element_type=jnp.float32).reshape(B, KV, G, D)
    ctx = ctx + ((ps * vqs[:, :, None])[..., None]
                 * vq8.astype(jnp.float32)[:, :, None, :])
    ctx = ctx / l[..., None]
    return ctx.reshape(B, H * D).astype(q.dtype)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
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

    h = _embed_lookup(params, tokens)                     # (S, Dm)
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
        # (S, KV, ·) → cache layout (KV, S, ·).
        ck8 = jax.lax.dynamic_update_slice(
            ck8, kq8.transpose(1, 0, 2)[None, None], (li, slot, z, z, z))
        cv8 = jax.lax.dynamic_update_slice(
            cv8, vq8.transpose(1, 0, 2)[None, None], (li, slot, z, z, z))
        cks = jax.lax.dynamic_update_slice(
            cks, kqs[..., 0].T[None, None], (li, slot, z, z))
        cvs = jax.lax.dynamic_update_slice(
            cvs, vqs[..., 0].T[None, None], (li, slot, z, z))

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
    logits = _lm_head(params, h_last)[0]
    return logits, KVCache(ck8, cv8, cks, cvs)
