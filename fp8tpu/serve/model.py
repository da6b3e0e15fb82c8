"""Production serving decoder: quantized weights + quantized ring KV cache.

This is the *real-quantization* twin of :class:`fp8tpu.models.Decoder`:
weights live in HBM as fp8/int8 payloads with per-output-channel scales
(:func:`fp8tpu.kernels.quantize_weights`; int4 nibble-packed as the
capacity option), the KV cache stores fp8/int8 with per-head-vector
scales in a ring buffer (:class:`RingKVCache`), and a whole decode chunk
(n steps x all layers, with on-device sampling) compiles into one XLA
computation.  On v5e, int8 payloads are the measured-best configuration
for BOTH weights and KV (throughput and accuracy — README perf table);
e4m3 is the fp8 headline the BASELINE gate names.

Design notes (all profiled on a v5e chip):

* The ring cache makes each step's cache update ONE contiguous
  leading-index slab store, which XLA performs in place.  The previous
  design (contiguous per-slot regions + staged chunk + merge) spent
  ~1.4 ms/step at 3B scale on staging-buffer copies, per-slot merge
  scatters and chunk epilogues — all structurally eliminated here.
* Decode attention consumes the fp8 cache directly: per-vector scales
  factor out of the dots (q·(k·s) = (q·k)·s), so the cache is never
  expanded to bf16 in HBM.  Flash-style partials: the cached prefix and
  the fresh token produce unnormalized exp-sums that are combined and
  normalized once on the (B,KV,G,D) context.
* Every slot has its own position (continuous batching); masking is
  ``(head - 1 - row) mod S < min(position, S)`` — per-slot sliding
  window of the ring size.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from fp8tpu.kernels.inplace import dyn_store
from fp8tpu.kernels.qmatmul import quantize_weights
from fp8tpu.models.transformer import DecoderConfig, rope_freqs
from .kv_cache import PagedKVCache, RingKVCache, quantize_kv

_FP8_DTYPES = {"e4m3": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2,
               "int8": jnp.int8}
_NEG = -1e30  # finite mask value keeps exp() NaN-free for empty slots


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
    # AWQ-class K-group size for int4 weights (None → per-output-channel
    # scales only).  128 is the production default: serve_int4 ΔPPL vs
    # the bf16 twin passes the ≤0.1 gate with grouped scales
    # (ACCURACY.json) where per-channel-only sat at +0.19.
    int4_group: Optional[int] = 128
    # Ring-write batching: 0 writes each step's k/v row directly (one
    # leading-index DUS per step — XLA RMWs every tile containing the
    # row, ~bytes/16 per step since S sits in the sublane tile).  W > 1
    # collects W steps in a small side buffer (re-scored against each
    # new query — exact) and flushes one W-row slab per W steps,
    # amortizing the RMW.  Requires decode chunk lengths divisible by W,
    # max_seq % W == 0, and a W-aligned head (the engine and a head-0
    # start guarantee this).
    ring_flush: int = 0
    # Ring-write implementation.  "xla" (dynamic_update_slice) is the
    # default: with the ring structure (single leading-index write per
    # step) XLA updates the carry in place.  "pallas" routes through the
    # aliasing dyn_store kernel — measured SLOWER here because XLA
    # inserts a layout/copy before every aliased custom call (1 GB ring
    # copied per step); kept for layouts where XLA's DUS copies instead.
    staging_impl: str = "auto"
    # Paged-decode chunk strategy, A/B-measured at the 1B bench shape
    # (tools/bench_paged.py, PERF_EXTRAS "paged").  "ringview"
    # (default): gather the chunk snapshot directly into the RING
    # layout and run the literal ring attention einsum — the r5 profile
    # showed the old (B, MP, ...) snapshot's per-layer slice never
    # fused into the paged einsum (24 us x L x step), and fixing the
    # layout closed the premium from 1.27x to 1.07x over the ring.
    # Alternatives, kept for A/B: "side" = the r4 snapshot layout with
    # deferred pool writes (1.27x); "side-eager" = r4 per-step pool
    # writes (1.27x — the scatter was never the cost); "scatter" =
    # write fresh K/V into the snapshot each step (1.76x: the per-step
    # update into the ~200 MB carry RMWs more than it saves);
    # "kernel" = the Pallas in-kernel page-table walk
    # (kernels/paged_attention.py) — measured 1.83x: with one query
    # row per slot the score/context dots use ~16/128 MXU columns, so
    # the kernel is compute-bound below the XLA einsum, and ~L x steps
    # pallas dispatches add fixed cost.  It remains the reference
    # implementation for hardware with narrower-tile MXUs.
    paged_decode_impl: str = "ringview"


def _use_pallas_store(cfg: "ServeConfig") -> bool:
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


def quantize_weights_int4(w: jax.Array,
                          group_size: Optional[int] = None) -> tuple:
    """Symmetric int4 with nibble packing along K.

    Two K-adjacent values share one byte (w[2k] in the low nibble); the
    decode matmul splits the contraction into even/odd halves over the
    packed bytes.  W4A16 HALVES weight memory vs fp8 (a 7B model's
    weights fit in ~3.5 GB), doubling model capacity per chip.  On v5e
    int4 is a CAPACITY mode, not a speed win: the single-pass Pallas
    unpack kernel exists (kernels/int4_matmul.py) but Mosaic's
    int32-widened unpack costs more than the bytes it saves, so this XLA
    formulation stays the production route (measured in NOTES.md r2).
    INT4 is part of the reference's format surface (qutils.py:216-247).

    ``group_size``: None → one scale per output channel (scales (N,));
    an int → AWQ-class grouped scales, one per (K-group, output channel)
    (scales (K/group_size, N) — the production int4 accuracy
    configuration; K not divisible by group_size falls back to one
    group).  Returns (packed (K/2, N) uint8, scales f32).
    """
    wf = w.astype(jnp.float32)
    K, N = wf.shape
    if group_size is not None:
        gs = group_size if K % group_size == 0 and K >= group_size else K
        G = K // gs
        wg = wf.reshape(G, gs, N)
        amax = jnp.max(jnp.abs(wg), axis=1)                  # (G, N)
        s = jnp.where(amax > 0, amax / 7.0, 1.0)
        q = jnp.clip(jnp.round(wg / s[:, None]), -8, 7)
        q = q.reshape(K, N).astype(jnp.int32)
    else:
        amax = jnp.max(jnp.abs(wf), axis=0)
        s = jnp.where(amax > 0, amax / 7.0, 1.0)
        q = jnp.clip(jnp.round(wf / s), -8, 7).astype(jnp.int32)
    even, odd = q[0::2], q[1::2]
    packed = ((even & 0xF) | ((odd & 0xF) << 4)).astype(jnp.uint8)
    return packed, s.astype(jnp.float32)


def int4_linear(x: jax.Array, wp: jax.Array, scale: jax.Array) -> jax.Array:
    """x @ dequant(int4-packed w): the unpack (shift/sign-extend on the
    packed bytes) fuses into the two half-contraction dot operands.

    ``scale`` (N,) applies per output channel in the epilogue; a 2-D
    (G, N) grouped scale is folded into the dot's weight operand instead
    (it depends on the contraction index, so it cannot factor out) — K
    must satisfy G * group_size == K with an even group_size."""
    # CPU's dot thunk rejects bf16 x bf16 -> f32; compute in f32 there.
    dt = x.dtype if jax.default_backend() == "tpu" else jnp.float32
    xe = x[..., 0::2].astype(dt)
    xo = x[..., 1::2].astype(dt)
    lo = ((wp & 0xF).astype(jnp.int8) << 4 >> 4).astype(dt)
    hi = (wp.astype(jnp.int8) >> 4).astype(dt)
    nd = x.ndim - 1
    if scale.ndim == 2:
        # grouped: row k of the packed matrix holds original rows
        # (2k, 2k+1), both in group (2k)//gs → packed-row group index
        # k // (gs//2); expand to one scale row per packed row.
        srow = jnp.repeat(scale, wp.shape[0] // scale.shape[0],
                          axis=0).astype(dt)                 # (K/2, N)
        out = (jax.lax.dot_general(xe, lo * srow, (((nd,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(xo, hi * srow,
                                     (((nd,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32))
        return out.astype(x.dtype)
    s = scale.reshape(-1)
    out = (jax.lax.dot_general(xe, lo, (((nd,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(xo, hi, (((nd,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32))
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
        return rows * params["embed_s"][toks][..., None].astype(jnp.bfloat16)
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
                           embed_fmt: str = "bf16",
                           int4_group: Optional[int] = 128) -> Dict:
    """Quantize trained Decoder params (fp8tpu.models.transformer) into the
    serving artifact: stacked per-layer fp8 payloads + scales.  MoE
    decoders (cfg.n_experts > 0) stack router kernels bf16 and quantize
    the (E, K, N) expert up/down stacks per-expert per-output-channel
    (the decode paths combine ALL experts with exact top-k gates — see
    :func:`_moe_ffn`)."""
    p = variables["params"]
    moe = "moe" in p.get("layer_0", {})

    def q(w):  # (K, N)
        if fmt == "bf16":
            return (w.astype(jnp.bfloat16),
                    jnp.ones((w.shape[-1],), jnp.float32))
        if fmt == "int4":
            return quantize_weights_int4(w, group_size=int4_group)
        payload, s = quantize_weights(w, fmt, axis=-1)
        return payload, s.reshape(-1)

    mlp_keys = (("mlp_norm", "router", "eup8", "eups", "edown8", "edowns")
                if moe else
                ("mlp_norm", "gate8", "gates", "up8", "ups",
                 "down8", "downs"))
    layers = {k: [] for k in
              ("attn_norm", "q8", "qs", "k8", "ks", "v8", "vs",
               "o8", "os") + mlp_keys}
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
        if moe:
            mp = lp["moe"]
            layers["router"].append(
                mp["router"]["kernel"].astype(jnp.bfloat16))
            for name, (tag8, tags) in {"up": ("eup8", "eups"),
                                       "down": ("edown8", "edowns")}.items():
                payload, s = jax.vmap(q)(mp[name])    # over the E axis
                layers[tag8].append(payload)
                layers[tags].append(s)
        else:
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
    key = jax.random.key(seed)

    if fmt == "int4":
        def w(key, k, n):
            return jax.random.randint(key, (L, k // 2, n), 0, 256,
                                      jnp.int32).astype(jnp.uint8)
    elif fmt == "int8":
        def w(key, k, n):
            return jax.random.randint(key, (L, k, n), -127, 128,
                                      jnp.int32).astype(jnp.int8)
    else:
        dt = jnp.bfloat16 if fmt == "bf16" else _FP8_DTYPES[fmt]

        def w(key, k, n):
            x = jax.random.normal(key, (L, k, n), jnp.bfloat16) * 0.02
            return x.astype(dt)

    def sc(k, n):
        # int4 production scales are grouped (G, N) per layer — the
        # bench must run the grouped compute graph, not per-channel
        if fmt == "int4":
            g = k // 128 if (k % 128 == 0 and k >= 128) else 1
            return jnp.ones((L, g, n), jnp.float32)
        return jnp.ones((L, n), jnp.float32)

    ks = jax.random.split(key, 8)
    out = {
        "attn_norm": jnp.ones((L, Dm), jnp.float32),
        "mlp_norm": jnp.ones((L, Dm), jnp.float32),
        "q8": w(ks[0], Dm, HD), "qs": sc(Dm, HD),
        "k8": w(ks[1], Dm, KVD), "ks": sc(Dm, KVD),
        "v8": w(ks[2], Dm, KVD), "vs": sc(Dm, KVD),
        "o8": w(ks[3], HD, Dm), "os": sc(HD, Dm),
        "embed": jax.random.normal(ks[7], (cfg.vocab_size, Dm),
                                   jnp.bfloat16) * 0.02,
        "final_norm": jnp.ones((Dm,), jnp.float32),
    }
    if cfg.n_experts > 0:
        E = cfg.n_experts
        out["router"] = (jax.random.normal(ks[4], (L, Dm, E), jnp.bfloat16)
                         * Dm ** -0.5)

        def estack(a):  # (L, K, N) → (L, E, K, N); bench values may repeat
            return jnp.broadcast_to(a[:, None], (L, E) + a.shape[1:])

        out["eup8"], out["eups"] = estack(w(ks[5], Dm, FF)), \
            estack(sc(Dm, FF))
        out["edown8"], out["edowns"] = estack(w(ks[6], FF, Dm)), \
            estack(sc(FF, Dm))
    else:
        out.update({
            "gate8": w(ks[4], Dm, FF), "gates": sc(Dm, FF),
            "up8": w(ks[5], Dm, FF), "ups": sc(Dm, FF),
            "down8": w(ks[6], FF, Dm), "downs": sc(FF, Dm),
        })
    if embed_fmt != "bf16":
        if embed_fmt == "int8":
            out["embed"] = jax.random.randint(
                ks[7], (cfg.vocab_size, Dm), -127, 128,
                jnp.int32).astype(jnp.int8)
        else:
            out["embed"] = out["embed"].astype(_FP8_DTYPES[embed_fmt])
        out["embed_s"] = jnp.ones((cfg.vocab_size,), jnp.float32)
    return out


def _make_linear(cfg: "ServeConfig"):
    if cfg.weight_fmt == "int4":
        return lambda x, w, s, impl=None: int4_linear(x, w, s)
    return lambda x, w, s, impl=cfg.matmul_impl: fp8_linear(x, w, s, impl)


_ATTN_KEYS = ("attn_norm", "q8", "qs", "k8", "ks", "v8", "vs", "o8", "os")
_DENSE_MLP_KEYS = ("mlp_norm", "gate8", "gates", "up8", "ups",
                   "down8", "downs")
_MOE_KEYS = ("mlp_norm", "router", "eup8", "eups", "edown8", "edowns")


def _layer_xs(params):
    """Per-layer scan inputs as a dict pytree: attention keys plus either
    the dense-SwiGLU keys or (MoE artifacts) the router/expert keys."""
    keys = _ATTN_KEYS + (_MOE_KEYS if "router" in params
                         else _DENSE_MLP_KEYS)
    return {k: params[k] for k in keys}


def _attn_xs(xs):
    return tuple(xs[k] for k in _ATTN_KEYS)


def _moe_ffn(x, xs, mcfg: DecoderConfig, linear):
    """Serving-form MoE FFN: exact top-k combine over ALL experts.

    Unlike the training form's capacity-bounded GShard dispatch
    (parallel/moe.py::top_k_routing — a *training-throughput* device that
    drops overflow tokens), inference computes every expert on every
    token and combines with the top-k router probabilities: at decode
    batch sizes the step is weight-bytes-bound, and all E expert payloads
    stream from HBM either way, so the extra FLOPs are free while the
    gather/scatter bookkeeping is not.  Expert payloads reuse the exact
    per-format ``linear`` (fp8/int8/int4-grouped/bf16) vmapped over the
    expert axis.  x: (..., Dm) bf16 → (..., Dm)."""
    shp = x.shape
    xt = x.reshape(-1, shp[-1])                               # (T, Dm)
    logits = xt.astype(jnp.float32) @ xs["router"].astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                   # (T, E)
    E = probs.shape[-1]
    gv, gi = jax.lax.top_k(probs, min(mcfg.moe_top_k, E))     # (T, k)
    # raw (un-renormalized) top-k gates — matches top_k_routing's combine
    gates = jnp.sum(jax.nn.one_hot(gi, E, dtype=jnp.float32)
                    * gv[..., None], axis=1)                  # (T, E)
    he = jax.vmap(lambda w, s: linear(xt, w, s))(
        xs["eup8"], xs["eups"])                               # (E, T, F)
    he = jax.nn.gelu(he.astype(jnp.float32)).astype(xt.dtype)
    ye = jax.vmap(lambda a, w, s: linear(a, w, s))(
        he, xs["edown8"], xs["edowns"])                       # (E, T, Dm)
    y = jnp.einsum("etd,te->td", ye.astype(jnp.float32), gates)
    return y.reshape(shp).astype(x.dtype)


def _ffn_block(h, xs, mcfg: DecoderConfig, linear):
    """Post-attention FFN with residual: dense SwiGLU, or MoE when the
    layer carries router/expert payloads."""
    x = _rms(h, xs["mlp_norm"], mcfg.norm_eps)
    if "router" in xs:
        return h + _moe_ffn(x, xs, mcfg, linear)
    act = jax.nn.silu(linear(x, xs["gate8"], xs["gates"]).astype(
        jnp.float32)).astype(x.dtype) * linear(x, xs["up8"], xs["ups"])
    return h + linear(act, xs["down8"], xs["downs"])


def _attend_ring(q, kq8, kqs, vq8, vqs, k8, ks, v8, vs, head, lens,
                 cfg: DecoderConfig,
                 sk8=None, sks=None, sv8=None, svs=None, w=None,
                 valid_mask=None):
    """Flash-style decode attention: ring-cached prefix + fresh token.

    q: (B,H,D) bf16 (the 1/sqrt(D) factor is applied here);
    fresh kq8/vq8: (B,KV,D) with scales kqs/vqs (B,KV);
    ring k8/v8: (S, B*KV, D) with scales ks/vs (S, B*KV);
    head: () int32 next write row; lens: (B,) valid RING lengths.
    Optional side buffer sk8/sv8 (W, B*KV, D) with scales (W, B*KV),
    rows j < ``w`` valid: the last ``w`` decoded tokens not yet flushed
    to the ring (ServeConfig.ring_flush) — re-read and re-scored every
    step, which is exact (per-token K/V are query-independent).
    Unnormalized partials for all parts are combined and divided ONCE
    on the (B,KV,G,D) context.
    """
    B, H, D = q.shape
    S, BK, _ = k8.shape
    KV = kq8.shape[1]
    G = H // KV
    qg = (q.astype(jnp.float32)
          / jnp.sqrt(D).astype(jnp.float32)).astype(q.dtype)
    qf = qg.reshape(BK, G, D)

    scores = jnp.einsum(
        "xgd,sxd->xgs", qf, k8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(B, KV, G, S) * ks.T.reshape(B, KV, 1, S)
    if valid_mask is None:
        # Ring validity: row s holds a token (head - 1 - s) mod S
        # steps old.
        age = jnp.mod(head - 1 - jnp.arange(S), S)          # (S,)
        mask = age[None, :] < lens[:, None]                 # (B, S)
    else:
        # caller-supplied validity (the paged ring-view path: rows are
        # logically ordered, row s valid iff s < lens[b])
        mask = valid_mask
    scores = jnp.where(mask[:, None, None, :], scores, _NEG)

    score_self = jnp.einsum(
        "bkgd,bkd->bkg", qg.reshape(B, KV, G, D), kq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * kqs[:, :, None]                                     # (B,KV,G)

    if sk8 is not None:
        W = sk8.shape[0]
        sscores = jnp.einsum(
            "xgd,sxd->xgs", qf, sk8.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, KV, G, W) * sks.T.reshape(B, KV, 1, W)
        sscores = jnp.where((jnp.arange(W) < w)[None, None, None],
                            sscores, _NEG)
        m = jnp.maximum(jnp.maximum(jnp.max(scores, axis=-1),
                                    jnp.max(sscores, axis=-1)), score_self)
    else:
        m = jnp.maximum(jnp.max(scores, axis=-1), score_self)

    pc = jnp.exp(scores - m[..., None])
    ps = jnp.exp(score_self - m)
    l = pc.sum(-1) + ps

    pcs = (pc * vs.T.reshape(B, KV, 1, S)).astype(q.dtype)
    ctx = jnp.einsum(
        "xgs,sxd->xgd", pcs.reshape(BK, G, S), v8.astype(q.dtype),
        preferred_element_type=jnp.float32).reshape(B, KV, G, D)
    ctx = ctx + ((ps * vqs[:, :, None])[..., None]
                 * vq8.astype(jnp.float32)[:, :, None, :])

    if sk8 is not None:
        spc = jnp.exp(sscores - m[..., None])
        l = l + spc.sum(-1)
        spcs = (spc * svs.T.reshape(B, KV, 1, W)).astype(q.dtype)
        sctx = jnp.einsum(
            "xgs,sxd->xgd", spcs.reshape(BK, G, W), sv8.astype(q.dtype),
            preferred_element_type=jnp.float32).reshape(B, KV, G, D)
        ctx = ctx + sctx

    ctx = ctx / l[..., None]
    return ctx.reshape(B, H * D).astype(q.dtype)


_CANDIDATES = 64     # top-k/top-p candidate pool (k is clamped to this)


def _chosen_logprob(logits: jax.Array, chosen: jax.Array) -> jax.Array:
    """log P(chosen) under the UNSCALED model distribution: (B, V) f32
    logits + (B,) tokens → (B,) f32.  One extra logsumexp per step —
    noise next to the weight-stream cost."""
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    return (jnp.take_along_axis(logits, chosen[:, None].astype(jnp.int32),
                                axis=-1)[:, 0] - lse)


def sample_tokens(logits: jax.Array, key: jax.Array,
                  temperature: jax.Array, top_k=None,
                  top_p=None, greedy_only: bool = False) -> jax.Array:
    """On-device per-slot sampling: temperature (0 → greedy), optional
    top-k (0 disables) and nucleus top-p (>= 1 disables) filtering over
    a ``_CANDIDATES``-wide pool (one lax.top_k over the vocab instead of
    a full sort — the standard serving-cost trade).

    Filtering is strictly per-slot: a slot with both filters disabled
    draws from the FULL vocabulary even when co-batched with filtered
    slots (its distribution must not depend on batch-mates)."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        # Static all-greedy hint (the engine knows no live slot samples;
        # bench decode is greedy): skips the gumbel draw + categorical
        # reduction over (B, V) that `where(temperature > 0, ...)`
        # cannot DCE with a traced temperature — part of the fixed
        # per-step tail the MEGAKERNEL study measured at ~1 ms.
        return greedy
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    full = jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)
    if top_k is None and top_p is None:
        return jnp.where(temperature > 0, full, greedy)
    C = min(_CANDIDATES, logits.shape[-1])
    vals, idx = jax.lax.top_k(scaled, C)                     # (B, C)
    k_off = jnp.ones(scaled.shape[:1], bool)
    p_off = jnp.ones(scaled.shape[:1], bool)
    if top_k is not None:
        k_off = top_k <= 0
        k = jnp.where(k_off | (top_k > C), C, top_k)
        vals = jnp.where(jnp.arange(C)[None] < k[:, None], vals, _NEG)
    if top_p is not None:
        p_off = top_p >= 1
        p = jnp.where((top_p <= 0) | p_off, 1.0, top_p)
        probs = jax.nn.softmax(vals, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        # keep a token while the mass BEFORE it is < p (the argmax token
        # always survives)
        vals = jnp.where((csum - probs) < p[:, None], vals, _NEG)
    choice = jax.random.categorical(key, vals, axis=-1)
    pooled = jnp.take_along_axis(idx, choice[:, None],
                                 axis=1)[:, 0].astype(jnp.int32)
    sampled = jnp.where(k_off & p_off, full, pooled)
    return jnp.where(temperature > 0, sampled, greedy)


def _steps_impl(params: Dict, ring: RingKVCache, tokens: jax.Array,
                positions: jax.Array, key: jax.Array,
                temperature: jax.Array, n_steps: int, cfg: ServeConfig,
                want_logits: bool, top_k=None, top_p=None,
                greedy_only: bool = False):
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    B = tokens.shape[0]
    S = ring.max_seq
    BK = B * KV
    linear = _make_linear(cfg)
    use_pallas = _use_pallas_store(cfg)
    inv_freq = rope_freqs(mcfg)

    def one(carry, step_key):
        toks, pos, kv8, sc, head = carry
        h = _embed_lookup(params, toks)

        ang = pos[:, None].astype(jnp.float32) * inv_freq
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rope1(x):
            x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
            c, s = cos[:, None], sin[:, None]
            return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                                   axis=-1).astype(x.dtype)

        lens = jnp.minimum(pos, S)

        def layer_step(lcarry, xs):
            h, li = lcarry
            attn_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw = _attn_xs(xs)

            x = _rms(h, attn_norm, mcfg.norm_eps)
            q = linear(x, q8, qs).reshape(B, H, D)
            k = linear(x, k8w, ksw).reshape(B, KV, D)
            v = linear(x, v8w, vsw).reshape(B, KV, D)
            q, k = rope1(q), rope1(k)

            kq8, kqs = quantize_kv(k, cfg.kv_fmt)
            vq8, vqs = quantize_kv(v, cfg.kv_fmt)

            ctx = _attend_ring(q, kq8, kqs[..., 0], vq8, vqs[..., 0],
                               kv8[:, 0, li], sc[:, 0, li],
                               kv8[:, 1, li], sc[:, 1, li], head, lens,
                               mcfg)
            h = h + linear(ctx, o8, osw)
            h = _ffn_block(h, xs, mcfg, linear)
            return (h, li + 1), (kq8.reshape(BK, D), kqs.reshape(BK),
                                 vq8.reshape(BK, D), vqs.reshape(BK))

        (h, _), (fk8, fks, fv8, fvs) = jax.lax.scan(
            layer_step, (h, jnp.int32(0)), _layer_xs(params))

        # Contiguous slab stores at the ring head (k and v written
        # directly — stacking them first costs a relayout copy).
        if use_pallas:
            kv8 = dyn_store(kv8, jnp.stack([fk8, fv8]), head,
                            use_pallas=True)
            sc = dyn_store(sc, jnp.stack([fks, fvs]), head,
                           use_pallas=True)
        else:
            z = jnp.zeros((), jnp.int32)
            kv8 = jax.lax.dynamic_update_slice(
                kv8, fk8[None, None].astype(kv8.dtype), (head, z, z, z, z))
            kv8 = jax.lax.dynamic_update_slice(
                kv8, fv8[None, None].astype(kv8.dtype),
                (head, jnp.int32(1), z, z, z))
            sc = jax.lax.dynamic_update_slice(
                sc, fks[None, None], (head, z, z, z))
            sc = jax.lax.dynamic_update_slice(
                sc, fvs[None, None], (head, jnp.int32(1), z, z))
        head = jnp.mod(head + 1, S)

        h = _rms(h, params["final_norm"], mcfg.norm_eps)
        logits = _lm_head(params, h)
        nxt = sample_tokens(logits, step_key, temperature, top_k, top_p,
                            greedy_only)
        out = logits if want_logits else (nxt, _chosen_logprob(logits, nxt))
        return (nxt, pos + 1, kv8, sc, head), out

    W = cfg.ring_flush
    if W and W > 1 and n_steps > 1:
        # Alignment contract: the head only ever advances by W (ring
        # starts at 0), so every flush slab fits without wrapping.
        # Chunks must therefore be multiples of W (the engine rounds its
        # pow2 chunks up to >= W when ring_flush is set).
        if n_steps % W != 0:
            raise ValueError(
                f"ring_flush={W} needs decode chunks divisible by it "
                f"(got n_steps={n_steps})")
        if S % W != 0:
            raise ValueError(f"ring_flush={W} needs max_seq % W == 0 "
                             f"(got {S})")
        return _steps_impl_sideflush(
            params, ring, tokens, positions, key, temperature, n_steps,
            cfg, want_logits, top_k, top_p, W, greedy_only)

    keys = jax.random.split(key, n_steps)
    (ftoks, fpos, kv8, sc, head), outs = jax.lax.scan(
        one, (tokens, positions, ring.kv8, ring.sc, ring.head), keys)
    return outs, RingKVCache(kv8, sc, head), ftoks, fpos


def _steps_impl_sideflush(params: Dict, ring: RingKVCache,
                          tokens: jax.Array, positions: jax.Array,
                          key: jax.Array, temperature: jax.Array,
                          n_steps: int, cfg: ServeConfig,
                          want_logits: bool, top_k, top_p, W: int,
                          greedy_only: bool = False):
    """Decode with batched ring writes (ServeConfig.ring_flush = W > 1).

    Nested scans: the inner scan runs W steps collecting each step's
    fresh k/v in a small (W, 2, L, BK, D) side buffer (attended via the
    side part of :func:`_attend_ring` — re-scored against every new
    query, exact); the outer scan flushes the side buffer into the ring
    as ONE W-row slab store and advances the head by W.  A per-step
    1-row DUS makes XLA read-modify-write every tile containing the row
    (~ring_bytes/16 per step, S being packed in the sublane tile);
    flushing W aligned rows touches each tile once.  Requires a W-aligned
    head: the ring starts at head 0 and only ever advances by W.
    """
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    B = tokens.shape[0]
    S = ring.max_seq
    BK = B * KV
    L = mcfg.n_layers
    linear = _make_linear(cfg)
    inv_freq = rope_freqs(mcfg)

    def outer(carry, keys_w):
        toks, pos, kv8, sc, head = carry

        def inner(icarry, step_in):
            w, step_key = step_in
            toks, pos, side8, ssc = icarry
            h = _embed_lookup(params, toks)

            ang = pos[:, None].astype(jnp.float32) * inv_freq
            cos, sin = jnp.cos(ang), jnp.sin(ang)

            def rope1(x):
                x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
                c, s = cos[:, None], sin[:, None]
                return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                                       axis=-1).astype(x.dtype)

            # ring holds pos - w tokens; the side buffer holds w
            lens = jnp.clip(pos - w, 0, S)

            def layer_step(lcarry, xs):
                h, li = lcarry
                (attn_norm, q8, qs, k8w, ksw, v8w, vsw, o8,
                 osw) = _attn_xs(xs)

                x = _rms(h, attn_norm, mcfg.norm_eps)
                q = linear(x, q8, qs).reshape(B, H, D)
                k = linear(x, k8w, ksw).reshape(B, KV, D)
                v = linear(x, v8w, vsw).reshape(B, KV, D)
                q, k = rope1(q), rope1(k)

                kq8, kqs = quantize_kv(k, cfg.kv_fmt)
                vq8, vqs = quantize_kv(v, cfg.kv_fmt)

                ctx = _attend_ring(
                    q, kq8, kqs[..., 0], vq8, vqs[..., 0],
                    kv8[:, 0, li], sc[:, 0, li],
                    kv8[:, 1, li], sc[:, 1, li], head, lens, mcfg,
                    sk8=side8[:, 0, li], sks=ssc[:, 0, li],
                    sv8=side8[:, 1, li], svs=ssc[:, 1, li], w=w)
                h = h + linear(ctx, o8, osw)
                h = _ffn_block(h, xs, mcfg, linear)
                return (h, li + 1), (kq8.reshape(BK, D), kqs.reshape(BK),
                                     vq8.reshape(BK, D), vqs.reshape(BK))

            (h, _), (fk8, fks, fv8, fvs) = jax.lax.scan(
                layer_step, (h, jnp.int32(0)), _layer_xs(params))

            z = jnp.zeros((), jnp.int32)
            side8 = jax.lax.dynamic_update_slice(
                side8, fk8[None, None].astype(side8.dtype),
                (w, z, z, z, z))
            side8 = jax.lax.dynamic_update_slice(
                side8, fv8[None, None].astype(side8.dtype),
                (w, jnp.int32(1), z, z, z))
            ssc = jax.lax.dynamic_update_slice(
                ssc, fks[None, None], (w, z, z, z))
            ssc = jax.lax.dynamic_update_slice(
                ssc, fvs[None, None], (w, jnp.int32(1), z, z))

            h = _rms(h, params["final_norm"], mcfg.norm_eps)
            logits = _lm_head(params, h)
            nxt = sample_tokens(logits, step_key, temperature,
                                top_k, top_p, greedy_only)
            out = logits if want_logits else (nxt,
                                              _chosen_logprob(logits, nxt))
            return (nxt, pos + 1, side8, ssc), out

        side8 = jnp.zeros((W, 2, L, BK, D), ring.kv8.dtype)
        ssc = jnp.ones((W, 2, L, BK), jnp.float32)
        (toks, pos, side8, ssc), outs = jax.lax.scan(
            inner, (toks, pos, side8, ssc),
            (jnp.arange(W, dtype=jnp.int32), keys_w))
        # one aligned W-row slab flush
        z = jnp.zeros((), jnp.int32)
        kv8 = jax.lax.dynamic_update_slice(kv8, side8.astype(kv8.dtype),
                                           (head, z, z, z, z))
        sc = jax.lax.dynamic_update_slice(sc, ssc, (head, z, z, z))
        head = jnp.mod(head + W, S)
        return (toks, pos, kv8, sc, head), outs

    keys = jax.random.split(key, n_steps).reshape(n_steps // W, W)
    (ftoks, fpos, kv8, sc, head), outs = jax.lax.scan(
        outer, (tokens, positions, ring.kv8, ring.sc, ring.head), keys)
    # flatten the (n_chunks, W, ...) leading dims (outs may be a
    # (tokens, logprobs) tuple)
    outs = jax.tree_util.tree_map(
        lambda o: o.reshape((n_steps,) + o.shape[2:]), outs)
    return outs, RingKVCache(kv8, sc, head), ftoks, fpos


@partial(jax.jit, static_argnames=("cfg", "n_steps", "greedy_only"),
         donate_argnames=("ring",))
def decode_steps(params: Dict, ring: RingKVCache, tokens: jax.Array,
                 positions: jax.Array, key: jax.Array,
                 temperature: jax.Array, n_steps: int, cfg: ServeConfig,
                 top_k=None, top_p=None, greedy_only: bool = False
                 ) -> Tuple[jax.Array, RingKVCache]:
    """``n_steps`` decode steps with on-device sampling in ONE compiled
    program — amortizes dispatch; the host re-enters only for admission /
    retirement between chunks.  temperature: (B,) f32, 0 → greedy.
    The input ring is DONATED.  Optional per-slot ``top_k`` (B,) int32
    (0 disables) and nucleus ``top_p`` (B,) f32 (>=1 disables) filter the
    sampled distribution on device.  Returns (sampled tokens
    (B, n_steps), ring)."""
    (toks, _), ring, _, _ = _steps_impl(params, ring, tokens, positions,
                                        key, temperature, n_steps, cfg,
                                        want_logits=False,
                                        top_k=top_k, top_p=top_p,
                                        greedy_only=greedy_only)
    return toks.T, ring


@partial(jax.jit, static_argnames=("cfg", "n_steps", "greedy_only"),
         donate_argnames=("ring",))
def decode_chunk(params: Dict, ring: RingKVCache, tokens: jax.Array,
                 positions: jax.Array, key: jax.Array,
                 temperature: jax.Array, n_steps: int, cfg: ServeConfig,
                 top_k=None, top_p=None, greedy_only: bool = False):
    """:func:`decode_steps` plus per-token logprobs and the final device
    carry: returns (tokens (B, n_steps), logprobs (B, n_steps) f32,
    ring, last_tokens (B,), positions (B,)).

    The engine chains chunks through the returned device carry so a
    dispatch never needs a host readback of the previous chunk (the
    readback happens lazily, pipeline-deep behind the dispatch chain)."""
    (toks, lps), ring, ftoks, fpos = _steps_impl(
        params, ring, tokens, positions, key, temperature, n_steps, cfg,
        want_logits=False, top_k=top_k, top_p=top_p,
        greedy_only=greedy_only)
    return toks.T, lps.T, ring, ftoks, fpos


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("ring",))
def decode_step(params: Dict, ring: RingKVCache, tokens: jax.Array,
                positions: jax.Array, cfg: ServeConfig
                ) -> Tuple[jax.Array, RingKVCache]:
    """One decode step for all slots; returns (logits (B, V) f32, ring).
    Numerically identical to one step of :func:`decode_steps` (shared
    implementation)."""
    logits, ring, _, _ = _steps_impl(
        params, ring, tokens, positions, jax.random.key(0),
        jnp.zeros(tokens.shape, jnp.float32), 1, cfg, want_logits=True)
    return logits[0], ring


def _dense_forward(params, toks: jax.Array, cfg: "ServeConfig"):
    """Dense causal forward over (N, Sp) right-padded prompts — the shared
    prefill body (single-slot, batched-admission, ring and paged variants
    all route here).  Returns (h (N, Sp, Dm) bf16 pre-final-norm,
    pk8 (L, N, Sp, KV, D), pks (L, N, Sp, KV), pv8, pvs)."""
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    N, Sp = toks.shape
    linear = _make_linear(cfg)

    h = _embed_lookup(params, toks)                       # (N, Sp, Dm)
    inv_freq = rope_freqs(mcfg)
    pos = jnp.arange(Sp)
    ang = pos[:, None].astype(jnp.float32) * inv_freq
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope1(x):  # (N, Sp, n, D)
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        c, s = cos[None, :, None], sin[None, :, None]
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                               axis=-1).astype(x.dtype)

    causal = pos[None, :] <= pos[:, None]                 # (Sp, Sp)

    def layer_step(carry, xs):
        h, li = carry
        attn_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw = _attn_xs(xs)

        x = _rms(h, attn_norm, mcfg.norm_eps)
        q = linear(x, q8, qs).reshape(N, Sp, H, D)
        k = linear(x, k8w, ksw).reshape(N, Sp, KV, D)
        v = linear(x, v8w, vsw).reshape(N, Sp, KV, D)
        q, k = rope1(q), rope1(k)

        kq8, kqs = quantize_kv(k, cfg.kv_fmt)
        vq8, vqs = quantize_kv(v, cfg.kv_fmt)

        # Dense causal attention on the fresh (bf16) K/V — prefill is
        # compute-bound; the cache writes happen in the caller.
        G = H // KV
        qg = q.reshape(N, Sp, KV, G, D)
        scores = jnp.einsum("nskgd,ntkd->nskgt", qg.astype(jnp.float32),
                            k.astype(jnp.float32)) / jnp.sqrt(D)
        scores = jnp.where(causal[None, :, None, None, :], scores, _NEG)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("nskgt,ntkd->nskgd", probs, v.astype(jnp.float32))
        ctx = ctx.reshape(N, Sp, H * D).astype(jnp.bfloat16)
        h = h + linear(ctx, o8, osw)
        h = _ffn_block(h, xs, mcfg, linear)
        return (h, li + 1), (kq8, kqs[..., 0], vq8, vqs[..., 0])

    h = h.astype(jnp.bfloat16)
    (h, _), (pk8, pks, pv8, pvs) = jax.lax.scan(
        layer_step, (h, jnp.int32(0)), _layer_xs(params))
    return h, pk8, pks, pv8, pvs


def _ring_write_prompts(ring: RingKVCache, pk8, pks, pv8, pvs,
                        slots: jax.Array, lengths: jax.Array
                        ) -> RingKVCache:
    """Scatter N prompts' quantized k/v into the ring — one batched
    scatter for all slots.  Prompt n's token i lands at row
    ``(head - lengths[n] + i) mod S`` in slot n's column block; padding
    rows (i >= length) and padding slots (slot >= n_slots) DROP via
    out-of-range indices."""
    L, N, Sp, KV, D = pk8.shape
    S = ring.max_seq
    BK = ring.kv8.shape[3]
    rows = jnp.mod(ring.head - lengths[:, None] + jnp.arange(Sp)[None], S)
    valid = jnp.arange(Sp)[None] < lengths[:, None]       # (N, Sp)
    rows = jnp.where(valid, rows, S)                      # S → dropped
    cols = slots[:, None] * KV + jnp.arange(KV)[None]     # (N, KV)
    cols = jnp.where(slots[:, None] * KV < BK, cols, BK)  # pad slot drops
    r3 = rows[:, :, None]                                 # (N, Sp, 1)
    c3 = cols[:, None, :]                                 # (N, 1, KV)
    # advanced-index batch dims lead: values are (N, Sp, KV, 2, L, D)
    vals8 = jnp.stack([pk8, pv8]).transpose(2, 3, 4, 0, 1, 5)
    valss = jnp.stack([pks, pvs]).transpose(2, 3, 4, 0, 1)
    kv8 = ring.kv8.at[r3, :, :, c3, :].set(
        vals8.astype(ring.kv8.dtype), mode="drop")
    sc = ring.sc.at[r3, :, :, c3].set(valss, mode="drop")
    return RingKVCache(kv8, sc, ring.head)


def _first_token_logits(params, h, lengths, mcfg):
    """Logits at each prompt's last valid token: h (N, Sp, Dm) → (N, V)."""
    idx = jnp.clip(lengths - 1, 0, h.shape[1] - 1)
    h_last = h[jnp.arange(h.shape[0]), idx]
    h_last = _rms(h_last, params["final_norm"], mcfg.norm_eps)
    return _lm_head(params, h_last)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("ring",))
def prefill(params: Dict, ring: RingKVCache, tokens: jax.Array,
            slot: jax.Array, length: jax.Array, cfg: ServeConfig
            ) -> Tuple[jax.Array, RingKVCache]:
    """Prefill one slot with a right-padded (S_p,) prompt of true length
    ``length``; returns (logits at the last valid token, ring).

    The prompt's k/v land at ring rows ``(head - length + i) mod S`` so
    the slot's context is exactly its last ``length`` rows (padding rows
    drop).  Thin N=1 wrapper over the batched admission path."""
    h, pk8, pks, pv8, pvs = _dense_forward(params, tokens[None], cfg)
    slots = jnp.reshape(slot, (1,)).astype(jnp.int32)
    lengths = jnp.reshape(length, (1,)).astype(jnp.int32)
    ring = _ring_write_prompts(ring, pk8, pks, pv8, pvs, slots, lengths)
    logits = _first_token_logits(params, h, lengths, cfg.model)
    return logits[0], ring


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("ring", "tokens", "positions"))
def prefill_batch(params: Dict, ring: RingKVCache, prompts: jax.Array,
                  slots: jax.Array, lengths: jax.Array, key: jax.Array,
                  temperature: jax.Array, top_k, top_p,
                  tokens: jax.Array, positions: jax.Array,
                  cfg: ServeConfig):
    """Admit N requests in ONE dispatch: dense-causal prefill of (N, Sp)
    right-padded prompts, ring writes for all N slots, per-request
    first-token sampling, and patching of the engine's device
    token/position carry.  Rows with slots[n] >= n_slots (padding of the
    N bucket) write nothing and patch nothing.

    Returns (first_tokens (N,), ring, tokens (B,), positions (B,))."""
    h, pk8, pks, pv8, pvs = _dense_forward(params, prompts, cfg)
    ring = _ring_write_prompts(ring, pk8, pks, pv8, pvs, slots, lengths)
    logits = _first_token_logits(params, h, lengths, cfg.model)
    first = sample_tokens(logits, key, temperature, top_k, top_p)
    tokens = tokens.at[slots].set(first, mode="drop")
    positions = positions.at[slots].set(lengths, mode="drop")
    return first, ring, tokens, positions


# ---------------------------------------------------------------------------
# Paged decode (long-context serving: context bounded by page pool, not ring)
# ---------------------------------------------------------------------------

def _attend_paged(q, kq8, kqs, vq8, vqs, kp8, kps, vp8, vps, lens,
                  page_size: int, cfg: DecoderConfig,
                  sk8=None, sks=None, sv8=None, svs=None, w=None):
    """Decode attention over a (chunk-frozen) page snapshot, the chunk's
    own tokens in a small side buffer, and the fresh token.

    q: (B,H,D); fresh kq8/vq8 (B,KV,D) with scales (B,KV);
    snapshot kp8/vp8: (B, MP, page*KV, D) with scales (B, MP, page*KV);
    lens: (B,) tokens in the snapshot (positions < lens are valid —
    pages are logically ordered, no ring aging);
    side sk8/sv8: (W, B*KV, D) chunk-token payloads with scales (W, B*KV),
    rows j < ``w`` valid.  The side buffer is re-READ every step because
    every step has a new query — unlike softmax partials, per-token K/V
    are query-independent, so this is exact.
    """
    B, H, D = q.shape
    KV = kq8.shape[1]
    G = H // KV
    MP = kp8.shape[1]
    S = MP * page_size
    BK = B * KV
    qg = (q.astype(jnp.float32)
          / jnp.sqrt(D).astype(jnp.float32)).astype(q.dtype)
    qh = qg.reshape(B, KV, G, D)

    kp = kp8.reshape(B, MP, page_size, KV, D)
    vp = vp8.reshape(B, MP, page_size, KV, D)
    kss = kps.reshape(B, MP, page_size, KV).transpose(0, 3, 1, 2)
    vss = vps.reshape(B, MP, page_size, KV).transpose(0, 3, 1, 2)

    scores = jnp.einsum(
        "bkgd,bmpkd->bkgmp", qh, kp.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * kss[:, :, None]                                  # (B,KV,G,MP,page)
    posidx = (jnp.arange(MP)[:, None] * page_size
              + jnp.arange(page_size)[None, :])          # (MP, page)
    mask = posidx[None] < lens[:, None, None]            # (B, MP, page)
    scores = jnp.where(mask[:, None, None], scores, _NEG)
    scores = scores.reshape(B, KV, G, S)

    score_self = jnp.einsum(
        "bkgd,bkd->bkg", qh, kq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * kqs[:, :, None]

    if sk8 is not None:
        W = sk8.shape[0]
        qf = qh.reshape(BK, G, D)
        sscores = jnp.einsum(
            "xgd,sxd->xgs", qf, sk8.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, KV, G, W) * sks.T.reshape(B, KV, 1, W)
        sscores = jnp.where((jnp.arange(W) < w)[None, None, None],
                            sscores, _NEG)
        m = jnp.maximum(jnp.maximum(jnp.max(scores, axis=-1),
                                    jnp.max(sscores, axis=-1)), score_self)
    else:
        m = jnp.maximum(jnp.max(scores, axis=-1), score_self)

    pc = jnp.exp(scores - m[..., None])
    ps = jnp.exp(score_self - m)
    l = pc.sum(-1) + ps

    pcs = (pc.reshape(B, KV, G, MP, page_size)
           * vss[:, :, None]).astype(q.dtype)
    ctx = jnp.einsum(
        "bkgmp,bmpkd->bkgd", pcs, vp.astype(q.dtype),
        preferred_element_type=jnp.float32)
    ctx = ctx + ((ps * vqs[:, :, None])[..., None]
                 * vq8.astype(jnp.float32)[:, :, None, :])

    if sk8 is not None:
        spc = jnp.exp(sscores - m[..., None])
        l = l + spc.sum(-1)
        spcs = (spc * svs.T.reshape(B, KV, 1, W)).astype(q.dtype)
        sctx = jnp.einsum(
            "xgs,sxd->xgd", spcs.reshape(BK, G, W), sv8.astype(q.dtype),
            preferred_element_type=jnp.float32).reshape(B, KV, G, D)
        ctx = ctx + sctx

    ctx = ctx / l[..., None]
    return ctx.reshape(B, H * D).astype(q.dtype)


def _attend_paged_kernel(q, kq8, kqs, vq8, vqs, paged: PagedKVCache,
                         li, lens, cfg: DecoderConfig,
                         sk8=None, sks=None, sv8=None, svs=None, w=None):
    """Decode attention with the Pallas page-walk kernel for the pooled
    prefix (kernels/paged_attention.py — no snapshot is ever
    materialized; pages stream HBM→VMEM inside the kernel) plus the
    fresh token and the chunk's side buffer computed here.  The three
    parts produce unnormalized flash partials over DISJOINT key sets, so
    merging them (rescale by exp(m_part - m_tot), then one divide) is
    exact."""
    from fp8tpu.kernels.paged_attention import paged_decode_attention

    B, H, D = q.shape
    KV = kq8.shape[1]
    G = H // KV
    BK = B * KV
    qg = (q.astype(jnp.float32)
          / jnp.sqrt(D).astype(jnp.float32)).astype(q.dtype)
    qh = qg.reshape(B, KV, G, D)

    # pooled prefix: (B, KVG=KV*G, D) query order must match the
    # kernel's (kv-major head index h = kv*G + g) — qh reshape does.
    acc_p, m_p, l_p = paged_decode_attention(
        qh.reshape(B, KV * G, D), paged.pool, paged.sc, paged.page_table,
        lens, jnp.reshape(li, (1,)), page_size=paged.page_size,
        kv_heads=KV, interpret=jax.default_backend() != "tpu")
    acc_p = acc_p.reshape(B, KV, G, D)
    m_p = m_p.reshape(B, KV, G)
    l_p = l_p.reshape(B, KV, G)

    score_self = jnp.einsum(
        "bkgd,bkd->bkg", qh, kq8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * kqs[:, :, None]                                  # (B,KV,G)

    if sk8 is not None:
        W = sk8.shape[0]
        qf = qh.reshape(BK, G, D)
        sscores = jnp.einsum(
            "xgd,sxd->xgs", qf, sk8.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ).reshape(B, KV, G, W) * sks.T.reshape(B, KV, 1, W)
        sscores = jnp.where((jnp.arange(W) < w)[None, None, None],
                            sscores, _NEG)
        m = jnp.maximum(jnp.maximum(m_p, jnp.max(sscores, axis=-1)),
                        score_self)
    else:
        m = jnp.maximum(m_p, score_self)

    corr = jnp.exp(m_p - m)                              # (B,KV,G)
    ps = jnp.exp(score_self - m)
    l = l_p * corr + ps
    ctx = acc_p * corr[..., None]
    ctx = ctx + ((ps * vqs[:, :, None])[..., None]
                 * vq8.astype(jnp.float32)[:, :, None, :])

    if sk8 is not None:
        spc = jnp.exp(sscores - m[..., None])
        l = l + spc.sum(-1)
        spcs = (spc * svs.T.reshape(B, KV, 1, W)).astype(q.dtype)
        sctx = jnp.einsum(
            "xgs,sxd->xgd", spcs.reshape(BK, G, W), sv8.astype(q.dtype),
            preferred_element_type=jnp.float32).reshape(B, KV, G, D)
        ctx = ctx + sctx

    ctx = ctx / l[..., None]
    return ctx.reshape(B, H * D).astype(q.dtype)


def _steps_impl_paged(params: Dict, paged: PagedKVCache, tokens: jax.Array,
                      positions: jax.Array, key: jax.Array,
                      temperature: jax.Array, n_steps: int,
                      cfg: ServeConfig, want_logits: bool,
                      top_k=None, top_p=None, greedy_only: bool = False):
    """Chunked decode over the paged pool with a chunk-frozen snapshot.

    The mapped pages are gathered into a contiguous (B, MP, ...) view
    ONCE per chunk; each step attends over that snapshot plus a small
    side buffer holding the chunk\'s own fresh tokens (re-read and
    re-scored against each step\'s new query — exact, unlike carrying
    softmax partials across queries).  Fresh tokens are still scattered
    into the pool every step, so the pool is current for the next
    chunk\'s snapshot.  This amortizes the gather\'s full-KV
    re-materialization from every step to once per chunk (the cost that
    made the naive paged decode ~3.3x slower than the ring).
    """
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    B = tokens.shape[0]
    BK = B * KV
    L = mcfg.n_layers
    linear = _make_linear(cfg)
    inv_freq = rope_freqs(mcfg)
    page = paged.page_size
    W = n_steps
    scatter = cfg.paged_decode_impl == "scatter"
    # "kernel": the Pallas page-walk kernel reads the pool IN PLACE (no
    # snapshot gather at all); fresh tokens ride the side buffer.
    use_kernel = cfg.paged_decode_impl == "kernel"
    # "ringview": gather the chunk snapshot directly into the RING
    # layout (S', 2, L, B*KV, D) and run the literal ring attention
    # einsum with a position mask.  The r5 profile localized the whole
    # paged-vs-ring gap to one op: the per-layer slice of the
    # (B, MP, 2, L, R, D) snapshot does NOT fuse into the paged einsum
    # (constant_dynamic-slice_fusion, ~24 us x L x steps = 0.36 of the
    # 0.46 ms/step delta), while the identical slice of the ring layout
    # fuses into XLA's conv-lowered attention.  Same math, same bytes —
    # only the snapshot layout changes, once per chunk.
    ringview = cfg.paged_decode_impl == "ringview"
    # "side"/"ringview"/"kernel" DEFER the pool writes to one batched
    # scatter at chunk end: within the chunk every step's attention
    # covers the fresh tokens via the side buffer, so the pool only
    # needs to be current for the NEXT chunk — the per-step 4-way
    # scatter into the pool carry buys nothing inside the chunk.
    # "side-eager" keeps the r4 per-step write for A/B.
    defer_writes = cfg.paged_decode_impl in ("side", "kernel", "ringview")

    # chunk-frozen snapshot of the mapped pages.  In scatter mode fresh
    # tokens write INTO the snapshot each step (ring-style in-place
    # carry update), so attention is one pass with lens = pos and no
    # side buffer at all (VERDICT r3 weak #6: the side re-reads grew
    # with chunk length and cost the paged path 1.27x vs the ring);
    # side mode carries the (W, 2, L, BK, D) buffer of the chunk's own
    # tokens instead.  The two impls compile separately (static cfg),
    # each carrying only its own state.
    if use_kernel:
        kv_pages, sc_pages = None, None   # the kernel walks the pool
    elif ringview:
        kvp, scp = paged.gather()
        MP = kvp.shape[1]
        SV = MP * page
        # (B, MP, 2, L, page*KV, D) → (MP*page, 2, L, B*KV, D): one
        # fused gather+transpose per chunk (~2x snapshot bytes, /W per
        # step), after which every per-layer slice and einsum is
        # bitwise the ring code path.
        kv_pages = (kvp.reshape(B, MP, 2, L, page, KV, D)
                    .transpose(1, 4, 2, 3, 0, 5, 6)
                    .reshape(SV, 2, L, BK, D))
        sc_pages = (scp.reshape(B, MP, 2, L, page, KV)
                    .transpose(1, 4, 2, 3, 0, 5)
                    .reshape(SV, 2, L, BK))
    else:
        kv_pages, sc_pages = paged.gather()
    if scatter:
        side8 = None
        side_sc = None
    else:
        side8 = jnp.zeros((W, 2, L, BK, D), paged.pool.dtype)
        side_sc = jnp.ones((W, 2, L, BK), jnp.float32)

    def snap_write(kvp, scp, fk8, fks, fv8, fvs, pos):
        """Write one fresh (quantized) K/V row per slot into the
        snapshot at logical position ``pos``: (B, MP, 2, L, page*KV, D)
        gets a (2, L, KV, D) block at (pos//page, :, :, (pos%page)*KV)."""
        u8 = jnp.stack([fk8.reshape(L, BK, D), fv8.reshape(L, BK, D)]
                       ).reshape(2, L, B, KV, D).transpose(2, 0, 1, 3, 4)
        us = jnp.stack([fks.reshape(L, BK), fvs.reshape(L, BK)]
                       ).reshape(2, L, B, KV).transpose(2, 0, 1, 3)

        def upd(kvp_b, scp_b, u8_b, us_b, p):
            mp = p // page
            row = (p % page) * KV
            z = jnp.int32(0)
            kvp_b = jax.lax.dynamic_update_slice(
                kvp_b, u8_b[None].astype(kvp_b.dtype), (mp, z, z, row, z))
            scp_b = jax.lax.dynamic_update_slice(
                scp_b, us_b[None], (mp, z, z, row))
            return kvp_b, scp_b

        return jax.vmap(upd)(kvp, scp, u8, us, pos)

    def one(carry, step_in):
        w, step_key = step_in
        toks, pos, paged, side8, side_sc, kvp, scp = carry
        h = _embed_lookup(params, toks)

        ang = pos[:, None].astype(jnp.float32) * inv_freq
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rope1(x):
            x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
            c, s = cos[:, None], sin[:, None]
            return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                                   axis=-1).astype(x.dtype)

        if scatter:
            lens0 = jnp.minimum(pos, paged.max_seq)   # snapshot is live
        else:
            lens0 = jnp.minimum(pos - w, paged.max_seq)

        def layer_step(lcarry, xs):
            h, li = lcarry
            attn_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw = _attn_xs(xs)

            x = _rms(h, attn_norm, mcfg.norm_eps)
            q = linear(x, q8, qs).reshape(B, H, D)
            k = linear(x, k8w, ksw).reshape(B, KV, D)
            v = linear(x, v8w, vsw).reshape(B, KV, D)
            q, k = rope1(q), rope1(k)

            kq8, kqs = quantize_kv(k, cfg.kv_fmt)
            vq8, vqs = quantize_kv(v, cfg.kv_fmt)

            side = dict(sk8=side8[:, 0, li], sks=side_sc[:, 0, li],
                        sv8=side8[:, 1, li], svs=side_sc[:, 1, li],
                        w=w) if not scatter else {}
            if use_kernel:
                ctx = _attend_paged_kernel(
                    q, kq8, kqs[..., 0], vq8, vqs[..., 0],
                    paged, li, lens0, mcfg, **side)
            elif ringview:
                SV = kvp.shape[0]
                vmask = jnp.arange(SV)[None] < lens0[:, None]
                ctx = _attend_ring(
                    q, kq8, kqs[..., 0], vq8, vqs[..., 0],
                    kvp[:, 0, li], scp[:, 0, li],
                    kvp[:, 1, li], scp[:, 1, li],
                    jnp.int32(0), lens0, mcfg, valid_mask=vmask, **side)
            else:
                ctx = _attend_paged(
                    q, kq8, kqs[..., 0], vq8, vqs[..., 0],
                    kvp[:, :, 0, li], scp[:, :, 0, li],
                    kvp[:, :, 1, li], scp[:, :, 1, li],
                    lens0, page, mcfg, **side)
            h = h + linear(ctx, o8, osw)
            h = _ffn_block(h, xs, mcfg, linear)
            return (h, li + 1), (kq8, kqs[..., 0], vq8, vqs[..., 0])

        (h, _), (fk8, fks, fv8, fvs) = jax.lax.scan(
            layer_step, (h, jnp.int32(0)), _layer_xs(params))
        if not defer_writes:
            paged = paged.write_step(fk8, fks, fv8, fvs, pos)
        if scatter:
            kvp, scp = snap_write(kvp, scp, fk8, fks, fv8, fvs, pos)
        else:
            z = jnp.zeros((), jnp.int32)
            slab8 = jnp.stack([fk8.reshape(L, BK, D),
                               fv8.reshape(L, BK, D)])[None]
            slabs = jnp.stack([fks.reshape(L, BK),
                               fvs.reshape(L, BK)])[None]
            side8 = jax.lax.dynamic_update_slice(
                side8, slab8.astype(side8.dtype), (w, z, z, z, z))
            side_sc = jax.lax.dynamic_update_slice(side_sc, slabs,
                                                   (w, z, z, z))

        h = _rms(h, params["final_norm"], mcfg.norm_eps)
        logits = _lm_head(params, h)
        nxt = sample_tokens(logits, step_key, temperature, top_k, top_p,
                            greedy_only)
        out = logits if want_logits else (nxt, _chosen_logprob(logits, nxt))
        return (nxt, pos + 1, paged, side8, side_sc, kvp, scp), out

    keys = jax.random.split(key, n_steps)
    steps = jnp.arange(n_steps, dtype=jnp.int32)
    (ftoks, fpos, paged, side8, side_sc, _, _), outs = jax.lax.scan(
        one, (tokens, positions, paged, side8, side_sc, kv_pages,
              sc_pages), (steps, keys))
    if defer_writes:
        # One batched scatter of the whole chunk's fresh K/V (the side
        # buffer holds exactly the W steps' quantized rows): W*B indices
        # in one pass instead of W carry-threaded 4-way scatters.
        from .speculative import _paged_write_block
        blk8 = side8.reshape(W, 2, L, B, KV, D)
        blks = side_sc.reshape(W, 2, L, B, KV)
        valid = jnp.full((B,), W, jnp.int32)
        paged = _paged_write_block(
            paged,
            blk8[:, 0].transpose(1, 2, 0, 3, 4),   # (L, B, W, KV, D)
            blks[:, 0].transpose(1, 2, 0, 3),      # (L, B, W, KV)
            blk8[:, 1].transpose(1, 2, 0, 3, 4),
            blks[:, 1].transpose(1, 2, 0, 3),
            positions, valid)
    return outs, paged, ftoks, fpos


@partial(jax.jit, static_argnames=("cfg", "n_steps", "greedy_only"),
         donate_argnames=("paged",))
def decode_steps_paged(params: Dict, paged: PagedKVCache,
                       tokens: jax.Array, positions: jax.Array,
                       key: jax.Array, temperature: jax.Array,
                       n_steps: int, cfg: ServeConfig,
                       top_k=None, top_p=None, greedy_only: bool = False
                       ) -> Tuple[jax.Array, PagedKVCache]:
    """``n_steps`` decode steps over the paged KV pool (long-context
    twin of :func:`decode_steps`).  Returns (tokens (B, n_steps), pool)."""
    (toks, _), paged, _, _ = _steps_impl_paged(
        params, paged, tokens, positions, key, temperature, n_steps, cfg,
        want_logits=False, top_k=top_k, top_p=top_p,
        greedy_only=greedy_only)
    return toks.T, paged


@partial(jax.jit, static_argnames=("cfg", "n_steps", "greedy_only"),
         donate_argnames=("paged",))
def decode_chunk_paged(params: Dict, paged: PagedKVCache,
                       tokens: jax.Array, positions: jax.Array,
                       key: jax.Array, temperature: jax.Array,
                       n_steps: int, cfg: ServeConfig,
                       top_k=None, top_p=None, greedy_only: bool = False):
    """Paged twin of :func:`decode_chunk`: returns (tokens (B, n_steps),
    logprobs (B, n_steps), pool, last_tokens (B,), positions (B,))."""
    (toks, lps), paged, ftoks, fpos = _steps_impl_paged(
        params, paged, tokens, positions, key, temperature, n_steps, cfg,
        want_logits=False, top_k=top_k, top_p=top_p,
        greedy_only=greedy_only)
    return toks.T, lps.T, paged, ftoks, fpos


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("paged",))
def decode_step_paged(params: Dict, paged: PagedKVCache,
                      tokens: jax.Array, positions: jax.Array,
                      cfg: ServeConfig) -> Tuple[jax.Array, PagedKVCache]:
    """One paged decode step; returns (logits (B, V) f32, pool)."""
    logits, paged, _, _ = _steps_impl_paged(
        params, paged, tokens, positions, jax.random.key(0),
        jnp.zeros(tokens.shape, jnp.float32), 1, cfg, want_logits=True)
    return logits[0], paged


def _paged_write_prompts(paged: PagedKVCache, pk8, pks, pv8, pvs,
                         slots: jax.Array, lengths: jax.Array,
                         starts: Optional[jax.Array] = None
                         ) -> PagedKVCache:
    """Scatter N prompts' quantized k/v into the page pool.  Prompt n's
    token i lands in slot n's logical page ``i // page_size`` at offset
    ``i % page_size``; padding rows/slots and unmapped pages DROP.
    ``starts`` (N,) masks writes below it — positions already present in
    SHARED prefix pages must never be rewritten: a differently-shaped
    admission batch recomputes KV with different XLA accumulation order,
    and a 1-ulp payload flip would perturb other live holders."""
    L, N, Sp, KV, D = pk8.shape
    page = paged.page_size
    tpos = jnp.arange(Sp)
    lp = jnp.minimum(tpos // page, paged.max_pages - 1)   # (Sp,)
    sl = jnp.clip(slots, 0, paged.n_slots - 1)
    pg = paged.page_table[sl][:, lp]                      # (N, Sp)
    n_pages_total = paged.pool.shape[0]
    valid = ((tpos[None] < jnp.minimum(lengths[:, None], paged.max_seq))
             & (pg >= 0) & (slots[:, None] < paged.n_slots))
    if starts is not None:
        valid = valid & (tpos[None] >= starts[:, None])
    pg = jnp.where(valid, pg, n_pages_total)              # overruns drop
    rows = (tpos % page)[:, None] * KV + jnp.arange(KV)[None]   # (Sp, KV)
    pgi = pg[:, :, None]                                  # (N, Sp, 1)
    ri = rows[None]                                       # (1, Sp, KV)
    return _paged_scatter(paged, pgi, ri, pk8, pks, pv8, pvs)


def _paged_scatter(paged: PagedKVCache, pgi, ri, pk8, pks, pv8, pvs
                   ) -> PagedKVCache:
    """Shared page-pool scatter core: payloads (L, N, T, KV, D[, ·]) land
    at (page pgi (N, T, 1), row ri (N|1, T, KV)); out-of-range indices
    DROP.  Callers (_paged_write_prompts, speculative._paged_write_block)
    differ only in how they compute pgi/ri/validity."""
    uk8 = pk8.transpose(1, 2, 3, 0, 4)                    # (N, T, KV, L, D)
    uv8 = pv8.transpose(1, 2, 3, 0, 4)
    uks = pks.transpose(1, 2, 3, 0)
    uvs = pvs.transpose(1, 2, 3, 0)
    pool = paged.pool
    sc = paged.sc
    pool = pool.at[pgi, 0, :, ri, :].set(uk8.astype(pool.dtype),
                                         mode="drop")
    pool = pool.at[pgi, 1, :, ri, :].set(uv8.astype(pool.dtype),
                                         mode="drop")
    sc = sc.at[pgi, 0, :, ri].set(uks, mode="drop")
    sc = sc.at[pgi, 1, :, ri].set(uvs, mode="drop")
    return dataclasses.replace(paged, pool=pool, sc=sc)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("paged",))
def prefill_paged(params: Dict, paged: PagedKVCache, tokens: jax.Array,
                  slot: jax.Array, length: jax.Array, cfg: ServeConfig
                  ) -> Tuple[jax.Array, PagedKVCache]:
    """Prefill one slot's prompt into its mapped pages.

    Same dense causal forward as :func:`prefill`; token i lands in the
    slot's logical page ``i // page_size`` at offset ``i % page_size``.
    Padding rows (i >= length) are dropped (out-of-range scatter)."""
    h, pk8, pks, pv8, pvs = _dense_forward(params, tokens[None], cfg)
    slots = jnp.reshape(slot, (1,)).astype(jnp.int32)
    lengths = jnp.reshape(length, (1,)).astype(jnp.int32)
    paged = _paged_write_prompts(paged, pk8, pks, pv8, pvs, slots, lengths)
    logits = _first_token_logits(params, h, lengths, cfg.model)
    return logits[0], paged


@partial(jax.jit, static_argnames=("cfg",),
         donate_argnames=("paged", "tokens", "positions"))
def prefill_batch_paged(params: Dict, paged: PagedKVCache,
                        prompts: jax.Array, slots: jax.Array,
                        lengths: jax.Array, key: jax.Array,
                        temperature: jax.Array, top_k, top_p,
                        tokens: jax.Array, positions: jax.Array,
                        cfg: ServeConfig,
                        write_starts: Optional[jax.Array] = None):
    """Paged twin of :func:`prefill_batch` (batched admission in one
    dispatch).  ``write_starts`` (N,) skips cache writes below it (the
    positions covered by shared prefix pages).  Returns
    (first_tokens (N,), paged, tokens, positions)."""
    h, pk8, pks, pv8, pvs = _dense_forward(params, prompts, cfg)
    paged = _paged_write_prompts(paged, pk8, pks, pv8, pvs, slots, lengths,
                                 starts=write_starts)
    logits = _first_token_logits(params, h, lengths, cfg.model)
    first = sample_tokens(logits, key, temperature, top_k, top_p)
    tokens = tokens.at[slots].set(first, mode="drop")
    positions = positions.at[slots].set(lengths, mode="drop")
    return first, paged, tokens, positions


@partial(jax.jit, static_argnames=("cfg",))
def full_logits(params: Dict, tokens: jax.Array, cfg: ServeConfig
                ) -> jax.Array:
    """Teacher-forcing forward over the SERVING artifact: (S,) tokens →
    (S, V) f32 logits with dense causal attention (same math as
    :func:`prefill`, no cache writes).  Used by the accuracy gates to
    measure the real-quantized serving path's ΔPPL, not just the
    emulation path's."""
    mcfg = cfg.model
    H, KV, D = mcfg.n_heads, mcfg.n_kv_heads, mcfg.head_dim
    Sp = tokens.shape[0]
    linear = _make_linear(cfg)

    h = _embed_lookup(params, tokens)
    inv_freq = rope_freqs(mcfg)
    pos = jnp.arange(Sp)
    ang = pos[:, None].astype(jnp.float32) * inv_freq
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rope1(x):
        x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        c, s = cos[:, None], sin[:, None]
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                               axis=-1).astype(x.dtype)

    causal = pos[None, :] <= pos[:, None]

    def layer_step(carry, xs):
        h, li = carry
        attn_norm, q8, qs, k8w, ksw, v8w, vsw, o8, osw = _attn_xs(xs)

        x = _rms(h, attn_norm, mcfg.norm_eps)
        q = linear(x, q8, qs).reshape(Sp, H, D)
        k = linear(x, k8w, ksw).reshape(Sp, KV, D)
        v = linear(x, v8w, vsw).reshape(Sp, KV, D)
        q, k = rope1(q), rope1(k)

        # serving-faithful: attention consumes the fp8-quantized K/V the
        # decode cache would hold
        kq8, kqs = quantize_kv(k, cfg.kv_fmt)
        vq8, vqs = quantize_kv(v, cfg.kv_fmt)
        kd = kq8.astype(jnp.float32) * kqs
        vd = vq8.astype(jnp.float32) * vqs

        G = H // KV
        qg = q.reshape(Sp, KV, G, D)
        scores = jnp.einsum("skgd,tkd->skgt", qg.astype(jnp.float32),
                            kd) / jnp.sqrt(D)
        scores = jnp.where(causal[:, None, None, :], scores, _NEG)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("skgt,tkd->skgd", probs, vd)
        ctx = ctx.reshape(Sp, H * D).astype(jnp.bfloat16)
        h = h + linear(ctx, o8, osw)
        h = _ffn_block(h, xs, mcfg, linear)
        return (h, li + 1), ()

    h = h.astype(jnp.bfloat16)
    (h, _), _ = jax.lax.scan(layer_step, (h, jnp.int32(0)),
                             _layer_xs(params))
    h = _rms(h, params["final_norm"], mcfg.norm_eps)
    return _lm_head(params, h)
