"""Speculative-decoding mechanism bench (single real TPU chip).

B=1 latency serving is where speculation pays: the per-token cost of
plain decode is one full fp8 weight stream; the verify pass streams the
weights ONCE for K+1 tokens.  This tool measures the three device-time
primitives on the real chip and projects end-to-end speedup as a
function of acceptance (acceptance itself is a property of the
draft/target pair — random weights have none, so the projection is the
honest artifact; self-draft runs give the mechanism ceiling):

  t_step    — one plain decode step (B=1)
  t_verify  — score_tokens over K+1 tokens (the multi-token verify)
  t_draft   — K draft-model decode steps

  speedup(a) = (a_bar + 1) / ((t_draft + t_verify) / t_step)
  where a_bar = expected accepted tokens per round.

Writes PERF_EXTRAS.json["speculative"].  All timing uses chained
donated dispatches with one scalar readback per window (NOTES.md:
per-dispatch host sync measures the axon tunnel, not the chip).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fp8tpu.models import tiny_config
from fp8tpu.serve import RingKVCache, ServeConfig, prefill
from fp8tpu.serve.model import random_serve_params, decode_chunk
from fp8tpu.serve.speculative import draft_chunk, score_tokens, \
    speculative_decode


def _sync(x):
    if isinstance(x, RingKVCache):
        return int(x.head)
    return float(jnp.sum(x.astype(jnp.float32)[..., :1]))


def time_chained(fn, state, n, warmup=2):
    """fn(state) -> state; chain n dispatches, one readback at the end."""
    for _ in range(warmup):
        state = fn(state)
    _sync(state[0] if isinstance(state, tuple) else state)
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state)
    _sync(state[0] if isinstance(state, tuple) else state)
    return (time.perf_counter() - t0) / n, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--d-model", type=int, default=2048)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=64)
    args = ap.parse_args()

    cfg = tiny_config(n_layers=args.layers, d_model=args.d_model,
                      n_heads=16, n_kv_heads=4, d_ff=4 * args.d_model,
                      vocab_size=32000, max_seq_len=args.seq)
    dcfg_m = tiny_config(n_layers=2, d_model=512, n_heads=8, n_kv_heads=4,
                         d_ff=2048, vocab_size=32000, max_seq_len=args.seq)
    scfg = ServeConfig(model=cfg, kv_fmt="int8")
    dscfg = ServeConfig(model=dcfg_m, kv_fmt="int8")
    params = random_serve_params(cfg, "e4m3")
    dparams = random_serve_params(dcfg_m, "e4m3")
    K = args.k

    prompt = jnp.ones((16,), jnp.int32)

    def fresh(c, sc):
        ring = RingKVCache.create(c.n_layers, 1, args.seq, c.n_kv_heads,
                                  c.head_dim, sc.kv_fmt)
        _, ring = prefill(params if c is cfg else dparams, ring, prompt,
                          jnp.int32(0), jnp.int32(16), sc)
        return ring

    out = {}

    # 1) plain decode step (B=1): chunked scan, per-step cost
    ring = fresh(cfg, scfg)
    CH = 16

    def plain(state):
        ring, toks, pos = state
        _, _, ring, toks, pos = decode_chunk(
            params, ring, toks, pos, jax.random.key(0),
            jnp.zeros((1,), jnp.float32), CH, scfg)
        return (ring, toks, pos)

    t_chunk, _ = time_chained(
        lambda s: plain(s),
        (ring, jnp.ones((1,), jnp.int32), jnp.full((1,), 16, jnp.int32)),
        args.reps)
    t_step = t_chunk / CH
    out["t_plain_step_ms"] = round(t_step * 1e3, 4)
    print(f"[spec] plain B=1 decode: {t_step*1e3:.3f} ms/token "
          f"({1/t_step:.0f} tok/s device-chained)")

    # 2) verify pass: score_tokens over K+1 tokens
    ring = fresh(cfg, scfg)
    vt = jnp.ones((1, K + 1), jnp.int32)

    def verify(state):
        ring, pos = state
        logits, ring = score_tokens(params, ring, vt, pos, scfg)
        # tie the position to the output to keep the chain data-dependent
        return (ring, pos + (logits[0, 0, :1] * 0).astype(jnp.int32))

    t_verify, _ = time_chained(
        verify, (ring, jnp.full((1,), 16, jnp.int32)), args.reps)
    out["t_verify_ms"] = round(t_verify * 1e3, 4)
    ratio = t_verify / ((K + 1) * t_step)
    out["verify_vs_steps"] = round(ratio, 4)
    print(f"[spec] verify K+1={K+1}: {t_verify*1e3:.3f} ms = "
          f"{ratio:.2f}x of {K+1} plain steps "
          f"(the structural win: {(K+1)*t_step/t_verify:.2f}x)")

    # 3) draft chunk: K steps of the small draft
    dring = fresh(dcfg_m, dscfg)

    def draft(state):
        dring, toks, pos = state
        drafted, _, dring = draft_chunk(
            dparams, dring, toks, pos, jax.random.key(1),
            jnp.zeros((1,), jnp.float32), K, dscfg)
        return (dring, drafted[:, -1], pos + K)

    t_draft, _ = time_chained(
        draft, (dring, jnp.ones((1,), jnp.int32),
                jnp.full((1,), 16, jnp.int32)), args.reps)
    out["t_draft_ms"] = round(t_draft * 1e3, 4)
    print(f"[spec] draft K={K} ({dcfg_m.n_layers}L/{dcfg_m.d_model}d): "
          f"{t_draft*1e3:.3f} ms")

    # Projection: speedup(a) for expected accepted tokens per round.
    round_cost = (t_draft + t_verify) / t_step
    proj = {}
    for acc in (0.5, 0.7, 0.9, 1.0):
        a_bar = acc * K          # simple per-token-independent model
        proj[f"speedup_acc{acc}"] = round((a_bar + 1) / round_cost, 3)
    out["projection"] = proj
    out["round_cost_steps"] = round(round_cost, 3)
    print(f"[spec] round cost = {round_cost:.2f} plain steps; projected "
          f"speedup: {proj}")

    # 4) self-draft end-to-end (acceptance ceiling; wall-clock includes
    # the tunnel's per-round host sync, so this is a lower bound)
    t0 = time.perf_counter()
    toks, stats = speculative_decode(params, params, [1] * 16, 64,
                                     scfg, scfg, k_spec=K,
                                     max_seq=args.seq)
    wall = time.perf_counter() - t0
    out["selfdraft_tok_s_wall"] = round(len(toks) / wall, 1)
    out["selfdraft_acceptance"] = round(stats.acceptance_rate, 4)
    print(f"[spec] self-draft e2e: {len(toks)/wall:.0f} tok/s wall, "
          f"acceptance {stats.acceptance_rate:.2f}")

    try:
        with open("PERF_EXTRAS.json") as f:
            extras = json.load(f)
    except FileNotFoundError:
        extras = {}
    tag = "speculative" if K == 4 else f"speculative_k{K}"
    extras[tag] = out
    with open("PERF_EXTRAS.json", "w") as f:
        json.dump(extras, f, indent=1)
    print(json.dumps({tag: out}))


if __name__ == "__main__":
    main()
