#!/usr/bin/env python
"""Paged vs ring KV decode cost (the documented premium of the paged
path's per-step gather — PagedKVCache docstring, VERDICT r1 §5).

1B-class decoder, 32 slots, 512-token context.  Appends {"paged": ...}
to PERF_EXTRAS.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fp8tpu.models import DecoderConfig
from fp8tpu.serve import PagedKVCache, RingKVCache, ServeConfig
from fp8tpu.serve.model import (decode_steps, decode_steps_paged,
                                random_serve_params)

OUT = os.path.join(os.path.dirname(__file__), "..", "PERF_EXTRAS.json")

CFG = DecoderConfig(vocab_size=32768, d_model=2048, n_layers=12,
                    n_heads=16, n_kv_heads=4, d_ff=5504, max_seq_len=512)
B, S, STEPS, DEPTH, WARM = 32, 512, 64, 3, 440
PAGE = 64

scfg = ServeConfig(model=CFG, weight_fmt="e4m3", kv_fmt="int8",
                   embed_fmt="e4m3")
params = random_serve_params(CFG, "e4m3", embed_fmt="e4m3")
tokens = jnp.ones((B,), jnp.int32)
pos0 = jnp.full((B,), WARM, jnp.int32)
temp = jnp.zeros((B,), jnp.float32)
key = jax.random.key(0)


def measure(decode, cache, cfg=None):
    cfg = cfg or scfg
    toks, cache = decode(params, cache, tokens, pos0, key, temp, STEPS,
                         cfg, greedy_only=True)
    np.asarray(toks).sum()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(DEPTH):
            toks, cache = decode(params, cache, tokens, pos0, key, temp,
                                 STEPS, cfg, greedy_only=True)
        np.asarray(toks).sum()
        best = min(best, time.perf_counter() - t0)
    return B * STEPS * DEPTH / best


ring = RingKVCache.create(CFG.n_layers, B, S, CFG.n_kv_heads,
                          CFG.head_dim, "int8")
ring = dataclasses.replace(ring, head=jnp.int32(WARM))
ring_tok = measure(decode_steps, ring)
del ring

mp = S // PAGE


def fresh_paged():
    p = PagedKVCache.create(B * mp, PAGE, CFG.n_layers, B, mp,
                            CFG.n_kv_heads, CFG.head_dim, "int8")
    for b in range(B):
        p = p.assign_pages(b, jnp.arange(mp), jnp.arange(mp) + b * mp)
    return p


# A/B the two paged chunk strategies (ServeConfig.paged_decode_impl):
# "scatter" writes fresh K/V into the chunk snapshot (one attention pass,
# the r4 default); "side" re-scores a growing side buffer every step
# (the r3 behavior that trailed the ring by 1.27x).
paged_tok = measure(decode_steps_paged, fresh_paged())
side_cfg = dataclasses.replace(scfg, paged_decode_impl="side")
paged_side_tok = measure(decode_steps_paged, fresh_paged(), cfg=side_cfg)

ratio = ring_tok / paged_tok
print(f"ring:          {ring_tok:.0f} tok/s")
print(f"paged scatter: {paged_tok:.0f} tok/s  (ring/paged {ratio:.2f}x)")
print(f"paged side:    {paged_side_tok:.0f} tok/s  "
      f"(ring/side {ring_tok/paged_side_tok:.2f}x)")

prev = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        prev = json.load(f)
prev["paged"] = {"model": "1B-class d2048 L12", "ring_tok_s":
                 round(ring_tok, 1), "paged_tok_s": round(paged_tok, 1),
                 "paged_side_tok_s": round(paged_side_tok, 1),
                 "ring_over_paged": round(ratio, 3)}
with open(OUT, "w") as f:
    json.dump(prev, f, indent=1)
print("wrote", os.path.abspath(OUT))
