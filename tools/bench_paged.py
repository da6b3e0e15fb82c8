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

if os.environ.get("PAGED_BENCH_PRESET") == "small":
    # the spec-bench shape (83M-class, short pages): checks whether the
    # default impl choice transfers to small models, where per-chunk
    # fixed costs weigh more
    CFG = DecoderConfig(vocab_size=256, d_model=768, n_layers=12,
                        n_heads=12, n_kv_heads=4, d_ff=2304,
                        max_seq_len=256)
    B, S, STEPS, DEPTH, WARM = 16, 256, 64, 3, 190
    PAGE = 32
    OUT_KEY = "paged_small"
else:
    CFG = DecoderConfig(vocab_size=32768, d_model=2048, n_layers=12,
                        n_heads=16, n_kv_heads=4, d_ff=5504,
                        max_seq_len=512)
    B, S, STEPS, DEPTH, WARM = 32, 512, 64, 3, 440
    PAGE = 64
    OUT_KEY = "paged"

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


# A/B every paged chunk strategy (ServeConfig.paged_decode_impl) with an
# EXPLICIT cfg per run — the r4 version let the first run inherit the
# ServeConfig default, so when the default flipped to "side" the row
# labeled "scatter" silently re-measured "side" (ADVICE r4).  The
# headline keys (paged_tok_s / ring_over_paged) always describe the
# shipped DEFAULT impl (VERDICT r4 weak #3c).
default_impl = ServeConfig.paged_decode_impl
impls = ["side", "ringview", "side-eager", "scatter", "kernel"]
if default_impl not in impls:
    impls.insert(0, default_impl)

results = {}
print(f"ring:            {ring_tok:.0f} tok/s")
for impl in impls:
    icfg = dataclasses.replace(scfg, paged_decode_impl=impl)
    try:
        tok = measure(decode_steps_paged, fresh_paged(), cfg=icfg)
    except Exception as e:  # an impl may not support this shape
        print(f"paged {impl}: FAILED ({type(e).__name__}: {e})")
        continue
    results[impl] = tok
    mark = " (default)" if impl == default_impl else ""
    print(f"paged {impl:8s}{mark}: {tok:.0f} tok/s  "
          f"(ring/{impl} {ring_tok/tok:.2f}x)")

prev = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        prev = json.load(f)
rec = {"model": f"{CFG.d_model}d L{CFG.n_layers} B{B} S{S}", "default_impl": default_impl,
       "ring_tok_s": round(ring_tok, 1)}
for impl, tok in results.items():
    rec[f"paged_{impl}_tok_s"] = round(tok, 1)
    rec[f"ring_over_{impl}"] = round(ring_tok / tok, 3)
if default_impl in results:
    rec["paged_tok_s"] = round(results[default_impl], 1)
    rec["ring_over_paged"] = round(ring_tok / results[default_impl], 3)
prev[OUT_KEY] = rec
with open(OUT, "w") as f:
    json.dump(prev, f, indent=1)
print("wrote", os.path.abspath(OUT))
