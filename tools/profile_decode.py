#!/usr/bin/env python
"""Capture a device profile of the serving decode chunk (bench.py shapes)
and print the top XLA ops by self time, parsed from the trace-viewer JSON."""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fp8tpu.models import Decoder, DecoderConfig
from fp8tpu.serve import KVCache, ServeConfig, convert_decoder_params
from fp8tpu.serve.model import decode_steps

CFG = DecoderConfig(vocab_size=32768, d_model=4096, n_layers=16,
                    n_heads=32, n_kv_heads=8, d_ff=11008, max_seq_len=1024)
BATCH, CACHE_LEN, STEPS, WARM_POS = 64, 512, 64, 444
FMT = sys.argv[1] if len(sys.argv) > 1 else "e4m3"
KV_FMT = "e4m3" if FMT == "int4" else FMT
OUT = f"/tmp/prof_{FMT}"


def main():
    from fp8tpu.serve.model import random_serve_params
    scfg = ServeConfig(model=CFG, weight_fmt=FMT, kv_fmt=KV_FMT, embed_fmt=KV_FMT)
    params = random_serve_params(CFG, FMT, embed_fmt=KV_FMT)
    from fp8tpu.serve import RingKVCache
    cache = RingKVCache.create(CFG.n_layers, BATCH, CACHE_LEN,
                               CFG.n_kv_heads, CFG.head_dim, KV_FMT)
    import dataclasses
    cache = dataclasses.replace(cache, head=jnp.int32(WARM_POS))
    tokens = jnp.ones((BATCH,), jnp.int32)
    pos0 = jnp.full((BATCH,), WARM_POS, jnp.int32)
    temp = jnp.zeros((BATCH,), jnp.float32)
    key = jax.random.key(0)

    toks, cache = decode_steps(params, cache, tokens, pos0, key, temp,
                               STEPS, scfg)
    np.asarray(toks).sum()

    with jax.profiler.trace(OUT):
        toks, cache = decode_steps(params, cache, tokens, pos0, key, temp,
                                   STEPS, scfg)
        np.asarray(toks).sum()

    # Parse the trace-viewer JSON: per-op device self-times.
    files = glob.glob(f"{OUT}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace json found under", OUT)
        for f in glob.glob(f"{OUT}/**/*", recursive=True):
            print(" ", f)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Find device-side threads (TPU core tracks).
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        tot[name] += e.get("dur", 0)
        cnt[name] += 1
    if not tot:
        print("pids:", pid_names)
    total = sum(tot.values())
    print(f"total device time: {total/1e3:.2f} ms  ({path})")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t/1e3:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
