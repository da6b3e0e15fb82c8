#!/usr/bin/env python
"""End-to-end ServingEngine throughput vs chunk size (VERDICT r1 weak #8:
bucketing/chunk choices need bench evidence).

Measures the full continuous-batching loop — admission prefills, chunked
decode with on-device sampling, retirement — on a ~1B-class decoder, for
several engine chunk sizes.  Appends {"engine": ...} to PERF_EXTRAS.json.

  python tools/bench_engine.py [chunk_sizes...]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from fp8tpu.models import DecoderConfig
from fp8tpu.serve import Request, ServeConfig, ServingEngine
from fp8tpu.serve.model import random_serve_params

OUT = os.path.join(os.path.dirname(__file__), "..", "PERF_EXTRAS.json")

CFG = DecoderConfig(vocab_size=32768, d_model=2048, n_layers=12,
                    n_heads=16, n_kv_heads=4, d_ff=5504, max_seq_len=512)
SLOTS = 32
N_REQ = 64
GEN = 129          # power-of-two budget after the prefill's first token
PROMPT = 48        # buckets to 64


def run(chunk_size: int, use_paged: bool = False) -> float:
    scfg = ServeConfig(model=CFG, weight_fmt="e4m3", kv_fmt="int8",
                       embed_fmt="e4m3")
    params = random_serve_params(CFG, "e4m3", embed_fmt="e4m3")
    reqs = [Request(uid=i, prompt=[(7 * i + j) % CFG.vocab_size
                                   for j in range(PROMPT)],
                    max_new_tokens=GEN) for i in range(N_REQ)]
    kw = dict(n_slots=SLOTS, max_seq=512, chunk_size=chunk_size,
              use_paged=use_paged)
    # warm compile pass (prefill + decode programs): prompts in the SAME
    # length bucket as the measured run, so the measurement is
    # steady-state throughput, not remote-compile time
    eng = ServingEngine(params, scfg, **kw)
    eng.run([Request(uid=-1 - i, prompt=[3] * PROMPT, max_new_tokens=GEN)
             for i in range(SLOTS)])

    eng = ServingEngine(params, scfg, **kw)
    t0 = time.perf_counter()
    out = eng.run(reqs)
    dt = time.perf_counter() - t0
    toks = sum(len(v) for v in out.values())
    return toks / dt


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16, 64, 128]
    res = {}
    for c in sizes:
        tok_s = run(c)
        res[f"chunk_{c}_tok_s"] = round(tok_s, 1)
        print(f"chunk_size={c}: {tok_s:.0f} tok/s end-to-end", flush=True)
    best = None
    for c in sorted({64, max(sizes)} & set(sizes) | {max(sizes)}):
        paged = run(c, use_paged=True)
        res[f"paged_chunk_{c}_tok_s"] = round(paged, 1)
        best = max(best or 0, paged)
        print(f"paged chunk_size={c}: {paged:.0f} tok/s end-to-end",
              flush=True)
    res["paged_best_tok_s"] = round(best, 1)

    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    prev["engine"] = {"model": "1B-class d2048 L12", "slots": SLOTS,
                      "requests": N_REQ, "gen": GEN, **res}
    with open(OUT, "w") as f:
        json.dump(prev, f, indent=1)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
