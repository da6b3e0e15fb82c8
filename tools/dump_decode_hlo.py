#!/usr/bin/env python
"""Dump compiled HLO of the decode chunk and print the named fusions that
dominate the profile (tools/profile_decode.py)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, DecoderConfig
from fp8tpu.serve import KVCache, ServeConfig, convert_decoder_params
from fp8tpu.serve.model import decode_steps

CFG = DecoderConfig(vocab_size=16384, d_model=2048, n_layers=16,
                    n_heads=16, n_kv_heads=4, d_ff=5504, max_seq_len=1024)
BATCH, CACHE_LEN, STEPS = 32, 512, 48
FMT = sys.argv[1] if len(sys.argv) > 1 else "e4m3"
WANT = sys.argv[2:] or ["fusion.277", "fusion.276", "fusion.268",
                        "fusion.270", "fusion.275", "convert_bitcast_fusion.5",
                        "fusion.269"]


def main():
    scfg = ServeConfig(model=CFG, weight_fmt=FMT, kv_fmt=FMT)
    m = Decoder(CFG)
    variables = jax.jit(m.init)(jax.random.key(0), jnp.ones((1, 8), jnp.int32))
    params = convert_decoder_params(variables, CFG, fmt=FMT)
    cache = KVCache.create(CFG.n_layers, BATCH, CACHE_LEN, CFG.n_kv_heads,
                           CFG.head_dim, FMT)
    tokens = jnp.ones((BATCH,), jnp.int32)
    pos0 = jnp.full((BATCH,), 256, jnp.int32)
    temp = jnp.zeros((BATCH,), jnp.float32)
    key = jax.random.key(0)

    lowered = decode_steps.lower(params, cache, tokens, pos0, key, temp,
                                 STEPS, scfg)
    txt = lowered.compile().as_text()
    out = "/tmp/decode_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")

    # Print the root + a few lines of each wanted fusion computation.
    for want in WANT:
        pat = re.compile(rf"^\s*%?{re.escape(want)} = .*$", re.M)
        mth = pat.search(txt)
        print("=" * 80)
        if not mth:
            print(want, ": not found")
            continue
        line = mth.group(0)
        print(line[:400])
        # find called computation name
        cm = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            cpat = re.compile(rf"^%?{re.escape(comp)} [^\n]*\{{", re.M)
            cs = cpat.search(txt)
            if cs:
                body = txt[cs.start():]
                end = body.index("\n}")
                body = body[:end]
                # summarize: ops used
                ops = re.findall(r"= \w+\[", body)
                from collections import Counter
                print("  ops:", Counter(o[2:-1] for o in ops).most_common(12))
                for ln in body.splitlines():
                    if any(k in ln for k in ("dot", "convolution", "reduce(",
                                             "convert", "ROOT")):
                        print("   ", ln.strip()[:240])


if __name__ == "__main__":
    main()
