#!/usr/bin/env python
"""Perplexity parity harness: ΔPPL of FP8 emulation vs full precision.

The north-star accuracy gate (BASELINE.md: ≤ 0.1 ΔPPL vs FP32) for the
decoder family, in the spirit of the reference's compare-against-higher-
precision testing (SURVEY.md §4).  Teacher-forced PPL over token
sequences for the fp32 model and each requested quantization policy:

  python examples/eval_ppl.py --dtypes e4m3 e3m4 hybrid \
      --tokens_npz data.npz            # {tokens: (N, S) int32}

Synthetic tokens by default (random-weight PPL ~= vocab size; the
DELTA between fp32 and fp8 is still the meaningful signal).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import fp8tpu
from fp8tpu.models import Decoder, tiny_config


def ppl_of(apply_fn, tokens, batch=8):
    """exp(mean next-token cross-entropy) under teacher forcing."""
    tot, n = 0.0, 0
    for i in range(0, tokens.shape[0], batch):
        tb = tokens[i:i + batch]
        logits = apply_fn(tb[:, :-1])
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, tb[:, 1:])
        tot += float(jnp.sum(ce))
        n += int(np.prod(ce.shape))
    return float(np.exp(tot / max(n, 1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtypes", nargs="+", default=["e4m3", "hybrid"])
    ap.add_argument("--tokens_npz", default=None)
    ap.add_argument("--num_seqs", type=int, default=32)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--d_model", type=int, default=256)
    args = ap.parse_args()

    cfg = tiny_config(n_layers=args.layers, d_model=args.d_model,
                      n_heads=4, n_kv_heads=2, d_ff=args.d_model * 2,
                      vocab_size=2048, max_seq_len=args.seq_len)
    model = Decoder(cfg)

    if args.tokens_npz:
        tokens = jnp.asarray(np.load(args.tokens_npz)["tokens"], jnp.int32)
    else:
        tokens = jax.random.randint(
            jax.random.key(0), (args.num_seqs, args.seq_len), 0,
            cfg.vocab_size, jnp.int32)

    variables = model.init(jax.random.key(1), tokens[:1])
    base_apply = jax.jit(lambda t: model.apply(variables, t))
    base = ppl_of(base_apply, tokens)
    print(f"{'policy':10s} {'ppl':>10s} {'Δppl':>8s}")
    print(f"{'fp32':10s} {base:10.4f} {0.0:8.4f}")

    calib = [tokens[:8, :-1]]
    for dtype in args.dtypes:
        qm = fp8tpu.quantize_model(model, variables, (tokens[:1],),
                                   dtype=dtype,
                                   calibration_batches=calib)
        qapply = jax.jit(qm.apply)
        p = ppl_of(qapply, tokens)
        print(f"{dtype:10s} {p:10.4f} {p - base:8.4f}")


if __name__ == "__main__":
    main()
