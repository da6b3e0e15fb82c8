#!/usr/bin/env python
"""Perplexity parity harness: ΔPPL of FP8 emulation vs full precision.

The north-star accuracy gate (BASELINE.md: ≤ 0.1 ΔPPL vs FP32) for the
decoder family, in the spirit of the reference's compare-against-higher-
precision testing (SURVEY.md §4).  Teacher-forced PPL over token
sequences for the fp32 model and each requested quantization policy.

A ΔPPL gate is only meaningful on a TRAINED model (an untrained one has
no structure for quantization error to damage), so the default first
trains on the bundled structured corpus (order-2 Markov + induction,
fp8tpu.data.synthetic) to convergence:

  python examples/eval_ppl.py --dtypes e4m3 e3m4 hybrid --train 1000

Pass ``--train 0 --tokens_npz data.npz`` to evaluate your own weights/
data instead (load weights with --ckpt <dir> <step> from
fp8tpu.utils.checkpoint).  tools/accuracy_gates.py runs the full gate
matrix (PTQ + serving artifact + FP8-training parity) and records
ACCURACY.json.
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
from fp8tpu.data import mixed_lm_corpus
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
    ap.add_argument("--ckpt", nargs=2, metavar=("DIR", "STEP"),
                    default=None, help="load trained params")
    ap.add_argument("--train", type=int, default=800,
                    help="bf16 training steps before eval (0 = skip; "
                         "untrained ΔPPL is structurally meaningless)")
    ap.add_argument("--num_seqs", type=int, default=64)
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--exempt-head", action="store_true", default=True)
    args = ap.parse_args()

    vocab = 64 if args.tokens_npz is None else 2048
    cfg = tiny_config(n_layers=args.layers, d_model=args.d_model,
                      n_heads=8, n_kv_heads=4, d_ff=args.d_model * 3,
                      vocab_size=vocab, max_seq_len=args.seq_len)
    model = Decoder(cfg)

    if args.tokens_npz:
        tokens = jnp.asarray(np.load(args.tokens_npz)["tokens"], jnp.int32)
        train_toks = tokens
    else:
        tokens = jnp.asarray(
            mixed_lm_corpus(args.num_seqs, args.seq_len, vocab, seed=777),
            jnp.int32)
        train_toks = mixed_lm_corpus(8192, args.seq_len, vocab, seed=0)

    variables = model.init(jax.random.key(1), tokens[:1])

    if args.ckpt:
        from fp8tpu.utils.checkpoint import restore_checkpoint
        variables = restore_checkpoint(
            args.ckpt[0], int(args.ckpt[1]),
            {"params": variables})["state"]["params"]
        print(f"loaded checkpoint {args.ckpt[0]} step {args.ckpt[1]}")
    elif args.train > 0:
        opt = optax.adamw(optax.cosine_decay_schedule(3e-3, args.train),
                          b2=0.98, weight_decay=0.01)
        opt_state = opt.init(variables["params"])

        @jax.jit
        def step(params, opt_state, batch):
            def loss_of(p):
                logits = model.apply({"params": p}, batch[:, :-1])
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, batch[:, 1:]).mean()
            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(0)
        params = variables["params"]
        for i in range(args.train):
            idx = rng.integers(0, len(train_toks), 32)
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(train_toks[idx]))
            if (i + 1) % max(args.train // 4, 1) == 0:
                print(f"train {i+1}/{args.train} loss {float(loss):.4f}")
        variables = {"params": params}
    else:
        print("WARNING: evaluating RANDOM weights — ΔPPL will be "
              "structurally negligible; pass --train or --ckpt")

    base_apply = jax.jit(lambda t: model.apply(variables, t))
    base = ppl_of(base_apply, tokens)
    print(f"{'policy':10s} {'ppl':>10s} {'Δppl':>8s}")
    print(f"{'fp32':10s} {base:10.4f} {0.0:8.4f}")

    calib = [tokens[:8, :-1]]
    exempt = ("embed",) if args.exempt_head else ()
    for dtype in args.dtypes:
        qm = fp8tpu.quantize_model(model, variables, (tokens[:1],),
                                   dtype=dtype,
                                   calibration_batches=calib,
                                   list_exempt_layers=exempt)
        qapply = jax.jit(qm.apply)
        p = ppl_of(qapply, tokens)
        print(f"{dtype:10s} {p:10.4f} {p - base:8.4f}")


if __name__ == "__main__":
    main()
