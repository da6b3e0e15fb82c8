#!/usr/bin/env python
"""BERT QA FP8 fine-tuning — the reference's accelerate-based SQuAD flow
(examples/training/bert/run_qa_no_trainer.py:810-930): initialize the FP8
emulator after the optimizer, exempt the qa_outputs head, and fuse the
attention-score matmul outputs.  Synthetic span data (no downloads)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import fp8tpu
from fp8tpu.models import (
    BERT_OUTPUT_FUSED,
    BERT_QA_EXEMPT,
    BertForQA,
    tiny_bert,
)
from fp8tpu.training import make_train_step
from fp8tpu.utils import MetricLogger


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--training-algo", default="hybrid",
                   choices=["direct", "hybrid", "bfloat16"])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    args = p.parse_args()

    cfg = tiny_bert(max_position=args.seq_len)
    model = BertForQA(cfg)
    key = jax.random.key(0)
    ids = jax.random.randint(jax.random.key(1),
                             (args.batch_size, args.seq_len), 0,
                             cfg.vocab_size)
    variables = model.init(key, ids)

    emulator = fp8tpu.initialize(
        model, variables, (ids,), training_algo=args.training_algo,
        exempt_layers=BERT_QA_EXEMPT)
    emulator = fp8tpu.training.MPTEmulator(
        model=emulator.model,
        policy=emulator.policy.with_output_fused(*BERT_OUTPUT_FUSED),
        module_table=emulator.module_table,
        master_fmt=emulator.master_fmt)
    optimizer = optax.adamw(args.lr)

    def loss_fn(apply_fn, params, batch):
        ids, starts, ends = batch
        s_logits, e_logits = apply_fn(params, ids)
        return (optax.softmax_cross_entropy_with_integer_labels(
                    s_logits, starts).mean()
                + optax.softmax_cross_entropy_with_integer_labels(
                    e_logits, ends).mean()) / 2

    step = jax.jit(make_train_step(emulator, optimizer, loss_fn))
    opt_state = optimizer.init(variables)
    log = MetricLogger()
    for i in range(args.steps):
        k = jax.random.fold_in(key, i)
        batch = (
            jax.random.randint(jax.random.fold_in(k, 1),
                               (args.batch_size, args.seq_len), 0,
                               cfg.vocab_size),
            jax.random.randint(jax.random.fold_in(k, 2),
                               (args.batch_size,), 0, args.seq_len),
            jax.random.randint(jax.random.fold_in(k, 3),
                               (args.batch_size,), 0, args.seq_len),
        )
        variables, opt_state, loss = step(variables, opt_state, batch, k)
        log.update(loss=float(loss))
        if i % 10 == 0:
            print(f"step {i}: {log}")
    print(f"final: {log}")


if __name__ == "__main__":
    main()
