#!/usr/bin/env python
"""FP8 mixed-precision training — the reference's ResNet/BERT training
recipes (examples/training/resnet/main_amp.py flow) TPU-native:

  fp8tpu.initialize(...) with --training-algo {direct, hybrid, bfloat16},
  FP16 master weights stochastically requantized each step, optional FP8
  embeddings with per-row block-norm scales, checkpoint/resume, and
  dp/tp/sp sharding over however many devices exist.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import fp8tpu
from fp8tpu.models import Decoder, DecoderConfig
from fp8tpu.parallel import (DECODER_PARAM_RULES, MOE_PARAM_RULES,
                            make_mesh, shard_params)
from fp8tpu.training import init_train_state, make_train_step
from fp8tpu.utils import MetricLogger, save_checkpoint, restore_checkpoint


def main():
    p = argparse.ArgumentParser()
    # hybrid-gemm (fp8 on dense/conv GEMM streams only — production
    # scoping) is the recommended recipe: at 83M it matches bf16 at
    # equal short budgets and BEATS it at 2x budget (17.2 vs 24.7 ppl;
    # ACCURACY_BUDGET.json gemm_recipe_6000).  The reference-faithful
    # whole-whitelist recipes (hybrid/direct, scaled or not) plateau
    # ~+0.07 nats and stop converging where bf16 keeps descending.
    p.add_argument("--training-algo", default="hybrid-gemm",
                   choices=["direct", "direct-scaled", "hybrid",
                            "hybrid-scaled", "hybrid-gemm", "bfloat16"])
    p.add_argument("--master-fmt", default="fp16",
                   choices=["fp32", "fp16", "e5m2"])
    p.add_argument("--emb-fmt", default=None,
                   choices=[None, "e5m2", "e4m3", "e3m4"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=128)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--n-layers", type=int, default=4)
    p.add_argument("--data-parallel", type=int, default=1)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--n-experts", type=int, default=0,
                   help="MoE FFN with this many experts (0 = dense MLP)")
    p.add_argument("--opt8", action="store_true",
                   help="8-bit Adam moments (int8 m / e4m3 v, "
                        "per-block scales): 4x less optimizer memory")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize decoder layers (jax.checkpoint)")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--resume-step", type=int, default=None)
    args = p.parse_args()

    cfg = DecoderConfig(
        vocab_size=2048, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=max(4, args.d_model // 64),
        n_kv_heads=max(4, args.d_model // 64),
        d_ff=args.d_model * 3, max_seq_len=args.seq_len,
        n_experts=args.n_experts, remat=args.remat)
    model = Decoder(cfg)

    key = jax.random.key(0)
    tokens = jax.random.randint(jax.random.key(1),
                                (args.batch_size, args.seq_len), 0,
                                cfg.vocab_size)
    variables = model.init(key, tokens)

    emulator = fp8tpu.initialize(
        model, variables, (tokens,), training_algo=args.training_algo,
        master_fmt=args.master_fmt, emb_fmt=args.emb_fmt)
    if args.opt8:
        from fp8tpu.training import adamw_8bit
        optimizer = adamw_8bit(args.lr)   # int8/e4m3 Adam moments
    else:
        optimizer = optax.adamw(args.lr)

    if args.n_experts:
        from fp8tpu.models.transformer import moe_aux_loss

        def loss_fn(apply_fn, params, batch):
            logits, inter = apply_fn(params, batch[:, :-1],
                                     mutable=["intermediates"])
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, batch[:, 1:]).mean()
            # Switch-style load balancing: without it capacity routing
            # collapses onto a few experts and silently drops tokens.
            return ce + 0.01 * moe_aux_loss(inter)
    else:
        def loss_fn(apply_fn, params, batch):
            logits = apply_fn(params, batch[:, :-1])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, batch[:, 1:]).mean()

    step_fn = make_train_step(emulator, optimizer, loss_fn)

    # Shard over whatever devices exist (dp × tp).
    mesh = make_mesh(data=args.data_parallel, model=args.model_parallel)
    rules = MOE_PARAM_RULES if args.n_experts else DECODER_PARAM_RULES
    variables = shard_params(variables, mesh, rules)
    opt_state = init_train_state(optimizer, variables)
    batch_sh = NamedSharding(mesh, P("data", None))

    start_step = 0
    if args.checkpoint_dir and args.resume_step is not None:
        out = restore_checkpoint(args.checkpoint_dir, args.resume_step,
                                 {"params": variables,
                                  "opt_state": opt_state})
        variables = out["state"]["params"]
        opt_state = out["state"]["opt_state"]
        start_step = out["meta"]["step"]
        print(f"resumed from step {start_step}")

    jstep = jax.jit(step_fn)
    log = MetricLogger()
    with mesh:
        for step in range(start_step, args.steps):
            batch = jax.device_put(
                jax.random.randint(jax.random.fold_in(key, step),
                                   (args.batch_size, args.seq_len), 0,
                                   cfg.vocab_size), batch_sh)
            t0 = time.time()
            variables, opt_state, loss = jstep(
                variables, opt_state, batch, jax.random.fold_in(key, step))
            log.update(loss=float(loss),
                       tokens_per_s=batch.size / (time.time() - t0))
            if step % 10 == 0:
                print(f"step {step}: {log}")
            if args.checkpoint_dir and step and step % 25 == 0:
                save_checkpoint(args.checkpoint_dir, step, variables,
                                opt_state, policy=emulator.policy)
    print(f"final: {log}")


if __name__ == "__main__":
    main()
