#!/usr/bin/env python
"""Ablate the SR dither source x grad clipping on 83M hybrid training.

Diagnostic for the round-3 regression: after c54a825 (murmur SR dither)
plus global-norm clipping, the 83M hybrid training gap blew up
(hybrid_gap 1.6 -> 18.8 at 3000 steps) while every non-training gate
stayed tiny.  This script runs short hybrid training legs under each
(sr_impl, clip) cell and logs loss + dynamic-loss-scale state so the
culprit is measurable, not guessed.

Usage: python tools/sr_ablate.py --steps 400 --cells hash+clip,threefry+clip
"""

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_cell(cell, steps, model, log_every, cpu=False):
    """One (sr_impl, clip) training leg in a fresh process (SR impl is a
    module-level constant, so it must be set before import)."""
    sr, clip = cell.split("+") if "+" in cell else (cell, "clip")
    env = dict(os.environ, FP8TPU_SR_BITS=sr)
    code = f"""
import sys, os, json, time
sys.path.insert(0, {HERE!r} + "/..")
import jax
if {cpu!r}:
    jax.config.update("jax_platforms", "cpu")
jax.devices()   # fail fast while the pool claim is unavailable
import jax.numpy as jnp, numpy as np, optax
from fp8tpu.data import mixed_lm_corpus
from fp8tpu.models import Decoder, tiny_config
from fp8tpu.training import init_train_state, initialize, make_train_step
sys.path.insert(0, {HERE!r})
from accuracy_gates import MODELS, lm_loss

m = MODELS[{model!r}]
cfg = tiny_config(n_layers=m["n_layers"], d_model=m["d_model"],
                  n_heads=m["n_heads"], n_kv_heads=m["n_kv_heads"],
                  d_ff=m["d_ff"], vocab_size=m["vocab"],
                  max_seq_len=m["seq"])
model = Decoder(cfg)
train_toks = mixed_lm_corpus(m["corpus"], m["seq"], m["vocab"], seed=0)
variables = model.init(jax.random.key(0), jnp.asarray(train_toks[:1, :-1]))
emulator = initialize(model, variables,
                      (jnp.asarray(train_toks[:1, :-1]),),
                      training_algo="hybrid", master_fmt="fp16")
lr, steps, batch = m["default_lr"], {steps}, 16
tx = [optax.clip_by_global_norm(1.0)] if {clip!r} == "clip" else []
tx.append(optax.adamw(optax.cosine_decay_schedule(lr, steps), b2=0.98,
                      weight_decay=0.01))
opt = optax.chain(*tx)
step = jax.jit(make_train_step(emulator, opt,
                               lambda af, p, b: lm_loss(af, p, b)))
params = variables
opt_state = init_train_state(opt, params)
rng = np.random.default_rng(0)
key = jax.random.key(42)
for i in range(steps):
    idx = rng.integers(0, len(train_toks), batch)
    key, sub = jax.random.split(key)
    params, opt_state, loss = step(params, opt_state,
                                   jnp.asarray(train_toks[idx]), sub)
    if (i + 1) % {log_every} == 0 or i == 0:
        ls = opt_state[1]
        print(json.dumps(dict(step=i + 1, loss=round(float(loss), 4),
                              scale=float(ls.scale),
                              good=int(ls.good_steps))), flush=True)
"""
    print(f"=== cell {sr}+{clip} ===", flush=True)
    # The tunneled pool claim can sit UNAVAILABLE for long stretches;
    # retry the whole cell subprocess until it gets the chip.
    import time
    for attempt in range(100):
        r = subprocess.run([sys.executable, "-c", code], env=env)
        if r.returncode == 0:
            return
        print(f"[cell retry {attempt}] exit {r.returncode}; sleeping 60s",
              flush=True)
        time.sleep(60)
    raise RuntimeError(f"cell {cell} never got the TPU")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--model", default="large")
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--cells", default="hash+clip,threefry+clip,hash+noclip")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (small-model discriminator without "
                        "queueing on the TPU claim)")
    a = p.parse_args()
    for cell in a.cells.split(","):
        run_cell(cell, a.steps, a.model, a.log_every, cpu=a.cpu)
