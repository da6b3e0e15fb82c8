#!/usr/bin/env python
"""Full PTQ format x scheme x granularity table at 83M (VERDICT r2 missing #1).

The reference's acceptance evidence is the per-format/per-scheme accuracy
table of Shen et al. (arXiv:2309.14592, the FP8-Emulation-Toolkit PTQ
paper): every FP8 format crossed with scaling granularity and calibration
method, against an int8 row, on trained models.  The real datasets cannot
ship in this image, so this reproduces the *shape* of that table on the
83M decoder trained to convergence on the structured corpus
(tools/accuracy_gates.py baseline, checkpoint-cached).

Axes:
  format            e5m2 | e4m3 | e3m4 | int8
  weight scaling    per-tensor | per-channel | per-block(64)
  activation        none (weights-only) | per-tensor max | per-tensor-mean
                    (running-mean calibration, qutils.py 'per-tensor-mean')

Writes FORMAT_TABLE.json and prints the table.  Eval-only per cell on the
cached baseline: ~30 cells.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import fp8tpu
from fp8tpu.quant.config import ModuleQuantConfig, TensorQuantConfig
from fp8tpu.quant.policy import QuantPolicy

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from accuracy_gates import MODELS, _build_lm, _trained_baseline, ppl_of

OUT = os.path.join(os.path.dirname(__file__), "..", "FORMAT_TABLE.json")

WT_SCALINGS = ("per-tensor", "per-channel", "per-block")
ACT_SCALINGS = ("none", "per-tensor", "per-tensor-mean")
FORMATS = ("e4m3", "e3m4", "e5m2", "int8")


def cell_policy(fmt: str, wt_scaling: str, act_scaling: str) -> QuantPolicy:
    """One table cell as a QuantPolicy (RNE everywhere, inference roles
    only — the Shen et al. PTQ setting)."""
    wt = TensorQuantConfig(fmt, "rne", wt_scaling, block_size=64)
    act = (None if act_scaling == "none"
           else TensorQuantConfig(fmt, "rne", act_scaling))
    return QuantPolicy(
        default=ModuleQuantConfig(wt=wt, iact=act, oact=None),
        emb=wt,
        name=f"{fmt}/{wt_scaling}/{act_scaling}",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large")
    ap.add_argument("--eval-seqs", type=int, default=128)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke tests; doesn't queue on the "
                         "tunneled TPU claim)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    m = MODELS[args.model]
    steps, lr, batch = m["default_steps"], m["default_lr"], 16
    cfg, model, train_toks, eval_toks = _build_lm(args.model)
    eval_toks = eval_toks[:args.eval_seqs]
    variables = model.init(jax.random.key(1),
                           jnp.asarray(train_toks[:1, :-1]))
    trained = _trained_baseline(args.model, model, variables, train_toks,
                                steps, lr, batch)

    japply = jax.jit(lambda v, t: model.apply(v, t))
    base = ppl_of(lambda tb: japply(trained, tb), eval_toks)
    print(f"[table] baseline ppl {base:.4f}")

    calib = [jnp.asarray(train_toks[i:i + 16, :-1])
             for i in range(0, 64, 16)]
    table = {"model": args.model, "baseline_ppl": round(base, 4),
             "eval_seqs": int(args.eval_seqs),
             "cells": {}}
    t0 = time.time()
    for fmt in FORMATS:
        for ws in WT_SCALINGS:
            for ascale in ACT_SCALINGS:
                if fmt == "int8" and ascale == "none":
                    # unscaled int has no defined grid; weights-only int
                    # still needs its per-axis scale, so the "none"
                    # column is fp-format-only
                    continue
                pol = cell_policy(fmt, ws, ascale)
                qm = fp8tpu.quantize_model(
                    model, trained, (jnp.asarray(eval_toks[:1, :-1]),),
                    policy=pol, calibration_batches=calib,
                    list_exempt_layers=("embed",))
                jq = jax.jit(lambda v, tb: qm.apply(tb, variables=v))
                p = ppl_of(lambda tb, _v=qm.variables: jq(_v, tb),
                           eval_toks)
                name = f"{fmt}|w:{ws}|a:{ascale}"
                table["cells"][name] = {"ppl": round(p, 4),
                                        "delta_ppl": round(p - base, 4)}
                print(f"[table] {name:34s} ppl {p:8.4f}  Δ {p-base:+8.4f}"
                      f"  ({time.time()-t0:.0f}s)", flush=True)

    with open(OUT, "w") as f:
        json.dump(table, f, indent=1)
    print(f"[table] wrote {os.path.relpath(OUT)}")

    # compact markdown view
    print(f"\n| format | weight scaling | act none | act per-tensor "
          f"| act per-tensor-mean |")
    print("|---|---|---|---|---|")
    for fmt in FORMATS:
        for ws in WT_SCALINGS:
            row = [f"| {fmt} | {ws} "]
            for ascale in ACT_SCALINGS:
                c = table["cells"].get(f"{fmt}|w:{ws}|a:{ascale}")
                row.append(f"| {c['delta_ppl']:+.4f} " if c else "| — ")
            print("".join(row) + "|")


if __name__ == "__main__":
    main()
