#!/usr/bin/env python
"""AWQ ablation: does activation-aware equalization (quant/awq.py) move
the real-quantized serving artifact's ΔPPL?

Loads the accuracy-gates trained checkpoint if cached, otherwise trains
it through the same ``_trained_baseline`` path (the r4 run died here: a
fresh container had no checkpoint and the tool refused to train, so the
promised artifact never landed).  Then equalizes with
``awq_calibrate_decoder`` on training-corpus calibration batches and
compares each serving format's ΔPPL vs the bf16 serving twin with and
without AWQ.  Merges results into ACCURACY.json["awq"].

The reference has no AWQ analog (its calibration is observer min-max,
mpemu/stats_collector.py); this measures the production step beyond the
reference surface.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from accuracy_gates import (MODELS, OUT, _build_lm, _trained_baseline,
                            ppl_of)
from fp8tpu.quant import awq_calibrate_decoder
from fp8tpu.serve import ServeConfig, convert_decoder_params
from fp8tpu.serve.model import full_logits


def serve_ppl(sparams, cfg, fmt, kv, int4_group, eval_toks):
    scfg = ServeConfig(model=cfg, weight_fmt=fmt, kv_fmt=kv,
                       int4_group=int4_group)
    jfl = jax.jit(lambda sp, t, _c=scfg: full_logits(sp, t, _c))

    def sv_apply(tb):
        return jnp.stack([jfl(sparams, t) for t in tb])

    return ppl_of(sv_apply, eval_toks[:64])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(MODELS), default="large")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    m = MODELS[args.model]
    steps = args.steps or m["default_steps"]
    lr = args.lr if args.lr is not None else m["default_lr"]

    cfg, model, train_toks, eval_toks = _build_lm(args.model)
    variables = model.init(jax.random.key(1),
                           jnp.asarray(train_toks[:1, :-1]))
    os.environ.setdefault("ACC_REUSE", "1")
    trained = _trained_baseline(args.model, model, variables, train_toks,
                                steps, lr, batch=32)
    print(f"[awq] trained {args.model} baseline ready "
          f"(steps={steps}, lr={lr:g})")

    calib = jnp.asarray(train_toks[:8 * args.calib_batches, :-1])
    out = {"model": args.model, "calib_batches": args.calib_batches,
           "formats": {}}

    # bf16 serving twin: the referent that isolates quantization cost
    bf16_art = convert_decoder_params(trained, cfg, "bf16")
    ref_ppl = serve_ppl(bf16_art, cfg, "bf16", "bf16", None, eval_toks)
    out["serve_bf16_ppl"] = round(ref_ppl, 4)
    print(f"[awq] bf16 serving twin ppl {ref_ppl:.4f}")

    for fmt, kv, group in (("e4m3", "int8", None), ("int8", "int8", None),
                           ("int4", "int8", None), ("int4", "int8", 128)):
        gtag = f"_g{group}" if group else ""
        tag = f"{fmt}{gtag}_kv{kv}"
        plain_art = convert_decoder_params(trained, cfg, fmt,
                                           int4_group=group)
        p_plain = serve_ppl(plain_art, cfg, fmt, kv, group, eval_toks)
        t0 = time.time()
        eq_vars, info = awq_calibrate_decoder(
            model, trained, cfg, calib, fmt=fmt, int4_group=group,
            batch=8, n_batches=args.calib_batches)
        t_cal = time.time() - t0
        awq_art = convert_decoder_params(eq_vars, cfg, fmt,
                                         int4_group=group)
        p_awq = serve_ppl(awq_art, cfg, fmt, kv, group, eval_toks)
        alphas = sorted({r["alpha"] for l in info.values()
                         for r in l.values()})
        rec = {"plain_ppl": round(p_plain, 4),
               "awq_ppl": round(p_awq, 4),
               "plain_delta_vs_serve_bf16": round(p_plain - ref_ppl, 4),
               "awq_delta_vs_serve_bf16": round(p_awq - ref_ppl, 4),
               "awq_gain": round(p_plain - p_awq, 4),
               "alphas_chosen": alphas,
               "calib_seconds": round(t_cal, 1)}
        out["formats"][tag] = rec
        print(f"[awq] {tag:16s} plain Δ {p_plain-ref_ppl:+.4f} -> "
              f"awq Δ {p_awq-ref_ppl:+.4f} (gain {p_plain-p_awq:+.4f}, "
              f"alphas {alphas}, calib {t_cal:.0f}s)")

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results["awq"] = out
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", os.path.abspath(args.out))


if __name__ == "__main__":
    main()
