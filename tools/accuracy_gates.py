#!/usr/bin/env python
"""Accuracy gates on TRAINED models (VERDICT r1 §3).

Trains a small decoder to convergence on a structured corpus (order-2
Markov + induction, entropy floor known), then measures:

  1. ΔPPL of every PTQ emulation policy vs the fp32 model   (gate ≤ 0.1)
  2. ΔPPL of the real-quantized SERVING artifact (fp8/int8/int4
     weights × fp8/int8/bf16 KV), gated against the bf16 serving twin
     that shares its compute precision                      (gate ≤ 0.1)
  3. FP8 mixed-precision TRAINING convergence parity: same budget,
     hybrid/direct recipes vs bf16 training                 (gap ≤ 0.1)
  4. Conv/QAT gate: tiny conv net on pattern images, fp32 vs e4m3 QAT
     accuracy parity.

Writes ACCURACY.json at the repo root (bench.py embeds it as extras) and
prints a table.  ~4 minutes on the TPU chip, ~10 on CPU.

The reference's analog is its examples-as-test-suite (imagenet_test.py:
121-211, run_squad.py) on real datasets that cannot ship here.
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
import optax

import fp8tpu
from fp8tpu.data import (markov_entropy_floor, mixed_lm_corpus,
                         pattern_images)
from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import ServeConfig, convert_decoder_params
from fp8tpu.serve.model import full_logits
from fp8tpu.training import init_train_state, initialize, make_train_step

OUT = os.path.join(os.path.dirname(__file__), "..", "ACCURACY.json")

# Model presets (VERDICT r2 next #5: scale the gates beyond toy size).
# "large" is a ~90M-param decoder trained to convergence on a larger,
# higher-entropy corpus; "small" keeps the fast ~7M loop for ablations.
MODELS = {
    # lr: 3e-3 suits the 7M model; at 83M it destabilizes FP8 training
    # (loss stalls ~5.5 while bf16 trains through — NOTES r3), so the
    # large preset defaults to 1e-3 for a fair same-lr comparison.
    "small": dict(n_layers=4, d_model=256, n_heads=8, n_kv_heads=4,
                  d_ff=768, vocab=64, seq=128, corpus=16384,
                  default_steps=1500, default_lr=3e-3),
    "large": dict(n_layers=12, d_model=768, n_heads=12, n_kv_heads=4,
                  d_ff=2304, vocab=256, seq=256, corpus=32768,
                  default_steps=3000, default_lr=1e-3),
    # ~200M-class (VERDICT r2 missing #1: "a 100-200M-param decoder
    # trained to real convergence").  Bigger corpus + vocab so the run
    # is not instantly memorized; lr follows the 83M finding (NOTES r3:
    # 3e-3 destabilizes fp8 at scale).
    "xl": dict(n_layers=16, d_model=1024, n_heads=16, n_kv_heads=8,
               d_ff=3072, vocab=512, seq=256, corpus=65536,
               default_steps=4000, default_lr=6e-4),
}


def lm_loss(apply_fn, variables, batch):
    logits = apply_fn(variables, batch[:, :-1])
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, batch[:, 1:])
    return jnp.mean(ce)


def ppl_of(apply_fn, tokens, batch=16):
    tot, n = 0.0, 0
    for i in range(0, tokens.shape[0], batch):
        tb = jnp.asarray(tokens[i:i + batch])
        logits = apply_fn(tb[:, :-1])
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, tb[:, 1:])
        tot += float(jnp.sum(ce))
        n += int(np.prod(ce.shape))
    return float(np.exp(tot / max(n, 1)))


def _opt(lr, steps):
    """Shared recipe: AdamW + cosine + global-norm clipping.  The clip
    matters at 83M: without it both bf16 and fp8 runs show late-phase
    loss spikes (4.3 -> 4.8) that make single-run ΔPPL gaps swing by
    whole nats (NOTES r3)."""
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(lr, steps), b2=0.98,
                    weight_decay=0.01))


def train_bf16(model, variables, train_toks, steps, lr, batch, log=True,
               seed=0):
    """Plain bf16/f32 AdamW training — the fp32 baseline."""
    opt = _opt(lr, steps)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state, batch):
        def loss_of(p):
            return lm_loss(lambda v, t: model.apply(v, t),
                           {"params": p}, batch)
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    rng = np.random.default_rng(seed)
    for i in range(steps):
        idx = rng.integers(0, len(train_toks), batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(train_toks[idx]))
        if log and (i + 1) % max(steps // 5, 1) == 0:
            print(f"    bf16 step {i+1}/{steps} loss {float(loss):.4f}",
                  flush=True)
    return {"params": params}


def train_fp8(model, variables, train_toks, steps, lr, batch, algo,
              master_fmt="fp16", seed=0):
    """FP8 mixed-precision training via the MPT pipeline."""
    emulator = initialize(model, variables,
                          (jnp.asarray(train_toks[:1, :-1]),),
                          training_algo=algo, master_fmt=master_fmt)
    opt = _opt(lr, steps)
    step = jax.jit(make_train_step(
        emulator, opt, lambda af, p, b: lm_loss(af, p, b)))
    params = variables
    opt_state = init_train_state(opt, params)
    rng = np.random.default_rng(seed)
    key = jax.random.key(42 + seed)
    for i in range(steps):
        idx = rng.integers(0, len(train_toks), batch)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(train_toks[idx]), sub)
        if (i + 1) % max(steps // 5, 1) == 0:
            print(f"    {algo} step {i+1}/{steps} loss {float(loss):.4f}",
                  flush=True)
    return params


def _build_lm(model_name, corpus_kind="synthetic"):
    m = MODELS[model_name]
    vocab = m["vocab"] if corpus_kind == "synthetic" else max(
        m["vocab"], 256)  # byte-level corpora need the full byte range
    cfg = tiny_config(n_layers=m["n_layers"], d_model=m["d_model"],
                      n_heads=m["n_heads"], n_kv_heads=m["n_kv_heads"],
                      d_ff=m["d_ff"], vocab_size=vocab,
                      max_seq_len=m["seq"])
    model = Decoder(cfg)
    if corpus_kind == "code":
        # REAL data with no downloads: byte-level Python source from the
        # local environment (data/text.py).  Train/eval draw different
        # random offsets over the same byte stream — fine for ΔPPL gates,
        # which compare quantized vs fp32 on the SAME eval set.
        from fp8tpu.data.text import local_code_corpus
        train_toks = local_code_corpus(m["corpus"], m["seq"], seed=0)
        eval_toks = local_code_corpus(128, m["seq"], seed=777)
        return cfg, model, train_toks, eval_toks
    # enough data that the run stays under ~3 epochs: an overfit model
    # turns quantization noise into (anti-)regularization and makes
    # ΔPPL meaningless
    train_toks = mixed_lm_corpus(m["corpus"], m["seq"], m["vocab"], seed=0)
    eval_toks = mixed_lm_corpus(128, m["seq"], m["vocab"], seed=777)
    return cfg, model, train_toks, eval_toks


def _trained_baseline(model_name, model, variables, train_toks, steps,
                      lr, batch, corpus_kind="synthetic"):
    """bf16 baseline weights, checkpoint-cached per (model, lr, steps)."""
    tag = "" if corpus_kind == "synthetic" else f"_{corpus_kind}"
    ckpt_dir = os.path.join(
        os.path.dirname(__file__), "..",
        f".cache_accuracy_{model_name}_lr{lr:g}_clip{tag}")
    from fp8tpu.utils.checkpoint import restore_checkpoint, save_checkpoint
    trained = None
    if os.environ.get("ACC_REUSE") == "1":
        try:
            trained = restore_checkpoint(
                ckpt_dir, steps, {"params": variables})["state"]["params"]
            print("[lm] reusing cached trained weights")
        except Exception:
            trained = None
    if trained is None:
        t0 = time.time()
        trained = train_bf16(model, variables, train_toks, steps, lr,
                             batch)
        print(f"[lm] bf16 training {time.time()-t0:.0f}s")
        try:
            save_checkpoint(ckpt_dir, steps, trained)
        except Exception as e:
            print("[lm] checkpoint save skipped:", e)
    return trained


def lm_gates(steps, batch, lr, results, model_name="small",
             corpus_kind="synthetic"):
    m = MODELS[model_name]
    cfg, model, train_toks, eval_toks = _build_lm(model_name, corpus_kind)
    n_params = sum(np.prod(s.shape) for s in jax.tree.leaves(
        jax.eval_shape(lambda: model.init(
            jax.random.key(1), jnp.asarray(train_toks[:1, :-1])))))
    if corpus_kind == "synthetic":
        floor = markov_entropy_floor(m["vocab"])
        print(f"[lm] model={model_name} ({n_params/1e6:.1f}M params) "
              f"corpus entropy floor (markov half): ppl ~{floor:.2f}")
    else:
        floor = float("nan")
        print(f"[lm] model={model_name} ({n_params/1e6:.1f}M params) "
              f"corpus={corpus_kind} (real byte-level text)")

    variables = model.init(jax.random.key(1),
                           jnp.asarray(train_toks[:1, :-1]))
    # NOTE: the cache key is (model_name, step count) — delete
    # .cache_accuracy_* after changing the corpus or training recipe.
    trained = _trained_baseline(model_name, model, variables, train_toks,
                                steps, lr, batch, corpus_kind)

    # params must be RUNTIME ARGS of every jitted apply: a closure bakes
    # them into the compile payload as constants, which the tunneled
    # remote-compile endpoint rejects at ~90M params (HTTP 413).
    japply = jax.jit(lambda v, t: model.apply(v, t))
    base = ppl_of(lambda tb: japply(trained, tb), eval_toks)
    prev_training = results.get("lm", {}).get("training")
    results["lm"] = {"model": model_name, "corpus": corpus_kind,
                     "steps": steps,
                     "params_m": round(float(n_params) / 1e6, 1),
                     "entropy_floor_markov": (round(floor, 3)
                                              if floor == floor else None),
                     "fp32_ppl": round(base, 4), "policies": {}}
    if prev_training:
        results["lm"]["training"] = prev_training
    print(f"[lm] trained fp32 eval ppl {base:.4f}")

    # 1. PTQ emulation policies on the trained weights.  The classifier
    # head (here: the tied embedding/LM head) is exempt, matching the
    # reference recipe (imagenet_test.py:24-71 exempts first conv +
    # classifier; run_squad.py exempts qa_outputs).
    calib = [jnp.asarray(train_toks[:16, :-1])]
    for dtype in ("e4m3", "e3m4", "e5m2", "hybrid", "bfloat16"):
        qm = fp8tpu.quantize_model(model, trained,
                                   (jnp.asarray(eval_toks[:1, :-1]),),
                                   dtype=dtype, calibration_batches=calib,
                                   list_exempt_layers=("embed",))
        jq = jax.jit(lambda v, tb: qm.apply(tb, variables=v))
        p = ppl_of(lambda tb, _v=qm.variables: jq(_v, tb), eval_toks)
        results["lm"]["policies"][dtype] = {
            "ppl": round(p, 4), "delta_ppl": round(p - base, 4)}
        print(f"[lm] PTQ {dtype:9s} ppl {p:.4f}  Δ {p-base:+.4f}")

    # 2. the real serving artifact (what bench.py measures).  The bf16
    # variant is the serving-path referent: it shares the bf16 compute
    # precision of real TPU serving, so delta_vs_serve_bf16 isolates
    # what QUANTIZATION costs (delta_ppl against the f32 emulation eval
    # mostly measures bf16 arithmetic, which the unquantized baseline
    # pays identically — kv=bf16 ablation confirms).
    serve_ppls = {}
    for fmt, kv in (("bf16", "bf16"), ("e4m3", "e4m3"), ("e4m3", "int8"),
                    ("e4m3", "bf16"), ("e4m3", "e5m2"), ("int8", "int8"),
                    ("int4", "int8"), ("int4", "e4m3")):
        scfg = ServeConfig(model=cfg, weight_fmt=fmt, kv_fmt=kv)
        sparams = convert_decoder_params(trained, cfg, fmt=fmt)
        jfl = jax.jit(lambda sp, t, _c=scfg: full_logits(sp, t, _c))

        def sv_apply(tb, jfl=jfl, sparams=sparams):
            return jnp.stack([jfl(sparams, t) for t in tb])
        p = ppl_of(sv_apply, eval_toks[:64])
        tag = f"serve_{fmt}_kv{kv}"
        serve_ppls[tag] = p
        rec = {"ppl": round(p, 4), "delta_ppl": round(p - base, 4)}
        ref = serve_ppls.get("serve_bf16_kvbf16")
        if ref is not None:
            rec["delta_vs_serve_bf16"] = round(p - ref, 4)
        results["lm"]["policies"][tag] = rec
        extra = (f"  Δserve_bf16 {rec['delta_vs_serve_bf16']:+.4f}"
                 if "delta_vs_serve_bf16" in rec else "")
        print(f"[lm] {tag:18s} ppl {p:.4f}  Δ {p-base:+.4f}{extra}")

    # 3. FP8 training convergence parity (same budget from same init)
    if os.environ.get("ACC_SKIP_TRAINING") == "1":
        print("[lm] FP8-training section skipped (ACC_SKIP_TRAINING=1)")
        return
    # hybrid-scaled = e4m3 per-tensor fwd + per-tensor-scaled e5m2-SR
    # bwd: the r4 83M ablation found the shared UNSCALED backward stream
    # was the entire ~0.086-nats gap (hybrid == direct because they share
    # it); scaling the backward closes it to +0.008 nats — gate PASS.
    # hybrid-gemm = production scoping (GEMM streams only).  The r4 83M
    # budget study: whole-whitelist recipes (reference hook scoping)
    # plateau +0.07 nats pre-transition and FAIL the corpus's 3000-6000
    # phase transition; hybrid-gemm crosses it and BEATS bf16 at 6000
    # steps (17.2 vs 24.7 ppl, ACCURACY_BUDGET.json gemm_recipe_6000).
    results["lm"]["training"] = {"bf16_ppl": round(base, 4),
                                 "steps": steps}
    for algo in ("hybrid", "direct", "hybrid-gemm"):
        t0 = time.time()
        tp = train_fp8(model, variables, train_toks, steps, lr, batch,
                       algo)
        p = ppl_of(lambda tb, _p=tp: japply(_p, tb), eval_toks)
        results["lm"]["training"][f"{algo}_ppl"] = round(p, 4)
        results["lm"]["training"][f"{algo}_gap"] = round(p - base, 4)
        results["lm"]["training"][f"{algo}_gap_nats"] = round(
            float(np.log(p) - np.log(base)), 4)
        print(f"[lm] {algo} FP8-trained ppl {p:.4f} "
              f"(gap {p-base:+.4f}, {time.time()-t0:.0f}s)")


def moe_gates(steps, batch, lr, results, recipes=("hybrid",
                                                  "hybrid-gemm")):
    """Trained-MoE gates: a 4-expert top-2 decoder (small preset width)
    trained WITH the Switch aux load-balancing loss, then (a) the real
    MoE serving artifact's ΔPPL vs its bf16 serving twin (gate ≤ 0.1 —
    the untrained-router corr check in tests is tie-dominated; this is
    the meaningful number) and (b) hybrid-FP8 training parity."""
    from fp8tpu.models import moe_aux_loss

    m = MODELS["small"]
    cfg = tiny_config(n_layers=m["n_layers"], d_model=m["d_model"],
                      n_heads=m["n_heads"], n_kv_heads=m["n_kv_heads"],
                      d_ff=m["d_ff"], vocab_size=m["vocab"],
                      max_seq_len=m["seq"], n_experts=4, moe_top_k=2,
                      moe_capacity_factor=1.5)
    model = Decoder(cfg)
    train_toks = mixed_lm_corpus(m["corpus"], m["seq"], m["vocab"], seed=0)
    eval_toks = mixed_lm_corpus(128, m["seq"], m["vocab"], seed=777)
    variables = model.init(jax.random.key(1),
                           jnp.asarray(train_toks[:1, :-1]))
    n_params = sum(np.prod(p.shape)
                   for p in jax.tree.leaves(variables))

    def loss_moe(apply_fn, v, b):
        logits, inter = apply_fn(v, b[:, :-1], mutable=["intermediates"])
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, b[:, 1:]).mean()
        return ce + 0.01 * moe_aux_loss(inter)

    opt = _opt(lr, steps)

    @jax.jit
    def bstep(params, opt_state, b):
        def loss_of(p):
            return loss_moe(lambda v, t, **kw: model.apply(v, t, **kw),
                            {"params": p}, b)
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    expert_p = cfg.n_layers * cfg.n_experts * 2 * cfg.d_model * cfg.d_ff
    active_p = n_params - expert_p + (cfg.moe_top_k * expert_p
                                      // cfg.n_experts)
    print(f"[moe] {cfg.n_experts}-expert top-{cfg.moe_top_k} decoder "
          f"({n_params/1e6:.1f}M params, ~{active_p/1e6:.1f}M active)")
    t0 = time.time()
    params = variables["params"]
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    for i in range(steps):
        idx = rng.integers(0, len(train_toks), batch)
        params, opt_state, loss = bstep(params, opt_state,
                                        jnp.asarray(train_toks[idx]))
        if (i + 1) % max(steps // 5, 1) == 0:
            print(f"    moe bf16 step {i+1}/{steps} "
                  f"loss {float(loss):.4f}", flush=True)
    trained = {"params": params}
    print(f"[moe] bf16 training {time.time()-t0:.0f}s")

    japply = jax.jit(lambda v, t: model.apply(v, t))
    base = ppl_of(lambda tb: japply(trained, tb), eval_toks)
    # router balance on the trained model (Switch aux ≈ 1 = balanced)
    _, inter = model.apply(trained, jnp.asarray(eval_toks[:8, :-1]),
                           mutable=["intermediates"])
    aux = float(moe_aux_loss(inter))
    results["moe"] = {"params_m": round(float(n_params) / 1e6, 1),
                      "steps": steps, "experts": 4, "top_k": 2,
                      "fp32_ppl": round(base, 4),
                      "router_balance_aux": round(aux, 3),
                      "policies": {}}
    print(f"[moe] trained eval ppl {base:.4f}, router aux {aux:.3f}")

    serve_ppls = {}
    for fmt, kv in (("bf16", "bf16"), ("e4m3", "int8"), ("e4m3", "e4m3"),
                    ("int8", "int8"), ("int4", "int8")):
        scfg = ServeConfig(model=cfg, weight_fmt=fmt, kv_fmt=kv)
        sparams = convert_decoder_params(trained, cfg, fmt=fmt)
        jfl = jax.jit(lambda sp, t, _c=scfg: full_logits(sp, t, _c))

        def sv_apply(tb, jfl=jfl, sparams=sparams):
            return jnp.stack([jfl(sparams, t) for t in tb])
        p = ppl_of(sv_apply, eval_toks[:64])
        tag = f"serve_{fmt}_kv{kv}"
        serve_ppls[tag] = p
        rec = {"ppl": round(p, 4), "delta_ppl": round(p - base, 4)}
        ref = serve_ppls.get("serve_bf16_kvbf16")
        if ref is not None:
            rec["delta_vs_serve_bf16"] = round(p - ref, 4)
        results["moe"]["policies"][tag] = rec
        extra = (f"  Δserve_bf16 {rec['delta_vs_serve_bf16']:+.4f}"
                 if "delta_vs_serve_bf16" in rec else "")
        print(f"[moe] {tag:18s} ppl {p:.4f}  Δ {p-base:+.4f}{extra}")

    if os.environ.get("ACC_SKIP_TRAINING") == "1":
        return
    # FP8 training parity, aux loss included.  The recipe is a PARAMETER
    # (VERDICT r4 weak #1: the r4 run hard-coded "hybrid" — the exact
    # whole-whitelist scoping the budget study says stalls under
    # quantized norm/residual gradient streams — and published the miss
    # without ever trying the recommended hybrid-gemm recipe on MoE).
    # A recipe token may carry a module-exemption suffix: "X@norouter"
    # trains recipe X with the router Dense exempted — the cell that
    # tests whether fp8 noise on ROUTER LOGITS (discrete routing
    # decisions amplify small perturbations) is what keeps MoE training
    # from parity when the expert/GEMM streams alone are quantized.
    results["moe"]["training"] = {"bf16_ppl": round(base, 4),
                                  "steps": steps}
    for recipe in recipes:
        algo, _, mod = recipe.partition("@")
        exempt = ("*router*",) if mod == "norouter" else ()
        emulator = initialize(model, variables,
                              (jnp.asarray(train_toks[:1, :-1]),),
                              training_algo=algo, master_fmt="fp16",
                              exempt_layers=exempt)
        qstep = jax.jit(make_train_step(emulator, _opt(lr, steps),
                                        loss_moe))
        qparams = variables
        qopt = init_train_state(_opt(lr, steps), qparams)
        rng = np.random.default_rng(0)
        key = jax.random.key(42)
        t0 = time.time()
        for i in range(steps):
            idx = rng.integers(0, len(train_toks), batch)
            key, sub = jax.random.split(key)
            qparams, qopt, loss = qstep(qparams, qopt,
                                        jnp.asarray(train_toks[idx]), sub)
            if (i + 1) % max(steps // 5, 1) == 0:
                print(f"    moe {recipe} step {i+1}/{steps} "
                      f"loss {float(loss):.4f}", flush=True)
        p = ppl_of(lambda tb: japply(qparams, tb), eval_toks)
        results["moe"]["training"][f"{recipe}_ppl"] = round(p, 4)
        results["moe"]["training"][f"{recipe}_gap"] = round(p - base, 4)
        results["moe"]["training"][f"{recipe}_gap_nats"] = round(
            float(np.log(p) - np.log(base)), 4)
        print(f"[moe] {recipe} FP8-trained ppl {p:.4f} (gap {p-base:+.4f}, "
              f"{time.time()-t0:.0f}s)")


def direct_recipe_gates(steps, batch, lr, results, model_name="small",
                        recipes=None, out_key="direct_recipe"):
    """FP8-training recipe ablation (VERDICT r2 next #5 / r3 next #1).
    Same init, same budget, against the cached bf16 baseline:
    {fp16, fp32} master x {unscaled, per-tensor-scaled} E5M2 casts, plus
    the hybrid control and hybrid with per-tensor-scaled backward (the
    cell that tests whether the shared unscaled e5m2 backward stream is
    why hybrid and direct coincide at 83M).  Gates are nats-based:
    gap_nats = ln(ppl) - ln(ppl_bf16); parity gate is <= 0.05 nats."""
    m = MODELS[model_name]
    cfg, model, train_toks, eval_toks = _build_lm(model_name)
    variables = model.init(jax.random.key(1),
                           jnp.asarray(train_toks[:1, :-1]))
    japply = jax.jit(lambda v, t: model.apply(v, t))
    # ACC_BF16_PPL=<ppl> skips (re)training the bf16 referent and uses a
    # previously RECORDED baseline eval ppl for the gap computation —
    # valid because the baseline run is fully deterministic (same seed,
    # data schedule, recipe) and eval_toks regenerate identically; used
    # when a prior round's artifact already carries the number (e.g.
    # ACCURACY_BUDGET gemm_recipe_6000.bf16_ppl) and the wall-clock is
    # better spent on the new fp8 cells.
    if os.environ.get("ACC_BF16_PPL"):
        base = float(os.environ["ACC_BF16_PPL"])
        print(f"[direct] using recorded bf16 referent ppl {base:.4f} "
              "(ACC_BF16_PPL)")
    else:
        trained = _trained_baseline(model_name, model, variables,
                                    train_toks, steps, lr, batch)
        base = ppl_of(lambda tb: japply(trained, tb), eval_toks)
    out = {"bf16_ppl": round(base, 4), "model": model_name,
           "steps": steps, "gate_nats": 0.05}
    if recipes is None:
        recipes = (("direct", "fp16"), ("direct", "fp32"),
                   ("direct-scaled", "fp16"), ("direct-scaled", "fp32"),
                   ("hybrid", "fp16"), ("hybrid-scaled", "fp16"),
                   ("hybrid-scaled", "fp32"))
    best = None
    for algo, master in recipes:
        t0 = time.time()
        tp = train_fp8(model, variables, train_toks, steps, lr, batch,
                       algo, master_fmt=master)
        p = ppl_of(lambda tb, _p=tp: japply(_p, tb), eval_toks)
        tag = f"{algo}_{master}"
        nats = float(np.log(p) - np.log(base))
        out[f"{tag}_ppl"] = round(p, 4)
        out[f"{tag}_gap"] = round(p - base, 4)
        out[f"{tag}_gap_nats"] = round(nats, 4)
        best = min(best, nats) if best is not None else nats
        print(f"[direct] {tag:22s} ppl {p:.4f} (gap {p-base:+.4f} = "
              f"{nats:+.4f} nats, {time.time()-t0:.0f}s)", flush=True)
    out["best_gap_nats"] = round(best, 4)
    out["gate_pass"] = bool(best <= out["gate_nats"])
    results[out_key] = out
    print(f"[direct] best gap {best:+.4f} nats; "
          f"gate(<=0.05) {'PASS' if out['gate_pass'] else 'MISS'}")


def seed_variance_gates(steps, batch, lr, results, model_name="large"):
    """Run-to-run spread of the headline cells (the r4 role ablation
    showed single-run swings of whole-nats order are possible at 83M):
    bf16 / hybrid / hybrid-scaled at data-order seeds {0,1,2}.  The
    parity claim is then mean±spread, not one lucky run."""
    cfg, model, train_toks, eval_toks = _build_lm(model_name)
    variables = model.init(jax.random.key(1),
                           jnp.asarray(train_toks[:1, :-1]))
    japply = jax.jit(lambda v, t: model.apply(v, t))
    out = {"model": model_name, "steps": steps, "seeds": [0, 1, 2]}
    for recipe in ("bf16", "hybrid", "hybrid-scaled"):
        ppls = []
        for seed in (0, 1, 2):
            t0 = time.time()
            if recipe == "bf16":
                if seed == 0:
                    tp = _trained_baseline(model_name, model, variables,
                                           train_toks, steps, lr, batch)
                else:
                    tp = train_bf16(model, variables, train_toks, steps,
                                    lr, batch, log=False, seed=seed)
            else:
                tp = train_fp8(model, variables, train_toks, steps, lr,
                               batch, recipe, seed=seed)
            p = ppl_of(lambda tb, _p=tp: japply(_p, tb), eval_toks)
            ppls.append(p)
            print(f"[seeds] {recipe:13s} seed={seed} ppl {p:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        nats = [float(np.log(p)) for p in ppls]
        out[recipe] = {
            "ppls": [round(p, 4) for p in ppls],
            "mean_ppl": round(float(np.mean(ppls)), 4),
            "spread_nats": round(max(nats) - min(nats), 4)}
    bm = np.log(out["bf16"]["mean_ppl"])
    for recipe in ("hybrid", "hybrid-scaled"):
        out[recipe]["mean_gap_nats"] = round(
            float(np.log(out[recipe]["mean_ppl"]) - bm), 4)
    results["seed_variance"] = out
    print(f"[seeds] mean gaps: hybrid "
          f"{out['hybrid']['mean_gap_nats']:+.4f} nats, hybrid-scaled "
          f"{out['hybrid-scaled']['mean_gap_nats']:+.4f} nats "
          f"(bf16 spread {out['bf16']['spread_nats']:.4f})")


def conv_gates(steps, results):
    """Tiny conv net QAT parity on pattern images."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(16, (3, 3), name="conv1")(x)
            x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), (2, 2))
            x = nn.Conv(32, (3, 3), name="conv2")(x)
            x = nn.relu(x)
            x = x.mean(axis=(1, 2))
            return nn.Dense(8, name="head")(x)

    xs, ys = pattern_images(4096, seed=0)
    xe, ye = pattern_images(512, seed=9)
    model = Net()
    variables = model.init(jax.random.key(0), jnp.asarray(xs[:1]))
    opt = optax.adam(3e-3)

    def accuracy(apply_fn):
        logits = apply_fn(jnp.asarray(xe))
        return float((jnp.argmax(logits, -1) == jnp.asarray(ye)).mean())

    # fp32 training
    @jax.jit
    def step32(params, opt_state, bx, by):
        def loss_of(p):
            lg = model.apply({"params": p}, bx)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(lg, by))
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    params = variables["params"]
    opt_state = opt.init(params)
    for i in range(steps):
        idx = rng.integers(0, len(xs), 64)
        params, opt_state, _ = step32(params, opt_state,
                                      jnp.asarray(xs[idx]),
                                      jnp.asarray(ys[idx]))
    acc32 = accuracy(jax.jit(
        lambda x: model.apply({"params": params}, x)))

    # e4m3 QAT (quantized forward in the loss; STE backward)
    from fp8tpu.quant.interceptor import build_module_table, quantized_apply
    from fp8tpu.quant.policy import e4m3_inference_policy
    pol = e4m3_inference_policy(calibrated=False)
    table = build_module_table(model, variables, jnp.asarray(xs[:1]))

    @jax.jit
    def stepq(params, opt_state, bx, by):
        def loss_of(p):
            lg = quantized_apply(model, pol, {"params": p}, bx,
                                 module_table=table)
            return jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(lg, by))
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    qparams = variables["params"]
    qopt_state = opt.init(qparams)
    for i in range(steps):
        idx = rng.integers(0, len(xs), 64)
        qparams, qopt_state, _ = stepq(qparams, qopt_state,
                                       jnp.asarray(xs[idx]),
                                       jnp.asarray(ys[idx]))
    accq = accuracy(jax.jit(lambda x: quantized_apply(
        model, pol, {"params": qparams}, x, module_table=table)))
    # and the QAT-trained weights evaluated fp32 (deploy-as-fp32 check)
    accq32 = accuracy(jax.jit(
        lambda x: model.apply({"params": qparams}, x)))

    results["conv_qat"] = {
        "steps": steps,
        "fp32_acc": round(acc32, 4),
        "e4m3_qat_acc": round(accq, 4),
        "e4m3_qat_fp32eval_acc": round(accq32, 4),
        "gap": round(acc32 - accq, 4),
    }
    print(f"[conv] fp32 acc {acc32:.4f}  e4m3-QAT acc {accq:.4f} "
          f"(gap {acc32-accq:+.4f})")


def vit_gates(steps, results):
    """Trained-ViT PTQ gate: fp32-train the tiny ViT on pattern images,
    then PTQ it at the reference dtype sweep through the public
    quantize_model flow (first-conv + classifier exempt, calibration) —
    the attention-family analog of conv_gates.

    Two regimes: "clean" (noise 0.3, the conv gate's data — the task
    saturates at 1.0, so the cell only proves no catastrophic damage)
    and "hard" (noise 4.0 — fp32 lands below ceiling, giving PTQ
    degradation headroom to show).  Gate: |top-1 delta| <= 0.02 per
    dtype in both regimes."""
    import fp8tpu
    from fp8tpu.models.vision import VIT_EXEMPT, tiny_vit

    def cell(noise):
        xs, ys = pattern_images(4096, noise=noise, seed=0)
        xe, ye = pattern_images(512, noise=noise, seed=9)
        model = tiny_vit(8)
        variables = model.init(jax.random.key(0), jnp.asarray(xs[:1]))
        opt = optax.adamw(1e-3, weight_decay=1e-4)

        def accuracy(apply_fn):
            logits = apply_fn(jnp.asarray(xe))
            return float((jnp.argmax(logits, -1) == jnp.asarray(ye))
                         .mean())

        @jax.jit
        def step32(params, opt_state, bx, by):
            def loss_of(p):
                lg = model.apply({"params": p}, bx)
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        lg, by))
            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        rng = np.random.default_rng(0)
        params = variables["params"]
        opt_state = opt.init(params)
        for i in range(steps):
            idx = rng.integers(0, len(xs), 64)
            params, opt_state, _ = step32(params, opt_state,
                                          jnp.asarray(xs[idx]),
                                          jnp.asarray(ys[idx]))
        trained = {"params": params}
        acc32 = accuracy(jax.jit(lambda x: model.apply(trained, x)))

        out = {"fp32_acc": round(acc32, 4)}
        calib = [jnp.asarray(xs[i * 64:(i + 1) * 64]) for i in range(4)]
        for dtype in ("e4m3", "e3m4", "hybrid"):
            qm = fp8tpu.quantize_model(
                model, trained, (jnp.asarray(xs[:2]),), dtype=dtype,
                calibration_batches=calib,
                list_exempt_layers=VIT_EXEMPT)
            jq = jax.jit(lambda xb, qm=qm: qm.apply(xb,
                                                    variables=qm.variables))
            acc = accuracy(jq)
            out[f"{dtype}_ptq_acc"] = round(acc, 4)
            out[f"{dtype}_gap"] = round(acc32 - acc, 4)
            print(f"[vit noise={noise}] {dtype:6s} PTQ acc {acc:.4f} "
                  f"(gap {acc32-acc:+.4f})")
        print(f"[vit noise={noise}] fp32 acc {acc32:.4f}")
        return out

    results["vit_ptq"] = {"steps": steps,
                          "clean": cell(0.3),
                          "hard_noise4": cell(4.0)}

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=None,
                    help="defaults to the model preset's budget")
    ap.add_argument("--model", choices=sorted(MODELS), default="small")
    ap.add_argument("--conv_steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=None,
                    help="defaults to the model preset's lr")
    ap.add_argument("--direct_ablation", action="store_true",
                    help="run the 4-recipe direct-training ablation")
    ap.add_argument("--seed_ablation", action="store_true",
                    help="3-seed run-to-run variance of bf16 / hybrid / "
                         "hybrid-scaled (quantifies the noise floor the "
                         "parity gate sits on)")
    ap.add_argument("--role_ablation", action="store_true",
                    help="hybrid training with single quantization "
                         "streams dropped — localizes which stream "
                         "(fwd casts / activation grads / weight grads) "
                         "carries the convergence cost at scale")
    ap.add_argument("--vit", action="store_true",
                    help="run the trained-ViT PTQ gate (pattern images)")
    ap.add_argument("--moe", action="store_true",
                    help="run the trained-MoE serving/training gates "
                         "(small preset, 4 experts)")
    ap.add_argument("--moe_recipes", default="hybrid,hybrid-gemm",
                    help="comma-separated FP8 training recipes for the "
                         "MoE training-parity cells")
    ap.add_argument("--corpus", choices=["synthetic", "code"],
                    default="synthetic",
                    help="'code' trains on REAL byte-level Python source "
                         "from the local environment (fp8tpu.data.text); "
                         "pair with --out ACCURACY_CODE.json")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    steps = args.steps or MODELS[args.model]["default_steps"]
    if args.lr is None:
        args.lr = MODELS[args.model]["default_lr"]

    results = {"steps": steps, "backend": jax.default_backend()}
    # merge over a previous run so skipped sections keep their numbers
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            results = {**prev, **results}
        except Exception:
            pass
    if os.environ.get("ACC_SKIP_LM") != "1":
        lm_gates(steps, args.batch, args.lr, results, args.model,
                 args.corpus)
    if args.direct_ablation:
        direct_recipe_gates(steps, args.batch, args.lr, results,
                            args.model)
    if args.seed_ablation:
        seed_variance_gates(steps, args.batch, args.lr, results,
                            args.model)
    if args.role_ablation:
        direct_recipe_gates(
            steps, args.batch, args.lr, results, args.model,
            recipes=(("hybrid-fwd-only", "fp32"),
                     ("hybrid-bwd-only", "fp32"),
                     ("hybrid-no-wtgrad", "fp32"),
                     ("hybrid-no-actgrad", "fp32")),
            out_key="role_ablation")
    if args.moe:
        moe_gates(steps if args.steps else MODELS["small"]["default_steps"],
                  args.batch, MODELS["small"]["default_lr"], results,
                  recipes=tuple(r for r in args.moe_recipes.split(",")
                                if r))
    if os.environ.get("ACC_SKIP_CONV") != "1":
        conv_gates(args.conv_steps, results)
    if args.vit:
        vit_gates(args.conv_steps, results)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", os.path.abspath(args.out))

    # Gate summary.  PTQ emulation policies gate on ΔPPL vs the f32
    # eval; serving variants gate on delta_vs_serve_bf16 (the bf16
    # serving twin shares their compute precision — the raw Δ mostly
    # measures bf16 arithmetic, which the baseline pays identically).
    pol = results.get("lm", {}).get("policies")
    if pol:
        ptq_worst = max(abs(v["delta_ppl"]) for k, v in pol.items()
                        if not k.startswith("serve_") and k != "e5m2")
        serve_worst = max(abs(v.get("delta_vs_serve_bf16", 0.0))
                          for k, v in pol.items()
                          if k.startswith("serve_") and "int4" not in k)
        print(f"GATES (target ≤ 0.1): PTQ worst |ΔPPL| {ptq_worst:.4f}; "
              f"serving worst |Δ vs bf16 twin| {serve_worst:.4f}; "
              f"e5m2 PTQ Δ {pol['e5m2']['delta_ppl']:+.4f} "
              "(training format); int4 capacity mode Δ "
              f"{pol.get('serve_int4_kvint8', {}).get('delta_vs_serve_bf16', 0):+.4f}")
    if "moe" in results and results["moe"].get("policies"):
        mw = max(abs(v.get("delta_vs_serve_bf16", 0.0))
                 for v in results["moe"]["policies"].values())
        tr = results["moe"].get("training", {})
        gaps = "".join(f"; {k[:-9]} training gap {v:+.4f} nats"
                       for k, v in tr.items() if k.endswith("_gap_nats"))
        print(f"MoE GATES: serving worst |Δ vs bf16 twin| {mw:.4f}{gaps}")
    if "conv_qat" in results:
        print(f"conv QAT gap {results['conv_qat']['gap']:+.4f}")


if __name__ == "__main__":
    main()
