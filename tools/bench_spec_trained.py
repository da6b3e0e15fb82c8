#!/usr/bin/env python
"""Speculative decoding with a TRAINED draft (VERDICT r3 next #3).

The r3 spec bench had no winnable cell: self-draft prices drafting at
target cost (a ceiling of <1x by construction) and its small draft was
random (acceptance 0).  This bench builds the production configuration:

  * target = the 83M gate-stack decoder (the cached bf16 baseline the
    accuracy gates train, .cache_accuracy_large_lr0.001_clip),
  * draft  = a ~6M 2-layer decoder TRAINED on the same corpus (cached
    in .cache_spec_draft), sharing the target's vocab,

both converted to the real e4m3 serving artifact, then measures engine
throughput: plain paged vs speculation at K x rounds-per-dispatch
grids, at a latency-bound batch (slots=4) and a throughput batch
(slots=16).  Speculation's win condition on TPU is weight-bytes: the
83M target streams its weights once per verify pass instead of once
per token, and the draft adds only ~7% of the target's bytes per
drafted token.

Writes PERF_EXTRAS.json["spec_trained"].  Run on the real chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "PERF_EXTRAS.json")
ROOT = os.path.join(os.path.dirname(__file__), "..")


def get_target():
    from fp8tpu.models import Decoder, tiny_config
    from fp8tpu.utils.checkpoint import restore_checkpoint
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from accuracy_gates import MODELS

    m = MODELS["large"]
    cfg = tiny_config(n_layers=m["n_layers"], d_model=m["d_model"],
                      n_heads=m["n_heads"], n_kv_heads=m["n_kv_heads"],
                      d_ff=m["d_ff"], vocab_size=m["vocab"],
                      max_seq_len=m["seq"])
    model = Decoder(cfg)
    variables = model.init(jax.random.key(1),
                           jnp.zeros((1, 8), jnp.int32))
    ckpt = os.path.join(ROOT, f".cache_accuracy_large_lr{1e-3:g}_clip")
    # save_checkpoint wraps its arg as state={"params": arg}; the gates
    # cache stores the full variables tree, so template nests twice
    # (same call shape as accuracy_gates._trained_baseline).
    trained = restore_checkpoint(ckpt, m["default_steps"],
                                 {"params": variables})["state"]["params"]
    return cfg, trained, m


def get_draft(m, steps=1500, lr=3e-3, batch=32):
    """2-layer draft sharing the target's vocab, trained on the same
    corpus (cached)."""
    import optax
    from fp8tpu.data import mixed_lm_corpus
    from fp8tpu.models import Decoder, tiny_config
    from fp8tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    dcfg = tiny_config(n_layers=2, d_model=256, n_heads=8, n_kv_heads=4,
                       d_ff=768, vocab_size=m["vocab"],
                       max_seq_len=m["seq"])
    model = Decoder(dcfg)
    toks = mixed_lm_corpus(m["corpus"], m["seq"], m["vocab"], seed=0)
    variables = model.init(jax.random.key(2),
                           jnp.asarray(toks[:1, :-1]))
    ckpt = os.path.join(ROOT, ".cache_spec_draft")
    try:
        trained = restore_checkpoint(
            ckpt, steps, {"params": variables})["state"]["params"]
        print("[draft] reusing cached draft")
        return dcfg, trained
    except Exception:
        pass
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(optax.cosine_decay_schedule(lr, steps),
                                  b2=0.98, weight_decay=0.01))
    params = variables["params"]
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, b):
        def loss_of(p):
            lg = model.apply({"params": p}, b[:, :-1])
            import optax as ox
            return ox.softmax_cross_entropy_with_integer_labels(
                lg, b[:, 1:]).mean()
        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(steps):
        idx = rng.integers(0, len(toks), batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(toks[idx]))
        if (i + 1) % (steps // 3) == 0:
            print(f"[draft] step {i+1}/{steps} loss {float(loss):.4f}",
                  flush=True)
    print(f"[draft] trained in {time.time()-t0:.0f}s")
    trained = {"params": params}
    try:
        save_checkpoint(ckpt, steps, trained)
    except Exception as e:
        print("[draft] cache save skipped:", e)
    return dcfg, trained


def main():
    from fp8tpu.data import mixed_lm_corpus
    from fp8tpu.serve import Request, ServeConfig, ServingEngine, \
        convert_decoder_params

    cfg, tvars, m = get_target()
    dcfg, dvars = get_draft(m)
    params = convert_decoder_params(tvars, cfg, fmt="e4m3")
    dparams = convert_decoder_params(dvars, dcfg, fmt="e4m3")
    scfg = ServeConfig(model=cfg, kv_fmt="int8")
    dscfg = ServeConfig(model=dcfg, kv_fmt="int8")
    n_tp = sum(np.prod(x.shape) for x in jax.tree.leaves(tvars))
    n_dp = sum(np.prod(x.shape) for x in jax.tree.leaves(dvars))
    print(f"[spec-trained] target {n_tp/1e6:.1f}M, draft {n_dp/1e6:.1f}M "
          f"({n_dp/n_tp:.1%} of target)")

    # real corpus prompts (speculation acceptance is data-dependent)
    toks = mixed_lm_corpus(64, m["seq"], m["vocab"], seed=5)

    def reqs(n, plen=48, new=160, **kw):
        return [Request(uid=i, prompt=[int(t) for t in toks[i][:plen]],
                        max_new_tokens=new, **kw) for i in range(n)]

    MAXSEQ = m["seq"]

    def run(engine, rs, label):
        t0 = time.time()
        done = engine.run(rs)
        dt = time.time() - t0
        total = sum(len(v) for v in done.values())
        tok_s = total / dt
        print(f"[spec-trained] {label}: {total} tok in {dt:.1f}s "
              f"= {tok_s:.0f} tok/s", flush=True)
        return tok_s

    out = {"target_params_m": round(float(n_tp) / 1e6, 1),
           "draft_params_m": round(float(n_dp) / 1e6, 1)}
    # b1 = the pure LATENCY cell (one request at a time — where
    # speculation matters most); b4 = the r4 winning batch; b16 = the
    # throughput batch where weight streams already amortize and
    # speculation is expected to lose (VERDICT r4 next #8).
    for slots, nreq, tag in ((1, 3, "b1"), (4, 8, "b4"), (16, 32, "b16")):
        new = min(160, MAXSEQ - 64)
        plain = ServingEngine(params, scfg, n_slots=slots, max_seq=MAXSEQ,
                              chunk_size=64, use_paged=True, page_size=32,
                              depth=2)
        # warm compile out of the measurement
        run(plain, reqs(2, new=8), f"{tag} warm")
        out[f"plain_{tag}_tok_s"] = round(
            run(plain, reqs(nreq, new=new), f"plain {tag}"), 1)
        for k, rpd in ((4, 1), (4, 4), (8, 2)):
            eng = ServingEngine(params, scfg, n_slots=slots,
                                max_seq=MAXSEQ, use_paged=True,
                                page_size=32, depth=2,
                                draft_params=dparams, draft_cfg=dscfg,
                                k_spec=k, spec_rounds_per_dispatch=rpd)
            run(eng, reqs(2, new=8), f"{tag} spec warm")
            t = run(eng, reqs(nreq, new=new),
                    f"spec {tag} K={k} rpd={rpd}")
            acc = eng.spec_accepted / max(eng.spec_drafted, 1)
            out[f"spec_{tag}_k{k}_rpd{rpd}_tok_s"] = round(t, 1)
            out[f"spec_{tag}_k{k}_rpd{rpd}_acceptance"] = round(acc, 3)
            out[f"spec_{tag}_k{k}_rpd{rpd}_vs_plain"] = round(
                t / out[f"plain_{tag}_tok_s"], 3)

    # filtered-sampling spec cell (VERDICT r4 next #8): top-p nucleus
    # sampling through the lossless filtered rejection path, at the
    # winning configuration (B=4, K=4, 4 rounds/dispatch)
    slots, nreq, new = 4, 8, min(160, MAXSEQ - 64)
    fp = ServingEngine(params, scfg, n_slots=slots, max_seq=MAXSEQ,
                       chunk_size=64, use_paged=True, page_size=32,
                       depth=2)
    run(fp, reqs(2, new=8, temperature=0.8, top_p=0.9), "b4 topp warm")
    out["plain_b4_topp_tok_s"] = round(
        run(fp, reqs(nreq, new=new, temperature=0.8, top_p=0.9),
            "plain b4 top-p"), 1)
    eng = ServingEngine(params, scfg, n_slots=slots, max_seq=MAXSEQ,
                        use_paged=True, page_size=32, depth=2,
                        draft_params=dparams, draft_cfg=dscfg,
                        k_spec=4, spec_rounds_per_dispatch=4)
    run(eng, reqs(2, new=8, temperature=0.8, top_p=0.9),
        "b4 topp spec warm")
    t = run(eng, reqs(nreq, new=new, temperature=0.8, top_p=0.9),
            "spec b4 top-p K=4 rpd=4")
    out["spec_b4_topp_k4_rpd4_tok_s"] = round(t, 1)
    out["spec_b4_topp_k4_rpd4_acceptance"] = round(
        eng.spec_accepted / max(eng.spec_drafted, 1), 3)
    out["spec_b4_topp_k4_rpd4_vs_plain"] = round(
        t / out["plain_b4_topp_tok_s"], 3)

    try:
        with open(OUT) as f:
            extras = json.load(f)
    except FileNotFoundError:
        extras = {}
    extras["spec_trained"] = out
    with open(OUT, "w") as f:
        json.dump(extras, f, indent=1)
    print(json.dumps({"spec_trained": out}))


if __name__ == "__main__":
    main()
