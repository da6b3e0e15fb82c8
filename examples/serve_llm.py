#!/usr/bin/env python
"""FP8 LLM serving demo: quantize a decoder to fp8 payloads, start the
continuous-batching engine, and generate (the north-star serving flow —
the reference toolkit has no serving path, BASELINE.md)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, DecoderConfig
from fp8tpu.serve import (
    Request,
    ServeConfig,
    ServingEngine,
    convert_decoder_params,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d-model", type=int, default=512)
    p.add_argument("--n-layers", type=int, default=8)
    # int8 payloads measured fastest AND most accurate on v5e
    # (README perf table); fp8 e4m3 is the emulation-parity default.
    p.add_argument("--weight-fmt", default="int8",
                   choices=["int8", "e4m3", "e5m2", "int4", "bf16"])
    p.add_argument("--kv-fmt", default="int8",
                   choices=["int8", "e4m3", "e5m2", "bf16"])
    p.add_argument("--paged", action="store_true",
                   help="page-pool KV memory (long context) instead of "
                        "the ring")
    p.add_argument("--prefix-cache", action="store_true",
                   help="(paged) share content-addressed prompt pages "
                        "across requests with a common prefix")
    p.add_argument("--prefix-compute-reuse", action="store_true",
                   help="(paged, implies --prefix-cache) admission "
                        "scores only the uncached prompt suffix "
                        "against the shared pages")
    p.add_argument("--slots", type=int, default=4)
    p.add_argument("--max-seq", type=int, default=512)
    p.add_argument("--requests", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--n-experts", type=int, default=0,
                   help="MoE FFN: serve quantized expert stacks with "
                        "exact top-2 combine (0 = dense)")
    p.add_argument("--speculative", type=int, default=0, metavar="K",
                   help="B=1 latency mode: draft K tokens per round "
                        "with a small draft model, verify in one "
                        "multi-token pass (greedy output is identical "
                        "to plain decode)")
    args = p.parse_args()

    cfg = DecoderConfig(
        vocab_size=4096, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=max(4, args.d_model // 64),
        n_kv_heads=max(4, args.d_model // 64),
        d_ff=args.d_model * 3, max_seq_len=args.max_seq,
        n_experts=args.n_experts)
    model = Decoder(cfg)
    variables = jax.jit(model.init)(jax.random.key(0),
                                    jnp.ones((1, 8), jnp.int32))
    params = convert_decoder_params(variables, cfg, fmt=args.weight_fmt)
    del variables

    scfg = ServeConfig(model=cfg, weight_fmt=args.weight_fmt,
                       kv_fmt=args.kv_fmt)

    if args.speculative:
        import dataclasses
        from fp8tpu.serve import speculative_decode

        dcfg = dataclasses.replace(
            cfg, n_layers=max(1, args.n_layers // 4),
            d_model=max(64, args.d_model // 4),
            n_heads=max(2, args.d_model // 256),
            n_kv_heads=max(2, args.d_model // 256),
            d_ff=max(64, args.d_model // 4) * 3, n_experts=0)
        dmodel = Decoder(dcfg)
        dvars = jax.jit(dmodel.init)(jax.random.key(1),
                                     jnp.ones((1, 8), jnp.int32))
        dparams = convert_decoder_params(dvars, dcfg, fmt=args.weight_fmt)
        dscfg = ServeConfig(model=dcfg, weight_fmt=args.weight_fmt,
                            kv_fmt=args.kv_fmt)
        if args.paged:
            # batched speculation under continuous batching
            engine = ServingEngine(
                params, scfg, n_slots=args.slots, max_seq=args.max_seq,
                use_paged=True,
                prefix_cache=args.prefix_cache or args.prefix_compute_reuse,
                prefix_compute_reuse=args.prefix_compute_reuse,
                draft_params=dparams, draft_cfg=dscfg,
                k_spec=args.speculative)
            reqs = [Request(uid=i, prompt=list(range(1 + i, 12 + i)),
                            max_new_tokens=args.max_new_tokens,
                            temperature=args.temperature)
                    for i in range(args.requests)]
            t0 = time.time()
            out = engine.run(reqs)
            dt = time.time() - t0
            total = sum(len(v) for v in out.values())
            acc = engine.spec_accepted / max(engine.spec_drafted, 1)
            print(f"batched speculative K={args.speculative}: "
                  f"{len(out)} requests, {total} tokens in {dt:.1f}s "
                  f"({total/dt:.0f} tok/s), acceptance {acc:.2f}, "
                  f"{engine.spec_rounds} rounds")
            return
        prompt = list(range(1, 12))
        t0 = time.time()
        toks, stats = speculative_decode(
            params, dparams, prompt, args.max_new_tokens, scfg, dscfg,
            k_spec=args.speculative, max_seq=args.max_seq,
            temperature=args.temperature)
        dt = time.time() - t0
        print(f"speculative K={args.speculative}: {len(toks)} tokens in "
              f"{dt:.1f}s ({len(toks)/dt:.0f} tok/s), acceptance "
              f"{stats.acceptance_rate:.2f}, "
              f"{stats.tokens_per_round:.2f} tok/round")
        print(f"  tokens: {toks[:16]}{'...' if len(toks) > 16 else ''}")
        return

    engine = ServingEngine(params, scfg, n_slots=args.slots,
                           max_seq=args.max_seq, use_paged=args.paged,
                           prefix_cache=args.prefix_cache or args.prefix_compute_reuse,
                           prefix_compute_reuse=args.prefix_compute_reuse)
    reqs = [Request(uid=i, prompt=list(range(1 + i, 12 + i)),
                    max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature)
            for i in range(args.requests)]
    t0 = time.time()
    out = engine.run(reqs)
    dt = time.time() - t0
    total = sum(len(v) for v in out.values())
    print(f"{len(out)} requests, {total} tokens in {dt:.1f}s "
          f"({total / dt:.0f} tok/s incl. prefills) "
          f"[weights {args.weight_fmt}, kv {args.kv_fmt}]")
    for uid in sorted(out):
        print(f"  req {uid}: {out[uid][:12]}{'...' if len(out[uid])>12 else ''}")


if __name__ == "__main__":
    main()
