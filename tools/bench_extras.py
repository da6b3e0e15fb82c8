#!/usr/bin/env python
"""Secondary perf envelope (VERDICT r1 §7): training-emulation overhead,
qdq_matmul MFU, cast-kernel bandwidth, and the int4/bf16 decode variants.

Writes PERF_EXTRAS.json at the repo root; bench.py embeds it (plus
ACCURACY.json) into its one-line output so every round's BENCH artifact
carries the full envelope, not just the headline.

Run on the TPU chip:  python tools/bench_extras.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

OUT = os.path.join(os.path.dirname(__file__), "..", "PERF_EXTRAS.json")


def _best(fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _per_step(make_run, r1=16, r2=144, n=3):
    """Steady-state per-step time of a scanned kernel: time the SAME
    computation at two scan lengths and divide the difference — the
    constant per-dispatch cost (the axon tunnel's ~30 ms round trip,
    which a single-length measurement folds into every step and which
    capped r3's cast numbers at ~70 GB/s regardless of kernel) cancels
    exactly.  ``make_run(length)`` returns a nullary timed callable."""
    run1, run2 = make_run(r1), make_run(r2)
    t1 = _best(run1, n)
    t2 = _best(run2, n)
    return max(t2 - t1, 1e-9) / (r2 - r1), t1


def training_overhead():
    """Emulated-FP8 vs plain-bf16 train-step throughput (small model)."""
    from fp8tpu.models import Decoder, tiny_config
    from fp8tpu.training import init_train_state, initialize, make_train_step

    cfg = tiny_config(n_layers=4, d_model=512, n_heads=8, n_kv_heads=4,
                      d_ff=1024, vocab_size=2048, max_seq_len=256)
    model = Decoder(cfg)
    B, S = 16, 256
    tokens = jnp.ones((B, S), jnp.int32)
    variables = model.init(jax.random.key(0), tokens)
    opt = optax.adamw(1e-3)

    def loss_fn(apply_fn, params, batch):
        logits = apply_fn(params, batch[:, :-1])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch[:, 1:]).mean()

    # plain step
    @jax.jit
    def plain(params, opt_state, batch):
        def lf(p):
            return loss_fn(lambda v, t: model.apply(v, t), p, batch)
        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables
    opt_state = opt.init(params)
    key = jax.random.key(1)

    def run_plain():
        nonlocal params, opt_state
        for _ in range(8):
            params, opt_state, loss = plain(params, opt_state, tokens)
        float(loss)

    t_plain = _best(run_plain) / 8
    toks = B * (S - 1)
    out = {"plain_tok_s": round(toks / t_plain, 1),
           "cast_impl": "hw"}

    # hybrid = the reference-faithful whole-whitelist scoping;
    # hybrid-gemm = the recommended production scoping (GEMM streams
    # only), which casts far fewer tensors per step.
    for algo, tag in (("hybrid", "hybrid"), ("hybrid-gemm", "gemm")):
        emulator = initialize(model, variables, (tokens,),
                              training_algo=algo, master_fmt="fp16")
        estep = jax.jit(make_train_step(emulator, opt, loss_fn))
        eparams = variables
        eopt = init_train_state(opt, eparams)

        def run_emu():
            nonlocal eparams, eopt
            for _ in range(8):
                eparams, eopt, loss = estep(eparams, eopt, tokens, key)
            float(loss)

        t_emu = _best(run_emu) / 8
        out[f"{tag}_emulated_tok_s"] = round(toks / t_emu, 1)
        out[f"{tag}_overhead_x"] = round(t_emu / t_plain, 3)
    # legacy key (r2-r4 name for the whole-whitelist hybrid number)
    out["emulation_overhead_x"] = out["hybrid_overhead_x"]
    return out


def qdq_matmul_mfu():
    """Fused fake-quant matmul vs plain bf16 dot at a square MXU shape."""
    from fp8tpu.kernels import qdq_matmul

    M = K = N = 4096
    x = jax.random.normal(jax.random.key(0), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (K, N), jnp.float32)
    xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)

    # Two-length scan timing (_per_step): the tunnel round-trip cancels.
    def make_plain(length):
        @partial(jax.jit, static_argnames="n")
        def plain(xb, wb, n):
            def body(c, _):
                y = jnp.dot(c, wb, preferred_element_type=jnp.float32)
                return (y * jnp.float32(1e-2)).astype(jnp.bfloat16), ()
            c, _ = jax.lax.scan(body, xb, None, length=n)
            return jnp.sum(c.astype(jnp.float32))
        return lambda: float(plain(xb, wb, length))

    t_plain, _ = _per_step(make_plain)

    def fused_t(impl):
        def make(length):
            @partial(jax.jit, static_argnames="n")
            def fused(x, w, n):
                def body(c, _):
                    y = qdq_matmul(c, w, fmt_x="e4m3", fmt_w="e4m3",
                                   impl=impl)
                    return y * jnp.float32(1e-2), ()
                c, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(c)
            return lambda: float(fused(x, w, length))
        t, _ = _per_step(make)
        return t

    # "hw" is the production engine configuration (training presets set
    # cast_impl="hw"): native-convert cast + full-rate bf16 MXU dot with
    # the descale in the epilogue.  "bitexact" is the reference-parity
    # kernel (per-tile bit pipeline, f32 HIGHEST dot).
    t_hw = fused_t("hw")
    t_bit = fused_t("bitexact")
    flops = 2 * M * K * N
    peak = 197e12  # v5e bf16 peak
    return {
        "bf16_dot_tflops": round(flops / t_plain / 1e12, 1),
        "qdq_matmul_tflops": round(flops / t_hw / 1e12, 1),
        "qdq_matmul_bitexact_tflops": round(flops / t_bit / 1e12, 1),
        "bf16_dot_mfu": round(flops / t_plain / peak, 3),
        "qdq_matmul_mfu": round(flops / t_hw / peak, 3),
        "qdq_matmul_bitexact_mfu": round(flops / t_bit / peak, 3),
    }


def cast_bandwidth():
    """Cast kernel GB/s (read f32 + write f32), steady-state per-step
    timing (_per_step — the tunnel dispatch latency cancels; r3's
    single-length numbers were latency-bound at ~70 GB/s for EVERY
    elementwise kernel including a bare multiply).

    Two working sets (VERDICT r4 next #7): 64 MB FITS v5e's 128 MB VMEM,
    so XLA keeps the scan carry resident and the numbers are VMEM-window
    throughput; 256 MB (2x VMEM) forces every step through HBM, so those
    numbers are true HBM read+write GB/s.  The cast-cost question is
    answered the same way in both windows by the RATIO vs a bare
    elementwise multiply on the same harness."""
    from fp8tpu.kernels import pallas_qdq
    from fp8tpu.numerics.formats import RoundMode
    from fp8tpu.quant.config import TensorQuantConfig
    from fp8tpu.quant.fakequant import fake_quant

    cfg = TensorQuantConfig("e4m3", "rne", cast_impl="hw")
    bodies = {
        "cast_e4m3_rne": lambda c: pallas_qdq(
            c * jnp.float32(1.0001), fmt="e4m3", mode=RoundMode.RNE),
        # the production-speed path: hardware-dtype cast (cast_impl='hw')
        "cast_e4m3_hw": lambda c: fake_quant(c * jnp.float32(1.0001), cfg),
        # Achievable-bandwidth references on the SAME harness: a bare
        # elementwise multiply (the r/w ceiling any qdq variant can
        # reach under this scan) and a bf16 round-trip (one native
        # convert pair).
        "elementwise_mul": lambda c: c * jnp.float32(1.0001),
        "bf16_roundtrip": lambda c: (c * jnp.float32(1.0001)).astype(
            jnp.bfloat16).astype(jnp.float32),
    }

    def scan_bench(body, x):
        # optimization_barrier per step: without it XLA unrolls the
        # static-length scan and fuses ALL elementwise steps into ONE
        # HBM pass (measured "4.4 TB/s casts" — apparent bandwidth x
        # steps).  The barrier forces each step to materialize, so GB/s
        # is a true per-pass read+write number.  (The matmul bench needs
        # no barrier: dots cannot fuse across steps.)
        def make(length):
            @partial(jax.jit, static_argnames="n")
            def run(x, n):
                def step(c, _):
                    return jax.lax.optimization_barrier(body(c)), ()
                c, _ = jax.lax.scan(step, x, None, length=n)
                return jnp.sum(c)
            return lambda: float(run(x, length))
        t, _ = _per_step(make)
        return round(2 * x.nbytes / t / 1e9, 1)

    out = {}
    for mb, tag in ((64, "vmem"), (256, "hbm")):
        n = mb * 1024 * 1024 // 4
        x = jax.random.normal(jax.random.key(0), (n // 1024, 1024),
                              jnp.float32)
        sub = {f"{name}_{tag}_gbps": scan_bench(body, x)
               for name, body in bodies.items()}
        for name in ("cast_e4m3_rne", "cast_e4m3_hw"):
            sub[f"{name}_{tag}_vs_ceiling"] = round(
                sub[f"{name}_{tag}_gbps"]
                / sub[f"elementwise_mul_{tag}_gbps"], 3)
        out[f"working_set_{tag}_mb"] = mb
        out.update(sub)
        del x
    # legacy aliases (r4 keys; those runs used the 64 MB carry)
    out["cast_e4m3_hw_gbps"] = out["cast_e4m3_hw_vmem_gbps"]
    out["cast_e4m3_hw_vs_ceiling"] = out["cast_e4m3_hw_vmem_vs_ceiling"]
    return out


def decode_variants():
    """Decode tok/s for weight_fmt in {e4m3, int4} plus the bf16 twin —
    the same measurement bench.py makes, recorded per-format."""
    import bench as benchmod

    out = {}
    for fmt, kv in (("e4m3", "int8"), ("e4m3", "e4m3"), ("int8", "int8"),
                    ("int4", "int8"), ("bf16", "bf16")):
        tok = benchmod.bench_variant(fmt, kv)
        out[f"decode_{fmt}_kv{kv}_tok_s"] = round(tok, 1)
    out["int4_vs_fp8"] = round(out["decode_int4_kvint8_tok_s"]
                               / out["decode_e4m3_kvint8_tok_s"], 3)
    out["fp8_vs_bf16"] = round(out["decode_e4m3_kvint8_tok_s"]
                               / out["decode_bf16_kvbf16_tok_s"], 3)
    out["int8_vs_bf16"] = round(out["decode_int8_kvint8_tok_s"]
                                / out["decode_bf16_kvbf16_tok_s"], 3)
    return out


def moe_decode():
    """MoE serving decode tok/s: 8-expert top-2 decoder (~2.4B total,
    ~1B active) in fp8 vs its bf16 twin, plus the dense same-active-size
    model for the capacity-cost ratio.  Decode streams ALL expert
    payloads (exact top-k combine, serve/model._moe_ffn), so tok/s vs
    the dense twin directly measures the E× FFN-bytes cost — the number
    a capacity-planning user needs."""
    import dataclasses

    import bench as benchmod
    from fp8tpu.models import DecoderConfig

    dense = DecoderConfig(vocab_size=32768, d_model=2048, n_layers=12,
                          n_heads=16, n_kv_heads=8, d_ff=5504,
                          max_seq_len=1024)
    moe = dataclasses.replace(dense, n_experts=8, moe_top_k=2)
    out = {"experts": 8, "top_k": 2, "model": "d2048 L12 ff5504"}
    out["moe_fp8_kvint8_tok_s"] = round(
        benchmod.bench_variant("e4m3", "int8", cfg=moe, steps=128), 1)
    out["moe_bf16_tok_s"] = round(
        benchmod.bench_variant("bf16", "bf16", cfg=moe, steps=128), 1)
    out["dense_fp8_kvint8_tok_s"] = round(
        benchmod.bench_variant("e4m3", "int8", cfg=dense, steps=128), 1)
    out["moe_fp8_vs_bf16"] = round(out["moe_fp8_kvint8_tok_s"]
                                   / out["moe_bf16_tok_s"], 3)
    out["moe_vs_dense_fp8"] = round(out["moe_fp8_kvint8_tok_s"]
                                    / out["dense_fp8_kvint8_tok_s"], 3)
    return out


def _save(res):
    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    prev.update(res)
    with open(OUT, "w") as f:
        json.dump(prev, f, indent=1)


def main():
    which = sys.argv[1:] or ["training", "mfu", "cast", "decode", "moe"]
    sections = {"training": ("training", training_overhead),
                "mfu": ("qdq_matmul", qdq_matmul_mfu),
                "cast": ("cast", cast_bandwidth),
                "decode": ("decode", decode_variants),
                "moe": ("moe", moe_decode)}
    for name in which:
        key, fn = sections[name]
        out = fn()
        print(f"{key}:", out, flush=True)
        _save({key: out})       # incremental: a later crash keeps results
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()
