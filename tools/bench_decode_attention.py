#!/usr/bin/env python
"""TPU correctness + throughput check of the flash-decoding kernel at
bench.py shapes, vs the XLA einsum path it replaces."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fp8tpu.kernels.decode_attention import (
    finalize_partials, flash_decode_cache, flash_decode_cache_reference)

L, B, KV, S, D = 16, 32, 16, 512, 128
G = 1
R = 16


def timeit(f, *args, n=3):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    rng = np.random.default_rng(0)
    for dtype, with_scales, name in (
        (jnp.float8_e4m3fn, True, "fp8"),
        (jnp.bfloat16, False, "bf16"),
    ):
        k8 = jnp.asarray(rng.standard_normal((L, B, KV, S, D)),
                         jnp.float32).astype(dtype)
        v8 = jnp.asarray(rng.standard_normal((L, B, KV, S, D)),
                         jnp.float32).astype(dtype)
        if with_scales:
            ks = jnp.asarray(rng.uniform(0.5, 2, (L, KV, B, S)), jnp.float32)
            vs = jnp.asarray(rng.uniform(0.5, 2, (L, KV, B, S)), jnp.float32)
        else:
            ks = vs = None
        q = jnp.asarray(rng.standard_normal((B, KV, G, D)), jnp.float32
                        ).astype(jnp.bfloat16)
        positions = jnp.full((B,), 280, jnp.int32)

        # correctness on chip (one layer)
        got = finalize_partials(
            flash_decode_cache(q, k8, ks, v8, vs, 3, positions))
        want = finalize_partials(
            flash_decode_cache_reference(q, k8, ks, v8, vs, 3, positions))
        err = np.max(np.abs(np.asarray(got) - np.asarray(want)))
        print(f"{name}: max abs err vs reference = {err:.4e}")

        # throughput: scan over layers, R reps (carry forces sequencing)
        def all_layers(q, k8, ks, v8, vs, positions):
            def rep_body(qc, _):
                def body(qc, li):
                    ctx = finalize_partials(flash_decode_cache(
                        qc, k8, ks, v8, vs, li, positions))
                    return (qc + ctx.astype(qc.dtype) * 1e-3), ()
                qc, _ = jax.lax.scan(body, qc, jnp.arange(L))
                return qc, ()
            qc, _ = jax.lax.scan(rep_body, q, None, length=R)
            return qc

        t = timeit(jax.jit(all_layers), q, k8, ks, v8, vs, positions)
        nbytes = k8.nbytes + v8.nbytes
        valid_frac = 280 / S + (1 / 16)  # skip reads ~ceil(280/512)… full
        print(f"{name}: {t*1e3:.3f} ms/step for {nbytes/1e9:.2f} GB cache "
              f"-> {nbytes/1e9/t:.0f} GB/s apparent")

        # with full positions (no skip) to see raw streaming rate
        positions_full = jnp.full((B,), S, jnp.int32)
        t = timeit(jax.jit(all_layers), q, k8, ks, v8, vs, positions_full)
        print(f"{name}: full-pos {t*1e3:.3f} ms/step -> "
              f"{nbytes/1e9/t:.0f} GB/s")


if __name__ == "__main__":
    main()
