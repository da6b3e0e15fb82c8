#!/usr/bin/env python
"""Ablation microbench for the serving decode step.

The axon tunnel has ~3.5 ms dispatch overhead per executable call, so
every measurement loops R times INSIDE one jitted program (lax.scan with
a data dependence) and divides by R — the same structure bench.py uses.

Times the HBM streams of one decode step at bench.py's shapes (B=32,
~1B params, cache 512): weight matmuls, cache attention, LM head — each
fp8 vs bf16 — to locate where the fp8 speedup is lost (bench.py shows
1.31x end-to-end vs a ~1.96x bandwidth bound).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, D, FF, L = 32, 2048, 5504, 16
KV, S, HD = 16, 512, 128
R = 16  # in-program repetitions


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


def report(name, t, nbytes):
    print(f"{name}: {t*1e3:.3f} ms  ({nbytes/1e9:.2f} GB -> "
          f"{nbytes/1e9/t:.0f} GB/s)")


def rep(body, x0):
    """Repeat body R times with a data dependence so XLA can't dedup."""
    def f(x, *args):
        def step(h, _):
            return body(h, *args), ()
        h, _ = jax.lax.scan(step, x, None, length=R)
        return h
    return jax.jit(f)


def main():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, D), jnp.float32).astype(jnp.bfloat16)

    # --- 1. weight-matmul stream: all L layers' 7 matmuls, scanned ---
    def make_ws(dtype):
        ks = jax.random.split(key, 4)
        wqkvo = jax.random.normal(ks[0], (L, 4, D, D), jnp.float32).astype(dtype)
        wgu = jax.random.normal(ks[1], (L, 2, D, FF), jnp.float32).astype(dtype)
        wd = jax.random.normal(ks[2], (L, FF, D), jnp.float32).astype(dtype)
        return wqkvo, wgu, wd

    def mlp_stack(h, ws):
        def step(h, xs):
            a, g, d = xs
            for i in range(4):
                h = h + jax.lax.dot(h, a[i].astype(jnp.bfloat16)) * 1e-3
            u = jax.lax.dot(h, g[0].astype(jnp.bfloat16)) * jax.lax.dot(
                h, g[1].astype(jnp.bfloat16))
            h = h + jax.lax.dot(u.astype(jnp.bfloat16),
                                d.astype(jnp.bfloat16)) * 1e-3
            return h, ()
        h, _ = jax.lax.scan(step, h, ws)
        return h

    for dt, name in ((jnp.float8_e4m3fn, "fp8 "), (jnp.bfloat16, "bf16")):
        ws = make_ws(dt)
        t = timeit(rep(mlp_stack, x), x, ws)
        nbytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in ws)
        report(f"weights {name}", t, nbytes)

    # --- 1b. weights via the Pallas dequant_matmul kernel ---
    from fp8tpu.kernels.qmatmul import dequant_matmul

    def mlp_pallas(h, ws, ss):
        wqkvo, wgu, wd = ws
        sqkvo, sgu, sd = ss
        def step(h, xs):
            a, g, d, sa, sg, sd1 = xs
            for i in range(4):
                h = h + dequant_matmul(h, a[i], sa[i]) * 1e-3
            u = dequant_matmul(h, g[0], sg[0]) * dequant_matmul(h, g[1], sg[1])
            h = h + dequant_matmul(u.astype(jnp.bfloat16), d, sd1) * 1e-3
            return h, ()
        h, _ = jax.lax.scan(step, h, (wqkvo, wgu, wd, sqkvo, sgu, sd))
        return h

    ws = make_ws(jnp.float8_e4m3fn)
    ss = (jnp.ones((L, 4, D), jnp.float32), jnp.ones((L, 2, FF), jnp.float32),
          jnp.ones((L, D), jnp.float32))
    t = timeit(rep(mlp_pallas, x), x, ws, ss)
    nbytes = sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in ws)
    report("weights pallas fp8", t, nbytes)

    # --- 2. attention stream: scores+ctx over the cache, scanned over L ---
    q0 = jax.random.normal(key, (B, KV, HD), jnp.float32).astype(jnp.bfloat16)

    def attn_stack(q, k8, v8, ks_, vs_):
        def step(acc, xs):
            k, v, ks1, vs1 = xs
            scores = jnp.einsum("bkd,bksd->bks", acc, k.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            scores = scores * ks1
            p = jax.nn.softmax(scores, axis=-1)
            p = (p * vs1).astype(jnp.bfloat16)
            ctx = jnp.einsum("bks,bksd->bkd", p, v.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            return acc + ctx.astype(jnp.bfloat16) * 1e-3, ()
        acc, _ = jax.lax.scan(step, q, (k8, v8, ks_, vs_))
        return acc

    for dt, name in ((jnp.float8_e4m3fn, "fp8 "), (jnp.bfloat16, "bf16")):
        k8 = jax.random.normal(key, (L, B, KV, S, HD), jnp.float32).astype(dt)
        v8 = jnp.array(k8)
        ks_ = jnp.ones((L, B, KV, S), jnp.float32)
        vs_ = jnp.ones((L, B, KV, S), jnp.float32)
        t = timeit(rep(attn_stack, q0), q0, k8, v8, ks_, vs_)
        nbytes = k8.nbytes + v8.nbytes + ks_.nbytes + vs_.nbytes
        report(f"attn    {name}", t, nbytes)

    # --- 2b. fp8 attention w/ bf16 scales (half the scale bytes) ---
    k8 = jax.random.normal(key, (L, B, KV, S, HD), jnp.float32).astype(
        jnp.float8_e4m3fn)
    v8 = jnp.array(k8)
    ksb = jnp.ones((L, B, KV, S), jnp.bfloat16)
    vsb = jnp.ones((L, B, KV, S), jnp.bfloat16)
    t = timeit(rep(attn_stack, q0), q0, k8, v8, ksb, vsb)
    report("attn fp8+bf16scale", t, k8.nbytes + v8.nbytes + 2 * ksb.nbytes)

    # --- 3. LM head ---
    V = 16384
    emb = jax.random.normal(key, (V, D), jnp.float32).astype(jnp.bfloat16)
    h0 = jax.random.normal(key, (B, D), jnp.float32).astype(jnp.bfloat16)

    def head(h, e):
        logits = jax.lax.dot_general(h, e, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        return (h + e[0] * jnp.max(logits) * 1e-9).astype(h.dtype)

    t = timeit(rep(head, h0), h0, emb)
    report("lm head bf16", t, emb.nbytes)


if __name__ == "__main__":
    main()
