#!/usr/bin/env python
"""W4A16 decode-matmul shootout on the real chip (VERDICT r1 §2).

Chained MLP-style weight stream at bench shapes (L=16 layers of
4096x11008 + 11008x4096, B=64), one jit, data-dependent across layers:

  fp8_convert   — the serving fp8 path (XLA convert fused into the dot)
  int4_xla      — serve.int4_linear (two-pass even/odd XLA dots)
  int4_pallas   — kernels.int4_matmul (single-pass unpack)
  int4_pallas_g — same with AWQ-class grouped scales (gs=128)

Prints ms + effective GB/s on the WEIGHT bytes each variant actually
stores (fp8: K*N bytes; int4: K*N/2) — the int4 win condition is lower
ms, i.e. the halved byte stream surviving the unpack cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fp8tpu.kernels.int4_matmul import (int4_matmul,
                                        quantize_weights_int4_grouped)
from fp8tpu.serve.model import int4_linear, quantize_weights_int4

L, K, FF, B = 16, 4096, 11008, 64
STEPS = 16

key = jax.random.key(0)
upf = jax.random.normal(key, (L, K, FF), jnp.float32) * 0.02
dnf = jax.random.normal(jax.random.fold_in(key, 1),
                        (L, FF, K), jnp.float32) * 0.02
x0 = jax.random.normal(jax.random.fold_in(key, 2), (B, K), jnp.bfloat16)


def norm(h):
    return (h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)).astype(jnp.bfloat16)


def chain(linear_up, linear_dn, weights):
    @jax.jit
    def run(x, weights):
        def layer(h, wl):
            a = linear_up(h, wl)
            b = linear_dn(a.astype(jnp.bfloat16), wl)
            return norm(b), ()

        def step(h, _):
            h, _ = jax.lax.scan(layer, h, weights)
            return h, ()

        h, _ = jax.lax.scan(step, x, None, length=STEPS)
        return jnp.sum(h.astype(jnp.float32))
    return run


def timeit(run, weights):
    float(run(x0, weights))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, weights))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, t, wbytes):
    tot = wbytes * STEPS
    print(f"{name:14s} {t*1e3:7.1f} ms   {tot/t/1e9:5.0f} GB/s on stored "
          f"weight bytes", flush=True)


FP8B = L * K * FF * 2
I4B = L * K * FF

# fp8 baseline
up8 = jax.vmap(lambda w: w.astype(jnp.float8_e4m3fn))(upf)
dn8 = jax.vmap(lambda w: w.astype(jnp.float8_e4m3fn))(dnf)
run = chain(
    lambda h, wl: jax.lax.dot_general(
        h, wl[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32),
    lambda a, wl: jax.lax.dot_general(
        a, wl[1].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32),
    (up8, dn8))
report("fp8_convert", timeit(run, (up8, dn8)), FP8B)

# int4 XLA two-pass
up4 = [quantize_weights_int4(upf[i]) for i in range(L)]
dn4 = [quantize_weights_int4(dnf[i]) for i in range(L)]
upp = jnp.stack([p for p, _ in up4]); ups = jnp.stack([s for _, s in up4])
dnp_ = jnp.stack([p for p, _ in dn4]); dns = jnp.stack([s for _, s in dn4])
w4 = (upp, ups, dnp_, dns)
run = chain(lambda h, wl: int4_linear(h, wl[0], wl[1]),
            lambda a, wl: int4_linear(a, wl[2], wl[3]),
            w4)
report("int4_xla", timeit(run, w4), I4B)

# int4 Pallas single-pass (per-channel scales)
run = chain(lambda h, wl: int4_matmul(h, wl[0], wl[1]),
            lambda a, wl: int4_matmul(a, wl[2], wl[3]),
            w4)
report("int4_pallas", timeit(run, w4), I4B)

# int4 Pallas grouped scales
up4g = [quantize_weights_int4_grouped(upf[i], 128) for i in range(L)]
dn4g = [quantize_weights_int4_grouped(dnf[i], 128) for i in range(L)]
uppg = jnp.stack([p for p, _ in up4g])
upsg = jnp.stack([s for _, s in up4g])
dnpg = jnp.stack([p for p, _ in dn4g])
dnsg = jnp.stack([s for _, s in dn4g])
w4g = (uppg, upsg, dnpg, dnsg)
run = chain(lambda h, wl: int4_matmul(h, wl[0], wl[1], group_size=128),
            lambda a, wl: int4_matmul(a, wl[2], wl[3], group_size=128),
            w4g)
report("int4_pallas_g", timeit(run, w4g), I4B)
