#!/usr/bin/env python
"""fp8-weight dequant shootout: XLA convert vs integer-op bit convert.

Motivation (NOTES "int8 payloads beat fp8 on v5e"): int8 STORAGE decodes
~1.81x bf16 while e4m3 storage sits at 1.65x — same byte count, the gap
is v5e's f8e4m3->bf16 convert being slower than int8->bf16 inside the
dot's operand fusion.  tools/kexp_convert.py proved an exact integer-op
e4m3->bf16 convert (shift/add in the int domain) runs at speed inside
Pallas; this bench asks whether the SAME trick, written in plain jnp so
XLA fuses it into the decode matmul, lifts fp8 decode to int8 speed.

Chained MLP weight stream at bench shapes (L=16 x [4096x11008 +
11008x4096], B=64, 16 steps inside one jit) — the weight-streaming
pattern that dominates decode.  Variants:

  fp8_astype   — shipped path: w8.astype(bf16) fused into the dot
  fp8_bits     — exact e4m3->bf16 via integer ops (bitcast + shifts)
  int8_astype  — int8 storage convert path (the 1.81x mechanism)
  bf16         — unquantized reference stream (2x the bytes)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def e4m3_bits_to_bf16(u8):
    """Exact f8e4m3fn -> bf16 via integer ops (kexp_convert twin).

    Bit-exact on all 256 byte patterns incl. NaN; proven at speed INSIDE
    Pallas (tools/kexp_convert.py) but measured 2.7x SLOWER than the
    native convert when written in jnp: XLA materializes the int chain
    to HBM instead of fusing it into the dot's operand stream.
    """
    x = u8.astype(jnp.int32)
    sign = (x & 0x80) << 8
    mag = x & 0x7F
    exp = mag >> 3
    normal = (mag << 4) + (120 << 7)
    mant = (mag & 7).astype(jnp.float32)
    sub_f = mant * jnp.float32(2.0 ** -9)
    sub = (jax.lax.bitcast_convert_type(sub_f, jnp.int32) >> 16) & 0xFFFF
    bits = jnp.where(exp == 0, sub, normal)
    bits = jnp.where(mag == 0x7F, 0x7FC0, bits)
    out16 = (sign | bits).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(out16, jnp.bfloat16)

L, K, FF, B = 16, 4096, 11008, 64
STEPS = 16

key = jax.random.key(0)
upf = jax.random.normal(key, (L, K, FF), jnp.float32) * 0.02
dnf = jax.random.normal(jax.random.fold_in(key, 1),
                        (L, FF, K), jnp.float32) * 0.02
x0 = jax.random.normal(jax.random.fold_in(key, 2), (B, K), jnp.bfloat16)


def norm(h):
    return (h / jnp.maximum(jnp.max(jnp.abs(h)), 1.0)).astype(jnp.bfloat16)


def chain(dequant):
    @jax.jit
    def run(x, weights):
        def layer(h, wl):
            a = jax.lax.dot_general(
                h, dequant(wl[0]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            b = jax.lax.dot_general(
                norm(a), dequant(wl[1]), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
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
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x0, weights))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, t, wbytes):
    tot = wbytes * STEPS
    print(f"{name:12s} {t*1e3:7.1f} ms   {tot/t/1e9:5.0f} GB/s on stored "
          f"weight bytes", flush=True)


def main():
    fp8b = L * K * FF * 2  # up + dn, 1 byte/weight

    up8 = jax.vmap(lambda w: w.astype(jnp.float8_e4m3fn))(upf)
    dn8 = jax.vmap(lambda w: w.astype(jnp.float8_e4m3fn))(dnf)
    w8 = (up8, dn8)

    # correctness: bit convert == XLA convert on real quantized weights
    ref = np.asarray(up8[0].astype(jnp.bfloat16))
    got = np.asarray(e4m3_bits_to_bf16(
        jax.lax.bitcast_convert_type(up8[0], jnp.uint8)))
    assert (ref == got).all() or np.array_equal(
        np.isnan(ref), np.isnan(got)) and (
        ref[~np.isnan(ref)] == got[~np.isnan(got)]).all(), "bit convert"
    print("bit convert exact on quantized weights", flush=True)

    t = timeit(chain(lambda w: w.astype(jnp.bfloat16)), w8)
    report("fp8_astype", t, fp8b)

    t = timeit(chain(lambda w: e4m3_bits_to_bf16(
        jax.lax.bitcast_convert_type(w, jnp.uint8))), w8)
    report("fp8_bits", t, fp8b)

    s8 = 127.0 / jnp.maximum(jnp.max(jnp.abs(upf)), 1e-9)
    upi = jax.vmap(lambda w: jnp.round(w * s8).astype(jnp.int8))(upf)
    dni = jax.vmap(lambda w: jnp.round(w * s8).astype(jnp.int8))(dnf)
    t = timeit(chain(lambda w: w.astype(jnp.bfloat16)), (upi, dni))
    report("int8_astype", t, fp8b)

    t = timeit(chain(lambda w: w),
               (upf.astype(jnp.bfloat16), dnf.astype(jnp.bfloat16)))
    report("bf16", t, fp8b * 2)

    # fp8 operand fed straight to the dot (XLA picks the upcast route)
    def chain_raw(weights):
        @jax.jit
        def run(x, weights):
            def layer(h, wl):
                a = jax.lax.dot_general(
                    h, wl[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                b = jax.lax.dot_general(
                    norm(a), wl[1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return norm(b), ()
            def step(h, _):
                h, _ = jax.lax.scan(layer, h, weights)
                return h, ()
            h, _ = jax.lax.scan(step, x, None, length=STEPS)
            return jnp.sum(h.astype(jnp.float32))
        return run
    t = timeit(chain_raw(w8), w8)
    report("fp8_rawdot", t, fp8b)

    t = timeit(chain(lambda w: w.astype(jnp.float32).astype(jnp.bfloat16)),
               w8)
    report("fp8_via_f32", t, fp8b)

    # W8A8: native int8 x int8 MXU dot — no weight convert at all.  The
    # activation quantizes per step (numerics change: this is the
    # 'direct' serve impl, not the convert path).
    def chain_s8(weights):
        @jax.jit
        def run(x, weights):
            def layer(h, wl):
                hs = jnp.max(jnp.abs(h.astype(jnp.float32)))
                hq = jnp.clip(h.astype(jnp.float32) * (127.0 / hs),
                              -127, 127).astype(jnp.int8)
                a = jax.lax.dot_general(
                    hq, wl[0], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                an = norm(a.astype(jnp.float32))
                as_ = jnp.max(jnp.abs(an.astype(jnp.float32)))
                aq = jnp.clip(an.astype(jnp.float32) * (127.0 / as_),
                              -127, 127).astype(jnp.int8)
                b = jax.lax.dot_general(
                    aq, wl[1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return norm(b.astype(jnp.float32)), ()
            def step(h, _):
                h, _ = jax.lax.scan(layer, h, weights)
                return h, ()
            h, _ = jax.lax.scan(step, x, None, length=STEPS)
            return jnp.sum(h.astype(jnp.float32))
        return run
    t = timeit(chain_s8((upi, dni)), (upi, dni))
    report("int8_w8a8", t, fp8b)


if __name__ == "__main__":
    main()
