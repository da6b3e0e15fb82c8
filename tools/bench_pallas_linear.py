#!/usr/bin/env python
"""Pallas skinny-matmul with in-kernel fp8 dequant: can a hand kernel
beat XLA's fp8 operand-fusion convert at decode shapes?

Context (tools/bench_convert_impl.py, same chip): at the decode MLP
shape (B=64, 4096x11008) XLA streams bf16 weights at ~528 GB/s but only
~381 GB/s for fp8 (the f8e4m3->bf16 convert throttles the operand
fusion) and ~401 GB/s for int8.  The integer-op convert written in jnp
LOSES under XLA (143 GB/s — the int chain doesn't fuse into the dot).
This bench puts the convert INSIDE a Pallas kernel where it overlaps
the weight DMA: grid walks N blocks, x stays VMEM-resident, each step
DMAs one (K, BN) fp8 block, converts in-register, and feeds the MXU.

Variants:
  xla-fp8      — shipped path (control): astype fused by XLA
  xla-bf16     — streaming ceiling control (2x bytes)
  pl-bf16      — Pallas matmul on bf16 weights (kernel overhead control)
  pl-astype    — Pallas, in-kernel .astype(bf16) convert
  pl-bits      — Pallas, integer-op convert (kexp_convert twin)
  pl-magic     — Pallas, magic-bias convert: (mag<<4)+(120<<7) in int16
                 domain + subnormal select (fewest VPU ops)

Win condition: a pl-* fp8 variant sustaining > 401 GB/s on stored
weight bytes (int8's XLA rate) — then the serve path gets a
matmul_impl that routes the big projections through it.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, K, N = 64, 4096, 11008
BN = 256            # N block per grid step (11008 = 43*256): 1 MB fp8
R = 64              # grid reps (re-stream the same weights; amortizes
                    # dispatch like kexp_convert)


def conv_bits(u8):
    x = u8.astype(jnp.int32)
    sign = (x & 0x80) << 8
    mag = x & 0x7F
    exp = mag >> 3
    normal = (mag << 4) + (120 << 7)
    mant = (mag & 7).astype(jnp.float32)
    sub_f = mant * jnp.float32(2.0 ** -9)
    sub = (pltpu.bitcast(sub_f, jnp.int32) >> 16) & 0xFFFF
    bits = jnp.where(exp == 0, sub, normal)
    bits = jnp.where(mag == 0x7F, 0x7FC0, bits)
    out16 = (sign | bits).astype(jnp.uint16)
    return pltpu.bitcast(out16, jnp.bfloat16)


def conv_magic(u8):
    # Normals: bf16 bits = sign<<8 | (mag<<4) + (120<<7)  (bias shift
    # 127-7 lands directly in the exponent field).  Subnormals (exp==0):
    # value = mant * 2^-9; build it as a small int->float convert.
    x = u8.astype(jnp.int32)
    mag = x & 0x7F
    normal = (mag << 4) + (120 << 7)
    sub = _small_table(mag)
    bits = jnp.where(mag >= 8, normal, sub)
    bits = jnp.where(mag == 0x7F, 0x7FC0, bits)
    out16 = (((x & 0x80) << 8) | bits).astype(jnp.uint16)
    return pltpu.bitcast(out16, jnp.bfloat16)


def _small_table(mag):
    # bf16 bit patterns for m * 2^-9, m in 0..7 (exact): exponent
    # 2^-9..2^-7 with m's top set bit as the leading one.
    # m: 0->0x0000 1->0x3B00 2->0x3B80 3->0x3BC0 4->0x3C00 5->0x3C20
    #    6->0x3C40 7->0x3C60  == bitcast(float(m) * 2^-9) top 16 bits
    f = mag.astype(jnp.float32) * jnp.float32(2.0 ** -9)
    return (pltpu.bitcast(f, jnp.int32) >> 16) & 0xFFFF


def make_kernel(mode):
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]                       # (B, K) bf16, resident
        w = w_ref[...]                       # (K, BN)
        if mode == "pl-bf16":
            wb = w
        elif mode == "pl-astype":
            wb = w.astype(jnp.bfloat16)
        elif mode == "pl-bits":
            wb = conv_bits(pltpu.bitcast(w, jnp.uint8))
        elif mode == "pl-magic":
            wb = conv_magic(pltpu.bitcast(w, jnp.uint8))
        else:
            raise ValueError(mode)
        o_ref[...] = jax.lax.dot_general(
            x, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def pl_linear(x, w, mode):
    nblk = w.shape[-1] // BN
    return pl.pallas_call(
        make_kernel(mode),
        grid=(R, nblk),
        in_specs=[
            pl.BlockSpec((B, K), lambda r, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, BN), lambda r, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, BN), lambda r, j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, w.shape[-1]), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, w)


@functools.partial(jax.jit, static_argnames=("reps",))
def xla_linear(x, w, reps):
    def step(h, _):
        o = jax.lax.dot_general(
            h, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = (o[:, :K] / jnp.maximum(jnp.max(jnp.abs(o)), 1.0)
             ).astype(jnp.bfloat16)
        return h, ()
    h, _ = jax.lax.scan(step, x, None, length=reps)
    return h


def timeit(f, *args, n=5):
    out = f(*args)
    np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    wf = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    w8 = wf.astype(jnp.float8_e4m3fn)
    wb = wf.astype(jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

    # correctness: the converted-weight dots must be BITWISE equal to the
    # in-kernel astype dot (the convert is exact, the dot identical)
    want = np.asarray(pl_linear(x, w8, "pl-astype"))
    for mode in ("pl-bits", "pl-magic"):
        got = np.asarray(pl_linear(x, w8, mode))
        bad = int((got != want).sum())
        print(f"{mode}: {'exact' if bad == 0 else f'{bad} MISMATCHES'} "
              f"vs in-kernel astype dot")

    fp8_bytes = K * N
    for name, w, bytes_ in (("xla-fp8", w8, fp8_bytes),
                            ("xla-bf16", wb, 2 * fp8_bytes)):
        t = timeit(xla_linear, x, w, R) / R
        print(f"{name:10s} {t*1e3:7.3f} ms/pass  "
              f"{bytes_/t/1e9:5.0f} GB/s stored-weight", flush=True)

    for mode, w, bytes_ in (("pl-bf16", wb, 2 * fp8_bytes),
                            ("pl-astype", w8, fp8_bytes),
                            ("pl-bits", w8, fp8_bytes),
                            ("pl-magic", w8, fp8_bytes)):
        t = timeit(pl_linear, x, w, mode) / R
        print(f"{mode:10s} {t*1e3:7.3f} ms/pass  "
              f"{bytes_/t/1e9:5.0f} GB/s stored-weight", flush=True)


if __name__ == "__main__":
    main()
