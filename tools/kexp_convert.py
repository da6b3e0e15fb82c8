#!/usr/bin/env python
"""Kernel experiments: fp8->bf16 convert throughput and decode-attention
dot orientation on this chip.

All repetition happens INSIDE one pallas grid (outer rep dimension that
re-addresses the same blocks), so axon dispatch overhead (~3 ms/call)
is excluded.
"""

import functools
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, KV, S, D = 32, 16, 512, 128
R = 8


def e4m3_bits_to_bf16(u8):
    """Vectorized integer-op convert f8e4m3fn bits -> bf16."""
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


def make_kernel(mode):
    def kernel(q_ref, k_ref, o_ref, acc_ref):
        r = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when((r == 0) & (i == 0))
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        tile = k_ref[0, 0]  # (S, D)
        if mode == "conv-astype":
            kb = tile.astype(jnp.bfloat16)
            acc_ref[:] += kb[:8, :128].astype(jnp.float32)
        elif mode == "conv-bits":
            kb = e4m3_bits_to_bf16(pltpu.bitcast(tile, jnp.uint8))
            acc_ref[:] += kb[:8, :128].astype(jnp.float32)
        elif mode == "conv-bf16":
            acc_ref[:] += tile[:8, :128].astype(jnp.float32)
        elif mode in ("dot-bf16", "dot-fp8-astype", "dot-fp8-bits"):
            if mode == "dot-fp8-astype":
                kb = tile.astype(jnp.bfloat16)
            elif mode == "dot-fp8-bits":
                kb = e4m3_bits_to_bf16(pltpu.bitcast(tile, jnp.uint8))
            else:
                kb = tile
            qb = q_ref[0, 0]  # (8, D)
            scores = jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (8, S)
            acc_ref[:] += scores[:, :128]
        elif mode == "full-fp8-bits":
            # full flash block: convert K and V, both dots, online softmax
            kb = e4m3_bits_to_bf16(pltpu.bitcast(tile, jnp.uint8))
            qb = q_ref[0, 0]
            scores = jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (8, S)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            ctx = jax.lax.dot_general(
                p.astype(jnp.bfloat16), kb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (8, D)
            acc_ref[:] += ctx
        return

    return kernel


@functools.partial(jax.jit, static_argnames=("mode",))
def stream(q, k8, mode):
    BKV = k8.shape[0]
    return pl.pallas_call(
        make_kernel(mode),
        grid=(R, BKV),
        in_specs=[
            pl.BlockSpec((1, 1, 8, D), lambda r, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, D), lambda r, i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda r, i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(q, k8)


def timeit(f, *args, n=3):
    out = f(*args)
    np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best / R


def main():
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.standard_normal((B * KV, 1, S, D)), jnp.float32)
    k8 = raw.astype(jnp.float8_e4m3fn)
    kb = raw.astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B * KV, 1, 8, D)), jnp.bfloat16)

    # correctness of bits-convert (all 256 byte patterns), jnp twin
    def bits_to_bf16_jnp(u8):
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

    allbits = np.arange(256, dtype=np.uint8).reshape(2, 128)
    want = np.asarray(jax.lax.bitcast_convert_type(
        jnp.asarray(allbits), jnp.float8_e4m3fn).astype(jnp.float32))
    got = np.asarray(bits_to_bf16_jnp(jnp.asarray(allbits)).astype(
        jnp.float32))
    bad = np.nonzero((got != want) & ~(np.isnan(got) & np.isnan(want)))
    print("bits-convert mismatches:", len(bad[0]))

    for mode, arr in (
        ("conv-bf16", kb), ("conv-astype", k8), ("conv-bits", k8),
        ("dot-bf16", kb), ("dot-fp8-astype", k8), ("dot-fp8-bits", k8),
        ("full-fp8-bits", k8),
    ):
        t = timeit(stream, q, arr, mode)
        gb = arr.nbytes / 1e9
        print(f"{mode:16s}: {t*1e3:7.3f} ms for {gb:.3f} GB -> "
              f"{gb/t:5.0f} GB/s")


if __name__ == "__main__":
    main()
