"""Pallas kernel tests in interpreter mode (CPU CI).

Compiled-mode parity and performance are exercised on the real chip by
the verify drives and bench.py; these tests pin kernel *semantics* against
the golden model so CI catches regressions without TPU hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.kernels import dequant_matmul, qdq_matmul, quantize_weights
from fp8tpu.kernels.cast_kernel import pallas_qdq
from fp8tpu.numerics import FORMATS, RoundMode, golden, qdq_blocked


@pytest.mark.parametrize("fmt", ["e4m3", "e5m2", "e3m4"])
def test_cast_kernel_interpret_matches_golden(fmt, rng):
    x = jnp.asarray(rng.normal(0, 10, (600, 700)).astype(np.float32))
    got = np.asarray(pallas_qdq(x, fmt, RoundMode.RNE, interpret=True))
    expected = golden.cast(np.asarray(x), FORMATS[fmt], RoundMode.RNE)
    np.testing.assert_array_equal(got, expected)


def test_cast_kernel_scaled(rng):
    x = jnp.asarray(rng.normal(0, 10, (512, 512)).astype(np.float32))
    got = np.asarray(
        pallas_qdq(x, "e4m3", RoundMode.RNE, scale=3.5, interpret=True)
    )
    expected = golden.cast(np.asarray(x), FORMATS["e4m3"], RoundMode.RNE,
                           scale=3.5)
    np.testing.assert_array_equal(got, expected)


def test_cast_kernel_blocked(rng):
    x = jnp.asarray(rng.normal(0, 3, 4096).astype(np.float32))
    got = np.asarray(
        pallas_qdq(x, "e5m2", RoundMode.RNE, block_size=128, interpret=True)
    )
    expected = np.asarray(
        qdq_blocked(x, "e5m2", RoundMode.RNE, block_size=128)
    )
    np.testing.assert_array_equal(got, expected)


def test_quantize_weights_roundtrip(rng):
    w = jnp.asarray(rng.normal(0, 0.05, (256, 512)).astype(np.float32))
    payload, scales = quantize_weights(w, "e4m3", axis=-1)
    assert payload.dtype == jnp.float8_e4m3fn
    assert scales.shape == (1, 512)
    deq = payload.astype(jnp.float32) * scales
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 0.07  # e4m3 grid error bound under per-channel max scaling
    # Payload round-trips its own dtype losslessly.
    again = deq / scales
    np.testing.assert_array_equal(
        np.asarray(again.astype(jnp.float8_e4m3fn)), np.asarray(payload)
    )


def test_dequant_matmul_interpret(rng):
    x = jnp.asarray(rng.normal(0, 1, (24, 384)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (384, 256)).astype(np.float32))
    payload, scales = quantize_weights(w, "e4m3", axis=-1)
    got = np.asarray(
        dequant_matmul(x, payload, scales, out_dtype=jnp.float32,
                       tn=128, tk=128, interpret=True)
    )
    wdeq = np.asarray(payload.astype(jnp.float32) * scales)
    expected = np.asarray(x.astype(jnp.bfloat16)).astype(np.float32) @ wdeq
    # bf16 matmul tolerance.
    np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)


def test_qdq_matmul_interpret_matches_unfused(rng):
    """The fused kernel must equal qdq(whole x) @ qdq(whole w) — tiling
    must not change numerics (scales are global, casts elementwise)."""
    from fp8tpu.numerics import qdq

    x = jnp.asarray(rng.normal(0, 1, (32, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (256, 128)).astype(np.float32))
    got = np.asarray(
        qdq_matmul(x, w, fmt_x="e4m3", fmt_w="e4m3",
                   tm=16, tn=128, tk=128, interpret=True)
    )
    xq = qdq(x, "e4m3", RoundMode.RNE)
    wq = qdq(w, "e4m3", RoundMode.RNE)
    expected = np.asarray(
        jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_qdq_matmul_per_channel_w_scale(rng):
    from fp8tpu.numerics import qdq
    from fp8tpu.numerics import scaling as sc

    x = jnp.asarray(rng.normal(0, 1, (16, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (128, 256)).astype(np.float32))
    # Per-output-channel scales on w (axis=1 of (K,N)).
    sw = sc.per_channel(w, "e4m3", "max", axis=1).reshape(-1)
    got = np.asarray(
        qdq_matmul(x, w, fmt_x="e4m3", fmt_w="e4m3", scale_w=sw,
                   tm=16, tn=128, tk=128, interpret=True)
    )
    xq = qdq(x, "e4m3", RoundMode.RNE)
    wq = qdq(w, "e4m3", RoundMode.RNE, scale=sw.reshape(1, -1))
    expected = np.asarray(
        jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_qdq_matmul_skip_operand(rng):
    from fp8tpu.numerics import qdq

    x = jnp.asarray(rng.normal(0, 1, (16, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (128, 128)).astype(np.float32))
    got = np.asarray(
        qdq_matmul(x, w, fmt_x=None, fmt_w="e5m2",
                   tm=16, tn=128, tk=128, interpret=True)
    )
    wq = qdq(w, "e5m2", RoundMode.RNE)
    expected = np.asarray(
        jax.lax.dot_general(x, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_dequant_matmul_ragged_shapes(rng):
    """Non-tile-multiple M/K/N must pad/crop correctly."""
    x = jnp.asarray(rng.normal(0, 1, (5, 200)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.05, (200, 100)).astype(np.float32))
    payload, scales = quantize_weights(w, "e5m2", axis=-1)
    got = np.asarray(
        dequant_matmul(x, payload, scales, out_dtype=jnp.float32,
                       tn=128, tk=128, interpret=True)
    )
    assert got.shape == (5, 100)
    wdeq = np.asarray(payload.astype(jnp.float32) * scales)
    expected = np.asarray(x.astype(jnp.bfloat16)).astype(np.float32) @ wdeq
    np.testing.assert_allclose(got, expected, rtol=2e-2, atol=2e-2)


def test_qdq_matmul_hw_impl_matches_hw_reference(rng):
    """impl="hw" (native-convert cast + bf16 fast dot, the production
    engine path): must match hw_qdq(whole x) @ hw_qdq(whole w) up to the
    epilogue-descale rounding-order difference (documented deviation
    from the bitexact contract)."""
    from fp8tpu.numerics.cast import hw_qdq
    from fp8tpu.numerics import scaling as sc

    x = jnp.asarray(rng.normal(0, 1, (32, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (256, 128)).astype(np.float32))
    sx = sc.per_tensor(x, "e4m3", "max")
    sw = sc.per_channel(w, "e4m3", "max", axis=1).reshape(-1)
    got = np.asarray(
        qdq_matmul(x, w, fmt_x="e4m3", fmt_w="e4m3", scale_x=sx,
                   scale_w=sw, tm=16, tn=128, tk=128, interpret=True,
                   impl="hw"))
    xq = hw_qdq(x, "e4m3", sx)
    wq = hw_qdq(w, "e4m3", sw.reshape(1, -1))
    expected = np.asarray(
        jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_qdq_matmul_hw_e3m4_falls_back_bitexact(rng):
    """e3m4 has no hardware dtype: impl="hw" must still produce exact
    e3m4-grid values via the in-kernel bit pipeline (fast bf16 dot still
    engages — the e3m4 grid is bf16-exact)."""
    from fp8tpu.numerics import qdq

    x = jnp.asarray(rng.normal(0, 1, (16, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.1, (128, 128)).astype(np.float32))
    got = np.asarray(
        qdq_matmul(x, w, fmt_x="e3m4", fmt_w="e3m4", tm=16, tn=128,
                   tk=128, interpret=True, impl="hw"))
    xq = qdq(x, "e3m4", RoundMode.RNE)
    wq = qdq(w, "e3m4", RoundMode.RNE)
    expected = np.asarray(
        jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)
