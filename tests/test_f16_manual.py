"""Manual (integer-op) f32↔f16 conversion vs the hardware/NumPy native one.

Mosaic cannot legalize f16 converts on TPU v5e, so all casts run on the
manual pipeline (numerics/cast.py f32_to_f16_bits / f16_bits_to_f32); this
test proves it is bit-exact, making kernel and golden semantics identical.
"""

import numpy as np

import jax
import jax.numpy as jnp

from fp8tpu.numerics.cast import f16_bits_to_f32, f32_to_f16_bits


def _inputs():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.normal(0, 1, 4096),
        rng.normal(0, 1e4, 4096),          # overflow / large normals
        rng.normal(0, 1e-5, 4096),         # fp16 subnormal range
        rng.normal(0, 1e-8, 1024),         # underflow
        rng.uniform(-65520, 65520, 4096),  # saturation boundary
        np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 65504.0, -65504.0,
                  65519.99, 65520.0, 65536.0, 2.0 ** -24, 2.0 ** -25,
                  1.5 * 2.0 ** -25, 2.0 ** -14, 2.0 ** -15, 1e-45]),
    ]).astype(np.float32)
    # Exhaustive-ish bit sweep: every exponent with random mantissas.
    bits = ((rng.integers(0, 256, 8192).astype(np.uint32) << 23)
            | rng.integers(0, 2 ** 23, 8192).astype(np.uint32)
            | (rng.integers(0, 2, 8192).astype(np.uint32) << 31))
    return np.concatenate([x, bits.view(np.float32)])


def test_f32_to_f16_bits_exact():
    x = _inputs()
    expected = x.astype(np.float16).view(np.uint16).astype(np.int32)
    got = np.asarray(f32_to_f16_bits(jnp.asarray(x)))
    exp_isnan = np.isnan(x.astype(np.float16))
    # Non-NaN: bit-exact (including signed zeros, inf, subnormals).
    np.testing.assert_array_equal(got[~exp_isnan], expected[~exp_isnan])
    # NaN: must still be an fp16 NaN (payload may differ from numpy's).
    g = got[exp_isnan]
    assert ((g & 0x7C00) == 0x7C00).all() and ((g & 0x3FF) != 0).all()


def test_f16_bits_to_f32_exact():
    h = np.arange(0, 2 ** 16, dtype=np.uint16)  # every fp16 pattern
    expected = h.view(np.float16).astype(np.float32)
    got = np.asarray(f16_bits_to_f32(jnp.asarray(h.astype(np.int32))))
    nan = np.isnan(expected)
    np.testing.assert_array_equal(got[~nan], expected[~nan])
    assert np.isnan(got[nan]).all()
    # Signed zero preserved.
    assert np.signbit(got[0x8000]) and not np.signbit(got[0])


def test_roundtrip_under_jit():
    x = jnp.linspace(-70000, 70000, 1001, dtype=jnp.float32)
    f = jax.jit(lambda v: f16_bits_to_f32(f32_to_f16_bits(v)))
    got = np.asarray(f(x))
    expected = np.asarray(x).astype(np.float16).astype(np.float32)
    np.testing.assert_array_equal(got, expected)
