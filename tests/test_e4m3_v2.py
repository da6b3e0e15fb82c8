"""E4M3 "v2" variant — the reference's dead CUDA-only ``E4M3v2_Kernel``
(fpemu_kernels.cu:770-875): never instantiated nor dispatched there, but
part of the L0 kernel surface.  Implemented as golden + jittable twins,
exposed as mode strings ``E4M3_V2_<mode>`` (like the out-of-ABI E5M2
noINF/flex variants)."""

import numpy as np
import pytest

import jax.numpy as jnp

from fp8tpu.numerics import golden
from fp8tpu.numerics.cast import cast_array, qdq_mode_string
from fp8tpu.numerics.formats import RoundMode


def _grid():
    vals = [0.0, -0.0, 1.0, -1.0, 0.9375, -0.9375, 0.96875, 0.999,
            0.5, 0.25, 0.1, 15.0, 14.9, 448.0, 65504.0, -65504.0,
            2.0 ** -14, 2.0 ** -15, 2.0 ** -24, 6e-8, -6e-8,
            np.inf, -np.inf, np.nan]
    rng = np.random.default_rng(0)
    vals += list(rng.normal(0, 0.3, 500))
    vals += list(rng.normal(0, 30, 200))
    vals += list(rng.normal(0, 1e-5, 200))
    return np.asarray(vals, np.float32)


@pytest.mark.parametrize("mode", [RoundMode.RNE, RoundMode.RNAZ,
                                  RoundMode.RNTZ, RoundMode.RPINF,
                                  RoundMode.RNINF, RoundMode.RTZ])
def test_jnp_matches_golden_bitexact(mode):
    x = _grid()
    g = golden.cast_e4m3_v2(x, mode)
    j = np.asarray(cast_array(jnp.asarray(x), 1.0, None, "e4m3_v2", mode))
    np.testing.assert_array_equal(g.view(np.uint32), j.view(np.uint32))


def test_jnp_matches_golden_stochastic():
    x = _grid()
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 1 << 16, x.shape).astype(np.uint16)
    g = golden.cast_e4m3_v2(x, RoundMode.STOCHASTIC, random_bits=bits)
    j = np.asarray(cast_array(jnp.asarray(x), 1.0, jnp.asarray(bits),
                              "e4m3_v2", RoundMode.STOCHASTIC))
    np.testing.assert_array_equal(g.view(np.uint32), j.view(np.uint32))


def test_saturates_everything_at_or_above_one():
    """|x| >= 1.0 — fp16 inf/NaN included — clamps to ±0.9375
    (fpemu_kernels.cu:828-833: exp_h > -1 forces mantissa 0x380,
    exponent -1, before any rounding)."""
    x = np.asarray([1.0, 2.0, 15.0, 448.0, 1e9, np.inf, np.nan], np.float32)
    y = golden.cast_e4m3_v2(x)
    np.testing.assert_array_equal(y, np.full_like(y, 0.9375))
    yn = golden.cast_e4m3_v2(-x)
    np.testing.assert_array_equal(yn, np.full_like(yn, -0.9375))


def test_rounding_carry_escapes_saturation():
    """The saturation check precedes rounding, so a value just below 1.0
    RNE-rounds up to exactly 1.0 (mantissa carry into the exponent
    field) — above the variant's own saturation point.  Reference
    quirk, replicated bit-for-bit."""
    below = np.float32(1.0 - 2.0 ** -11)        # fp16: 0x3BFF
    y = golden.cast_e4m3_v2(np.asarray([below]))
    assert y[0] == np.float32(1.0), y


def test_grid_is_three_mantissa_bits_raw_exponent():
    """Sub-unit outputs sit on a 3-mantissa-bit grid with the raw fp16
    exponent (no rebias, no flush: tiny values keep subnormal
    resolution instead of flushing like E4M3 proper)."""
    rng = np.random.default_rng(4)
    x = np.asarray(rng.uniform(-0.99, 0.99, 2000), np.float32)
    y = golden.cast_e4m3_v2(x)
    nz = y[y != 0]
    m, _ = np.frexp(nz)
    frac = m * 16.0
    np.testing.assert_array_equal(frac, np.round(frac))
    # no flush-to-zero at E4M3's 2^-9 threshold
    tiny = golden.cast_e4m3_v2(np.asarray([2.0 ** -12], np.float32))
    assert tiny[0] != 0.0


def test_mode_string_exposure():
    x = _grid()
    g = golden.cast_mode_string(x, "E4M3_V2_RNE")
    j = np.asarray(qdq_mode_string(jnp.asarray(x), "E4M3_V2_RNE"))
    np.testing.assert_array_equal(g.view(np.uint32), j.view(np.uint32))
    np.testing.assert_array_equal(g, golden.cast_e4m3_v2(x))
