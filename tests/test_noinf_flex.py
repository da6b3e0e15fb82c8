"""E5M2 noINF / flex variants (VERDICT r2 missing #5): the reference's
out-of-ABI L0 kernels (fpemu_impl.cpp:460-593), exposed here as mode
strings E5M2_NOINF_RNE / E5M2_FLEX_RNE with golden + jittable twins."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.numerics import golden
from fp8tpu.numerics.cast import cast_array, qdq_mode_string
from fp8tpu.numerics.formats import RoundMode


def _grid():
    vals = [0.0, -0.0, 1.0, -1.0, 1.25, 1.5, 1.75, 2.0, 3.0,
            57344.0, -57344.0, 61440.0, 65504.0, -65504.0,
            448.0, -448.0, 30.0, 2.0 ** -14, 2.0 ** -15, 2.0 ** -16,
            2.0 ** -17, 1.5e-5, -1.5e-5, 6e-8,
            np.inf, -np.inf, np.nan]
    rng = np.random.default_rng(0)
    vals += list(rng.normal(0, 10, 500))
    vals += list(rng.normal(0, 1e4, 200))
    vals += list(rng.normal(0, 1e-5, 200))
    return np.asarray(vals, np.float32)


@pytest.mark.parametrize("mode", ["E5M2_NOINF_RNE", "E5M2_FLEX_RNE"])
def test_jnp_matches_golden_bitexact(mode):
    x = _grid()
    g = golden.cast_mode_string(x, mode)
    j = np.asarray(qdq_mode_string(jnp.asarray(x), mode))
    np.testing.assert_array_equal(g.view(np.uint32), j.view(np.uint32))


def test_noinf_reclaims_inf_nan():
    x = np.asarray([np.inf, -np.inf, np.nan], np.float32)
    y = golden.cast_e5m2_noinf(x)
    # all specials map to the single reclaimed code, decoding as +inf
    assert np.isposinf(y).all(), y


def test_noinf_matches_e5m2_in_normal_range():
    """Inside E5M2's normal range the noINF grid is the E5M2 grid (the
    offset-16 rebias round-trips); differences appear only at the
    specials and the wrap boundaries."""
    rng = np.random.default_rng(1)
    x = np.asarray(rng.normal(0, 100, 2000), np.float32)
    x = x[(np.abs(x) > 2.0 ** -10) & (np.abs(x) < 2.0 ** 14)]
    a = golden.cast_e5m2_noinf(x)
    b = golden.cast_e5m2(x, RoundMode.RNE)
    np.testing.assert_array_equal(a, b)


def test_noinf_positive_overflow_wraps_to_inf():
    """fp16-max-class positives RNE past the top of the reclaimed range
    and land on the inf code (carry through exponent — the reference's
    wrap arithmetic, replicated)."""
    y = golden.cast_e5m2_noinf(np.asarray([65504.0], np.float32))
    assert np.isposinf(y)[0], y


def test_flex_flush_and_grid():
    x = np.asarray([1e-6, -1e-6, 2.0 ** -17], np.float32)
    y = golden.cast_e5m2_flex(x)
    np.testing.assert_array_equal(y, np.zeros_like(y))   # |x| < 2^-16

    # mid-range outputs sit on the 2-mantissa-bit grid
    rng = np.random.default_rng(2)
    x = np.asarray(rng.normal(0, 10, 1000), np.float32)
    x = x[np.abs(x) > 2.0 ** -10]
    y = golden.cast_e5m2_flex(x)
    m, _ = np.frexp(y)
    frac = m * 8.0
    np.testing.assert_array_equal(frac, np.round(frac))


def test_flex_single_rounding_differs_from_via_fp16():
    """flex rounds once in the f32 domain; the standard E5M2 path double
    rounds via fp16.  A value engineered to straddle both boundaries
    shows the difference (this is the variant's reason to exist)."""
    # 1.125 + 2^-12 sits just above the 1.0/1.25 tie: fp16-RNE first
    # rounds it DOWN onto the tie (1.125), which the e5m2 tie-to-even
    # then sends to 1.0 — while one direct f32 rounding goes up to 1.25.
    base = np.float32(1.125 + 2 ** -12)
    a = golden.cast_e5m2_flex(np.asarray([base]))
    b = golden.cast_e5m2(np.asarray([base]), RoundMode.RNE)
    assert a[0] == np.float32(1.25) and b[0] == np.float32(1.0), (a, b)


def test_mode_strings_rne_only():
    with pytest.raises(ValueError):
        cast_array(jnp.ones((4,)), 1.0, None, "e5m2_noinf",
                   RoundMode.STOCHASTIC)
