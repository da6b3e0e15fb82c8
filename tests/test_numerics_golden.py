"""Golden-model property and known-value tests.

The boundary-value vector extends the reference's acceptance script
(/root/reference/mpemu/pytquant/test.py:120-135) with exhaustive grid and
property checks the reference never had (SURVEY.md §4 implication).
"""

import numpy as np
import pytest

from fp8tpu.numerics import (
    E3M4,
    E4M3,
    E4M3_IEEE,
    E5M2,
    FORMATS,
    RoundMode,
)
from fp8tpu.numerics import golden


BOUNDARY = np.array(
    [
        0.0, -0.0, 1.0, -1.0, 57344.0, -57344.0, 61440.0, -61440.0,
        65504.0, -65504.0, 448.0, -448.0, 480.0, -480.0, 449.0,
        240.0, -240.0, 30.0, -30.0, 31.0, -31.0, 2.0 ** -16, -(2.0 ** -16),
        2.0 ** -9, 2.0 ** -6, 2.0 ** -2, 1.5e-5, 1.9e-3, 1.5e-2,
        0.1, -0.1, 3.14159, -2.71828, 1e6, -1e6, 1e-8, -1e-8,
        np.inf, -np.inf, np.nan,
    ],
    dtype=np.float32,
)


def fp8_grid(fmt):
    """All finite non-negative values the reference cast can emit.

    This is the true format grid plus — for the rebias formats — the
    reference's denormal-range outputs: the reference rounds/truncates
    denormals at the *normal* mantissa position after only zeroing
    ``dshift`` low bits (fpemu_impl.cpp:1087-1095), so values like
    1.875·2^-7 (off the strict 2^-9 E4M3 subnormal grid) are emitted.
    Replicated bit-for-bit, hence part of the expected grid.
    """
    vals = {0.0}
    for e in range(0, 2 ** fmt.exp_bits):
        for m in range(0, 2 ** fmt.mant_bits):
            exp = e - fmt.bias
            if e == 0:
                v = (m / 2 ** fmt.mant_bits) * 2.0 ** (1 - fmt.bias)
            else:
                v = (1 + m / 2 ** fmt.mant_bits) * 2.0 ** exp
            vals.add(v)
    if fmt.cast_rebias:
        for exp in range(fmt.cast_flush_exp, fmt.cast_min_norm_exp):
            for m in range(0, 2 ** fmt.mant_bits):
                vals.add((1 + m / 2 ** fmt.mant_bits) * 2.0 ** exp)
    return np.array(sorted(v for v in vals if v <= fmt.max_normal * 1.01),
                    dtype=np.float32)


@pytest.mark.parametrize("fmt", [E5M2, E4M3, E4M3_IEEE, E3M4])
def test_rne_lands_on_grid(fmt, rng):
    x = rng.uniform(-2 * fmt.max_normal, 2 * fmt.max_normal,
                    size=4096).astype(np.float32)
    x = np.concatenate([x, BOUNDARY])
    y = golden.cast(x, fmt, RoundMode.RNE)
    grid = fp8_grid(fmt)
    finite = np.isfinite(y)
    ay = np.abs(y[finite])
    # Every finite output must be a representable magnitude.
    ok = np.isclose(ay[:, None], grid[None, :], rtol=0, atol=0).any(axis=1)
    assert ok.all(), f"{fmt.name}: off-grid values {ay[~ok][:10]}"


@pytest.mark.parametrize("fmt", [E5M2, E4M3, E4M3_IEEE, E3M4])
def test_idempotent(fmt, rng):
    x = rng.normal(0, fmt.max_normal / 8, size=4096).astype(np.float32)
    y = golden.cast(x, fmt, RoundMode.RNE)
    y2 = golden.cast(y, fmt, RoundMode.RNE)
    keep = np.isfinite(y)
    np.testing.assert_array_equal(y[keep], y2[keep])


@pytest.mark.parametrize("fmt", [E5M2, E4M3, E4M3_IEEE, E3M4])
def test_grid_values_exact(fmt):
    grid = fp8_grid(fmt)
    grid = np.concatenate([grid, -grid])
    y = golden.cast(grid, fmt, RoundMode.RNE)
    np.testing.assert_array_equal(y, grid)


def test_e5m2_known_values():
    c = lambda v: golden.cast(np.float32([v]), E5M2, RoundMode.RNE)[0]
    assert c(57344.0) == 57344.0
    assert c(1.0) == 1.0
    # fp16 max rounds past the E5M2 max into inf (reference keeps inf).
    assert np.isinf(c(65504.0))
    assert np.isinf(c(61440.0))  # tie at bit pattern 0x7B80 rounds up
    assert c(2.0 ** -16) == 2.0 ** -16  # min subnormal exact
    assert c(2.0 ** -17) == 0.0         # below min subnormal, RNE tie down
    assert c(1.1) == 1.0
    assert c(1.25) == 1.25
    assert c(1.375) == 1.25 or c(1.375) == 1.5  # tie → even (1.5 mant=0b10)
    assert c(-3.0) == -3.0


def test_e4m3_known_values():
    c = lambda v: golden.cast(np.float32([v]), E4M3, RoundMode.RNE)[0]
    assert c(448.0) == 448.0
    assert c(449.0) == 448.0      # saturate
    assert c(1e6) == 448.0        # saturate
    assert c(np.inf) == 448.0     # reference quirk: inf saturates to max
    assert c(-np.inf) == -448.0
    assert c(2.0 ** -9) == 2.0 ** -9    # min subnormal
    assert c(1.9e-3) == 0.0             # below min subnormal: flushed
    assert c(0.4375) == 0.4375
    assert c(1.0625) == 1.0             # rounds down (grid step 0.125)
    assert c(1.1) == 1.125


def test_e4m3_ieee_saturation():
    """E4M3-IEEE saturates at |fp16| >= 240 — the reference's AVX512
    production semantics (vsatuval 0x5B80, fpemu_impl.cpp:1221), proven
    bitwise in DIFFREF.json.  The reference's SCALAR tail saturates
    anything >= 15.0 (its can_round constant 0x4B80 is a typo of
    0x5B80); that internal inconsistency is deliberately not modeled."""
    c = lambda v: golden.cast(np.float32([v]), E4M3_IEEE, RoundMode.RNE)[0]
    assert c(240.0) == 240.0
    assert c(300.0) == 240.0
    assert c(15.0) == 15.0
    assert c(24.278477) == 24.0
    assert c(239.0) == 240.0  # RNE onto the grid (step 16 at exp 7)
    assert c(14.5) == 14.0    # tie at step 1 (exp 3) -> even
    assert c(1.0) == 1.0


def test_e3m4_known_values():
    c = lambda v: golden.cast(np.float32([v]), E3M4, RoundMode.RNE)[0]
    assert c(30.0) == 30.0
    assert c(31.0) == 30.0
    assert c(1e5) == 30.0
    assert c(2.0 ** -6) == 2.0 ** -6
    assert c(1.5e-2) == 0.0
    assert c(1.03125) == 1.0  # half-step tie → even (grid step is 1/16)
    assert c(1.0) == 1.0


def test_e3m4_grid_step():
    # mant_bits=4 → step 1/16 at exponent 0.
    x = np.float32([1.0 + 1.0 / 16.0])
    assert golden.cast(x, E3M4, RoundMode.RNE)[0] == 1.0625


def test_bf16_rne_matches_numpy():
    """BF16 RNE is true full-sticky round-to-nearest-even — the
    reference's AVX512 production path (0x7FFF+lsb bias add,
    fpemu_impl.cpp:207-231), proven bitwise in DIFFREF.json — so it must
    equal ml_dtypes' IEEE bfloat16 conversion EVERYWHERE.  (The
    reference's scalar size%16 tail uses a 4-bit GRS window that drops
    sticky bits 12..0 — an internal inconsistency not modeled.)"""
    import ml_dtypes
    rng = np.random.default_rng(1)
    x = rng.normal(0, 10, 4096).astype(np.float32)

    y_full = golden.cast_bfloat16(x, RoundMode.RNE)
    true_rne = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    np.testing.assert_array_equal(y_full, true_rne)

    # NaN/Inf pass through (the bias add is gated, matching the
    # intrinsic's vnaninf mask).
    sp = np.float32([np.inf, -np.inf, np.nan])
    ysp = golden.cast_bfloat16(sp, RoundMode.RNE)
    assert ysp[0] == np.inf and ysp[1] == -np.inf and np.isnan(ysp[2])


def test_fp16_rne_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 10, 4096).astype(np.float32)
    y = golden.cast_float16(x, RoundMode.RNE)
    np.testing.assert_array_equal(y, x.astype(np.float16).astype(np.float32))


def test_fp16_daz_flushes_denormals():
    x = np.float32([2.0 ** -25, -(2.0 ** -25), 1.0, 2.0 ** -15])
    y = golden.cast_float16(x, RoundMode.RNE, daz=True)
    assert y[0] == 0.0 and y[1] == 0.0
    assert y[2] == 1.0
    assert y[3] == 0.0  # 2^-15 is an fp16 denormal → flushed


def test_fp4_power_of_two_grid():
    x = np.float32([1.0, 0.9, 0.30, 0.26, 0.24, 2.0, -0.5, 0.0, 1e-6])
    y = golden.cast_fp4(x)
    # Grid: ± even powers of two in [2^-12, 1].
    assert y[0] == 1.0
    assert y[1] == 1.0          # 0.9*1.6 = 1.44 → rounds up to 1.0
    assert y[2] == 0.25         # 0.3*1.6=0.48 <1 → exp -2 stays → 0.25
    assert y[5] == 1.0          # saturate above 1
    assert y[6] == -0.5 or y[6] == -0.25  # odd exponent resolves via probe
    assert y[7] == 0.0
    assert y[8] == 0.0          # below 2^-12 flushes
    # -0.5: exp -1 odd; 0.5*1.6=0.8 exp stays -1 → round down to 0.25
    assert y[6] == -0.25


def test_rounding_mode_ordering(rng):
    """RTZ ≤ RNE-family ≤ away rounding in magnitude; RPINF ≥ RNINF."""
    x = rng.normal(0, 100, 4096).astype(np.float32)
    rtz = golden.cast(x, E5M2, RoundMode.RTZ)
    rne = golden.cast(x, E5M2, RoundMode.RNE)
    rnaz = golden.cast(x, E5M2, RoundMode.RNAZ)
    rpinf = golden.cast(x, E5M2, RoundMode.RPINF)
    rninf = golden.cast(x, E5M2, RoundMode.RNINF)
    assert (np.abs(rtz) <= np.abs(rnaz)).all()
    assert (np.abs(rtz) <= np.abs(rne)).all()
    assert (rpinf >= rninf).all()


def test_stochastic_rounding_statistics():
    """SR must be unbiased-ish: mean of many SR casts approaches x."""
    rng = np.random.default_rng(3)
    x = np.full((20000,), 1.1, np.float32)  # between 1.0 and 1.25 on E5M2
    bits = rng.integers(0, 2 ** 16, size=x.shape, dtype=np.uint16)
    y = golden.cast(x, E5M2, RoundMode.STOCHASTIC, random_bits=bits)
    vals = np.unique(y)
    assert set(vals).issubset({np.float32(1.0), np.float32(1.25)})
    # E[y] = 1.1 → fraction at 1.25 ≈ (1.1-1.0)/0.25 = 0.4.
    frac_up = float((y == 1.25).mean())
    assert abs(frac_up - 0.4) < 0.03
    assert abs(float(y.mean()) - 1.1) < 0.01


def test_stochastic_e4m3_grid_membership(rng):
    x = rng.normal(0, 10, 4096).astype(np.float32)
    bits = np.random.default_rng(4).integers(
        0, 2 ** 16, size=x.shape, dtype=np.uint16
    )
    y = golden.cast(x, E4M3, RoundMode.STOCHASTIC, random_bits=bits)
    grid = fp8_grid(E4M3)
    ok = np.isclose(np.abs(y)[:, None], grid[None, :], rtol=0, atol=0).any(1)
    assert ok.all()


def test_e5m2_daz_flushes_denormals():
    x = np.float32([2.0 ** -16, 2.0 ** -15, 1.0, 2.0 ** -25])
    y = golden.cast(x, E5M2, RoundMode.RNE, daz=True)
    # fp16 denormals (< 2^-14) flush to zero under DAZ.
    assert y[0] == 0.0 and y[1] == 0.0 and y[3] == 0.0
    assert y[2] == 1.0


def test_scale_roundtrip():
    """Scaled cast: values map onto grid/scale."""
    x = np.float32([100.0, 200.0, 300.0])
    scale = 448.0 / 300.0  # max-scaling for E4M3
    y = golden.cast(x, E4M3, RoundMode.RNE, scale=scale)
    assert abs(y[2] - 300.0) < 1.0  # vmax maps to flt_max exactly-ish
    assert np.all(np.abs(y - x) / x < 0.08)


def test_block_scales_power_of_two():
    x = np.float32([1.0, 2.0, 3.0, 100.0, 0.5, 0.25, 0.1, 0.0])
    s = golden.block_scales(x, 4, E4M3)
    # block0 absmax 100 → 2·64/8 = 16; block1 absmax 0.5 → 2·0.5/8 = 0.125.
    assert s[0] == 16.0
    assert s[1] == 0.125


def test_blocked_cast_matches_manual():
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, 256).astype(np.float32)
    y = golden.cast_blocked(x, E4M3, RoundMode.RNE, block_size=64)
    s = golden.block_scales(x, 64, E4M3)
    manual = np.concatenate([
        golden.cast(x[i * 64:(i + 1) * 64], E4M3, RoundMode.RNE,
                    scale=float(s[i]))
        for i in range(4)
    ])
    np.testing.assert_array_equal(y, manual)


def test_mode_string_dispatch():
    x = np.float32([1.1, -2.2, 300.0])
    np.testing.assert_array_equal(
        golden.cast_mode_string(x, "E4M3_RNE"),
        golden.cast(x, E4M3, RoundMode.RNE),
    )
    np.testing.assert_array_equal(
        golden.cast_mode_string(x, "E5M2_DAZ_RNE"),
        golden.cast(x, E5M2, RoundMode.RNE, daz=True),
    )
