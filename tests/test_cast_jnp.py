"""jnp cast vs NumPy golden: bit-exact parity across every
(format × rounding × daz × scaling) cell, on CPU-XLA.

The Pallas TPU kernels are tested against the same golden in
test_kernels.py; this file pins the jittable emulation path."""

import numpy as np
import pytest

from fp8tpu.numerics import FORMATS, RoundMode, qdq, qdq_blocked, block_scales
from fp8tpu.numerics import golden

import jax.numpy as jnp


def _rand_input(rng, fmt, n=4097):
    """Random values spanning normals, denormals, saturation, specials."""
    scale_span = fmt.max_normal if np.isfinite(fmt.max_normal) else 3e4
    x = np.concatenate([
        rng.normal(0, scale_span / 8, n).astype(np.float32),
        rng.normal(0, scale_span * 2, 257).astype(np.float32),
        rng.normal(0, fmt.min_subnormal * 4, 257).astype(np.float32),
        np.float32([0.0, -0.0, np.inf, -np.inf, np.nan,
                    fmt.max_normal, -fmt.max_normal, fmt.min_subnormal]),
    ])
    return x


DETERMINISTIC_CASES = []
for name, fmt in FORMATS.items():
    for mode in fmt.valid_round_modes():
        if mode == RoundMode.STOCHASTIC:
            continue
        DETERMINISTIC_CASES.append((name, mode, False))
DETERMINISTIC_CASES += [
    ("e5m2", RoundMode.RNE, True),
    ("e5m2", RoundMode.RNAZ, True),
    ("e5m2", RoundMode.RNTZ, True),
    ("float16", RoundMode.RNE, True),
]


@pytest.mark.parametrize("name,mode,daz", DETERMINISTIC_CASES)
def test_jnp_matches_golden_deterministic(name, mode, daz, rng):
    fmt = FORMATS[name]
    x = _rand_input(rng, fmt)
    expected = golden.cast(x, fmt, mode, daz=daz)
    got = np.asarray(qdq(jnp.asarray(x), fmt, mode, daz=daz))
    np.testing.assert_array_equal(
        got[~np.isnan(expected)], expected[~np.isnan(expected)]
    )
    assert np.isnan(got[np.isnan(expected)]).all()


@pytest.mark.parametrize("name", ["e5m2", "e4m3", "e4m3_ieee", "e3m4",
                                  "bfloat16", "float16"])
def test_jnp_matches_golden_stochastic(name, rng):
    fmt = FORMATS[name]
    x = _rand_input(rng, fmt)
    bits = rng.integers(0, 2 ** 16, size=x.shape).astype(np.uint16)
    expected = golden.cast(x, fmt, RoundMode.STOCHASTIC, random_bits=bits)
    got = np.asarray(
        qdq(jnp.asarray(x), fmt, RoundMode.STOCHASTIC,
            random_bits=jnp.asarray(bits))
    )
    mask = ~np.isnan(expected)
    np.testing.assert_array_equal(got[mask], expected[mask])
    assert np.isnan(got[~mask]).all()


def test_jnp_e5m2_daz_stochastic(rng):
    fmt = FORMATS["e5m2"]
    x = _rand_input(rng, fmt)
    bits = rng.integers(0, 2 ** 16, size=x.shape).astype(np.uint16)
    expected = golden.cast(x, fmt, RoundMode.STOCHASTIC, daz=True,
                           random_bits=bits)
    got = np.asarray(
        qdq(jnp.asarray(x), fmt, RoundMode.STOCHASTIC, daz=True,
            random_bits=jnp.asarray(bits))
    )
    mask = ~np.isnan(expected)
    np.testing.assert_array_equal(got[mask], expected[mask])


@pytest.mark.parametrize("name", ["e5m2", "e4m3", "e3m4"])
def test_jnp_scaled_matches_golden(name, rng):
    fmt = FORMATS[name]
    x = rng.normal(0, 5, 2048).astype(np.float32)
    scale = float(fmt.max_normal / np.abs(x).max())
    expected = golden.cast(x, fmt, RoundMode.RNE, scale=scale)
    got = np.asarray(qdq(jnp.asarray(x), fmt, RoundMode.RNE, scale=scale))
    np.testing.assert_array_equal(got, expected)


def test_jnp_per_channel_scale_broadcast(rng):
    """Per-channel scaling as a broadcast array must equal per-channel
    golden loops (the reference launches one kernel per channel,
    qutils.py:289-311; we broadcast in one fused op)."""
    fmt = FORMATS["e4m3"]
    x = rng.normal(0, 5, (8, 256)).astype(np.float32)
    scales = fmt.max_normal / np.abs(x).max(axis=1)
    got = np.asarray(
        qdq(jnp.asarray(x), fmt, RoundMode.RNE,
            scale=jnp.asarray(scales)[:, None])
    )
    for c in range(8):
        expected = golden.cast(x[c], fmt, RoundMode.RNE,
                               scale=float(scales[c]))
        np.testing.assert_array_equal(got[c], expected)


@pytest.mark.parametrize("name", ["e5m2", "e4m3", "e3m4", "fp4"])
def test_jnp_blocked_matches_golden(name, rng):
    fmt = FORMATS[name]
    x = rng.normal(0, 3, 1000).astype(np.float32)  # non-multiple of block
    mode = RoundMode.NEAREST if name == "fp4" else RoundMode.RNE
    expected = golden.cast_blocked(x, fmt, mode, block_size=128)
    got = np.asarray(qdq_blocked(jnp.asarray(x), fmt, mode, block_size=128))
    np.testing.assert_array_equal(got, expected)


def test_jnp_block_scales_match_golden(rng):
    x = rng.normal(0, 3, 1024).astype(np.float32)
    for name in ("e5m2", "e4m3", "e3m4", "fp4"):
        fmt = FORMATS[name]
        expected = golden.block_scales(x, 128, fmt)
        got = np.asarray(block_scales(jnp.asarray(x), 128, fmt))
        np.testing.assert_array_equal(got, expected)


def test_qdq_preserves_shape_and_dtype(rng):
    x = rng.normal(0, 1, (4, 8, 16)).astype(np.float32)
    y = qdq(jnp.asarray(x), "e4m3", RoundMode.RNE)
    assert y.shape == (4, 8, 16)
    assert y.dtype == jnp.float32


def test_qdq_accepts_bf16_input(rng):
    x = rng.normal(0, 1, 512).astype(np.float32)
    y32 = qdq(jnp.asarray(x), "e4m3", RoundMode.RNE)
    ybf = qdq(jnp.asarray(x, dtype=jnp.bfloat16), "e4m3", RoundMode.RNE)
    # bf16 input loses bits first but must still land on the E4M3 grid.
    expected = golden.cast(
        np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32)),
        FORMATS["e4m3"], RoundMode.RNE,
    )
    np.testing.assert_array_equal(np.asarray(ybf), expected)
    assert y32.dtype == ybf.dtype == jnp.float32


def test_sr_requires_entropy():
    with pytest.raises(ValueError):
        qdq(jnp.ones((4,)), "e4m3", RoundMode.STOCHASTIC)


def test_fake_quant_sparse_bcoo(rng):
    """Sparse arrays cast their stored values only (the reference
    FPEmuOp's COO handling, pytquant/cpp/fpemu.py:46-58)."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse
    from fp8tpu.quant.config import TensorQuantConfig
    from fp8tpu.quant.fakequant import fake_quant, fake_quant_sparse

    x = np.zeros((8, 8), np.float32)
    x[1, 2], x[5, 5], x[0, 7] = 1.37, -0.021, 300.0
    sp = jsparse.BCOO.fromdense(jnp.asarray(x))
    cfg = TensorQuantConfig("e4m3", "rne")
    q = fake_quant_sparse(sp, cfg)
    assert isinstance(q, jsparse.BCOO)
    want = np.asarray(fake_quant(jnp.asarray(x), cfg))
    np.testing.assert_allclose(np.asarray(q.todense()), want, rtol=1e-6)
    # dense passthrough
    d = fake_quant_sparse(jnp.asarray(x), cfg)
    np.testing.assert_allclose(np.asarray(d), want, rtol=1e-6)
