"""TensorQuantConfig / ModuleQuantConfig / fake_quant / scaling tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.numerics import FORMATS, RoundMode, golden
from fp8tpu.numerics import scaling as sc
from fp8tpu.numerics.integer import qdq_int, int_qparams
from fp8tpu.quant import ModuleQuantConfig, TensorQuantConfig, fake_quant


def test_config_validity_matrix():
    TensorQuantConfig("e5m2", "rtz")
    TensorQuantConfig("e5m2", "daz_rne")
    TensorQuantConfig("e4m3", "stochastic")
    TensorQuantConfig("fp4", "nearest")
    with pytest.raises(ValueError):
        TensorQuantConfig("e4m3", "rtz")
    with pytest.raises(ValueError):
        TensorQuantConfig("e3m4", "daz_rne")
    with pytest.raises(ValueError):
        TensorQuantConfig("bogus", "rne")


def test_scaling_grammar():
    c = TensorQuantConfig("e4m3", "rne", "per-tensor-mean")
    assert c.scaling == "per-tensor" and c.method == "mean"
    c = TensorQuantConfig("e4m3", "rne", "per-channel")
    assert c.scaling == "per-channel" and c.method == "max"
    c = TensorQuantConfig("e4m3", "rne", "fine-grained", group_size=16)
    assert c.scaling == "fine-grained" and c.group_size == 16
    assert TensorQuantConfig("e5m2", "rne").scaling == "none"


def test_config_hashable_and_static():
    c1 = TensorQuantConfig("e4m3", "rne", "per-tensor")
    c2 = TensorQuantConfig("e4m3", "rne", "per-tensor")
    assert hash(c1) == hash(c2) and c1 == c2
    m = ModuleQuantConfig(wt=c1, iact=c2)
    assert m.role("wt") is c1
    assert m.without_roles("wt").wt is None
    hash(m)


def test_flt_max_min_match_reference():
    assert TensorQuantConfig("e5m2", "rne").get_flt_max() == 57344.0
    assert TensorQuantConfig("e4m3", "rne").get_flt_max() == 448.0
    assert TensorQuantConfig("e4m3_ieee", "rne").get_flt_max() == 240.0
    assert TensorQuantConfig("e3m4", "rne").get_flt_max() == 30.0
    assert abs(TensorQuantConfig("e5m2", "rne").get_flt_min()
               - 1.5258789e-05) < 1e-12
    assert abs(TensorQuantConfig("e4m3", "rne").get_flt_min()
               - 1.953125e-03) < 1e-12


def test_per_tensor_max_scaling_matches_reference_formula(rng):
    x = rng.normal(0, 5, 1024).astype(np.float32)
    fmt = FORMATS["e4m3"]
    s = float(sc.per_tensor(jnp.asarray(x), fmt, "max"))
    expected = 448.0 / np.abs(x).max()
    assert abs(s - expected) / expected < 1e-6
    # Degenerate: zero tensor → clamped scale.
    s0 = float(sc.per_tensor(jnp.zeros(8), fmt, "max"))
    assert s0 == 6.55e4


def test_per_tensor_max_scale_clamp_never_overshoots(rng):
    """Regression: the reference's clamp-UP (raw scale > 3.275e4 →
    6.55e4, qutils.py:280-287) can EXCEED the range-exact scale — for
    e5m2 with max|x| in [0.875, 1.75) the scaled max lands past 57344
    and the cast mints inf (bitexact) / collapses the top of the range
    (hw saturation).  Our clamp keeps the intent (pull tiny tensors up
    into the fp16 normal range) but never exceeds flt_max / max|x|."""
    fmt = FORMATS["e5m2"]
    for amax in (0.875, 1.0, 1.2, 1.7499):
        x = np.zeros(64, np.float32)
        x[0] = amax
        s = float(sc.per_tensor(jnp.asarray(x), fmt, "max"))
        assert s * amax <= 57344.0 * (1 + 1e-6), (amax, s)
        expected = min(6.55e4, 57344.0 / amax)
        assert abs(s - expected) / s < 1e-6
    # e4m3 window: amax in (448/6.55e4, 448/3.275e4)
    x = np.zeros(64, np.float32)
    x[0] = 0.01
    s = float(sc.per_tensor(jnp.asarray(x), FORMATS["e4m3"], "max"))
    assert s * 0.01 <= 448.0 * (1 + 1e-6)
    # zero/tiny tensors: the clamp still engages at exactly 6.55e4
    assert float(sc.per_tensor(jnp.full(8, 1e-7), fmt, "max")) == 6.55e4


def test_per_tensor_mean_scaling(rng):
    x = (rng.normal(0, 1e-7, 1024)).astype(np.float32)
    fmt = FORMATS["e4m3"]
    # mean below 1e-5 → mean floored to flt_min → scale 1.
    assert float(sc.per_tensor(jnp.asarray(x), fmt, "mean")) == 1.0
    x2 = rng.normal(0, 1e-4, 1024).astype(np.float32)
    s2 = float(sc.per_tensor(jnp.asarray(x2), fmt, "mean"))
    mean = np.abs(x2).mean()
    assert abs(s2 - max(1.0, fmt.min_subnormal / mean)) < 1e-6


def test_per_channel_scaling_shape(rng):
    x = rng.normal(0, 3, (16, 8, 3, 3)).astype(np.float32)
    s = sc.per_channel(jnp.asarray(x), "e4m3", "max")
    assert s.shape == (16, 1, 1, 1)
    for c in range(16):
        expected = 448.0 / np.abs(x[c]).max()
        assert abs(float(s[c, 0, 0, 0]) - expected) / expected < 1e-6


def test_fine_grained_scaling(rng):
    x = rng.normal(0, 3, (4, 32, 3, 3)).astype(np.float32)
    s = sc.fine_grained(jnp.asarray(x), "e4m3", group_size=16)
    assert s.shape == (4, 32, 1, 1)
    # Each group of 16 input channels shares one scale.
    g0 = 448.0 / np.abs(x[0, :16]).max()
    assert abs(float(s[0, 0, 0, 0]) - g0) / g0 < 1e-6
    assert float(s[0, 0, 0, 0]) == float(s[0, 15, 0, 0])
    assert float(s[0, 16, 0, 0]) != float(s[0, 0, 0, 0])


def test_fake_quant_matches_golden_per_tensor(rng):
    x = rng.normal(0, 5, 1024).astype(np.float32)
    cfg = TensorQuantConfig("e4m3", "rne", "per-tensor")
    got = np.asarray(fake_quant(jnp.asarray(x), cfg))
    scale = 448.0 / np.abs(x).max()
    scale = 6.55e4 if scale > 3.275e4 else scale
    expected = golden.cast(x, FORMATS["e4m3"], RoundMode.RNE,
                           scale=np.float32(scale))
    np.testing.assert_array_equal(got, expected)


def test_fake_quant_straight_through_gradient(rng):
    x = jnp.asarray(rng.normal(0, 2, 64).astype(np.float32))
    cfg = TensorQuantConfig("e4m3", "rne", "per-tensor")

    def loss(v):
        return jnp.sum(fake_quant(v, cfg) ** 2)

    g = jax.grad(loss)(x)
    # STE: d/dx sum(q(x)^2) = 2*q(x) (q treated as identity).
    np.testing.assert_allclose(np.asarray(g),
                               2 * np.asarray(fake_quant(x, cfg)), rtol=1e-6)


def test_fake_quant_stochastic_needs_key():
    cfg = TensorQuantConfig("e5m2", "stochastic")
    with pytest.raises(ValueError):
        fake_quant(jnp.ones(4), cfg)
    out = fake_quant(jnp.ones(4) * 1.1, cfg, key=jax.random.key(0))
    assert out.shape == (4,)


def test_fake_quant_jits_inside_larger_fn(rng):
    cfg = TensorQuantConfig("e4m3", "rne", "per-channel")
    x = jnp.asarray(rng.normal(0, 1, (8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 1, (32, 16)).astype(np.float32))

    @jax.jit
    def f(x, w):
        return fake_quant(x, cfg) @ fake_quant(w, cfg)

    out = f(x, w)
    assert out.shape == (8, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_int8_qdq_matches_reference_formula(rng):
    x = rng.normal(0, 3, 1024).astype(np.float32)
    got = np.asarray(qdq_int(jnp.asarray(x), bits=8))
    mn, mx = x.min(), x.max()
    scale = (mx - mn) / 255.0
    zp = -128 - mn / scale
    q = np.clip(np.round(x / scale + zp), -128, 127)
    expected = (scale * (q - zp)).astype(np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_int4_range():
    x = jnp.linspace(-1, 1, 64)
    y = qdq_int(x, bits=4)
    assert len(np.unique(np.asarray(y))) <= 16


def test_int_qparams_symmetric():
    s, zp = int_qparams(jnp.float32(-3.0), jnp.float32(2.0), symmetric=True)
    assert float(zp) == 0.0
    assert abs(float(s) - 3.0 / 127.5) < 1e-6


def test_fake_quant_per_block(rng):
    x = rng.normal(0, 2, 512).astype(np.float32)
    cfg = TensorQuantConfig("e5m2", "rne", "per-block", block_size=128)
    got = np.asarray(fake_quant(jnp.asarray(x), cfg))
    expected = golden.cast_blocked(x, FORMATS["e5m2"], RoundMode.RNE, 128)
    np.testing.assert_array_equal(got, expected)
