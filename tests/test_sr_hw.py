"""f32-domain stochastic-rounding fast path (cast_impl='hw',
scheme='stochastic')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8tpu.numerics.formats import FORMATS
from fp8tpu.quant.config import TensorQuantConfig
from fp8tpu.quant.fakequant import fake_quant


def _grid_ok(vals, fmt):
    """Every output value must round-trip the hardware dtype exactly."""
    dt = {"e5m2": jnp.float8_e5m2, "e4m3": jnp.float8_e4m3fn}[fmt]
    v = jnp.asarray(vals)
    rt = np.asarray(v.astype(dt).astype(jnp.float32))
    np.testing.assert_array_equal(np.asarray(vals), rt)


@pytest.mark.parametrize("fmt", ["e5m2", "e4m3"])
def test_sr_outputs_on_grid(fmt, rng):
    x = jnp.asarray((rng.standard_normal(8192) * 20).astype(np.float32))
    cfg = TensorQuantConfig(fmt, "stochastic", cast_impl="hw")
    out = np.asarray(fake_quant(x, cfg, jax.random.key(0)))
    _grid_ok(out, fmt)


@pytest.mark.parametrize("fmt", ["e5m2", "e4m3", "float16", "bfloat16"])
def test_sr_unbiased(fmt):
    """Mean over many SR draws converges to x (the defining property)."""
    f = FORMATS[fmt]
    # values straddling normal and subnormal ranges; bf16/f16 subnormals
    # sit below f32-normal territory where _sr_hw flushes, so test their
    # normal range only
    if fmt in ("bfloat16", "float16"):
        xvals = np.asarray([1.3, -2.7, 0.33, 1e-3, -17.0, 17.0],
                           np.float32)
    else:
        xvals = np.asarray([1.3, -2.7, 0.33, f.min_subnormal * 3.3,
                            -f.min_subnormal * 1.7, 17.0], np.float32)
    cfg = TensorQuantConfig(fmt, "stochastic", cast_impl="hw")
    x = jnp.asarray(np.tile(xvals, (4096, 1)))

    @jax.jit
    def draw(key):
        return fake_quant(x, cfg, key)

    acc = np.zeros_like(np.asarray(x), np.float64)
    n = 8
    for i in range(n):
        acc += np.asarray(draw(jax.random.key(i)), np.float64)
    mean = (acc / n).mean(axis=0)
    # relative bias well under half an ulp of the format
    rel = np.abs(mean - xvals) / np.abs(xvals)
    assert (rel < 2.0 ** (-f.mant_bits) / 2).all(), rel


def test_sr_saturates():
    cfg = TensorQuantConfig("e4m3", "stochastic", cast_impl="hw")
    x = jnp.asarray([1e9, -1e9, 448.0], jnp.float32)
    out = np.asarray(fake_quant(x, cfg, jax.random.key(0)))
    np.testing.assert_array_equal(out, [448.0, -448.0, 448.0])


def test_sr_bf16_zero_and_subnormal_inputs():
    """ADVICE r1 regression: bf16 SR-hw must not NaN-poison x==0 or
    saturate f32-subnormal inputs (2^(m-emin)=2^133 used to overflow)."""
    cfg = TensorQuantConfig("bfloat16", "stochastic", cast_impl="hw")
    x = jnp.asarray([0.0, -0.0, 1e-40, -1e-40, 1e-38, 1.0], jnp.float32)
    out = np.asarray(fake_quant(x, cfg, jax.random.key(3)))
    assert not np.isnan(out).any(), out
    assert out[0] == 0.0 and out[1] == 0.0
    # subnormal inputs stay tiny (grid-rounded), never saturate to 3.4e38
    assert (np.abs(out[2:5]) < 1e-37).all(), out
    assert out[5] == 1.0


@pytest.mark.parametrize("fmt", ["e5m2", "bfloat16", "float16"])
def test_sr_inf_passthrough(fmt):
    """Formats with an inf encoding pass ±inf through (matches _qdq_hw)."""
    cfg = TensorQuantConfig(fmt, "stochastic", cast_impl="hw")
    x = jnp.asarray([np.inf, -np.inf, 2.0], jnp.float32)
    out = np.asarray(fake_quant(x, cfg, jax.random.key(0)))
    assert np.isposinf(out[0]) and np.isneginf(out[1]), out


def test_sr_e4m3_inf_saturates():
    """e4m3 (no inf encoding) saturates overflow, including inf inputs."""
    cfg = TensorQuantConfig("e4m3", "stochastic", cast_impl="hw")
    x = jnp.asarray([np.inf, -np.inf], jnp.float32)
    out = np.asarray(fake_quant(x, cfg, jax.random.key(0)))
    np.testing.assert_array_equal(out, [448.0, -448.0])


def test_sr_bf16_subnormal_flush_documented():
    """bf16-subnormal inputs are f32-subnormal; XLA's CPU and TPU backends
    run f32 ops with DAZ+FTZ, so they flush to zero deterministically
    (matching real bf16 hardware).  The contract is: never NaN, never
    saturate — zero is the documented result."""
    f = FORMATS["bfloat16"]
    cfg = TensorQuantConfig("bfloat16", "stochastic", cast_impl="hw")
    xvals = np.asarray([f.min_subnormal * 3.3, -f.min_subnormal * 1.7],
                       np.float32)
    x = jnp.asarray(np.tile(xvals, (1024, 1)))
    out = np.asarray(fake_quant(x, cfg, jax.random.key(1)))
    assert np.isfinite(out).all()
    assert (np.abs(out) <= f.min_subnormal * 8).all()  # flushed or on-grid


def test_sr_matches_bitexact_distributionally(rng):
    """hw-SR and the reference pipeline SR must agree in expectation
    (different random streams, same grid)."""
    x = jnp.asarray((rng.standard_normal(4096) * 5).astype(np.float32))
    hw = TensorQuantConfig("e5m2", "stochastic", cast_impl="hw")
    ref = TensorQuantConfig("e5m2", "stochastic")
    mh = mr = 0.0
    for i in range(6):
        mh += float(jnp.mean(fake_quant(x, hw, jax.random.key(i))))
        mr += float(jnp.mean(fake_quant(x, ref, jax.random.key(100 + i))))
    assert abs(mh - mr) / 6 < 5e-3


def test_sr_bits_hash_uniform_and_keyed():
    """The murmur-hash dither source: uniform to ~chi-square tolerance,
    deterministic per key, decorrelated across keys (NOTES r3 — threefry
    was ~35% of the fp8 train step; SR needs dither, not crypto)."""
    from fp8tpu.numerics.cast import sr_bits
    k1 = jax.random.fold_in(jax.random.key(0), 7)
    k2 = jax.random.fold_in(jax.random.key(0), 8)
    a = np.asarray(sr_bits(k1, (1 << 16,)))
    b = np.asarray(sr_bits(k2, (1 << 16,)))
    a2 = np.asarray(sr_bits(k1, (1 << 16,)))
    np.testing.assert_array_equal(a, a2)        # deterministic per key
    assert (a != b).mean() > 0.99               # keys decorrelate
    # 16-bucket uniformity: expected 4096/bucket, chi2_15 99.9% ~ 37.7
    counts = np.bincount(a >> 12, minlength=16)
    chi2 = (((counts - 4096.0) ** 2) / 4096.0).sum()
    assert chi2 < 60.0, (chi2, counts)
    # mean of the uniform dither ~ 32767.5
    assert abs(a.mean() - 32767.5) < 300.0, a.mean()
