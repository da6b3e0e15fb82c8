"""Single-pass Pallas int4 unpack-matmul vs jnp references (interpret
mode on CPU; the TPU path is driven by tools/bench_int4.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.kernels.int4_matmul import (int4_matmul,
                                        quantize_weights_int4_grouped)
from fp8tpu.serve.model import quantize_weights_int4


def _dequant_per_channel(wp, s):
    lo = ((wp.astype(np.int32) & 0xF) - ((wp.astype(np.int32) & 0x8) << 1))
    hi = (wp.astype(np.int32) >> 4) - (wp.astype(np.int32) & 0x80) // 8
    k2, n = wp.shape
    w = np.zeros((2 * k2, n), np.float32)
    w[0::2] = lo
    w[1::2] = hi
    return w * np.asarray(s)[None, :]


def test_int4_matmul_per_channel(rng):
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 64)) * 0.1, jnp.float32)
    wp, s = quantize_weights_int4(w)
    want = np.asarray(x, np.float32) @ _dequant_per_channel(
        np.asarray(wp), s)
    got = np.asarray(int4_matmul(x, wp, s, interpret=True,
                                 out_dtype=jnp.float32, tn=64, tk2=64))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int4_matmul_matches_xla_formulation(rng):
    """Kernel == the XLA even/odd int4_linear path bit-for-bit-ish."""
    from fp8tpu.serve.model import int4_linear
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 128)) * 0.2, jnp.float32)
    wp, s = quantize_weights_int4(w)
    want = np.asarray(int4_linear(x.astype(jnp.bfloat16), wp, s),
                      np.float32)
    got = np.asarray(int4_matmul(x.astype(jnp.bfloat16), wp, s,
                                 interpret=True, tn=128, tk2=128),
                     np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("gs", [32, 64])
def test_int4_matmul_grouped(rng, gs):
    """Grouped (AWQ-class) scales vs an explicit jnp dequant reference."""
    k, n = 128, 64
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)) * 0.1, jnp.float32)
    # make scales genuinely vary across groups
    w = w * jnp.asarray(
        np.repeat(2.0 ** rng.integers(-2, 3, (k // gs,)), gs))[:, None]
    wp, s = quantize_weights_int4_grouped(w, group_size=gs)
    wd = _dequant_per_channel(np.asarray(wp), np.ones(n))
    wd = wd.reshape(k // gs, gs, n) * np.asarray(s)[:, None]
    want = np.asarray(x) @ wd.reshape(k, n)
    got = np.asarray(int4_matmul(x, wp, s, group_size=gs, interpret=True,
                                 out_dtype=jnp.float32, tn=64, tk2=64))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_grouped_quantizer_better_than_per_channel(rng):
    """Grouped scales must reduce dequant error on scale-varying rows —
    the reason AWQ-class quantization exists."""
    k, n = 256, 32
    w = rng.standard_normal((k, n)).astype(np.float32)
    w *= np.repeat(2.0 ** rng.integers(-3, 4, (k // 32,)), 32)[:, None]
    wj = jnp.asarray(w)
    wp_pc, s_pc = quantize_weights_int4(wj)
    wd_pc = _dequant_per_channel(np.asarray(wp_pc), np.asarray(s_pc))
    wp_g, s_g = quantize_weights_int4_grouped(wj, group_size=32)
    wd_g = _dequant_per_channel(np.asarray(wp_g), np.ones(n))
    wd_g = (wd_g.reshape(k // 32, 32, n)
            * np.asarray(s_g)[:, None]).reshape(k, n)
    err_pc = np.abs(wd_pc - w).mean()
    err_g = np.abs(wd_g - w).mean()
    assert err_g < err_pc * 0.5, (err_g, err_pc)
