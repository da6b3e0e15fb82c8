"""Native MXU C-model engine vs NumPy ground truth.

Mirrors the reference's cmodel test suite (mpemu/cmodel/tests/:
gemm_test, gemm_grad_test, conv_test) — L2/allclose comparisons against
a higher-precision reference (SURVEY.md §4.2)."""

import numpy as np
import pytest

from fp8tpu import cmodel

pytestmark = pytest.mark.skipif(not cmodel.available(),
                                reason="native toolchain unavailable")


def _bf16(x):
    import jax.numpy as jnp
    return np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))


def test_gemm_matches_numpy_fp32(rng):
    a = rng.standard_normal((65, 130)).astype(np.float32)
    b = rng.standard_normal((130, 47)).astype(np.float32)
    got = cmodel.gemm(a, b, round_bf16=False)
    np.testing.assert_allclose(got, a @ b, rtol=1e-5, atol=1e-5)


def test_gemm_bf16_operand_rounding(rng):
    """round_bf16 must equal quantizing operands to bf16 then fp32 matmul
    — the MXU's numerics."""
    a = rng.standard_normal((32, 64)).astype(np.float32)
    b = rng.standard_normal((64, 32)).astype(np.float32)
    got = cmodel.gemm(a, b, round_bf16=True)
    want = _bf16(a) @ _bf16(b)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gemm_transposes_and_alpha_beta(rng):
    a = rng.standard_normal((24, 16)).astype(np.float32)   # a_trans
    b = rng.standard_normal((40, 24)).astype(np.float32)   # b_trans
    c0 = rng.standard_normal((16, 40)).astype(np.float32)
    got = cmodel.gemm(a, b, a_trans=True, b_trans=True, alpha=0.5,
                      beta=2.0, c=c0, round_bf16=False)
    want = 0.5 * (a.T @ b.T) + 2.0 * c0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gemm_kchunk_accumulation_order(rng):
    """Chunked-K accumulation models the tile accumulator; in fp32 the
    result stays within accumulation-reorder noise of one-shot K."""
    a = rng.standard_normal((64, 512)).astype(np.float32)
    b = rng.standard_normal((512, 64)).astype(np.float32)
    one = cmodel.gemm(a, b, kchunk=0, round_bf16=False)
    chunked = cmodel.gemm(a, b, kchunk=64, round_bf16=False)
    np.testing.assert_allclose(one, chunked, rtol=1e-4, atol=1e-4)


def test_gemm_backward_engine(rng):
    a = rng.standard_normal((8, 32)).astype(np.float32)
    b = rng.standard_normal((32, 16)).astype(np.float32)
    g = rng.standard_normal((8, 16)).astype(np.float32)
    da, db = cmodel.matmul_vjp(a, b, g, round_bf16=False)
    np.testing.assert_allclose(da, g @ b.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(db, a.T @ g, rtol=1e-5, atol=1e-5)


def test_conv2d_fp_matches_lax(rng):
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
    got = cmodel.conv2d_fp(x, w, stride=2, pad=1, round_bf16=False)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), window_strides=(2, 2),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, 2)])
def test_conv2d_bp_wu_match_autodiff(rng, stride, pad):
    """Native conv bwd-data/bwd-weight vs jax autodiff ground truth — the
    reference's conv_grad_test.py equivalent (engine bp/wu at
    simple_conv2d_impl.cpp:472-670)."""
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 6)).astype(np.float32)

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(w))
    g = rng.standard_normal(y.shape).astype(np.float32)
    dx_ref, dw_ref = vjp(jnp.asarray(g))

    dx, dw = cmodel.conv2d_vjp(x, w, g, stride=stride, pad=pad,
                               round_bf16=False)
    np.testing.assert_allclose(dx, np.asarray(dx_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(dw, np.asarray(dw_ref), rtol=1e-3, atol=1e-3)
