"""HW-patched (fused-engine) matmul routing — the reference's C-model
patching (qutils.py:478-509) as the Pallas q-matmul engine.

Runs in interpreter mode on the CPU CI mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from fp8tpu.numerics import golden
from fp8tpu.numerics.formats import FORMATS, RoundMode
from fp8tpu.ops.wrappers import AddMatmul, Matmul
from fp8tpu.quant.hw_patch import engine_matmul
from fp8tpu.quant.config import ModuleQuantConfig, TensorQuantConfig
from fp8tpu.quant.interceptor import quantized_apply
from fp8tpu.quant.policy import e4m3_inference_policy


CFG = ModuleQuantConfig(iact=TensorQuantConfig("e4m3", "rne"),
                        patch_ops=True)


def _ref_qdq(x):
    return golden.cast_e4m3(np.asarray(x, np.float32), RoundMode.RNE)


def test_engine_matmul_matches_qdq_then_dot(rng):
    a = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    got = np.asarray(engine_matmul(a, b, CFG, interpret=True))
    want = _ref_qdq(a) @ _ref_qdq(b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_engine_matmul_batched(rng):
    a = jnp.asarray(rng.standard_normal((3, 8, 64)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 64, 16)), jnp.float32)
    got = np.asarray(engine_matmul(a, b, CFG, interpret=True))
    want = np.stack([_ref_qdq(a[i]) @ _ref_qdq(b[i]) for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_engine_matmul_grad_flows(rng):
    a = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)

    def loss(a, b):
        return jnp.sum(engine_matmul(a, b, CFG, interpret=True) ** 2)

    da, db = jax.grad(loss, argnums=(0, 1))(a, b)
    # Engine backward consumes the quantized saved operands (reference
    # hooks quantize in place; cmodel/simple.py:124-146): dA = 2*out @
    # qdq(B)^T, dB = qdq(A)^T @ 2*out.
    out = np.asarray(engine_matmul(a, b, CFG, interpret=True))
    np.testing.assert_allclose(np.asarray(da), 2 * out @ _ref_qdq(b).T,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), _ref_qdq(a).T @ (2 * out),
                               rtol=1e-4, atol=1e-4)


def test_engine_matmul_keyed_under_jit(rng):
    """ADVICE r1 regression: a stochastic (keyed) engine matmul must jit —
    the seed is a traced operand, not a nondiff static."""
    cfg = ModuleQuantConfig(iact=TensorQuantConfig("e4m3", "stochastic"),
                            patch_ops=True)
    a = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)

    @jax.jit
    def f(a, b, key):
        return engine_matmul(a, b, cfg, key=key, interpret=True)

    out = np.asarray(f(a, b, jax.random.key(7)))
    assert np.isfinite(out).all()
    # SR noise is zero-mean around the RNE product
    want = _ref_qdq(a) @ _ref_qdq(b)
    assert np.abs(out - want).mean() < 0.5

    # and the keyed path must also differentiate under jit
    g = jax.jit(jax.grad(
        lambda a, b, k: jnp.sum(engine_matmul(a, b, cfg, key=k,
                                              interpret=True))))(
        a, b, jax.random.key(7))
    assert np.isfinite(np.asarray(g)).all()


class TwoMatmuls(nn.Module):
    @nn.compact
    def __call__(self, x, w):
        y = Matmul(name="mm")(x, w)
        return AddMatmul(name="amm")(y, y, w.T)


def test_engine_conv_matches_qdq_then_conv(rng):
    """engine_conv (im2col + engine matmul) == conv(qdq(x), w)."""
    from fp8tpu.quant.hw_patch import engine_conv

    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.2, jnp.float32)
    got = np.asarray(engine_conv(x, w, None, (2, 2), "SAME", CFG,
                                 interpret=True))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(_ref_qdq(x)), w, window_strides=(2, 2), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)


def test_engine_conv_grad_flows(rng):
    """Conv backward through the engine: d(col)@W^T (col2im via im2col's
    own VJP) and col^T@g — both engine matmuls; matches plain-conv grads
    on the quantized forward."""
    from fp8tpu.quant.hw_patch import engine_conv

    x = jnp.asarray(rng.standard_normal((2, 6, 6, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.2, jnp.float32)

    def loss(x, w):
        return jnp.sum(engine_conv(x, w, None, (1, 1), "SAME", CFG,
                                   interpret=True) ** 2)

    dx, dw = jax.grad(loss, argnums=(0, 1))(x, w)

    def ref_loss(x, w):
        from fp8tpu.quant.fakequant import fake_quant
        y = jax.lax.conv_general_dilated(
            fake_quant(x, CFG.iact), w, window_strides=(1, 1),
            padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    # STE on the x cast: reference grads computed w.r.t. the cast input.
    dx_ref, dw_ref = jax.grad(ref_loss, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=5e-3, atol=5e-3)


class TinyConvNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), strides=(2, 2), name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), name="conv2")(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(10, name="head")(x)


def test_hw_patched_convnet_forward_and_train_step(rng):
    """A conv net under with_hw_patching: conv routes through the engine
    (VERDICT r1 §4) — forward matches the unpatched quantized net, and a
    full train step (grads through engine conv fwd+bwd) runs finite."""
    x = jnp.asarray(rng.standard_normal((4, 12, 12, 3)), jnp.float32)
    m = TinyConvNet()
    variables = m.init(jax.random.key(0), x)
    pol = e4m3_inference_policy(calibrated=False)

    out_plain = quantized_apply(m, pol, variables, x)
    out_patch = quantized_apply(m, pol.with_hw_patching(), variables, x)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_patch),
                               rtol=2e-2, atol=2e-2)

    def loss(v, x):
        out = quantized_apply(m, pol.with_hw_patching(), v, x)
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(variables, x)
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # conv kernels actually received gradient (engine backward wired)
    gk = grads["params"]["conv1"]["kernel"]
    assert float(jnp.abs(gk).max()) > 0


def test_policy_hw_patching_end_to_end(rng):
    """with_hw_patching routes wrapper matmuls through the engine and
    matches the unpatched quantize-around-dot numerics (same casts, fp32
    accumulate)."""
    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    m = TwoMatmuls()
    variables = m.init(jax.random.key(0), x, w)

    pol = e4m3_inference_policy(calibrated=False)
    out_plain = quantized_apply(m, pol, variables, x, w)
    out_patch = quantized_apply(m, pol.with_hw_patching(), variables, x, w)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_patch),
                               rtol=5e-3, atol=5e-3)
