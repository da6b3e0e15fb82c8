"""FP8 mixed-precision training pipeline tests (direct & hybrid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fp8tpu.models import MLP, tiny_config, Decoder
from fp8tpu.numerics import FORMATS, golden, RoundMode
from fp8tpu.quant.interceptor import build_module_table
from fp8tpu.quant.policy import LayerKind
from fp8tpu.training import (init_train_state, initialize,
                             make_train_step, master_requant)


@pytest.fixture
def mlp_setup():
    m = MLP(features=(32,), num_classes=4)
    x = jax.random.normal(jax.random.key(42), (8, 16))
    params = m.init(jax.random.key(0), x)
    return m, params, x


def _xent(apply_fn, params, batch):
    x, y = batch
    logits = apply_fn(params, x)
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


@pytest.mark.parametrize("algo", ["direct", "hybrid", "bfloat16"])
def test_training_loss_decreases(mlp_setup, algo):
    m, params, x = mlp_setup
    emu = initialize(m, params, (x,), training_algo=algo)
    opt = optax.sgd(0.1)
    step = jax.jit(make_train_step(emu, opt, _xent))
    y = jnp.arange(8) % 4
    opt_state = init_train_state(opt, params)
    losses = []
    key = jax.random.key(1)
    for i in range(30):
        params, opt_state, loss = step(params, opt_state, (x, y),
                                       jax.random.fold_in(key, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_master_requant_fp16_grid(mlp_setup):
    m, params, x = mlp_setup
    table = build_module_table(m, params, x)
    # Perturb params so they're off the fp16 grid.
    params = jax.tree.map(lambda p: p + 1e-4, params)
    out = master_requant(params, table, jax.random.key(0), "fp16")
    k = np.asarray(out["params"]["dense_0"]["kernel"])
    # Every value must be exactly representable in fp16.
    np.testing.assert_array_equal(k, k.astype(np.float16).astype(np.float32))


def test_master_requant_fp32_noop(mlp_setup):
    m, params, x = mlp_setup
    table = build_module_table(m, params, x)
    out = master_requant(params, table, jax.random.key(0), "fp32")
    np.testing.assert_array_equal(
        np.asarray(out["params"]["dense_0"]["kernel"]),
        np.asarray(params["params"]["dense_0"]["kernel"]))


def test_embedding_blocknorm_requant():
    cfg = tiny_config()
    m = Decoder(cfg)
    tokens = jnp.ones((2, 8), jnp.int32)
    params = m.init(jax.random.key(0), tokens)
    table = build_module_table(m, params, tokens)
    assert table["embed"] == LayerKind.EMBED

    out = master_requant(params, table, jax.random.key(1), "fp16",
                         emb_fmt="e5m2")
    emb = np.asarray(out["params"]["embed"]["embedding"], np.float32)
    orig = np.asarray(params["params"]["embed"]["embedding"], np.float32)
    assert emb.shape == orig.shape
    # Rows must be block-norm E5M2: verify one row against golden with
    # the same scale rule (value distribution check: each row has few
    # distinct magnitudes).
    row = emb[3]
    s = golden.block_scales(orig[3], orig.shape[1], FORMATS["e5m2"])[0]
    scaled = row * s
    h = scaled.astype(np.float16).view(np.uint16)
    assert (h & 0x00FF).max() == 0  # all values on the E5M2-in-fp16 grid


def test_grad_quantization_changes_grads(mlp_setup):
    m, params, x = mlp_setup
    emu = initialize(m, params, (x,), training_algo="direct")
    y = jnp.arange(8) % 4

    def raw_loss(p):
        return _xent(lambda v, a: m.apply(v, a), p, (x, y))

    g_raw = jax.grad(raw_loss)(params)

    def q_loss(p):
        return _xent(
            lambda v, a: emu.apply_quantized(v, a, key=jax.random.key(2)),
            p, (x, y))

    g_q = emu.quantize_grads(jax.grad(q_loss)(params), jax.random.key(3))
    k_raw = np.asarray(g_raw["params"]["dense_0"]["kernel"])
    k_q = np.asarray(g_q["params"]["dense_0"]["kernel"])
    assert not np.array_equal(k_raw, k_q)
    # Quantized grads land on the E5M2 value grid (stochastic, scale 1).
    h = k_q.astype(np.float16).view(np.uint16)
    assert (h & 0x00FF).max() == 0


def test_emulator_facade_parity_methods(mlp_setup):
    m, params, x = mlp_setup
    emu = initialize(m, params, (x,), training_algo="hybrid")
    emu2 = emu.set_master_param_precision("e5m2")
    assert emu2.master_fmt == "e5m2"
    emu3 = emu.set_embedding_precision("e4m3")
    assert emu3.emb_fmt == "e4m3"
    emu4 = emu.blacklist_modules("head")
    assert emu4.policy.resolve("head", LayerKind.DENSE) is None


def test_dynamic_loss_scale_overflow_true_skip(mlp_setup):
    """Forced overflow (VERDICT r2 next #6): params AND optimizer state
    (Adam moments, schedule count) stay untouched, and the scale halves."""
    m, params, x = mlp_setup
    emu = initialize(m, params, (x,), training_algo="hybrid")
    opt = optax.adam(0.1)
    step = jax.jit(make_train_step(emu, opt, _xent, loss_scale=2.0 ** 12))
    y = jnp.arange(8) % 4
    x_bad = x.at[0, 0].set(jnp.nan)          # NaN forward → NaN grads
    opt_state = init_train_state(opt, params)
    p0 = jax.tree.map(np.asarray, params)
    inner0 = jax.tree.map(np.asarray, opt_state[0])
    params1, (inner1, ls1), _ = step(params, opt_state, (x_bad, y),
                                     jax.random.key(0))
    assert float(ls1.scale) == 2.0 ** 11
    assert int(ls1.good_steps) == 0
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(params1)):
        np.testing.assert_array_equal(a, np.asarray(b))
    for a, b in zip(jax.tree.leaves(inner0), jax.tree.leaves(inner1)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # a second overflow halves again
    _, (_, ls2), _ = step(params1, (inner1, ls1), (x_bad, y),
                          jax.random.key(1))
    assert float(ls2.scale) == 2.0 ** 10


def test_dynamic_loss_scale_growth(mlp_setup):
    """After growth_interval clean steps the scale doubles (capped), and
    clean steps DO advance the optimizer state."""
    m, params, x = mlp_setup
    emu = initialize(m, params, (x,), training_algo="hybrid")
    opt = optax.adam(0.1)
    step = jax.jit(make_train_step(emu, opt, _xent, loss_scale=4.0,
                                   growth_interval=2))
    y = jnp.arange(8) % 4
    opt_state = init_train_state(opt, params, loss_scale=4.0)
    inner0 = jax.tree.map(np.asarray, opt_state[0])
    params, opt_state, _ = step(params, opt_state, (x, y),
                                jax.random.key(0))
    assert float(opt_state[1].scale) == 4.0
    assert int(opt_state[1].good_steps) == 1
    params, opt_state, _ = step(params, opt_state, (x, y),
                                jax.random.key(1))
    assert float(opt_state[1].scale) == 8.0
    assert int(opt_state[1].good_steps) == 0
    changed = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(inner0),
                        jax.tree.leaves(opt_state[0])))
    assert changed
