"""8-bit optimizer state tests (training/opt8.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from fp8tpu.training.opt8 import (
    Adam8State,
    adamw_8bit,
    scale_by_adam_8bit,
    state_bytes,
)


def _mlp_task(seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((256, 16)), jnp.float32)
    w_true = jnp.asarray(rng.standard_normal((16, 1)), jnp.float32)
    y = jnp.tanh(X @ w_true) + 0.01 * jnp.asarray(
        rng.standard_normal((256, 1)), jnp.float32)
    params = {
        "w1": jnp.asarray(rng.standard_normal((16, 33)) * 0.3, jnp.float32),
        "b1": jnp.zeros((33,), jnp.float32),   # 33: not a block multiple
        "w2": jnp.asarray(rng.standard_normal((33, 1)) * 0.3, jnp.float32),
    }

    def loss_fn(p):
        h = jnp.tanh(X @ p["w1"] + p["b1"])
        return jnp.mean((h @ p["w2"] - y) ** 2)

    return params, loss_fn


def _train(params, loss_fn, tx, steps):
    state = tx.init(params)
    step = jax.jit(lambda p, s: _one(p, s, loss_fn, tx))
    for _ in range(steps):
        params, state, loss = step(params, state)
    return params, state, float(loss)


def _one(p, s, loss_fn, tx):
    loss, g = jax.value_and_grad(loss_fn)(p)
    upd, s = tx.update(g, s, p)
    return optax.apply_updates(p, upd), s, loss


def test_converges_like_fp32_adam():
    params, loss_fn = _mlp_task()
    _, _, loss8 = _train(params, loss_fn,
                         adamw_8bit(1e-2, block=64), 300)
    _, _, loss32 = _train(params, loss_fn, optax.adamw(1e-2), 300)
    base = float(loss_fn(params))
    assert loss8 < 0.1 * base, (loss8, base)
    # within 30% of the f32 optimizer's achieved loss (or better)
    assert loss8 <= loss32 * 1.3 + 1e-4, (loss8, loss32)


def test_moments_track_fp32_adam():
    params, loss_fn = _mlp_task(seed=1)
    tx8 = scale_by_adam_8bit(block=64)
    tx32 = optax.scale_by_adam()
    s8, s32 = tx8.init(params), tx32.init(params)
    p8 = p32 = params
    for _ in range(10):
        g8 = jax.grad(loss_fn)(p8)
        g32 = jax.grad(loss_fn)(p32)
        u8, s8 = tx8.update(g8, s8)
        u32, s32 = tx32.update(g32, s32)
        p8 = optax.apply_updates(p8, jax.tree.map(lambda u: -1e-2 * u, u8))
        p32 = optax.apply_updates(p32, jax.tree.map(lambda u: -1e-2 * u,
                                                    u32))
    # dequantized first moment ≈ f32 first moment
    m8 = np.asarray(s8.m["w1"].payload, np.float32) \
        * np.asarray(s8.m["w1"].scale)[:, None]
    m32 = np.asarray(s32.mu["w1"]).reshape(-1)
    m8 = m8.reshape(-1)[:m32.size]
    denom = np.abs(m32).max()
    assert np.abs(m8 - m32).max() < 0.12 * denom
    # trajectories stay aligned (elementwise agreement is NOT the
    # contract: early steps with v≈0 are sign-level sensitive to the
    # moment grid — the convergence test above is the acceptance)
    a = np.asarray(p8["w1"]).reshape(-1)
    b = np.asarray(p32["w1"]).reshape(-1)
    assert np.corrcoef(a, b)[0, 1] > 0.995


def test_state_is_4x_smaller():
    params = {"w": jnp.zeros((1024, 512), jnp.float32)}
    s8 = scale_by_adam_8bit(block=256).init(params)
    s32 = optax.scale_by_adam().init(params)
    b8, b32 = state_bytes(s8), state_bytes(s32)
    assert b32 / b8 > 3.8, (b8, b32)


def test_padding_roundtrip_odd_shapes():
    params = {"w": jnp.full((7, 13), 0.5, jnp.float32)}
    tx = scale_by_adam_8bit(block=256)
    s = tx.init(params)
    g = {"w": jnp.full((7, 13), 0.25, jnp.float32)}
    u, s = tx.update(g, s)
    assert u["w"].shape == (7, 13)
    assert np.isfinite(np.asarray(u["w"])).all()
    # uniform grads → uniform update (padding lanes must not leak in)
    uw = np.asarray(u["w"])
    assert np.allclose(uw, uw[0, 0], rtol=1e-5)


def test_second_moment_e4m3_preserves_small_entries():
    """A block mixing large and tiny v entries: linear int8 would flush
    the tiny ones to zero (exploding the next update); e4m3's exponent
    keeps them within ~6%."""
    params = {"w": jnp.zeros((64,), jnp.float32)}
    tx = scale_by_adam_8bit(b2=0.0, block=64)  # v = g^2 directly
    s = tx.init(params)
    # v spread of 1e4 within one block: int8 linear (254 levels) would
    # quantize the small entries to 0; e4m3 covers ~2^17.8 of relative
    # range per block and keeps them within its mantissa step.
    g = jnp.asarray(np.concatenate([np.full(32, 10.0),
                                    np.full(32, 0.1)]), jnp.float32)
    _, s = tx.update({"w": g}, s)
    v = np.asarray(s.v["w"].payload, np.float32) \
        * np.asarray(s.v["w"].scale)[:, None]
    v = v.reshape(-1)
    np.testing.assert_allclose(v[:32], 100.0, rtol=0.07)
    np.testing.assert_allclose(v[32:], 1e-2, rtol=0.07)
    # int8 linear on the same block flushes the small entries entirely
    q = np.round(np.asarray(g) ** 2 / (100.0 / 127.0))
    assert (q[32:] == 0).all()


def test_mpt_pipeline_integration():
    """adamw_8bit drives the full FP8 MPT train step."""
    from fp8tpu.data import mixed_lm_corpus
    from fp8tpu.models import Decoder, tiny_config
    from fp8tpu.training import init_train_state, initialize, \
        make_train_step

    cfg = tiny_config(n_layers=1, d_model=32, n_heads=2, n_kv_heads=2,
                      d_ff=64, vocab_size=64, max_seq_len=16)
    model = Decoder(cfg)
    toks = jnp.ones((2, 16), jnp.int32)
    variables = model.init(jax.random.key(0), toks[:, :-1])
    emulator = initialize(model, variables, (toks[:, :-1],),
                          training_algo="hybrid")
    tx = adamw_8bit(1e-3, weight_decay=0.01, block=64)

    def loss_fn(apply_fn, p, batch):
        logits = apply_fn(p, batch[:, :-1])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch[:, 1:]).mean()

    step = jax.jit(make_train_step(emulator, tx, loss_fn))
    params = variables
    opt_state = init_train_state(tx, params)
    losses = []
    key = jax.random.key(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, toks, sub)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
