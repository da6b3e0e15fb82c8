"""AWQ activation-aware equalization (quant/awq.py).

Covers: fold exactness (the equalized float model computes the same
function), guaranteed non-regression of the site objective (alpha=0 is
a candidate), a case engineered so equalization MUST win (one dominant
activation channel), and the serve-artifact integration path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.quant.awq import (_qdq_weights, awq_calibrate_decoder,
                              awq_equalize, collect_awq_stats)
from fp8tpu.serve import ServeConfig, convert_decoder_params
from fp8tpu.serve.model import full_logits


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(dtype="float32", n_layers=2)
    model = Decoder(cfg)
    key = jax.random.PRNGKey(0)
    toks = jax.random.randint(jax.random.PRNGKey(1), (8, 32), 0,
                              cfg.vocab_size)
    variables = model.init(key, toks[:1])
    return cfg, model, variables, toks


def test_fold_is_output_invariant(setup):
    cfg, model, variables, toks = setup
    eq_vars, info = awq_calibrate_decoder(model, variables, cfg, toks,
                                          fmt="e4m3", batch=4,
                                          n_batches=2)
    base = model.apply(variables, toks)
    eq = model.apply(eq_vars, toks)
    np.testing.assert_allclose(np.asarray(eq), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
    # the search log covers every layer and the three foldable sites
    assert set(info) == {"layer_0", "layer_1"}
    assert set(info["layer_0"]) == {"qkv", "gateup", "down"}


def test_objective_never_regresses(setup):
    cfg, model, variables, toks = setup
    _, info = awq_calibrate_decoder(model, variables, cfg, toks,
                                    fmt="int4", int4_group=None,
                                    batch=4, n_batches=2)
    for linfo in info.values():
        for rec in linfo.values():
            assert rec["err"] <= rec["err_identity"] * (1 + 1e-6)


def test_awq_wins_on_dominant_channel():
    """One input channel carries 100x the activation magnitude but a
    tiny weight: per-channel (axis=N) quantization wastes the whole
    int4 grid on other rows' large weights; scaling that row up is the
    textbook AWQ win."""
    rng = np.random.default_rng(0)
    K, N, n = 64, 32, 256
    w = rng.normal(size=(K, N)).astype(np.float32)
    w[0] *= 0.02                       # salient channel, small weight
    x = rng.normal(size=(n, K)).astype(np.float32)
    x[:, 0] *= 100.0                   # dominant activation
    wj, xj = jnp.asarray(w), jnp.asarray(x)
    ref = xj @ wj

    def err(s):
        wq = _qdq_weights(wj * s[:, None], "int4", None) / s[:, None]
        return float(jnp.mean(jnp.square(xj @ wq - ref)))

    amax = jnp.max(jnp.abs(xj), axis=0)
    a = amax / jnp.mean(amax)
    e_id = err(jnp.ones(K))
    e_awq = min(err(jnp.clip(a ** al, 1e-3, 1e3))
                for al in (0.25, 0.5, 0.75, 1.0))
    assert e_awq < e_id * 0.9, (e_awq, e_id)


def test_collect_stats_shapes(setup):
    cfg, model, variables, toks = setup
    stats = collect_awq_stats(model, variables, [toks[:4], toks[4:8]],
                              n_sample=64)
    assert set(stats) == {0, 1}
    st = stats[0]
    assert st["qkv"]["amax"].shape == (cfg.d_model,)
    assert st["gateup"]["amax"].shape == (cfg.d_model,)
    assert st["down"]["amax"].shape == (cfg.d_ff,)
    assert st["down"]["x"].shape[1] == cfg.d_ff
    assert st["qkv"]["x"].shape[0] <= 64


@pytest.mark.parametrize("fmt,group", [("e4m3", None), ("int4", 32)])
def test_serve_artifact_integration(setup, fmt, group):
    """Equalized params flow through convert_decoder_params and the
    quantized serving forward stays close to the float model — at
    least as close (on logits MSE over the calibration tokens) as the
    unequalized artifact, modulo a small tolerance (the guarantee is
    per-site on the calibration sample; end-to-end it is measured)."""
    cfg, model, variables, toks = setup
    eq_vars, _ = awq_calibrate_decoder(model, variables, cfg, toks,
                                       fmt=fmt, int4_group=group,
                                       batch=4, n_batches=2)
    scfg = ServeConfig(model=cfg, weight_fmt=fmt, kv_fmt="bf16",
                       int4_group=group)
    ref = model.apply(variables, toks)

    def mse(vars_in):
        art = convert_decoder_params(vars_in, cfg, fmt, int4_group=group)
        lg = jax.vmap(lambda t: full_logits(art, t, scfg))(toks)
        return float(jnp.mean(jnp.square(lg - ref)))

    e_plain, e_awq = mse(variables), mse(eq_vars)
    assert np.isfinite(e_awq)
    assert e_awq <= e_plain * 1.25, (e_awq, e_plain)


def test_moe_layers_equalize_attention_only():
    cfg = tiny_config(dtype="float32", n_layers=1, n_experts=4)
    model = Decoder(cfg)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 32), 0,
                              cfg.vocab_size)
    variables = model.init(jax.random.PRNGKey(0), toks[:1])
    eq_vars, info = awq_calibrate_decoder(model, variables, cfg, toks,
                                          fmt="e4m3", batch=4,
                                          n_batches=1)
    assert set(info["layer_0"]) == {"qkv"}
    base = model.apply(variables, toks)
    eq = model.apply(eq_vars, toks)
    np.testing.assert_allclose(np.asarray(eq), np.asarray(base),
                               rtol=2e-4, atol=2e-4)
