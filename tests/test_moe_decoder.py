"""MoE decoder (DecoderConfig.n_experts > 0): GShard-routed expert FFN
as a first-class model variant — expert contractions run through the
BatchMatmul wrapper (interceptor-quantizable), the router aux loss sows
into ``intermediates``, and expert params shard over the mesh via
MOE_PARAM_RULES."""

import numpy as np
import optax

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.parallel import MOE_PARAM_RULES, make_mesh, shard_tree
from fp8tpu.quant.interceptor import build_module_table, quantized_apply
from fp8tpu.quant.policy import get_policy
from fp8tpu.training import init_train_state, initialize, make_train_step


def _cfg(**kw):
    base = dict(n_layers=2, d_model=32, n_heads=2, n_kv_heads=1,
                d_ff=64, vocab_size=64, max_seq_len=32,
                n_experts=4, moe_top_k=2)
    base.update(kw)
    return tiny_config(**base)


def _toks(n=4, s=17):
    return jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (n, s)), jnp.int32)


def test_moe_decoder_forward_and_aux():
    cfg = _cfg()
    model = Decoder(cfg)
    toks = _toks()
    variables = model.init(jax.random.key(0), toks)
    # expert params exist with the expected stacked shapes
    p0 = variables["params"]["layer_0"]["moe"]
    assert p0["up"].shape == (4, 32, 64)
    assert p0["down"].shape == (4, 64, 32)
    logits = model.apply(variables, toks)
    assert logits.shape == (4, 17, 64)
    assert np.isfinite(np.asarray(logits)).all()
    # aux loss via the intermediates collection
    _, inter = model.apply(variables, toks, mutable=["intermediates"])
    aux = jax.tree_util.tree_leaves(inter["intermediates"])
    assert len(aux) == cfg.n_layers
    for a in aux:
        assert float(a) > 0.5  # near-uniform router ≈ 1


def test_moe_decoder_trains_through_mpt():
    cfg = _cfg(n_layers=1)
    model = Decoder(cfg)
    toks = _toks()
    variables = model.init(jax.random.key(0), toks[:, :-1])
    emu = initialize(model, variables, (toks[:, :-1],),
                     training_algo="hybrid")
    opt = optax.adamw(3e-3)

    def loss_fn(apply_fn, params, batch):
        lg = apply_fn(params, batch[:, :-1])
        return optax.softmax_cross_entropy_with_integer_labels(
            lg, batch[:, 1:]).mean()

    step = jax.jit(make_train_step(emu, opt, loss_fn))
    params, opt_state = variables, init_train_state(opt, variables)
    losses = []
    for i in range(8):
        params, opt_state, loss = step(params, opt_state, toks,
                                       jax.random.key(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # expert weights actually received gradient updates
    d = params["params"]["layer_0"]["moe"]["up"] \
        - variables["params"]["layer_0"]["moe"]["up"]
    assert float(jnp.abs(d).max()) > 0


def test_moe_decoder_quantized_apply():
    """The interceptor must classify the expert BatchMatmuls and apply
    the batchmatmul-input policy (quantized output differs from plain
    but stays close)."""
    cfg = _cfg(n_layers=1, dtype="float32")
    model = Decoder(cfg)
    toks = _toks()
    variables = model.init(jax.random.key(0), toks)
    table = build_module_table(model, variables, toks)
    paths = "\n".join(table)
    assert "experts_up" in paths and "experts_down" in paths
    policy = get_policy("e4m3", training=False)
    q = quantized_apply(model, policy, variables, toks,
                        module_table=table)
    plain = model.apply(variables, toks)
    dq = float(jnp.abs(q - plain).max())
    assert 0 < dq < 5.0, dq  # quantization engaged, numerics sane


def test_moe_param_rules_shard_experts():
    cfg = _cfg()
    model = Decoder(cfg)
    variables = model.init(jax.random.key(0), _toks())
    mesh = make_mesh(data=2, model=4)
    sh = shard_tree(variables, mesh, MOE_PARAM_RULES)
    up_sh = sh["params"]["layer_0"]["moe"]["up"]
    assert up_sh.spec == jax.sharding.PartitionSpec("model", None, None)
    router_sh = sh["params"]["layer_0"]["moe"]["router"]["kernel"]
    assert all(a is None for a in router_sh.spec)  # fully replicated
    v = jax.device_put(variables, sh)
    lg = jax.jit(model.apply)(v, _toks())
    assert np.isfinite(np.asarray(lg)).all()
