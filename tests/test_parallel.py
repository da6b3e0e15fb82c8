"""Sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.parallel import (
    DECODER_PARAM_RULES,
    SERVE_PARAM_RULES,
    KV_CACHE_SPEC,
    make_mesh,
    shard_params,
    shard_tree,
)
from fp8tpu.quant.policy import e4m3_inference_policy
from fp8tpu.quant.interceptor import build_module_table, quantized_apply
from fp8tpu.training import init_train_state, initialize, make_train_step


@pytest.fixture(scope="module")
def decoder_setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=256, max_seq_len=32)
    m = Decoder(cfg)
    tokens = jnp.ones((4, 16), jnp.int32)
    variables = m.init(jax.random.key(0), tokens)
    return cfg, m, variables, tokens


def test_mesh_shape():
    mesh = make_mesh(data=2, model=2, seq=2)
    assert dict(mesh.shape) == {"host": 1, "data": 2, "seq": 2, "model": 2}
    mesh2 = make_mesh(data=8)
    assert dict(mesh2.shape) == {"host": 1, "data": 8, "seq": 1, "model": 1}
    mesh3 = make_mesh(hosts=2, data=2, model=2)
    assert dict(mesh3.shape) == {"host": 2, "data": 2, "seq": 1, "model": 2}


def test_sr_streams_device_layout_invariant(decoder_setup, rng):
    """Stochastic-rounding draws are counter-based (key x module path),
    so the SAME step must produce bit-identical results whether params/
    batch are replicated on one device or sharded over the mesh — the
    multi-host reproducibility contract (SURVEY §5.2)."""
    from fp8tpu.quant.config import TensorQuantConfig
    from fp8tpu.quant.fakequant import fake_quant

    x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    cfg = TensorQuantConfig("e4m3", "stochastic")
    key = jax.random.key(7)

    single = np.asarray(fake_quant(x, cfg, key))

    mesh = make_mesh(data=2, model=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))
    with mesh:
        sharded = np.asarray(jax.jit(
            lambda x, k: fake_quant(x, cfg, k))(xs, key))
    np.testing.assert_array_equal(single, sharded)


def test_tp_qmatmul_parity(rng):
    """shard_map column->row TP q-matmul pipeline (overlapped psum) vs a
    dense single-device computation with the same quantized weights."""
    from fp8tpu.kernels.qmatmul import quantize_weights
    from fp8tpu.parallel.tp_matmul import (column_parallel_qmatmul,
                                           row_parallel_qmatmul,
                                           tp_mlp_block)

    mesh = make_mesh(model=8)
    B, K, FF = 8, 64, 256
    x = jnp.asarray(rng.standard_normal((B, K)), jnp.float32)
    up = jnp.asarray(rng.standard_normal((K, FF)) * 0.1, jnp.float32)
    down = jnp.asarray(rng.standard_normal((FF, K)) * 0.1, jnp.float32)
    up8, up_s = quantize_weights(up, "e4m3", axis=-1)
    down8, down_s = quantize_weights(down, "e4m3", axis=-1)
    up_s, down_s = up_s.reshape(-1), down_s.reshape(-1)

    upd = up8.astype(jnp.float32) * up_s[None]
    downd = down8.astype(jnp.float32) * down_s[None]

    # column-parallel alone
    col = column_parallel_qmatmul(x, up8, up_s, mesh)
    np.testing.assert_allclose(np.asarray(col), np.asarray(x @ upd),
                               rtol=1e-4, atol=1e-4)

    # row-parallel with overlapped psum, both output modes
    h = (x @ upd).astype(jnp.float32)
    want = np.asarray(h @ downd)
    for scatter in (False, True):
        got = row_parallel_qmatmul(h, down8, down_s, mesh,
                                   overlap_chunks=4, scatter=scatter)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3,
                                   atol=1e-3)

    # the fused block
    ref = jax.nn.silu(x @ upd) @ downd
    got = tp_mlp_block(x, up8, up_s, down8, down_s, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=1e-2)


def test_param_sharding_rules(decoder_setup):
    cfg, m, variables, tokens = decoder_setup
    mesh = make_mesh(data=2, model=4)
    sh = shard_tree(variables, mesh, DECODER_PARAM_RULES)
    qk = sh["params"]["layer_0"]["attn"]["q_proj"]["kernel"]
    assert qk.spec == P(None, "model")
    ok = sh["params"]["layer_0"]["attn"]["o_proj"]["kernel"]
    assert ok.spec == P("model", None)
    norm = sh["params"]["layer_0"]["attn_norm"]["scale"]
    assert norm.spec == P(None) or norm.spec == P()


def test_sharding_divisibility_repair(decoder_setup):
    """Dims not divisible by the mesh axis must fall back to replication
    instead of erroring."""
    cfg, m, variables, tokens = decoder_setup
    mesh3 = make_mesh(data=1, model=3)  # 3 does not divide any dim here
    sh = shard_tree(variables, mesh3, DECODER_PARAM_RULES)
    specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, sh,
                                         is_leaf=lambda x: hasattr(x, "spec")))
    # every model-axis assignment on a non-divisible dim was repaired away
    assert all(ax is None for spec in specs for ax in spec), specs


def test_sharded_quantized_forward(decoder_setup):
    cfg, m, variables, tokens = decoder_setup
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(variables, mesh, DECODER_PARAM_RULES)
    policy = e4m3_inference_policy()
    table = build_module_table(m, variables, tokens)

    @jax.jit
    def f(v, t):
        return quantized_apply(m, policy, v, t, module_table=table)

    tok_sh = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    with mesh:
        out = f(sharded, tok_sh)
    ref = f(variables, tokens)
    # Dynamic per-tensor scales depend on reduction order: a 1-ulp absmax
    # difference across shardings shifts the whole cast grid, so outputs
    # are close but not bit-equal.  Quantized streams stay in the
    # model's bf16 (fake_quant preserves dtype, like the reference's
    # in-place cast op), which adds bf16 arithmetic noise on top.
    # Demand strong agreement.
    o, r = np.asarray(out), np.asarray(ref)
    corr = np.corrcoef(o.ravel(), r.ravel())[0, 1]
    assert corr > 0.998, corr
    agree = (o.argmax(-1) == r.argmax(-1)).mean()
    assert agree > 0.95, agree


def test_sharded_train_step_matches_replicated(decoder_setup):
    """One hybrid-FP8 train step: dp×tp sharded vs single-device must agree
    (same PRNG keys → same casts; GSPMD only changes layout)."""
    cfg, m, variables, tokens = decoder_setup
    emu = initialize(m, variables, (tokens,), training_algo="hybrid")
    opt = optax.sgd(0.01)

    def loss_fn(apply_fn, p, batch):
        logits = apply_fn(p, batch[:, :-1])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, batch[:, 1:]).mean()

    step = make_train_step(emu, opt, loss_fn)
    key = jax.random.key(3)

    p_ref, _, loss_ref = jax.jit(step)(variables, init_train_state(opt, variables),
                                       tokens, key)

    mesh = make_mesh(data=2, model=2, seq=2)
    sharded = shard_params(variables, mesh, DECODER_PARAM_RULES)
    tok_sh = jax.device_put(tokens, NamedSharding(mesh, P("data", "seq")))
    with mesh:
        p_sh, _, loss_sh = jax.jit(step)(sharded, init_train_state(opt, sharded),
                                         tok_sh, key)
    # Dynamic per-tensor scales are reduction-order sensitive (see
    # test_sharded_quantized_forward); demand sub-percent agreement.
    assert abs(float(loss_ref) - float(loss_sh)) / float(loss_ref) < 0.01
    a = np.asarray(p_ref["params"]["layer_0"]["attn"]["q_proj"]["kernel"])
    b = np.asarray(p_sh["params"]["layer_0"]["attn"]["q_proj"]["kernel"])
    # Params after one step: same fp16 master grid, tiny update deltas.
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.9999
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-3)


def test_serve_params_sharding(decoder_setup):
    from fp8tpu.serve import RingKVCache, ServeConfig, convert_decoder_params
    from fp8tpu.serve.model import decode_step

    cfg, m, variables, tokens = decoder_setup
    sparams = convert_decoder_params(variables, cfg)
    mesh = make_mesh(data=2, model=2)
    sp_sh = shard_tree(sparams, mesh, SERVE_PARAM_RULES)
    assert sp_sh["q8"].spec == P(None, None, "model")
    sparams_d = jax.device_put(sparams, sp_sh)

    cache = RingKVCache.create(cfg.n_layers, 4, 32, cfg.n_kv_heads,
                               cfg.head_dim, "e4m3")
    # Ring layout (S, 2, L, B*KV, D): the flattened B*KV dim shards over
    # (data, model) jointly — slots over data, kv heads over model.
    def shard_leaf(x):
        if x.ndim >= 4:
            return jax.device_put(x, NamedSharding(
                mesh, P(None, None, None, ("data", "model"))))
        return jax.device_put(x, NamedSharding(mesh, P()))
    cache_sh = jax.tree.map(shard_leaf, cache)
    scfg = ServeConfig(model=cfg)
    with mesh:
        logits, new_cache = decode_step(
            sparams_d, cache_sh, jnp.ones((4,), jnp.int32),
            jnp.zeros((4,), jnp.int32), scfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_moe_serve_params_sharding():
    """MoE serving artifact: expert stacks shard over 'model' (expert
    parallelism) and the sharded decode step matches the replicated one
    exactly (weight payloads are pre-quantized, so no reduction-order-
    sensitive dynamic scales are in play for the gather/combine)."""
    import dataclasses

    from fp8tpu.serve import RingKVCache, ServeConfig, convert_decoder_params
    from fp8tpu.serve.model import decode_step

    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=256, max_seq_len=32,
                      n_experts=4, moe_top_k=2, moe_capacity_factor=4.0)
    m = Decoder(cfg)
    variables = m.init(jax.random.key(0), jnp.ones((2, 8), jnp.int32))
    sparams = convert_decoder_params(variables, cfg)
    mesh = make_mesh(data=2, model=2)
    sp_sh = shard_tree(sparams, mesh, SERVE_PARAM_RULES)
    assert sp_sh["eup8"].spec == P(None, "model", None, None)
    assert sp_sh["router"].is_equivalent_to(
        NamedSharding(mesh, P()), sparams["router"].ndim)

    def mk_cache():
        return RingKVCache.create(cfg.n_layers, 4, 32, cfg.n_kv_heads,
                                  cfg.head_dim, "e4m3")

    toks = jnp.asarray([1, 2, 3, 4], jnp.int32)
    pos = jnp.zeros((4,), jnp.int32)
    scfg = ServeConfig(model=cfg)
    ref_logits, _ = decode_step(sparams, mk_cache(), toks, pos, scfg)

    sparams_d = jax.device_put(sparams, sp_sh)

    def shard_leaf(x):
        if x.ndim >= 4:
            return jax.device_put(x, NamedSharding(
                mesh, P(None, None, None, ("data", "model"))))
        return jax.device_put(x, NamedSharding(mesh, P()))
    cache_sh = jax.tree.map(shard_leaf, mk_cache())
    with mesh:
        logits, _ = decode_step(sparams_d, cache_sh, toks, pos, scfg)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(ref_logits), rtol=2e-2,
                               atol=2e-2)
