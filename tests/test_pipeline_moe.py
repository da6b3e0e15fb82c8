"""Pipeline parallelism (GPipe over a stage axis) and expert-parallel
MoE — north-star scale-out surface absent from the reference
(SURVEY.md §2.3), validated on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    stack_stage_params,
    stage_param_sharding,
)
from fp8tpu.parallel.moe import (
    moe_ffn,
    quantize_expert_weights,
    top_k_routing,
)
from fp8tpu.parallel import make_mesh
from fp8tpu.quant.config import TensorQuantConfig
from fp8tpu.quant.fakequant import fake_quant


D = 16


def _stage_fn(params, x):
    """A quantized 2-matmul block: fp8 fake-quant on weights and input
    activations (hybrid-forward e4m3), residual output."""
    cfg = TensorQuantConfig(dtype="e4m3", scheme="rne",
                            scaling="per-tensor-max")
    w1 = fake_quant(params["w1"], cfg)
    w2 = fake_quant(params["w2"], cfg)
    h = jax.nn.gelu(fake_quant(x, cfg) @ w1)
    return x + h @ w2


def _stage_params(key, n_stages):
    ks = jax.random.split(key, 2 * n_stages)
    return [
        {"w1": jax.random.normal(ks[2 * i], (D, 2 * D)) * 0.3,
         "w2": jax.random.normal(ks[2 * i + 1], (2 * D, D)) * 0.3}
        for i in range(n_stages)
    ]


def _sequential(per_stage, x, micro=1):
    """Unpipelined reference.  Runs per-microbatch: the stage block's
    per-tensor-max activation scaling makes microbatching semantically
    visible (scales are per-microbatch in a pipeline), so the reference
    must microbatch identically."""
    mbs = x.reshape(micro, x.shape[0] // micro, *x.shape[1:])
    outs = []
    for i in range(mbs.shape[0]):
        h = mbs[i]
        for p in per_stage:
            h = _stage_fn(p, h)
        outs.append(h)
    return jnp.concatenate(outs, axis=0)


@pytest.mark.parametrize("stages,data,micro", [(4, 2, 4), (8, 1, 2),
                                               (2, 4, 2)])
def test_pipeline_matches_sequential(stages, data, micro):
    mesh = make_pp_mesh(stages, data)
    per_stage = _stage_params(jax.random.key(0), stages)
    stacked = stack_stage_params(per_stage)
    stacked = jax.device_put(stacked, stage_param_sharding(stacked, mesh))
    x = jax.random.normal(jax.random.key(1), (16, D))

    y = jax.jit(lambda p, x: pipeline_apply(
        _stage_fn, p, x, mesh, n_microbatches=micro))(stacked, x)
    ref = _sequential(per_stage, x, micro * data)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    """jax.grad through scan+ppermute = the GPipe schedule; gradients
    must equal the unpipelined composition's."""
    stages, micro = 4, 4
    mesh = make_pp_mesh(stages, 2)
    per_stage = _stage_params(jax.random.key(2), stages)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.key(3), (8, D))

    def loss_pp(p):
        return jnp.mean(pipeline_apply(_stage_fn, p, x, mesh,
                                       n_microbatches=micro) ** 2)

    def loss_seq(stacked_p):
        per = [jax.tree_util.tree_map(lambda v: v[i], stacked_p)
               for i in range(stages)]
        return jnp.mean(_sequential(per, x, micro * 2) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(
        jax.device_put(stacked, stage_param_sharding(stacked, mesh)))
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_pp, g_seq)


def test_pipeline_remat_matches():
    """remat=True (jax.checkpoint around the stage) must not change
    forward values or gradients — only the memory/FLOPs trade."""
    stages, micro = 4, 2
    mesh = make_pp_mesh(stages, 2)
    per_stage = _stage_params(jax.random.key(6), stages)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.key(7), (8, D))

    def loss(p, remat):
        return jnp.mean(pipeline_apply(_stage_fn, p, x, mesh,
                                       n_microbatches=micro,
                                       remat=remat) ** 2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(stacked)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(stacked)
    assert float(v0) == float(v1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6), g0, g1)


def test_pipeline_single_stage_degenerates():
    mesh = make_pp_mesh(1, 1)
    per_stage = _stage_params(jax.random.key(4), 1)
    stacked = stack_stage_params(per_stage)
    x = jax.random.normal(jax.random.key(5), (4, D))
    y = pipeline_apply(_stage_fn, stacked, x, mesh, n_microbatches=2)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(_sequential(per_stage, x, 2)),
                               rtol=2e-5, atol=2e-5)


# -- MoE / expert parallel --------------------------------------------------


def _moe_setup(key, T=64, E=4, F=32, fmt="e4m3"):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (T, D))
    gate = jax.random.normal(k2, (D, E)) * 0.5
    up = jax.random.normal(k3, (E, D, F)) * 0.3
    down = jax.random.normal(k4, (E, F, D)) * 0.3
    up8, up_s = quantize_expert_weights(up, fmt)
    down8, down_s = quantize_expert_weights(down, fmt)
    return x, gate, (up8, up_s), (down8, down_s)


def _dense_reference(x, gate, up8, up_s, down8, down_s, top_k, capacity):
    """Token-by-token loop over the same routing decisions — the exact
    semantics the einsum formulation must reproduce."""
    logits = np.asarray(x, np.float64) @ np.asarray(gate, np.float64)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits, jnp.float32), -1))
    T, E = probs.shape
    up = np.asarray(up8, np.float32) * np.asarray(up_s)
    down = np.asarray(down8, np.float32) * np.asarray(down_s)
    fill = np.zeros(E, np.int64)
    y = np.zeros((T, D), np.float32)
    masked = probs.copy()
    for _ in range(top_k):
        choice = masked.argmax(-1)
        round_fill = np.zeros(E, np.int64)
        for t in range(T):
            e = choice[t]
            pos = fill[e] + round_fill[e]
            round_fill[e] += 1
            if pos >= capacity:
                continue
            h = np.asarray(jax.nn.gelu(jnp.asarray(
                np.asarray(x[t], np.float32) @ up[e])))
            y[t] += probs[t, e] * (h @ down[e])
        fill += round_fill
        for t in range(T):
            masked[t, choice[t]] = 0.0
    return y


def test_moe_matches_dense_reference():
    x, gate, (up8, up_s), (down8, down_s) = _moe_setup(jax.random.key(0))
    T, E, top_k = x.shape[0], gate.shape[1], 2
    capacity = max(int(1.25 * top_k * T / E), top_k)
    y, aux = jax.jit(lambda *a: moe_ffn(*a, top_k=top_k,
                                        capacity_factor=1.25))(
        x, gate, up8, up_s, down8, down_s)
    ref = _dense_reference(x, gate, up8, up_s, down8, down_s,
                           top_k, capacity)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
    assert float(aux) > 0.5  # balanced-ish router ≈ 1


def test_moe_capacity_drops_overflow():
    """A router collapsed onto one expert must drop tokens beyond C."""
    x, gate, (up8, up_s), (down8, down_s) = _moe_setup(jax.random.key(1))
    gate = gate * 0.0  # uniform logits: argmax ties break to expert 0
    y, aux = moe_ffn(x, gate, up8, up_s, down8, down_s, top_k=1,
                     capacity_factor=0.25)
    T = x.shape[0]
    capacity = max(int(0.25 * T / gate.shape[1]), 1)
    routed = np.count_nonzero(np.abs(np.asarray(y)).sum(-1) > 1e-9)
    assert routed <= capacity, (routed, capacity)
    assert float(aux) == pytest.approx(1.0, abs=0.05)


def test_moe_expert_parallel_sharded():
    """Expert-sharded execution on the mesh matches unsharded."""
    mesh = make_mesh(data=2, model=4)
    x, gate, (up8, up_s), (down8, down_s) = _moe_setup(jax.random.key(2))
    y0, _ = moe_ffn(x, gate, up8, up_s, down8, down_s)

    from jax.sharding import NamedSharding, PartitionSpec as P
    ep = lambda t: jax.device_put(
        t, NamedSharding(mesh, P("model", *([None] * (t.ndim - 1)))))
    with mesh:
        y1, _ = jax.jit(lambda *a: moe_ffn(*a, mesh=mesh))(
            x, gate, ep(up8), ep(up_s), ep(down8), ep(down_s))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)


def test_moe_gradients_flow():
    x, gate, (up8, up_s), (down8, down_s) = _moe_setup(jax.random.key(3))

    def loss(gate, up_s, down_s):
        y, aux = moe_ffn(x, gate, up8, up_s, down8, down_s)
        return jnp.sum(y ** 2) + 0.01 * aux

    g = jax.grad(loss, argnums=(0, 1, 2))(gate, up_s, down_s)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
    assert float(jnp.abs(g[0]).max()) > 0


def test_routing_shapes_and_determinism():
    logits = jax.random.normal(jax.random.key(7), (32, 8))
    d1, c1, a1 = top_k_routing(logits, 2, 10)
    d2, c2, a2 = top_k_routing(logits, 2, 10)
    assert d1.shape == (32, 8, 10) and c1.shape == (32, 8, 10)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # every kept token occupies exactly one slot per routing round
    assert float(jnp.max(jnp.sum(d1, axis=(1, 2)))) <= 2.0
