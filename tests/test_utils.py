"""Observability subsystem tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.quant.policy import e4m3_inference_policy, hybrid_training_policy
from fp8tpu.utils import (
    BindumpSchedule,
    MetricLogger,
    SmoothedValue,
    TensorDumpHelper,
    accuracy,
    bindump_tensor,
    log2_histogram,
    policy_from_json,
    policy_to_json,
    restore_checkpoint,
    save_checkpoint,
    stats_window_enabled,
    tensor_stats,
    tree_stats,
)


def test_tensor_stats(rng):
    x = jnp.asarray(rng.normal(0, 2, 1000).astype(np.float32))
    s = tensor_stats(x)
    assert abs(float(s["absmax"]) - np.abs(np.asarray(x)).max()) < 1e-6
    assert float(s["absmin_nonzero"]) > 0


def test_log2_histogram():
    x = jnp.asarray([0.0, 1.0, 2.0, 4.0, 0.25])
    h = np.asarray(log2_histogram(x, lo=-4, hi=4))
    assert h[0] == 1                 # one zero
    assert h.sum() == 5
    # 1.0 → exponent 0 → bucket index 0-(-4)+1 = 5.
    assert h[5] == 1


def test_tree_stats():
    tree = {"a": {"kernel": jnp.ones((4, 4))}, "b": jnp.zeros(3)}
    s = tree_stats(tree)
    assert "a/kernel" in s and float(s["a/kernel"]["absmax"]) == 1.0


def test_stats_window():
    assert stats_window_enabled(0)
    assert stats_window_enabled(1000)
    assert not stats_window_enabled(999)
    assert not stats_window_enabled(1)


def test_bindump_naming(tmp_path):
    x = jnp.ones((4, 8), jnp.float32)
    p = bindump_tensor(x, step=7, module_name="layer1/conv",
                       role="inp", directory=str(tmp_path))
    assert os.path.basename(p) == "7_layer1.conv_inp_4x8_float32.bin"
    raw = np.fromfile(p, np.float32).reshape(4, 8)
    np.testing.assert_array_equal(raw, np.ones((4, 8), np.float32))


def test_bindump_schedule():
    s = BindumpSchedule(start_step=10, end_step=12)
    assert not s.enabled(9) and s.enabled(10) and s.enabled(11)
    assert not s.enabled(12)


def test_tensordump_helper(tmp_path):
    h = TensorDumpHelper(str(tmp_path))
    h.add("mod", "wt", jnp.ones(3))
    h.add("mod", "wt", jnp.zeros(3))
    p = h.dump()
    import pickle
    with open(p, "rb") as f:
        d = pickle.load(f)
    assert len(d["mod"]["wt"]) == 2


def test_policy_json_roundtrip():
    for policy in (e4m3_inference_policy().with_exempt("conv1", "fc")
                   .with_output_fused("*conv*"),
                   hybrid_training_policy()):
        s = policy_to_json(policy)
        back = policy_from_json(s)
        assert back == policy


def test_checkpoint_roundtrip(tmp_path):
    params = {"params": {"d": {"kernel": jnp.arange(6.0).reshape(2, 3),
                               "bias": jnp.zeros(3)}}}
    policy = e4m3_inference_policy()
    save_checkpoint(str(tmp_path), 5, params, policy=policy,
                    extra={"note": "test"})
    out = restore_checkpoint(str(tmp_path), 5, {"params": params})
    np.testing.assert_array_equal(
        np.asarray(out["state"]["params"]["params"]["d"]["kernel"]),
        np.arange(6.0).reshape(2, 3))
    assert out["meta"]["step"] == 5
    assert out["meta"]["policy"] == policy
    assert out["meta"]["extra"]["note"] == "test"


def test_metric_logger():
    m = MetricLogger()
    for i in range(10):
        m.update(loss=float(i), imgs_per_s=100.0 + i)
    assert m.loss.count == 10
    assert m.loss.global_avg == 4.5
    assert "loss" in str(m)


def test_smoothed_value_window():
    v = SmoothedValue(window_size=3)
    for x in [1, 2, 3, 4, 5]:
        v.update(x)
    assert v.median == 4.0      # window [3,4,5]
    assert v.global_avg == 3.0


def test_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    top1, top2 = accuracy(logits, labels, topk=(1, 2))
    assert float(top1) == 50.0
    # row0 top2 {1,0} hits label 1; row1 top2 {0,2} hits label 2.
    assert float(top2) == 100.0


def test_serve_artifact_roundtrip(tmp_path):
    """Serving artifact save/load: fp8 payloads survive npz (stored as
    raw bytes, dtype rebuilt from the manifest) and the loaded engine
    emits the same tokens."""
    from fp8tpu.models import tiny_config
    from fp8tpu.serve import Request, ServeConfig, ServingEngine
    from fp8tpu.serve.model import random_serve_params
    from fp8tpu.utils.checkpoint import (load_serve_artifact,
                                         save_serve_artifact)

    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64)
    params = random_serve_params(cfg, "e4m3")
    scfg = ServeConfig(model=cfg, kv_fmt="int8")
    save_serve_artifact(str(tmp_path), params, scfg)
    p2, c2 = load_serve_artifact(str(tmp_path))
    assert c2 == scfg

    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(p2)[0]):
        assert a.dtype == b.dtype and a.shape == b.shape, kp
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))

    req = [Request(uid=0, prompt=[3, 1, 4], max_new_tokens=6)]
    out_a = ServingEngine(params, scfg, n_slots=1, max_seq=64).run(
        [Request(**vars(req[0]))])
    out_b = ServingEngine(p2, c2, n_slots=1, max_seq=64).run(
        [Request(**vars(req[0]))])
    assert out_a == out_b


def test_serve_artifact_roundtrip_int4(tmp_path):
    from fp8tpu.models import tiny_config
    from fp8tpu.serve.model import random_serve_params, ServeConfig
    from fp8tpu.utils.checkpoint import (load_serve_artifact,
                                         save_serve_artifact)

    cfg = tiny_config(n_layers=1, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64)
    params = random_serve_params(cfg, "int4")
    scfg = ServeConfig(model=cfg, weight_fmt="int4")
    save_serve_artifact(str(tmp_path), params, scfg)
    p2, c2 = load_serve_artifact(str(tmp_path))
    assert c2.weight_fmt == "int4" and c2.int4_group == scfg.int4_group
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(p2)[0]):
        assert a.dtype == b.dtype and a.shape == b.shape, kp
