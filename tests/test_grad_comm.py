"""Quantized-wire gradient all-reduce tests (8-device virtual CPU mesh).

The reference's DP story is full-precision apex-DDP all-reduce
(/root/reference/examples/training/resnet/main_amp.py:210-216); the TPU
design compresses the DCN payload instead (parallel/grad_comm.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from fp8tpu.parallel import (
    make_mesh,
    wire_all_reduce,
    wire_all_reduce_tree,
    wire_bytes_per_element,
)


def _run_all_reduce(per_dev, fmt, mean=False, block=512, tree=False):
    """per_dev: (8, ...) array (or pytree of them); each row is one
    device's local gradient.  Returns the synced value every device
    sees (asserted identical across devices)."""
    mesh = make_mesh(data=8)

    def body(x):
        x = jax.tree.map(lambda a: a.reshape(a.shape[1:]), x)
        if tree:
            out = wire_all_reduce_tree(x, "data", fmt=fmt, mean=mean,
                                       block=block)
        else:
            out = wire_all_reduce(x, "data", fmt=fmt, mean=mean, block=block)
        return jax.tree.map(lambda a: a[None], out)

    spec = jax.tree.map(lambda _: P("data"), per_dev)
    fn = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                   check_vma=False)
    out = jax.jit(fn)(per_dev)
    # Every device must hold the identical reduced value.
    for leaf in jax.tree.leaves(out):
        leaf = np.asarray(leaf)
        for d in range(1, leaf.shape[0]):
            np.testing.assert_array_equal(leaf[0], leaf[d])
    return jax.tree.map(lambda a: np.asarray(a)[0], out)


def test_exact_psum_fallback(rng):
    x = jnp.asarray(rng.standard_normal((8, 33)), jnp.float32)
    out = _run_all_reduce(x, fmt=None)
    np.testing.assert_allclose(out, np.asarray(x).sum(0), rtol=1e-6)


@pytest.mark.parametrize("fmt,rtol", [("e4m3", 0.07), ("e5m2", 0.14),
                                      ("int8", 0.01), ("bf16", 0.008)])
def test_quantized_formats_close_to_exact(rng, fmt, rtol):
    # Layer-scale variation: rows span 1e-3 .. 1e+2 magnitudes.
    x = rng.standard_normal((8, 2048)).astype(np.float32)
    x *= np.logspace(-3, 2, 2048)[None, :].astype(np.float32)
    out = _run_all_reduce(jnp.asarray(x), fmt=fmt, block=128)
    exact = x.sum(0)
    err = np.abs(out - exact)
    # Element tolerance scales with the local block amax (that is the
    # quantization grid), not the element's own magnitude.
    ref = np.abs(x).max(0).reshape(-1, 128).max(1).repeat(128) * 8
    assert np.all(err <= rtol * ref + 1e-6), (fmt, float(err.max()))
    # And the aggregate signal survives: relative L2 error small.
    rel_l2 = np.linalg.norm(out - exact) / np.linalg.norm(exact)
    assert rel_l2 < rtol, (fmt, rel_l2)


def test_mean_divides_by_device_count(rng):
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    s = _run_all_reduce(x, fmt="int8", mean=False)
    m = _run_all_reduce(x, fmt="int8", mean=True)
    np.testing.assert_allclose(m, s / 8, rtol=0.02, atol=1e-5)


def test_block_scales_preserve_small_layers(rng):
    """A ravel mixing a 1e+2-magnitude layer with a 1e-4-magnitude layer
    must not crush the small one: per-block scales bound each block's
    error by its OWN amax."""
    big = rng.standard_normal((8, 512)).astype(np.float32) * 100.0
    small = rng.standard_normal((8, 512)).astype(np.float32) * 1e-4
    x = np.concatenate([big, small], axis=1)
    out = _run_all_reduce(jnp.asarray(x), fmt="e4m3", block=512)
    exact = x.sum(0)
    small_out, small_exact = out[512:], exact[512:]
    rel = (np.linalg.norm(small_out - small_exact)
           / np.linalg.norm(small_exact))
    assert rel < 0.05, rel  # would be ~1.0 with a single global scale


def test_tree_roundtrip_shapes_and_dtypes(rng):
    tree = {
        "w": jnp.asarray(rng.standard_normal((8, 3, 5)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal((8, 7)), jnp.float32),
        "emb": jnp.asarray(rng.standard_normal((8, 11, 2)), jnp.bfloat16),
    }
    out = _run_all_reduce(tree, fmt="e4m3", tree=True, block=64)
    assert out["w"].shape == (3, 5) and out["b"].shape == (7,)
    assert out["emb"].dtype == jnp.bfloat16
    exact = np.asarray(tree["b"], np.float32).sum(0)
    rel = np.linalg.norm(out["b"] - exact) / np.linalg.norm(exact)
    assert rel < 0.07


def test_wire_payload_is_fp8_in_hlo():
    """The collective operand must actually be 8-bit on the wire: the
    lowered HLO's all-to-all operates on f8E4M3FN."""
    mesh = make_mesh(data=8)

    def body(x):
        return wire_all_reduce(x.reshape(-1), "data", fmt="e4m3")[None]

    fn = shard_map(body, mesh=mesh, in_specs=(P("data"),),
                   out_specs=P("data"), check_vma=False)
    x = jnp.ones((8, 1024), jnp.float32)
    txt = jax.jit(fn).lower(x).as_text()
    a2a = [ln for ln in txt.splitlines() if "all_to_all" in ln]
    assert a2a and any("f8e4m3" in ln.lower() for ln in a2a), a2a[:3]
    ag = [ln for ln in txt.splitlines()
          if "all_gather" in ln and "f8e4m3" in ln.lower()]
    assert ag, "quantized all_gather payload missing from lowering"


def test_wire_bytes_model():
    # fp8 payload at block=512 moves ~4x fewer bytes than f32.
    f32 = wire_bytes_per_element(None, 8)
    fp8 = wire_bytes_per_element("e4m3", 8)
    assert f32 / fp8 > 3.9
    assert wire_bytes_per_element("bf16", 8) == pytest.approx(f32 / 2)
