"""Worker for the multi-process CPU mesh test (tests/test_multiprocess.py).

Run as: python mp_worker.py <process_id> <num_processes> <port>

Each process contributes 4 virtual CPU devices; together they form an
8-device (host=2, model=4) mesh — the DCN/ICI hierarchy of make_mesh —
and run the shard_map TP q-matmul pipeline plus a cross-host psum,
checking numerics against a local dense reference.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           + os.environ.get("XLA_FLAGS", ""))

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from fp8tpu.parallel.sharding import make_mesh  # noqa: E402
from fp8tpu.parallel.tp_matmul import tp_mlp_block  # noqa: E402
from fp8tpu.kernels.qmatmul import quantize_weights  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc
assert jax.local_device_count() == 4

mesh = make_mesh(hosts=nproc, model=4)

# deterministic global data, identical in every process
rng = np.random.default_rng(0)
B, K, FF = 8, 64, 256
x = rng.standard_normal((B, K)).astype(np.float32)
up = (rng.standard_normal((K, FF)) * 0.1).astype(np.float32)
down = (rng.standard_normal((FF, K)) * 0.1).astype(np.float32)

up8, up_s = quantize_weights(jnp.asarray(up), "e4m3", axis=-1)
down8, down_s = quantize_weights(jnp.asarray(down), "e4m3", axis=-1)
up8, up_s = np.asarray(up8), np.asarray(up_s).reshape(-1)
down8, down_s = np.asarray(down8), np.asarray(down_s).reshape(-1)


def put(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        arr.shape, sh, lambda idx: arr[idx])


xg = put(x.astype(np.float32), P())
up8g = put(up8, P(None, "model"))
up_sg = put(up_s, P("model"))
down8g = put(down8, P("model", None))
down_sg = put(down_s, P())


@jax.jit
def run(xg, up8g, up_sg, down8g, down_sg):
    return tp_mlp_block(xg, up8g, up_sg, down8g, down_sg, mesh,
                        overlap_chunks=4)


out = np.asarray(jax.jit(lambda *a: run(*a))(xg, up8g, up_sg, down8g,
                                             down_sg))

# dense reference with the same quantized weights
upd = up8.astype(np.float32) * up_s[None, :]
downd = down8.astype(np.float32) * down_s[None, :]
h = x @ upd
h = h / (1 + np.exp(-h))          # silu in f32 (matches block's act)
ref = h @ downd
err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
assert err < 5e-2, f"tp_mlp parity failed: rel err {err}"

# cross-host psum over the DCN (host) axis
ones = put(np.ones((4 * nproc, 8), np.float32), P(("host", "data"), None))
from jax import shard_map

tot = shard_map(lambda a: jax.lax.psum(jnp.sum(a), ("host", "data")),
                mesh=mesh, in_specs=(P(("host", "data"), None),),
                out_specs=P())(ones)
assert float(np.asarray(tot)) == 4 * nproc * 8, tot

# pipeline parallelism with one stage per HOST: activations hop the
# process (DCN) boundary via ppermute, forward and backward
from fp8tpu.parallel.pipeline import (  # noqa: E402
    make_pp_mesh, pipeline_apply)

pp_mesh = make_pp_mesh(nproc, 4)
D = 16
ws = (rng.standard_normal((nproc, D, D)) * 0.2).astype(np.float32)
xp = rng.standard_normal((8, D)).astype(np.float32)


def pput(arr, spec):
    sh = NamedSharding(pp_mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh, lambda i: arr[i])


def stage_fn(p, h):
    return jnp.tanh(h @ p["w"])


wsg = pput(ws, P("stage", None, None))
xpg = pput(xp, P("data"))


def pp_loss(w, xv):
    y = pipeline_apply(stage_fn, {"w": w}, xv, pp_mesh, n_microbatches=2)
    return jnp.mean(y ** 2), y


(pl, yg), gw = jax.jit(jax.value_and_grad(pp_loss, has_aux=True))(wsg, xpg)

href = xp
for i in range(nproc):
    href = np.tanh(href @ ws[i])
# only process-local shards are addressable: compare each against its
# slice of the dense reference
pp_err = max(
    float(np.abs(np.asarray(sh.data) - href[sh.index]).max())
    for sh in yg.addressable_shards)
assert pp_err < 1e-5, f"cross-host pipeline parity failed: {pp_err}"
assert all(np.isfinite(np.asarray(sh.data)).all()
           for sh in gw.addressable_shards)

# fp8-wire DP gradient all-reduce over the CROSS-PROCESS axis: every
# payload byte on the (simulated) DCN is f8E4M3FN; each process holds a
# distinct gradient shard and all must agree on the synced mean.
from fp8tpu.parallel.grad_comm import wire_all_reduce_tree  # noqa: E402

gsz = 4 * nproc
gvals = (rng.standard_normal((gsz, 97)) *
         np.logspace(-2, 1, 97)[None]).astype(np.float32)
gg = put(gvals, P(("host", "data", "model"), None))


def sync(t):
    t = jax.tree_util.tree_map(lambda a: a.reshape(a.shape[1:]), t)
    out = wire_all_reduce_tree({"g": t}, ("host", "data", "model"),
                               fmt="e4m3", mean=True, block=32)
    return jax.tree_util.tree_map(lambda a: a[None], out["g"])


synced = jax.jit(shard_map(sync, mesh=mesh,
                           in_specs=(P(("host", "data", "model"), None),),
                           out_specs=P(("host", "data", "model"), None),
                           check_vma=False))(gg)
gref = gvals.mean(0)
wire_err = max(
    float(np.abs(np.asarray(sh.data)[0] - gref).max())
    for sh in synced.addressable_shards)
# e4m3 with block=32: error bounded by the per-block grid
tol = 0.1 * float(np.abs(gvals).max())
assert wire_err < tol, f"fp8-wire all-reduce parity failed: {wire_err}"

print(f"proc {pid}: OK (tp rel err {err:.4f}, pp err {pp_err:.2e}, "
      f"wire err {wire_err:.2e})", flush=True)
