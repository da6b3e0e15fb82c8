"""GPipe-style pipeline parallelism over a ``stage`` mesh axis.

The reference has no model parallelism of any kind (SURVEY.md §2.3); this
is north-star scale-out surface, built the TPU way: the layer stack is
split into S stages whose parameters live on S mesh slices, microbatches
stream through a ``lax.scan`` of compute ticks, and activations hop
stage→stage over ICI with ``jax.lax.ppermute``.  Differentiating through
the scan + ppermute yields the classic GPipe schedule (full forward, then
full backward with stashed activations) without any custom VJP: ppermute
transposes to the inverse permutation, so gradients flow backwards
through the pipeline automatically.

Quantization composes freely: ``stage_fn`` may fake-quantize weights /
activations (fp8 payload stages included) — the pipeline is agnostic to
what each stage computes, as long as outputs keep the microbatch shape.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_pp_mesh(stages: int, data: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(stage, data) mesh: ``stage`` outermost — a stage boundary is one
    activation hop per tick, so it tolerates the slower links; ``data``
    innermost keeps gradient psums on fast ICI within a stage."""
    devices = list(devices if devices is not None else jax.devices())
    n = stages * data
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(stages, data)
    return Mesh(dev, axis_names=("stage", "data"))


def stack_stage_params(per_stage_params) -> object:
    """Stack a list of S identically-structured pytrees along a new
    leading stage axis (leaves become (S, ...)) — the layout
    :func:`pipeline_apply` expects, shardable with ``P("stage", ...)``."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_stage_params)


def stage_param_sharding(stage_params, mesh: Mesh) -> object:
    """NamedShardings placing each stage's parameter slice on its stage
    row (leading axis over ``stage``, rest replicated)."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("stage", *([None] * (x.ndim - 1)))),
        stage_params)


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    x: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = "stage",
    batch_axis: Optional[str] = "data",
    remat: bool = False,
) -> jax.Array:
    """Run ``x`` through S pipelined stages: ``y = f_{S-1}(... f_0(x))``.

    ``stage_params``: pytree with leading dim S on every leaf (see
    :func:`stack_stage_params`), sharded ``P(axis, ...)``.
    ``stage_fn(params_slice, x_mb) -> y_mb`` must preserve the microbatch
    shape (a transformer block, a quantized MLP, ...).
    ``x``: (B, ...) with B divisible by ``n_microbatches`` (× the
    ``batch_axis`` size when the mesh also data-parallelizes).

    Returns (B, ...), replicated over ``axis``.  Differentiable —
    ``jax.grad`` through the scan/ppermute gives the GPipe schedule.
    ``remat=True`` wraps the stage in ``jax.checkpoint`` so the scan
    stashes only stage *inputs* (one microbatch activation per tick)
    and recomputes the stage interior in the backward pipeline — the
    standard GPipe memory/FLOPs trade on HBM-bound TPU training.
    """
    S = mesh.shape[axis]
    M = n_microbatches
    in_batch = P(batch_axis) if batch_axis else P()
    if remat:
        stage_fn = jax.checkpoint(stage_fn)

    def body(params_local, xl):
        # shard_map gives the (1, ...)-leading local param block
        params = jax.tree_util.tree_map(lambda p: p[0], params_local)
        sid = jax.lax.axis_index(axis)
        B = xl.shape[0]
        assert B % M == 0, (B, M)
        mbs = xl.reshape(M, B // M, *xl.shape[1:])

        def tick(carry, t):
            state, outputs = carry
            mb_t = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(sid == 0, mb_t, state)
            y = stage_fn(params, x_in)
            # hop to the next stage (stage S-1's output leaves the ring;
            # stage 0 receives zeros, overwritten by mb_t next tick)
            nxt = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(S - 1)])
            # last stage emits microbatch t-(S-1) on ticks >= S-1
            out_t = t - (S - 1)
            cur = jax.lax.dynamic_index_in_dim(
                outputs, jnp.maximum(out_t, 0), 0, keepdims=False)
            upd = jnp.where((out_t >= 0) & (sid == S - 1), y, cur)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, upd, jnp.maximum(out_t, 0), 0)
            return (nxt, outputs), None

        # the carry varies per stage (ppermute / stage-masked writes):
        # mark the zeros that way up front or the scan rejects the carry
        state0 = jax.lax.pcast(jnp.zeros_like(mbs[0]), (axis,),
                               to="varying")
        out0 = jax.lax.pcast(jnp.zeros_like(mbs), (axis,), to="varying")
        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(M + S - 1))
        # outputs are nonzero only on the last stage: one psum over the
        # stage ring replicates them (transposes cleanly for the
        # backward pipeline)
        outputs = jax.lax.psum(
            jnp.where(sid == S - 1, outputs, jnp.zeros_like(outputs)), axis)
        return outputs.reshape(B, *xl.shape[1:])

    spec_params = jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stage_params)
    return shard_map(
        body, mesh=mesh,
        in_specs=(spec_params, in_batch),
        out_specs=in_batch)(stage_params, x)
