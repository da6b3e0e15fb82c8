"""shard_map tensor-parallel quantized matmuls with overlapped ICI
collectives.

GSPMD (pjit rules in :mod:`fp8tpu.parallel.sharding`) handles most TP
automatically, but the ≥85% multi-host scaling target (BASELINE.md)
needs explicit control of collective/compute overlap on the row-parallel
(psum-bearing) matmuls: XLA will not split one big reduce over a matmul
it already fused.  Here the local contraction is chunked along the
output axis and each chunk's ``psum_scatter`` issues as soon as that
chunk's MXU work finishes — chunk i's collective rides the ICI while
chunk i+1 is still on the MXU (SURVEY.md §7.2 step 6; the reference has
no model parallelism at all, §2.3).

Weights are fp8 payloads + per-output-channel scales exactly like the
serving artifact (kernels/qmatmul.quantize_weights); payloads shard,
scales shard with their channel axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _dequant_dot(x, w8, s):
    out = jax.lax.dot_general(
        x, w8.astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return out * s.reshape(-1)


def column_parallel_qmatmul(x: jax.Array, w8: jax.Array, scales: jax.Array,
                            mesh: Mesh, axis: str = "model") -> jax.Array:
    """Megatron column-parallel: ``y = x @ dequant(w8)`` with the output
    channels sharded over ``axis``.  x replicated, w8 (K, N) sharded on
    N, result (B, N) sharded on N.  No collective (the paired
    row-parallel matmul carries the psum)."""

    def body(xl, wl, sl):
        return _dequant_dot(xl, wl, sl).astype(x.dtype)

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis)),
        out_specs=P(None, axis))(x, w8, scales)


def row_parallel_qmatmul(x: jax.Array, w8: jax.Array, scales: jax.Array,
                         mesh: Mesh, axis: str = "model",
                         overlap_chunks: int = 4,
                         scatter: bool = False) -> jax.Array:
    """Megatron row-parallel with overlapped reduction.

    x (B, K) sharded on K over ``axis``; w8 (K, N) sharded on K; scales
    (N,) replicated.  Each shard computes a partial (B, N) product in
    ``overlap_chunks`` column chunks; chunk i's ``psum`` /
    ``psum_scatter`` is issued immediately, overlapping chunk i+1's MXU
    work on the ICI.  ``scatter=True`` returns (B, N) sharded on N
    (sequence-parallel style reduce-scatter); else replicated (B, N).
    """
    n = w8.shape[1]
    assert n % overlap_chunks == 0, (n, overlap_chunks)
    csz = n // overlap_chunks
    if scatter:
        t = mesh.shape[axis]
        assert csz % t == 0, (csz, t)

    def body(xl, wl, sl):
        outs = []
        for c in range(overlap_chunks):
            wc = jax.lax.slice_in_dim(wl, c * csz, (c + 1) * csz, axis=1)
            sc = jax.lax.slice_in_dim(sl, c * csz, (c + 1) * csz, axis=0)
            part = _dequant_dot(xl, wc, sc)
            if scatter:
                red = jax.lax.psum_scatter(part, axis, scatter_dimension=1,
                                           tiled=True)
            else:
                red = jax.lax.psum(part, axis)
            outs.append(red.astype(x.dtype))
        return jnp.concatenate(outs, axis=1)

    out_spec = P(None, axis) if scatter else P()
    out = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P()),
        out_specs=out_spec)(x, w8, scales)
    if scatter:
        # Each shard holds [chunk, its tile] blocks, so the assembled
        # global column order is [shard, chunk, inner]; restore the
        # natural [chunk, shard, inner] order.  (A production consumer
        # can instead keep the permuted layout and permute the next
        # matmul's rows to match, skipping this copy.)
        t = mesh.shape[axis]
        b = out.shape[0]
        out = out.reshape(b, t, overlap_chunks, csz // t)
        out = out.swapaxes(1, 2).reshape(b, n)
    return out


def tp_mlp_block(x: jax.Array, up8, up_s, down8, down_s, mesh: Mesh,
                 axis: str = "model", overlap_chunks: int = 4) -> jax.Array:
    """A full TP MLP: column-parallel up (+silu) feeding row-parallel
    down with overlapped psum — the canonical pattern the scaling
    harness measures.  x (B, K) replicated → (B, K) replicated."""
    h = column_parallel_qmatmul(x, up8, up_s, mesh, axis)  # (B, FF/T)*T

    def act(hl):
        return jax.nn.silu(hl.astype(jnp.float32)).astype(x.dtype)

    h = shard_map(act, mesh=mesh, in_specs=(P(None, axis),),
                  out_specs=P(None, axis))(h)
    return row_parallel_qmatmul(h, down8, down_s, mesh, axis,
                                overlap_chunks=overlap_chunks)
