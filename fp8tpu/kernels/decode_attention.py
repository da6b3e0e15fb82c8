"""Flash-decoding attention over the FP8 (or BF16) KV cache.

Why this kernel exists: XLA lowers the decode-time cache attention
einsums (``bkgd,bksd->bkgs`` with G=1) to *VPU loop fusions* — broadcast
+ multiply + reduce in f32 over the whole cache — which both burns VPU
cycles and reads the cache at ~260 GB/s.  This kernel streams the cache
HBM→VMEM in large tiles, upcasts fp8 in-register, runs both dots on the
MXU, and applies the per-vector KV scales in the epilogue — the same
role the reference's C-model plays for GEMMs (cmodel/simple_gemm_impl
.cpp:91-103), done the TPU way.

It returns *flash partials* (unnormalized context, running max, running
sum-of-exp) over the cached prefix only; the caller combines them with
the fresh-token / staged-chunk partials computed in XLA (those are tiny)
— the standard flash-decoding split.  Blocks past every slot's write
position are skipped at the DMA level via a scalar-prefetched block
limit (the index map re-addresses skipped blocks to the last valid one,
so no new bytes move).

Layouts (L = layers, B = slots, KV = kv heads, G = query group, S =
cache length, D = head dim):

  q      (B, KV, G, D)    bf16
  k8/v8  (L, B, KV, S, D) fp8 payloads (or bf16 for the baseline twin)
  ks/vs  (L, KV, B, S)    f32 per-vector scales (None for bf16).
                          NOTE the (KV, B) order: scores live as
                          (G, S-block) tiles with S in lanes, so scale
                          rows must have S contiguous per (kv, b).
  positions (B,) int32    cache valid at s < positions[b]

The whole cache array is passed; the layer is selected by the scalar-
prefetched ``layer`` index inside the BlockSpec index maps, so calling
this inside a ``lax.scan`` over layers never materializes a per-layer
slice of the cache in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # finite mask value: keeps exp() NaN-free for empty slots


def _kernel(layer_ref, pos_ref, lim_ref, q_ref, k_ref, ks_ref, v_ref,
            vs_ref, ctx_ref, m_ref, l_ref, m_s, l_s, ctx_s, *,
            block_b, block_s, has_scales):
    i = pl.program_id(1)          # b-block
    k = pl.program_id(2)          # s-block
    nsb = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, _NEG)
        l_s[:] = jnp.zeros_like(l_s)
        ctx_s[:] = jnp.zeros_like(ctx_s)

    @pl.when(k < lim_ref[i])
    def _():
        s0 = k * block_s
        for b in range(block_b):
            pos = pos_ref[i * block_b + b]
            qb = q_ref[b, 0]                          # (G, D) bf16
            kb = k_ref[0, b, 0].astype(jnp.bfloat16)  # (SB, D)
            scores = jax.lax.dot_general(
                qb, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (G, SB)
            if has_scales:
                scores = scores * ks_ref[0, 0, b][None, :]
            sidx = jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 1) + s0
            scores = jnp.where(sidx < pos, scores, _NEG)

            m_old = m_s[b]                            # (G,)
            m_blk = jnp.max(scores, axis=1)
            m_new = jnp.maximum(m_old, m_blk)
            p = jnp.exp(scores - m_new[:, None])      # (G, SB)
            corr = jnp.exp(m_old - m_new)
            pv = p * vs_ref[0, 0, b][None, :] if has_scales else p
            vb = v_ref[0, b, 0].astype(jnp.bfloat16)
            ctx_blk = jax.lax.dot_general(
                pv.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (G, D)

            m_s[b] = m_new
            l_s[b] = l_s[b] * corr + jnp.sum(p, axis=1)
            ctx_s[b] = ctx_s[b] * corr[:, None] + ctx_blk

    @pl.when(k == nsb - 1)
    def _():
        ctx_ref[:] = ctx_s[:].reshape(ctx_ref.shape)
        m_ref[:] = m_s[:].reshape(m_ref.shape)
        l_ref[:] = l_s[:].reshape(l_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("block_b", "block_s", "has_scales", "interpret"))
def _flash_decode(q, k8, ks, v8, vs, layer, positions, limits,
                  block_b, block_s, has_scales, interpret):
    L, B, KV, S, D = k8.shape
    G = q.shape[2]
    nb, nsb = B // block_b, S // block_s

    def im_cache(j, i, k, layer_ref, pos_ref, lim_ref):
        k_eff = jnp.minimum(k, jnp.maximum(lim_ref[i] - 1, 0))
        return (layer_ref[0], i, j, k_eff, 0)

    def im_scale(j, i, k, layer_ref, pos_ref, lim_ref):
        k_eff = jnp.minimum(k, jnp.maximum(lim_ref[i] - 1, 0))
        return (layer_ref[0], j, i, k_eff)

    def im_q(j, i, k, *_):
        return (i, j, 0, 0)

    def im_ctx(j, i, k, *_):
        return (i, j, 0, 0)

    def im_ml(j, i, k, *_):
        return (j, i, 0)

    cache_spec = pl.BlockSpec((1, block_b, 1, block_s, D), im_cache,
                              memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1, block_b, block_s), im_scale,
                              memory_space=pltpu.VMEM)
    dummy_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dummy = jnp.zeros((1,), jnp.float32)

    in_specs = [
        pl.BlockSpec((block_b, 1, G, D), im_q, memory_space=pltpu.VMEM),
        cache_spec,
        scale_spec if has_scales else dummy_spec,
        cache_spec,
        scale_spec if has_scales else dummy_spec,
    ]
    operands = [q.astype(jnp.bfloat16), k8,
                ks if has_scales else dummy, v8,
                vs if has_scales else dummy]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(KV, nb, nsb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_b, 1, G, D), im_ctx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, G), im_ml, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, G), im_ml, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_b, G), jnp.float32),
            pltpu.VMEM((block_b, G), jnp.float32),
            pltpu.VMEM((block_b, G, D), jnp.float32),
        ],
    )
    kernel = functools.partial(_kernel, block_b=block_b, block_s=block_s,
                               has_scales=has_scales)
    itemsize = k8.dtype.itemsize
    ctx, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KV, G, D), jnp.float32),
            jax.ShapeDtypeStruct((KV, B, G), jnp.float32),
            jax.ShapeDtypeStruct((KV, B, G), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * KV * G * S * D,
            bytes_accessed=2 * B * KV * S * D * itemsize,
            transcendentals=B * KV * G * S,
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer).astype(jnp.int32),
      positions.astype(jnp.int32), limits.astype(jnp.int32), *operands)
    return ctx, m.transpose(1, 0, 2), l.transpose(1, 0, 2)


def flash_decode_cache(
    q: jax.Array,
    k8: jax.Array,
    ks: Optional[jax.Array],
    v8: jax.Array,
    vs: Optional[jax.Array],
    layer,
    positions: jax.Array,
    block_b: int = 8,
    block_s: int = 512,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Flash partials of decode attention over the cached prefix.

    ``ks``/``vs`` use the (L, KV, B, S) layout (see module docstring).
    Returns ``(ctx_un, m, l)`` with shapes (B, KV, G, D) f32, (B, KV, G),
    (B, KV, G): ``ctx_un = sum_s exp(score_s - m) * scale_s * V_s``,
    ``l = sum_s exp(score_s - m)``.  ``q`` must already include the
    1/sqrt(D) factor.  Combine with other partials via
    :func:`combine_partials`, then divide by ``l``
    (:func:`finalize_partials`).
    """
    L, B, KV, S, D = k8.shape
    while B % block_b:
        block_b //= 2
    block_s = min(block_s, S)
    while S % block_s:
        block_s //= 2
    nb = B // block_b
    # Per-b-block DMA skip limit: blocks at k >= lim hold no valid entry
    # for any slot in the block.
    pos_blocks = positions.reshape(nb, block_b)
    limits = pl.cdiv(jnp.max(pos_blocks, axis=1), block_s).astype(jnp.int32)
    has_scales = ks is not None
    return _flash_decode(q, k8, ks, v8, vs, jnp.asarray(layer), positions,
                         limits, block_b, block_s, has_scales, interpret)


def combine_partials(a, b):
    """Merge two flash partials ``(ctx_un, m, l)`` over disjoint key sets."""
    ctx_a, m_a, l_a = a
    ctx_b, m_b, l_b = b
    m = jnp.maximum(m_a, m_b)
    ca = jnp.exp(m_a - m)
    cb = jnp.exp(m_b - m)
    ctx = ctx_a * ca[..., None] + ctx_b * cb[..., None]
    l = l_a * ca + l_b * cb
    return ctx, m, l


def finalize_partials(partials) -> jax.Array:
    """(ctx_un, m, l) → normalized context (B, KV, G, D) f32."""
    ctx, _, l = partials
    return ctx / jnp.maximum(l, 1e-30)[..., None]


def flash_decode_cache_reference(q, k8, ks, v8, vs, layer, positions):
    """Pure-jnp twin of :func:`flash_decode_cache` (CPU path / parity
    tests).  Takes the same (L, KV, B, S) scale layout.  Bit-identical
    math is not required — the combine is exact in f32 either way — but
    masking and scale application match."""
    k = k8[layer].astype(jnp.float32)
    v = v8[layer].astype(jnp.float32)
    qf = q.astype(jnp.float32)
    scores = jnp.einsum("bkgd,bksd->bkgs", qf, k)
    if ks is not None:
        scores = scores * ks[layer].transpose(1, 0, 2)[:, :, None, :]
    S = k.shape[2]
    mask = jnp.arange(S)[None, :] < positions[:, None]
    scores = jnp.where(mask[:, None, None, :], scores, _NEG)
    m = jnp.max(scores, axis=-1)
    p = jnp.exp(scores - m[..., None])
    l = jnp.sum(p, axis=-1)
    if vs is not None:
        pv = p * vs[layer].transpose(1, 0, 2)[:, :, None, :]
    else:
        pv = p
    ctx = jnp.einsum("bkgs,bksd->bkgd", pv, v)
    return ctx, m, l
