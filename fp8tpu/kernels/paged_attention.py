"""Pallas paged-attention decode kernel: in-kernel page-table walk.

The TPU-native answer to paged KV decode (VERDICT r4 next #1): instead of
materializing a contiguous snapshot of every slot's mapped pages once per
chunk (``PagedKVCache.gather`` — the XLA-level design the r3/r4 A/Bs
explored), the kernel walks the page table *inside* the program: the
table rides in SMEM as a scalar-prefetch operand, each grid step's
``BlockSpec`` index map picks the next physical page, and Pallas's
pipeline streams the (page_size*KV, D) K/V blocks HBM→VMEM with double
buffering while the previous block computes.  Per-vector scales are
applied in-register; the pool's quantized payload never exists in bf16
in HBM.

Reference lineage: block-scaled KV is the serving extension of the
reference's block_norm casting (fpemu_impl.cpp:778-815); the reference
itself has no paged or serving machinery.

Shapes (all static except the table values):

  q          (B, KVG, D)      bf16 — query heads, KVG = KV*G, pre-scaled
                               by 1/sqrt(D)
  pool       (P, 2, L, R, D)  int8/fp8 payloads, R = page_size*KV,
                               k at index 0, v at 1 (PagedKVCache.pool)
  sc         (P, 2, L, R)     f32 per-(token, kv-head) scales
  page_table (B, MP)          int32 physical page ids, -1 = unmapped
  lens       (B,)             int32 valid tokens per slot
  layer      (1,)             int32 layer index into the pool

Returns UNNORMALIZED flash partials over the pooled prefix only —
``(acc (B, KVG, D) f32, m (B, KVG) f32, l (B, KVG) f32)`` — so the
caller combines them exactly with the fresh-token / side-buffer parts
(softmax partials over disjoint key sets merge exactly; only partials
over *changing queries* do not — NOTES r2).

The score matmul folds the GQA structure into ONE MXU dot per page
block: K rows are token-major (t*KV + kv), the dot contracts D against
all KVG query heads at once, and off-head entries (row's kv != column's
kv group) are masked to -1e30 before the exp — their probability is
exactly 0, so the context dot over the full (R, KVG) probability block
is exact with no per-head slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(page_table, lens, layer, q_ref, k_ref, ks_ref, v_ref, vs_ref,
            acc_ref, m_ref, l_ref, *, page_size: int, kv_heads: int):
    b = pl.program_id(0)
    mp = pl.program_id(1)
    KVG, D = q_ref.shape[1], q_ref.shape[2]
    R = page_size * kv_heads
    G = KVG // kv_heads

    @pl.when(mp == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # page validity masks: token-major rows (r = t*KV + kv)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, KVG), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (R, KVG), 1)
    head_ok = (row % kv_heads) == (col // G)
    pos_ok = (mp * page_size + row // kv_heads) < lens[b]
    mask = head_ok & pos_ok

    k = k_ref[0, 0, 0].astype(jnp.bfloat16)            # (R, D)
    ks = ks_ref[0, 0]                                  # (R,)
    q = q_ref[0]                                       # (KVG, D)
    s = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (R, KVG)
    s = jnp.where(mask, s * ks[:, None], _NEG)

    m_old = m_ref[0, 0]                                # (KVG,)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=0))
    alpha = jnp.exp(m_old - m_new)                     # (KVG,)
    # explicit zero for masked entries: an all-masked page must
    # contribute nothing even when m_new is still the -1e30 sentinel
    # (exp(s - m_new) would be exp(0) = 1 there)
    p = jnp.where(mask, jnp.exp(s - m_new[None, :]), 0.0)

    vs = vs_ref[0, 0]                                  # (R,)
    v = v_ref[0, 0, 0].astype(jnp.bfloat16)            # (R, D)
    pv = (p * vs[:, None]).astype(jnp.bfloat16)        # (R, KVG)
    ctx = jax.lax.dot_general(
        pv, v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (KVG, D)

    m_ref[0, 0] = m_new
    l_ref[0, 0] = l_ref[0, 0] * alpha + jnp.sum(p, axis=0)
    acc_ref[0] = acc_ref[0] * alpha[:, None] + ctx


@functools.partial(jax.jit, static_argnames=("page_size", "kv_heads",
                                             "interpret"))
def paged_decode_attention(q: jax.Array, pool: jax.Array, sc: jax.Array,
                           page_table: jax.Array, lens: jax.Array,
                           layer: jax.Array, *, page_size: int,
                           kv_heads: int, interpret: bool = False):
    """Flash partials of decode attention over the paged pool prefix.

    See module docstring for shapes.  ``layer`` is a (1,) int32 array
    (traced — the caller's layer scan passes its loop index)."""
    B, KVG, D = q.shape
    P, _, L, R_, _ = pool.shape
    R = page_size * kv_heads
    MP = page_table.shape[1]
    # Mosaic's block rule: the last two BLOCK dims must be (8,128)-
    # divisible or equal to the array's.  The pool blocks (1,1,1,R,D)
    # satisfy it via (R, D); the scales' natural (1,1,1,R) slice does
    # not (second-to-last block dim 1 vs array dim L), so scales are
    # viewed as (P*2*L, 1, R) — a contiguous reshape — making the block
    # the full trailing dims (1, R).
    sc3 = sc.reshape(P * 2 * L, 1, R_)

    def kpool_idx(b, mp, pt, ln, ly):
        return (jnp.maximum(pt[b, mp], 0), 0, ly[0], 0, 0)

    def vpool_idx(b, mp, pt, ln, ly):
        return (jnp.maximum(pt[b, mp], 0), 1, ly[0], 0, 0)

    def ksc_idx(b, mp, pt, ln, ly):
        return (jnp.maximum(pt[b, mp], 0) * 2 * L + ly[0], 0, 0)

    def vsc_idx(b, mp, pt, ln, ly):
        return ((jnp.maximum(pt[b, mp], 0) * 2 + 1) * L + ly[0], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, MP),
        in_specs=[
            pl.BlockSpec((1, KVG, D), lambda b, mp, pt, ln, ly: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, R, D), kpool_idx),
            pl.BlockSpec((1, 1, R), ksc_idx),
            pl.BlockSpec((1, 1, 1, R, D), vpool_idx),
            pl.BlockSpec((1, 1, R), vsc_idx),
        ],
        out_specs=[
            pl.BlockSpec((1, KVG, D), lambda b, mp, pt, ln, ly: (b, 0, 0)),
            pl.BlockSpec((1, 1, KVG), lambda b, mp, pt, ln, ly: (b, 0, 0)),
            pl.BlockSpec((1, 1, KVG), lambda b, mp, pt, ln, ly: (b, 0, 0)),
        ],
    )
    acc, m, l = pl.pallas_call(
        functools.partial(_kernel, page_size=page_size,
                          kv_heads=kv_heads),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, KVG, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, KVG), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, KVG), jnp.float32),
        ],
        interpret=interpret,
    )(page_table, lens, layer, q, pool, sc3, pool, sc3)
    return acc, m[:, 0], l[:, 0]
