"""FP8 KV cache (contiguous slots + paged variant).

The TPU-native extension of the reference's block-norm casting (its only
"block" concept, fpemu_impl.cpp:778-815) to serving: keys/values are
stored as real FP8 payloads with one power-free float32 scale per
(token, kv-head) — the direct analog of per-block scales with the block
being one head vector.  Scales factor out of the attention dots
(q·(k·s) = (q·k)·s), so attention consumes the fp8 payload directly on
the MXU with f32 accumulation and applies scales to scores/probs — the
cache is never materialized in bf16.

Static shapes throughout (XLA-friendly): a pre-allocated
(layers, slots, max_seq, kv_heads, head_dim) pool updated with
dynamic_update_slice; continuous batching reuses slots
(:mod:`fp8tpu.serve.engine`).  A paged pool with per-sequence page
tables is provided for long-context serving.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fp8tpu.numerics.formats import FORMATS

_FP8_DTYPES = {
    "e4m3": jnp.float8_e4m3fn,
    "e5m2": jnp.float8_e5m2,
    # bf16 "payload" mode: the unquantized baseline with identical cache
    # code structure (used by bench.py to compare fp8 vs bf16 honestly).
    "bf16": jnp.bfloat16,
}


def quantize_kv(x: jax.Array, fmt: str = "e4m3"):
    """Quantize (..., kv_heads, head_dim) vectors to fp8 with one scale per
    head vector.  Returns (payload fp8, scales f32 with trailing dim 1)."""
    if fmt == "bf16":
        scale = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
        return x.astype(jnp.bfloat16), scale
    fdesc = FORMATS[fmt]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / fdesc.max_normal, 1.0)
    payload = jnp.clip(x.astype(jnp.float32) / scale,
                       -fdesc.max_normal, fdesc.max_normal)
    return payload.astype(_FP8_DTYPES[fmt]), scale.astype(jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RingKVCache:
    """Ring-buffer FP8 KV cache — the serving decode's primary cache.

    One globally-shared write head: decode step g writes EVERY slot's
    fresh k/v at physical row ``g mod S``, so the whole step's cache
    update is a single contiguous slab store (via the aliasing
    ``dyn_store`` kernel) — no per-slot scatter, no staging buffer, no
    chunk merge.  A slot's token written at step g is overwritten exactly
    S steps later by its own next write, so each slot keeps its most
    recent S tokens: per-slot sliding-window semantics with window S
    (slots must write every step while active; the engine guarantees
    this).  Validity per slot is ``(head - 1 - row) mod S < len`` with
    ``len = min(position, S)``.

    Layouts keep every trailing dim tile-aligned (fp8 sublane tile is 32
    — a bare KV dim would be 4x padded in HBM):

      kv8 (S, 2, L, B*KV, D)  fp8/bf16 payloads, k at index 0, v at 1
      sc  (S, 2, L, B*KV)     f32 per-head-vector scales
      head ()                 int32 next write row
    """

    kv8: jax.Array
    sc: jax.Array
    head: jax.Array

    @staticmethod
    def create(n_layers: int, n_slots: int, max_seq: int, kv_heads: int,
               head_dim: int, fmt: str = "e4m3") -> "RingKVCache":
        dt = _FP8_DTYPES[fmt]
        bk = n_slots * kv_heads
        return RingKVCache(
            kv8=jnp.zeros((max_seq, 2, n_layers, bk, head_dim), dt),
            sc=jnp.ones((max_seq, 2, n_layers, bk), jnp.float32),
            head=jnp.zeros((), jnp.int32),
        )

    @property
    def fmt(self) -> str:
        return {jnp.float8_e4m3fn: "e4m3", jnp.float8_e5m2: "e5m2",
                jnp.bfloat16: "bf16"}[jnp.dtype(self.kv8.dtype).type]

    @property
    def max_seq(self) -> int:
        return self.kv8.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Contiguous-slot FP8 KV cache.

    Layout is attention-native — (L, B, KV, S, D) — so the decode dots
    q(B,KV,G,D) · K(B,KV,S,D) and P(B,KV,G,S) · V(B,KV,S,D) contract with
    no transposes (a transposed read would copy the whole cache every
    layer every step).

    k8/v8: (L, B, KV, S, D) fp8 payloads
    k_scale/v_scale: (L, B, KV, S) float32
    """

    k8: jax.Array
    v8: jax.Array
    k_scale: jax.Array
    v_scale: jax.Array

    @staticmethod
    def create(n_layers: int, n_slots: int, max_seq: int, kv_heads: int,
               head_dim: int, fmt: str = "e4m3") -> "KVCache":
        dt = _FP8_DTYPES[fmt]
        shape = (n_layers, n_slots, kv_heads, max_seq, head_dim)
        return KVCache(
            k8=jnp.zeros(shape, dt),
            v8=jnp.zeros(shape, dt),
            k_scale=jnp.ones(shape[:-1], jnp.float32),
            v_scale=jnp.ones(shape[:-1], jnp.float32),
        )

    @property
    def fmt(self) -> str:
        return {jnp.float8_e4m3fn: "e4m3", jnp.float8_e5m2: "e5m2",
                jnp.bfloat16: "bf16"}[jnp.dtype(self.k8.dtype).type]

    @property
    def max_seq(self) -> int:
        return self.k8.shape[3]

    def update(self, layer: int, k: jax.Array, v: jax.Array,
               start_pos: jax.Array) -> "KVCache":
        """Write (B, S_new, KV, D) keys/values at ``start_pos`` for every
        slot (same position across slots — the decode-step case)."""
        k8, ks = quantize_kv(k, self.fmt)
        v8, vs = quantize_kv(v, self.fmt)
        k8 = k8.transpose(0, 2, 1, 3)        # → (B, KV, S_new, D)
        v8 = v8.transpose(0, 2, 1, 3)
        ks = ks[..., 0].transpose(0, 2, 1)   # → (B, KV, S_new)
        vs = vs[..., 0].transpose(0, 2, 1)
        z = jnp.zeros((), jnp.int32)
        li = jnp.int32(layer)
        return KVCache(
            jax.lax.dynamic_update_slice(self.k8, k8[None],
                                         (li, z, z, start_pos, z)),
            jax.lax.dynamic_update_slice(self.v8, v8[None],
                                         (li, z, z, start_pos, z)),
            jax.lax.dynamic_update_slice(self.k_scale, ks[None],
                                         (li, z, z, start_pos)),
            jax.lax.dynamic_update_slice(self.v_scale, vs[None],
                                         (li, z, z, start_pos)),
        )

    def update_slot(self, layer: int, slot: jax.Array, k: jax.Array,
                    v: jax.Array, start_pos: jax.Array) -> "KVCache":
        """Write (S_new, KV, D) for one slot (prefill of a new request)."""
        k8, ks = quantize_kv(k, self.fmt)
        v8, vs = quantize_kv(v, self.fmt)
        k8 = k8.transpose(1, 0, 2)           # → (KV, S_new, D)
        v8 = v8.transpose(1, 0, 2)
        ks = ks[..., 0].transpose(1, 0)
        vs = vs[..., 0].transpose(1, 0)
        z = jnp.zeros((), jnp.int32)
        li = jnp.int32(layer)
        idx5 = (li, slot, z, start_pos, z)
        idx4 = (li, slot, z, start_pos)
        return KVCache(
            jax.lax.dynamic_update_slice(self.k8, k8[None, None], idx5),
            jax.lax.dynamic_update_slice(self.v8, v8[None, None], idx5),
            jax.lax.dynamic_update_slice(self.k_scale, ks[None, None], idx4),
            jax.lax.dynamic_update_slice(self.v_scale, vs[None, None], idx4),
        )

    def layer(self, i: int):
        """(k8, v8, k_scale, v_scale) views for layer i."""
        return self.k8[i], self.v8[i], self.k_scale[i], self.v_scale[i]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Paged FP8 KV pool for long-context serving.

    Pages of ``page_size`` tokens live in one physical pool; each sequence
    owns a row of the page table mapping logical page → physical page.
    Reads gather pages back into a contiguous (S, KV, D) view per slot —
    XLA lowers the gather to dynamic slices over the pool.

    pool_k8/pool_v8: (P, page, KV, D) fp8; scales (P, page, KV) f32
    page_table: (slots, max_pages) int32 (physical page ids, -1 = unmapped)
    """

    pool_k8: jax.Array
    pool_v8: jax.Array
    pool_k_scale: jax.Array
    pool_v_scale: jax.Array
    page_table: jax.Array

    @staticmethod
    def create(n_pages: int, page_size: int, kv_heads: int, head_dim: int,
               n_slots: int, max_pages_per_seq: int,
               fmt: str = "e4m3") -> "PagedKVCache":
        dt = _FP8_DTYPES[fmt]
        return PagedKVCache(
            pool_k8=jnp.zeros((n_pages, page_size, kv_heads, head_dim), dt),
            pool_v8=jnp.zeros((n_pages, page_size, kv_heads, head_dim), dt),
            pool_k_scale=jnp.ones((n_pages, page_size, kv_heads),
                                  jnp.float32),
            pool_v_scale=jnp.ones((n_pages, page_size, kv_heads),
                                  jnp.float32),
            page_table=-jnp.ones((n_slots, max_pages_per_seq), jnp.int32),
        )

    @property
    def fmt(self) -> str:
        return {jnp.float8_e4m3fn: "e4m3", jnp.float8_e5m2: "e5m2",
                jnp.bfloat16: "bf16"}[jnp.dtype(self.pool_k8.dtype).type]

    @property
    def page_size(self) -> int:
        return self.pool_k8.shape[1]

    def assign_page(self, slot: jax.Array, logical_page: jax.Array,
                    physical_page: jax.Array) -> "PagedKVCache":
        return dataclasses.replace(
            self,
            page_table=self.page_table.at[slot, logical_page].set(
                physical_page))

    def write_token(self, slot: jax.Array, pos: jax.Array, k: jax.Array,
                    v: jax.Array) -> "PagedKVCache":
        """Append one token's (KV, D) k/v for a slot at position ``pos``."""
        k8, ks = quantize_kv(k, self.fmt)
        v8, vs = quantize_kv(v, self.fmt)
        page = self.page_table[slot, pos // self.page_size]
        off = pos % self.page_size
        return dataclasses.replace(
            self,
            pool_k8=self.pool_k8.at[page, off].set(k8),
            pool_v8=self.pool_v8.at[page, off].set(v8),
            pool_k_scale=self.pool_k_scale.at[page, off].set(ks[..., 0]),
            pool_v_scale=self.pool_v_scale.at[page, off].set(vs[..., 0]),
        )

    def gather_slot(self, slot: jax.Array) -> Tuple[jax.Array, jax.Array,
                                                    jax.Array, jax.Array]:
        """Materialize a contiguous fp8 (max_seq, KV, D) view of a slot's
        pages (still fp8 — no dequant)."""
        pages = self.page_table[slot]                    # (max_pages,)
        safe = jnp.maximum(pages, 0)
        k8 = self.pool_k8[safe].reshape(-1, *self.pool_k8.shape[2:])
        v8 = self.pool_v8[safe].reshape(-1, *self.pool_v8.shape[2:])
        ks = self.pool_k_scale[safe].reshape(-1, self.pool_k_scale.shape[2])
        vs = self.pool_v_scale[safe].reshape(-1, self.pool_v_scale.shape[2])
        return k8, v8, ks, vs
