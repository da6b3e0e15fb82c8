"""Quantized KV cache (ring, contiguous-slot, and paged variants; fp8/int8/bf16 payloads).

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
    # int8 payload: same byte count as fp8 but 7 value bits after the
    # per-vector scale — measurably tighter KV accuracy (ACCURACY.json)
    # at identical decode bandwidth; scales factor out of the dots the
    # same way.
    "int8": jnp.int8,
    # bf16 "payload" mode: the unquantized baseline with identical cache
    # code structure (used by bench.py to compare fp8 vs bf16 honestly).
    "bf16": jnp.bfloat16,
}


def quantize_kv(x: jax.Array, fmt: str = "e4m3"):
    """Quantize (..., kv_heads, head_dim) vectors to fp8/int8 with one
    scale per head vector.  Returns (payload, scales f32 with trailing
    dim 1)."""
    if fmt == "bf16":
        scale = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
        return x.astype(jnp.bfloat16), scale
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if fmt == "int8":
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        payload = jnp.round(x.astype(jnp.float32) / scale)
        payload = jnp.clip(payload, -127, 127).astype(jnp.int8)
        return payload, scale.astype(jnp.float32)
    fdesc = FORMATS[fmt]
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
                jnp.int8: "int8", jnp.bfloat16: "bf16"}[jnp.dtype(self.kv8.dtype).type]

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
                jnp.int8: "int8", jnp.bfloat16: "bf16"}[jnp.dtype(self.k8.dtype).type]

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
    """Paged FP8 KV pool — the long-context serving cache.

    Pages of ``page_size`` tokens live in one physical pool shared by all
    slots; each slot owns a row of the page table mapping logical page →
    physical page.  Unlike the ring cache (per-slot sliding window of S),
    a slot's context grows to ``max_pages * page_size`` tokens, bounded by
    pool capacity, and pages are reclaimed on retirement — vLLM-style
    memory management, TPU-shaped (static shapes, gather by page id).

    Cost vs the ring: decode gathers the mapped pages into a contiguous
    snapshot ONCE PER CHUNK (the chunk's own tokens live in a small
    re-read side buffer — serve/model._steps_impl_paged), so the
    full-KV re-materialization amortizes across the chunk.  Measured at
    1B-class shapes the ring decodes ~1.27x faster (was 3.3x with a
    per-step gather; tools/bench_paged.py, PERF_EXTRAS.json "paged").
    The remaining premium buys context beyond the ring window and
    page-granular memory reclamation.

    Layouts keep the flattened (page_size*KV) axis second-minor so fp8's
    (32, 128) tile never pads (NOTES.md):

      pool (P, 2, L, page_size*KV, D)   fp8/bf16, k at index 0, v at 1
      sc   (P, 2, L, page_size*KV)      f32 per-head-vector scales
      page_table (B, max_pages)         int32 physical ids, -1 = unmapped
    """

    pool: jax.Array
    sc: jax.Array
    page_table: jax.Array
    kv_heads: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(n_pages: int, page_size: int, n_layers: int, n_slots: int,
               max_pages: int, kv_heads: int, head_dim: int,
               fmt: str = "e4m3") -> "PagedKVCache":
        dt = _FP8_DTYPES[fmt]
        r = page_size * kv_heads
        return PagedKVCache(
            pool=jnp.zeros((n_pages, 2, n_layers, r, head_dim), dt),
            sc=jnp.ones((n_pages, 2, n_layers, r), jnp.float32),
            page_table=-jnp.ones((n_slots, max_pages), jnp.int32),
            kv_heads=kv_heads,
        )

    @property
    def fmt(self) -> str:
        return {jnp.float8_e4m3fn: "e4m3", jnp.float8_e5m2: "e5m2",
                jnp.int8: "int8", jnp.bfloat16: "bf16"}[jnp.dtype(self.pool.dtype).type]

    @property
    def page_size(self) -> int:
        return self.pool.shape[3] // self.kv_heads

    @property
    def max_pages(self) -> int:
        return self.page_table.shape[1]

    @property
    def max_seq(self) -> int:
        return self.max_pages * self.page_size

    @property
    def n_slots(self) -> int:
        return self.page_table.shape[0]

    def assign_pages(self, slot, logical_pages, physical_pages
                     ) -> "PagedKVCache":
        """Map physical pages into a slot's table (host-side admission)."""
        return dataclasses.replace(
            self, page_table=self.page_table.at[slot, logical_pages].set(
                physical_pages))

    def free_slot(self, slot) -> "PagedKVCache":
        return dataclasses.replace(
            self, page_table=self.page_table.at[slot].set(-1))

    def write_step(self, fk8: jax.Array, fks: jax.Array, fv8: jax.Array,
                   fvs: jax.Array, pos: jax.Array) -> "PagedKVCache":
        """Scatter one decode step's fresh k/v for every slot.

        fk8/fv8: (L, B, KV, D) quantized payloads; fks/fvs: (L, B, KV);
        pos: (B,) each slot's write position.  Slot b's token lands in
        page ``page_table[b, pos_b // page]`` at row offset
        ``(pos_b % page) * KV``.
        """
        KV = self.kv_heads
        B = pos.shape[0]
        lp = jnp.minimum(pos // self.page_size, self.max_pages - 1)
        pg = jnp.take_along_axis(self.page_table, lp[:, None],
                                 axis=1)[:, 0]
        # Writes to unmapped pages or beyond max_seq are DROPPED via an
        # out-of-range page id — never redirected onto a live page (a
        # slot overrunning its allocation must not corrupt another's).
        n_pages = self.pool.shape[0]
        pg = jnp.where((pg >= 0) & (pos < self.max_seq), pg, n_pages)
        rows = (pos % self.page_size)[:, None] * KV + jnp.arange(KV)[None]
        # updates indexed (B, KV, L, D) / (B, KV, L)
        uk8 = fk8.transpose(1, 2, 0, 3)
        uv8 = fv8.transpose(1, 2, 0, 3)
        uks = fks.transpose(1, 2, 0)
        uvs = fvs.transpose(1, 2, 0)
        pool = self.pool
        sc = self.sc
        pool = pool.at[pg[:, None], 0, :, rows, :].set(
            uk8.astype(pool.dtype), mode="drop")
        pool = pool.at[pg[:, None], 1, :, rows, :].set(
            uv8.astype(pool.dtype), mode="drop")
        sc = sc.at[pg[:, None], 0, :, rows].set(uks, mode="drop")
        sc = sc.at[pg[:, None], 1, :, rows].set(uvs, mode="drop")
        return dataclasses.replace(self, pool=pool, sc=sc)

    def gather(self) -> Tuple[jax.Array, jax.Array]:
        """Materialize every slot's mapped pages as a contiguous view:
        returns (kv8 (B, MP, 2, L, page*KV, D), sc (B, MP, 2, L, page*KV)).
        This is the documented per-step gather cost of the paged path."""
        safe = jnp.maximum(self.page_table, 0)
        return self.pool[safe], self.sc[safe]
