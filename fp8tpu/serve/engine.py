"""Continuous-batching serving engine.

Single-host scheduler around the fused :func:`decode_step`: a fixed pool
of batch slots, each with its own sequence position; new requests prefill
into free slots (prompt lengths bucketed to bound recompiles) while
decode continues for the rest — the standard TPU continuous-batching
shape (static shapes, per-slot masks).  The reference has no serving
path at all; this is the north-star component (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import PagedKVCache, RingKVCache
from .model import (ServeConfig, decode_step, decode_steps,
                    decode_steps_paged, prefill, prefill_paged)


@dataclasses.dataclass
class Request:
    uid: int
    prompt: List[int]
    max_new_tokens: int = 32
    temperature: float = 0.0     # 0 → greedy
    top_k: int = 0               # 0 → disabled
    top_p: float = 1.0           # >= 1 → disabled
    eos_id: Optional[int] = None


@dataclasses.dataclass
class _SlotState:
    uid: int
    pos: int                     # next write position
    remaining: int
    temperature: float
    top_k: int
    top_p: float
    eos_id: Optional[int]
    tokens: List[int]            # generated tokens


def _bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class ServingEngine:
    """Continuous batching over ``n_slots`` concurrent sequences."""

    def __init__(self, params: Dict, cfg: ServeConfig, n_slots: int = 8,
                 max_seq: Optional[int] = None, seed: int = 0,
                 chunk_size: int = 32, use_paged: bool = False,
                 page_size: int = 64, n_pages: Optional[int] = None):
        m = cfg.model
        self.params = params
        self.cfg = cfg
        self.n_slots = n_slots
        self.max_seq = max_seq or m.max_seq_len
        # Steps decoded per dispatch (on-device sampling); host re-enters
        # between chunks for admission / EOS retirement.  The host round
        # trip is ~30 ms on a tunneled chip — large chunks amortize it.
        self.chunk_size = chunk_size
        # Ring (throughput, per-slot sliding window of max_seq) or paged
        # pool (long context: each slot holds up to max_seq tokens exactly,
        # memory allocated page-wise, reclaimed on retirement).
        self.use_paged = use_paged
        if use_paged:
            max_pages = -(-self.max_seq // page_size)
            if n_pages is None:
                n_pages = n_slots * max_pages
            self.cache = PagedKVCache.create(
                n_pages, page_size, m.n_layers, n_slots, max_pages,
                m.n_kv_heads, m.head_dim, cfg.kv_fmt)
            self.free_pages: List[int] = list(range(n_pages))
            self._slot_pages: List[List[int]] = [[] for _ in range(n_slots)]
            # page table lives host-side; one small transfer per dispatch
            # (a device .at[] per admission/retirement costs a full
            # host<->device round trip each — measured ~2.5x engine
            # slowdown on the tunneled chip)
            self._table = np.asarray(self.cache.page_table).copy()
            self._table_dirty = False
        else:
            self.cache = RingKVCache.create(m.n_layers, n_slots,
                                            self.max_seq, m.n_kv_heads,
                                            m.head_dim, cfg.kv_fmt)
        self.slots: List[Optional[_SlotState]] = [None] * n_slots
        self.queue: List[Request] = []
        self.finished: Dict[int, List[int]] = {}
        self.key = jax.random.key(seed)
        self._tokens = np.zeros((n_slots,), np.int32)
        self._positions = np.zeros((n_slots,), np.int32)

    # -- public API ------------------------------------------------------
    def submit(self, req: Request):
        self.queue.append(req)

    def run(self, requests: Optional[List[Request]] = None,
            max_steps: int = 10 ** 6) -> Dict[int, List[int]]:
        for r in requests or ():
            self.submit(r)
        steps = 0
        while (self.queue or any(self.slots)) and steps < max_steps:
            self.step()
            steps += 1
        out, self.finished = self.finished, {}
        return out

    # -- scheduler -------------------------------------------------------
    def _chunk_len(self) -> int:
        active = [(i, s) for i, s in enumerate(self.slots) if s is not None]
        # The ring cache wraps: context beyond max_seq slides (per-slot
        # window), so only the generation budget bounds the chunk.  Paged
        # slots are additionally bounded by their mapped capacity.
        budget = min(s.remaining for _, s in active)
        if self.use_paged:
            cap = min(len(self._slot_pages[i]) * self.cache.page_size
                      - s.pos for i, s in active)
            budget = min(budget, max(cap, 1))
        # Bucket to powers of two so only a few n_steps programs compile.
        chunk = 1
        while chunk * 2 <= min(budget, self.chunk_size):
            chunk *= 2
        return max(chunk, 1)

    def _retire(self, i: int):
        st = self.slots[i]
        self.finished[st.uid] = st.tokens
        self.slots[i] = None
        if self.use_paged:
            self.free_pages.extend(self._slot_pages[i])
            self._slot_pages[i] = []
            self._table[i] = -1
            self._table_dirty = True

    def _sync_table(self):
        if self.use_paged and self._table_dirty:
            import dataclasses as _dc
            self.cache = _dc.replace(self.cache,
                                     page_table=jnp.asarray(self._table))
            self._table_dirty = False

    def step(self):
        self._admit()
        if not any(self.slots):
            return
        chunk = self._chunk_len()
        temps = jnp.asarray([
            self.slots[i].temperature if self.slots[i] else 0.0
            for i in range(self.n_slots)], jnp.float32)
        # Only engage the top-k/top-p filter program when some active
        # request asked for it (keeps the plain path's compilation).
        tks = [self.slots[i].top_k if self.slots[i] else 0
               for i in range(self.n_slots)]
        tps = [self.slots[i].top_p if self.slots[i] else 1.0
               for i in range(self.n_slots)]
        filtering = any(k > 0 for k in tks) or any(p < 1.0 for p in tps)
        top_k = jnp.asarray(tks, jnp.int32) if filtering else None
        top_p = jnp.asarray(tps, jnp.float32) if filtering else None
        self.key, sub = jax.random.split(self.key)
        self._sync_table()
        decode = decode_steps_paged if self.use_paged else decode_steps
        toks, self.cache = decode(
            self.params, self.cache, jnp.asarray(self._tokens),
            jnp.asarray(self._positions), sub, temps, chunk, self.cfg,
            top_k=top_k, top_p=top_p)
        toks = np.asarray(toks)                     # (B, chunk)
        for i, st in enumerate(self.slots):
            if st is None:
                continue
            for j in range(chunk):
                tok = int(toks[i, j])
                st.tokens.append(tok)
                st.pos += 1
                st.remaining -= 1
                if (st.remaining <= 0 or st.pos >= self.max_seq - 1
                        or (st.eos_id is not None and tok == st.eos_id)):
                    self._retire(i)
                    break
            if self.slots[i] is not None:
                self._tokens[i] = int(toks[i, chunk - 1])
                self._positions[i] = self.slots[i].pos

    def _admit(self):
        for i in range(self.n_slots):
            if self.slots[i] is not None or not self.queue:
                continue
            req = self.queue[0]
            prompt = req.prompt[-(self.max_seq - req.max_new_tokens - 1):]
            if not prompt:
                prompt = [0]     # empty prompt: decode from a BOS-like 0
            if self.use_paged:
                # Map enough pages for prompt + generation budget up front;
                # stay queued if the pool can't satisfy it yet.
                need_tokens = min(len(prompt) + req.max_new_tokens + 1,
                                  self.max_seq)
                psz = self.cache.page_size
                need = -(-need_tokens // psz)
                if len(self.free_pages) < need:
                    continue
                pages = [self.free_pages.pop() for _ in range(need)]
                self._slot_pages[i] = pages
                self._table[i] = -1
                self._table[i, :need] = pages
                self._table_dirty = True
            self.queue.pop(0)
            bucket = min(_bucket(len(prompt)), self.max_seq)
            padded = np.zeros((bucket,), np.int32)
            padded[:len(prompt)] = prompt
            self._sync_table()
            do_prefill = prefill_paged if self.use_paged else prefill
            logits, self.cache = do_prefill(
                self.params, self.cache, jnp.asarray(padded),
                jnp.int32(i), jnp.int32(len(prompt)), self.cfg)
            first = self._sample_first(logits, req)
            self.slots[i] = _SlotState(
                uid=req.uid, pos=len(prompt), remaining=req.max_new_tokens,
                temperature=req.temperature, top_k=req.top_k,
                top_p=req.top_p, eos_id=req.eos_id, tokens=[int(first)])
            self._tokens[i] = int(first)
            self._positions[i] = len(prompt)
            # First sampled token counts toward the budget.
            self.slots[i].remaining -= 1
            if self.slots[i].remaining <= 0:
                self._retire(i)

    def _sample_first(self, logits: jax.Array, req: Request) -> int:
        """Sample the admitted request's first token with ITS sampling
        params (the chunked decode handles subsequent tokens)."""
        from .model import sample_tokens
        self.key, sub = jax.random.split(self.key)
        filtering = req.top_k > 0 or req.top_p < 1.0
        tok = sample_tokens(
            logits[None], sub,
            jnp.asarray([req.temperature], jnp.float32),
            jnp.asarray([req.top_k], jnp.int32) if filtering else None,
            jnp.asarray([req.top_p], jnp.float32) if filtering else None)
        return int(np.asarray(tok)[0])
