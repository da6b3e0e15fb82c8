"""Shared-prefix page caching in the paged serving engine.

vLLM-style content-addressed prompt pages: N requests with a common
system prompt hold ONE physical copy of its fully-covered pages.
Correctness bar: outputs identical to the uncached engine (shared pages
carry byte-identical KV — the prefill forward is deterministic).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import Request, ServeConfig, ServingEngine, \
    convert_decoder_params

PSZ = 8  # page size: small so tests exercise multi-page prompts


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=96)
    model = Decoder(cfg)
    variables = model.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))
    params = convert_decoder_params(variables, cfg)
    return cfg, params, ServeConfig(model=cfg)


def _engine(params, scfg, prefix_cache, n_slots=2, n_pages=None,
            max_seq=96):
    return ServingEngine(params, scfg, n_slots=n_slots, max_seq=max_seq,
                         chunk_size=8, use_paged=True, page_size=PSZ,
                         n_pages=n_pages, prefix_cache=prefix_cache)


SYS = list(range(1, 1 + 2 * PSZ))        # 2 full pages of system prompt


def _reqs(n=3, new=6):
    return [Request(uid=i, prompt=SYS + [40 + i, 41 + i],
                    max_new_tokens=new) for i in range(n)]


def test_outputs_identical_with_and_without_cache(setup):
    cfg, params, scfg = setup
    out_ref = _engine(params, scfg, prefix_cache=False).run(_reqs())
    out_pc = _engine(params, scfg, prefix_cache=True).run(_reqs())
    assert out_pc == out_ref


def test_pages_are_physically_shared(setup):
    cfg, params, scfg = setup
    eng = _engine(params, scfg, prefix_cache=True, n_slots=1)
    eng.submit(Request(uid=0, prompt=SYS + [40], max_new_tokens=4))
    eng._admit()
    first_pages = list(eng._slot_pages[0][:2])
    assert len(first_pages) == 2
    while eng.slots[0] is not None or eng.queue:
        eng.step()
    assert len(eng._prefix_index) == 2       # both full pages registered
    eng.submit(Request(uid=1, prompt=SYS + [77], max_new_tokens=4))
    eng._admit()
    # the second request's first two table entries ARE the cached pages
    assert list(eng._slot_pages[0][:2]) == first_pages
    assert (eng._page_ref[first_pages] == 1).all()
    while eng.slots[0] is not None or eng.queue or eng._inflight:
        eng.step()
    assert 1 in eng.finished


def test_capacity_win_under_page_pressure(setup):
    """A pool sized so two requests only fit concurrently when the
    2-page prefix is shared: the cached engine admits both at once,
    and still matches the uncached outputs."""
    cfg, params, scfg = setup
    # per request: 2 prefix pages + ceil((2+new+1)/8)=1 page = 3 pages.
    # pool of 5: private needs 6 (serializes); shared needs 2+1+1 = 4.
    reqs = [Request(uid=i, prompt=SYS + [50 + i], max_new_tokens=4)
            for i in range(2)]
    ref = _engine(params, scfg, prefix_cache=False, n_pages=6).run(
        [Request(**vars(r)) for r in reqs])

    eng = _engine(params, scfg, prefix_cache=True, n_pages=5)
    for r in reqs:
        eng.submit(Request(**vars(r)))
    eng._admit()
    # prime the cache: only the first admits cold (nothing cached yet)
    assert sum(s is not None for s in eng.slots) >= 1
    out = eng.run()
    assert out == ref

    # warm cache: now BOTH admit in one shot within 5 pages
    eng2 = eng
    for r in reqs:
        eng2.submit(Request(uid=10 + r.uid, prompt=list(r.prompt),
                            max_new_tokens=4))
    eng2._admit()
    assert sum(s is not None for s in eng2.slots) == 2
    out2 = eng2.run()
    assert [out2[10 + r.uid] for r in reqs] == [ref[r.uid] for r in reqs]


def test_eviction_frees_cold_pages_not_held_ones(setup):
    cfg, params, scfg = setup
    # pool of exactly one request's worth: B can only admit by evicting
    # A's cold cached pages
    eng = _engine(params, scfg, prefix_cache=True, n_slots=1, n_pages=3)
    # occupy the cache with prefix A (2 pages), retire
    a = list(range(1, 1 + 2 * PSZ))
    eng.run([Request(uid=0, prompt=a + [3], max_new_tokens=4)])
    assert len(eng._prefix_index) == 2
    # a different 2-page prefix B needs eviction of A's cold pages
    b = list(range(60, 60 + 2 * PSZ))
    out_b = eng.run([Request(uid=1, prompt=b + [3], max_new_tokens=4)])
    assert len(out_b[1]) == 4              # B completed despite eviction
    keys = list(eng._prefix_index)
    assert all(k[0] == 60 for k in keys)   # A evicted, B cached


def test_active_holder_blocks_eviction(setup):
    cfg, params, scfg = setup
    eng = _engine(params, scfg, prefix_cache=True, n_slots=2, n_pages=6)
    a = list(range(1, 1 + 2 * PSZ))
    # slot 0 active and holding the cached pages (big budget, not run)
    eng.submit(Request(uid=0, prompt=a + [3], max_new_tokens=8))
    eng._admit()
    held = list(eng._slot_pages[0][:2])
    assert (eng._page_ref[held] == 1).all()
    # a second large request wants 3 pages; only 3 remain free, so no
    # eviction pressure on held pages; shrink pool pressure by a third
    # request that cannot evict held pages
    eng.submit(Request(uid=1, prompt=list(range(60, 60 + 2 * PSZ)) + [3],
                       max_new_tokens=8))
    eng._admit()
    # both admitted; held pages never reallocated
    pages1 = eng._slot_pages[1]
    assert not set(held) & set(pages1)
    out = eng.run()
    assert set(out) == {0, 1}


def _reuse_engine(params, scfg, n_slots=2, n_pages=None):
    return ServingEngine(params, scfg, n_slots=n_slots, max_seq=96,
                         chunk_size=8, use_paged=True, page_size=PSZ,
                         n_pages=n_pages, prefix_cache=True,
                         prefix_compute_reuse=True)


def test_compute_reuse_warm_equals_cold(setup):
    """Scored admission is position-consistent: a request admitted
    against cached prefix pages produces EXACTLY the tokens it would
    have produced admitted cold (the cached KV bytes equal what its own
    scoring would have written)."""
    cfg, params, scfg = setup
    req = Request(uid=7, prompt=SYS + [40, 41], max_new_tokens=6)

    cold = _reuse_engine(params, scfg)
    out_cold = cold.run([Request(**vars(req))])
    assert cold.prefix_tokens_reused == 0

    warm = _reuse_engine(params, scfg)
    warm.run([Request(uid=0, prompt=SYS + [90], max_new_tokens=4)])
    out_warm = warm.run([Request(**vars(req))])
    assert warm.prefix_tokens_reused == 2 * PSZ   # both SYS pages skipped
    assert out_warm[7] == out_cold[7]


def test_compute_reuse_greedy_close_to_dense_prefill(setup):
    """The scored path attends to the QUANTIZED prompt KV (like decode)
    where dense prefill uses fresh bf16 — greedy outputs still agree at
    these shapes."""
    cfg, params, scfg = setup
    ref = _engine(params, scfg, prefix_cache=False).run(_reqs(n=2))
    out = _reuse_engine(params, scfg).run(_reqs(n=2))
    assert out == ref


def test_compute_reuse_counter_accumulates(setup):
    cfg, params, scfg = setup
    eng = _reuse_engine(params, scfg, n_slots=1)
    for k in range(3):
        eng.run([Request(uid=k, prompt=SYS + [30 + k],
                         max_new_tokens=4)])
    # requests 1 and 2 each reuse the 2 SYS pages
    assert eng.prefix_tokens_reused == 2 * 2 * PSZ


def test_ring_engine_rejects_nothing_and_ignores_flag(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        use_paged=False, prefix_cache=True)
    assert eng.prefix_cache is False
    out = eng.run([Request(uid=0, prompt=[1, 2, 3], max_new_tokens=4)])
    assert set(out) == {0}
