"""Serving path tests: fp8 weights + fp8 KV cache + continuous batching.

Correctness anchor: the serving decoder's incremental (prefill + decode)
logits must agree with the emulation Decoder run full-sequence, up to
weight/KV quantization noise — and greedy generations must be internally
consistent between incremental and re-prefilled runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import (
    KVCache,
    PagedKVCache,
    RingKVCache,
    Request,
    ServeConfig,
    ServingEngine,
    convert_decoder_params,
    decode_step,
    prefill,
    quantize_kv,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64)
    m = Decoder(cfg)
    tokens = jnp.arange(16)[None] % cfg.vocab_size
    variables = m.init(jax.random.key(0), tokens)
    scfg = ServeConfig(model=cfg)
    sparams = convert_decoder_params(variables, cfg)
    return cfg, m, variables, scfg, sparams


def test_quantize_kv_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 3, (4, 8, 2, 16)).astype(np.float32))
    p, s = quantize_kv(x, "e4m3")
    assert p.dtype == jnp.float8_e4m3fn and s.shape == (4, 8, 2, 1)
    deq = p.astype(jnp.float32) * s
    rel = float(jnp.abs(deq - x).max() / jnp.abs(x).max())
    assert rel < 0.05


def test_convert_params_shapes(setup):
    cfg, _, variables, _, sparams = setup
    assert sparams["q8"].shape == (cfg.n_layers, cfg.d_model,
                                   cfg.n_heads * cfg.head_dim)
    assert sparams["q8"].dtype == jnp.float8_e4m3fn
    assert sparams["qs"].shape == (cfg.n_layers,
                                   cfg.n_heads * cfg.head_dim)
    assert sparams["embed"].dtype == jnp.bfloat16


def test_serving_logits_close_to_emulation(setup):
    cfg, m, variables, scfg, sparams = setup
    prompt = jnp.asarray([3, 14, 15, 92, 65, 35], jnp.int32)
    ref_logits = m.apply(variables, prompt[None])[0]  # (S, V)

    cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                               cfg.head_dim, "e4m3")
    logits, cache = prefill(sparams, cache, jnp.pad(prompt, (0, 26)),
                            jnp.int32(0), jnp.int32(len(prompt)), scfg)
    ref_last = np.asarray(ref_logits[-1])
    got = np.asarray(logits)
    # fp8 weights+cache: rankings at the top must broadly agree.
    assert np.argmax(got) == np.argmax(ref_last) or (
        np.argmax(ref_last) in np.argsort(got)[-3:])
    corr = np.corrcoef(got, ref_last)[0, 1]
    assert corr > 0.98, corr


def test_incremental_decode_matches_prefill(setup):
    """Decode t tokens one-by-one; the resulting logits must match a fresh
    prefill over the same full sequence (cache consistency)."""
    cfg, m, variables, scfg, sparams = setup
    prompt = jnp.asarray([3, 14, 15, 92], jnp.int32)
    extra = [65, 35, 89, 79]

    cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                               cfg.head_dim, "e4m3")
    logits, cache = prefill(sparams, cache, jnp.pad(prompt, (0, 28)),
                            jnp.int32(0), jnp.int32(4), scfg)
    pos = 4
    for t in extra:
        logits, cache = decode_step(sparams, cache,
                                    jnp.asarray([t], jnp.int32),
                                    jnp.asarray([pos], jnp.int32), scfg)
        pos += 1
    inc = np.asarray(logits[0])

    cache2 = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                                cfg.head_dim, "e4m3")
    full = jnp.asarray(list(prompt) + extra, jnp.int32)
    logits2, _ = prefill(sparams, cache2, jnp.pad(full, (0, 24)),
                         jnp.int32(0), jnp.int32(8), scfg)
    ref = np.asarray(logits2)
    # Prefill attention uses bf16 K/V while decode reads the fp8 cache —
    # allow quantization-level disagreement but demand strong agreement.
    corr = np.corrcoef(inc, ref)[0, 1]
    assert corr > 0.98, corr
    assert np.argmax(inc) == np.argmax(ref) or (
        np.argmax(ref) in np.argsort(inc)[-3:])


def test_engine_continuous_batching(setup):
    cfg, _, _, scfg, sparams = setup
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64)
    reqs = [Request(uid=i, prompt=[1 + i, 2 + i, 3 + i], max_new_tokens=5)
            for i in range(5)]  # more requests than slots
    out = eng.run(reqs)
    assert set(out) == {0, 1, 2, 3, 4}
    assert all(len(v) == 5 for v in out.values())
    assert all(0 <= t < cfg.vocab_size for v in out.values() for t in v)


def test_engine_greedy_deterministic(setup):
    cfg, _, _, scfg, sparams = setup
    out1 = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[5, 6, 7], max_new_tokens=6)])
    out2 = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[5, 6, 7], max_new_tokens=6)])
    assert out1[0] == out2[0]


def test_engine_batch_isolation(setup):
    """A request's output must not depend on what shares the batch."""
    cfg, _, _, scfg, sparams = setup
    solo = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[9, 8, 7], max_new_tokens=4)])
    paired = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[9, 8, 7], max_new_tokens=4),
         Request(uid=1, prompt=[1, 2, 3, 4, 5], max_new_tokens=4)])
    assert solo[0] == paired[0]


def test_sample_tokens_topk_topp(rng):
    """On-device sampling filters: top-k confines draws to the k best,
    top-k=1 and tiny top-p reduce to greedy, defaults reproduce plain
    categorical behavior."""
    from fp8tpu.serve.model import sample_tokens
    B, V = 4, 64
    logits = jnp.asarray(rng.standard_normal((B, V)) * 3, jnp.float32)
    temp = jnp.ones((B,), jnp.float32)
    greedy = np.asarray(jnp.argmax(logits, -1))

    # top_k=1 == greedy regardless of key
    t1 = sample_tokens(logits, jax.random.key(0), temp,
                       jnp.full((B,), 1, jnp.int32), None)
    np.testing.assert_array_equal(np.asarray(t1), greedy)

    # tiny top_p keeps only the argmax token
    tp = sample_tokens(logits, jax.random.key(1), temp, None,
                       jnp.full((B,), 1e-6, jnp.float32))
    np.testing.assert_array_equal(np.asarray(tp), greedy)

    # top_k=5: every draw lands in the per-row top-5 set
    top5 = np.asarray(jax.lax.top_k(logits, 5)[1])
    for i in range(20):
        t = np.asarray(sample_tokens(logits, jax.random.key(10 + i), temp,
                                     jnp.full((B,), 5, jnp.int32), None))
        for b in range(B):
            assert t[b] in top5[b]

    # temperature 0 forces greedy even with filters active
    t0 = sample_tokens(logits, jax.random.key(2),
                       jnp.zeros((B,), jnp.float32),
                       jnp.full((B,), 5, jnp.int32),
                       jnp.full((B,), 0.5, jnp.float32))
    np.testing.assert_array_equal(np.asarray(t0), greedy)


def test_engine_topk_sampling(setup):
    """Engine threads per-request top-k through the chunked decode."""
    cfg, _, _, scfg, sparams = setup
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64, seed=3)
    out = eng.run([Request(uid=0, prompt=[5, 6, 7], max_new_tokens=6,
                           temperature=1.0, top_k=4),
                   Request(uid=1, prompt=[8, 9], max_new_tokens=4,
                           temperature=0.8, top_p=0.9)])
    assert len(out[0]) == 6 and len(out[1]) == 4
    assert all(0 <= t < cfg.vocab_size for v in out.values() for t in v)


def test_int8_weight_serving(setup):
    """int8 (W8A16) weight payloads: quantizer round-trip and the decode
    path produce logits tracking the bf16-weight twin at least as
    tightly as fp8 weights (the v5e production recommendation)."""
    import dataclasses
    from fp8tpu.kernels.qmatmul import quantize_weights
    cfg, m, variables, scfg, _ = setup

    w = jnp.asarray(np.random.default_rng(0).standard_normal((32, 16)),
                    jnp.float32) * 0.3
    p8, s = quantize_weights(w, "int8")
    assert p8.dtype == jnp.int8
    deq = p8.astype(jnp.float32) * s
    assert float(jnp.abs(deq - w).max() / jnp.abs(w).max()) < 0.01

    prompt = jnp.asarray([3, 14, 15, 92], jnp.int32)

    def logits_with(fmt):
        sc = dataclasses.replace(scfg, weight_fmt=fmt)
        sp = convert_decoder_params(variables, cfg, fmt=fmt)
        cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                                   cfg.head_dim, "e4m3")
        out, _ = prefill(sp, cache, jnp.pad(prompt, (0, 28)),
                         jnp.int32(0), jnp.int32(4), sc)
        return np.asarray(out)

    ref = logits_with("bf16")
    e4 = logits_with("e4m3")
    i8 = logits_with("int8")
    assert np.isfinite(i8).all()
    err_e4 = np.abs(e4 - ref).mean()
    err_i8 = np.abs(i8 - ref).mean()
    assert err_i8 <= err_e4 * 1.1, (err_i8, err_e4)


def test_int8_kv_cache_decode(setup):
    """int8 KV (same bytes, 7 value bits) must run the decode path and
    track the bf16-cache logits at least as tightly as e4m3 KV."""
    cfg, m, variables, scfg, sparams = setup
    import dataclasses
    prompt = jnp.asarray([3, 14, 15, 92], jnp.int32)

    def logits_with(kv_fmt):
        sc = dataclasses.replace(scfg, kv_fmt=kv_fmt)
        cache = RingKVCache.create(cfg.n_layers, 1, 32, cfg.n_kv_heads,
                                   cfg.head_dim, kv_fmt)
        _, cache = prefill(sparams, cache, jnp.pad(prompt, (0, 28)),
                           jnp.int32(0), jnp.int32(4), sc)
        out, cache = decode_step(sparams, cache,
                                 jnp.asarray([7], jnp.int32),
                                 jnp.asarray([4], jnp.int32), sc)
        return np.asarray(out[0])

    ref = logits_with("bf16")
    e4 = logits_with("e4m3")
    i8 = logits_with("int8")
    err_e4 = np.abs(e4 - ref).mean()
    err_i8 = np.abs(i8 - ref).mean()
    assert np.isfinite(i8).all()
    assert err_i8 <= err_e4 * 1.1, (err_i8, err_e4)


def _paged_pool(cfg, n_slots=2, n_pages=16, page_size=8, max_pages=8):
    pc = PagedKVCache.create(n_pages, page_size, cfg.n_layers, n_slots,
                             max_pages, cfg.n_kv_heads, cfg.head_dim,
                             "e4m3")
    # identity page mapping: slot b gets pages [b*max_pages ...)
    for b in range(n_slots):
        pc = pc.assign_pages(b, jnp.arange(max_pages),
                             jnp.arange(max_pages) + b * max_pages)
    return pc


def test_paged_decode_matches_ring(setup):
    """Paged decode (gather + page-table attention) must produce the same
    greedy tokens as the ring path while context fits both."""
    from fp8tpu.serve.model import decode_steps, decode_steps_paged
    cfg, _, _, scfg, sparams = setup
    B = 2
    toks0 = jnp.asarray([3, 4], jnp.int32)
    pos0 = jnp.asarray([0, 0], jnp.int32)

    ring = RingKVCache.create(cfg.n_layers, B, 32, cfg.n_kv_heads,
                              cfg.head_dim, "e4m3")
    t_ring, _ = decode_steps(sparams, ring, toks0, pos0, jax.random.key(0),
                             jnp.zeros((B,), jnp.float32), 8, scfg)

    paged = _paged_pool(cfg)
    t_paged, _ = decode_steps_paged(sparams, paged, toks0, pos0,
                                    jax.random.key(0),
                                    jnp.zeros((B,), jnp.float32), 8, scfg)
    np.testing.assert_array_equal(np.asarray(t_ring), np.asarray(t_paged))


def test_paged_prefill_then_decode_consistent(setup):
    """Prefill into pages, decode incrementally; logits must match a fresh
    paged prefill over the full sequence (page writes land correctly)."""
    from fp8tpu.serve.model import decode_step_paged, prefill_paged
    cfg, _, _, scfg, sparams = setup
    prompt = jnp.asarray([3, 14, 15, 92], jnp.int32)
    extra = [65, 35, 89]

    pc = _paged_pool(cfg, n_slots=1)
    logits, pc = prefill_paged(sparams, pc, jnp.pad(prompt, (0, 12)),
                               jnp.int32(0), jnp.int32(4), scfg)
    pos = 4
    for t in extra:
        logits, pc = decode_step_paged(sparams, pc,
                                       jnp.asarray([t], jnp.int32),
                                       jnp.asarray([pos], jnp.int32), scfg)
        pos += 1
    inc = np.asarray(logits[0])

    pc2 = _paged_pool(cfg, n_slots=1)
    full = jnp.asarray(list(prompt) + extra, jnp.int32)
    logits2, _ = prefill_paged(sparams, pc2, jnp.pad(full, (0, 9)),
                               jnp.int32(0), jnp.int32(7), scfg)
    ref = np.asarray(logits2)
    corr = np.corrcoef(inc, ref)[0, 1]
    assert corr > 0.98, corr


def test_paged_long_context_beyond_ring(setup):
    """The paged pool must retain context LONGER than a ring of size S:
    decode after S+ tokens still attends to the earliest tokens (a ring
    would have slid past them).  VERDICT r1 §5."""
    from fp8tpu.serve.model import decode_step_paged, prefill_paged
    cfg, m, variables, scfg, sparams = setup
    S_ring = 16                           # hypothetical ring this beats
    total = 24                            # context longer than the ring
    prompt = jnp.asarray((np.arange(total) * 7 + 3) % cfg.vocab_size,
                         jnp.int32)

    pc = _paged_pool(cfg, n_slots=1, n_pages=8, page_size=8, max_pages=4)
    assert pc.max_seq == 32 > S_ring
    logits, pc = prefill_paged(sparams, pc, jnp.pad(prompt, (0, 8)),
                               jnp.int32(0), jnp.int32(total), scfg)
    # one decode step at pos=total: attention must span all 24 tokens
    logits, pc = decode_step_paged(
        sparams, pc, jnp.asarray([prompt[-1]], jnp.int32),
        jnp.asarray([total], jnp.int32), scfg)
    # reference: the emulation model over the full 25-token sequence
    seq = jnp.concatenate([prompt, prompt[-1:]])
    ref = np.asarray(m.apply(variables, seq[None])[0][-1])
    got = np.asarray(logits[0])
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.98, corr


def test_paged_overrun_writes_dropped(setup):
    """A slot decoding past its mapped pages (or max_seq) must NOT
    corrupt other slots' pages — overrun writes drop."""
    from fp8tpu.serve.model import decode_step_paged
    cfg, _, _, scfg, sparams = setup
    pc = _paged_pool(cfg, n_slots=2, n_pages=16, page_size=8, max_pages=2)
    # slot 1 only gets ONE page mapped (8 tokens); slot 0 gets two
    pc = dataclasses_replace_table(pc, 1, [-1])
    before = np.asarray(pc.pool, np.float32).copy()

    # slot 1 writes at pos 12 -> logical page 1 (unmapped); slot 0 at 3
    _, pc = decode_step_paged(sparams, pc,
                              jnp.asarray([5, 6], jnp.int32),
                              jnp.asarray([3, 12], jnp.int32), scfg)
    after = np.asarray(pc.pool, np.float32)
    # slot 0's page (physical 0) changed; slot 1's unmapped write vanished
    assert (after[0] != before[0]).any()
    # no page outside slot 0's mapping changed except via slot 0's write:
    # physical pages 2..15 belong to nobody else's pos-3 write
    for p in range(2, 16):
        np.testing.assert_array_equal(after[p], before[p])


def dataclasses_replace_table(pc, slot, unmap_logical):
    import dataclasses as _dc
    table = np.asarray(pc.page_table).copy()
    for lp in unmap_logical:
        table[slot, lp] = -1
    return _dc.replace(pc, page_table=jnp.asarray(table))


def test_engine_parking_mixed_budgets(setup):
    """A nearly-done request must not throttle the batch (VERDICT r2
    weak #3): chunks are sized to the LONGEST remaining budget; short
    requests park mid-chunk and still return exact budgets, and their
    outputs are unchanged by the co-batched long request."""
    cfg, _, _, scfg, sparams = setup
    solo = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[9, 8, 7], max_new_tokens=20)])
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64,
                        chunk_size=16)
    out = eng.run([Request(uid=0, prompt=[9, 8, 7], max_new_tokens=20),
                   Request(uid=1, prompt=[4, 5], max_new_tokens=2)])
    assert len(out[0]) == 20 and len(out[1]) == 2
    assert out[0] == solo[0]


def test_engine_slot_reuse_after_parking(setup):
    """A slot parked mid-chunk must be cleanly reusable: the refilled
    request's output equals its solo run (ring garbage from the parked
    generation is fully overwritten by the prefill window)."""
    cfg, _, _, scfg, sparams = setup
    solo = ServingEngine(sparams, scfg, n_slots=1, max_seq=64).run(
        [Request(uid=7, prompt=[11, 12, 13], max_new_tokens=6)])
    eng = ServingEngine(sparams, scfg, n_slots=1, max_seq=64,
                        chunk_size=16)
    out = eng.run([Request(uid=0, prompt=[1, 2], max_new_tokens=3),
                   Request(uid=7, prompt=[11, 12, 13], max_new_tokens=6)])
    assert out[7] == solo[7]
    assert len(out[0]) == 3


def test_engine_pipeline_depths_agree(setup):
    """Greedy outputs are identical at every pipeline depth (the depth
    changes reconciliation lag, never the decoded stream)."""
    cfg, _, _, scfg, sparams = setup
    reqs = lambda: [Request(uid=i, prompt=[1 + i, 2 + i],
                            max_new_tokens=7) for i in range(4)]
    outs = [ServingEngine(sparams, scfg, n_slots=2, max_seq=64,
                          chunk_size=4, depth=d).run(reqs())
            for d in (0, 1, 3)]
    assert outs[0] == outs[1] == outs[2]


def test_engine_batched_admission_matches_serial(setup):
    """Admitting N requests in one batched prefill must equal admitting
    them one-by-one (row independence of the dense forward)."""
    cfg, _, _, scfg, sparams = setup
    reqs = [Request(uid=0, prompt=[5, 6, 7], max_new_tokens=4),
            Request(uid=1, prompt=[8, 9], max_new_tokens=4),
            Request(uid=2, prompt=[10, 11, 12, 13], max_new_tokens=4)]
    batched = ServingEngine(sparams, scfg, n_slots=4, max_seq=64).run(
        [dataclasses_copy(r) for r in reqs])
    serial = ServingEngine(sparams, scfg, n_slots=1, max_seq=64).run(
        [dataclasses_copy(r) for r in reqs])
    assert batched == serial


def dataclasses_copy(r):
    import dataclasses as _dc
    return _dc.replace(r, prompt=list(r.prompt))


def test_sample_tokens_per_slot_filter_isolation(rng):
    """ADVICE r2 (medium): a plain temperature-sampling slot co-batched
    with a filtered slot must draw from the FULL vocabulary, not the
    candidate pool."""
    from fp8tpu.serve.model import sample_tokens
    B, V = 2, 256
    # row 0: sharply peaked OUTSIDE what a 64-pool would keep at high
    # temperature; make all logits equal so every token is equally likely
    logits = jnp.zeros((B, V), jnp.float32)
    temp = jnp.ones((B,), jnp.float32)
    top_k = jnp.asarray([0, 4], jnp.int32)       # slot 0 unfiltered
    top_p = jnp.asarray([1.0, 1.0], jnp.float32)
    seen = set()
    for i in range(64):
        t = np.asarray(sample_tokens(logits, jax.random.key(i), temp,
                                     top_k, top_p))
        seen.add(int(t[0]))
    # with uniform logits, an unfiltered slot must range far beyond any
    # 64-candidate pool; the pooled bug would cap draws to 64 values
    assert max(seen) >= 64, sorted(seen)[-5:]


def test_engine_paged_submit_guard(setup):
    """ADVICE r2: a request that can never admit (needs more pages than
    the whole pool) is rejected at submit, not spun on forever."""
    cfg, _, _, scfg, sparams = setup
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64,
                        use_paged=True, page_size=8, n_pages=3)
    with pytest.raises(ValueError):
        eng.submit(Request(uid=0, prompt=[1] * 30, max_new_tokens=30))


def test_engine_paged_mode(setup):
    """Continuous batching over the page pool: admission maps pages,
    retirement frees them, outputs match the ring engine's."""
    cfg, _, _, scfg, sparams = setup
    ring_out = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(
        [Request(uid=0, prompt=[5, 6, 7], max_new_tokens=6)])
    eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=64,
                        use_paged=True, page_size=8, n_pages=24)
    paged_out = eng.run(
        [Request(uid=0, prompt=[5, 6, 7], max_new_tokens=6),
         Request(uid=1, prompt=[9, 8, 7, 6], max_new_tokens=5)])
    assert paged_out[0] == ring_out[0]
    assert len(paged_out[1]) == 5
    # all pages returned to the free pool after retirement
    assert len(eng.free_pages) == 24


def test_engine_sideflush_matches_plain(setup):
    """The engine with batched ring writes (ring_flush) reproduces the
    plain engine's greedy outputs (chunks round up to the flush width)."""
    import dataclasses
    cfg, _, _, scfg, sparams = setup
    reqs = lambda: [Request(uid=i, prompt=[2 + i, 3 + i],
                            max_new_tokens=6) for i in range(3)]
    plain = ServingEngine(sparams, scfg, n_slots=2, max_seq=64).run(reqs())
    sf_cfg = dataclasses.replace(scfg, ring_flush=4)
    sf = ServingEngine(sparams, sf_cfg, n_slots=2, max_seq=64,
                       chunk_size=8).run(reqs())
    assert plain == sf


def test_paged_deferred_writes_match_eager(setup):
    """"side" (deferred chunk-end pool write) must be bit-identical to
    "side-eager" (the r4 per-step pool scatter) in both the decoded
    tokens and the resulting pool state: within a chunk the side buffer
    covers the fresh tokens, so WHEN the pool is written cannot be
    observable."""
    import dataclasses
    from fp8tpu.serve.model import decode_steps_paged
    cfg, _, _, scfg, sparams = setup
    B = 2
    toks0 = jnp.asarray([3, 4], jnp.int32)
    pos0 = jnp.asarray([5, 2], jnp.int32)   # unaligned per-slot positions

    outs = {}
    for impl in ("side", "side-eager"):
        sc = dataclasses.replace(scfg, paged_decode_impl=impl)
        paged = _paged_pool(cfg)
        toks, paged = decode_steps_paged(
            sparams, paged, toks0, pos0, jax.random.key(0),
            jnp.zeros((B,), jnp.float32), 8, sc)
        # second chunk consumes the pool the first chunk wrote
        toks2, paged = decode_steps_paged(
            sparams, paged, toks[:, -1], pos0 + 8, jax.random.key(1),
            jnp.zeros((B,), jnp.float32), 4, sc)
        outs[impl] = (np.asarray(toks), np.asarray(toks2),
                      np.asarray(paged.pool), np.asarray(paged.sc))
    for a, b in zip(outs["side"], outs["side-eager"]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("impl", ["kernel", "ringview"])
def test_paged_impl_matches_side(setup, impl):
    """Every alternative paged-attention impl — "kernel" (Pallas
    in-kernel page-table walk, no snapshot; interpret mode on CPU) and
    "ringview" (snapshot gathered into the ring layout, literal ring
    einsum) — must produce the same greedy tokens and pool state as
    "side"."""
    import dataclasses
    from fp8tpu.serve.model import decode_steps_paged
    cfg, _, _, scfg, sparams = setup
    B = 2
    toks0 = jnp.asarray([3, 4], jnp.int32)
    pos0 = jnp.asarray([5, 2], jnp.int32)

    outs = {}
    for impl in ("side", impl):
        sc = dataclasses.replace(scfg, paged_decode_impl=impl)
        paged = _paged_pool(cfg)
        toks, paged = decode_steps_paged(
            sparams, paged, toks0, pos0, jax.random.key(0),
            jnp.zeros((B,), jnp.float32), 8, sc)
        toks2, paged = decode_steps_paged(
            sparams, paged, toks[:, -1], pos0 + 8, jax.random.key(1),
            jnp.zeros((B,), jnp.float32), 4, sc)
        outs[impl] = (np.asarray(toks), np.asarray(toks2),
                      np.asarray(paged.pool).astype(np.float32),
                      np.asarray(paged.sc))
    # greedy tokens must agree exactly; pool payloads may differ by the
    # 1-ulp accumulation-order flips any cross-path comparison carries
    # (NOTES r3 "Measurement note") — the kernel's in-register bf16 dots
    # order reductions differently than the snapshot einsum.
    alt = [k for k in outs if k != "side"][0]
    np.testing.assert_array_equal(outs["side"][0], outs[alt][0])
    np.testing.assert_array_equal(outs["side"][1], outs[alt][1])
    a, b = outs["side"][2], outs[alt][2]
    frac = (a != b).mean()
    # payloads are amax-scaled e4m3 (row amax ≈ 448 payload units), so a
    # 1-ulp flip is ≤ ~4% of the row range; bound the worst payload
    # difference by 5% of the format max and the flip rate by 1%
    assert frac < 0.01 and np.abs(a - b).max() <= 0.05 * 448, (
        frac, np.abs(a - b).max())
    np.testing.assert_allclose(outs["side"][3], outs[alt][3],
                               rtol=2e-2)
