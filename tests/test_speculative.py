"""Speculative decoding tests (serve/speculative.py).

The load-bearing property: greedy speculative decode emits EXACTLY the
same tokens as the plain decode loop — acceptance only changes how many
dispatches it took, never the text.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.models import tiny_config
from fp8tpu.serve import RingKVCache, ServeConfig, prefill, decode_step
from fp8tpu.serve.model import random_serve_params
from fp8tpu.serve.speculative import (
    SpecStats,
    draft_chunk,
    greedy_verify,
    rollback,
    sample_verify,
    score_tokens,
    speculative_decode,
)


def _mk(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2, d_ff=128,
        vocab=128, seq=96, seed=0, kv_fmt="e4m3"):
    cfg = tiny_config(n_layers=n_layers, d_model=d_model, n_heads=n_heads,
                      n_kv_heads=n_kv_heads, d_ff=d_ff, vocab_size=vocab,
                      max_seq_len=seq)
    params = random_serve_params(cfg, "e4m3", seed=seed)
    return cfg, params, ServeConfig(model=cfg, kv_fmt=kv_fmt)


def _plain_greedy(params, scfg, prompt, n_new, S):
    """Reference: prefill + n_new single-token decode steps, argmax."""
    mcfg = scfg.model
    ring = RingKVCache.create(mcfg.n_layers, 1, S, mcfg.n_kv_heads,
                              mcfg.head_dim, scfg.kv_fmt)
    ptoks = jnp.asarray(prompt, jnp.int32)
    logits, ring = prefill(params, ring, ptoks, jnp.int32(0),
                           jnp.asarray(len(prompt), jnp.int32), scfg)
    toks = [int(jnp.argmax(logits))]
    pos = len(prompt)
    while len(toks) < n_new:
        lg, ring = decode_step(params, ring,
                               jnp.asarray([toks[-1]], jnp.int32),
                               jnp.asarray([pos], jnp.int32), scfg)
        toks.append(int(jnp.argmax(lg[0])))
        pos += 1
    return toks


@pytest.fixture(scope="module")
def target():
    return _mk(seed=0)


@pytest.fixture(scope="module")
def draft():
    return _mk(n_layers=1, d_model=32, n_heads=2, n_kv_heads=2, d_ff=64,
               seed=1)


def test_score_tokens_matches_single_steps(target):
    """score_tokens over T tokens == T chained decode_steps: same logits
    (flash partials add exact zeros for masked in-block slots) and the
    same quantized ring rows."""
    cfg, params, scfg = target
    prompt = [3, 14, 15, 9, 2, 6]
    T = 5
    toks = [7, 21, 42, 77, 11]
    S = 64

    ring_a = RingKVCache.create(cfg.n_layers, 1, S, cfg.n_kv_heads,
                                cfg.head_dim, scfg.kv_fmt)
    _, ring_a = prefill(params, ring_a, jnp.asarray(prompt, jnp.int32),
                        jnp.int32(0), jnp.asarray(len(prompt), jnp.int32),
                        scfg)
    step_logits = []
    pos = len(prompt)
    for t in toks:
        lg, ring_a = decode_step(params, ring_a,
                                 jnp.asarray([t], jnp.int32),
                                 jnp.asarray([pos], jnp.int32), scfg)
        step_logits.append(np.asarray(lg[0]))
        pos += 1

    ring_b = RingKVCache.create(cfg.n_layers, 1, S, cfg.n_kv_heads,
                                cfg.head_dim, scfg.kv_fmt)
    _, ring_b = prefill(params, ring_b, jnp.asarray(prompt, jnp.int32),
                        jnp.int32(0), jnp.asarray(len(prompt), jnp.int32),
                        scfg)
    logits, ring_b = score_tokens(params, ring_b,
                                  jnp.asarray([toks], jnp.int32),
                                  jnp.asarray([len(prompt)], jnp.int32),
                                  scfg)
    logits = np.asarray(logits[0])

    for t in range(T):
        # XLA accumulates f32 dots in a shape-dependent order, so the
        # (B*T, Dm) and (B, Dm) paths differ by float noise; the greedy
        # contract is argmax agreement.
        np.testing.assert_allclose(logits[t], step_logits[t],
                                   rtol=0, atol=1e-2)
        assert int(np.argmax(logits[t])) == int(np.argmax(step_logits[t]))

    assert int(ring_a.head) == int(ring_b.head)
    # Cached K/V agree to within fp8 quantization of the float noise
    # (compare dequantized values, not payload bits).
    deq_a = (np.asarray(ring_a.kv8, np.float32)
             * np.asarray(ring_a.sc)[..., None])
    deq_b = (np.asarray(ring_b.kv8, np.float32)
             * np.asarray(ring_b.sc)[..., None])
    np.testing.assert_allclose(deq_a, deq_b, rtol=0.1, atol=5e-3)


def test_greedy_exact_vs_plain_decode(target, draft):
    cfg, params, scfg = target
    _, dparams, dscfg = draft
    prompt = [5, 9, 1, 30, 2]
    n_new = 24
    ref = _plain_greedy(params, scfg, prompt, n_new, S=96)
    out, stats = speculative_decode(params, dparams, prompt, n_new,
                                    scfg, dscfg, k_spec=4, max_seq=96)
    assert out == ref, (out, ref)
    assert stats.emitted >= n_new
    assert stats.rounds >= 1


def test_self_draft_accepts_everything(target):
    """Draft == target: every greedy draft must verify (score_tokens and
    the decode loop agree at argmax), so each round emits K+1 tokens."""
    cfg, params, scfg = target
    prompt = [2, 4, 8, 16]
    n_new = 20
    ref = _plain_greedy(params, scfg, prompt, n_new, S=96)
    out, stats = speculative_decode(params, params, prompt, n_new,
                                    scfg, scfg, k_spec=4, max_seq=96)
    assert out == ref
    assert stats.acceptance_rate == 1.0, stats
    assert stats.tokens_per_round == pytest.approx(5.0)


def test_rollback_restores_decode_state(target):
    """Score 4, roll back 2 → continuing must equal the path that only
    ever scored 2."""
    cfg, params, scfg = target
    prompt = [1, 2, 3]
    S = 64

    def fresh():
        ring = RingKVCache.create(cfg.n_layers, 1, S, cfg.n_kv_heads,
                                  cfg.head_dim, scfg.kv_fmt)
        _, ring = prefill(params, ring, jnp.asarray(prompt, jnp.int32),
                          jnp.int32(0),
                          jnp.asarray(len(prompt), jnp.int32), scfg)
        return ring

    ring = fresh()
    _, ring = score_tokens(params, ring,
                           jnp.asarray([[7, 8, 9, 10]], jnp.int32),
                           jnp.asarray([len(prompt)], jnp.int32), scfg)
    ring = rollback(ring, 2)
    lg_a, _ = decode_step(params, ring, jnp.asarray([42], jnp.int32),
                          jnp.asarray([len(prompt) + 2], jnp.int32), scfg)

    ring2 = fresh()
    _, ring2 = score_tokens(params, ring2,
                            jnp.asarray([[7, 8]], jnp.int32),
                            jnp.asarray([len(prompt)], jnp.int32), scfg)
    lg_b, _ = decode_step(params, ring2, jnp.asarray([42], jnp.int32),
                          jnp.asarray([len(prompt) + 2], jnp.int32), scfg)
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=1e-5, atol=1e-5)


def test_greedy_verify_counts():
    V = 16
    logits = np.full((1, 4, V), -10.0, np.float32)
    # target argmaxes: 3, 5, 7, 9
    for t, tok in enumerate([3, 5, 7, 9]):
        logits[0, t, tok] = 10.0
    # draft matches 2, then diverges
    a, bonus = greedy_verify(jnp.asarray(logits),
                             jnp.asarray([[3, 5, 0]], jnp.int32))
    assert int(a[0]) == 2 and int(bonus[0]) == 7
    # all match → bonus is the free K+1-th token
    a, bonus = greedy_verify(jnp.asarray(logits),
                             jnp.asarray([[3, 5, 7]], jnp.int32))
    assert int(a[0]) == 3 and int(bonus[0]) == 9
    # immediate mismatch
    a, bonus = greedy_verify(jnp.asarray(logits),
                             jnp.asarray([[4, 5, 7]], jnp.int32))
    assert int(a[0]) == 0 and int(bonus[0]) == 3


def test_sample_verify_marginal_matches_target():
    """Leviathan Thm 1: the emitted first token (accepted draft or the
    residual resample) is distributed as the TARGET p — checked
    empirically over a batch of independent trials."""
    V, N = 8, 40000
    rng = np.random.default_rng(3)
    p_logits = rng.standard_normal(V).astype(np.float32) * 1.5
    q_logits = rng.standard_normal(V).astype(np.float32) * 1.5
    p = np.exp(p_logits) / np.exp(p_logits).sum()
    q = np.exp(q_logits) / np.exp(q_logits).sum()

    key = jax.random.key(0)
    kd, kv = jax.random.split(key)
    draft = jax.random.categorical(
        kd, jnp.asarray(np.tile(q_logits, (N, 1))), axis=-1
    ).astype(jnp.int32)[:, None]                          # (N, 1) ~ q
    lp = jnp.asarray(np.tile(p_logits, (N, 2, 1)))        # (N, 2, V)
    lq = jnp.asarray(np.tile(q_logits, (N, 1, 1)))        # (N, 1, V)
    a, bonus = sample_verify(lp, lq, draft, kv,
                             jnp.ones((N,), jnp.float32))
    first = np.where(np.asarray(a) >= 1, np.asarray(draft[:, 0]),
                     np.asarray(bonus))
    hist = np.bincount(first, minlength=V) / N
    tv = 0.5 * np.abs(hist - p).sum()
    assert tv < 0.02, (tv, hist, p)
    # sanity: acceptance rate ≈ sum min(p, q)
    acc = float((np.asarray(a) >= 1).mean())
    assert acc == pytest.approx(np.minimum(p, q).sum(), abs=0.02)


def test_sampling_mode_runs_and_is_plausible(target, draft):
    cfg, params, scfg = target
    _, dparams, dscfg = draft
    out, stats = speculative_decode(params, dparams, [1, 2, 3], 12,
                                    scfg, dscfg, k_spec=3, max_seq=96,
                                    temperature=0.8,
                                    key=jax.random.key(5))
    assert len(out) == 12
    assert all(0 <= t < cfg.vocab_size for t in out)
    assert stats.rounds >= 12 // 4


def test_draft_chunk_tokens_match_logits(target):
    """draft_chunk's (token, logits) pairs must be consistent: each
    returned token re-samples from its own returned logits with the same
    per-step key."""
    cfg, params, scfg = target
    S = 64
    ring = RingKVCache.create(cfg.n_layers, 1, S, cfg.n_kv_heads,
                              cfg.head_dim, scfg.kv_fmt)
    _, ring = prefill(params, ring, jnp.asarray([1, 2, 3], jnp.int32),
                      jnp.int32(0), jnp.int32(3), scfg)
    key = jax.random.key(9)
    drafted, logits, _ = draft_chunk(
        params, ring, jnp.asarray([5], jnp.int32),
        jnp.asarray([3], jnp.int32), key,
        jnp.zeros((1,), jnp.float32), 4, scfg)
    # temperature 0 → tokens are the argmaxes of the returned logits
    np.testing.assert_array_equal(np.asarray(drafted[0]),
                                  np.argmax(np.asarray(logits[0]), -1))


def _paged_setup(target, prompts):
    """Map pages for len(prompts) slots and prefill each."""
    from fp8tpu.serve import PagedKVCache
    from fp8tpu.serve.model import prefill_paged

    cfg, params, scfg = target
    B = len(prompts)
    page, max_pages = 8, 8
    paged = PagedKVCache.create(B * max_pages, page, cfg.n_layers, B,
                                max_pages, cfg.n_kv_heads, cfg.head_dim,
                                scfg.kv_fmt)
    table = np.full((B, max_pages), -1, np.int32)
    for b in range(B):
        table[b] = np.arange(b * max_pages, (b + 1) * max_pages)
    import dataclasses
    paged = dataclasses.replace(paged, page_table=jnp.asarray(table))
    for b, prompt in enumerate(prompts):
        _, paged = prefill_paged(params, paged,
                                 jnp.asarray(prompt, jnp.int32),
                                 jnp.int32(b),
                                 jnp.asarray(len(prompt), jnp.int32),
                                 ServeConfig(model=cfg,
                                             kv_fmt=scfg.kv_fmt))
    return paged


def test_score_tokens_paged_matches_steps(target):
    """Paged scorer over T tokens == T chained paged decode steps, with
    DIFFERENT positions per slot."""
    from fp8tpu.serve.model import decode_step_paged
    from fp8tpu.serve.speculative import score_tokens_paged

    cfg, params, scfg = target
    prompts = [[3, 14, 15, 9, 2, 6], [7, 7, 1]]
    toks = np.asarray([[7, 21, 42, 77], [9, 33, 51, 2]], np.int32)
    T = toks.shape[1]
    pos0 = np.asarray([len(p) for p in prompts], np.int32)

    paged_a = _paged_setup(target, prompts)
    step_logits = []
    cur = jnp.asarray(toks[:, 0])
    for t in range(T):
        lg, paged_a = decode_step_paged(
            params, paged_a, jnp.asarray(toks[:, t]),
            jnp.asarray(pos0 + t), scfg)
        step_logits.append(np.asarray(lg))

    paged_b = _paged_setup(target, prompts)
    logits, paged_b = score_tokens_paged(params, paged_b,
                                         jnp.asarray(toks),
                                         jnp.asarray(pos0), scfg)
    logits = np.asarray(logits)
    for t in range(T):
        np.testing.assert_allclose(logits[:, t], step_logits[t],
                                   rtol=0, atol=1e-2)
        assert (np.argmax(logits[:, t], -1)
                == np.argmax(step_logits[t], -1)).all()
    # pools agree (dequantized)
    da = (np.asarray(paged_a.pool, np.float32)
          * np.asarray(paged_a.sc)[..., None])
    db = (np.asarray(paged_b.pool, np.float32)
          * np.asarray(paged_b.sc)[..., None])
    np.testing.assert_allclose(da, db, rtol=0.1, atol=5e-3)


def test_score_tokens_paged_variable_validity(target):
    """valid_t masks per-slot: a slot fed garbage beyond its valid count
    must produce the same valid-position logits and pool bytes as one
    fed only its valid tokens."""
    from fp8tpu.serve.speculative import score_tokens_paged

    cfg, params, scfg = target
    prompts = [[5, 9, 1], [5, 9, 1]]
    pos0 = jnp.asarray([3, 3], jnp.int32)

    paged1 = _paged_setup(target, prompts)
    lg1, paged1 = score_tokens_paged(
        params, paged1, jnp.asarray([[11, 22, 33], [44, 99, 99]]),
        pos0, scfg, valid_t=jnp.asarray([3, 1], jnp.int32))

    paged2 = _paged_setup(target, prompts)
    lg2, paged2 = score_tokens_paged(
        params, paged2, jnp.asarray([[11, 22, 33], [44, 44, 44]]),
        pos0, scfg, valid_t=jnp.asarray([3, 1], jnp.int32))

    # slot 1: only t=0 is valid; its logits must not depend on the
    # garbage tail, and positions 4.. of its pages must stay unwritten
    np.testing.assert_allclose(np.asarray(lg1[1, 0]),
                               np.asarray(lg2[1, 0]), rtol=0, atol=1e-5)
    p1 = np.asarray(paged1.pool, np.float32)
    p2 = np.asarray(paged2.pool, np.float32)
    np.testing.assert_array_equal(p1[8:16], p2[8:16])  # slot 1's pages
    # slot 0 (fully valid) matches across both runs
    np.testing.assert_allclose(np.asarray(lg1[0]), np.asarray(lg2[0]),
                               rtol=0, atol=1e-5)


def test_paged_variable_acceptance_no_rollback(target):
    """The batched-speculation primitive: two slots accept DIFFERENT
    counts from the same verify block; continuing each from its own
    accepted position matches an independent per-slot run."""
    from fp8tpu.serve.model import decode_step_paged
    from fp8tpu.serve.speculative import score_tokens_paged

    cfg, params, scfg = target
    prompts = [[2, 4, 8], [3, 5, 7]]
    pos0 = np.asarray([3, 3], np.int32)
    block = np.asarray([[10, 11, 12], [20, 21, 22]], np.int32)

    paged = _paged_setup(target, prompts)
    _, paged = score_tokens_paged(params, paged, jnp.asarray(block),
                                  jnp.asarray(pos0), scfg)
    # slot 0 accepts 3 (pos→6), slot 1 accepts 1 (pos→4): rejected rows
    # need NO rollback — continue decoding from per-slot positions,
    # feeding each slot its next token ([40, 41]); slot 1's next write
    # at position 4 overwrites its rejected row.
    new_pos = np.asarray([6, 4], np.int32)
    lg, paged = decode_step_paged(params, paged,
                                  jnp.asarray([40, 41], jnp.int32),
                                  jnp.asarray(new_pos), scfg)

    # ground truth per slot: independent caches that only ever saw the
    # accepted tokens
    paged0 = _paged_setup(target, [prompts[0]])
    _, paged0 = score_tokens_paged(params, paged0,
                                   jnp.asarray(block[:1]),
                                   jnp.asarray(pos0[:1]), scfg)
    lg0, _ = decode_step_paged(params, paged0,
                               jnp.asarray([40], jnp.int32),
                               jnp.asarray([6], jnp.int32), scfg)

    paged1 = _paged_setup(target, [prompts[1]])
    _, paged1 = score_tokens_paged(params, paged1,
                                   jnp.asarray(block[1:, :1]),
                                   jnp.asarray(pos0[1:]), scfg,
                                   valid_t=jnp.asarray([1], jnp.int32))
    lg1, _ = decode_step_paged(params, paged1,
                               jnp.asarray([41], jnp.int32),
                               jnp.asarray([4], jnp.int32), scfg)

    assert int(np.argmax(lg[0])) == int(np.argmax(lg0[0]))
    assert int(np.argmax(lg[1])) == int(np.argmax(lg1[0]))
    np.testing.assert_allclose(np.asarray(lg[0]), np.asarray(lg0[0]),
                               rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(lg[1]), np.asarray(lg1[0]),
                               rtol=0, atol=1e-2)


def test_prefill_chunked_paged_matches_single_shot(target):
    """Chunked long-prompt prefill == one-shot scored prefill: both
    attend to the quantized cache everywhere, so only accumulation
    order differs."""
    from fp8tpu.serve.model import decode_step_paged
    from fp8tpu.serve.speculative import (prefill_chunked_paged,
                                          score_tokens_paged)

    cfg, params, scfg = target
    prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9]

    # chunked: 5-token blocks from position 0
    paged_a = _paged_setup(target, [[0]])
    lg_a, paged_a = prefill_chunked_paged(params, paged_a, prompt, 0,
                                          scfg, chunk=5)

    paged_b = _paged_setup(target, [[0]])
    lg_b_all, paged_b = score_tokens_paged(
        params, paged_b, jnp.asarray([prompt], jnp.int32),
        jnp.asarray([0], jnp.int32), scfg)
    lg_b = lg_b_all[0, len(prompt) - 1]

    assert int(jnp.argmax(lg_a)) == int(jnp.argmax(lg_b))
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=0, atol=1e-2)
    # the caches agree too: continue one decode step from each
    nxt = jnp.asarray([int(jnp.argmax(lg_a))], jnp.int32)
    pos = jnp.asarray([len(prompt)], jnp.int32)
    sa, _ = decode_step_paged(params, paged_a, nxt, pos, scfg)
    sb, _ = decode_step_paged(params, paged_b, nxt, pos, scfg)
    assert int(np.argmax(sa[0])) == int(np.argmax(sb[0]))
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb),
                               rtol=0, atol=1e-2)


def test_prefill_chunked_resume_from_cached_prefix(target):
    """start= resumes from already-cached tokens: scoring only the tail
    gives the same logits as scoring the whole prompt."""
    from fp8tpu.serve.speculative import (prefill_chunked_paged,
                                          score_tokens_paged)

    cfg, params, scfg = target
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]

    paged_a = _paged_setup(target, [[0]])
    # cache the first 5 tokens, then resume
    _, paged_a = score_tokens_paged(
        params, paged_a, jnp.asarray([prompt[:5]], jnp.int32),
        jnp.asarray([0], jnp.int32), scfg)
    lg_a, _ = prefill_chunked_paged(params, paged_a, prompt, 0, scfg,
                                    chunk=4, start=5)

    paged_b = _paged_setup(target, [[0]])
    lg_b, _ = prefill_chunked_paged(params, paged_b, prompt, 0, scfg,
                                    chunk=4)
    assert int(jnp.argmax(lg_a)) == int(jnp.argmax(lg_b))
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=0, atol=1e-2)


def test_spec_stats():
    s = SpecStats(rounds=4, drafted=16, accepted=10, emitted=14)
    assert s.acceptance_rate == pytest.approx(10 / 16)
    assert s.tokens_per_round == pytest.approx(3.5)
