"""Chunked decode (staged k/v + one merge) vs step-by-step decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import RingKVCache, ServeConfig, convert_decoder_params
from fp8tpu.serve.model import decode_step, decode_steps, prefill


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=64)
    m = Decoder(cfg)
    variables = m.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))
    scfg = ServeConfig(model=cfg)
    sparams = convert_decoder_params(variables, cfg)
    return cfg, scfg, sparams


def _fresh(cfg, b=2):
    return RingKVCache.create(cfg.n_layers, b, 32, cfg.n_kv_heads,
                              cfg.head_dim, "e4m3")


def test_chunked_matches_stepwise_greedy(setup):
    cfg, scfg, sparams = setup
    B = 2
    prompt = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 12]], jnp.int32)

    # Path A: prefill both slots, then 6 stepwise decode_step calls.
    cache = _fresh(cfg, B)
    for b in range(B):
        _, cache = prefill(sparams, cache, jnp.pad(prompt[b], (0, 28)),
                           jnp.int32(b), jnp.int32(4), scfg)
    toks = jnp.asarray([3, 4], jnp.int32)
    pos = jnp.asarray([4, 4], jnp.int32)
    seq_a = []
    for _ in range(6):
        logits, cache = decode_step(sparams, cache, toks, pos, scfg)
        toks = jnp.argmax(logits, -1).astype(jnp.int32)
        seq_a.append(np.asarray(toks))
        pos = pos + 1

    # Path B: same prefills, one chunked decode_steps(6).
    cache = _fresh(cfg, B)
    for b in range(B):
        _, cache = prefill(sparams, cache, jnp.pad(prompt[b], (0, 28)),
                           jnp.int32(b), jnp.int32(4), scfg)
    toks_b, cache = decode_steps(
        sparams, cache, jnp.asarray([3, 4], jnp.int32),
        jnp.asarray([4, 4], jnp.int32), jax.random.key(0),
        jnp.zeros((B,), jnp.float32), 6, scfg)
    seq_b = np.asarray(toks_b)  # (B, 6)

    # Stepwise produces next-token at t+1 = argmax of logits at t;
    # chunked returns the sampled tokens directly.
    np.testing.assert_array_equal(np.stack(seq_a, 1), seq_b)


def test_chunked_cache_state_correct(setup):
    """After a chunk, continuing stepwise must equal an all-stepwise run
    (the merge wrote the staged k/v to the right positions)."""
    cfg, scfg, sparams = setup
    B = 2
    toks0 = jnp.asarray([3, 4], jnp.int32)
    pos0 = jnp.asarray([0, 0], jnp.int32)

    # All stepwise: 4 steps.
    cache = _fresh(cfg, B)
    toks, pos = toks0, pos0
    for _ in range(4):
        logits, cache = decode_step(sparams, cache, toks, pos, scfg)
        toks = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = pos + 1
    logits_ref, _ = decode_step(sparams, cache, toks, pos, scfg)

    # Chunked 4 then one stepwise.
    cache = _fresh(cfg, B)
    chunk_toks, cache = decode_steps(
        sparams, cache, toks0, pos0, jax.random.key(0),
        jnp.zeros((B,), jnp.float32), 4, scfg)
    toks2 = chunk_toks[:, -1]
    logits_chk, _ = decode_step(sparams, cache, toks2,
                                jnp.asarray([4, 4], jnp.int32), scfg)
    np.testing.assert_allclose(np.asarray(logits_ref),
                               np.asarray(logits_chk), rtol=2e-2,
                               atol=2e-2)
    assert (np.argmax(np.asarray(logits_ref), -1)
            == np.argmax(np.asarray(logits_chk), -1)).all()


def test_chunked_per_slot_positions(setup):
    """Slots at different positions must stay isolated in chunked mode."""
    cfg, scfg, sparams = setup
    B = 2
    cache = _fresh(cfg, B)
    _, cache = prefill(sparams, cache, jnp.pad(
        jnp.asarray([5, 6, 7], jnp.int32), (0, 29)), jnp.int32(0),
        jnp.int32(3), scfg)
    _, cache = prefill(sparams, cache, jnp.pad(
        jnp.asarray([20, 21, 22, 23, 24, 25], jnp.int32), (0, 26)),
        jnp.int32(1), jnp.int32(6), scfg)
    toks, cache = decode_steps(
        sparams, cache, jnp.asarray([1, 2], jnp.int32),
        jnp.asarray([3, 6], jnp.int32), jax.random.key(1),
        jnp.zeros((B,), jnp.float32), 4, scfg)
    assert np.asarray(toks).shape == (2, 4)
    assert np.isfinite(np.asarray(toks)).all()


def test_sideflush_matches_per_step(setup):
    """ring_flush=W (batched W-row slab flush + side-buffer attention)
    must reproduce the per-step-write decode's greedy stream."""
    import dataclasses
    from fp8tpu.serve.model import decode_steps as dsteps
    cfg, scfg, sparams = setup
    B = 2
    toks0 = jnp.asarray([3, 4], jnp.int32)
    pos0 = jnp.asarray([0, 0], jnp.int32)

    base = _fresh(cfg, B)
    t_ref, ring_ref = dsteps(sparams, base, toks0, pos0,
                             jax.random.key(0),
                             jnp.zeros((B,), jnp.float32), 8, scfg)

    sf = dataclasses.replace(scfg, ring_flush=4)
    t_sf, ring_sf = dsteps(sparams, _fresh(cfg, B), toks0, pos0,
                           jax.random.key(0),
                           jnp.zeros((B,), jnp.float32), 8, sf)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_sf))
    # identical tokens → identical quantized k/v rows in the ring
    np.testing.assert_array_equal(
        np.asarray(ring_ref.kv8, np.float32),
        np.asarray(ring_sf.kv8, np.float32))
    assert int(ring_sf.head) == int(ring_ref.head) == 8


def test_sideflush_prefill_then_decode(setup):
    """Prefill (head untouched) followed by side-flush decode stays
    consistent with the per-step path."""
    import dataclasses
    from fp8tpu.serve.model import decode_steps as dsteps, prefill as pf
    cfg, scfg, sparams = setup
    prompt = jnp.asarray([5, 6, 7, 8], jnp.int32)

    def run(sc):
        ring = _fresh(cfg, 2)
        _, ring = pf(sparams, ring, jnp.pad(prompt, (0, 28)),
                     jnp.int32(0), jnp.int32(4), sc)
        t, _ = dsteps(sparams, ring, jnp.asarray([3, 0], jnp.int32),
                      jnp.asarray([4, 0], jnp.int32), jax.random.key(0),
                      jnp.zeros((2,), jnp.float32), 8, sc)
        return np.asarray(t)

    np.testing.assert_array_equal(
        run(scfg), run(dataclasses.replace(scfg, ring_flush=4)))


def test_sideflush_rejects_misaligned_chunk(setup):
    import dataclasses
    import pytest
    from fp8tpu.serve.model import decode_steps as dsteps
    cfg, scfg, sparams = setup
    sf = dataclasses.replace(scfg, ring_flush=4)
    with pytest.raises(ValueError):
        dsteps(sparams, _fresh(cfg, 2), jnp.asarray([3, 4], jnp.int32),
               jnp.zeros((2,), jnp.int32), jax.random.key(0),
               jnp.zeros((2,), jnp.float32), 6, sf)
