"""Engine API surface: token streaming and request cancellation."""

import jax
import jax.numpy as jnp
import pytest

from fp8tpu.models import tiny_config
from fp8tpu.serve import Request, ServeConfig, ServingEngine
from fp8tpu.serve.model import random_serve_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=96)
    return cfg, random_serve_params(cfg, "e4m3"), ServeConfig(model=cfg)


def _reqs(n=3, new=9):
    return [Request(uid=i, prompt=[2 + i, 7, 11], max_new_tokens=new)
            for i in range(n)]


def test_on_token_streams_everything_in_order(setup):
    cfg, params, scfg = setup
    streamed = {}

    def cb(uid, tok):
        streamed.setdefault(uid, []).append(tok)

    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96, chunk_size=8)
    out = eng.run(_reqs(), on_token=cb)
    assert streamed == out


def test_on_token_streams_in_spec_mode(setup):
    cfg, params, scfg = setup
    streamed = {}
    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        use_paged=True, page_size=8,
                        draft_params=params, draft_cfg=scfg, k_spec=3)
    out = eng.run(_reqs(), on_token=lambda u, t:
                  streamed.setdefault(u, []).append(t))
    assert streamed == out


def test_cancel_queued_request(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=1, max_seq=96, chunk_size=8)
    for r in _reqs(3):
        eng.submit(r)
    assert eng.cancel(2) is True          # still queued (1 slot)
    out = eng.run()
    assert out[2] == []
    assert len(out[0]) == 9 and len(out[1]) == 9


def test_cancel_active_slot_keeps_partial_tokens(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=1, max_seq=96, chunk_size=4)
    eng.submit(Request(uid=5, prompt=[1, 2, 3], max_new_tokens=64))
    eng.step()                            # admit + one 4-token chunk
    assert eng.slots[0] is not None
    got = len(eng.slots[0].tokens)
    assert got >= 1
    assert eng.cancel(5) is True
    assert eng.slots[0] is None
    out = eng.run()                       # drains; nothing else queued
    assert len(out[5]) == got             # partial result preserved


def test_cancel_unknown_uid(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=1, max_seq=96)
    assert eng.cancel(123) is False


def test_finished_logprobs_match_token_probabilities(setup):
    """Chunk-decoded tokens carry log P(token); greedy tokens must have
    the highest logprob in their step's distribution (<= 0 and finite),
    and lengths line up (first admission token has no logprob)."""
    import numpy as np

    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96, chunk_size=8)
    out = eng.run(_reqs(n=2, new=7))
    for uid, toks in out.items():
        lps = eng.finished_logprobs[uid]
        assert len(lps) == len(toks) - 1   # first token is admission's
        assert all(np.isfinite(lp) and lp <= 0.0 for lp in lps)


def test_finished_meta_lifecycle(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96, chunk_size=8)
    out = eng.run(_reqs(n=2, new=5))
    for uid in out:
        meta = eng.finished_meta[uid]
        assert meta["n_tokens"] == 5
        assert 0.0 <= meta["ttft_s"] <= meta["latency_s"]
