"""Batched speculation under continuous batching (paged engine).

The correctness bar mirrors test_speculative: greedy outputs must be
IDENTICAL to the plain paged engine's — speculation may only change
how many dispatches the tokens took.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fp8tpu.models import Decoder, tiny_config
from fp8tpu.serve import Request, ServeConfig, ServingEngine, \
    convert_decoder_params
from fp8tpu.serve.model import random_serve_params


def _mk(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2, d_ff=128,
        vocab=128, seq=96, seed=0):
    cfg = tiny_config(n_layers=n_layers, d_model=d_model, n_heads=n_heads,
                      n_kv_heads=n_kv_heads, d_ff=d_ff, vocab_size=vocab,
                      max_seq_len=seq)
    params = random_serve_params(cfg, "e4m3", seed=seed)
    return cfg, params, ServeConfig(model=cfg)


@pytest.fixture(scope="module")
def target():
    return _mk(seed=0)


@pytest.fixture(scope="module")
def draft():
    return _mk(n_layers=1, d_model=32, n_heads=2, n_kv_heads=2, d_ff=64,
               seed=1)


def _reqs(n=3, new=10, temp=0.0):
    return [Request(uid=i, prompt=[2 + i, 7, 11, 5 + i],
                    max_new_tokens=new, temperature=temp)
            for i in range(n)]


def _plain_engine(target):
    cfg, params, scfg = target
    return ServingEngine(params, scfg, n_slots=2, max_seq=96,
                         chunk_size=8, use_paged=True, page_size=8)


def _spec_engine(target, draft, k=4):
    cfg, params, scfg = target
    _, dparams, dscfg = draft
    return ServingEngine(params, scfg, n_slots=2, max_seq=96,
                         chunk_size=8, use_paged=True, page_size=8,
                         draft_params=dparams, draft_cfg=dscfg, k_spec=k)


def test_greedy_spec_engine_matches_plain_engine(target, draft):
    ref = _plain_engine(target).run(_reqs())
    out = _spec_engine(target, draft).run(_reqs())
    assert out == ref


def test_self_draft_engine_full_acceptance(target):
    """Draft == target: every block verifies, so rounds emit K+1 and
    acceptance is 100% while outputs still match the plain engine."""
    ref = _plain_engine(target).run(_reqs())
    cfg, params, scfg = target
    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        chunk_size=8, use_paged=True, page_size=8,
                        draft_params=params, draft_cfg=scfg, k_spec=4)
    out = eng.run(_reqs())
    assert out == ref
    assert eng.spec_accepted == eng.spec_drafted > 0


def test_budget_respected_with_offsize_rounds(target, draft):
    """max_new_tokens not a multiple of K+1: the engine truncates at
    the budget exactly."""
    out = _spec_engine(target, draft, k=4).run(_reqs(n=2, new=3))
    assert all(len(v) == 3 for v in out.values())
    ref = _plain_engine(target).run(_reqs(n=2, new=3))
    assert out == ref


def test_more_requests_than_slots_cycle_through(target, draft):
    out = _spec_engine(target, draft).run(_reqs(n=5, new=6))
    ref = _plain_engine(target).run(_reqs(n=5, new=6))
    assert out == ref
    assert set(out) == set(range(5))


def test_long_budget_matches_plain_to_window_edge(target, draft):
    """A budget running close to the window: the spec engine must emit
    exactly the plain engine's tokens all the way (no early truncation
    — the verify-block reserve is taken from the prompt trim, not from
    the emission bound)."""
    rs = [Request(uid=0, prompt=[2, 7, 11, 5], max_new_tokens=80)]
    ref = _plain_engine(target).run([Request(**vars(r)) for r in rs])
    out = _spec_engine(target, draft).run([Request(**vars(r)) for r in rs])
    assert len(ref[0]) == 80
    assert out == ref


def test_temperature_sampling_runs(target, draft):
    cfg, _, _ = target
    out = _spec_engine(target, draft).run(_reqs(n=2, new=8, temp=0.9))
    assert all(len(v) == 8 for v in out.values())
    assert all(0 <= t < cfg.vocab_size for v in out.values() for t in v)


def test_topk1_spec_equals_greedy(target, draft):
    """top_k=1 at temperature>0 forces argmax: the filtered spec engine
    must emit exactly the greedy plain engine's tokens (the same
    per-slot filter is applied to target and draft laws, so rejection
    sampling follows the filtered target law)."""
    ref = _plain_engine(target).run(_reqs(n=2, new=8))
    rs = [Request(uid=i, prompt=[2 + i, 7, 11, 5 + i], max_new_tokens=8,
                  temperature=0.9, top_k=1) for i in range(2)]
    out = _spec_engine(target, draft).run(rs)
    assert out == ref


def test_topp_tiny_spec_equals_greedy(target, draft):
    """top_p below the argmax probability keeps only the argmax."""
    ref = _plain_engine(target).run(_reqs(n=2, new=6))
    rs = [Request(uid=i, prompt=[2 + i, 7, 11, 5 + i], max_new_tokens=6,
                  temperature=0.7, top_p=1e-6) for i in range(2)]
    out = _spec_engine(target, draft).run(rs)
    assert out == ref


def test_topk_sampling_smoke_in_spec_mode(target, draft):
    cfg, _, _ = target
    rs = [Request(uid=i, prompt=[2 + i, 7], max_new_tokens=8,
                  temperature=0.8, top_k=5) for i in range(2)]
    out = _spec_engine(target, draft).run(rs)
    assert all(len(v) == 8 for v in out.values())
    assert all(0 <= t < cfg.vocab_size for v in out.values() for t in v)


def _spec_engine_rpd(target, draft, rpd, k=4):
    cfg, params, scfg = target
    _, dparams, dscfg = draft
    return ServingEngine(params, scfg, n_slots=2, max_seq=96,
                         chunk_size=8, use_paged=True, page_size=8,
                         draft_params=dparams, draft_cfg=dscfg, k_spec=k,
                         spec_rounds_per_dispatch=rpd)


@pytest.mark.parametrize("rpd", [2, 3])
def test_multiround_spec_matches_plain(target, draft, rpd):
    """spec_rounds_per_dispatch chains R rounds in one dispatch; greedy
    outputs must still match the plain engine token-for-token."""
    ref = _plain_engine(target).run(_reqs())
    out = _spec_engine_rpd(target, draft, rpd).run(_reqs())
    assert out == ref


def test_multiround_budget_and_cycling(target, draft):
    out = _spec_engine_rpd(target, draft, 2).run(_reqs(n=5, new=7))
    ref = _plain_engine(target).run(_reqs(n=5, new=7))
    assert out == ref


def test_multiround_window_edge(target, draft):
    """Long budget with multi-round dispatches: the R*(K+1) reserve must
    keep every verify write inside the window (no early truncation)."""
    rs = [Request(uid=0, prompt=[2, 7, 11, 5], max_new_tokens=60)]
    ref = _plain_engine(target).run([Request(**vars(r)) for r in rs])
    out = _spec_engine_rpd(target, draft, 2).run(
        [Request(**vars(r)) for r in rs])
    assert len(ref[0]) == 60
    assert out == ref


def test_moe_target_speculation_matches_plain(target, draft):
    """Speculation through the MoE FFN branch: the paged scorer routes
    every decode path's FFN through the shared block."""
    import jax.numpy as jnp
    from fp8tpu.models import Decoder
    from fp8tpu.serve import convert_decoder_params

    mcfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                       d_ff=128, vocab_size=128, max_seq_len=96,
                       n_experts=4)
    model = Decoder(mcfg)
    variables = model.init(jax.random.key(0), jnp.ones((1, 8), jnp.int32))
    params = convert_decoder_params(variables, mcfg)
    scfg = ServeConfig(model=mcfg)
    _, dparams, dscfg = draft

    ref = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        use_paged=True, page_size=8).run(_reqs(n=2, new=8))
    out = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        use_paged=True, page_size=8,
                        draft_params=dparams, draft_cfg=dscfg,
                        k_spec=3).run(_reqs(n=2, new=8))
    assert out == ref
