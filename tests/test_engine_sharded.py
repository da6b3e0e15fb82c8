"""TP-sharded serving through the ENGINE on the 8-device CPU mesh.

decode/prefill jits see mesh-sharded fp8 payloads (SERVE_PARAM_RULES)
and GSPMD inserts the collectives; the scheduler is oblivious.  Outputs
must match the single-device engine exactly.
"""

import jax
import pytest

from fp8tpu.models import tiny_config
from fp8tpu.parallel import SERVE_PARAM_RULES, make_mesh, shard_tree
from fp8tpu.serve import Request, ServeConfig, ServingEngine
from fp8tpu.serve.model import random_serve_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=4,
                      d_ff=128, vocab_size=128, max_seq_len=96)
    return cfg, random_serve_params(cfg, "e4m3"), ServeConfig(model=cfg)


def _reqs(n=3):
    return [Request(uid=i, prompt=[2 + i, 7, 11], max_new_tokens=6)
            for i in range(n)]


def test_ring_engine_tp_sharded_matches_single_device(setup):
    cfg, params, scfg = setup
    ref = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        chunk_size=8).run(_reqs())
    mesh = make_mesh(data=2, model=4)
    sparams = jax.device_put(params,
                             shard_tree(params, mesh, SERVE_PARAM_RULES))
    with mesh:
        out = ServingEngine(sparams, scfg, n_slots=2, max_seq=96,
                            chunk_size=8).run(_reqs())
    assert out == ref


def test_spec_engine_tp_sharded_matches_plain(setup):
    cfg, params, scfg = setup
    ref = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        chunk_size=8, use_paged=True,
                        page_size=8).run(_reqs())
    mesh = make_mesh(model=8)
    sparams = jax.device_put(params,
                             shard_tree(params, mesh, SERVE_PARAM_RULES))
    with mesh:
        eng = ServingEngine(sparams, scfg, n_slots=2, max_seq=96,
                            use_paged=True, page_size=8,
                            draft_params=sparams, draft_cfg=scfg,
                            k_spec=3)
        out = eng.run(_reqs())
    assert out == ref
    assert eng.spec_accepted == eng.spec_drafted  # self-draft
