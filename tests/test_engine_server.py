"""Async serving front-end (EngineServer) tests."""

import threading

import pytest

from fp8tpu.models import tiny_config
from fp8tpu.serve import EngineServer, Request, ServeConfig, ServingEngine
from fp8tpu.serve.model import random_serve_params


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                      d_ff=128, vocab_size=128, max_seq_len=96)
    return cfg, random_serve_params(cfg, "e4m3"), ServeConfig(model=cfg)


def _req(uid, new=6):
    return Request(uid=uid, prompt=[2 + uid, 7, 11], max_new_tokens=new)


def test_async_results_match_batch_run(setup):
    cfg, params, scfg = setup
    ref = ServingEngine(params, scfg, n_slots=2, max_seq=96,
                        chunk_size=8).run([_req(i) for i in range(4)])

    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96, chunk_size=8)
    srv = EngineServer(eng).start()
    futs = {i: srv.submit(_req(i)) for i in range(4)}
    out = {i: f.result(timeout=120) for i, f in futs.items()}
    srv.stop()
    assert out == ref


def test_concurrent_submitters_and_streaming(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=2, max_seq=96, chunk_size=8)
    srv = EngineServer(eng).start()
    streamed = {}
    results = {}

    def client(uid):
        toks = []
        fut = srv.submit(_req(uid, new=5), on_token=toks.append)
        results[uid] = fut.result(timeout=120)
        streamed[uid] = toks

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    srv.stop()
    assert set(results) == set(range(5))
    for uid in results:
        assert streamed[uid] == results[uid]
        assert len(results[uid]) == 5


def test_submit_after_stop_raises(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=1, max_seq=96)
    srv = EngineServer(eng).start()
    srv.stop()
    with pytest.raises(RuntimeError):
        srv.submit(_req(0))


def test_invalid_request_fails_future(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=1, max_seq=96)
    srv = EngineServer(eng).start()
    fut = srv.submit(Request(uid=0, prompt=[1], max_new_tokens=10_000))
    with pytest.raises(ValueError, match="max_new_tokens"):
        fut.result(timeout=60)
    srv.stop()


def test_async_cancel_resolves_partial(setup):
    cfg, params, scfg = setup
    eng = ServingEngine(params, scfg, n_slots=1, max_seq=96, chunk_size=4)
    srv = EngineServer(eng).start()
    fut = srv.submit(_req(0, new=64))
    # let it make some progress, then cancel
    import time
    while not eng.finished and eng.slots[0] is None and not eng.queue:
        time.sleep(0.01)
    time.sleep(0.5)
    srv.cancel(0)
    toks = fut.result(timeout=120)
    srv.stop()
    assert 0 <= len(toks) <= 64
