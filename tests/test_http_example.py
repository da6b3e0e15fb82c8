"""End-to-end test of the stdlib HTTP serving endpoint (in-process)."""

import argparse
import importlib.util
import json
import os
import socket
import threading
import urllib.error
import urllib.request

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.fixture(scope="module")
def http_server():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "serve_http.py")
    spec = importlib.util.spec_from_file_location("serve_http_mod", path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    port = _free_port()
    args = argparse.Namespace(port=port, d_model=64, n_layers=2,
                              vocab=128, max_seq=96, slots=2,
                              weight_fmt="e4m3", kv_fmt="e4m3",
                              paged=False)
    srv, engine = m.build_server(args)
    from http.server import ThreadingHTTPServer
    from itertools import count
    httpd = ThreadingHTTPServer(("127.0.0.1", port),
                                m.make_handler(srv, engine, count()))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield port
    httpd.shutdown()
    srv.stop()


def _post(port, path, obj, timeout=180):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout).read()


def test_health_generate_stream_stats(http_server):
    port = http_server
    ok = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/health", timeout=10).read())
    assert ok == {"ok": True}

    out = json.loads(_post(port, "/generate",
                           {"prompt": [1, 2, 3], "max_new_tokens": 6}))
    assert len(out["tokens"]) == 6
    assert len(out["logprobs"]) == 5       # first token is admission's
    assert out["meta"]["n_tokens"] == 6

    raw = _post(port, "/generate", {"prompt": [4, 5],
                                    "max_new_tokens": 5, "stream": True})
    lines = [json.loads(l) for l in raw.splitlines()]
    toks = [l["token"] for l in lines[:-1]]
    assert toks == lines[-1]["tokens"]
    assert len(toks) == 5

    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stats", timeout=10).read())
    assert stats["n_slots"] == 2


def test_oversize_budget_is_400(http_server):
    port = http_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/generate", {"prompt": [1],
                                  "max_new_tokens": 100000}, timeout=60)
    assert e.value.code == 400
