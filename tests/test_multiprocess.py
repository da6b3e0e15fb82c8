"""Multi-host correctness scaffolding (VERDICT r1 §6): two OS processes,
4 virtual CPU devices each, joined via jax.distributed.initialize into
one 8-device (host=2, model=4) mesh running the shard_map TP q-matmul
pipeline and a cross-host psum.  This is the multi-process twin of the
single-process 8-device dryrun — it exercises the actual process
boundary (sharded global arrays, cross-process collectives) that the
≥85% multi-host scaling target will run over."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh():
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # the workers pick their own platform/device flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, out
