"""Multi-host correctness scaffolding (VERDICT r1 §6, r2 weak #10):
N OS processes, 4 virtual CPU devices each, joined via
jax.distributed.initialize into one (host=N, model=4) mesh running the
shard_map TP q-matmul pipeline and a cross-host psum.  This is the
multi-process twin of the single-process 8-device dryrun — it exercises
the actual process boundary (sharded global arrays, cross-process
collectives) that the ≥85% multi-host scaling target will run over.
"""

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


def _run_mesh(nproc: int):
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # the workers pick their own platform/device flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"proc {pid}: OK" in out, out


def test_two_process_mesh():
    _run_mesh(2)


def test_four_process_mesh():
    """4 hosts x 4 devices = 16-device (host=4, model=4) mesh — the DCN
    axis at the width the scaling projection models
    (tools/scaling_overlap.py)."""
    _run_mesh(4)
