"""Profiling / tracing helpers.

Parity with the reference's instrumentation — RECORD_FUNCTION scopes
around engine calls (simple_gemm.cpp:47), NVTX ranges (main_amp.py:
385-418), wall-clock helpers — TPU-native: jax.profiler traces
(Perfetto/XProf) and named annotations that show up in the HLO timeline."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fp8tpu_trace"):
    """Capture a jax.profiler trace (view with XProf/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace scope (the RECORD_FUNCTION / NVTX analog)."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Wall-clock timer with explicit device sync (get_time analog,
    simple_gemm.cpp:31-43).  Dispatch is async through the runtime, so a
    host readback of a dependent value is forced before stopping."""

    def __init__(self):
        self.elapsed = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            np.asarray(jax.tree_util.tree_leaves(sync_on)[0]).sum()
        self.elapsed = time.perf_counter() - self._t0
        return self.elapsed


def benchmark(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Steady-state seconds/iteration: queue ``iters`` calls, sync once."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / iters
