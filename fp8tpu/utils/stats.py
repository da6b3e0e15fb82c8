"""Tensor telemetry: windowed statistics as jitted side outputs.

Replaces the reference's TensorBoard hook telemetry (qutils.py:543-547,
569-578, 611-614; windowing e5m2_emu.py:205-219): instead of Python hooks
emitting histograms per module per step, statistics are pure functions of
tensors returned as side outputs of the jitted step and logged on the
host at window boundaries."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def tensor_stats(x: jax.Array) -> Dict[str, jax.Array]:
    """absmax/absmin/mean/std of one tensor (the reference logs abs-max,
    abs-min and a histogram per role)."""
    ax = jnp.abs(x.astype(jnp.float32))
    nz = jnp.where(ax > 0, ax, jnp.inf)
    return {
        "absmax": jnp.max(ax),
        "absmin_nonzero": jnp.min(nz),
        "mean": jnp.mean(x.astype(jnp.float32)),
        "std": jnp.std(x.astype(jnp.float32)),
    }


def log2_histogram(x: jax.Array, lo: int = -40, hi: int = 40) -> jax.Array:
    """Exponent histogram: counts per power-of-two bucket of |x| — the
    most useful view for choosing FP8 formats/scales (bins [2^lo, 2^hi))."""
    ax = jnp.abs(x.astype(jnp.float32)).reshape(-1)
    exp = jnp.floor(jnp.log2(jnp.where(ax > 0, ax, 1.0)))
    exp = jnp.clip(exp, lo, hi - 1).astype(jnp.int32) - lo
    exp = jnp.where(ax > 0, exp, -1)  # zeros bucketed separately at -1
    hist = jnp.zeros((hi - lo + 1,), jnp.int32).at[exp + 1].add(1)
    return hist  # index 0 = zeros, then [2^lo .. 2^hi)


def tree_stats(tree) -> Dict[str, Dict[str, jax.Array]]:
    """Per-leaf stats over a pytree (params / grads)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for kp, leaf in flat:
        if not jnp.issubdtype(getattr(leaf, "dtype", None), jnp.floating):
            continue
        name = "/".join(str(getattr(k, "key", k)) for k in kp)
        out[name] = tensor_stats(leaf)
    return out


def stats_window_enabled(step: int, window: int = 1000,
                         width: int = 1) -> bool:
    """True for ``width`` steps at every ``window`` boundary — the
    reference toggles tensor stats for one step every 1000
    (e5m2_emu.py:205-219)."""
    return (step % window) < width
