"""Sparsity engine: magnitude top-k weight pruning + stochastic gradient
pruning (capability parity with mpemu/sparse_utils.py).

TPU-native changes:
* the stochastic-pruning threshold — the reference solves a lognormal
  survival equation with scipy.optimize.root_scalar on the host
  (sparse_utils.py:79-95) — is solved here by a jittable bisection in
  log-space (lax.fori_loop), so threshold refreshes stay on-device;
* thresholds and the step counter live in an explicit ``SparseState``
  pytree instead of mutable config attributes, so pruning composes with
  jit/scan/shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SparseConfig:
    """Which tensor streams to sparsify (sparse_utils.py:14-31)."""

    weight: bool = False
    ingrad: bool = False
    outgrad: bool = False
    wtgrad: bool = False
    weight_sparsity: float = 0.0     # target fraction of zeros
    outgrad_sparsity: float = 0.0
    alpha_window: int = 50           # threshold refresh period
    sample_factor: float = 0.1       # top-k threshold sampling fraction


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseState:
    """Carried thresholds (reference weight_alpha/outgrad_alpha)."""

    weight_alpha: jax.Array
    outgrad_alpha: jax.Array
    step: jax.Array

    @staticmethod
    def create() -> "SparseState":
        # The reference initializes alphas to fp16-max = prune nothing.
        return SparseState(weight_alpha=jnp.float32(65504.0),
                           outgrad_alpha=jnp.float32(65504.0),
                           step=jnp.int32(0))


def stochastic_prune(x: jax.Array, alpha, key: jax.Array) -> jax.Array:
    """Stochastic pruning (sparse_utils.py:72-78): values below the
    threshold are kept with probability |x|/α (rescaled to ±α) or zeroed —
    an unbiased sparsifier for gradients."""
    rand = alpha * jax.random.uniform(key, x.shape, jnp.float32)
    ax = jnp.abs(x.astype(jnp.float32))
    out = jnp.where(ax < alpha, alpha * jnp.sign(x), x.astype(jnp.float32))
    out = jnp.where(ax < rand, 0.0, out)
    return out.astype(x.dtype)


def _lognormal_survival_gap(log_alpha, sparsity, sigma):
    """equationStochastic (sparse_utils.py:115-121) with μ factored out:
    zero when pruning at α = exp(log_alpha + μ) hits ``sparsity``."""
    sqrt2 = jnp.sqrt(jnp.float32(2.0))
    a = jnp.exp(log_alpha)
    pt1 = jnp.exp(sigma ** 2 / 2) * jax.lax.erf(
        sigma / sqrt2 - log_alpha / (sqrt2 * sigma))
    pt2 = a * jax.lax.erf(log_alpha / (sqrt2 * sigma))
    pt3 = jnp.exp(sigma ** 2 / 2)
    return 0.5 - sparsity + (pt1 + pt2 - pt3) / (2 * a)


def stochastic_prune_threshold(x: jax.Array, sparsity: float,
                               iters: int = 50) -> jax.Array:
    """Solve for the stochastic-pruning threshold reaching ``sparsity``,
    assuming |x| of the nonzeros is lognormal (sparse_utils.py:79-95).
    Jittable log-space bisection over the reference's bracket [e⁻⁹, e⁵]."""
    ax = jnp.abs(x.astype(jnp.float32)).reshape(-1)
    nonzero = ax > 0
    n_nz = jnp.maximum(jnp.sum(nonzero), 1)
    existing_sp = 1.0 - n_nz / ax.size
    target = jnp.maximum(sparsity - existing_sp, 0.0)

    logs = jnp.where(nonzero, jnp.log(jnp.where(nonzero, ax, 1.0)), 0.0)
    mu = jnp.sum(logs) / n_nz
    var = jnp.sum(jnp.where(nonzero, (logs - mu) ** 2, 0.0)) / jnp.maximum(
        n_nz - 1, 1)
    sigma = jnp.sqrt(jnp.maximum(var, 1e-12))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) / 2
        # gap is increasing in alpha (−sparsity at α→0, →1−sparsity at
        # α→∞): gap > 0 means the root lies below mid.
        gap = _lognormal_survival_gap(mid, target, sigma)
        return jnp.where(gap > 0, lo, mid), jnp.where(gap > 0, mid, hi)

    lo, hi = jax.lax.fori_loop(
        0, iters, body, (jnp.float32(-9.0), jnp.float32(5.0)))
    alpha = jnp.exp((lo + hi) / 2 + mu)
    # No pruning needed → keep threshold at 0 (prunes nothing).
    return jnp.where(target > 0, alpha, 0.0)


def topk_prune(w: jax.Array, alpha) -> jax.Array:
    """Magnitude pruning against a threshold (Topk_Pruning,
    sparse_utils.py:97-102)."""
    return jnp.where(jnp.abs(w) < alpha, 0.0, w.astype(jnp.float32)).astype(
        w.dtype)


def topk_threshold_sampled(w: jax.Array, sparsity: float, key: jax.Array,
                           sample_factor: float = 0.1) -> jax.Array:
    """Sampled top-k magnitude threshold (Topk_Threshold_Sampled,
    sparse_utils.py:104-113): sample ~10% of entries, return the value at
    the (1-sparsity) quantile of the sample."""
    flat = jnp.abs(w.astype(jnp.float32)).reshape(-1)
    n = flat.shape[0]
    n_samp = max(1, int(n * sample_factor))
    idx = jax.random.randint(key, (n_samp,), 0, n)
    sampled = flat[idx]
    k = max(1, int(n_samp * (1.0 - sparsity)))
    top = jax.lax.top_k(sampled, k)[0]
    return top[k - 1]


def sparsify_weight(w: jax.Array, cfg: SparseConfig, state: SparseState,
                    key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Weight pruning with windowed threshold refresh
    (SparseConfig.sparsify_weight_tensor, sparse_utils.py:42-49).
    Returns (pruned weight, new alpha)."""
    refresh = (state.step != 0) & (state.step % cfg.alpha_window == 0)
    new_alpha = jnp.where(
        refresh,
        topk_threshold_sampled(w, cfg.weight_sparsity, key,
                               cfg.sample_factor),
        state.weight_alpha)
    return topk_prune(w, new_alpha), new_alpha


def sparsify_outgrad(g: jax.Array, cfg: SparseConfig, state: SparseState,
                     key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Output-gradient stochastic pruning with windowed threshold refresh
    (sparse_utils.py:36-41)."""
    refresh = (state.step != 0) & (state.step % cfg.alpha_window == 0)
    new_alpha = jnp.where(
        refresh,
        stochastic_prune_threshold(g, cfg.outgrad_sparsity),
        state.outgrad_alpha)
    return stochastic_prune(g, new_alpha, key), new_alpha


def sparsity_of(x: jax.Array) -> jax.Array:
    """Fraction of zeros (print_sparse_stats, sparse_utils.py:64-70)."""
    return 1.0 - jnp.count_nonzero(x) / x.size
