"""Calibration: one-pass jitted statistics sweep.

Replaces the reference's stateful observer submodules
(stats_collector.py: MinMaxStats 165-203, RunningMinMaxStats 206-264,
ChannleWiseMinMaxStats 307-341 [sic]) with a functional design: a stats
interceptor collects per-module activation statistics as *side outputs of
a jitted apply*, and batches are folded with pure merge rules.  One fused
device computation per batch; no Python per module, no mutable state.

Produces the qparams used by calibrated inference: FP8 scales
(flt_max / absmax) and INT8 (scale, zero_point) pairs
(qutils.py:429-445, 662-683).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fp8tpu.numerics.formats import FORMATS
from fp8tpu.numerics.integer import int_qparams
from .config import TensorQuantConfig
from .interceptor import make_quant_interceptor
from .policy import QuantPolicy


def collect_stats_fn(model: nn.Module, policy: Optional[QuantPolicy] = None,
                     method=None, per_channel: bool = False) -> Callable:
    """Build a jittable ``(variables, *args) -> (out, stats)`` function.

    If ``policy`` is given, activations are fake-quantized *while
    observing* — matching the reference's calibration passes, which run
    the hooked model in train mode over calibration batches
    (imagenet_test.py:201-205) so BN statistics adapt to quantized
    activations.
    """

    def run(variables, *args, **kwargs):
        sink: Dict[str, Dict[str, Any]] = {}
        interceptor = make_quant_interceptor(
            policy if policy is not None else _NULL_POLICY,
            stats_sink=sink,
            per_channel_stats=per_channel,
        )
        with nn.intercept_methods(interceptor):
            out = model.apply(variables, *args, method=method, **kwargs)
        stats = {
            path: {k: v for k, v in rec.items() if k != "kind"}
            for path, rec in sink.items()
        }
        return out, stats

    return run


class _NullPolicy:
    """Observe-only policy: resolves every module to None."""

    is_training = False

    def resolve(self, path, kind):
        return None


_NULL_POLICY = _NullPolicy()


def merge_stats(acc: Optional[Dict], new: Dict,
                mode: str = "minmax", momentum: float = 0.9) -> Dict:
    """Fold one batch of stats into the accumulator.

    ``minmax``  — global min/max over all batches (MinMaxStats).
    ``running`` — exponential running average of per-batch extrema
                  (RunningMinMaxStats, stats_collector.py:206-264).
    """
    if acc is None:
        return jax.tree.map(lambda x: x, new)
    out = {}
    for path, rec in new.items():
        if path not in acc:
            out[path] = rec
            continue
        a, merged = acc[path], {}
        for k, v in rec.items():
            if k not in a:
                merged[k] = v
            elif mode == "running":
                merged[k] = momentum * a[k] + (1 - momentum) * v
            elif k.endswith("_min"):
                merged[k] = jnp.minimum(a[k], v)
            else:
                merged[k] = jnp.maximum(a[k], v)
        out[path] = merged
    for path in acc:
        if path not in out:
            out[path] = acc[path]
    return out


def calibrate(
    model: nn.Module,
    variables,
    batches: Iterable,
    policy: Optional[QuantPolicy] = None,
    mode: str = "minmax",
    momentum: float = 0.9,
    method=None,
    per_channel: bool = False,
) -> Dict[str, Dict[str, jax.Array]]:
    """Run the calibration sweep over ``batches`` (each an args tuple or a
    single array) and return merged per-module stats.  ``per_channel``
    adds last-axis per-channel observers (ChannleWiseMinMaxStats,
    stats_collector.py:307-341)."""
    run = jax.jit(collect_stats_fn(model, policy, method=method,
                                   per_channel=per_channel))
    acc = None
    for batch in batches:
        args = batch if isinstance(batch, tuple) else (batch,)
        if any(hasattr(a, "size") and a.size == 0 for a in args):
            continue  # empty tail batch: nothing to observe
        _, stats = run(variables, *args)
        acc = merge_stats(acc, stats, mode=mode, momentum=momentum)
    if acc is None:
        raise ValueError("calibrate() received no non-empty batches")
    return jax.tree.map(lambda x: x, acc)


def fp8_scale_from_stats(stats_rec: Dict, cfg: TensorQuantConfig,
                         role: str = "iact") -> jax.Array:
    """Calibrated per-tensor scale: flt_max / observed absmax, with the
    reference's clamp (qutils.py:283-287)."""
    absmax = stats_rec[f"{role}_absmax"]
    fmt = FORMATS[cfg.dtype]
    scale = jnp.float32(fmt.max_normal) / jnp.maximum(absmax, 1e-30)
    # Same overshoot guard as numerics/scaling.py::_max_scale: the
    # reference clamps UP to 6.55e4, which for e5m2 can exceed the
    # range-exact scale and saturate/overflow finite values.
    return jnp.where(scale > 3.275e4, jnp.minimum(6.55e4, scale), scale)


def int_qparams_from_stats(stats_rec: Dict, bits: int = 8,
                           symmetric: bool = False, role: str = "iact"):
    """Calibrated INT qparams from observed min/max
    (set_qparams_for_modules_using_stats_info, qutils.py:662-683)."""
    return int_qparams(stats_rec[f"{role}_min"], stats_rec[f"{role}_max"],
                       bits=bits, symmetric=symmetric)


def qparams_from_stats(stats: Dict[str, Dict], policy: QuantPolicy,
                       module_table: Dict) -> Dict[str, Dict]:
    """Produce a {path: {role: scale}} dict for calibrated inference."""
    out: Dict[str, Dict] = {}
    for path, rec in stats.items():
        kind = module_table.get(path)
        cfg = policy.resolve(path, kind) if kind is not None else None
        if cfg is None:
            continue
        entry = {}
        for role in ("iact", "oact"):
            rcfg = cfg.role(role)
            if rcfg is None or f"{role}_absmax" not in rec:
                continue
            if rcfg.is_int:
                entry[role] = int_qparams_from_stats(rec, rcfg.bits,
                                                     role=role)
            else:
                entry[role] = fp8_scale_from_stats(rec, rcfg, role)
        if entry:
            out[path] = entry
    return out
