"""ScaleShift: BatchNorm folded to a per-channel affine.

Equivalent of the reference's mpemu/scale_shift.py: before PTQ, BatchNorm
layers become ``y = x * scale + shift`` with scale/shift folded from the
trained BN statistics (scale_shift.py:36-62), making the normalization a
quantizable affine op.

In Flax, modules are code and statistics are data, so "replacing" BN is a
parameter transform plus a module-mode switch: model code uses
:class:`SwitchableNorm` (BatchNorm in training, ScaleShift after folding)
and :func:`fold_batchnorm` rewrites the variables collection.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


class ScaleShift(nn.Module):
    """y = x * scale + shift, per channel (scale_shift.py:12-34)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        shift = self.param("shift", nn.initializers.zeros, (self.features,))
        return x * scale + shift


class SwitchableNorm(nn.Module):
    """BatchNorm that can be folded into a ScaleShift affine.

    ``mode='bn'``: standard BatchNorm (running stats in ``batch_stats``).
    ``mode='scale_shift'``: applies the folded affine from params written
    by :func:`fold_batchnorm`.
    """

    features: int
    mode: str = "bn"
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        if self.mode == "scale_shift":
            return ScaleShift(self.features, name="ss")(x)
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum, epsilon=self.epsilon, name="bn",
        )(x)


def fold_bn_stats(gamma, beta, mean, var, eps: float = 1e-5):
    """scale = γ/√(σ²+ε), shift = β − μ·scale (scale_shift.py:36-62)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * scale
    return scale, shift


def fold_batchnorm(variables: Dict[str, Any], eps: float = 1e-5):
    """Rewrite a variables collection, folding every SwitchableNorm's BN
    params + batch_stats into ScaleShift params
    (replace_batchnorms_with_scaleshifts, scale_shift.py:64-73).

    Returns new variables for the model instantiated with
    ``norm_mode='scale_shift'`` (batch_stats dropped).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p, s):
        out = {}
        for name, sub in p.items():
            if isinstance(sub, dict) and "bn" in sub and isinstance(
                    sub["bn"], dict) and "scale" in sub["bn"]:
                bn_p = sub["bn"]
                bn_s = s[name]["bn"]
                scale, shift = fold_bn_stats(
                    bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"],
                    eps)
                out[name] = {"ss": {"scale": scale, "shift": shift}}
            elif isinstance(sub, dict):
                out[name] = walk(sub, s.get(name, {}) if isinstance(s, dict)
                                 else {})
            else:
                out[name] = sub
        return out

    new_params = walk(params, stats)
    return {"params": new_params}
