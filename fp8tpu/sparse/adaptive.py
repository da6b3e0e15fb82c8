"""Adaptive sparsity: learned per-output-channel pruning thresholds.

Flax port of the reference's module_wrappers/adasparse.py: a
straight-through binary weight mask with the piecewise surrogate gradient
of WeightMaskStep (adasparse.py:17-32), learned thresholds per output
channel, and the degenerate-mask reset (if <1% of weights survive, the
threshold is treated as 0 for that step — functional here instead of the
reference's in-place parameter reset, adasparse.py:63-70).

Selected by ``pruning_algo='adaptive'`` in the training facade, mirroring
rewrite_model_with_adasparse_ops (mpt_emu.py:122-144).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@jax.custom_vjp
def weight_mask_step(x: jax.Array) -> jax.Array:
    """Heaviside forward; piecewise-window surrogate backward."""
    return (x > 0.0).astype(x.dtype)


def _wms_fwd(x):
    return weight_mask_step(x), x


def _wms_bwd(x, g):
    ax = jnp.abs(x)
    # adasparse.py:24-31: 2-4|x| near zero, 0.4 in the mid band, 0 outside.
    window = jnp.where(ax > 1.0, 0.0,
                       jnp.where(ax > 0.4, 0.4, 2.0 - 4.0 * ax))
    return (g * window,)


weight_mask_step.defvjp(_wms_fwd, _wms_bwd)


def _masked_weight(w: jax.Array, threshold: jax.Array,
                   channel_axis: int = 0) -> jax.Array:
    """Apply the learned-threshold mask; degenerate masks (<1% survivors)
    fall back to threshold 0 (adasparse.py:63-70)."""
    shape = [1] * w.ndim
    shape[channel_axis] = w.shape[channel_axis]
    th = threshold.reshape(shape)
    mask = weight_mask_step(jnp.abs(w) - th)
    ratio = jnp.sum(mask) / mask.size
    mask0 = weight_mask_step(jnp.abs(w))
    mask = jnp.where(ratio <= 0.01, mask0, mask)
    return w * mask


class SparseLinear(nn.Module):
    """Dense layer with learned-threshold weight sparsity
    (adasparse.py:34-82)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features))
        threshold = self.param("threshold", nn.initializers.zeros,
                               (self.features,))
        wm = _masked_weight(w, threshold, channel_axis=1)
        y = jnp.dot(x, wm)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


class SparseConv(nn.Module):
    """Conv layer with learned per-output-channel threshold sparsity
    (adasparse.py:84-161)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (*self.kernel_size, in_features, self.features))
        threshold = self.param("threshold", nn.initializers.zeros,
                               (self.features,))
        wm = _masked_weight(w, threshold, channel_axis=w.ndim - 1)
        y = jax.lax.conv_general_dilated(
            x, wm, window_strides=tuple(self.strides),
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y
