"""Additional vision families from the reference's sweep surface.

The reference's launch.py iterates 12 torchvision architectures
(examples/inference/classifier/launch.py:14-80) — beyond ResNets, the
structurally distinct ones are the plain-conv VGG stack and the
depthwise-separable MobileNet.  Both are expressed here with
:class:`SwitchableNorm` so the PTQ recipe's BN→ScaleShift fold applies,
and with the same exempt conventions (first conv + classifier head).

MobileNet's depthwise convolutions (feature_group_count = channels)
deliberately exercise the hw-patched path's geometry guard: the engine
handles dense convs; grouped ones fall back to XLA's native lowering
(quant/hw_patch.conv_patchable), exactly as the reference's C-model
falls back for groups != 1 (cmodel/simple.py:98-103).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from fp8tpu.ops.scale_shift import SwitchableNorm

# The reference exempts the first conv + classifier for every
# architecture (imagenet_test.py:24-71).
VGG_EXEMPT: Tuple[str, ...] = ("features_0", "classifier")
MOBILENET_EXEMPT: Tuple[str, ...] = ("conv_stem", "classifier")


@dataclasses.dataclass(frozen=True)
class VGGConfig:
    # channels per stage; None marks a pooling boundary
    plan: Tuple[int, ...] = (64, 0, 128, 0, 256, 256, 0, 512, 512, 0)
    num_classes: int = 1000
    norm_mode: str = "batch"
    width_mult: float = 1.0


class VGG(nn.Module):
    """VGG-style plain conv stack (conv-norm-relu, maxpool boundaries)."""

    cfg: VGGConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        idx = 0
        for c in cfg.plan:
            if c == 0:
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            ch = max(int(c * cfg.width_mult), 8)
            x = nn.Conv(ch, (3, 3), use_bias=False,
                        name=f"features_{idx}")(x)
            x = SwitchableNorm(ch, cfg.norm_mode, name=f"norm_{idx}")(
                x, use_running_average=not train)
            x = nn.relu(x)
            idx += 1
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classifier")(x)


def vgg11(num_classes: int = 1000, **kw) -> VGG:
    return VGG(VGGConfig(plan=(64, 0, 128, 0, 256, 256, 0, 512, 512, 0,
                               512, 512, 0),
                         num_classes=num_classes, **kw))


def tiny_vgg(num_classes: int = 10) -> VGG:
    return VGG(VGGConfig(plan=(16, 0, 32, 0, 64, 0),
                         num_classes=num_classes))


@dataclasses.dataclass(frozen=True)
class MobileNetConfig:
    # (channels, stride) per depthwise-separable block
    plan: Tuple[Tuple[int, int], ...] = (
        (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
        (512, 1), (512, 1), (1024, 2), (1024, 1))
    stem_width: int = 32
    num_classes: int = 1000
    norm_mode: str = "batch"


class MobileNet(nn.Module):
    """MobileNetV1-style depthwise-separable stack."""

    cfg: MobileNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg

        def norm(x, ch, name):
            return SwitchableNorm(ch, cfg.norm_mode, name=name)(
                x, use_running_average=not train)

        x = nn.Conv(cfg.stem_width, (3, 3), (2, 2), use_bias=False,
                    name="conv_stem")(x)
        x = nn.relu(norm(x, cfg.stem_width, "norm_stem"))
        ch_in = cfg.stem_width
        for i, (ch, stride) in enumerate(cfg.plan):
            # depthwise: one filter per input channel (groups == channels)
            x = nn.Conv(ch_in, (3, 3), (stride, stride), use_bias=False,
                        feature_group_count=ch_in, name=f"dw_{i}")(x)
            x = nn.relu(norm(x, ch_in, f"dw_norm_{i}"))
            x = nn.Conv(ch, (1, 1), use_bias=False, name=f"pw_{i}")(x)
            x = nn.relu(norm(x, ch, f"pw_norm_{i}"))
            ch_in = ch
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classifier")(x)


def mobilenet(num_classes: int = 1000, **kw) -> MobileNet:
    return MobileNet(MobileNetConfig(num_classes=num_classes, **kw))


def tiny_mobilenet(num_classes: int = 10) -> MobileNet:
    return MobileNet(MobileNetConfig(
        plan=((32, 1), (64, 2), (64, 1), (128, 2)),
        stem_width=16, num_classes=num_classes))
