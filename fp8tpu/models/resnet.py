"""ResNet in Flax — the PTQ/QAT reference workload.

Mirrors the reference's ImageNet classifier examples
(examples/inference/classifier/imagenet_test.py): torchvision-style
ResNet-v1 with BatchNorm, expressed with :class:`SwitchableNorm` so
BN→ScaleShift folding (the pre-PTQ fusion step, scale_shift.py:64-73) is
a parameter transform.

Exempt-layer conventions from the reference (imagenet_test.py:24-71):
first conv + classifier head stay unquantized; conv layers feeding BN get
``oact_qconfig=None`` — expressed here via policy patterns
(see examples/resnet_ptq.py).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from fp8tpu.ops.scale_shift import SwitchableNorm
from fp8tpu.ops.wrappers import EltwiseAdd


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    stage_sizes: Sequence[int] = (2, 2, 2, 2)   # resnet18
    num_classes: int = 1000
    width: int = 64
    bottleneck: bool = False
    norm_mode: str = "bn"          # 'bn' | 'scale_shift'
    small_images: bool = False     # CIFAR-style 3x3 stem
    # ResNeXt/wide-ResNet knobs (torchvision semantics): the bottleneck's
    # inner 3x3 runs at width = features * base_width/64 * groups with
    # grouped channels.  resnext50_32x4d: groups=32, base_width=4;
    # wide_resnet50_2: base_width=128 (launch.py:16-18 sweep surface).
    groups: int = 1
    base_width: int = 64


class BasicBlock(nn.Module):
    features: int
    strides: int
    norm_mode: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        # explicit pad 1 (not SAME): torchvision pads stride-2 3x3 convs
        # symmetrically; SAME pads (0,1) on even inputs — same output
        # shape, shifted taps, so real checkpoints would diverge
        y = nn.Conv(self.features, (3, 3), (self.strides,) * 2,
                    padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv1")(x)
        y = SwitchableNorm(self.features, self.norm_mode, name="norm1")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(y)
        y = SwitchableNorm(self.features, self.norm_mode, name="norm2")(
            y, use_running_average=not train)
        if res.shape != y.shape:
            res = nn.Conv(self.features, (1, 1), (self.strides,) * 2,
                          use_bias=False, name="downsample_conv")(res)
            res = SwitchableNorm(self.features, self.norm_mode,
                                 name="downsample_norm")(
                res, use_running_average=not train)
        return nn.relu(EltwiseAdd(name="residual_add")(y, res))


class Bottleneck(nn.Module):
    features: int
    strides: int
    norm_mode: str
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        inner = int(self.features * self.base_width / 64.0) * self.groups
        y = nn.Conv(inner, (1, 1), use_bias=False, name="conv1")(x)
        y = SwitchableNorm(inner, self.norm_mode, name="norm1")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(inner, (3, 3), (self.strides,) * 2,
                    padding=[(1, 1), (1, 1)],
                    feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = SwitchableNorm(inner, self.norm_mode, name="norm2")(
            y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = SwitchableNorm(self.features * 4, self.norm_mode, name="norm3")(
            y, use_running_average=not train)
        if res.shape != y.shape:
            res = nn.Conv(self.features * 4, (1, 1), (self.strides,) * 2,
                          use_bias=False, name="downsample_conv")(res)
            res = SwitchableNorm(self.features * 4, self.norm_mode,
                                 name="downsample_norm")(
                res, use_running_average=not train)
        return nn.relu(EltwiseAdd(name="residual_add")(y, res))


class ResNet(nn.Module):
    cfg: ResNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        if cfg.small_images:
            x = nn.Conv(cfg.width, (3, 3), use_bias=False, name="conv1")(x)
        else:
            x = nn.Conv(cfg.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="conv1")(x)
        x = SwitchableNorm(cfg.width, cfg.norm_mode, name="norm1")(
            x, use_running_average=not train)
        x = nn.relu(x)
        if not cfg.small_images:
            x = nn.max_pool(x, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

        feats = cfg.width
        for stage, n_blocks in enumerate(cfg.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if (stage > 0 and b == 0) else 1
                if cfg.bottleneck:
                    block = Bottleneck(feats, strides, cfg.norm_mode,
                                       groups=cfg.groups,
                                       base_width=cfg.base_width,
                                       name=f"stage{stage}_block{b}")
                else:
                    block = BasicBlock(feats, strides, cfg.norm_mode,
                                       name=f"stage{stage}_block{b}")
                x = block(x, train=train)
            feats *= 2
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="fc")(x)


def resnet18(num_classes: int = 1000, **kw) -> ResNet:
    return ResNet(ResNetConfig(stage_sizes=(2, 2, 2, 2),
                               num_classes=num_classes, **kw))


def resnet50(num_classes: int = 1000, **kw) -> ResNet:
    return ResNet(ResNetConfig(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                               num_classes=num_classes, **kw))


def resnext50_32x4d(num_classes: int = 1000, **kw) -> ResNet:
    """Grouped-bottleneck ResNeXt (launch.py:17): 32 groups x 4-wide."""
    return ResNet(ResNetConfig(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                               groups=32, base_width=4,
                               num_classes=num_classes, **kw))


def wide_resnet50_2(num_classes: int = 1000, **kw) -> ResNet:
    """2x-wide bottleneck ResNet (launch.py:16)."""
    return ResNet(ResNetConfig(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                               base_width=128, num_classes=num_classes,
                               **kw))


def tiny_resnet(num_classes: int = 10, **kw) -> ResNet:
    """CIFAR-scale model for tests/examples."""
    return ResNet(ResNetConfig(stage_sizes=(1, 1), width=16,
                               num_classes=num_classes, small_images=True,
                               **kw))


def tiny_resnext(num_classes: int = 10) -> ResNet:
    """CIFAR-scale grouped bottleneck (4 groups x 8-wide)."""
    return ResNet(ResNetConfig(stage_sizes=(1, 1), width=16,
                               bottleneck=True, groups=4, base_width=32,
                               num_classes=num_classes, small_images=True))


# Reference exempt-layer policy (imagenet_test.py:24-71): first conv and
# final classifier are never quantized.
RESNET_EXEMPT = ("conv1", "fc")
# Convs feeding a BatchNorm keep their outputs unquantized; in this model
# every conv feeds a norm, so the pattern is every conv module.
RESNET_OUTPUT_FUSED = ("*conv*",)
