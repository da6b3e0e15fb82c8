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


# ---------------------------------------------------------------------------
# Branchy-concat topologies (VERDICT r2 next #9): the reference's sweep
# includes inception_v3 / densenet161 / shufflenet (launch.py:14-80) —
# multi-branch and dense-concat graphs stress the policy engine's
# path-based resolution (exempt lists, BN-fold pairing, per-module
# qconfigs) in ways linear stacks cannot: one module's output feeds
# many consumers, and concatenated features mix quantized branches with
# different calibrated ranges.
# ---------------------------------------------------------------------------

INCEPTION_EXEMPT: Tuple[str, ...] = ("conv_stem", "classifier")
DENSENET_EXEMPT: Tuple[str, ...] = ("conv_stem", "classifier")


@dataclasses.dataclass(frozen=True)
class InceptionConfig:
    # per inception block: (b1x1, b3x3_reduce, b3x3, b5x5_reduce, b5x5,
    # pool_proj); 0-tuple marks a pool boundary
    plan: Tuple[Tuple[int, ...], ...] = (
        (64, 96, 128, 16, 32, 32), (128, 128, 192, 32, 96, 64), (),
        (192, 96, 208, 16, 48, 64), (160, 112, 224, 24, 64, 64), (),
    )
    stem_width: int = 64
    num_classes: int = 1000
    norm_mode: str = "batch"


class Inception(nn.Module):
    """GoogLeNet-style multi-branch blocks: four parallel conv paths
    whose outputs concatenate on the channel axis."""

    cfg: InceptionConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg

        def cbr(x, ch, k, name):
            x = nn.Conv(ch, (k, k), use_bias=False, name=name)(x)
            x = SwitchableNorm(ch, cfg.norm_mode, name=f"{name}_norm")(
                x, use_running_average=not train)
            return nn.relu(x)

        x = nn.Conv(cfg.stem_width, (3, 3), (2, 2), use_bias=False,
                    name="conv_stem")(x)
        x = SwitchableNorm(cfg.stem_width, cfg.norm_mode,
                           name="norm_stem")(
            x, use_running_average=not train)
        x = nn.relu(x)
        bi = 0
        for plan in cfg.plan:
            if not plan:
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            c1, r3, c3, r5, c5, cp = plan
            b1 = cbr(x, c1, 1, f"i{bi}_b1")
            b3 = cbr(cbr(x, r3, 1, f"i{bi}_b3r"), c3, 3, f"i{bi}_b3")
            b5 = cbr(cbr(x, r5, 1, f"i{bi}_b5r"), c5, 3, f"i{bi}_b5")
            bp = cbr(nn.max_pool(x, (3, 3), (1, 1), padding="SAME"),
                     cp, 1, f"i{bi}_bp")
            x = jnp.concatenate([b1, b3, b5, bp], axis=-1)
            bi += 1
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classifier")(x)


def inception(num_classes: int = 1000, **kw) -> Inception:
    return Inception(InceptionConfig(num_classes=num_classes, **kw))


def tiny_inception(num_classes: int = 10) -> Inception:
    return Inception(InceptionConfig(
        plan=((16, 16, 24, 8, 8, 8), (), (32, 24, 48, 8, 16, 16)),
        stem_width=16, num_classes=num_classes))


@dataclasses.dataclass(frozen=True)
class DenseNetConfig:
    # layers per dense block; growth channels appended per layer
    blocks: Tuple[int, ...] = (6, 12, 24, 16)
    growth: int = 32
    stem_width: int = 64
    num_classes: int = 1000
    norm_mode: str = "batch"


class DenseNet(nn.Module):
    """DenseNet-style dense-concat blocks: every layer consumes the
    concatenation of ALL previous features in its block, with 1x1
    transition convs + pooling between blocks."""

    cfg: DenseNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg

        def cbr(x, ch, k, name):
            x = nn.Conv(ch, (k, k), use_bias=False, name=name)(x)
            x = SwitchableNorm(ch, cfg.norm_mode, name=f"{name}_norm")(
                x, use_running_average=not train)
            return nn.relu(x)

        x = nn.Conv(cfg.stem_width, (3, 3), (2, 2), use_bias=False,
                    name="conv_stem")(x)
        x = SwitchableNorm(cfg.stem_width, cfg.norm_mode,
                           name="norm_stem")(
            x, use_running_average=not train)
        x = nn.relu(x)
        ch = cfg.stem_width
        for b, n_layers in enumerate(cfg.blocks):
            feats = [x]
            for i in range(n_layers):
                h = jnp.concatenate(feats, axis=-1)
                h = cbr(h, cfg.growth, 3, f"d{b}_l{i}")
                feats.append(h)
            x = jnp.concatenate(feats, axis=-1)
            ch = ch + n_layers * cfg.growth
            if b != len(cfg.blocks) - 1:
                ch = ch // 2
                x = cbr(x, ch, 1, f"trans_{b}")
                x = nn.avg_pool(x, (2, 2), (2, 2))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classifier")(x)


def densenet(num_classes: int = 1000, **kw) -> DenseNet:
    return DenseNet(DenseNetConfig(num_classes=num_classes, **kw))


def tiny_densenet(num_classes: int = 10) -> DenseNet:
    return DenseNet(DenseNetConfig(blocks=(3, 4), growth=12,
                                   stem_width=16,
                                   num_classes=num_classes))


SHUFFLENET_EXEMPT: Tuple[str, ...] = ("conv_stem", "classifier")


@dataclasses.dataclass(frozen=True)
class ShuffleNetConfig:
    # (out_channels, stride) per unit; channels must be even (the split)
    plan: Tuple[Tuple[int, int], ...] = (
        (116, 2), (116, 1), (116, 1), (232, 2), (232, 1), (464, 2))
    stem_width: int = 24
    num_classes: int = 1000
    norm_mode: str = "batch"


class ShuffleNet(nn.Module):
    """ShuffleNetV2-style units: channel split → (identity ‖ 1x1-dw-1x1
    branch) → concat → channel shuffle.  The split/shuffle topology plus
    depthwise convs is the last structurally distinct family of the
    reference's sweep (shufflenet_v2_x1_0, launch.py:14-80): one
    module's output is re-interleaved before the next consumer, which
    path-based policy resolution must survive."""

    cfg: ShuffleNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg

        def cbr(x, ch, k, name, stride=1, groups=1):
            x = nn.Conv(ch, (k, k), (stride, stride), use_bias=False,
                        feature_group_count=groups, name=name)(x)
            x = SwitchableNorm(ch, cfg.norm_mode, name=f"{name}_norm")(
                x, use_running_average=not train)
            return nn.relu(x)

        def shuffle(x, groups=2):
            B, H, W, C = x.shape
            return (x.reshape(B, H, W, groups, C // groups)
                    .swapaxes(3, 4).reshape(B, H, W, C))

        x = cbr(x, cfg.stem_width, 3, "conv_stem", stride=2)
        ch_in = cfg.stem_width
        for i, (ch, stride) in enumerate(cfg.plan):
            half = ch // 2
            if stride == 1 and ch_in == ch:
                a, b = jnp.split(x, 2, axis=-1)
                b = cbr(b, half, 1, f"u{i}_pw1")
                b = cbr(b, half, 3, f"u{i}_dw", groups=half)
                b = cbr(b, half, 1, f"u{i}_pw2")
                x = jnp.concatenate([a, b], axis=-1)
            else:
                # downsampling unit: both branches transform
                a = cbr(x, ch_in, 3, f"u{i}_adw", stride=stride,
                        groups=ch_in)
                a = cbr(a, half, 1, f"u{i}_apw")
                b = cbr(x, half, 1, f"u{i}_pw1")
                b = cbr(b, half, 3, f"u{i}_dw", stride=stride,
                        groups=half)
                b = cbr(b, half, 1, f"u{i}_pw2")
                x = jnp.concatenate([a, b], axis=-1)
            x = shuffle(x)
            ch_in = ch
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classifier")(x)


def shufflenet(num_classes: int = 1000, **kw) -> ShuffleNet:
    return ShuffleNet(ShuffleNetConfig(num_classes=num_classes, **kw))


def tiny_shufflenet(num_classes: int = 10) -> ShuffleNet:
    return ShuffleNet(ShuffleNetConfig(
        plan=((32, 2), (32, 1), (64, 2)), stem_width=16,
        num_classes=num_classes))


# ---------------------------------------------------------------------------
# squeezenet1_1 / mobilenet_v2 / mobilenet_v3 / efficientnet_b0 families
# (launch.py:20-25): fire modules are norm-free (PTQ without BN-fold),
# inverted residuals add linear-projection residual adds, and SE blocks
# put Dense modules on a pooled side path whose sigmoid gate multiplies
# the conv stream — each a distinct policy-resolution surface.
# ---------------------------------------------------------------------------

SQUEEZENET_EXEMPT: Tuple[str, ...] = ("conv_stem", "classifier")
MBCONV_EXEMPT: Tuple[str, ...] = ("conv_stem", "classifier")


@dataclasses.dataclass(frozen=True)
class SqueezeNetConfig:
    # per fire module: (squeeze, expand); 0-tuple marks a pool boundary
    plan: Tuple[Tuple[int, ...], ...] = (
        (16, 64), (16, 64), (), (32, 128), (32, 128), (),
        (48, 192), (48, 192), (64, 256), (64, 256))
    stem_width: int = 64
    num_classes: int = 1000


class SqueezeNet(nn.Module):
    """SqueezeNet1.1-style fire modules: squeeze 1x1 → (expand 1x1 ‖
    expand 3x3) concat.  Deliberately NORM-FREE like the torchvision
    original — the only sweep family whose convs carry bias and never
    feed a BatchNorm, so the PTQ recipe runs without BN-fold and
    output-fusion patterns must not fire."""

    cfg: SqueezeNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        x = nn.relu(nn.Conv(cfg.stem_width, (3, 3), (2, 2),
                            name="conv_stem")(x))
        x = nn.max_pool(x, (3, 3), (2, 2))
        for i, plan in enumerate(cfg.plan):
            if not plan:
                x = nn.max_pool(x, (3, 3), (2, 2))
                continue
            s, e = plan
            sq = nn.relu(nn.Conv(s, (1, 1), name=f"f{i}_squeeze")(x))
            e1 = nn.relu(nn.Conv(e, (1, 1), name=f"f{i}_expand1")(sq))
            e3 = nn.relu(nn.Conv(e, (3, 3), name=f"f{i}_expand3")(sq))
            x = jnp.concatenate([e1, e3], axis=-1)
        # torchvision: classifier is a 1x1 conv then global pool
        x = nn.Conv(cfg.num_classes, (1, 1), name="classifier")(x)
        return jnp.mean(x, axis=(1, 2))


def squeezenet(num_classes: int = 1000, **kw) -> SqueezeNet:
    return SqueezeNet(SqueezeNetConfig(num_classes=num_classes, **kw))


def tiny_squeezenet(num_classes: int = 10) -> SqueezeNet:
    return SqueezeNet(SqueezeNetConfig(
        plan=((8, 16), (), (16, 32)), stem_width=16,
        num_classes=num_classes))


@dataclasses.dataclass(frozen=True)
class MBConvConfig:
    # per block: (out_channels, stride, expand_ratio, use_se)
    plan: Tuple[Tuple[int, int, int, bool], ...] = (
        (16, 1, 1, False), (24, 2, 6, False), (24, 1, 6, False),
        (40, 2, 6, True), (40, 1, 6, True), (80, 2, 6, True),
        (112, 1, 6, True), (192, 2, 6, True), (320, 1, 6, True))
    stem_width: int = 32
    num_classes: int = 1000
    norm_mode: str = "batch"
    act: str = "relu6"             # 'relu6' (v2) | 'hardswish' (v3) |
    #                                'silu' (efficientnet)
    se_ratio: float = 0.25


class MBConvNet(nn.Module):
    """Inverted-residual (MBConv) stack: expand 1x1 → depthwise 3x3 →
    optional squeeze-excite → LINEAR project 1x1 → residual add.  Covers
    the mobilenet_v2 / mobilenet_v3 / efficientnet_b0 rows of the sweep
    (launch.py:21-25): the projection conv's output is un-activated (a
    different oact surface than relu stacks), and SE side paths hang
    Dense modules off a pooled branch whose gate multiplies the main
    stream."""

    cfg: MBConvConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        act = {"relu6": lambda v: jnp.minimum(nn.relu(v), 6.0),
               "hardswish": nn.hard_swish,
               "silu": nn.silu}[cfg.act]

        def norm(x, ch, name):
            return SwitchableNorm(ch, cfg.norm_mode, name=name)(
                x, use_running_average=not train)

        x = nn.Conv(cfg.stem_width, (3, 3), (2, 2), use_bias=False,
                    name="conv_stem")(x)
        x = act(norm(x, cfg.stem_width, "norm_stem"))
        ch_in = cfg.stem_width
        for i, (ch, stride, t, use_se) in enumerate(cfg.plan):
            inner = ch_in * t
            y = x
            if t != 1:
                y = nn.Conv(inner, (1, 1), use_bias=False,
                            name=f"b{i}_expand")(y)
                y = act(norm(y, inner, f"b{i}_expand_norm"))
            y = nn.Conv(inner, (3, 3), (stride, stride), use_bias=False,
                        feature_group_count=inner, name=f"b{i}_dw")(y)
            y = act(norm(y, inner, f"b{i}_dw_norm"))
            if use_se:
                se_ch = max(int(ch_in * cfg.se_ratio), 4)
                s = jnp.mean(y, axis=(1, 2))
                s = nn.relu(nn.Dense(se_ch, name=f"b{i}_se_reduce")(s))
                s = nn.sigmoid(nn.Dense(inner, name=f"b{i}_se_expand")(s))
                y = y * s[:, None, None, :]
            y = nn.Conv(ch, (1, 1), use_bias=False,
                        name=f"b{i}_project")(y)
            y = norm(y, ch, f"b{i}_project_norm")   # linear bottleneck
            if stride == 1 and ch_in == ch:
                y = y + x
            x = y
            ch_in = ch
        x = nn.Conv(4 * ch_in, (1, 1), use_bias=False, name="conv_head")(x)
        x = act(norm(x, 4 * ch_in, "norm_head"))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(cfg.num_classes, name="classifier")(x)


def mobilenet_v2(num_classes: int = 1000, **kw) -> MBConvNet:
    return MBConvNet(MBConvConfig(num_classes=num_classes, **kw))


def mobilenet_v3(num_classes: int = 1000, **kw) -> MBConvNet:
    kw.setdefault("act", "hardswish")
    return MBConvNet(MBConvConfig(num_classes=num_classes, **kw))


def efficientnet_b0(num_classes: int = 1000, **kw) -> MBConvNet:
    kw.setdefault("act", "silu")
    plan = tuple((ch, st, t, True) for ch, st, t, _ in
                 MBConvConfig().plan)
    return MBConvNet(MBConvConfig(plan=plan, num_classes=num_classes,
                                  **kw))


def tiny_mbconv(num_classes: int = 10, act: str = "relu6") -> MBConvNet:
    return MBConvNet(MBConvConfig(
        plan=((16, 1, 1, False), (24, 2, 4, True), (24, 1, 4, True),
              (48, 2, 4, True)),
        stem_width=16, num_classes=num_classes, act=act))


# ---------------------------------------------------------------------------
# Vision Transformer (beyond the reference's conv-era sweep)
# ---------------------------------------------------------------------------

# Exempt convention mirrors the reference's first-conv + classifier rule
# (imagenet_test.py:24-71): the patch-embed conv is the "first conv".
VIT_EXEMPT: Tuple[str, ...] = ("patch_embed", "classifier")


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    num_classes: int = 1000
    pool: str = "cls"               # 'cls' token | 'gap'


class ViT(nn.Module):
    """ViT-B/16-class encoder: patch-embed conv → [CLS] + learned
    positional embeddings → pre-norm transformer blocks → classifier.

    The reference's sweep stops at conv-era torchvision models
    (launch.py:14-80); a user PTQ-ing a modern vision checkpoint needs
    the attention-block quantization surface too.  Every matmul is an
    interceptable ``nn.Dense``/``nn.Conv`` (same instrumentation points
    as models/bert.py), LayerNorm stays unquantized (no BN → no
    ScaleShift fold on this family), and the exempt list follows the
    first-conv + classifier convention.
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        p = cfg.patch_size
        B = x.shape[0]
        x = nn.Conv(cfg.d_model, (p, p), (p, p), padding="VALID",
                    use_bias=True, name="patch_embed")(x)
        x = x.reshape(B, -1, cfg.d_model)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.d_model), x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, cfg.d_model)),
                             x], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(stddev=0.02),
                         (1, x.shape[1], cfg.d_model), x.dtype)
        x = x + pos

        H = cfg.n_heads
        D = cfg.d_model // H
        scale = D ** -0.5
        for i in range(cfg.n_layers):
            y = nn.LayerNorm(name=f"blk{i}_ln1")(x)
            S = y.shape[1]
            q = nn.Dense(H * D, name=f"blk{i}_q")(y).reshape(B, S, H, D)
            k = nn.Dense(H * D, name=f"blk{i}_k")(y).reshape(B, S, H, D)
            v = nn.Dense(H * D, name=f"blk{i}_v")(y).reshape(B, S, H, D)
            att = jnp.einsum("bshd,bthd->bhst", q, k) * scale
            att = nn.softmax(att, axis=-1)
            ctx = jnp.einsum("bhst,bthd->bshd", att, v).reshape(B, S, -1)
            x = x + nn.Dense(cfg.d_model, name=f"blk{i}_proj")(ctx)
            y = nn.LayerNorm(name=f"blk{i}_ln2")(x)
            # exact (erf) gelu — torchvision ViT's nn.GELU, so converted
            # checkpoints match bit-for-bit semantics (cf. bert.py:82-84)
            y = nn.gelu(nn.Dense(cfg.d_ff, name=f"blk{i}_fc1")(y),
                        approximate=False)
            x = x + nn.Dense(cfg.d_model, name=f"blk{i}_fc2")(y)

        x = nn.LayerNorm(name="ln_f")(x)
        h = x[:, 0] if cfg.pool == "cls" else jnp.mean(x[:, 1:], axis=1)
        return nn.Dense(cfg.num_classes, name="classifier")(h)


def vit_b16(num_classes: int = 1000, **kw) -> ViT:
    return ViT(ViTConfig(num_classes=num_classes, **kw))


def tiny_vit(num_classes: int = 10) -> ViT:
    return ViT(ViTConfig(image_size=32, patch_size=8, d_model=64,
                         n_layers=2, n_heads=4, d_ff=128,
                         num_classes=num_classes))
