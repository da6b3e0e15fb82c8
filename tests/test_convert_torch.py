"""Foreign-checkpoint ingestion roundtrips (tools/convert_torch.py).

Builds REAL torch models in-image — a torchvision-naming ResNet
(torchvision itself doesn't ship here) and HF transformers'
BertForQuestionAnswering — exports their state_dicts, converts to fp8tpu
variables, and asserts logits parity against the torch forward on random
weights.  This is the demonstrated path for the reference's
pretrained-checkpoint workflows (imagenet_test.py:152-165 pretrained
load; run_squad.py checkpoint load)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from convert_torch import convert_bert_qa, convert_resnet  # noqa: E402

from fp8tpu.models.resnet import ResNet, ResNetConfig  # noqa: E402


# --- minimal torch ResNet with exact torchvision naming -----------------

class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TBottleneck(tnn.Module):
    def __init__(self, cin, cout, stride, groups=1, base_width=64):
        super().__init__()
        inner = int(cout * base_width / 64.0) * groups
        self.conv1 = tnn.Conv2d(cin, inner, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(inner)
        self.conv2 = tnn.Conv2d(inner, inner, 3, stride, 1, groups=groups,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(inner)
        self.conv3 = tnn.Conv2d(inner, cout * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(cout * 4)
        self.downsample = None
        if stride != 1 or cin != cout * 4:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(cout * 4))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class TResNet(tnn.Module):
    """torchvision-naming ResNet (conv1/bn1/layer{1..}/fc)."""

    def __init__(self, stage_sizes, width=16, num_classes=10,
                 bottleneck=False, groups=1, base_width=64):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin, feats = width, width
        for s, n in enumerate(stage_sizes):
            blocks = []
            for b in range(n):
                stride = 2 if (s > 0 and b == 0) else 1
                if bottleneck:
                    blocks.append(TBottleneck(cin, feats, stride, groups,
                                              base_width))
                    cin = feats * 4
                else:
                    blocks.append(TBasicBlock(cin, feats, stride))
                    cin = feats
            setattr(self, f"layer{s + 1}", tnn.Sequential(*blocks))
            feats *= 2
        self.fc = tnn.Linear(cin, num_classes)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for s in range(4):
            layer = getattr(self, f"layer{s + 1}", None)
            if layer is not None:
                x = layer(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.2)
            m.running_var.copy_(torch.rand(m.running_var.shape,
                                           generator=g) + 0.5)


@pytest.mark.parametrize("bottleneck,groups,base_width", [
    (False, 1, 64),
    (True, 1, 64),
    (True, 2, 32),     # grouped (ResNeXt-style) bottleneck
])
def test_resnet_roundtrip(bottleneck, groups, base_width):
    torch.manual_seed(0)
    stage_sizes = (1, 1)
    tm = TResNet(stage_sizes, width=16, num_classes=10,
                 bottleneck=bottleneck, groups=groups,
                 base_width=base_width).eval()
    with torch.no_grad():
        _randomize_bn_stats(tm)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator()
                    .manual_seed(1))
    with torch.no_grad():
        ref = tm(x).numpy()

    cfg = ResNetConfig(stage_sizes=stage_sizes, width=16, num_classes=10,
                       bottleneck=bottleneck, groups=groups,
                       base_width=base_width)
    variables = convert_resnet(tm.state_dict(), cfg)
    model = ResNet(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))   # NCHW → NHWC
    out = model.apply(jax.tree.map(jnp.asarray, variables), xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_resnet_rejects_wrong_architecture():
    tm = TResNet((1, 1), width=16, bottleneck=False).eval()
    cfg = ResNetConfig(stage_sizes=(1,), width=16, num_classes=10)
    with pytest.raises((KeyError, ValueError)):
        convert_resnet(tm.state_dict(), cfg)


def test_bert_qa_roundtrip():
    transformers = pytest.importorskip("transformers")
    from fp8tpu.models.bert import BertConfig, BertForQA

    hf_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32, type_vocab_size=2,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    tm = transformers.BertForQuestionAnswering(hf_cfg).eval()

    ids = torch.randint(0, 128, (2, 16),
                        generator=torch.Generator().manual_seed(1))
    types = torch.randint(0, 2, (2, 16),
                          generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        ref = tm(input_ids=ids, token_type_ids=types)
    ref_start = ref.start_logits.numpy()
    ref_end = ref.end_logits.numpy()

    cfg = BertConfig(vocab_size=128, d_model=32, n_layers=2, n_heads=2,
                     d_ff=64, max_position=32, type_vocab=2)
    variables = convert_bert_qa(tm.state_dict(), cfg)
    model = BertForQA(cfg)
    start, end = model.apply(
        jax.tree.map(jnp.asarray, variables), jnp.asarray(ids.numpy()),
        token_type_ids=jnp.asarray(types.numpy()))
    np.testing.assert_allclose(np.asarray(start), ref_start, atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(end), ref_end, atol=2e-4,
                               rtol=1e-3)


# --- minimal torch ViT with exact torchvision naming ---------------------

class TViT(tnn.Module):
    """torchvision vision_transformer naming (conv_proj / class_token /
    encoder.layers.encoder_layer_{i}.{ln_1,self_attention,ln_2,mlp} /
    encoder.ln / heads.head); LayerNorm eps 1e-6 like torchvision."""

    def __init__(self, image_size=32, patch=8, d=64, layers=2, heads=4,
                 ff=128, classes=10):
        super().__init__()
        self.patch = patch
        self.conv_proj = tnn.Conv2d(3, d, patch, patch)
        self.class_token = tnn.Parameter(torch.zeros(1, 1, d))
        seq = (image_size // patch) ** 2 + 1
        self.encoder = tnn.Module()
        self.encoder.pos_embedding = tnn.Parameter(
            torch.empty(1, seq, d).normal_(std=0.02))
        self.encoder.layers = tnn.ModuleDict()
        for i in range(layers):
            blk = tnn.Module()
            blk.ln_1 = tnn.LayerNorm(d, eps=1e-6)
            blk.self_attention = tnn.MultiheadAttention(
                d, heads, batch_first=True)
            blk.ln_2 = tnn.LayerNorm(d, eps=1e-6)
            blk.mlp = tnn.Sequential(
                tnn.Linear(d, ff), tnn.GELU(), tnn.Dropout(0.0),
                tnn.Linear(ff, d), tnn.Dropout(0.0))
            self.encoder.layers[f"encoder_layer_{i}"] = blk
        self.encoder.ln = tnn.LayerNorm(d, eps=1e-6)
        self.heads = tnn.Module()
        self.heads.head = tnn.Linear(d, classes)

    def forward(self, x):
        x = self.conv_proj(x)                        # (B, D, h, w)
        x = x.flatten(2).transpose(1, 2)             # (B, hw, D)
        cls = self.class_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.encoder.pos_embedding
        for blk in self.encoder.layers.values():
            y = blk.ln_1(x)
            a, _ = blk.self_attention(y, y, y, need_weights=False)
            x = x + a
            x = x + blk.mlp(blk.ln_2(x))
        x = self.encoder.ln(x)
        return self.heads.head(x[:, 0])


def test_vit_roundtrip():
    from convert_torch import convert_vit
    from fp8tpu.models.vision import tiny_vit

    torch.manual_seed(3)
    tm = TViT().eval()
    with torch.no_grad():
        tm.class_token.normal_(std=0.02)     # exercise the cls mapping
    x = torch.randn(2, 3, 32, 32,
                    generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        ref = tm(x).numpy()

    model = tiny_vit(10)
    variables = convert_vit(tm.state_dict(), model.cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))   # NCHW → NHWC
    out = model.apply(jax.tree.map(jnp.asarray, variables), xj)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_vit_rejects_wrong_architecture():
    from convert_torch import convert_vit
    from fp8tpu.models.vision import ViTConfig

    tm = TViT(layers=2).eval()
    bad = ViTConfig(image_size=32, patch_size=8, d_model=64, n_layers=1,
                    n_heads=4, d_ff=128, num_classes=10)
    with pytest.raises((KeyError, ValueError)):
        convert_vit(tm.state_dict(), bad)
