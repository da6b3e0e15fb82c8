#!/usr/bin/env python
"""Foreign-checkpoint ingestion: torch state_dicts → fp8tpu variables.

The reference's examples load PRETRAINED torch checkpoints — torchvision
classifiers (imagenet_test.py:152-165) and HF BERT (run_squad.py's
--model_name_or_path) — and quantize them.  This tool makes that path
real for fp8tpu (VERDICT r4 next #4): it maps

  * torchvision ResNet state_dicts (resnet18/34/50/101, resnext,
    wide_resnet — anything built from BasicBlock/Bottleneck with the
    ``layer{L}.{B}.conv{i}/bn{i}/downsample`` naming) onto
    :class:`fp8tpu.models.resnet.ResNet` variables, and
  * HF ``BertForQuestionAnswering``/``BertModel`` state_dicts onto
    :class:`fp8tpu.models.bert.BertForQA` variables,
  * torchvision ``VisionTransformer`` (vit_b_16-class) state_dicts onto
    :class:`fp8tpu.models.vision.ViT` variables,

with the layout transposes TPU needs (torch conv OIHW → flax HWIO,
torch Linear (out,in) → flax (in,out)).  Roundtrip logits parity vs the
torch forward on random weights is asserted in
tests/test_convert_torch.py.

CLI:  python tools/convert_torch.py resnet18 /path/ckpt.pt out_dir
      python tools/convert_torch.py bert_qa  /path/ckpt.pt out_dir
loads the torch checkpoint (a state_dict or a dict holding one), converts,
and saves with fp8tpu's Orbax checkpoint helper.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _np(t):
    """torch.Tensor | ndarray → float32/int ndarray on host."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(t):
    """torch conv weight OIHW → flax HWIO (grouped convs included: the
    I axis is already in/groups on both sides)."""
    return np.transpose(_np(t), (2, 3, 1, 0))


def _dense(t):
    return np.ascontiguousarray(_np(t).T)


class _Taken:
    """Tracks which state_dict keys the mapping consumed so leftovers
    (a wrong architecture guess) fail loudly instead of silently."""

    def __init__(self, sd):
        self.sd = dict(sd)
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return self.sd[key]

    def __contains__(self, key):
        return key in self.sd

    def leftovers(self, ignore=()):
        return sorted(k for k in self.sd if k not in self.used
                      and not any(k.startswith(p) or k.endswith(p)
                                  for p in ignore))


def convert_resnet(state_dict, cfg) -> dict:
    """torchvision ResNet state_dict → fp8tpu ResNet variables
    ({"params": ..., "batch_stats": ...}) for ``ResNet(cfg)`` with
    ``norm_mode='bn'``."""
    sd = _Taken(state_dict)
    params, stats = {}, {}

    def norm(pdst, sdst, name, src):
        pdst[name] = {"bn": {"scale": _np(sd(f"{src}.weight")),
                             "bias": _np(sd(f"{src}.bias"))}}
        sdst[name] = {"bn": {"mean": _np(sd(f"{src}.running_mean")),
                             "var": _np(sd(f"{src}.running_var"))}}

    params["conv1"] = {"kernel": _conv(sd("conv1.weight"))}
    norm(params, stats, "norm1", "bn1")

    n_convs = 3 if cfg.bottleneck else 2
    for stage, n_blocks in enumerate(cfg.stage_sizes):
        for b in range(n_blocks):
            tp = f"layer{stage + 1}.{b}"
            fp = f"stage{stage}_block{b}"
            bp, bs = {}, {}
            for i in range(1, n_convs + 1):
                bp[f"conv{i}"] = {"kernel": _conv(sd(f"{tp}.conv{i}.weight"))}
                norm(bp, bs, f"norm{i}", f"{tp}.bn{i}")
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd(f"{tp}.downsample.0.weight"))}
                norm(bp, bs, "downsample_norm", f"{tp}.downsample.1")
            params[fp] = bp
            stats[fp] = bs

    params["fc"] = {"kernel": _dense(sd("fc.weight")),
                    "bias": _np(sd("fc.bias"))}
    left = sd.leftovers(ignore=("num_batches_tracked",))
    if left:
        raise ValueError(f"unconsumed torch keys (architecture mismatch?): "
                         f"{left[:8]}{'...' if len(left) > 8 else ''}")
    return {"params": params, "batch_stats": stats}


# HF BertForQuestionAnswering key prefix → fp8tpu module path pieces
_BERT_LAYER_MAP = (
    ("attention.self.query", ("attention", "query")),
    ("attention.self.key", ("attention", "key")),
    ("attention.self.value", ("attention", "value")),
    ("attention.output.dense", ("attention", "output_dense")),
    ("intermediate.dense", ("intermediate",)),
    ("output.dense", ("output",)),
)
_BERT_LAYER_NORMS = (
    ("attention.output.LayerNorm", "attn_norm"),
    ("output.LayerNorm", "ffn_norm"),
)


def convert_bert_qa(state_dict, cfg) -> dict:
    """HF BertForQuestionAnswering (or BertModel + qa head) state_dict →
    fp8tpu ``BertForQA(cfg)`` variables."""
    sd = _Taken(state_dict)
    bert = {}

    def ln(dst_name, src):
        return {"scale": _np(sd(f"{src}.weight")),
                "bias": _np(sd(f"{src}.bias"))}

    emb = "bert.embeddings"
    bert["word_embed"] = {
        "embedding": _np(sd(f"{emb}.word_embeddings.weight"))}
    bert["pos_embed"] = {
        "embedding": _np(sd(f"{emb}.position_embeddings.weight"))}
    bert["type_embed"] = {
        "embedding": _np(sd(f"{emb}.token_type_embeddings.weight"))}
    bert["embed_norm"] = ln("embed_norm", f"{emb}.LayerNorm")

    for i in range(cfg.n_layers):
        lp = f"bert.encoder.layer.{i}"
        layer = {}
        for src, path in _BERT_LAYER_MAP:
            node = layer
            for part in path[:-1]:
                node = node.setdefault(part, {})
            node[path[-1]] = {"kernel": _dense(sd(f"{lp}.{src}.weight")),
                              "bias": _np(sd(f"{lp}.{src}.bias"))}
        for src, dst in _BERT_LAYER_NORMS:
            layer[dst] = ln(dst, f"{lp}.{src}")
        bert[f"layer_{i}"] = layer

    params = {"bert": bert,
              "qa_outputs": {"kernel": _dense(sd("qa_outputs.weight")),
                             "bias": _np(sd("qa_outputs.bias"))}}
    left = sd.leftovers(ignore=("position_ids", "bert.pooler"))
    if left:
        raise ValueError(f"unconsumed torch keys (architecture mismatch?): "
                         f"{left[:8]}{'...' if len(left) > 8 else ''}")
    return {"params": params}


def convert_vit(state_dict, cfg) -> dict:
    """torchvision ``VisionTransformer`` state_dict → fp8tpu
    :class:`fp8tpu.models.vision.ViT` variables.

    Naming follows torchvision's vision_transformer.py: ``conv_proj``,
    ``class_token``, ``encoder.pos_embedding``,
    ``encoder.layers.encoder_layer_{i}.{ln_1,self_attention,ln_2,mlp}``
    (the MLP is a Sequential — linears at .0/.3), ``encoder.ln``,
    ``heads.head``.  The fused ``in_proj_weight`` is split into the
    q/k/v Dense kernels (rows [0:D]/[D:2D]/[2D:3D], transposed to
    flax (in, out))."""
    sd = _Taken(state_dict)
    D = cfg.d_model
    params = {
        "patch_embed": {"kernel": _conv(sd("conv_proj.weight")),
                        "bias": _np(sd("conv_proj.bias"))},
        "cls_token": _np(sd("class_token")),
        "pos_embed": _np(sd("encoder.pos_embedding")),
    }

    def ln(src):
        return {"scale": _np(sd(f"{src}.weight")),
                "bias": _np(sd(f"{src}.bias"))}

    for i in range(cfg.n_layers):
        lp = f"encoder.layers.encoder_layer_{i}"
        w = _np(sd(f"{lp}.self_attention.in_proj_weight"))
        b = _np(sd(f"{lp}.self_attention.in_proj_bias"))
        for j, nm in enumerate(("q", "k", "v")):
            params[f"blk{i}_{nm}"] = {
                "kernel": np.ascontiguousarray(w[j * D:(j + 1) * D].T),
                "bias": b[j * D:(j + 1) * D]}
        params[f"blk{i}_proj"] = {
            "kernel": _dense(sd(f"{lp}.self_attention.out_proj.weight")),
            "bias": _np(sd(f"{lp}.self_attention.out_proj.bias"))}
        params[f"blk{i}_ln1"] = ln(f"{lp}.ln_1")
        params[f"blk{i}_ln2"] = ln(f"{lp}.ln_2")
        params[f"blk{i}_fc1"] = {"kernel": _dense(sd(f"{lp}.mlp.0.weight")),
                                 "bias": _np(sd(f"{lp}.mlp.0.bias"))}
        params[f"blk{i}_fc2"] = {"kernel": _dense(sd(f"{lp}.mlp.3.weight")),
                                 "bias": _np(sd(f"{lp}.mlp.3.bias"))}

    params["ln_f"] = ln("encoder.ln")
    params["classifier"] = {"kernel": _dense(sd("heads.head.weight")),
                            "bias": _np(sd("heads.head.bias"))}
    left = sd.leftovers()
    if left:
        raise ValueError(f"unconsumed torch keys (architecture mismatch?): "
                         f"{left[:8]}{'...' if len(left) > 8 else ''}")
    return {"params": params}


def main():
    import jax.numpy as jnp  # noqa: F401  (orbax needs jax initialized)
    import torch

    from fp8tpu.models.bert import BertForQA, bert_base_config  # noqa
    from fp8tpu.models.resnet import resnet18, resnet50
    from fp8tpu.utils.checkpoint import save_checkpoint

    kind, src, out = sys.argv[1], sys.argv[2], sys.argv[3]
    blob = torch.load(src, map_location="cpu", weights_only=True)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if kind in ("resnet18", "resnet50"):
        model = {"resnet18": resnet18, "resnet50": resnet50}[kind]()
        variables = convert_resnet(sd, model.cfg)
    elif kind == "bert_qa":
        cfg = bert_base_config()
        variables = convert_bert_qa(sd, cfg)
    elif kind == "vit_b16":
        from fp8tpu.models.vision import vit_b16
        model = vit_b16()
        variables = convert_vit(sd, model.cfg)
    else:
        raise SystemExit(f"unknown kind {kind!r} "
                         "(resnet18 | resnet50 | bert_qa | vit_b16)")
    save_checkpoint(out, 0, variables)
    n = sum(np.prod(v.shape) for v in
            __import__("jax").tree.leaves(variables))
    print(f"converted {kind}: {n/1e6:.1f}M params -> {out}")


if __name__ == "__main__":
    main()
