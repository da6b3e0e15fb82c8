#!/usr/bin/env python
"""ResNet post-training quantization — the reference's ImageNet PTQ recipe
(examples/inference/classifier/imagenet_test.py) as a TPU-native flow:

  baseline eval → quantize_model → calibration sweep → BN→ScaleShift
  fusion → quantized eval, with the reference's exempt-layer policy
  (first conv + classifier head) and dtype sweep (launch.py:14-80).

Runs on synthetic data by default (no dataset downloads in this image);
point --data_npz at {x: (N,H,W,C), y: (N,)} arrays for real evaluation.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import fp8tpu
from fp8tpu.models.resnet import (
    RESNET_EXEMPT,
    ResNet,
    ResNetConfig,
    resnet18,
    resnet50,
)
from fp8tpu.utils import MetricLogger, accuracy


MODEL_EXEMPT = {
    "resnet18": RESNET_EXEMPT, "resnet50": RESNET_EXEMPT,
    "tiny": RESNET_EXEMPT,
}


def get_model(name: str, num_classes: int, norm_mode: str = "bn"):
    import dataclasses
    from fp8tpu.models.vision import (DENSENET_EXEMPT, INCEPTION_EXEMPT,
                                      MBCONV_EXEMPT, MOBILENET_EXEMPT,
                                      SHUFFLENET_EXEMPT,
                                      SQUEEZENET_EXEMPT,
                                      VGG_EXEMPT, tiny_densenet,
                                      tiny_inception, tiny_mbconv,
                                      tiny_mobilenet, tiny_shufflenet,
                                      tiny_squeezenet, tiny_vgg,
                                      VIT_EXEMPT, tiny_vit)
    from fp8tpu.models.resnet import tiny_resnext
    makers = {
        "tiny_vgg": (tiny_vgg, VGG_EXEMPT),
        "tiny_mobilenet": (tiny_mobilenet, MOBILENET_EXEMPT),
        "tiny_inception": (tiny_inception, INCEPTION_EXEMPT),
        "tiny_densenet": (tiny_densenet, DENSENET_EXEMPT),
        "tiny_shufflenet": (tiny_shufflenet, SHUFFLENET_EXEMPT),
        "tiny_squeezenet": (tiny_squeezenet, SQUEEZENET_EXEMPT),
        "tiny_mbconv": (tiny_mbconv, MBCONV_EXEMPT),
        "tiny_mbconv_hs": (lambda n: tiny_mbconv(n, act="hardswish"),
                           MBCONV_EXEMPT),
        "tiny_resnext": (tiny_resnext, RESNET_EXEMPT),
        "tiny_vit": (tiny_vit, VIT_EXEMPT),
    }
    if name in makers:
        make, exempt = makers[name]
        MODEL_EXEMPT[name] = exempt
        return make(num_classes)
    cfgs = {
        "resnet18": ResNetConfig(stage_sizes=(2, 2, 2, 2)),
        "resnet50": ResNetConfig(stage_sizes=(3, 4, 6, 3), bottleneck=True),
        "resnext50_32x4d": ResNetConfig(stage_sizes=(3, 4, 6, 3),
                                        bottleneck=True, groups=32,
                                        base_width=4),
        "wide_resnet50_2": ResNetConfig(stage_sizes=(3, 4, 6, 3),
                                        bottleneck=True, base_width=128),
        "tiny": ResNetConfig(stage_sizes=(1, 1), width=16,
                             small_images=True),
    }
    MODEL_EXEMPT.setdefault(name, RESNET_EXEMPT)
    cfg = dataclasses.replace(cfgs[name], num_classes=num_classes,
                              norm_mode=norm_mode)
    return ResNet(cfg)


def load_data(args):
    if args.imagenet_dir:
        # Real ImageFolder tree through the reference's val transform
        # (Resize 256 → CenterCrop 224 → normalize, imagenet_test.py:95-99).
        from fp8tpu.data.imagenet import imagenet_val_batches
        xs, ys = zip(*imagenet_val_batches(args.imagenet_dir,
                                           batch_size=args.batch_size,
                                           limit=args.num_samples))
        return (jnp.asarray(np.concatenate(xs), jnp.float32),
                jnp.asarray(np.concatenate(ys)))
    if args.data_npz:
        d = np.load(args.data_npz)
        return jnp.asarray(d["x"], jnp.float32), jnp.asarray(d["y"])
    # Learnable synthetic patterns (fp8tpu.data): class-conditional
    # frequency content + noise, so PTQ top-1 deltas are meaningful
    # (pure-noise data would make any accuracy comparison vacuous).
    from fp8tpu.data import pattern_images
    hw = 32 if args.model.startswith("tiny") else 224
    n_cls = min(args.num_classes, 8)
    x, y = pattern_images(args.num_samples, size=hw, n_classes=n_cls,
                          seed=0)
    return jnp.asarray(x), jnp.asarray(y)


def evaluate(apply_fn, x, y, batch: int, log: MetricLogger):
    n = x.shape[0] // batch * batch
    top1s = []
    for i in range(0, n, batch):
        logits = apply_fn(x[i:i + batch])
        top1, top5 = accuracy(logits, y[i:i + batch], topk=(1, 5))
        top1s.append(float(top1))
        log.update(top1=float(top1), top5=float(top5))
    return float(np.mean(top1s))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny",
                   choices=["tiny", "resnet18", "resnet50",
                            "resnext50_32x4d", "wide_resnet50_2",
                            "tiny_vgg", "tiny_mobilenet",
                            "tiny_inception", "tiny_densenet",
                            "tiny_shufflenet", "tiny_squeezenet",
                            "tiny_mbconv", "tiny_mbconv_hs",
                            "tiny_resnext", "tiny_vit"])
    p.add_argument("--dtype", default="e4m3",
                   choices=["e4m3", "e3m4", "hybrid", "e5m2"])
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-calibration-batches", type=int, default=4)
    p.add_argument("--num-classes", type=int, default=10)
    p.add_argument("--num-samples", type=int, default=256)
    p.add_argument("--data_npz", default=None)
    p.add_argument("--imagenet_dir", default=None,
                   help="ImageFolder val tree (class-per-folder); "
                        "preprocessed with the reference's val transform")
    p.add_argument("--sweep", action="store_true",
                   help="sweep all dtypes (launch.py behavior)")
    p.add_argument("--torch_ckpt", default=None,
                   help="pretrained torchvision state_dict (.pt/.pth) — "
                        "the reference's imagenet_test.py pretrained-load "
                        "path: converted via tools/convert_torch.py and "
                        "evaluated instead of random init")
    args = p.parse_args()

    model = get_model(args.model, args.num_classes)
    x, y = load_data(args)
    if args.torch_ckpt:
        import torch
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_torch import convert_resnet
        blob = torch.load(args.torch_ckpt, map_location="cpu",
                          weights_only=True)
        sd = blob.get("state_dict", blob) if isinstance(blob, dict) \
            else blob
        variables = jax.tree.map(jnp.asarray,
                                 convert_resnet(sd, model.cfg))
        print(f"loaded pretrained torch checkpoint {args.torch_ckpt}")
    else:
        variables = model.init(jax.random.key(2), x[:2])
        # Touch BN stats so folding is meaningful (norm-free families —
        # e.g. the LayerNorm-only ViT — have no batch_stats collection).
        if "batch_stats" in variables:
            for i in range(3):
                _, upd = model.apply(variables, x[i * 8:(i + 1) * 8],
                                     train=True, mutable=["batch_stats"])
                variables = {**variables,
                             "batch_stats": upd["batch_stats"]}

    log = MetricLogger()
    base_apply = jax.jit(lambda v, xb: model.apply(v, xb))
    baseline = evaluate(lambda xb: base_apply(variables, xb), x, y,
                        args.batch_size, log)
    print(f"baseline fp32 top-1: {baseline:.2f}")

    dtypes = (["e4m3", "e3m4", "hybrid"] if args.sweep else [args.dtype])
    for dtype in dtypes:
        t0 = time.time()
        has_bn = "batch_stats" in variables
        infer_model = get_model(args.model, args.num_classes,
                                norm_mode="scale_shift") if has_bn \
            else None
        calib = [x[i * args.batch_size:(i + 1) * args.batch_size]
                 for i in range(args.num_calibration_batches)]
        calib = [c for c in calib if c.shape[0] > 0]  # short datasets
        qm = fp8tpu.quantize_model(
            model, variables, (x[:2],), dtype=dtype, fuse_bn=has_bn,
            inference_model=infer_model, calibration_batches=calib,
            list_exempt_layers=MODEL_EXEMPT.get(args.model,
                                                RESNET_EXEMPT))
        q_apply = jax.jit(lambda v, xb: qm.model.apply(v, xb))

        # Activation casts via the policy interceptor:
        jq = jax.jit(lambda v, xb: qm.apply(xb, variables=v))
        top1 = evaluate(lambda xb: jq(qm.variables, xb), x, y,
                        args.batch_size, log)
        print(f"{dtype:8s} PTQ top-1: {top1:.2f} "
              f"(Δ {top1 - baseline:+.2f}) in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
