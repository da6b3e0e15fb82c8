#!/usr/bin/env python
"""Quantization-aware fine-tuning — the reference's imagenet_qat.py flow:
quantize_model with a training policy, fine-tune with fake-quant
forward passes, evaluate a BN-fused quantized copy each epoch, and
checkpoint with the quantization policy included
(imagenet_qat.py:104-224, 209-219)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import fp8tpu
from fp8tpu.models.resnet import RESNET_EXEMPT, ResNet, ResNetConfig
from fp8tpu.quant.interceptor import build_module_table, quantized_apply
from fp8tpu.quant.policy import get_policy
from fp8tpu.utils import MetricLogger, accuracy, save_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="e4m3", choices=["e4m3", "e3m4",
                                                       "hybrid"])
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps-per-epoch", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--imagenet_dir", default=None,
                   help="real ImageFolder train tree (class-per-folder); "
                        "random-resized-crop + flip transform")
    p.add_argument("--num-classes", type=int, default=8)
    args = p.parse_args()

    if args.imagenet_dir:
        import numpy as np

        from fp8tpu.data.imagenet import (list_image_folder,
                                          load_image_train)
        paths, labels, classes = list_image_folder(args.imagenet_dir)
        rng = np.random.default_rng(0)
        # shuffle BEFORE truncating: the listing is class-sorted, so a
        # plain [:1024] would only ever see the alphabetically-first
        # classes of the num_classes head
        order = rng.permutation(len(paths))[:1024]
        xs = np.stack([load_image_train(paths[i], rng) for i in order])
        ys = np.asarray([labels[i] for i in order], np.int32)
        n_cls = len(classes)
        cfg = ResNetConfig(stage_sizes=(1, 1), width=16,
                           num_classes=n_cls, small_images=False)
    else:
        # learnable class-conditional patterns (fp8tpu.data) — QAT top-1
        # is a real signal, not chance on noise
        from fp8tpu.data import pattern_images
        xs, ys = pattern_images(1024, size=32, n_classes=args.num_classes,
                                seed=0)
        cfg = ResNetConfig(stage_sizes=(1, 1), width=16,
                           num_classes=args.num_classes, small_images=True)
    model = ResNet(cfg)
    x, y = jnp.asarray(xs), jnp.asarray(ys)
    variables = model.init(jax.random.key(2), x[:2])

    # QAT policy: the PTQ preset, but weights re-quantized inside the step
    # (live fake-quant like the reference's training-mode hooks).
    policy = get_policy(args.dtype).with_exempt(*RESNET_EXEMPT)
    table = build_module_table(model, variables, x[:2])
    opt = optax.sgd(args.lr, momentum=0.9)

    def qat_apply(v, xb, train=False):
        return quantized_apply(model, policy, v, xb, train=train,
                               module_table=table,
                               mutable=["batch_stats"] if train else False)

    @jax.jit
    def train_step(v, opt_state, xb, yb):
        def loss_fn(params):
            out, upd = qat_apply({**v, "params": params}, xb, train=True)
            l = optax.softmax_cross_entropy_with_integer_labels(
                out, yb).mean()
            return l, upd["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            v["params"])
        updates, opt_state = opt.update(grads, opt_state, v["params"])
        params = optax.apply_updates(v["params"], updates)
        return {"params": params, "batch_stats": bstats}, opt_state, loss

    @jax.jit
    def eval_batch(v, xb):
        return quantized_apply(model, policy, v, xb, module_table=table)

    opt_state = opt.init(variables["params"])
    log = MetricLogger()
    bs = args.batch_size
    for epoch in range(args.epochs):
        for step in range(args.steps_per_epoch):
            i = (step * bs) % (x.shape[0] - bs)
            variables, opt_state, loss = train_step(
                variables, opt_state, x[i:i + bs], y[i:i + bs])
            log.update(loss=float(loss))
        top1 = float(accuracy(eval_batch(variables, x[:64]), y[:64])[0])
        print(f"epoch {epoch}: {log}  quantized top-1 {top1:.1f}")
        if args.checkpoint_dir:
            save_checkpoint(args.checkpoint_dir,
                            epoch * args.steps_per_epoch + step,
                            variables, opt_state, policy=policy)


if __name__ == "__main__":
    main()
