#!/usr/bin/env python
"""PTQ sweep over model × dtype × rounding — the reference's launch.py
(examples/inference/classifier/launch.py:14-80), which iterates 12
torchvision models over {e5m2, e4m3, e3m4, hybrid} and prints a top-1
accuracy table.

Here the sweep runs the TPU-native PTQ flow (fp8tpu.quantize_model with
calibration + BN fusion) over the bundled model zoo and prints one table
row per (model, dtype):

  python examples/launch_sweep.py --models tiny resnet18 \
      --dtypes e4m3 e3m4 hybrid --num_samples 256
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
from fp8tpu.utils import accuracy

from resnet_ptq import (MODEL_EXEMPT, get_model,  # noqa: E501  reuse the PTQ recipe
                        load_data)


def evaluate(apply_fn, x, y, batch: int = 64):
    top1 = n = 0
    for i in range(0, x.shape[0], batch):
        logits = apply_fn(x[i:i + batch])
        top1 += float(accuracy(logits, y[i:i + batch])[0]) * len(
            y[i:i + batch])
        n += len(y[i:i + batch])
    return top1 / max(n, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+", default=["tiny"],
                    choices=["tiny", "tiny_vgg", "tiny_mobilenet",
                             "tiny_inception", "tiny_densenet",
                             "tiny_shufflenet", "tiny_squeezenet",
                             "tiny_mbconv", "tiny_mbconv_hs", "tiny_vit",
                             "tiny_resnext", "resnet18", "resnet50",
                             "resnext50_32x4d", "wide_resnet50_2"])
    ap.add_argument("--dtypes", nargs="+",
                    default=["e4m3", "e3m4", "hybrid", "e5m2"])
    ap.add_argument("--num_samples", type=int, default=128)
    ap.add_argument("--num_classes", type=int, default=10)
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--data_npz", default=None)
    args = ap.parse_args()

    print(f"{'model':10s} {'dtype':8s} {'fp32 top1':>9s} {'quant top1':>10s}"
          f" {'Δ':>6s} {'sec':>6s}")
    for name in args.models:
        margs = argparse.Namespace(model=name, data_npz=args.data_npz,
                                   num_samples=args.num_samples,
                                   num_classes=args.num_classes)
        x, y = load_data(margs)
        model = get_model(name, args.num_classes)
        variables = model.init(jax.random.key(0), x[:1])
        base_apply = jax.jit(lambda v, xb: model.apply(v, xb))
        base = evaluate(lambda xb: base_apply(variables, xb), x, y)

        bs = max(args.num_samples // max(args.calib_batches, 1), 1)
        calib = [x[i * bs:(i + 1) * bs] for i in range(args.calib_batches)]
        for dtype in args.dtypes:
            t0 = time.time()
            qm = fp8tpu.quantize_model(
                model, variables, (x[:1],), dtype=dtype,
                calibration_batches=calib,
                list_exempt_layers=MODEL_EXEMPT.get(
                    name, ("conv_init", "head")),
            )
            qapply = jax.jit(qm.apply)
            top1 = evaluate(lambda xb: qapply(xb), x, y)
            print(f"{name:10s} {dtype:8s} {base:9.2f} {top1:10.2f} "
                  f"{top1 - base:6.2f} {time.time() - t0:6.1f}")


if __name__ == "__main__":
    main()
