"""User-facing facade — capability parity with mpemu.mpt_emu.

  quantize_model(...)  → PTQ (mpt_emu.py:193-231)
  initialize(...)      → FP8 mixed-precision training (mpt_emu.py:146-191,
                         re-exported from fp8tpu.training)

Being functional, the facade returns immutable objects instead of mutating
a live torch model: ``QuantizedModel`` bundles (model, policy, quantized
variables, calibrated qparams) and is itself callable/jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import flax.linen as nn

from fp8tpu.ops.scale_shift import fold_batchnorm
from fp8tpu.quant.calibrate import calibrate as _calibrate
from fp8tpu.quant.calibrate import qparams_from_stats
from fp8tpu.quant.interceptor import (
    build_module_table,
    make_quant_interceptor,
    quantize_params,
)
from fp8tpu.quant.policy import QuantPolicy, get_policy
from fp8tpu.training.mpt import initialize  # noqa: F401  (re-export)


@dataclasses.dataclass
class QuantizedModel:
    """A PTQ'd model: quantized weights + activation-cast policy."""

    model: nn.Module
    policy: QuantPolicy
    variables: Any
    module_table: Dict
    stats: Optional[Dict] = None
    qparams: Optional[Dict] = None

    def apply(self, *args, variables=None, **kwargs):
        """Quantized forward (weights are already fake-quantized; the
        interceptor applies activation casts).  Jittable."""
        v = variables if variables is not None else self.variables
        interceptor = make_quant_interceptor(self.policy)
        with nn.intercept_methods(interceptor):
            return self.model.apply(v, *args, **kwargs)

    def __call__(self, *args, **kwargs):
        return self.apply(*args, **kwargs)

    def print_config(self):
        """Dump the resolved per-module policy (print_config,
        e4m3_emu.py:211-213)."""
        for path, kind in sorted(self.module_table.items()):
            print(f"{self.policy.resolve(path, kind)} {path:40s}")


def quantize_model(
    model: nn.Module,
    variables,
    sample_args: Tuple,
    dtype: str = "e4m3",
    calibration_batches: Optional[Iterable] = None,
    fuse_bn: bool = False,
    inference_model: Optional[nn.Module] = None,
    list_exempt_layers: Tuple[str, ...] = (),
    list_layers_output_fused: Tuple[str, ...] = (),
    policy: Optional[QuantPolicy] = None,
    key: Optional[jax.Array] = None,
) -> QuantizedModel:
    """Post-training quantization (mpt_emu.quantize_model,
    mpt_emu.py:193-231).

    ``dtype``: e4m3 | e3m4 | hybrid | e5m2 — selects the matching
    emulator preset policy.
    ``fuse_bn``: fold BatchNorm → ScaleShift first
    (fuse_layers_and_quantize_model, e4m3_emu.py:187-207).  Pass the
    scale-shift-mode module as ``inference_model`` (module code is static
    in Flax; parameters are transformed here).
    ``calibration_batches``: iterable of input batches for the stats
    sweep; per-module calibrated scales land in ``.qparams``.
    """
    if policy is None:
        policy = get_policy(dtype, training=False)
    if list_exempt_layers:
        policy = policy.with_exempt(*list_exempt_layers)
    if list_layers_output_fused:
        policy = policy.with_output_fused(*list_layers_output_fused)

    if fuse_bn:
        if inference_model is None:
            raise ValueError(
                "fuse_bn=True needs inference_model (the module "
                "instantiated with norm_mode='scale_shift')")
        variables = fold_batchnorm(variables)
        model = inference_model

    table = build_module_table(model, variables, *sample_args)

    stats = qparams = None
    if calibration_batches is not None:
        stats = _calibrate(model, variables, calibration_batches,
                           policy=policy)
        qparams = qparams_from_stats(stats, policy, table)

    qvariables = quantize_params(variables, policy, table, key)
    return QuantizedModel(model=model, policy=policy, variables=qvariables,
                          module_table=table, stats=stats, qparams=qparams)
