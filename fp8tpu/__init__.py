"""fp8tpu — a TPU-native FP8 framework (JAX/XLA/Pallas/pjit).

Brand-new implementation covering the capabilities of IntelLabs'
FP8-Emulation-Toolkit (reference at /root/reference), redesigned TPU-first:
casts are fused bit-manipulation kernels, quantization policy is a pytree,
calibration is a one-pass jitted sweep, and scale-out rides
`jax.sharding.Mesh` + pjit collectives.

Public API (mirrors the reference's `mpemu.mpt_emu` facade,
mpt_emu.py:146-231):

    fp8tpu.quantize_model(...)   — post-training quantization
    fp8tpu.initialize(...)       — FP8 mixed-precision training setup
"""

__version__ = "0.1.0"

from fp8tpu.numerics import (  # noqa: F401
    FORMATS,
    FPFormat,
    RoundMode,
    qdq,
    qdq_blocked,
)
from fp8tpu.api import QuantizedModel, initialize, quantize_model  # noqa: F401
from fp8tpu import numerics  # noqa: F401

__all__ = [
    "FORMATS",
    "FPFormat",
    "RoundMode",
    "QuantizedModel",
    "initialize",
    "qdq",
    "qdq_blocked",
    "quantize_model",
    "__version__",
]
