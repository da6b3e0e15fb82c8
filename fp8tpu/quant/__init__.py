"""Quantization engine: configs, policy resolution, fake-quant, calibration."""

from .config import (  # noqa: F401
    ModuleQuantConfig,
    ROLES,
    TensorQuantConfig,
)
from .fakequant import (  # noqa: F401
    fake_quant,
    fake_quant_with_scale,
    quantize_grad,
)
from .awq import (  # noqa: F401
    awq_calibrate_decoder,
    awq_equalize,
    collect_awq_stats,
)
