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
