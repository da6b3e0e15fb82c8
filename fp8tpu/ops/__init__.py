"""Quantizable op wrappers and fusion utilities."""

from . import wrappers  # noqa: F401
from .scale_shift import (  # noqa: F401
    ScaleShift,
    SwitchableNorm,
    fold_batchnorm,
    fold_bn_stats,
)
from .wrappers import (  # noqa: F401
    AddMatmul,
    BatchMatmul,
    EltwiseAdd,
    EltwiseDiv,
    EltwiseMul,
    Matmul,
    Mean,
    Norm,
)
