"""Pallas TPU kernels: cast, fused fake-quant matmul, dequant matmul."""

from .cast_kernel import pallas_qdq  # noqa: F401
from .qmatmul import (  # noqa: F401
    dequant_matmul,
    qdq_matmul,
    quantize_weights,
)
