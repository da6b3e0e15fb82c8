"""Numerics core: format descriptors, golden NumPy model, jittable casts.

This layer defines bit-exactness for everything above it (SURVEY.md §7.2
step 1).
"""

from .formats import (  # noqa: F401
    BFLOAT16,
    E3M4,
    E4M3,
    E4M3_IEEE,
    E5M2,
    FLOAT16,
    FORMATS,
    FP4,
    FP8_FORMATS,
    FPFormat,
    RoundMode,
    mode_string,
    parse_mode_string,
)
from .cast import (  # noqa: F401
    block_scales,
    qdq,
    qdq_blocked,
    qdq_mode_string,
    sr_bits,
)
