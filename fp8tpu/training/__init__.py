"""FP8 mixed-precision training recipes."""

from .mpt import (  # noqa: F401
    LossScaleState,
    MPTEmulator,
    init_train_state,
    initialize,
    make_train_step,
    master_requant,
    quantize_wtgrads,
)
