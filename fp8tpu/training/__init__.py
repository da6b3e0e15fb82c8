"""FP8 mixed-precision training recipes."""

from .opt8 import (  # noqa: F401
    adamw_8bit,
    scale_by_adam_8bit,
    state_bytes,
)
from .mpt import (  # noqa: F401
    LossScaleState,
    MPTEmulator,
    init_train_state,
    initialize,
    make_train_step,
    master_requant,
    quantize_wtgrads,
)
