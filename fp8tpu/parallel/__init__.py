"""Mesh construction and sharding rules (DP / TP / SP / PP / EP)."""

from .grad_comm import (  # noqa: F401
    wire_all_reduce,
    wire_all_reduce_tree,
    wire_bytes_per_element,
)
from .moe import (  # noqa: F401
    moe_ffn,
    quantize_expert_weights,
    top_k_routing,
)
from .pipeline import (  # noqa: F401
    make_pp_mesh,
    pipeline_apply,
    stack_stage_params,
    stage_param_sharding,
)
from .sharding import (  # noqa: F401
    DECODER_PARAM_RULES,
    MOE_PARAM_RULES,
    KV_CACHE_SPEC,
    KV_SCALE_SPEC,
    SERVE_PARAM_RULES,
    batch_sharding,
    make_mesh,
    replicated,
    shard_params,
    shard_tree,
)
