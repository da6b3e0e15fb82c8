"""Mesh construction and sharding rules (DP / TP / SP over ICI)."""

from .sharding import (  # noqa: F401
    DECODER_PARAM_RULES,
    KV_CACHE_SPEC,
    KV_SCALE_SPEC,
    SERVE_PARAM_RULES,
    batch_sharding,
    make_mesh,
    replicated,
    shard_params,
    shard_tree,
)
