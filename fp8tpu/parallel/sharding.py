"""Mesh + sharding rules for data/tensor/sequence parallel execution.

The reference's only parallelism is example-level DDP gradient all-reduce
(SURVEY.md §2.3).  Here scale-out is first-class and TPU-native: one
`jax.sharding.Mesh` with named axes

    data   — batch (DP; gradient reductions ride ICI via psum)
    model  — tensor parallel (attention heads / MLP hidden sharded)
    seq    — sequence/context parallel for long-context training

Parameters and activations carry NamedShardings; GSPMD inserts the
all-gathers/reduce-scatters.  FP8 payloads shard exactly like their bf16
counterparts; per-channel scales shard with their channel axis, and
per-tensor scales replicate (SURVEY.md §5.8).
"""

from __future__ import annotations

import fnmatch
import re
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, seq: int = 1,
              hosts: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (host, data, seq, model) mesh.

    Axis order encodes the physical interconnect hierarchy: ``host`` is
    the outermost (slowest) axis and maps to DCN between hosts; ``model``
    is innermost so tensor-parallel collectives ride the fastest ICI
    links.  Only data-parallel gradient/metric reductions should cross
    the ``host`` axis (shard params/KV over ``model``/``data`` within a
    slice); ``batch_sharding`` spans ("host", "data") accordingly.
    When ``hosts`` is 1 the axis is size-1 and free.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = hosts * data * model * seq
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(hosts, data, seq, model)
    return Mesh(dev_array, axis_names=("host", "data", "seq", "model"))


# -- Decoder (training form) sharding rules: path glob → PartitionSpec ----
# Megatron-style TP: column-parallel up-projections, row-parallel
# down-projections; GSPMD inserts the psum on the row-parallel outputs.
DECODER_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    ("embed/embedding", P("model", None)),          # vocab-sharded
    ("*/q_proj/kernel", P(None, "model")),
    ("*/k_proj/kernel", P(None, "model")),
    ("*/v_proj/kernel", P(None, "model")),
    ("*/o_proj/kernel", P("model", None)),
    ("*/gate_proj/kernel", P(None, "model")),
    ("*/up_proj/kernel", P(None, "model")),
    ("*/down_proj/kernel", P("model", None)),
    ("*/lm_head/kernel", P(None, "model")),
    ("*", P()),                                     # norms etc. replicate
)

# MoE decoder (DecoderConfig.n_experts > 0): experts shard over the
# ``model`` axis (expert parallelism — parallel/moe.py); the router
# replicates.  Dense layers keep the Megatron TP rules above.
MOE_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    ("*/moe/up", P("model", None, None)),
    ("*/moe/down", P("model", None, None)),
    ("*/moe/router/kernel", P()),
) + DECODER_PARAM_RULES

# -- Serving params (stacked (L, K, N) payloads + (L, N) scales) ----------
SERVE_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    ("embed", P("model", None)),
    ("q8", P(None, None, "model")), ("qs", P(None, "model")),
    ("k8", P(None, None, "model")), ("ks", P(None, "model")),
    ("v8", P(None, None, "model")), ("vs", P(None, "model")),
    ("o8", P(None, "model", None)), ("os", P(None, None)),
    ("gate8", P(None, None, "model")), ("gates", P(None, "model")),
    ("up8", P(None, None, "model")), ("ups", P(None, "model")),
    ("down8", P(None, "model", None)), ("downs", P(None, None)),
    # MoE serving artifact (L, E, K, N) expert stacks: experts over the
    # model axis (expert parallelism); router replicates.
    ("router", P()),
    ("eup8", P(None, "model", None, None)), ("eups", P(None, "model", None)),
    ("edown8", P(None, "model", None, None)),
    ("edowns", P(None, "model", None)),
    ("*", P()),
)

# KV cache (L, B, S, KV, D): slots over data, kv-heads over model.
KV_CACHE_SPEC = P(None, "data", None, "model", None)
KV_SCALE_SPEC = P(None, "data", None, "model")


def _match_spec(path: str, rules) -> P:
    for pattern, spec in rules:
        if fnmatch.fnmatch(path, pattern):
            return spec
    return P()


def _tree_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = []
    for kp, leaf in flat:
        names = [str(getattr(k, "key", getattr(k, "idx", k))) for k in kp]
        if names and names[0] == "params":
            names = names[1:]
        paths.append(("/".join(names), leaf))
    return paths, treedef


def _shrink_spec(spec: P, shape, mesh: Mesh) -> P:
    """Drop or keep axes so the spec is valid for this leaf: rank-match
    and divisibility (replicate anything that doesn't divide)."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    parts = parts[:len(shape)]
    fixed = []
    for dim, ax in zip(shape, parts):
        if ax is None:
            fixed.append(None)
        else:
            size = mesh.shape[ax]
            fixed.append(ax if dim % size == 0 else None)
    return P(*fixed)


def shard_tree(tree, mesh: Mesh, rules) -> Dict:
    """NamedSharding pytree for ``tree`` per path rules (rank/divisibility
    repaired per-leaf)."""
    paths, treedef = _tree_paths(tree)
    shardings = []
    for path, leaf in paths:
        spec = _match_spec(path, rules)
        spec = _shrink_spec(spec, getattr(leaf, "shape", ()), mesh)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params(params, mesh: Mesh, rules=DECODER_PARAM_RULES):
    """Place a param tree on the mesh per rules (device_put)."""
    shardings = shard_tree(params, mesh, rules)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh, seq_parallel: bool = False) -> NamedSharding:
    """Input batch (B, S, ...): batch over (host, data) — DP spans DCN —
    optionally sequence over seq (ICI)."""
    return NamedSharding(
        mesh, P(("host", "data"), "seq" if seq_parallel else None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
