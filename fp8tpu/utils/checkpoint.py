"""Checkpoint / resume.

Parity with the reference's example-level checkpointing — which saves
model/optimizer/epoch plus the quantization config dict
(imagenet_qat.py:209-219) and realigns step-scheduled telemetry on resume
(mpt_emu.py:72-73) — done TPU-native with Orbax: the checkpoint carries
(params, opt_state, step, SR base key) and the policy as JSON, so a
resumed run reproduces the same stochastic-rounding streams
(counter-based keys ⇒ deterministic resume, SURVEY.md §5.4)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False

from fp8tpu.quant.config import ModuleQuantConfig, TensorQuantConfig
from fp8tpu.quant.policy import LayerKind, QuantPolicy


# -- policy (de)serialization ------------------------------------------------

def _tcfg_to_dict(c: Optional[TensorQuantConfig]):
    if c is None:
        return None
    return {"dtype": c.dtype, "scheme": c.scheme, "scaling": c.scaling,
            "group_size": c.group_size, "block_size": c.block_size,
            "channel_axis": c.channel_axis, "cast_impl": c.cast_impl}


def _tcfg_from_dict(d):
    return None if d is None else TensorQuantConfig(**d)


def policy_to_json(policy: QuantPolicy) -> str:
    mq = policy.default
    return json.dumps({
        "default": {r: _tcfg_to_dict(mq.role(r))
                    for r in ("wt", "iact", "oact", "wtgrad", "igrad",
                              "ograd")},
        "patch_ops": mq.patch_ops,
        "emb": _tcfg_to_dict(policy.emb),
        "whitelist": [k.value for k in policy.whitelist],
        "exempt_layers": list(policy.exempt_layers),
        "output_fused_layers": list(policy.output_fused_layers),
        "overrides": [
            [pat, None if cfg is None else
             {r: _tcfg_to_dict(cfg.role(r))
              for r in ("wt", "iact", "oact", "wtgrad", "igrad", "ograd")}]
            for pat, cfg in policy.overrides],
        "is_training": policy.is_training,
        "name": policy.name,
    })


def policy_from_json(s: str) -> QuantPolicy:
    d = json.loads(s)
    default = ModuleQuantConfig(
        patch_ops=d.get("patch_ops", False),
        **{r: _tcfg_from_dict(v) for r, v in d["default"].items()})
    overrides = tuple(
        (pat, None if cfg is None else ModuleQuantConfig(
            **{r: _tcfg_from_dict(v) for r, v in cfg.items()}))
        for pat, cfg in d.get("overrides", []))
    return QuantPolicy(
        default=default,
        emb=_tcfg_from_dict(d.get("emb")),
        whitelist=tuple(LayerKind(k) for k in d["whitelist"]),
        exempt_layers=tuple(d.get("exempt_layers", ())),
        output_fused_layers=tuple(d.get("output_fused_layers", ())),
        overrides=overrides,
        is_training=d.get("is_training", False),
        name=d.get("name", "custom"),
    )


# -- checkpoint save/restore --------------------------------------------------

def save_checkpoint(directory: str, step: int, params,
                    opt_state=None, policy: Optional[QuantPolicy] = None,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save a training/serving checkpoint.  Uses Orbax when available,
    else an npz+json fallback (no pip installs assumed)."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    meta = {"step": step}
    if policy is not None:
        meta["policy"] = policy_to_json(policy)
    if extra:
        meta["extra"] = extra
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(meta, f)

    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state

    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(directory, f"state_{step}")
        ckptr.save(path, state)
        ckptr.wait_until_finished()
        return path

    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp): np.asarray(v) for kp, v in flat}
    path = os.path.join(directory, f"state_{step}.npz")
    np.savez(path, **arrays)
    return path


def save_serve_artifact(directory: str, params, cfg) -> str:
    """Persist a SERVING artifact: the quantized parameter tree
    (fp8/int8/int4 payloads + scales) plus its ServeConfig, fully
    self-describing — load needs no model code to rebuild a template.

    The reference has no serving path; its closest analog is the QAT
    checkpoint carrying ``model_qconfig_dict``
    (/root/reference/examples/inference/classifier/imagenet_qat.py:209-219).
    """
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def name(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)

    manifest = {name(kp): [list(v.shape), str(v.dtype)] for kp, v in flat}
    meta = {
        "manifest": manifest,
        "serve_config": {
            "model": dataclasses.asdict(cfg.model),
            **{f.name: getattr(cfg, f.name)
               for f in dataclasses.fields(cfg) if f.name != "model"},
        },
    }
    with open(os.path.join(directory, "serve_meta.json"), "w") as f:
        json.dump(meta, f)

    def tostore(v):
        a = np.asarray(v)
        # npz writes ml_dtypes extension types (fp8, bf16) as opaque
        # void bytes; store their raw bytes explicitly instead and
        # rebuild the dtype from the manifest on load.
        if a.dtype.kind not in "fiub":
            return a.view(np.uint8)
        return a

    arrays = {name(kp): tostore(v) for kp, v in flat}
    path = os.path.join(directory, "serve_params.npz")
    np.savez(path, **arrays)
    return path


def load_serve_artifact(directory: str):
    """Load (params, ServeConfig) saved by :func:`save_serve_artifact`."""
    import jax.numpy as jnp

    from fp8tpu.models.transformer import DecoderConfig
    from fp8tpu.serve.model import ServeConfig

    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "serve_meta.json")) as f:
        meta = json.load(f)
    sc = dict(meta["serve_config"])
    model = DecoderConfig(**sc.pop("model"))
    cfg = ServeConfig(model=model, **sc)

    data = np.load(os.path.join(directory, "serve_params.npz"))
    params: Dict[str, Any] = {}
    for name, (shape, dtype) in meta["manifest"].items():
        raw = data[name]
        target = np.dtype(jnp.dtype(dtype))
        if raw.dtype != target:       # bytes-stored extension dtype
            raw = raw.view(target)
        arr = jnp.asarray(raw.reshape(shape))
        node = params
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return params, cfg


def restore_checkpoint(directory: str, step: int, template) -> Dict:
    """Restore (state, meta).  ``template`` is a pytree with the target
    structure (abstract or concrete)."""
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "meta.json")) as f:
        meta = json.load(f)
    if "policy" in meta:
        meta["policy"] = policy_from_json(meta["policy"])

    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(os.path.join(directory, f"state_{step}"),
                              template)
        return {"state": state, "meta": meta}

    data = np.load(os.path.join(directory, f"state_{step}.npz"))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, leaf in flat:
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in kp)
        leaves.append(jax.numpy.asarray(data[name]))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return {"state": state, "meta": meta}
