"""Quantization interception for arbitrary Flax models.

The TPU-native replacement for the reference's PyTorch module hooks
(qutils.py:618-633): instead of mutating modules with
forward_pre/forward/backward hooks, a `flax.linen.intercept_methods`
interceptor wraps every module call during tracing.  Because interception
happens at trace time, the quantized model jits into one fused XLA
computation — there is no per-module Python overhead at run time, unlike
the reference whose hooks execute Python + a kernel launch per tensor per
step (SURVEY.md §3.3).

Role mapping (identical to qutils.py:478-633):
  iact  → inputs fake-quantized before the module body
  wt    → parameters fake-quantized by :func:`quantize_params` (inference:
          once, ahead of time; training: inside the step, equivalent to
          the reference's forward_pre_hook on live weights)
  oact  → outputs fake-quantized after the module body
  igrad → gradient wrt module inputs, quantized on the backward pass
  ograd → gradient wrt module outputs, quantized on the backward pass
  wtgrad→ gradient wrt weights (applied by the training wrapper)

Gradient-stream quantization uses identity-forward / cast-backward
custom_vjp nodes — the functional equivalent of
``tensor.register_hook`` (qutils.py:159-189).
"""

from __future__ import annotations

import zlib
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from fp8tpu.numerics.formats import FORMATS
from .config import ModuleQuantConfig, TensorQuantConfig
from .fakequant import fake_quant, quantize_grad
from .policy import LayerKind, QuantPolicy


# ---------------------------------------------------------------------------
# Module classification
# ---------------------------------------------------------------------------

def classify_module(module: nn.Module) -> LayerKind:
    """Map a Flax module to a LayerKind (the analog of the reference's
    isinstance checks against its torch whitelist, e5m2_emu.py:27-32)."""
    # Defer import: ops depends on quant.
    from fp8tpu.ops import wrappers as _w

    if isinstance(module, _w.BatchMatmul):
        return LayerKind.BATCH_MATMUL
    if isinstance(module, (_w.Matmul, _w.AddMatmul)):
        return LayerKind.MATMUL
    if isinstance(module, (_w.EltwiseAdd, _w.EltwiseMul, _w.EltwiseDiv)):
        return LayerKind.ELTWISE
    if isinstance(module, (_w.Norm, _w.Mean)):
        return LayerKind.NORM_OP
    if isinstance(module, nn.Dense):
        return LayerKind.DENSE
    if isinstance(module, nn.Conv):
        return LayerKind.CONV
    if isinstance(module, nn.Embed):
        return LayerKind.EMBED
    if isinstance(module, nn.LayerNorm):
        return LayerKind.LAYERNORM
    return LayerKind.OTHER


def path_str(module: nn.Module) -> str:
    return "/".join(str(p) for p in module.path)


def module_key(path: str) -> int:
    """Stable per-module PRNG stream id (replaces the reference's 16 global
    seed states with a counter-based scheme, SURVEY.md §5.2)."""
    return zlib.crc32(path.encode()) & 0x7FFFFFFF


# ---------------------------------------------------------------------------
# Gradient-stream cast: identity forward, quantize backward
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_cast(x, cfg: Optional[TensorQuantConfig], key):
    """Identity on the forward pass; quantizes the cotangent on the way
    back (functional register_hook, qutils.py:159-189)."""
    return x


def _gc_fwd(x, cfg, key):
    return x, key


def _gc_bwd(cfg, key, g):
    # Cotangent dtype must match the primal's: the fake-quant pipeline
    # emits f32, but when no forward cast upcast the graph (e.g. the
    # bwd-only diagnostic recipe on a bf16 model) the primal stream is
    # bf16 and a raw f32 cotangent poisons downstream backward muls.
    return (quantize_grad(g, cfg, key).astype(g.dtype), None)


grad_cast.defvjp(_gc_fwd, _gc_bwd)


# ---------------------------------------------------------------------------
# The interceptor
# ---------------------------------------------------------------------------

def _is_float_array(x) -> bool:
    return isinstance(x, (jax.Array, jnp.ndarray)) and jnp.issubdtype(
        getattr(x, "dtype", None), jnp.floating
    )


def _map_float_args(fn, args):
    return tuple(fn(a) if _is_float_array(a) else a for a in args)


def make_quant_interceptor(
    policy: QuantPolicy,
    key: Optional[jax.Array] = None,
    stats_sink: Optional[Dict[str, Dict[str, Any]]] = None,
    classify: Callable[[nn.Module], LayerKind] = classify_module,
    per_channel_stats: bool = False,
):
    """Build an intercept_methods callback applying ``policy``.

    ``key``        PRNG key for stochastic rounding (folded per module).
    ``stats_sink`` if given, per-module activation min/max/absmax are
                   recorded into it during tracing (the calibration sweep
                   — stats_collector.py observers, but as jit side
                   outputs rather than stateful submodules).
    ``per_channel_stats`` additionally records last-axis per-channel
                   min/max/absmax (ChannleWiseMinMaxStats,
                   stats_collector.py:307-341).
    """

    def _chan(a):
        axes = tuple(range(a.ndim - 1))
        return axes

    def interceptor(next_fun, args, kwargs, context):
        if context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        module = context.module
        if module.path == ():  # the root model itself
            return next_fun(*args, **kwargs)
        kind = classify(module)
        path = path_str(module)
        cfg = policy.resolve(path, kind)
        if cfg is None and stats_sink is None:
            return next_fun(*args, **kwargs)

        def mod_key(tag: int):
            if key is None:
                return None
            return jax.random.fold_in(key, module_key(path) ^ tag)

        if stats_sink is not None:
            rec = stats_sink.setdefault(path, {"kind": kind.value})
            flat = [a for a in args if _is_float_array(a)]
            if flat:
                rec["iact_min"] = jnp.minimum(
                    rec.get("iact_min", jnp.inf),
                    jnp.min(jnp.stack([jnp.min(a) for a in flat])))
                rec["iact_max"] = jnp.maximum(
                    rec.get("iact_max", -jnp.inf),
                    jnp.max(jnp.stack([jnp.max(a) for a in flat])))
                rec["iact_absmax"] = jnp.maximum(
                    rec.get("iact_absmax", 0.0),
                    jnp.max(jnp.stack([jnp.max(jnp.abs(a)) for a in flat])))
                if per_channel_stats:
                    # EVERY float operand gets channelwise stats — the
                    # reference's ChannelWise observer attaches per
                    # module regardless of arity, so a wrapped
                    # Matmul/BatchMatmul's second operand is observed
                    # too (VERDICT r2 weak #9).  Operand 0 keeps the
                    # legacy key names; operand i >= 1 uses iact{i}_ch_*.
                    for i, a in enumerate(flat):
                        pre = "iact_ch" if i == 0 else f"iact{i}_ch"
                        rec[f"{pre}_min"] = jnp.minimum(
                            rec.get(f"{pre}_min", jnp.inf),
                            jnp.min(a, axis=_chan(a)))
                        rec[f"{pre}_max"] = jnp.maximum(
                            rec.get(f"{pre}_max", -jnp.inf),
                            jnp.max(a, axis=_chan(a)))
                        rec[f"{pre}_absmax"] = jnp.maximum(
                            rec.get(f"{pre}_absmax", 0.0),
                            jnp.max(jnp.abs(a), axis=_chan(a)))

        # Patched path requires engine-expressible iact scaling: the fused
        # kernel's operand scale is per-tensor, so per-channel/fine-grained
        # configs stay on the unpatched path (ADVICE r1).
        engine_ok = (cfg is not None and cfg.patch_ops and not kwargs
                     and (cfg.iact is None
                          or cfg.iact.scaling in ("none", "per-tensor")))
        patched = engine_ok and kind in (LayerKind.MATMUL,
                                         LayerKind.BATCH_MATMUL)
        # Conv routes through the engine too (the reference patches
        # torch.conv2d onto the C-model, qutils.py:499-509) when the
        # module's geometry is engine-expressible.
        patched_conv = False
        if engine_ok and kind == LayerKind.CONV and len(args) == 1:
            from .hw_patch import conv_patchable
            patched_conv = conv_patchable(module)
        patched = patched or patched_conv
        # On the patched path the engine quantizes the two contraction
        # operands in-register; pre-casting them here would double-quantize
        # (not idempotent for stochastic schemes).  Any other inputs (the
        # additive term of AddMatmul) still get the iact cast, matching the
        # reference hooks which quantize every input (qutils.py:528-534).
        if cfg is not None and cfg.iact is not None:
            if patched:
                ncontr = len(args) - 2
                args = tuple(
                    fake_quant(a, cfg.iact, mod_key(1))
                    if (i < ncontr and _is_float_array(a)) else a
                    for i, a in enumerate(args))
            else:
                args = _map_float_args(
                    lambda a: fake_quant(a, cfg.iact, mod_key(1)), args)
        if cfg is not None and cfg.igrad is not None:
            args = _map_float_args(
                lambda a: grad_cast(a, cfg.igrad, mod_key(2)), args)

        if patched_conv:
            # HW-patched conv: im2col + engine matmul; weights come from
            # the module's (already wt-quantized) params.
            from .hw_patch import engine_conv
            p = module.variables["params"]
            bias = p.get("bias") if module.use_bias else None
            out = engine_conv(args[0], p["kernel"], bias, module.strides,
                              module.padding, cfg, mod_key(5))
        elif patched:
            # HW-patched path: the contraction runs through the fused
            # Pallas engine with the iact casts done in-register
            # (enable_hw_patching analog; qutils.py:480-509).
            from .hw_patch import engine_matmul
            if len(args) == 3:          # AddMatmul(inp, a, b)
                out = args[0] + engine_matmul(args[1], args[2], cfg,
                                              mod_key(5))
            else:                       # Matmul / BatchMatmul (a, b)
                out = engine_matmul(args[0], args[1], cfg, mod_key(5))
        else:
            out = next_fun(*args, **kwargs)

        if stats_sink is not None and _is_float_array(out):
            rec = stats_sink.setdefault(path, {"kind": kind.value})
            rec["oact_min"] = jnp.minimum(rec.get("oact_min", jnp.inf),
                                          jnp.min(out))
            rec["oact_max"] = jnp.maximum(rec.get("oact_max", -jnp.inf),
                                          jnp.max(out))
            rec["oact_absmax"] = jnp.maximum(rec.get("oact_absmax", 0.0),
                                             jnp.max(jnp.abs(out)))

        if cfg is not None and _is_float_array(out):
            if cfg.ograd is not None:
                out = grad_cast(out, cfg.ograd, mod_key(3))
            if cfg.oact is not None:
                out = fake_quant(out, cfg.oact, mod_key(4))
        return out

    return interceptor


# ---------------------------------------------------------------------------
# Module table + weight quantization
# ---------------------------------------------------------------------------

def build_module_table(model: nn.Module, variables, *args,
                       method=None, **kwargs) -> Dict[str, LayerKind]:
    """Trace one apply to record every submodule path → LayerKind (the
    analog of iterating model.named_modules(), qutils.py:351-365).
    Runs under eval_shape: no device compute."""
    table: Dict[str, LayerKind] = {}

    def spy(next_fun, a, kw, context):
        if context.method_name == "__call__" and context.module.path != ():
            table[path_str(context.module)] = classify_module(context.module)
        return next_fun(*a, **kw)

    def run(variables, *a):
        with nn.intercept_methods(spy):
            return model.apply(variables, *a, method=method, **kwargs)

    jax.eval_shape(run, variables, *args)
    return table


_WEIGHT_NAMES = ("kernel", "embedding", "scale")


def quantize_params(
    params,
    policy: QuantPolicy,
    module_table: Dict[str, LayerKind],
    key: Optional[jax.Array] = None,
):
    """Fake-quantize model parameters per policy (quantize_model_weights,
    qutils.py:458-475).  Biases are never quantized (matching the
    reference, which only touches module.weight)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    out = []
    for kp, leaf in flat:
        names = [getattr(k, "key", str(k)) for k in kp]
        if names and names[0] == "params":
            names = names[1:]
        path = "/".join(names[:-1])
        leaf_name = names[-1] if names else ""
        kind = module_table.get(path)
        cfg = policy.resolve(path, kind) if kind is not None else None
        if (cfg is not None and cfg.wt is not None
                and leaf_name in _WEIGHT_NAMES):
            k = (jax.random.fold_in(key, module_key(path))
                 if key is not None else None)
            leaf = fake_quant(leaf, cfg.wt, k)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def quantized_apply(
    model: nn.Module,
    policy: QuantPolicy,
    variables,
    *args,
    key: Optional[jax.Array] = None,
    quantize_weights: bool = True,
    module_table: Optional[Dict[str, LayerKind]] = None,
    method=None,
    **kwargs,
):
    """One-shot quantized forward: weights + activations per policy.
    For repeated use, wrap in jax.jit — everything in here is traceable."""
    if module_table is None:
        module_table = build_module_table(model, variables, *args,
                                          method=method, **kwargs)
    if quantize_weights:
        wkey = jax.random.fold_in(key, 0xE0) if key is not None else None
        variables = quantize_params(variables, policy, module_table, wkey)
    interceptor = make_quant_interceptor(policy, key=key)
    with nn.intercept_methods(interceptor):
        return model.apply(variables, *args, method=method, **kwargs)
