"""Mixed-precision FP8 training (capability parity with mpt_emu.initialize).

The reference trains with apex-O2 FP32 master weights and, after each
optimizer step, stochastically requantizes the master copy to FP16 (and
embeddings optionally to row-block-normalized FP8)
(e5m2_emu.py:111-233, mpt_emu.py:146-191).  Here the same recipe is a
pure function pipeline around any optax optimizer:

    grads  = grad(quantized forward)           # fwd/bwd casts per policy
    grads  = quantize_wtgrads(grads)           # wtgrad role (qutils.py:175-189)
    params = optax.apply_updates(...)
    params = master_requant(params)            # FLOAT16_STOCHASTIC + emb FP8

Stochastic rounding streams are counter-based: every step folds
(step, module path) into the user key, giving reproducible multi-host
training (SURVEY.md §5.2) instead of the reference's 16 global seeds.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from fp8tpu.numerics.formats import RoundMode
from fp8tpu.quant.config import TensorQuantConfig
from fp8tpu.quant.fakequant import fake_quant
from fp8tpu.quant.interceptor import (
    build_module_table,
    make_quant_interceptor,
    module_key,
    quantize_params,
)
from fp8tpu.quant.policy import LayerKind, QuantPolicy, get_policy

MASTER_CFGS = {
    "fp32": None,
    "fp16": TensorQuantConfig("float16", "stochastic", cast_impl="hw"),
    "float16": TensorQuantConfig("float16", "stochastic", cast_impl="hw"),
    "e5m2": TensorQuantConfig("e5m2", "stochastic", cast_impl="hw"),
}

EMB_CFGS = {
    None: None,
    "e5m2": TensorQuantConfig("e5m2", "stochastic", "per-block"),
    "e4m3": TensorQuantConfig("e4m3", "stochastic", "per-block"),
    "e3m4": TensorQuantConfig("e3m4", "stochastic", "per-block"),
}


def _param_entries(params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    entries = []
    for kp, leaf in flat:
        names = [getattr(k, "key", str(k)) for k in kp]
        if names and names[0] == "params":
            names = names[1:]
        entries.append(("/".join(names[:-1]), names[-1], leaf))
    return entries, treedef


def master_requant(
    params,
    module_table: Dict[str, LayerKind],
    key: jax.Array,
    master_fmt: str = "fp16",
    emb_fmt: Optional[str] = None,
):
    """Requantize master params after the optimizer update
    (update_fp16_master_params, e5m2_emu.py:111-177).

    Embeddings optionally cast to FP8 with per-row block-norm scaling —
    the block is the embedding row, matching e5m2_emu.py:119-137 where
    block_size = param.size()[1].
    """
    master_cfg = MASTER_CFGS[master_fmt]
    emb_cfg = EMB_CFGS[emb_fmt]
    entries, treedef = _param_entries(params)
    out = []
    for path, leaf_name, leaf in entries:
        kind = module_table.get(path)
        k = jax.random.fold_in(key, module_key(f"{path}/{leaf_name}"))
        if (emb_cfg is not None and kind == LayerKind.EMBED
                and leaf.ndim == 2):
            cfg = dataclasses.replace(emb_cfg, block_size=leaf.shape[1])
            leaf = fake_quant(leaf, cfg, k)
        elif master_cfg is not None and jnp.issubdtype(leaf.dtype,
                                                       jnp.floating):
            leaf = fake_quant(leaf, master_cfg, k)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def quantize_wtgrads(grads, policy: QuantPolicy,
                     module_table: Dict[str, LayerKind], key: jax.Array):
    """Apply the wtgrad role to weight gradients (the reference's
    weight.register_hook → quantize_weight_grad, qutils.py:173-189)."""
    entries, treedef = _param_entries(grads)
    out = []
    for path, leaf_name, leaf in entries:
        kind = module_table.get(path)
        cfg = policy.resolve(path, kind) if kind is not None else None
        if cfg is not None and cfg.wtgrad is not None and leaf_name in (
                "kernel", "embedding", "scale"):
            k = jax.random.fold_in(key, module_key(f"{path}/{leaf_name}"))
            leaf = fake_quant(leaf, cfg.wtgrad, k)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


@dataclasses.dataclass
class MPTEmulator:
    """Facade bundling policy + tables + master-precision settings — the
    TPU-native analog of mpemu.mpt_emu.MPTEmulator (mpt_emu.py:29-120).
    Stateless: all tensor state lives in the caller's train state."""

    model: nn.Module
    policy: QuantPolicy
    module_table: Dict[str, LayerKind]
    master_fmt: str = "fp16"
    emb_fmt: Optional[str] = None

    # -- reference API parity ------------------------------------------
    def set_master_param_precision(self, fmt: str) -> "MPTEmulator":
        return dataclasses.replace(self, master_fmt=fmt)

    def set_embedding_precision(self, fmt: Optional[str],
                                emb_norm: bool = True) -> "MPTEmulator":
        return dataclasses.replace(self, emb_fmt=fmt)

    def blacklist_modules(self, *patterns: str) -> "MPTEmulator":
        return dataclasses.replace(
            self, policy=self.policy.with_exempt(*patterns))

    # -- the three training hooks ---------------------------------------
    def apply_quantized(self, variables, *args, key=None, **kwargs):
        """Forward with weight + activation + grad-stream casts applied
        (the hooked forward, SURVEY.md §3.3)."""
        variables = quantize_params(
            variables, self.policy, self.module_table,
            jax.random.fold_in(key, 1) if key is not None else None)
        interceptor = make_quant_interceptor(self.policy, key=key)
        with nn.intercept_methods(interceptor):
            return self.model.apply(variables, *args, **kwargs)

    def quantize_grads(self, grads, key):
        return quantize_wtgrads(grads, self.policy, self.module_table, key)

    def post_update(self, params, key):
        return master_requant(params, self.module_table, key,
                              self.master_fmt, self.emb_fmt)


def initialize(
    model: nn.Module,
    variables,
    sample_args: tuple,
    training_algo: str = "hybrid",
    master_fmt: str = "fp16",
    emb_fmt: Optional[str] = None,
    exempt_layers: tuple = (),
) -> MPTEmulator:
    """FP8 mixed-precision training setup (mpt_emu.initialize,
    mpt_emu.py:146-191).  ``training_algo``: 'direct' (all-E5M2) or
    'hybrid' (E4M3 fwd / E5M2 bwd) or 'bfloat16'."""
    policy = get_policy(training_algo, training=True)
    if exempt_layers:
        policy = policy.with_exempt(*exempt_layers)
    table = build_module_table(model, variables, *sample_args)
    return MPTEmulator(model=model, policy=policy, module_table=table,
                       master_fmt=master_fmt, emb_fmt=emb_fmt)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LossScaleState:
    """Dynamic loss-scale carry (apex amp DynamicLossScaler semantics:
    halve on overflow, double after ``growth_interval`` clean steps —
    the role apex's ``scale_loss`` plays in the reference recipe,
    main_amp.py:404-405)."""

    scale: jax.Array        # () f32 current loss scale
    good_steps: jax.Array   # () int32 consecutive finite steps


def init_train_state(optimizer: optax.GradientTransformation, params,
                     loss_scale: Optional[float] = 2.0 ** 12):
    """Initial ``opt_state`` for :func:`make_train_step`: the optax state
    wrapped with the dynamic loss-scale carry (or bare when scaling is
    disabled with ``loss_scale=None``)."""
    inner = optimizer.init(params)
    if loss_scale is None:
        return inner
    return inner, LossScaleState(scale=jnp.float32(loss_scale),
                                 good_steps=jnp.zeros((), jnp.int32))


def make_train_step(
    emulator: MPTEmulator,
    optimizer: optax.GradientTransformation,
    loss_fn: Callable[..., jax.Array],
    loss_scale: Optional[float] = 2.0 ** 12,
    growth_interval: int = 2000,
    max_scale: float = 2.0 ** 24,
    min_scale: float = 1.0,
):
    """Build a jittable train step running the full MPT pipeline.

    ``loss_fn(apply_fn, variables, batch)`` where apply_fn is the
    quantized forward.  Returns step(params, opt_state, batch, key) →
    (params, opt_state, loss), with ``opt_state`` built by
    :func:`init_train_state`.

    Loss scaling is DYNAMIC (apex DynamicLossScaler semantics,
    main_amp.py:404-405): the loss is multiplied by the carried scale
    before backward so the fp8/fp16-cast gradient streams
    (igrad/ograd/wtgrad roles) see values above their flush thresholds
    (without it small gradients flush to zero in E5M2/FP16 and training
    stalls once past the initial large-gradient phase).  Gradients are
    unscaled AFTER the quantized streams (matching apex O2: hooks see
    scaled grads, the FP32 master update sees unscaled ones).  On a
    non-finite gradient the step is a TRUE skip — params, optimizer
    moments and schedule count all stay untouched — and the scale
    halves; after ``growth_interval`` consecutive clean steps it
    doubles (capped at ``max_scale``).  ``loss_scale=None`` disables
    scaling entirely (``loss_scale`` seeds the initial scale).
    """
    use_scale = loss_scale is not None

    def step(params, opt_state, batch, key):
        kf, kg, km = jax.random.split(key, 3)
        # init_train_state and make_train_step take loss_scale
        # independently; a mismatch fails deep inside optax with an
        # opaque tree error — catch it at the boundary instead.
        is_wrapped = (isinstance(opt_state, tuple) and len(opt_state) == 2
                      and isinstance(opt_state[1], LossScaleState))
        if use_scale != is_wrapped:
            raise ValueError(
                f"loss_scale mismatch: make_train_step(loss_scale="
                f"{'on' if use_scale else 'None'}) but init_train_state "
                f"produced a {'wrapped' if is_wrapped else 'bare'} "
                f"opt_state — pass the same loss_scale to both")
        if use_scale:
            inner_state, ls = opt_state
            scale = ls.scale
        else:
            inner_state, scale = opt_state, None

        def loss_of(p):
            loss = loss_fn(
                lambda v, *a, **kw: emulator.apply_quantized(
                    v, *a, key=kf, **kw),
                p, batch)
            return loss * scale if scale is not None else loss

        loss, grads = jax.value_and_grad(loss_of)(params)
        grads = emulator.quantize_grads(grads, kg)
        if scale is not None:
            loss = loss / scale
            grads = jax.tree_util.tree_map(
                lambda g: (g / scale).astype(g.dtype), grads)
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g))
             for g in jax.tree_util.tree_leaves(grads)]))
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
        updates, new_inner = optimizer.update(grads, inner_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = emulator.post_update(new_params, km)
        # TRUE skip on overflow: params AND optimizer state (moments,
        # schedule count) revert — the update never happened.
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old),
            new_params, params)
        inner_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(finite, new, old)
            if isinstance(new, jnp.ndarray) or hasattr(new, "dtype")
            else new,
            new_inner, inner_state)
        if not use_scale:
            return params, inner_state, loss
        good = jnp.where(finite, ls.good_steps + 1, 0)
        grow = good >= growth_interval
        new_scale = jnp.where(
            finite,
            jnp.where(grow, jnp.minimum(ls.scale * 2.0, max_scale),
                      ls.scale),
            jnp.maximum(ls.scale * 0.5, min_scale))
        ls = LossScaleState(scale=new_scale,
                            good_steps=jnp.where(grow, 0, good))
        return params, (inner_state, ls), loss

    return step
