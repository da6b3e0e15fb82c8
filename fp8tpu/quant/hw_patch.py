"""Fused-engine matmul routing — the TPU analog of the reference's
"HW patching" C-model (qutils.py:478-509 monkey-patches torch.addmm/
matmul/mm onto mpemu.cmodel.simple's blocked 16x16x64 GEMM engine).

On TPU the MXU *is* the systolic engine, so "patching" a module means
computing its contraction through the fused Pallas ``qdq_matmul`` kernel
(operands fake-quantized in-register per policy, fp32 tile accumulate)
instead of separate fake-quant casts around a plain dot.  The backward
pass issues two more engine matmuls with transpose bookkeeping — the
same structure as the C-model's autograd (cmodel/simple.py:124-146) —
with straight-through gradients w.r.t. the quantization.

Interpret mode runs the same kernel on CPU (tests / non-TPU backends).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from fp8tpu.kernels.qmatmul import qdq_matmul
from fp8tpu.numerics import scaling as _scaling
from fp8tpu.numerics.formats import FORMATS
from .config import ModuleQuantConfig, TensorQuantConfig


def _fmt_args(cfg: Optional[TensorQuantConfig]):
    if cfg is None:
        return None, None
    return cfg.dtype, cfg.round_mode


def _operand_scale(x, cfg: Optional[TensorQuantConfig]):
    """Per-tensor engine scale matching fake_quant's scaling grammar
    (per-channel/grouped scales stay on the unpatched path)."""
    if cfg is None or cfg.scaling == "none":
        return 1.0
    return _scaling.per_tensor(x, FORMATS[cfg.dtype], cfg.method)


def _seed_of(key: Optional[jax.Array]) -> jax.Array:
    if key is None:
        return jnp.zeros((), jnp.int32)
    return jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def patched_matmul(a: jax.Array, b: jax.Array, seed: jax.Array,
                   cfg: ModuleQuantConfig,
                   interpret: bool = False) -> jax.Array:
    """2-D ``qdq(a) @ qdq(b)`` through the fused engine kernel.

    Both operands use the module's ``iact`` role config (the reference's
    C-model runs under hooks that quantized inputs; batchmatmul policy
    quantizes inputs only, e4m3_emu.py:124-129).

    ``seed`` is a regular (traced) int32 operand — not a nondiff static —
    so keyed stochastic configs work under jit (ADVICE r1).
    """
    return _forward(a, b, seed, cfg, interpret)


def _impl_of(cfg_t: Optional[TensorQuantConfig]) -> str:
    """The engine kernel honors the role config's cast_impl: training
    presets default to "hw" (native convert + full-rate bf16 MXU dot);
    "bitexact" keeps the reference-parity bit pipeline in-kernel."""
    return "hw" if (cfg_t is not None and cfg_t.cast_impl == "hw") \
        else "bitexact"


def _forward(a, b, seed, cfg, interpret):
    fmt, mode = _fmt_args(cfg.iact)
    out = qdq_matmul(a, b, fmt_x=fmt, mode_x=mode, fmt_w=fmt, mode_w=mode,
                     scale_x=_operand_scale(a, cfg.iact),
                     scale_w=_operand_scale(b, cfg.iact),
                     seed=seed, out_dtype=jnp.float32, interpret=interpret,
                     impl=_impl_of(cfg.iact))
    return out.astype(a.dtype)


def _fwd(a, b, seed, cfg, interpret):
    return _forward(a, b, seed, cfg, interpret), (a, b)


def _requant(x, cfg_t):
    """Re-derive the quantized operand for the backward: the reference's
    hooks quantize tensors in place, so its C-model backward consumes the
    quantized values (cmodel/simple.py:124-146).  RNE reproduces the
    in-kernel cast exactly; stochastic takes an independent unbiased draw
    (the on-chip per-tile stream is not replayable host-side)."""
    if cfg_t is None:
        return x.astype(jnp.float32)
    from .fakequant import fake_quant
    key = None
    if cfg_t.is_stochastic:
        key = jax.random.key(0)
    return fake_quant(x.astype(jnp.float32), cfg_t, key)


def _bwd(cfg, interpret, res, g):
    import numpy as np
    a, b = res
    gf = g.astype(jnp.float32)
    # Two engine matmuls over the (re-)quantized saved operands — the
    # gradient itself is not re-quantized (the C-model's backward runs
    # the plain tile engine); straight-through w.r.t. the casts.
    aq, bq = _requant(a, cfg.iact), _requant(b, cfg.iact)
    da = qdq_matmul(gf, bq.T, fmt_x=None, fmt_w=None, interpret=interpret)
    db = qdq_matmul(aq.T, gf, fmt_x=None, fmt_w=None, interpret=interpret)
    # Integer operand: cotangent is the symbolic-zero float0 type.
    dseed = np.zeros((), dtype=jax.dtypes.float0)
    return da.astype(a.dtype), db.astype(b.dtype), dseed


patched_matmul.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def patched_linear(x: jax.Array, w: jax.Array, seed: jax.Array,
                   cfg: ModuleQuantConfig,
                   interpret: bool = False) -> jax.Array:
    """2-D ``qdq(x) @ w`` through the fused engine: the activation is
    cast per the module's ``iact`` role in-register; the weight passes
    uncast because the wt role was already applied upstream by
    quantize_params — matching the reference where hooks quantize weights
    and inputs before the patched op consumes them (qutils.py:478-534)."""
    return _lin_forward(x, w, seed, cfg, interpret)


def _lin_forward(x, w, seed, cfg, interpret):
    fmt, mode = _fmt_args(cfg.iact)
    out = qdq_matmul(x, w, fmt_x=fmt, mode_x=mode, fmt_w=None,
                     scale_x=_operand_scale(x, cfg.iact),
                     seed=seed, out_dtype=jnp.float32, interpret=interpret,
                     impl=_impl_of(cfg.iact))
    return out.astype(x.dtype)


def _lin_fwd(x, w, seed, cfg, interpret):
    return _lin_forward(x, w, seed, cfg, interpret), (x, w)


def _lin_bwd(cfg, interpret, res, g):
    import numpy as np
    x, w = res
    gf = g.astype(jnp.float32)
    xq = _requant(x, cfg.iact)       # w is already wt-quantized upstream
    dx = qdq_matmul(gf, w.astype(jnp.float32).T, fmt_x=None, fmt_w=None,
                    interpret=interpret)
    dw = qdq_matmul(xq.T, gf, fmt_x=None, fmt_w=None, interpret=interpret)
    return (dx.astype(x.dtype), dw.astype(w.dtype),
            np.zeros((), dtype=jax.dtypes.float0))


patched_linear.defvjp(_lin_fwd, _lin_bwd)


def conv_patchable(module) -> bool:
    """Engine support guard for nn.Conv — the same restrictions the
    reference's C-model conv enforces before falling back to the framework
    op (cmodel/simple.py:98-103): 2-D, no dilation, no groups, uniform
    stride, SAME/VALID or symmetric explicit padding."""
    try:
        if len(module.kernel_size) != 2:
            return False
        if getattr(module, "feature_group_count", 1) != 1:
            return False
        for d in (module.kernel_dilation, module.input_dilation):
            if d not in (1, None) and tuple(d) != (1, 1):
                return False
        pad = module.padding
        if isinstance(pad, str):
            if pad.upper() not in ("SAME", "VALID"):
                return False
        return True
    except Exception:
        return False


def engine_conv(x: jax.Array, kernel: jax.Array, bias,
                strides, padding, cfg: ModuleQuantConfig,
                key: Optional[jax.Array] = None,
                interpret: Optional[bool] = None) -> jax.Array:
    """NHWC conv2d through the fused engine: im2col + engine matmul.

    The reference monkey-patches torch.conv2d onto its C-model engine
    (qutils.py:499-509; fwd/bp/wu at simple_conv2d_impl.cpp:373-670).
    Here the forward contraction is one engine matmul over the im2col
    patches; the backward falls out of autodiff: d(col) @ W^T and
    col^T @ g run through the engine matmul's custom VJP, and the
    im2col VJP is XLA's native col2im scatter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kh, kw, cin, cout = kernel.shape
    if isinstance(strides, int):
        strides = (strides, strides)
    B = x.shape[0]
    # Patches arrive channel-major: feature dim ordered (Cin, KH, KW).
    col = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.float32), (kh, kw), tuple(strides), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    oh, ow = col.shape[1], col.shape[2]
    w2d = kernel.astype(jnp.float32).transpose(2, 0, 1, 3).reshape(
        cin * kh * kw, cout)
    seed = _seed_of(key)
    out = patched_linear(col.reshape(B * oh * ow, cin * kh * kw), w2d,
                         seed, cfg, interpret)
    out = out.reshape(B, oh, ow, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def engine_matmul(a: jax.Array, b: jax.Array, cfg: ModuleQuantConfig,
                  key: Optional[jax.Array] = None,
                  interpret: Optional[bool] = None) -> jax.Array:
    """Shape-polymorphic entry: 2-D direct; batched via flattening the
    leading dims of ``a`` when ``b`` is 2-D, else per-slice (the C-model
    stacks per-slice GEMMs for batch matmul, cmodel/simple.py:56-67)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = _seed_of(key)
    if a.ndim == 2 and b.ndim == 2:
        return patched_matmul(a, b, seed, cfg, interpret)
    if b.ndim == 2:
        lead = a.shape[:-1]
        out = patched_matmul(a.reshape(-1, a.shape[-1]), b, seed, cfg,
                             interpret)
        return out.reshape(*lead, b.shape[-1])
    # batched x batched: flatten batch dims and map the 2-D engine.
    batch = a.shape[:-2]
    af = a.reshape((-1,) + a.shape[-2:])
    bf = jnp.broadcast_to(b, batch + b.shape[-2:]).reshape(
        (-1,) + b.shape[-2:])
    fn = lambda x, y: patched_matmul(x, y, seed, cfg, interpret)
    out = jax.lax.map(lambda ab: fn(*ab), (af, bf))
    return out.reshape(batch + out.shape[-2:])
