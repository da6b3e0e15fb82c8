"""Quantizable op wrappers.

Flax equivalents of the reference's ``module_wrappers`` (matmul.py,
eltwise.py, aggregate.py): thin named modules that turn functional ops
into interceptable call sites, so attention score matmuls, residual adds,
etc. get per-layer quantization policy by path — exactly how the
reference's BERT example rewrites ``torch.matmul`` onto
``module_wrappers.Matmul`` (examples/inference/bert/modeling_bert.py:
251-252, 370, 450).

(The reference's ``EltwiseMul.__init__`` has a NameError typo,
eltwise.py:33 — not ported.)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Matmul(nn.Module):
    """y = a @ b (module_wrappers/matmul.py:20)."""

    def __call__(self, a, b):
        return jnp.matmul(a, b)


class AddMatmul(nn.Module):
    """y = inp + a @ b (module_wrappers/matmul.py addmm analog)."""

    def __call__(self, inp, a, b):
        return inp + jnp.matmul(a, b)


class BatchMatmul(nn.Module):
    """Batched matmul; policy quantizes inputs only (e4m3_emu.py:124-129)."""

    def __call__(self, a, b):
        return jnp.matmul(a, b)


class EltwiseAdd(nn.Module):
    def __call__(self, a, b):
        return a + b


class EltwiseMul(nn.Module):
    def __call__(self, a, b):
        return a * b


class EltwiseDiv(nn.Module):
    def __call__(self, a, b):
        return a / b


class Norm(nn.Module):
    """p-norm reduction (module_wrappers/aggregate.py:19)."""

    ord: int = 2
    axis: int = -1
    keepdims: bool = False

    def __call__(self, x):
        return jnp.linalg.norm(x, ord=self.ord, axis=self.axis,
                               keepdims=self.keepdims)


class Mean(nn.Module):
    """Mean reduction (module_wrappers/aggregate.py:33)."""

    axis: int = -1
    keepdims: bool = False

    def __call__(self, x):
        return jnp.mean(x, axis=self.axis, keepdims=self.keepdims)
