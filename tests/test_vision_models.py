"""VGG / MobileNet / Inception / DenseNet families: PTQ flow incl. the
depthwise-conv fallback on the hw-patched path and branchy/dense concat
topologies (reference sweep surface, launch.py:14-80)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fp8tpu
from fp8tpu.models import (DENSENET_EXEMPT, INCEPTION_EXEMPT,
                           MBCONV_EXEMPT, MOBILENET_EXEMPT,
                           RESNET_EXEMPT, SHUFFLENET_EXEMPT,
                           SQUEEZENET_EXEMPT, VGG_EXEMPT, tiny_densenet,
                           tiny_inception, tiny_mbconv, tiny_mobilenet,
                           tiny_resnext, tiny_shufflenet,
                           tiny_squeezenet, tiny_vgg, tiny_vit)
from fp8tpu.models import VIT_EXEMPT


@pytest.mark.parametrize("make,exempt", [
    (tiny_vgg, VGG_EXEMPT),
    (tiny_mobilenet, MOBILENET_EXEMPT),
    (tiny_inception, INCEPTION_EXEMPT),
    (tiny_densenet, DENSENET_EXEMPT),
    (tiny_shufflenet, SHUFFLENET_EXEMPT),
    (tiny_squeezenet, SQUEEZENET_EXEMPT),
    (tiny_mbconv, MBCONV_EXEMPT),
    (lambda n: tiny_mbconv(n, act="hardswish"), MBCONV_EXEMPT),
    (tiny_resnext, RESNET_EXEMPT),
    (tiny_vit, VIT_EXEMPT),
])
def test_family_ptq_flow(rng, make, exempt):
    model = make(8)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    qm = fp8tpu.quantize_model(model, variables, (x,), dtype="e4m3",
                               calibration_batches=[x],
                               list_exempt_layers=exempt)
    out = qm(x)
    assert out.shape == (4, 8)
    assert np.isfinite(np.asarray(out)).all()
    # PTQ output tracks the fp32 forward
    ref = model.apply(variables, x)
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())
    assert corr[0, 1] > 0.95


def test_mobilenet_depthwise_falls_back_under_patching(rng):
    """Depthwise convs (groups == channels) are outside the engine's
    geometry: with_hw_patching must route them to XLA's native conv
    (conv_patchable guard), matching cmodel/simple.py:98-103 fallback —
    and the forward must still run and match the unpatched path."""
    from fp8tpu.quant.hw_patch import conv_patchable
    from fp8tpu.quant.interceptor import quantized_apply
    from fp8tpu.quant.policy import e4m3_inference_policy
    import flax.linen as nn

    dw = nn.Conv(8, (3, 3), feature_group_count=8, use_bias=False)
    assert not conv_patchable(dw.bind({}))

    model = tiny_mobilenet(8)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    pol = e4m3_inference_policy(calibrated=False)
    plain = quantized_apply(model, pol, variables, x)
    patched = quantized_apply(model, pol.with_hw_patching(), variables, x)
    np.testing.assert_allclose(np.asarray(plain), np.asarray(patched),
                               rtol=5e-2, atol=5e-2)


def test_branchy_topologies_policy_resolution(rng):
    """Multi-branch (inception) and dense-concat (densenet) graphs:
    every conv/dense module must resolve a qconfig, exempt layers must
    resolve to None, and BN-fold + PTQ must run end to end (VERDICT r2
    next #9 — branchy topologies break path-based assumptions linear
    stacks never test)."""
    from fp8tpu.quant.interceptor import build_module_table
    from fp8tpu.quant.policy import e4m3_inference_policy

    for make, exempt in ((tiny_inception, INCEPTION_EXEMPT),
                         (tiny_densenet, DENSENET_EXEMPT)):
        model = make(8)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        variables = model.init(jax.random.key(0), x)
        table = build_module_table(model, variables, x)
        pol = e4m3_inference_policy().with_exempt(*exempt)
        names = [n for n in table]
        # the stem + classifier resolve to no quantization
        assert any("conv_stem" in n for n in names)
        for n, kind in table.items():
            cfg = pol.resolve(n, kind)
            if any(e in n for e in exempt):
                assert cfg is None or cfg.wt is None, (n, cfg)
        # at least one branch conv / dense-block conv is quantized
        quantized = [n for n, k in table.items()
                     if pol.resolve(n, k) is not None
                     and pol.resolve(n, k).wt is not None]
        assert len(quantized) >= 4, quantized


def test_squeezenet_is_norm_free(rng):
    """SqueezeNet fire modules carry bias and no norms (torchvision
    squeezenet1_1): fold_batchnorm must be a no-op and PTQ must still
    hold without BN-recalibration."""
    from fp8tpu.ops.scale_shift import fold_batchnorm

    model = tiny_squeezenet(8)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    assert not any("batch_stats" in str(p) for p, _ in flat)
    folded = fold_batchnorm(variables)
    # no norms → the param tree comes back equivalent
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(folded)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_resnext_grouped_bottleneck_geometry(rng):
    """tiny_resnext: the 3x3 runs grouped (groups=4) at base_width-scaled
    inner width; grouped convs fall back to XLA under hw patching
    (conv_patchable guard) while the 1x1s stay engine-eligible."""
    import flax.linen as nn
    from fp8tpu.quant.hw_patch import conv_patchable

    model = tiny_resnext(8)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    k = variables["params"]["stage0_block0"]["conv2"]["kernel"]
    # inner = 16 * (32/64) * 4 = 32 channels; grouped kernel has
    # in-dim inner/groups = 8
    assert k.shape == (3, 3, 8, 32), k.shape
    grouped = nn.Conv(32, (3, 3), feature_group_count=4, use_bias=False)
    assert not conv_patchable(grouped.bind({}))
    out = model.apply(variables, x)
    assert out.shape == (2, 8)
