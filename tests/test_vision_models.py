"""VGG / MobileNet / Inception / DenseNet families: PTQ flow incl. the
depthwise-conv fallback on the hw-patched path and branchy/dense concat
topologies (reference sweep surface, launch.py:14-80)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fp8tpu
from fp8tpu.models import (DENSENET_EXEMPT, INCEPTION_EXEMPT,
                           MOBILENET_EXEMPT, SHUFFLENET_EXEMPT,
                           VGG_EXEMPT, tiny_densenet, tiny_inception,
                           tiny_mobilenet, tiny_shufflenet, tiny_vgg)


@pytest.mark.parametrize("make,exempt", [
    (tiny_vgg, VGG_EXEMPT),
    (tiny_mobilenet, MOBILENET_EXEMPT),
    (tiny_inception, INCEPTION_EXEMPT),
    (tiny_densenet, DENSENET_EXEMPT),
    (tiny_shufflenet, SHUFFLENET_EXEMPT),
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
