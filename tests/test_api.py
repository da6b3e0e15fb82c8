"""Facade tests: fp8tpu.quantize_model / fp8tpu.initialize."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fp8tpu
from fp8tpu.models import tiny_resnet
from fp8tpu.models.resnet import RESNET_EXEMPT, ResNet, ResNetConfig


@pytest.fixture(scope="module")
def resnet_setup():
    m = tiny_resnet()
    x = jax.random.normal(jax.random.key(0), (4, 32, 32, 3))
    v = m.init(jax.random.key(1), x)
    for _ in range(3):
        _, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
        v = {**v, "batch_stats": upd["batch_stats"]}
    return m, v, x


def test_quantize_model_basic(resnet_setup):
    m, v, x = resnet_setup
    qm = fp8tpu.quantize_model(m, v, (x,), dtype="e4m3",
                               list_exempt_layers=RESNET_EXEMPT)
    out = qm(x)
    ref = m.apply(v, x)
    assert out.shape == ref.shape
    agree = float((jnp.argmax(out, -1) == jnp.argmax(ref, -1)).mean())
    assert agree >= 0.75


def test_quantize_model_with_calibration_and_fusion(resnet_setup):
    m, v, x = resnet_setup
    infer_model = ResNet(ResNetConfig(
        stage_sizes=(1, 1), width=16, num_classes=10, small_images=True,
        norm_mode="scale_shift"))
    qm = fp8tpu.quantize_model(
        m, v, (x,), dtype="e4m3", fuse_bn=True,
        inference_model=infer_model,
        calibration_batches=[x, x * 0.5],
        list_exempt_layers=RESNET_EXEMPT)
    assert qm.qparams is not None and len(qm.qparams) > 0
    out = qm(x)
    assert np.isfinite(np.asarray(out)).all()
    assert "batch_stats" not in qm.variables  # BN folded away


@pytest.mark.parametrize("dtype", ["e3m4", "hybrid"])
def test_quantize_model_formats(resnet_setup, dtype):
    m, v, x = resnet_setup
    qm = fp8tpu.quantize_model(m, v, (x,), dtype=dtype,
                               list_exempt_layers=RESNET_EXEMPT)
    ref = m.apply(v, x)
    out = qm(x)
    corr = np.corrcoef(np.asarray(out).ravel(), np.asarray(ref).ravel())[0, 1]
    assert corr > 0.95


def test_print_config(resnet_setup, capsys):
    m, v, x = resnet_setup
    qm = fp8tpu.quantize_model(m, v, (x,), dtype="e4m3")
    qm.print_config()
    text = capsys.readouterr().out
    assert "E4M3_RNE" in text and "conv1" in text
