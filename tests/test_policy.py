"""QuantPolicy resolution tests — mirror the reference's
create_or_update_hooks policy passes (e4m3_emu.py:77-136)."""

import pytest

from fp8tpu.quant import ModuleQuantConfig, TensorQuantConfig
from fp8tpu.quant.policy import (
    LayerKind,
    QuantPolicy,
    e3m4_inference_policy,
    e4m3_inference_policy,
    e5m2_training_policy,
    get_policy,
    hybrid_inference_policy,
    hybrid_training_policy,
)


def test_e4m3_preset_defaults():
    p = e4m3_inference_policy()
    cfg = p.resolve("backbone/layer1/conv1", LayerKind.CONV)
    assert cfg.wt.dtype == "e4m3" and cfg.wt.scaling == "per-channel"
    assert cfg.iact.scaling == "per-tensor"
    assert cfg.oact is None


def test_e5m2_training_preset():
    p = e5m2_training_policy()
    cfg = p.resolve("mlp/dense0", LayerKind.DENSE)
    assert cfg.wt.dtype == "e5m2" and cfg.wt.round_mode.value == "rne"
    assert cfg.igrad.is_stochastic and cfg.ograd.is_stochastic
    assert p.is_training


def test_hybrid_split_formats():
    p = hybrid_training_policy()
    cfg = p.resolve("x", LayerKind.DENSE)
    assert cfg.wt.dtype == "e4m3" and cfg.igrad.dtype == "e5m2"
    pi = hybrid_inference_policy()
    ci = pi.resolve("x", LayerKind.DENSE)
    assert ci.wt.dtype == "e3m4" and ci.iact.dtype == "e4m3"


def test_exempt_layers_drop_out():
    p = e4m3_inference_policy().with_exempt("conv1", "fc")
    assert p.resolve("conv1", LayerKind.CONV) is None
    assert p.resolve("fc", LayerKind.DENSE) is None
    assert p.resolve("layer1/conv1", LayerKind.CONV) is not None


def test_exempt_glob_patterns():
    p = e4m3_inference_policy().with_exempt("*attention*")
    assert p.resolve("enc/attention/q", LayerKind.DENSE) is None
    assert p.resolve("enc/mlp/up", LayerKind.DENSE) is not None


def test_output_fused_clears_oact():
    base = e5m2_training_policy()
    p = base.with_output_fused("*/attn_scores")
    cfg = p.resolve("l0/attn_scores", LayerKind.MATMUL)
    assert cfg.oact is None and cfg.ograd is None
    # untouched elsewhere
    assert p.resolve("l0/other", LayerKind.MATMUL).oact is not None


def test_embed_quantizes_weights_only():
    p = e4m3_inference_policy()
    cfg = p.resolve("embedding", LayerKind.EMBED)
    assert cfg.wt == p.emb
    assert cfg.iact is None and cfg.oact is None
    assert cfg.igrad is None and cfg.ograd is None


def test_layernorm_keeps_acts_not_weights():
    p = e5m2_training_policy()
    cfg = p.resolve("ln", LayerKind.LAYERNORM)
    assert cfg.wt is None and cfg.wtgrad is None
    assert cfg.iact is not None


def test_batch_matmul_inputs_only():
    p = e5m2_training_policy()
    cfg = p.resolve("attn/scores_bmm", LayerKind.BATCH_MATMUL)
    assert cfg.wt is None and cfg.oact is None and cfg.ograd is None
    assert cfg.iact is not None


def test_eltwise_weightless():
    p = e5m2_training_policy()
    cfg = p.resolve("resadd", LayerKind.ELTWISE)
    assert cfg.wt is None and cfg.iact is not None


def test_whitelist_excludes_layernorm_for_inference():
    p = e4m3_inference_policy()  # inference whitelist has no layernorm
    assert p.resolve("ln", LayerKind.LAYERNORM) is None
    assert p.resolve("other", LayerKind.OTHER) is None


def test_override_wins_last():
    p = e4m3_inference_policy()
    custom = ModuleQuantConfig(wt=TensorQuantConfig("e5m2", "rne"))
    p = p.with_override("head", custom)
    assert p.resolve("head", LayerKind.DENSE).wt.dtype == "e5m2"
    p2 = p.with_override("head", None)
    assert p2.resolve("head", LayerKind.DENSE) is None


def test_get_policy_factory():
    assert get_policy("e4m3").name == "e4m3"
    assert get_policy("hybrid", training=True).is_training
    assert get_policy("hybrid").default.wt.dtype == "e3m4"
    assert get_policy("bf16", training=True).default.wt.dtype == "bfloat16"
    with pytest.raises(ValueError):
        get_policy("fp64")


def test_policy_hashable():
    p = e3m4_inference_policy().with_exempt("a").with_override(
        "b", None)
    hash(p)


def test_hybrid_no_normres_exempts_actgrads_by_kind():
    """The r5 mechanism recipe: whole-whitelist hybrid EXCEPT the
    norm/residual/aggregate activation-gradient streams (VERDICT r4
    next #9 — the causal test of the role-ablation reading)."""
    p = get_policy("hybrid-no-normres", training=True)
    assert p.name == "hybrid-no-normres"
    # norm/residual kinds: forward casts stay, activation grads dropped
    for kind in (LayerKind.LAYERNORM, LayerKind.ELTWISE):
        c = p.resolve(f"x_{kind.value}", kind)
        assert c.iact is not None
        assert c.igrad is None and c.ograd is None
    # dense/conv keep the full hybrid recipe including grads
    for kind in (LayerKind.DENSE, LayerKind.CONV):
        c = p.resolve(f"x_{kind.value}", kind)
        assert c.igrad is not None and c.ograd is not None
        assert c.wt.dtype == "e4m3" and c.igrad.dtype == "e5m2"
    hash(p)


def test_hybrid_no_bmm_drops_batch_matmul_only():
    """r5 decoder mechanism cell: full hybrid minus the attention
    batch-matmul streams (see NOTES r5 — the decoder's RMSNorm/residual
    adds were never whitelisted, so this is the single-factor recipe)."""
    p = get_policy("hybrid-no-bmm", training=True)
    assert p.resolve("attn/scores", LayerKind.BATCH_MATMUL) is None
    c = p.resolve("q_proj", LayerKind.DENSE)
    assert c.oact is not None and c.igrad is not None
    h = get_policy("hybrid", training=True)
    assert h.resolve("attn/scores", LayerKind.BATCH_MATMUL) is not None
