"""BERT encoder + QA PTQ recipe tests (the reference SQuAD flow shape)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import fp8tpu
from fp8tpu.models import (
    BERT_OUTPUT_FUSED,
    BERT_QA_EXEMPT,
    BertForQA,
    tiny_bert,
)
from fp8tpu.quant.interceptor import build_module_table
from fp8tpu.quant.policy import LayerKind


@pytest.fixture(scope="module")
def bert_setup():
    cfg = tiny_bert()
    m = BertForQA(cfg)
    ids = jnp.ones((2, 32), jnp.int32)
    variables = m.init(jax.random.key(0), ids)
    return cfg, m, variables, ids


def test_bert_forward(bert_setup):
    cfg, m, variables, ids = bert_setup
    start, end = m.apply(variables, ids)
    assert start.shape == (2, 32) and end.shape == (2, 32)


def test_bert_module_kinds(bert_setup):
    cfg, m, variables, ids = bert_setup
    table = build_module_table(m, variables, ids)
    assert table["bert/layer_0/attention/attn_scores_matmul"] == \
        LayerKind.BATCH_MATMUL
    assert table["bert/layer_0/attn_residual_add"] == LayerKind.ELTWISE
    assert table["bert/word_embed"] == LayerKind.EMBED
    assert table["qa_outputs"] == LayerKind.DENSE


def test_bert_ptq_recipe(bert_setup):
    """The reference SQuAD recipe: hybrid PTQ, qa_outputs exempt,
    attention-score outputs unquantized (run_squad.py:436-472)."""
    cfg, m, variables, ids = bert_setup
    qm = fp8tpu.quantize_model(
        m, variables, (ids,), dtype="hybrid",
        list_exempt_layers=BERT_QA_EXEMPT,
        list_layers_output_fused=BERT_OUTPUT_FUSED)
    # qa_outputs untouched:
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["qa_outputs"]["kernel"]),
        np.asarray(qm.variables["params"]["qa_outputs"]["kernel"]))
    # encoder dense weights quantized:
    assert not np.array_equal(
        np.asarray(variables["params"]["bert"]["layer_0"]["attention"]
                   ["query"]["kernel"]),
        np.asarray(qm.variables["params"]["bert"]["layer_0"]["attention"]
                   ["query"]["kernel"]))
    start_q, end_q = qm(ids)
    start, end = m.apply(variables, ids)
    corr = np.corrcoef(np.asarray(start_q).ravel(),
                       np.asarray(start).ravel())[0, 1]
    assert corr > 0.95, corr


def test_bert_large_structural_surface():
    """bert-large shape (the reference's actual SQuAD model class): the
    module table contains all 24 per-layer attn_scores_matmul paths the
    reference's exempt recipe names (run_squad.py:470-472), the policy
    resolves the QA-head exemption and the fused-output pattern, and the
    seq-384 QA forward type-checks (eval_shape — no weights needed)."""
    import jax
    from fp8tpu.models.bert import (BERT_OUTPUT_FUSED, BERT_QA_EXEMPT,
                                    BertForQA, bert_large_config)
    from fp8tpu.quant.policy import hybrid_inference_policy

    cfg = bert_large_config(dtype="bfloat16")
    assert (cfg.n_layers, cfg.d_model, cfg.n_heads) == (24, 1024, 16)
    model = BertForQA(cfg)
    ids = jnp.ones((1, 384), jnp.int32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), ids))
    n_params = sum(np.prod(s.shape) for s in jax.tree.leaves(shapes))
    assert n_params > 300e6, n_params          # bert-large-class (~335M)

    paths = ["/".join(map(str, [getattr(k, 'key', k) for k in kp]))
             for kp, _ in jax.tree_util.tree_flatten_with_path(shapes)[0]]
    score_layers = {p.split("/")[2] for p in paths
                    if "attn_scores" not in p and "layer_" in p}
    assert len({p for p in paths if "qa_outputs" in p}) >= 2

    pol = (hybrid_inference_policy()
           .with_exempt(*BERT_QA_EXEMPT)
           .with_output_fused(*BERT_OUTPUT_FUSED))
    from fp8tpu.quant.policy import LayerKind
    # every layer's score matmul resolves with oact None (fused pattern)
    for i in range(cfg.n_layers):
        path = f"encoder/layer_{i}/attention/attn_scores_matmul"
        c = pol.resolve(path, LayerKind.BATCH_MATMUL)
        assert c is not None and c.oact is None, (path, c)
    assert pol.resolve("qa_outputs", LayerKind.DENSE) is None
