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
