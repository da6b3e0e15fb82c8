"""BERT-style encoder with interceptable attention matmuls.

Mirrors the reference's quantization-ready BERT rewrite
(examples/inference/bert/modeling_bert.py): the attention score and
context matmuls are :class:`fp8tpu.ops.wrappers.Matmul`/``BatchMatmul``
modules (modeling_bert.py:251-252) and the residual adds are
``EltwiseAdd`` (370, 450), so the PTQ policy reaches inside attention by
module path — e.g. exempting all ``*attn_scores_matmul`` outputs like
run_squad.py:436-472 does.

Includes the SQuAD-style span-prediction head (``BertForQA``).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from fp8tpu.ops.wrappers import BatchMatmul, EltwiseAdd


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    d_ff: int = 3072
    max_position: int = 512
    type_vocab: int = 2
    layer_norm_eps: float = 1e-12
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    def jdtype(self):
        return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[self.dtype]


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dt = cfg.jdtype()
        B, S, _ = x.shape
        H, D = cfg.n_heads, cfg.head_dim

        q = nn.Dense(H * D, dtype=dt, name="query")(x).reshape(B, S, H, D)
        k = nn.Dense(H * D, dtype=dt, name="key")(x).reshape(B, S, H, D)
        v = nn.Dense(H * D, dtype=dt, name="value")(x).reshape(B, S, H, D)

        qh = q.transpose(0, 2, 1, 3)
        kh = k.transpose(0, 2, 3, 1)
        scores = BatchMatmul(name="attn_scores_matmul")(qh, kh)
        scores = scores / jnp.sqrt(D).astype(scores.dtype)
        scores = jnp.where(mask[:, None, None, :], scores,
                           jnp.finfo(jnp.float32).min)
        probs = nn.softmax(scores, axis=-1)
        vh = v.transpose(0, 2, 1, 3)
        ctx = BatchMatmul(name="attn_probs_matmul")(probs.astype(dt), vh)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H * D)
        return nn.Dense(cfg.d_model, dtype=dt, name="output_dense")(ctx)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        dt = cfg.jdtype()
        attn = BertSelfAttention(cfg, name="attention")(x, mask)
        x = EltwiseAdd(name="attn_residual_add")(x, attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="attn_norm")(x)
        h = nn.Dense(cfg.d_ff, dtype=dt, name="intermediate")(x)
        # exact (erf) gelu — HF BERT's "gelu" act; flax's default tanh
        # approximation diverges ~1e-3 from real checkpoints
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.d_model, dtype=dt, name="output")(h)
        x = EltwiseAdd(name="ffn_residual_add")(x, h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ffn_norm")(x)


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.cfg
        B, S = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((B, S), jnp.bool_)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, S), jnp.int32)

        word = nn.Embed(cfg.vocab_size, cfg.d_model, name="word_embed")(
            input_ids)
        pos = nn.Embed(cfg.max_position, cfg.d_model, name="pos_embed")(
            jnp.broadcast_to(jnp.arange(S), (B, S)))
        typ = nn.Embed(cfg.type_vocab, cfg.d_model, name="type_embed")(
            token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embed_norm")(
            word + pos + typ)

        for i in range(cfg.n_layers):
            x = BertLayer(cfg, name=f"layer_{i}")(
                x, attention_mask.astype(jnp.bool_))
        return x


class BertForQA(nn.Module):
    """Span prediction head (run_squad.py's qa_outputs — exempted from
    quantization per the reference recipe, run_squad.py:436-466)."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        x = BertEncoder(self.cfg, name="bert")(input_ids, attention_mask,
                                               token_type_ids)
        logits = nn.Dense(2, name="qa_outputs")(x)
        start, end = jnp.split(logits, 2, axis=-1)
        return start[..., 0], end[..., 0]


def tiny_bert(**kw) -> BertConfig:
    base = dict(vocab_size=1024, d_model=128, n_layers=2, n_heads=4,
                d_ff=256, max_position=128)
    base.update(kw)
    return BertConfig(**base)


def bert_base_config(**kw) -> BertConfig:
    """google-bert/bert-base-uncased shape (the BertConfig defaults)."""
    return BertConfig(**kw)


def bert_large_config(**kw) -> BertConfig:
    """bert-large-uncased shape — the model class the reference's SQuAD
    recipe quantizes (run_squad.py:436-489; cmd_inference.sh:25-36): 24
    layers x d1024/16 heads, whose 24 ``attn_scores_matmul`` outputs the
    E5M2 path un-quantizes.  Pretrained weights cannot ship in this
    image; the structural surface (module paths, exempt/fused recipes,
    seq-384 QA head) is exercised at this scale in tests/test_bert.py."""
    base = dict(d_model=1024, n_layers=24, n_heads=16, d_ff=4096)
    base.update(kw)
    return BertConfig(**base)


# Reference BERT PTQ recipe (run_squad.py:436-472): exempt the QA head and
# un-quantize attention-score matmul outputs.
BERT_QA_EXEMPT = ("qa_outputs",)
BERT_OUTPUT_FUSED = ("*attn_scores_matmul",)
