#!/usr/bin/env python
"""BERT question-answering PTQ inference — the reference's run_squad.py
flow (examples/inference/bert/run_squad.py:436-489): a QA model whose
attention matmuls and residual adds are wrapper-instrumented
(modeling_bert.py:251-252, 370, 450) is quantized at eval time with

  * the QA output head exempt (run_squad.py:436-441), and
  * the attention-score matmul outputs un-quantized
    (attn_scores_matmul fusion list, run_squad.py:442-466),

then evaluated span-prediction style.  Synthetic tokens by default; pass
--data_npz with {input_ids, attention_mask, start, end} for real data.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import fp8tpu
from fp8tpu.models.bert import BertConfig, BertForQA, tiny_bert


def exact_match(start_logits, end_logits, start, end):
    ps = jnp.argmax(start_logits, -1)
    pe = jnp.argmax(end_logits, -1)
    return float(jnp.mean((ps == start) & (pe == end)) * 100)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="hybrid",
                    choices=["e4m3", "e3m4", "hybrid", "e5m2"])
    ap.add_argument("--seq_len", type=int, default=128)
    ap.add_argument("--num_samples", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--data_npz", default=None)
    ap.add_argument("--squad_json", default=None,
                    help="real SQuAD v1.1/v2 JSON (needs --vocab)")
    ap.add_argument("--vocab", default=None,
                    help="BERT vocab.txt for --squad_json")
    args = ap.parse_args()

    if args.squad_json:
        # Real SQuAD through the native feature pipeline
        # (run_squad.py:699-706 semantics) → the same npz tensors.
        import tempfile

        from fp8tpu.data.squad import squad_to_npz
        if not args.vocab:
            ap.error("--squad_json needs --vocab")
        fd, args.data_npz = tempfile.mkstemp(suffix=".npz")
        os.close(fd)
        n = squad_to_npz(args.squad_json, args.vocab, args.data_npz,
                         max_seq_length=args.seq_len, doc_stride=128)
        print(f"converted {n} features from {args.squad_json}")

    cfg = tiny_bert(n_layers=args.layers)
    model = BertForQA(cfg)

    if args.data_npz:
        d = np.load(args.data_npz)
        ids = jnp.asarray(d["input_ids"], jnp.int32)
        mask = jnp.asarray(d["attention_mask"], jnp.int32)
        start, end = jnp.asarray(d["start"]), jnp.asarray(d["end"])
    else:
        key = jax.random.key(0)
        ids = jax.random.randint(key, (args.num_samples, args.seq_len), 0,
                                 cfg.vocab_size, jnp.int32)
        mask = jnp.ones_like(ids)
        start = jax.random.randint(jax.random.key(1), (args.num_samples,),
                                   0, args.seq_len)
        end = start + 1

    variables = model.init(jax.random.key(2), ids[:1], mask[:1])
    base = jax.jit(lambda v, i, m: model.apply(v, i, m))
    s0, e0 = base(variables, ids, mask)
    em_fp32 = exact_match(s0, e0, start, end)

    # Reference policy: exempt qa_outputs head; fuse (un-quantize) the
    # attention-score matmul outputs of every layer.
    from fp8tpu.models.bert import BERT_OUTPUT_FUSED, BERT_QA_EXEMPT
    qm = fp8tpu.quantize_model(
        model, variables, (ids[:1], mask[:1]), dtype=args.dtype,
        calibration_batches=[(ids[:16], mask[:16])],
        list_exempt_layers=BERT_QA_EXEMPT,
        list_layers_output_fused=BERT_OUTPUT_FUSED,
    )
    qapply = jax.jit(qm.apply)
    s1, e1 = qapply(ids, mask)
    em_q = exact_match(s1, e1, start, end)

    drift = float(jnp.mean(jnp.abs(s1 - s0)))
    print(f"fp32 EM {em_fp32:.2f} | {args.dtype} EM {em_q:.2f} | "
          f"mean |Δ start-logit| {drift:.4f}")


if __name__ == "__main__":
    main()
