#!/usr/bin/env python
"""BERT QA FP8 fine-tuning — the reference's accelerate-based SQuAD flow
(examples/training/bert/run_qa_no_trainer.py:810-930): initialize the FP8
emulator after the optimizer, exempt the qa_outputs head, and fuse the
attention-score matmul outputs.

Data is synthetic but LEARNABLE (no downloads): the answer span's tokens
are drawn from a distinct half of the vocabulary, so the model learns to
point at the marked region, and the SQuAD EM/F1 metrics
(utils.metrics.squad_em_f1; the reference's `squad` metric computed at
span level, run_qa_no_trainer.py) rise well above chance."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import fp8tpu
from fp8tpu.models import (
    BERT_OUTPUT_FUSED,
    BERT_QA_EXEMPT,
    BertForQA,
    tiny_bert,
)
from fp8tpu.training import init_train_state, make_train_step
from fp8tpu.utils import MetricLogger
from fp8tpu.utils.metrics import beam_search_spans, squad_em_f1


def make_batch(key, batch_size, seq_len, vocab_size):
    """Context tokens from [0, V/2); the answer span from [V/2, V)."""
    import numpy as np
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1)))
    ids = rng.integers(0, vocab_size // 2, (batch_size, seq_len))
    starts = rng.integers(0, seq_len - 8, batch_size)
    lengths = rng.integers(1, 6, batch_size)
    ends = np.minimum(starts + lengths, seq_len - 1)
    for b in range(batch_size):
        ids[b, starts[b]:ends[b] + 1] = rng.integers(
            vocab_size // 2, vocab_size, ends[b] - starts[b] + 1)
    return (jnp.asarray(ids, jnp.int32), jnp.asarray(starts, jnp.int32),
            jnp.asarray(ends, jnp.int32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--training-algo", default="hybrid",
                   choices=["direct", "hybrid", "bfloat16"])
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seq-len", type=int, default=64)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--squad_json", default=None,
                   help="real SQuAD v1.1/v2 train JSON (needs --vocab): "
                        "fine-tune on doc-span features and report "
                        "STRING-level EM/F1 via the official decode")
    p.add_argument("--vocab", default=None)
    args = p.parse_args()

    squad = None
    if args.squad_json:
        # The reference flow end-to-end (run_qa_no_trainer.py): JSON →
        # WordPiece doc-span features → fine-tune → answer-string decode
        # → official EM/F1 — all through fp8tpu.data.squad.
        from fp8tpu.data.squad import (WordPieceTokenizer,
                                       convert_examples_to_features,
                                       parse_squad_json)
        if not args.vocab:
            p.error("--squad_json needs --vocab")
        tokenizer = WordPieceTokenizer(args.vocab)
        examples = parse_squad_json(args.squad_json)
        feats = convert_examples_to_features(
            examples, tokenizer, max_seq_length=args.seq_len,
            doc_stride=max(args.seq_len // 4, 16),
            max_query_length=min(64, args.seq_len // 2))
        squad = (examples, feats)
        vocab_size = len(tokenizer.vocab)
        print(f"{len(examples)} examples → {feats.input_ids.shape[0]} "
              f"features (vocab {vocab_size})")
        cfg = tiny_bert(max_position=args.seq_len, vocab_size=vocab_size)
    else:
        cfg = tiny_bert(max_position=args.seq_len)
    model = BertForQA(cfg)
    key = jax.random.key(0)
    ids = jax.random.randint(jax.random.key(1),
                             (args.batch_size, args.seq_len), 0,
                             cfg.vocab_size)
    variables = model.init(key, ids)

    emulator = fp8tpu.initialize(
        model, variables, (ids,), training_algo=args.training_algo,
        exempt_layers=BERT_QA_EXEMPT)
    emulator = fp8tpu.training.MPTEmulator(
        model=emulator.model,
        policy=emulator.policy.with_output_fused(*BERT_OUTPUT_FUSED),
        module_table=emulator.module_table,
        master_fmt=emulator.master_fmt)
    optimizer = optax.adamw(args.lr)

    def loss_fn(apply_fn, params, batch):
        ids, mask, types, starts, ends = batch
        s_logits, e_logits = apply_fn(params, ids, mask, types)
        return (optax.softmax_cross_entropy_with_integer_labels(
                    s_logits, starts).mean()
                + optax.softmax_cross_entropy_with_integer_labels(
                    e_logits, ends).mean()) / 2

    def get_batch(i, k):
        if squad is not None:
            _, f = squad
            rng = np.random.default_rng(i)
            idx = rng.integers(0, f.input_ids.shape[0], args.batch_size)
            return (jnp.asarray(f.input_ids[idx]),
                    jnp.asarray(f.attention_mask[idx]).astype(jnp.bool_),
                    jnp.asarray(f.token_type_ids[idx]),
                    jnp.asarray(f.start[idx]), jnp.asarray(f.end[idx]))
        ids, starts, ends = make_batch(jax.random.fold_in(k, 1),
                                       args.batch_size, args.seq_len,
                                       cfg.vocab_size)
        return (ids, jnp.ones_like(ids, jnp.bool_),
                jnp.zeros_like(ids), starts, ends)

    step = jax.jit(make_train_step(emulator, optimizer, loss_fn))
    opt_state = init_train_state(optimizer, variables)
    log = MetricLogger()
    for i in range(args.steps):
        k = jax.random.fold_in(key, i)
        batch = get_batch(i, k)
        variables, opt_state, loss = step(variables, opt_state, batch, k)
        log.update(loss=float(loss))
        if i % 10 == 0:
            print(f"step {i}: {log}")
    print(f"final: {log}")

    if squad is not None:
        # Answer-string decode + official EM/F1 over the fine-tuned set
        # (compute_predictions_logits + evaluate-v1.1 semantics).
        from fp8tpu.data.squad import decode_answers, squad_string_em_f1
        examples, f = squad
        eval_apply = jax.jit(lambda v, i, m, t: model.apply(v, i, m, t))
        sls, els = [], []
        N = f.input_ids.shape[0]
        for j in range(0, N, args.batch_size):
            sl, el = eval_apply(
                variables, jnp.asarray(f.input_ids[j:j + args.batch_size]),
                jnp.asarray(f.attention_mask[j:j + args.batch_size]
                            ).astype(jnp.bool_),
                jnp.asarray(f.token_type_ids[j:j + args.batch_size]))
            sls.append(np.asarray(sl))
            els.append(np.asarray(el))
        preds = decode_answers(f, examples, np.concatenate(sls),
                               np.concatenate(els))
        m = squad_string_em_f1(preds, examples)
        print(f"SQuAD string metrics: exact_match {m['exact_match']:.2f} "
              f"f1 {m['f1']:.2f}")
        return

    # SQuAD-style evaluation (run_qa_no_trainer.py's `squad` metric at
    # span level): argmax spans AND n-best beam-searched spans (the
    # run_qa_beam_search_no_trainer.py decode — valid-pair constrained).
    eval_apply = jax.jit(lambda v, ids: model.apply(v, ids))
    ps, pe, bs_, be, gs, ge = [], [], [], [], [], []
    for j in range(8):
        ids, starts, ends = make_batch(jax.random.fold_in(key, 10_000 + j),
                                       args.batch_size, args.seq_len,
                                       cfg.vocab_size)
        s_logits, e_logits = eval_apply(variables, ids)
        ps.append(jnp.argmax(s_logits, -1))
        pe.append(jnp.argmax(e_logits, -1))
        b_s, b_e = beam_search_spans(s_logits, e_logits, n_best=20,
                                     max_answer_len=8)
        bs_.append(b_s)
        be.append(b_e)
        gs.append(starts)
        ge.append(ends)
    m = squad_em_f1(jnp.concatenate(ps), jnp.concatenate(pe),
                    jnp.concatenate(gs), jnp.concatenate(ge))
    mb = squad_em_f1(np.concatenate(bs_), np.concatenate(be),
                     jnp.concatenate(gs), jnp.concatenate(ge))
    print(f"eval argmax: exact_match {m['exact_match']:.2f} "
          f"f1 {m['f1']:.2f}")
    print(f"eval beam:   exact_match {mb['exact_match']:.2f} "
          f"f1 {mb['f1']:.2f}")


if __name__ == "__main__":
    main()
