"""Real-dataset pipeline tests on generated fixtures: ImageFolder trees
(PIL PNGs) and a handcrafted SQuAD JSON + vocab — the loaders the
examples' --data_npz hook consumes when actual ImageNet/SQuAD are
mounted (reference: imagenet_test.py transforms, run_squad.py feature
conversion)."""

import json
import os

import numpy as np
import pytest

from fp8tpu.data.imagenet import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    imagenet_to_npz,
    imagenet_val_batches,
    list_image_folder,
    load_image_train,
    load_image_val,
)
from fp8tpu.data.squad import (
    WordPieceTokenizer,
    convert_examples_to_features,
    parse_squad_json,
    squad_to_npz,
)


@pytest.fixture(scope="module")
def image_tree(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for cls, color in (("ants", (200, 30, 30)), ("bees", (30, 30, 200))):
        d = root / cls
        d.mkdir()
        for i in range(3):
            arr = np.full((300 + 10 * i, 400, 3), color, np.uint8)
            arr += rng.integers(0, 20, arr.shape).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_image_folder_listing(image_tree):
    paths, labels, classes = list_image_folder(image_tree)
    assert classes == ["ants", "bees"]            # sorted-order indexing
    assert len(paths) == 6 and labels == [0, 0, 0, 1, 1, 1]


def test_val_transform_geometry_and_norm(image_tree):
    paths, _, _ = list_image_folder(image_tree)
    x = load_image_val(paths[0], size=224, resize=256)
    assert x.shape == (224, 224, 3) and x.dtype == np.float32
    # red-ish class: un-normalized channel means must rank r > g ≈ b
    un = x * IMAGENET_STD + IMAGENET_MEAN
    assert un[..., 0].mean() > un[..., 2].mean()
    assert 0.0 <= un.min() + 0.1 and un.max() <= 1.1


def test_val_batches_and_npz(image_tree, tmp_path):
    batches = list(imagenet_val_batches(image_tree, batch_size=4))
    assert batches[0][0].shape == (4, 224, 224, 3)
    assert batches[1][0].shape == (2, 224, 224, 3)   # short tail kept
    out = str(tmp_path / "val.npz")
    n = imagenet_to_npz(image_tree, out, limit=5)
    d = np.load(out)
    assert n == 5 and d["x"].shape == (5, 224, 224, 3)
    assert set(d["y"].tolist()) <= {0, 1}


def test_train_transform_shapes(image_tree):
    paths, _, _ = list_image_folder(image_tree)
    rng = np.random.default_rng(3)
    a = load_image_train(paths[0], rng)
    b = load_image_train(paths[0], rng)
    assert a.shape == b.shape == (224, 224, 3)
    assert not np.allclose(a, b)                   # random crop/flip


# -- SQuAD ---------------------------------------------------------------

_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]",
          "the", "capital", "of", "france", "is", "paris", "what",
          "big", "##ger", "city", "a", "?", ".", ","]


@pytest.fixture(scope="module")
def squad_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("squad")
    vocab = d / "vocab.txt"
    vocab.write_text("\n".join(_VOCAB) + "\n")
    context = "The capital of France is Paris. Paris is a bigger city."
    data = {"data": [{"title": "t", "paragraphs": [{
        "context": context,
        "qas": [
            {"id": "q1", "question": "What is the capital of France?",
             "answers": [{"text": "Paris",
                          "answer_start": context.index("Paris")}]},
            {"id": "q2", "question": "What is a bigger city?",
             "answers": [{"text": "Paris",
                          "answer_start": context.rindex("Paris")}]},
        ]}]}]}
    j = d / "train.json"
    j.write_text(json.dumps(data))
    return str(j), str(vocab)


def test_wordpiece_tokenizer(squad_files):
    _, vocab = squad_files
    tok = WordPieceTokenizer(vocab)
    assert tok.tokenize("Bigger city?") == ["big", "##ger", "city", "?"]
    assert tok.tokenize("zzz") == ["[UNK]"]
    ids = tok.convert_tokens_to_ids(["the", "[UNK]"])
    assert ids == [_VOCAB.index("the"), _VOCAB.index("[UNK]")]


def test_parse_and_features_answer_span(squad_files):
    j, vocab = squad_files
    tok = WordPieceTokenizer(vocab)
    examples = parse_squad_json(j)
    assert [e.qid for e in examples] == ["q1", "q2"]
    assert examples[0].doc_tokens[examples[0].start_token] == "Paris."

    f = convert_examples_to_features(examples, tok, max_seq_length=40,
                                     doc_stride=8)
    assert f.input_ids.shape[1] == 40
    assert f.input_ids.dtype == np.int32
    # feature 0 holds q1's answer: the token at `start` decodes to paris
    row = f.input_ids[0]
    s, e = int(f.start[0]), int(f.end[0])
    assert s > 0 and _VOCAB[row[s]] == "paris" and e >= s
    # type ids: 0 over [CLS]+query+[SEP], 1 over the doc chunk
    sep = _VOCAB.index("[SEP]")
    first_sep = int(np.argmax(row == sep))
    assert f.token_type_ids[0, : first_sep + 1].max() == 0
    assert f.token_type_ids[0, first_sep + 1] == 1


def test_doc_stride_windows_and_cls_fallback(squad_files):
    j, vocab = squad_files
    tok = WordPieceTokenizer(vocab)
    examples = parse_squad_json(j)
    # tiny window forces multiple spans per example
    f = convert_examples_to_features(examples, tok, max_seq_length=16,
                                     doc_stride=2, max_query_length=6)
    assert (f.example_index == 0).sum() >= 2
    # spans that do not contain the answer must point at [CLS] (0)
    ex0 = f.start[f.example_index == 0]
    assert (ex0 == 0).any() and (ex0 > 0).any()


def test_decode_answers_and_string_metrics(squad_files):
    from fp8tpu.data.squad import decode_answers, squad_string_em_f1
    j, vocab = squad_files
    tok = WordPieceTokenizer(vocab)
    examples = parse_squad_json(j)
    f = convert_examples_to_features(examples, tok, max_seq_length=40,
                                     doc_stride=8)
    # oracle logits: one-hot at the gold feature spans
    N, L = f.input_ids.shape
    sl = np.full((N, L), -10.0, np.float32)
    el = np.full((N, L), -10.0, np.float32)
    for i in range(N):
        if f.start[i] > 0:
            sl[i, f.start[i]] = 10.0
            el[i, f.end[i]] = 10.0
    preds = decode_answers(f, examples, sl, el)
    assert set(preds) == {"q1", "q2"}
    m = squad_string_em_f1(preds, examples)
    # gold spans decode to "Paris." / "Paris" → normalization strips
    # punctuation, so both are exact matches
    assert m["exact_match"] == 100.0 and m["f1"] == 100.0
    # garbage logits must not crash and must score below oracle
    rng = np.random.default_rng(0)
    m2 = squad_string_em_f1(
        decode_answers(f, examples, rng.normal(size=(N, L)),
                       rng.normal(size=(N, L))), examples)
    assert 0.0 <= m2["f1"] <= 100.0


def test_squad_v2_null_answers(squad_files, tmp_path):
    """v2 flow: an is_impossible question scores via the null rule —
    huge [CLS] logits + null_threshold → empty prediction → EM 100."""
    from fp8tpu.data.squad import decode_answers, squad_string_em_f1
    _, vocab = squad_files
    ctx = "The capital of France is Paris."
    data = {"data": [{"title": "t", "paragraphs": [{
        "context": ctx,
        "qas": [{"id": "imp1", "question": "What is the capital?",
                 "is_impossible": True, "answers": []}]}]}]}
    j = tmp_path / "v2.json"
    j.write_text(json.dumps(data))
    tok = WordPieceTokenizer(vocab)
    examples = parse_squad_json(str(j))
    assert examples[0].is_impossible
    f = convert_examples_to_features(examples, tok, max_seq_length=32,
                                     doc_stride=8)
    N, L = f.input_ids.shape
    sl = np.zeros((N, L), np.float32)
    el = np.zeros((N, L), np.float32)
    sl[:, 0] = el[:, 0] = 8.0                      # confident null
    preds = decode_answers(f, examples, sl, el, null_threshold=0.0)
    assert preds["imp1"] == ""
    m = squad_string_em_f1(preds, examples)
    assert m["exact_match"] == 100.0
    # without the null rule, a span is always predicted
    preds2 = decode_answers(f, examples, sl, el)
    assert preds2["imp1"] != ""


def test_qa_finetune_on_squad_features(squad_files):
    """End-to-end plumbing: SQuAD JSON → features → BertForQA train step
    (FP8 hybrid) → answer decode — the run_qa_no_trainer flow in
    miniature."""
    import jax
    import jax.numpy as jnp
    import optax

    import fp8tpu
    from fp8tpu.data.squad import decode_answers
    from fp8tpu.models import BertForQA, tiny_bert
    from fp8tpu.training import init_train_state, make_train_step

    j, vocab = squad_files
    tok = WordPieceTokenizer(vocab)
    examples = parse_squad_json(j)
    f = convert_examples_to_features(examples, tok, max_seq_length=32,
                                     doc_stride=8, max_query_length=12)
    cfg = tiny_bert(vocab_size=len(tok.vocab), d_model=32, n_layers=1,
                    n_heads=2, d_ff=64, max_position=32)
    model = BertForQA(cfg)
    ids = jnp.asarray(f.input_ids)
    mask = jnp.asarray(f.attention_mask).astype(jnp.bool_)
    types = jnp.asarray(f.token_type_ids)
    variables = model.init(jax.random.key(0), ids)
    emulator = fp8tpu.initialize(model, variables, (ids,),
                                 training_algo="hybrid")

    def loss_fn(apply_fn, params, batch):
        i, m, t, s, e = batch
        sl, el = apply_fn(params, i, m, t)
        return (optax.softmax_cross_entropy_with_integer_labels(sl, s)
                + optax.softmax_cross_entropy_with_integer_labels(
                    el, e)).mean() / 2

    opt = optax.adam(3e-3)
    step = jax.jit(make_train_step(emulator, opt, loss_fn))
    opt_state = init_train_state(opt, variables)
    batch = (ids, mask, types, jnp.asarray(f.start), jnp.asarray(f.end))
    losses = []
    for i in range(8):
        variables, opt_state, loss = step(variables, opt_state, batch,
                                          jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0]                  # it learns
    sl, el = model.apply(variables, ids, mask, types)
    preds = decode_answers(f, examples, np.asarray(sl), np.asarray(el))
    assert set(preds) == {e.qid for e in examples}
    assert all(isinstance(v, str) for v in preds.values())


def test_squad_to_npz(squad_files, tmp_path):
    j, vocab = squad_files
    out = str(tmp_path / "feat.npz")
    n = squad_to_npz(j, vocab, out, max_seq_length=48, doc_stride=16)
    d = np.load(out)
    assert n == d["input_ids"].shape[0] >= 2
    assert d["attention_mask"].shape == d["input_ids"].shape
    assert (d["start"] < 48).all() and (d["end"] >= d["start"]).all()


def test_squad_metric_max_over_gold_answers(tmp_path):
    """Official evaluate-v1.1 semantics: score = max over ALL gold
    answers, and eval-mode parses (is_training=False) carry them."""
    import json

    from fp8tpu.data.squad import parse_squad_json, squad_string_em_f1

    data = {"data": [{"paragraphs": [{
        "context": "The Denver Broncos won the game.",
        "qas": [{"id": "q1", "question": "Who won?",
                 "answers": [{"text": "Denver Broncos",
                              "answer_start": 4},
                             {"text": "Broncos", "answer_start": 11}]}],
    }]}]}
    p = tmp_path / "dev.json"
    p.write_text(json.dumps(data))

    for is_training in (True, False):
        examples = parse_squad_json(str(p), is_training=is_training)
        assert examples[0].all_answers == ["Denver Broncos", "Broncos"]
        m = squad_string_em_f1({"q1": "Broncos"}, examples)
        assert m["exact_match"] == 100.0, (is_training, m)
        assert m["f1"] == 100.0
        # partial credit measured against the BEST gold
        m2 = squad_string_em_f1({"q1": "the Broncos won"}, examples)
        assert 0.0 < m2["f1"] < 100.0 and m2["exact_match"] == 0.0
