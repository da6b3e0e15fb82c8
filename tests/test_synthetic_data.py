"""Synthetic structured corpora used by the accuracy gates."""

import numpy as np

from fp8tpu.data import (induction_tokens, markov_entropy_floor,
                         markov_tokens, mixed_lm_corpus, pattern_images)
from fp8tpu.utils.metrics import squad_em_f1


def test_markov_statistics():
    toks = markov_tokens(64, 256, vocab=32, branching=4, seed=1)
    assert toks.shape == (64, 256) and toks.dtype == np.int32
    assert toks.min() >= 0 and toks.max() < 32
    # deterministic given seeds
    np.testing.assert_array_equal(toks, markov_tokens(64, 256, vocab=32,
                                                      branching=4, seed=1))
    # an order-2 chain with branching 4 repeats contexts: the empirical
    # conditional entropy is far below log(vocab)
    floor = markov_entropy_floor(32, 4)
    assert 2.0 < floor < 16.0


def test_induction_copies():
    toks = induction_tokens(8, 64, vocab=50, seed=0)
    np.testing.assert_array_equal(toks[:, :32], toks[:, 32:])


def test_mixed_corpus_shapes():
    toks = mixed_lm_corpus(100, 128, vocab=64, seed=3)
    assert toks.shape == (100, 128)
    # both kinds present: some rows are exact half-copies, some are not
    half = toks.shape[1] // 2
    copies = (toks[:, :half] == toks[:, half:]).all(axis=1)
    assert 0 < copies.sum() < len(toks)


def test_pattern_images_learnable():
    xs, ys = pattern_images(256, seed=0)
    assert xs.shape == (256, 16, 16, 3) and ys.shape == (256,)
    # classes differ in mean frequency content: nearest-prototype in
    # pixel space already beats chance
    protos = np.stack([xs[ys == c].mean(0) for c in range(8)])
    d = ((xs[:, None] - protos[None]) ** 2).sum(axis=(2, 3, 4))
    acc = (d.argmin(1) == ys).mean()
    assert acc > 0.5, acc


def test_beam_search_spans():
    from fp8tpu.utils.metrics import beam_search_spans
    # argmax start (idx 5) comes AFTER argmax end (idx 2): greedy picks
    # an invalid pair; beam search finds the best VALID one.
    sl = np.full((1, 8), -10.0)
    el = np.full((1, 8), -10.0)
    sl[0, 5] = 5.0
    sl[0, 1] = 4.0
    el[0, 2] = 5.0
    el[0, 6] = 4.0
    s, e = beam_search_spans(sl, el, n_best=4, max_answer_len=4)
    # candidates: (5,6)=9.0 valid; (1,2)=9.0 valid; both beat mixed pairs
    assert (s[0], e[0]) in ((5, 6), (1, 2))
    assert s[0] <= e[0]

    # length bound forces the shorter span
    s, e = beam_search_spans(sl, el, n_best=4, max_answer_len=2)
    assert e[0] - s[0] + 1 <= 2


def test_squad_em_f1():
    m = squad_em_f1([3, 5, 0], [6, 9, 2], [3, 6, 9], [6, 8, 9])
    # span1 exact; span2 overlaps [6..8] pred [5..9]: inter 3, p=3/5,
    # r=3/3 -> f1 .75; span3 disjoint
    assert abs(m["exact_match"] - 100 / 3) < 1e-6
    assert abs(m["f1"] - (100 + 75 + 0) / 3) < 1e-6
