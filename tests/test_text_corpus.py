"""Byte-level real-text corpus loaders (fp8tpu.data.text)."""

import numpy as np
import pytest

from fp8tpu.data.text import byte_corpus, local_code_corpus, \
    text_file_corpus


def test_byte_corpus_shapes_and_determinism(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("hello world, " * 400)
    toks = byte_corpus([str(p)], n_seqs=8, seq_len=64, seed=3)
    toks2 = byte_corpus([str(p)], n_seqs=8, seq_len=64, seed=3)
    assert toks.shape == (8, 64) and toks.dtype == np.int32
    np.testing.assert_array_equal(toks, toks2)
    assert toks.min() >= 0 and toks.max() < 256
    # different seed → different offsets
    assert not np.array_equal(
        toks, byte_corpus([str(p)], n_seqs=8, seq_len=64, seed=4))


def test_byte_corpus_short_file_tiles(tmp_path):
    p = tmp_path / "short.txt"
    p.write_text("ab")
    toks = byte_corpus([str(p)], n_seqs=2, seq_len=16)
    assert toks.shape == (2, 16)
    assert set(np.unique(toks)) <= {ord("a"), ord("b")}


def test_byte_corpus_no_files(tmp_path):
    with pytest.raises(FileNotFoundError):
        byte_corpus([str(tmp_path / "missing.txt")], 2, 8)


def test_local_code_corpus_real_source():
    toks = local_code_corpus(n_seqs=16, seq_len=128, seed=0)
    assert toks.shape == (16, 128)
    # real python source: overwhelmingly printable ASCII + newlines
    printable = ((toks >= 32) & (toks < 127)) | (toks == 10) | (toks == 9)
    assert printable.mean() > 0.95
    # reproducible
    np.testing.assert_array_equal(
        toks, local_code_corpus(n_seqs=16, seq_len=128, seed=0))


def test_text_file_corpus(tmp_path):
    p = tmp_path / "doc.md"
    p.write_text("# title\n\nbody text\n" * 200)
    toks = text_file_corpus(str(p), n_seqs=4, seq_len=32)
    assert toks.shape == (4, 32)
