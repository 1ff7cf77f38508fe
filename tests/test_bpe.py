"""Deterministic BPE tokenizer (raycrawl.bpe): training tie-breaks,
encode/merge semantics, memoization, and the Dataset surface."""

import pyarrow as pa
import pyarrow.parquet as pq

from raycrawl import bpe
from tests.conftest import SF_DIR


def test_train_merges_most_frequent_pair_first():
    # "ab" pair dominates: 5 occurrences vs anything else
    merges = bpe.train_bpe({"abab": 3, "abc": 2}, n_merges=2)
    assert merges[0] == ("a", "b")


def test_train_deterministic_tie_break():
    # "ab" and "cd" both appear twice -> lexicographic pair order wins
    m1 = bpe.train_bpe({"ab": 2, "cd": 2}, n_merges=1)
    m2 = bpe.train_bpe({"cd": 2, "ab": 2}, n_merges=1)
    assert m1 == m2 == [("a", "b")]


def test_encode_applies_merges_by_rank():
    merges = [("a", "b"), ("ab", "c")]
    tok = bpe.BPETokenizer(merges)
    assert tok.encode_word("abc") == ["abc", "</w>"]
    assert tok.encode_word("xyz") == ["x", "y", "z", "</w>"]
    assert tok.count_word("abc") == 2


def test_count_text_sums_words():
    tok = bpe.BPETokenizer([("a", "b")])
    # "ab" -> [ab, </w>] = 2; "c" -> [c, </w>] = 2
    assert tok.count_text("ab c") == 4
    assert tok.count_text("") == 0


def test_training_is_pure_function_of_sample():
    a = bpe.train_from_documents(SF_DIR, n_merges=64, sample_docs=100)
    b = bpe.train_from_documents(SF_DIR, n_merges=64, sample_docs=100)
    assert a == b
    assert len(a) > 0


def test_token_count_bpe_dataset(ray_session):
    out = bpe.token_count_bpe(SF_DIR, n_merges=64).to_pandas()
    n_docs = pq.read_table(f"{SF_DIR}/documents.parquet").num_rows
    assert len(out) == n_docs
    assert set(out.columns) == {"doc_id", "n_tokens_bpe"}
    # subword counts: >= 1 token per word, and a trained vocab compresses
    # below the char-level ceiling
    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    by_id = dict(zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()))
    for _, row in out.head(50).iterrows():
        words = (by_id[row["doc_id"]] or "").split()
        assert row["n_tokens_bpe"] >= len(words)
