"""Differential tests for distributed BPE training/tokenization.

The pure-Python twin (py_train_bpe / py_segment) is the pinned reference —
the Spark path must reproduce it exactly, end to end, on real corpus data.
"""

import re

import pytest
from pyspark.sql import Row

from indra_db_spark.operators.bpe import (
    WORD_SPLIT,
    bpe_token_counts,
    py_segment,
    py_train_bpe,
    tokenize,
    train_bpe,
    word_counts,
)
from indra_db_spark.sources.lake import load_table


def _py_words(text: str) -> list[str]:
    return [w for w in re.split(WORD_SPLIT, text.lower()) if w]


def _py_word_counts(texts: list[str]) -> dict[str, int]:
    wc: dict[str, int] = {}
    for t in texts:
        for w in _py_words(t):
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_classic_bpe_example():
    # the canonical Sennrich et al. toy corpus: first merges pick up the
    # frequent suffix pairs
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = py_train_bpe(wf, num_merges=4, min_pair_freq=1)
    assert merges[0] == ("e", "s")   # freq 9
    assert merges[1] == ("es", "t")  # freq 9
    # segmentation follows the learned ranks greedily
    ranks = {p: i for i, p in enumerate(merges)}
    assert "".join(py_segment("newest", ranks)) == "newest"
    assert py_segment("est", ranks) == ["est"]


def test_train_determinism_and_tie_break():
    # equal-frequency pairs break lexicographically → stable across runs
    wf = [("ab", 3), ("cd", 3)]
    merges = py_train_bpe(wf, num_merges=2, min_pair_freq=1)
    assert merges == [("a", "b"), ("c", "d")]


def test_word_counts_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    got = {r.word: r.freq for r in word_counts(docs, "text").collect()}
    want = _py_word_counts([r.text for r in docs.collect()])
    assert got == want


def test_spark_train_matches_python_twin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(120)
    merges = train_bpe(docs, num_merges=30)
    wc = _py_word_counts([r.text for r in docs.collect()])
    want = py_train_bpe(sorted(wc.items(), key=lambda kv: (-kv[1], kv[0])),
                        num_merges=30)
    assert merges == want


def test_tokenize_matches_python_twin(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(60)
    merges = train_bpe(docs, num_merges=40)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r.doc_id: r.bpe_tokens for r in tokenize(docs, merges).collect()}
    for r in docs.collect():
        want = [t for w in _py_words(r.text) for t in py_segment(w, ranks)]
        assert got[r.doc_id] == want, r.doc_id
    # token counts fast path agrees with the full tokenization
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert counts == {k: len(v) for k, v in got.items()}


def test_roundtrip_reconstruction(spark, sf_dir):
    # BPE is lossless per word: concatenating a word's tokens rebuilds it
    docs = load_table(spark, sf_dir, "documents").limit(40)
    merges = train_bpe(docs, num_merges=25)
    got = {r.doc_id: r.bpe_tokens for r in tokenize(docs, merges).collect()}
    for r in docs.collect():
        assert "".join(got[r.doc_id]) == "".join(_py_words(r.text))


def test_empty_and_degenerate_inputs(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="...!!!"), Row(doc_id=2, text="aa aa")]
    )
    merges = train_bpe(df, num_merges=5, min_pair_freq=1)
    assert ("a", "a") in merges
    out = {r.doc_id: r.bpe_tokens for r in tokenize(df, merges).collect()}
    # all-punctuation doc has no words → no output row (empty token list
    # docs drop out of the explode; callers left-join if they need them)
    assert 1 not in out and out[2] == ["aa", "aa"]
