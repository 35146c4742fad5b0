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


# ------------------------------------------------- pinned tokenizer-v1


def _chain_replace(word: str, merges) -> list[str]:
    """Pure-Python mirror of the DuckDB chained-replace oracle
    (catalog/training.py:_bpe_apply_sql): two leftmost-nonoverlapping
    replace passes per merge, in rank order."""
    s = " " + " ".join(word) + " "
    for a, b in merges:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        s = s.replace(pat, rep).replace(pat, rep)
    return s.strip().split(" ")


def test_pinned_merges_reproduce_training(spark, sf_dir):
    # the versioned artifact IS what training produces on its declared
    # corpus — keeps the pinned table tied to the (tested) training path
    from indra_db_spark.operators.bpe import PINNED_MERGES_V1

    docs = load_table(spark, sf_dir, "documents")
    assert train_bpe(docs, num_merges=60) == PINNED_MERGES_V1


def test_pinned_merges_have_no_self_pairs():
    # the chained-replace oracle equivalence requires a != b per merge;
    # the SQL generator enforces it
    from indra_db_spark.catalog.training import _bpe_apply_sql
    from indra_db_spark.operators.bpe import PINNED_MERGES_V1

    assert all(a != b for a, b in PINNED_MERGES_V1)
    with pytest.raises(ValueError):
        _bpe_apply_sql([("a", "a")])


def test_chained_replace_equals_greedy_fuzz():
    # rank-order two-pass replace == greedy lowest-rank-first segmentation
    # (the equivalence the DuckDB oracle rests on), under random and
    # adversarial (merge-substring-concatenation) words
    import random

    from indra_db_spark.operators.bpe import PINNED_MERGES_V1

    ranks = {p: i for i, p in enumerate(PINNED_MERGES_V1)}
    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    parts = [a + b for a, b in PINNED_MERGES_V1] + [
        s for p in PINNED_MERGES_V1 for s in p
    ]
    for trial in range(20000):
        if trial % 2:
            w = "".join(
                rng.choice(alpha[: rng.choice([3, 5, 8, 36])])
                for _ in range(rng.randint(1, 18))
            )
        else:
            w = "".join(rng.choice(parts) for _ in range(rng.randint(1, 5)))
        assert py_segment(w, ranks) == _chain_replace(w, PINNED_MERGES_V1), w


def test_sql_apply_expr_matches_python_twin():
    # run the literal generated SQL expression in DuckDB over adversarial
    # words — pins the SQL TEXT (regexp/replace dialect semantics), not
    # just the mental model behind it
    import duckdb

    from indra_db_spark.catalog.training import _bpe_apply_sql
    from indra_db_spark.operators.bpe import PINNED_MERGES_V1

    ranks = {p: i for i, p in enumerate(PINNED_MERGES_V1)}
    words = [
        "gegeb", "ggdgegekjbdk", "partpartpart", "scanscan", "window",
        "streamstream", "queryqueryquery", "aggaggagg", "x", "hashash",
        "columncolumn", "valuevaluevalue", "sortsortsort", "abcdefgh",
    ]
    con = duckdb.connect()
    expr = _bpe_apply_sql(PINNED_MERGES_V1)
    for w in words:
        (s,) = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS word)", [w]
        ).fetchone()
        assert s.strip().split(" ") == py_segment(w, ranks), w
