"""Differential test: the text-gate operators against independent pure-Python
reimplementations over seeded-random adversarial documents (odd whitespace,
unicode, punctuation, heavy repetition) — the randomized generalization of
the hand-written cases in test_operators.py."""

from __future__ import annotations

import hashlib
import random
import re

import pytest

from indra_db_spark.operators.text import (
    GOPHER_MAX_MEAN_WORD_LEN,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_RATIO,
    GOPHER_MIN_MEAN_WORD_LEN,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    REP_MAX_DUP_3GRAM,
    REP_MAX_TOP_BIGRAM,
    REP_MAX_TOP_UNIGRAM,
    SPLIT_TRAIN_LT,
    SPLIT_VAL_LT,
    STOPWORDS,
    gopher_rules,
    repetition_features,
    split_assign,
)

VOCAB = [
    "the", "of", "and", "to", "data", "Spark", "engine", "naïve", "café",
    "x1", "2b", "—", "!!!", "§", "word", "pipeline", "belief", "graph",
]
SEPS = [" ", " ", " ", "  ", "\t", " \t "]


def _mk_docs(n=40, seed=7):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        k = rng.randint(1, 120)
        if rng.random() < 0.2:  # heavy repetition
            words = [rng.choice(VOCAB)] * k
        else:
            words = [rng.choice(VOCAB) for _ in range(k)]
        text = words[0] + "".join(
            rng.choice(SEPS) + w for w in words[1:]
        )
        docs.append((i, text))
    return docs


def _py_gopher(text):
    toks = [w for w in re.split(r"\s+", text) if w]
    n = len(toks)
    mean_wl = len(re.sub(r"\s", "", text)) / n
    low = [w.lower() for w in toks]
    n_stop = sum(1 for w in low if w in STOPWORDS)
    alpha = sum(1 for w in low if re.search("[a-z]", w)) / n
    passed = (
        GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
        and GOPHER_MIN_MEAN_WORD_LEN <= mean_wl <= GOPHER_MAX_MEAN_WORD_LEN
        and n_stop >= GOPHER_MIN_STOPWORDS
        and alpha >= GOPHER_MIN_ALPHA_RATIO
    )
    return n, mean_wl, n_stop, alpha, int(passed)


def _py_repetition(text):
    ws = [w for w in text.lower().split(" ") if w]

    def grams(n):
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]

    uni, big, tri = grams(1), grams(2), grams(3)
    top_uni = max(uni.count(g) for g in set(uni)) / len(uni)
    top_big = (
        max(big.count(g) for g in set(big)) / len(big) if big else 0.0
    )
    dup_tri = (1 - len(set(tri)) / len(tri)) if tri else 0.0
    rep = (
        top_uni > REP_MAX_TOP_UNIGRAM
        or top_big > REP_MAX_TOP_BIGRAM
        or dup_tri > REP_MAX_DUP_3GRAM
    )
    return top_uni, top_big, dup_tri, int(rep)


def test_gopher_differential(spark):
    docs = _mk_docs()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in gopher_rules(df).collect()}
    assert len(got) == len(docs)
    for i, text in docs:
        n, mean_wl, n_stop, alpha, passed = _py_gopher(text)
        r = got[i]
        assert r.n_words == n, (i, text)
        assert abs(r.mean_word_len - mean_wl) < 5e-7, (i, text)
        assert r.n_stopwords == n_stop, (i, text)
        assert abs(r.alpha_word_ratio - alpha) < 5e-7, (i, text)
        assert r.passed == passed, (i, text)


def test_repetition_differential(spark):
    docs = _mk_docs(seed=11)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.doc_id: r for r in repetition_features(df).collect()}
    assert len(got) == len(docs)
    for i, text in docs:
        top_uni, top_big, dup_tri, rep = _py_repetition(text)
        r = got[i]
        assert abs(r.top_unigram_frac - top_uni) < 5e-7, (i, text)
        assert abs(r.top_bigram_frac - top_big) < 5e-7, (i, text)
        assert abs(r.dup_3gram_frac - dup_tri) < 5e-7, (i, text)
        assert r.repetitive == rep, (i, text)


def test_split_differential(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r for r in split_assign(df).collect()}
    for i in range(500):
        b = int(hashlib.md5(str(i).encode()).hexdigest()[30:32], 16)
        want = (
            "train" if b < SPLIT_TRAIN_LT else "val" if b < SPLIT_VAL_LT else "test"
        )
        assert got[i].bucket == b and got[i].split == want, i


def test_whitespace_docs_match_duckdb_oracle(spark):
    """Tab/newline-bearing documents through BOTH engines: the gopher /
    quality / langid oracle SQL must tokenize identically to tokens()'s
    \\s+ split (ADVICE r2: latent divergence hidden by the space-separated
    fixture corpus)."""
    import duckdb
    import pandas as pd

    from indra_db_spark.catalog import REGISTRY
    from indra_db_spark.testing import compare_frames

    docs = _mk_docs(seed=23)
    # force the divergence cases: hard tabs, newlines, CRLF, mixed runs
    docs += [
        (100, "the\tquick\nbrown fox\r\nand the\t\tlazy dog of data"),
        (101, "word\n\n\nof\tthe   pipeline\tand\nthe graph"),
        (102, "a\tb\nc d\te the of and to"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"] = "en"  # doc_langid selects it through
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.register("documents", pdf)
    try:
        for name in ("doc_gopher_quality", "doc_quality", "doc_langid"):
            _, sql = REGISTRY[name]
            import indra_db_spark.operators.text as X

            fn = {
                "doc_gopher_quality": X.gopher_rules,
                "doc_quality": X.quality_features,
            }.get(name)
            if fn is not None:
                got = fn(sdf).toPandas()
            else:
                from pyspark.sql import functions as F

                got = sdf.select(
                    "doc_id", "lang", X.lang_id(F.col("text")).alias("pred_lang")
                ).toPandas()
            want = con.execute(sql).df()
            problems = [
                p for p in compare_frames(got, want) if not p.startswith("WARN")
            ]
            assert not problems, f"{name}: {problems}"
    finally:
        con.close()
        spark.catalog.dropTempView("documents")
