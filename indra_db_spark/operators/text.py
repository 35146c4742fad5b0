"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Everything is built-in-expression only (split/regexp/md5/size/filter) — the
hot path stays inside whole-stage codegen, no Python round-trips — and
deterministic, so an external SQL oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from indra_db_spark.operators.bpe import WORD_SPLIT
from indra_db_spark.operators.dedup import normalize_text

# tiny per-language stopword marker sets (n-gram-heuristic language ID);
# deliberately small + fixed so the operator is cheap and oracle-checkable
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "die", "und", "ist", "das"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "las", "una", "que"),
}

STOPWORDS = LANG_MARKERS["en"] + ("a", "in", "on", "for", "with")

# whitespace tokens further split on punctuation boundaries — a cheap
# BPE-ish proxy: counts sub-word units rather than raw whitespace words
BPE_ISH_SPLIT = r"[\s\.,;:!\?\(\)\[\]\{\}\"']+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"


def tokens(text_col, pattern: str = r"\s+") -> Column:
    return F.filter(F.split(text_col, pattern), lambda w: w != "")


def token_count(text_col, pattern: str = r"\s+") -> Column:
    return F.size(tokens(text_col, pattern))


def _marker_count(words: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def lang_scores(text_col) -> dict[str, Column]:
    words = tokens(F.lower(text_col))
    return {lang: _marker_count(words, m) for lang, m in LANG_MARKERS.items()}


def lang_id(text_col) -> Column:
    """argmax language by marker-word count; fixed priority order breaks
    ties; 'und' when no marker hits at all."""
    scores = lang_scores(text_col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # reversed so earlier languages win ties (first match in priority order)
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when(
            (best > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + composite score ∈ [0,1]:
    - n_tokens, mean token length
    - stopword ratio (fluency proxy)
    - alnum ratio (1 - punctuation/symbol density)
    """
    t = F.col(text_col)
    words = tokens(t)
    n_tok = F.size(words).cast("long")
    n_chars = F.length(t).cast("long")
    alnum_chars = F.length(F.regexp_replace(t, "[^a-zA-Z0-9]", "")).cast("long")
    stop_cnt = _marker_count(F.transform(words, F.lower), STOPWORDS).cast("long")
    stop_ratio = stop_cnt / n_tok
    mean_tok_len = alnum_chars / n_tok
    alnum_ratio = alnum_chars / n_chars
    # Bounded linear blend  (min(n/50,1) + min(4·stop/n,1) + min(alnum/8n,1)
    # + alnum/chars) / 4, evaluated as ONE integer-exact rational N/D with a
    # single double division: a sum of doubles differs between engines in
    # the last ulp, which flips round(x, 6) on half boundaries (seen at
    # sf0.1); integer arithmetic + one division is bit-identical everywhere.
    #
    # Blend inputs are clamped at 2^24 so the numerator stays < 2^62 for ANY
    # document (unclamped, a ~16M-token × ~2.3GB doc would silently wrap in
    # Spark while DuckDB raises — divergent engines).  Both engines apply
    # the same least(), so cross-engine parity holds at every size; the
    # clamp only distorts scores for absurd >16M-token documents, which the
    # Gopher gate (max 100k words) rejects long before this stage.
    _CAP = F.lit(1 << 24).cast("long")
    ct, cc = F.least(n_tok, _CAP), F.least(n_chars, _CAP)
    ca, cs = F.least(alnum_chars, _CAP), F.least(stop_cnt, _CAP)
    n1 = F.least(ct, F.lit(50).cast("long"))
    n2 = F.least(cs * 4, ct)
    n3 = F.least(ca, ct * 8)
    num = (
        n1 * 8 * ct * cc
        + n2 * 400 * cc
        + n3 * 50 * cc
        + ca * 400 * ct
    )
    den = F.lit(1600).cast("long") * ct * cc
    score = num / den
    return df.select(
        F.col(id_col),
        n_tok.cast("int").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alnum_ratio, 6).alias("alnum_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


#: Gopher-style repetition/quality gate bounds (Rae et al. 2021, "Scaling
#: Language Models: ... Gopher", §A1.1 quality heuristics — public paper)
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_ALPHA_RATIO = 0.8


def gopher_rules(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document filter: per-doc features + pass/fail flag.

    Rules (each a pure built-in expression, single scan, no shuffle):
    - word count in [50, 100000]
    - mean word length (non-space chars / words) in [3, 10]
    - at least 2 stopword occurrences (fluency proxy)
    - >= 80% of words contain an alphabetic character
    ``passed`` is int (1/0) so external oracles hash identically.
    """
    t = F.col(text_col)
    words = tokens(t)
    n_words = F.size(words)
    # strip ALL whitespace (not just spaces) so the numerator agrees with
    # the \s+ tokenization above on tab/newline-bearing documents
    mean_wl = F.length(F.regexp_replace(t, r"\s", "")) / n_words
    n_stop = _marker_count(F.transform(words, F.lower), STOPWORDS)
    alpha_ratio = (
        F.size(F.filter(F.transform(words, F.lower), lambda w: w.rlike("[a-z]")))
        / n_words
    )
    passed = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_wl.between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
        & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        n_stop.alias("n_stopwords"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        passed.cast("int").alias("passed"),
    )


#: repetition-gate thresholds (Rae et al. 2021 §A1.1: top-2-gram ≤ .18 etc.;
#: unigram/3-gram bounds adapted to single-line documents)
REP_MAX_TOP_UNIGRAM = 0.30
REP_MAX_TOP_BIGRAM = 0.18
REP_MAX_DUP_3GRAM = 0.60


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition features per document:

    - ``top_unigram_frac``: occurrences of the most frequent word / words
    - ``top_bigram_frac``: occurrences of the most frequent word bigram /
      total bigrams
    - ``dup_3gram_frac``: 1 − distinct/total word 3-grams
    - ``repetitive``: 1 when any threshold is exceeded

    Three explode→two-level-groupBy chains joined on doc id — each is one
    shuffle with map-side partial aggregation; the n-gram arrays are
    materialized in a projection first (transform() lambdas re-evaluate
    captured expressions per element).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        tokens(F.lower(F.col(text_col)), " ").alias("ws"),
    )

    def grams(n: int):
        idx = F.when(
            F.size("ws") >= n, F.sequence(F.lit(1), F.size("ws") - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return base.select(
            "id", F.explode(idx).alias("_i"), "ws"
        ).select("id", F.concat_ws(" ", F.slice("ws", F.col("_i"), n)).alias("g"))

    uni = (
        grams(1)
        .groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("max_uni"), F.sum("c").alias("n_words"))
    )
    big = (
        grams(2)
        .groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("max_big"), F.sum("c").alias("n_big"))
    )
    tri = (
        grams(3)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.count_distinct("g").alias("d_tri"),
        )
    )

    top_uni = F.col("max_uni") / F.col("n_words")
    top_big = F.coalesce(F.col("max_big") / F.col("n_big"), F.lit(0.0))
    dup_tri = F.coalesce(
        F.lit(1.0) - F.col("d_tri") / F.col("n_tri"), F.lit(0.0)
    )
    repetitive = (
        (top_uni > REP_MAX_TOP_UNIGRAM)
        | (top_big > REP_MAX_TOP_BIGRAM)
        | (dup_tri > REP_MAX_DUP_3GRAM)
    )
    return (
        base.select("id").distinct()
        .join(uni, "id")
        .join(big, "id", "left")
        .join(tri, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round(top_uni, 6).alias("top_unigram_frac"),
            F.round(top_big, 6).alias("top_bigram_frac"),
            F.round(dup_tri, 6).alias("dup_3gram_frac"),
            repetitive.cast("int").alias("repetitive"),
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint over *normalized* text (md5), plus
    a shorter 16-hex prefix usable as a shard/bucket key."""
    norm = normalize_text(F.col(text_col))
    fp = F.md5(norm)
    return df.select(
        F.col(id_col),
        fp.alias("fp"),
        F.substring(fp, 1, 16).alias("fp16"),
    )


#: 256-bucket split thresholds: [0,204) train / [204,230) val / [230,256) test
SPLIT_TRAIN_LT = 204
SPLIT_VAL_LT = 230


def split_assign(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic train/val/test assignment by id hash — the standard
    leakage-safe dataset split: membership is a pure function of the id, so
    it is stable across runs, engines, partitionings, and corpus growth
    (documents never migrate between splits as data is added).

    Bucket = last byte of md5(id) → ~80/10/10.  No shuffle; at 100 TB this
    is a scan-fused projection, and writing with ``partitionBy("split")``
    lands each split in its own directory.
    """
    m = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(m, 31, 2), 16, 10).cast("int")
    split = (
        F.when(bucket < SPLIT_TRAIN_LT, F.lit("train"))
        .when(bucket < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(
        F.col(id_col), bucket.alias("bucket"), split.alias("split")
    )


#: deliberately simple, engine-portable PII patterns (no lookarounds)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails/phone-shaped substrings and count what was removed —
    the corpus-level analog of the reference's license-based evidence text
    redaction (call_handlers.py:274-302, service/redaction.py here).
    Pure regexp expressions: scan-fused, no shuffle, no Python.
    """
    t = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    scrubbed_email = F.regexp_replace(t, PII_EMAIL, "[EMAIL]")
    n_phone = F.size(
        F.regexp_extract_all(scrubbed_email, F.lit(PII_PHONE), F.lit(0))
    )
    return df.select(
        F.col(id_col),
        F.regexp_replace(scrubbed_email, PII_PHONE, "[PHONE]").alias("text"),
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
    )


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    lowercase: bool = True,
) -> DataFrame:
    """Top-k corpus vocabulary: (token, n) for the k most frequent
    whitespace tokens, ties broken by token ascending — the heavy-hitter
    pass behind tokenizer training and frequency-based filtering.

    Shape: explode → ONE shuffle with partial aggregation (each map task
    emits its local token counts, so shuffle volume is bounded by the
    per-task vocabulary, not the token count) → TakeOrderedAndProject for
    the global top-k (no full sort).  Token frequency is Zipfian — the
    partial agg is also what absorbs the skew: the 'the' bucket arrives at
    the reducer as one partial count per task, never as raw occurrences.
    """
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.explode(tokens(t)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def top_terms_per_doc(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` terms most distinctive
    of each document under a tf-idf-shaped score →
    (id, word, tf, score_micro, rank).

    The score is the rational surrogate ``floor(tf · 1e6 · N / df)`` —
    tf times the inverse document frequency RATIO with the log dropped
    (the same trade :func:`keyword_search` makes for BM25's IDF): every
    intermediate is an exact integer from a per-row double, so the result
    is engine-reproducible, at the cost of weighting rare terms more
    aggressively than the log form.  Ties break on word ascending.

    Shape: ONE explode→(id, word) partial-agg shuffle for tf; document
    frequency aggregates from the tf frame (already distinct per doc) and
    is VOCABULARY-bounded → broadcastable; N is a single-row broadcast;
    the per-doc top-k is a WindowGroupLimit (rank ≤ k pushed into the
    window sort) — no global sort anywhere.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                lambda w: w != "",
            )
        ).alias("word"),
    )
    tf = words.groupBy("id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dcount = tf.groupBy("word").agg(F.count(F.lit(1)).alias("dcount"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dcount, "word")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_micro",
            F.expr(
                "CAST(FLOOR((tf * CAST(1000000 AS DOUBLE) * n_docs) "
                "/ dcount) AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score_micro"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "word",
            F.col("tf").cast("int").alias("tf"), "score_micro", "rank",
        )
    )


def chunk_documents(
    df: DataFrame,
    width: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking → (id, chunk_idx, start_word,
    n_words, chunk_text): the context-window preparation step of a
    long-document training pipeline (overlapping word windows of
    ``width``, advancing by ``stride``; the standard striding tokenizers
    apply before packing).

    Every document yields at least one chunk; the last chunk starts at
    the final stride position that still covers new words, so every word
    lands in ≥1 chunk and no chunk is empty.  Chunk identity is a pure
    function of (id, word positions) — stable across engines and runs.

    Shape: a single projection computes the chunk count per doc, one
    explode produces O(words/stride) rows per doc, and each chunk slices
    the already-split word array — no shuffle at all until whatever
    consumes the chunks: the operator is scan-fused and embarrassingly
    parallel.
    """
    if width <= 0 or stride <= 0:
        raise ValueError("chunk_documents: width and stride must be > 0")
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    words = df.select(
        F.col(id_col).alias("id"), ws.alias("_ws"), F.size(ws).alias("_n")
    ).filter(F.col("_n") > 0)
    n_chunks = F.expr(
        f"CASE WHEN _n > {width} "
        f"THEN 1 + (_n - {width} + {stride} - 1) div {stride} "
        "ELSE 1 END"
    )
    out = words.select(
        "id", "_ws", "_n",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride + 1
    piece = F.slice("_ws", start, width)
    return out.select(
        F.col("id").alias(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_word"),
        F.size(piece).cast("int").alias("n_words"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line_freq: int = 2,
    min_line_chars: int = 10,
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level boilerplate removal (the C4/CCNet line-dedup pass):
    drop every line that appears in more than ``max_line_freq`` documents
    (headers, footers, cookie banners), keep short lines (< min_line_chars)
    unconditionally (list bullets, code), and reassemble each document with
    line order preserved.

    Shape: posexplode → one partial-agg shuffle on the line fingerprint for
    corpus frequencies (Zipf-skewed boilerplate arrives as per-task partial
    counts), a second shuffle regrouping surviving lines by doc.  Frequency
    counting uses md5(line) not the line text, so the wide text never rides
    the exchange twice.  Returns (id, text, n_lines_dropped).
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("line_fp", F.unhex(F.md5("line")))
    freq = (
        lines.filter(F.length("line") >= min_line_chars)
        .groupBy("line_fp")
        # Document frequency, not occurrence count: a document repeating its
        # own refrain must not push the line over the threshold (C4/CCNet
        # semantics — boilerplate is cross-document by definition).
        .agg(F.count_distinct("id").alias("_freq"))
        .filter(F.col("_freq") > max_line_freq)
    )
    marked = lines.join(
        freq.select("line_fp").withColumn("_drop", F.lit(True)),
        "line_fp",
        "left",
    ).withColumn(
        "_drop",
        F.col("_drop").isNotNull() & (F.length("line") >= min_line_chars),
    )
    return (
        marked.groupBy("id")
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_drop"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.line,
                ),
            ).alias("text"),
            F.sum(F.col("_drop").cast("int")).alias("n_lines_dropped"),
        )
        .withColumnRenamed("id", id_col)
    )


# --------------------------------------------------------- n-gram LM scoring


def _bigram_model_frames(df, id_col, text_col):
    """(big, cab, ca, v_frame) — materialized per-doc bigram frame plus
    the count frames of the add-one model; the ONE copy of the model
    construction shared by the self-trained scorer and train_bigram_lm."""
    from indra_db_spark.operators.dedup import _materialize

    big = _materialize(_doc_bigrams(df, id_col, text_col))
    # ca and v DERIVE from cab exactly — c(a·) = Σ_b c(a,b), and every
    # word of the bigram vocabulary appears in cab's a or b column — so
    # both aggregate the VOCABULARY²-bounded count frame instead of
    # re-scanning the Θ(corpus words) bigram frame (guide §2.3:
    # aggregate small proxies, not payloads; was 3 full passes over
    # `big` + 2 corpus-wide shuffles, now 1 pass into cab and two tiny
    # aggregations over it).  cab is materialized because three
    # consumers (the scored join, ca, v) would otherwise each re-run
    # the corpus-wide count.
    cab = _materialize(
        big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    )
    ca = cab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = cab.select(F.col("a").alias("w")).union(
        cab.select(F.col("b").alias("w"))
    )
    v = vocab.agg(F.count_distinct("w").alias("v"))
    return big, cab, ca, v


def _pmi_sql(c_ab: str, c_a: str, c_b: str, n: str, micro: int = 1_000_000) -> str:
    """The ONE copy of the PMI association ratio in micro units:
    floor(c_ab · micro · N / (c_a · c_b)) — the exp of pointwise mutual
    information, scaled to integers so it ranks identically in any engine
    (log is monotone, so ranking by the ratio IS ranking by PMI, and the
    transcendental stays out of the oracle gate).

    Per-row double throughout: the denominator c_a·c_b reaches 1e26 at
    1e13-token corpora (int64 dies at 9.2e18) and the numerator 1e32 —
    both exact enough in double (deterministically rounded identically by
    both engines), with FLOOR pinning the score to an exact integer.
    """
    return (
        f"CAST(FLOOR((({c_ab}) * CAST({micro} AS DOUBLE) * ({n})) / "
        f"(CAST({c_a} AS DOUBLE) * ({c_b}))) AS BIGINT)"
    )


def pmi_terms(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most-associated adjacent word pairs corpus-wide, ranked
    by pointwise mutual information → (a, b, c_ab, score_micro, rank) —
    the collocation/phrase-mining view of a corpus (Church & Hanks 1990),
    the standard first pass for multi-word-expression vocabularies.

    PMI compares a bigram's probability to its marginals:
    P(a,b)/(P(a,·)·P(·,b)) over the bigram distribution; the score column
    is that ratio in integer micro units (:func:`_pmi_sql` — ranking by
    the ratio is ranking by PMI).  ``min_count`` suppresses the hapax
    pairs PMI notoriously over-ranks.

    100 TB shape: ONE bigram shuffle (shared, materialized), then every
    count frame is VOCABULARY-bounded (Zipf) so the marginal joins
    broadcast at scale, the total is a single-row broadcast, and the
    top-k is TakeOrderedAndProject — per-partition heaps, no global sort.
    """
    from pyspark.sql import Window

    from indra_db_spark.operators.dedup import _materialize

    big = _materialize(_doc_bigrams(df, id_col, text_col))
    cab = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    ca = big.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    cb = big.groupBy("b").agg(F.count(F.lit(1)).alias("c_b"))
    n = big.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        cab.filter(F.col("c_ab") >= min_count)
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score_micro", F.expr(_pmi_sql("c_ab", "c_a", "c_b", "n"))
        )
    )
    w = Window.orderBy(F.desc("score_micro"), F.asc("a"), F.asc("b"))
    return (
        scored.orderBy(F.desc("score_micro"), "a", "b")
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "a", "b",
            # c_ab is a CORPUS-wide bigram count: at 1e13-token scale a top
            # collocation exceeds int32 (~2.1e9), so it stays BIGINT (the
            # per-doc tf columns elsewhere are genuinely doc-bounded)
            F.col("c_ab").cast("long").alias("c_ab"),
            "score_micro", "rank",
        )
    )


def _p_micro_sql(c_ab: str, c_a: str, v, micro: int = 1_000_000) -> str:
    """The ONE copy of the add-one bigram probability in micro units:
    floor((c_ab + 1) · micro / (c_a + V)) — emitted as engine-neutral SQL
    (no ``div``) so Spark and the DuckDB oracle evaluate the identical
    text.

    The multiply is a PER-ROW DOUBLE, not int64: at production magnitudes
    (≥ ~9.2e12 occurrences of one bigram — reachable in a 1e13+-token
    corpus) ``(c_ab + 1) * 1_000_000`` overflows int64, and the engines
    then DIVERGE rather than both failing (DuckDB widens BIGINT sums and
    products to HUGEINT; Spark wraps or raises under ANSI).  A double is
    deterministically rounded by both engines (same IEEE ops, same
    order), FLOOR pins the result back to an exact integer, and the
    per-document SUM of those integers stays order-independent.
    """
    return (
        f"CAST(FLOOR((({c_ab} + 1) * CAST({micro} AS DOUBLE)) / "
        f"(({c_a}) + {v})) AS BIGINT)"
    )


def bigram_lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    micro: int = 1_000_000,
    rare_micro: int = 2_000,
    _per_bigram: bool = False,
) -> DataFrame:
    """CCNet-style language-model quality signal: score each document by
    how familiar its word bigrams are under an add-one-smoothed bigram
    model trained on the corpus itself →
    (id, n_bigrams, sum_p_micro, rare_bigrams, mean_p_micro).

    P(b|a) = (c(a,b) + 1) / (c(a·) + V), where c(a·) counts ``a`` as a
    bigram prefix and V is the corpus vocabulary size.  Probabilities are
    kept in integer micro-units via :func:`_p_micro_sql` (per-row double
    multiply + FLOOR — overflow-safe past 9.2e12-count bigrams and still
    bit-reproducible in any engine) so the per-document SUM is
    order-independent; ``mean_p_micro`` is the one trailing IEEE
    division.  ``rare_bigrams`` counts bigrams below ``rare_micro`` — the
    out-of-distribution surface CCNet's perplexity filter targets.  For a
    true log-domain perplexity use :func:`log_perplexity` (float,
    library-side; transcendental functions are not bit-portable across
    engines so it stays out of the oracle gate).

    100 TB shape: the doc-bigram frame (O(corpus words)) is materialized
    once and feeds both count aggregations — whose outputs are
    VOCABULARY-bounded (Zipf), so the count joins broadcast at scale —
    plus one final groupBy(id).  No Python UDFs anywhere.
    """
    big, cab, ca, v = _bigram_model_frames(df, id_col, text_col)

    scored = (
        big.join(cab, ["a", "b"])
        .join(ca, "a")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "p_micro",
            F.expr(_p_micro_sql("c_ab", "c_a", "v", micro)),
        )
    )
    if _per_bigram:
        return scored.select("id", "p_micro")
    return (
        scored.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum("p_micro").alias("sum_p_micro"),
            F.sum(
                F.when(F.col("p_micro") < rare_micro, 1).otherwise(0)
            ).cast("int").alias("rare_bigrams"),
        )
        .withColumn(
            "mean_p_micro", F.col("sum_p_micro") / F.col("n_bigrams")
        )
    )


def log_perplexity(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """True log2 bigram perplexity per document (float) — the library-side
    companion of :func:`bigram_lm_score`: the MEAN of the per-bigram
    -log2(p) (cross-entropy), aggregated from the per-bigram probability
    frame.  log2(mean p) is NOT perplexity — the log of a mean and the
    mean of logs diverge badly on heavy-tailed probabilities — so this
    aggregates log-domain per bigram.  Float (transcendental), hence
    library-side only; the oracle-gated integer signals live in
    bigram_lm_score."""
    per = bigram_lm_score(df, id_col, text_col, _per_bigram=True)
    return per.groupBy(F.col("id").alias(id_col)).agg(
        (
            F.log2(F.lit(1_000_000.0))
            - F.avg(F.log2(F.col("p_micro").cast("double")))
        ).alias("log2_ppl")
    )


# ----------------------------------------------------------- keyword search


def _kw_wide(df, terms, text_col, lead_cols):
    """(…lead_cols, dl, _tf0.._tfN) — per-term term frequencies + doc
    length computed inside ONE scan projection (array expressions, no
    explode); shared by keyword_search / corpus_search_stats /
    keyword_score so the three can never drift apart."""
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), WORD_SPLIT), lambda w: w != ""
    )

    def _eq(term):
        # closure, not a default arg: a two-parameter lambda would make
        # F.filter pass (element, index) and clobber the term
        return lambda w: w == F.lit(term)

    return df.select(
        *lead_cols,
        F.size(ws).cast("long").alias("dl"),
        *[
            F.size(F.filter(ws, _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(terms)
        ],
    )


def _bm25_sql(
    n_terms: int,
    n_docs: str,
    avgdl: str,
    dfs: list,
    k1_c: int,
    b_c: int,
) -> str:
    """The ONE copy of the fixed-point BM25 formula (k1/b in thousandths,
    tfsat in micro, idf in milli).  Operands arrive as SQL strings —
    column references for the self-contained entry, integer literals for
    frozen-stats scoring — and the DuckDB oracle derives from the same
    text with ``div`` respelled ``//``, so all consumers stay
    bit-identical by construction.

    Int64 bounds at production magnitudes (audited for the
    sf-passes-but-1e13-tokens-explodes class of bug):

    - ``tfsat`` numerator ``tf·(k1+1000)·1e6`` — exact int64 while
      tf < 4.1e9 (a single 16 GB document; dl shares the bound).
    - ``idf`` numerator ``(2N+1)·1000`` — exact int64 to N ≈ 4.6e15 docs.
    - ``avgdl`` operand ``Σdl·1000`` — exact int64 to 9.2e15 corpus words.
    - ``idf · tfsat`` — the one term that genuinely overflowed: int64
      dies at N ≈ 6.3e9 documents (a 100 TB corpus at 10 KB/doc is 1e10),
      so it is computed as a PER-ROW DOUBLE (``1.0 * idf * tfsat`` —
      deterministically identical in Spark and DuckDB: same IEEE ops,
      same order) and FLOOR pins the micro score back to an exact
      integer, valid to N ≈ 6e12 docs where the score itself outgrows
      int64.
    """
    C, MICRO, MILLI = 1000, 1_000_000, 1000
    # stats operands are forced to BIGINT: on the frozen-stats path they
    # arrive as INTEGER literals, and `2 * (n_docs - df)` in int32 dies at
    # n_docs > ~1.07e9 under ANSI — the column path was immune only
    # because the columns happen to be long
    nd = f"CAST({n_docs} AS BIGINT)"
    ad = f"CAST({avgdl} AS BIGINT)"
    lnorm = f"(({C} - {b_c}) + ({b_c} * dl * {C}) div ({ad}))"
    parts = []
    for i in range(n_terms):
        dfi = f"CAST({dfs[i]} AS BIGINT)"
        tfsat = (
            f"(_tf{i} * {k1_c + C} * {MICRO}) div "
            f"(_tf{i} * {C} + ({k1_c} * {lnorm}) div {C})"
        )
        idf = (
            f"((2 * ({nd} - {dfi}) + 1) * {MILLI}) "
            f"div (2 * {dfi} + 1)"
        )
        parts.append(
            # CAST AS DOUBLE, not a `1.0 *` promotion: both engines parse
            # 1.0 as DECIMAL and their decimal division semantics differ
            # by 1 ulp; an explicit double is IEEE-identical in both
            f"CASE WHEN _tf{i} > 0 THEN "
            f"CAST(FLOOR((CAST(({idf}) AS DOUBLE) * ({tfsat})) / {MILLI}) "
            "AS BIGINT) ELSE 0 END"
        )
    return " + ".join(parts)


def keyword_search(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_c: int = 1200,
    b_c: int = 750,
) -> DataFrame:
    """Bag-of-terms document search with a BM25-shaped, integer-exact
    ranking → top-``k`` (id, score_micro, rank).

    The score is classic BM25 with the log dropped from the IDF — the
    rational Robertson-Sparck-Jones weight ``(N - df + 0.5)/(df + 0.5)``
    is monotone in df, so the RANKING is the familiar one, while every
    intermediate stays an integer (micro/milli fixed-point, integer
    division) — bit-reproducible in any engine, no transcendentals.
    ``k1_c``/``b_c`` are k1 and b in thousandths (1200/750 = the standard
    1.2/0.75).

    100 TB shape: per-term tf and doc length are computed INSIDE one
    corpus scan as array expressions over the split — no explode, no
    per-term shuffle.  The only aggregations are a single-row stats frame
    (N, Σdl, per-term df — broadcast back) and the global top-k
    (TakeOrderedAndProject: per-partition heaps of k rows, never a full
    sort).  Score granularity is 1e-6; ties break on id, so results are
    partition-independent.
    """
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    wide = _kw_wide(df, terms, text_col, [F.col(id_col).alias("id")])
    stats = wide.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    scored = wide.crossJoin(F.broadcast(stats))
    expr = _bm25_sql(
        len(terms),
        "n_docs",
        "(sum_dl * 1000) div n_docs",
        [f"_df{i}" for i in range(len(terms))],
        k1_c,
        b_c,
    )
    scored = scored.withColumn(
        "score_micro", F.expr(expr).cast("long")
    ).filter(F.col("score_micro") > 0)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score_micro"), F.asc("id"))
    return (
        scored.orderBy(F.desc("score_micro"), F.asc("id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select(F.col("id").alias(id_col), "score_micro", "rank")
    )


class BigramLmModel:
    """Batch-trained bigram LM artifact for stream-side scoring: two count
    frames (bigram and prefix counts) + the vocabulary size, produced by
    :func:`train_bigram_lm` and consumed by :func:`score_docs_with_lm`.
    The frames are vocabulary-bounded (Zipf), so at scale they broadcast;
    ``v`` is a plain int so the scoring expression needs no cross join
    (stream-static cross joins are awkward; a literal is free)."""

    def __init__(self, cab: DataFrame, ca: DataFrame, v: int):
        self.cab, self.ca, self.v = cab, ca, v


def train_bigram_lm(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BigramLmModel:
    """Train the add-one bigram model on a STATIC corpus — the batch half
    of the train-once / score-stream deployment."""
    _, cab, ca, v_frame = _bigram_model_frames(df, id_col, text_col)
    return BigramLmModel(cab, ca, int(v_frame.collect()[0].v))


def score_docs_with_lm(
    docs: DataFrame,
    model: BigramLmModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    micro: int = 1_000_000,
    rare_micro: int = 2_000,
) -> DataFrame:
    """Score documents (batch OR readStream) against a batch-trained
    :class:`BigramLmModel` — the CCNet deployment shape: perplexity model
    trained offline, applied to the incoming crawl.

    Stateless per row until the final per-doc aggregate: bigram explode +
    two stream-static LEFT joins against the (broadcastable) count frames;
    unseen bigrams smooth to (0+1)/(0+v) exactly like the training-side
    formula, so scoring the training corpus itself reproduces
    :func:`bigram_lm_score` bit-for-bit.  On a stream, the groupBy(id)
    aggregate needs complete/update mode (or a watermark on an ingest-time
    column for append) — the joins themselves are stream-static and
    unconditionally supported.
    """
    big = _doc_bigrams(docs, id_col, text_col)
    scored = (
        big.join(F.broadcast(model.cab), ["a", "b"], "left")
        .join(F.broadcast(model.ca), "a", "left")
        .withColumn(
            "p_micro",
            F.expr(
                _p_micro_sql(
                    "coalesce(c_ab, 0)", "coalesce(c_a, 0)", model.v, micro
                )
            ),
        )
    )
    return (
        scored.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.sum("p_micro").alias("sum_p_micro"),
            F.sum(
                F.when(F.col("p_micro") < rare_micro, 1).otherwise(0)
            ).cast("int").alias("rare_bigrams"),
        )
        .withColumn(
            "mean_p_micro", F.col("sum_p_micro") / F.col("n_bigrams")
        )
    )


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, a, b) word-bigram frame — shared by the self-trained scorer and
    the train/score split."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.col(text_col)), WORD_SPLIT),
            lambda w: w != "",
        ).alias("_ws"),
    )
    n1 = F.greatest(F.size("_ws") - 1, F.lit(0))
    pairs = F.arrays_zip(
        F.slice(F.col("_ws"), F.lit(1), n1).alias("a"),
        F.slice(F.col("_ws"), F.lit(2), n1).alias("b"),
    )
    return words.select("id", F.explode(pairs).alias("p")).select(
        "id", F.col("p.a").alias("a"), F.col("p.b").alias("b")
    )


class SearchStats:
    """Frozen corpus statistics for the BM25-shaped scorer: doc count,
    total length, per-term document frequencies — plain ints, so stream-side
    scoring is a pure per-row expression (no stream-static join at all)."""

    def __init__(self, n_docs: int, sum_dl: int, dfs: list[int]):
        self.n_docs, self.sum_dl, self.dfs = n_docs, sum_dl, dfs


def corpus_search_stats(
    df: DataFrame, terms: list[str], text_col: str = "text"
) -> SearchStats:
    """One aggregation over the static corpus → :class:`SearchStats` —
    the batch half of index-once / score-the-stream keyword search."""
    if not terms:
        raise ValueError("corpus_search_stats needs at least one term")
    row = _kw_wide(df, terms, text_col, []).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    if not row.n_docs:
        raise ValueError(
            "corpus_search_stats: the statistics corpus is empty — "
            "train the index on a non-empty static corpus"
        )
    return SearchStats(
        int(row.n_docs),
        int(row.sum_dl),
        [int(row[f"_df{i}"]) for i in range(len(terms))],
    )


def keyword_score(
    docs: DataFrame,
    terms: list[str],
    stats: SearchStats,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1_c: int = 1200,
    b_c: int = 750,
) -> DataFrame:
    """Score documents (batch OR readStream) against frozen
    :class:`SearchStats` → (id, score_micro), hits only — completely
    stateless (every statistic is a literal in the expression), so it runs
    unchanged on a readStream in append mode.  The same fixed-point BM25
    formula as :func:`keyword_search`; scoring the stats corpus itself
    reproduces its scores exactly (minus the top-k cut)."""
    if not terms:
        raise ValueError("keyword_score needs at least one term")
    if len(stats.dfs) != len(terms):
        raise ValueError(
            f"stats carry {len(stats.dfs)} document frequencies but "
            f"{len(terms)} terms were given — build SearchStats with the "
            "same term list"
        )
    if stats.n_docs <= 0:
        raise ValueError("keyword_score: stats.n_docs must be positive")
    wide = _kw_wide(docs, terms, text_col, [F.col(id_col).alias("id")])
    expr = _bm25_sql(
        len(terms),
        str(stats.n_docs),
        str((stats.sum_dl * 1000) // stats.n_docs),
        [str(d) for d in stats.dfs],
        k1_c,
        b_c,
    )
    return (
        wide.withColumn("score_micro", F.expr(expr).cast("long"))
        .filter(F.col("score_micro") > 0)
        .select(F.col("id").alias(id_col), "score_micro")
    )


def domain_terms(
    df: DataFrame,
    k: int = 5,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Distinctive vocabulary per domain: the ``k`` words most
    over-represented in each domain vs the rest of the corpus →
    (domain, word, tf, score, rank) — the monitoring/mixture view
    of what makes each source different (the log-odds-ratio idea of
    Monroe et al.'s "Fightin' Words", kept in integer micro-units).

    score = (rate in domain) / (rate elsewhere), add-one smoothed in the
    denominator:
    ``tf_sw · (T − total_s) / ((tf_w − tf_sw + 1) · total_s)``, computed
    in DOUBLE with an identical operation order in every engine and
    rounded to 6 decimals.  Per-ROW float arithmetic is deterministic
    (there is no sum whose order could differ — the trap is distributed
    float AGGREGATION); integer micro-units would overflow int64 here
    (tf·(T−total_s)·1e6 exceeds 2⁶³ at ~1e10 corpus tokens), which is the
    scale this operator is for.  Dropping the log keeps the RANKING
    (log is monotone).

    Shape: one explode → one (domain, word) partial-agg shuffle; word and
    domain totals derive from it (vocabulary/domain-bounded, broadcast at
    scale); top-k per domain is a WindowGroupLimit window.
    """
    words = df.select(
        F.col(domain_col).alias("domain"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), WORD_SPLIT),
                lambda w: w != "",
            )
        ).alias("word"),
    )
    from indra_db_spark.operators.dedup import _materialize

    sw = _materialize(
        words.groupBy("domain", "word").agg(F.count(F.lit(1)).alias("tf"))
    )
    wtot = sw.groupBy("word").agg(F.sum("tf").alias("tf_w"))
    stot = sw.groupBy("domain").agg(F.sum("tf").alias("total_s"))
    grand = sw.agg(F.sum("tf").alias("t_all"))
    scored = (
        sw.join(F.broadcast(wtot), "word")
        .join(F.broadcast(stot), "domain")
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "score",
            F.round(
                F.expr(
                    "cast(tf as double) * cast(t_all - total_s as double) "
                    "/ (cast(tf_w - tf + 1 as double) "
                    "* cast(total_s as double))"
                ),
                6,
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(
        F.desc("score"), F.asc("word")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("domain").alias(domain_col),
            "word",
            "tf",
            "score",
            "rank",
        )
    )
