"""Supervised text-quality classification — hashed-feature linear model.

The modern corpus-curation stack gates documents with a SUPERVISED
classifier (fastText in CCNet and DCLM: a bag-of-hashed-ngrams linear
model trained on labeled positives/negatives), complementing the
unsupervised bigram-LM familiarity gate in
:mod:`indra_db_spark.operators.text`.  This module is that deployment
shape, re-expressed to stay integer-exact across engines:

* **Features** are the hashing trick — md5 of the lowercased token,
  first 8 hex chars as a 32-bit integer, mod ``n_buckets``.  Collisions
  are part of the model (that is what makes the weight table BOUNDED —
  at most ``n_buckets`` rows, broadcastable forever regardless of corpus
  vocabulary), and both engines hash identically so train and score are
  cross-engine exact.
* **Weights** are integer posteriors, not log-odds: the per-feature
  weight is ``floor(micro * (c_pos + 1) / (c_pos + c_neg + 2))`` — the
  add-one-smoothed Bernoulli posterior P(positive | feature) in micro
  units.  A fastText-style model sums log-odds; log is transcendental
  and its bit pattern differs across engines, so the score here is the
  arithmetic MEAN of per-token posteriors instead of the sum of their
  logs.  Both are monotone per-token scorings aggregated linearly; the
  posterior form keeps every quantity a ratio of small integers, which
  is what lets the ORACLE re-run training itself, not just scoring.
* **Scoring** is stateless per row until the final per-doc aggregate
  (explode + broadcast left-join + partial agg), so it runs unchanged on
  a readStream — the train-once / score-stream CCNet shape, same as
  :func:`~indra_db_spark.operators.text.score_docs_with_lm`.

Overflow bounds (int64, ANSI-safe — see tests/test_overflow_bounds.py
for the audit discipline):

* train: ``micro * (c_pos + 1)`` ≤ 9.2e18 → a single FEATURE may occur
  at most 9.2e12 times in the positive class.  At a 1e13-token corpus
  that requires one hash bucket to absorb >92% of all tokens — only
  possible with a degenerate ``n_buckets``; counts are BIGINT
  throughout.
* score: per-doc ``sum(w_micro)`` ≤ 1e6 · n_tokens → a single document
  may hold 9.2e12 tokens.  Documents are bounded by ingestion (Gopher
  gates cap at 1e5 words); no real document approaches this.

Reference parity note: the reference has no classifier gate (its
curation is human, indra_db/client/principal/curation.py); this module
is part of the beyond-reference training-data surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: default feature-space size: 2^16 hash buckets — small enough that the
#: weight table broadcasts (~1 MB), large enough that collisions stay a
#: few-per-mill perturbation on natural-language vocabularies
N_BUCKETS = 65_536

#: micro-unit scale for posterior weights
MICRO = 1_000_000

#: the add-one posterior of a feature never seen in training:
#: (0 + 1) / (0 + 0 + 2) — exactly the uninformative prior
PRIOR_MICRO = MICRO // 2


def feature_bucket(token: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Hashing-trick feature id: first 32 bits of md5(token), mod buckets.

    md5 (not Spark's murmur ``hash``) so DuckDB computes the identical
    bucket — the same engine-portability rule as every other hash in this
    package (operators/sampling.py:12)."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def feature_bucket_sql(token_sql: str, n_buckets: int = N_BUCKETS) -> str:
    """DuckDB-side twin of :func:`feature_bucket` (hex digits unrolled via
    the strpos idiom used by every oracle in catalog/training.py)."""
    h = f"md5({token_sql})"
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"(CAST({digits} AS BIGINT) % {n_buckets})"


def _doc_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    carry: tuple = (),
) -> DataFrame:
    """(id, *carry, feat) per token OCCURRENCE — multinomial counting,
    matching the \\s+ tokenization convention of operators/text.py:tokens.
    ``carry`` columns (e.g. the training label) ride the explode so no
    later join against the corpus-sized token frame is ever needed — the
    label join would otherwise be the lineage's only big shuffle."""
    w = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
    cs = [F.col(c) for c in carry]
    return (
        df.select(F.col(id_col).alias("id"), *cs, w)
        .filter(F.col("w") != "")
        .select(
            "id", *carry, feature_bucket(F.col("w"), n_buckets).alias("feat")
        )
    )


class PolarityModel:
    """Frozen classifier artifact: a (feat, w_micro) weight frame plus the
    constants scoring needs.  ``weights`` is bounded by ``n_buckets`` so
    it broadcasts; ``prior_micro`` is a plain int literal (no cross join
    on the streaming path)."""

    def __init__(
        self,
        weights: DataFrame,
        n_buckets: int = N_BUCKETS,
        prior_micro: int = PRIOR_MICRO,
    ):
        self.weights = weights
        self.n_buckets = n_buckets
        self.prior_micro = prior_micro


def train_polarity_classifier(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> PolarityModel:
    """Train the hashed-feature posterior model on a labeled corpus
    (label 1 = positive/quality, 0 = negative).

    One explode + one partial-agg groupBy over at most ``n_buckets``
    keys; counts are BIGINT from the start.  The weight per feature is
    the smoothed posterior ``(c_pos+1)/(c_pos+c_neg+2)`` in micro units,
    floored — non-negative operands, so Spark's truncating ``div`` and
    DuckDB's ``//`` agree.
    """
    feats = _doc_features(
        df.withColumn("y", F.col(label_col).cast("long")),
        id_col,
        text_col,
        n_buckets,
        carry=("y",),
    )
    return PolarityModel(
        feats.groupBy("feat")
        .agg(
            F.sum("y").cast("long").alias("c_pos"),
            F.sum(1 - F.col("y")).cast("long").alias("c_neg"),
        )
        .select(
            "feat",
            F.expr(
                f"CAST(({MICRO} * (c_pos + 1)) div (c_pos + c_neg + 2) "
                "AS BIGINT)"
            ).alias("w_micro"),
        ),
        n_buckets=n_buckets,
    )


def score_with_classifier(
    docs: DataFrame,
    model: PolarityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_micro: int = PRIOR_MICRO,
) -> DataFrame:
    """Score documents (batch OR readStream) against a frozen
    :class:`PolarityModel` → (id, n_tokens, sum_w_micro, score_micro,
    keep).

    ``score_micro`` is the floored mean posterior (``sum div n`` —
    non-negative, engines agree); ``keep`` flags documents at least as
    positive-looking as ``keep_micro`` (default: the uninformative
    prior, i.e. "more positive than negative").  Unseen features smooth
    to exactly the prior, so scoring the training corpus reproduces
    training-side quantities bit-for-bit.

    Scale shape: the ONLY state is the broadcast weight table (bounded
    by n_buckets, never by corpus vocabulary); the corpus side is one
    explode + partial agg — no shuffle of document text, stream-static
    joins unconditionally supported on a readStream.
    """
    feats = _doc_features(docs, id_col, text_col, model.n_buckets)
    scored = feats.join(F.broadcast(model.weights), "feat", "left")
    return (
        scored.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.sum(
                F.coalesce(F.col("w_micro"), F.lit(model.prior_micro))
            ).cast("long").alias("sum_w_micro"),
        )
        .withColumn(
            "score_micro", F.expr("sum_w_micro div n_tokens").cast("long")
        )
        .withColumn(
            "keep",
            (F.col("score_micro") >= F.lit(keep_micro)).cast("int"),
        )
    )
