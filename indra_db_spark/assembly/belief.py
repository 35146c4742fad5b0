"""Belief scoring over the refinement graph.

The reference sums each statement's source counts with those of all its
refinement-graph supporters, builds mock Evidence lists, and scores them in
1M-row batches with a Python scorer (export_assembly.py:613-735).  The
default prior model (INDRA SimpleScorer semantics) is closed-form:

    P(statement wrong) = Π_sources ( syst + (1 - syst) · rand ^ n_src )
    belief             = 1 - P(wrong)

so the whole computation stays JVM-side: explode the per-source count map,
accumulate counts from transitive supporters (semi-naive closure — no
driver-side networkx, which the reference needs and which dies at 100M+
edges), then log-sum-exp the per-source error terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.operators.graph import transitive_closure

#: default error priors (SimpleScorer-shaped: systematic + random per source)
DEFAULT_RANDOM_ERROR = 0.35
DEFAULT_SYSTEMATIC_ERROR = 0.05


def belief_scores(
    source_counts: DataFrame,
    support_links: DataFrame,
    random_error: float = DEFAULT_RANDOM_ERROR,
    systematic_error: float = DEFAULT_SYSTEMATIC_ERROR,
    error_rates: DataFrame | None = None,
) -> DataFrame:
    """(mk_hash, belief) from per-source evidence counts + refinement edges.

    ``source_counts``: (mk_hash, src, n).  ``support_links``:
    (supporting_mk_hash, supported_mk_hash) — each statement accumulates the
    counts of every transitive supporter (the reference's ancestor sum,
    export_assembly.py:650-700).  ``error_rates`` optionally overrides
    per-source priors with columns (src, random_error, systematic_error).
    """
    # transitive supporters: child = supported, anc = supporting
    closure = transitive_closure(
        support_links, child_col="supported_mk_hash", parent_col="supporting_mk_hash"
    )
    inherited = (
        closure.join(
            source_counts.select(
                F.col("mk_hash").alias("anc"), "src", "n"
            ),
            "anc",
        )
        .select(F.col("child").alias("mk_hash"), "src", "n")
    )
    combined = (
        source_counts.select("mk_hash", "src", "n")
        .unionByName(inherited)
        .groupBy("mk_hash", "src")
        .agg(F.sum("n").alias("n"))
    )

    if error_rates is not None:
        combined = combined.join(F.broadcast(error_rates), "src", "left").select(
            "mk_hash",
            "src",
            "n",
            F.coalesce("random_error", F.lit(random_error)).alias("_rand"),
            F.coalesce("systematic_error", F.lit(systematic_error)).alias("_syst"),
        )
    else:
        combined = combined.select(
            "mk_hash",
            "src",
            "n",
            F.lit(random_error).alias("_rand"),
            F.lit(systematic_error).alias("_syst"),
        )

    # log-domain product over sources (partial-aggregatable)
    per_src = combined.withColumn(
        "_log_wrong",
        F.log(F.col("_syst") + (1.0 - F.col("_syst")) * F.pow("_rand", "n")),
    )
    return (
        per_src.groupBy("mk_hash")
        .agg((1.0 - F.exp(F.sum("_log_wrong"))).cast("float").alias("belief"))
    )
