"""Entity resolution / record linkage: blocking join + edit-distance verify.

The cross-source twin of the dedup family (operators/dedup.py): instead of
finding near-duplicate rows within one corpus, link rows ACROSS two tables
whose keys don't align (the reference reconciles external knowledge-base
records against its own statements by normalized ids,
indra_db/cli/knowledgebase.py; here the general form: no shared key, fuzzy
names).

Scale shape: the classic blocking strategy — candidates are generated ONLY
inside blocking-key buckets (O(sum of block-size products), never the
|left| x |right| cross product), the verify predicate (levenshtein) runs
only over candidates, and best-match selection is a partial-aggregate
argmin (min over a struct), not a window — skew-immune and
map-side-combinable exactly like assembly/sif.py's priority_argmin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def blocking_candidates(
    left: DataFrame,
    right: DataFrame,
    left_block: Column,
    right_block: Column,
) -> DataFrame:
    """Candidate pairs: the equi-join of the two sides on their blocking
    keys.  Rows whose blocking key is NULL never match (equi-join null
    semantics) — callers normalize/compose keys in the block expressions.

    One shuffle on the block key on each side; bucket sizes bound the pair
    count.  A hot block (one ubiquitous key) is the skew surface — cap it
    upstream by filtering high-frequency keys, same as
    ngram_jaccard_pairs' max_shingle_freq guard.
    """
    a = left.withColumn("_bk", left_block)
    b = right.withColumn("_bk", right_block)
    return a.join(b, "_bk").drop("_bk")


def fuzzy_link(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    left_block: Column,
    right_block: Column,
    max_dist: int,
    best_per_left: bool = True,
) -> DataFrame:
    """Link ``left`` rows to ``right`` rows: block → levenshtein verify →
    (optionally) best match per left row.

    Returns (left_id, right_id, dist); with ``best_per_left`` each left id
    keeps its single lowest-distance match, ties broken by the smallest
    right id — selected by ``min(struct(dist, right_id))``, a partial
    aggregation that combines map-side, so one hot left entity (a name
    matching thousands of candidates) never concentrates in one task the
    way a row_number window would.

    levenshtein is a JVM built-in on both engines (classic Wagner-Fischer
    edit distance) — the verify stage stays inside whole-stage codegen;
    no Python boundary anywhere.
    """
    cand = blocking_candidates(
        left.select(F.col(left_id), F.col(left_text)),
        right.select(F.col(right_id), F.col(right_text)),
        left_block,
        right_block,
    )
    pairs = cand.withColumn(
        "dist", F.levenshtein(F.col(left_text), F.col(right_text))
    ).filter(F.col("dist") <= max_dist)
    if not best_per_left:
        return pairs.select(left_id, right_id, "dist")
    best = (
        pairs.groupBy(left_id)
        .agg(F.min(F.struct("dist", right_id)).alias("_b"))
        .select(
            left_id,
            F.col(f"_b.{right_id}").alias(right_id),
            F.col("_b.dist").alias("dist"),
        )
    )
    return best
