"""Skew-handling join/aggregation helpers.

AQE's skew-join splitting (enabled in the session defaults) handles most
sort-merge skew at runtime, but two shapes still need explicit salting at
100 TB:

- joining a skewed fact key against a small-but-not-broadcastable side;
- collect_list/struct aggregations where one key owns a double-digit
  percentage of rows (AQE cannot split a single group).

``salted_join`` replicates the small side ``salt_factor`` times and salts
the big side uniformly, so one hot key spreads over ``salt_factor``
partitions; results are identical to the plain join because every salt
replica carries the same payload.  The salt derives from a uniform random
draw — correctness does not depend on WHICH salt a row gets, so
nondeterminism across retries is safe here (unlike hash/agg keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``salt_factor``
    buckets.  ``small`` is replicated salt_factor×; use only when it is too
    big to broadcast yet far smaller than ``big``.

    Only inner/left-family joins are salt-safe: with a replicated small
    side, right/full joins would surface one null-extended row per
    unmatched salt replica."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        raise ValueError(f"salted_join does not support how={how!r}")
    for df, name in ((big, "big"), (small, "small")):
        if "_salt" in df.columns:
            raise ValueError(f"{name} side already has a _salt column")
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=0) * salt_factor).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt_factor: int = 16,
) -> DataFrame:
    """Skew-proof count/sum: aggregate per (key, salt) first, then merge the
    partials — a single hot key becomes ``salt_factor`` partial groups.
    (Spark's hash aggregation already does map-side partials; this guards
    the reduce side when one key floods a single reducer.)"""
    clash = {"_salt", "_n", "_s"} & set(df.columns)
    if clash:
        raise ValueError(f"input already has working columns {sorted(clash)}")
    partial = (
        df.withColumn("_salt", (F.rand(seed=0) * salt_factor).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(agg_col).alias("_s"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"), F.sum("_s").alias(f"sum_{agg_col}")
    )
