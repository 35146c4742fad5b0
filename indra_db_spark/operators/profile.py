"""Lake profiling and data-contract validation.

The reference guards its readonly builds with a schema-snapshot diff
(indra_db/readonly_dumping/util.py:175-271 — table/column/row-count dump
compared against a golden snapshot, build aborts on mismatch) and inline
consistency asserts (query.py:126 ``ev_count == sum(src_json)``).  These
operators are the lake-native generalization: one-pass per-column
statistics (the snapshot) and declarative expectations (the asserts),
both as DataFrames a pipeline can gate on.

Scale shape: a profile is ONE scan with partial aggregations; the
multi-column exact ``count(DISTINCT ...)`` goes through Spark's Expand
(rows × profiled-columns before partial agg) — exact and one-pass, the
right trade below ~10 columns.  Past that, swap the distinct counter for
the mergeable KMV sketch (operators/topk.py:kmv_state) per column — the
documented approximate path; everything else is unchanged.
Expectations are scalar aggregates plus broadcast anti-joins — no
full-width shuffles anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile of ``columns``: one output row per column with
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value), min/max
    rendered as strings so heterogeneous column types stack into one frame.
    (``col_name``, not ``column`` — reserved word in ANSI parsers.)

    ONE aggregate over one scan: every metric for every column is computed
    in the same groupBy().agg() (Catalyst plans the multi-distinct via
    Expand), then the single 1-row result is unpivoted executor-side with
    ``stack()`` — the per-column rows never exist before aggregation.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_nulls_{c}"),
            F.count_distinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    pieces = ", ".join(
        f"'{c}', _n, _nulls_{c}, _nd_{c}, _min_{c}, _max_{c}" for c in columns
    )
    return one.selectExpr(
        f"stack({len(columns)}, {pieces}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def expect_unique(df: DataFrame, col: str) -> DataFrame:
    """Violations of a uniqueness contract: rows minus distinct values of
    ``col`` (0 = pass).  Null keys count as violations of uniqueness only
    through the null count — count(DISTINCT) ignores them, matching SQL."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(F.col(col)))
        .cast("bigint")
        .alias("violations")
    ).select(F.lit(f"unique:{col}").alias("expectation"), "violations")


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.agg(
        F.sum(F.col(col).isNull().cast("bigint")).alias("violations")
    ).select(F.lit(f"not_null:{col}").alias("expectation"), "violations")


def expect_in_set(df: DataFrame, col: str, allowed: list) -> DataFrame:
    bad = ~F.col(col).isin(allowed) | F.col(col).isNull()
    return df.agg(F.sum(bad.cast("bigint")).alias("violations")).select(
        F.lit(f"in_set:{col}").alias("expectation"), "violations"
    )


def expect_range(df: DataFrame, col: str, min_value) -> DataFrame:
    bad = (F.col(col) < F.lit(min_value)) | F.col(col).isNull()
    return df.agg(F.sum(bad.cast("bigint")).alias("violations")).select(
        F.lit(f"min:{col}").alias("expectation"), "violations"
    )


def expect_fk(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, name: str
) -> DataFrame:
    """Referential-integrity violations: child rows whose ``fk`` has no
    match in ``parent.pk`` — a left_anti join (broadcast when the parent
    key set is dimension-sized, Catalyst/AQE picks) counted to a scalar."""
    orphans = child.select(F.col(fk)).join(
        parent.select(F.col(pk).alias(fk)), fk, "left_anti"
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("violations")
    ).select(F.lit(f"fk:{name}").alias("expectation"), "violations")


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row expectation frames into the contract report:
    (expectation, violations, passed).  Each check is a scalar aggregate,
    so the union is a handful of single-row partitions — the report cost
    is the sum of the checks' scans (shared-scan fusion across checks is
    the caller's choice: pass aggregates built off one cached frame)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("violations") == 0)


def skew_report(df: DataFrame, columns: list[str], k: int = 10) -> DataFrame:
    """Per-column heavy-hitter report → (col_name, value, n, share_micro,
    rank): the top-``k`` values of each candidate key column with their
    exact corpus share — the diagnosis that decides WHERE the skew
    escapes (operators/skew.py salting, asof/paths ``chunk_seconds``)
    are worth their extra shuffles.  A key whose top value holds >10%
    share is the measured crossover documented in SCALING.md §6d.

    One scan: columns stack into (col_name, value) pairs via Expand
    (exactly :func:`profile_table`'s shape — never one scan per column),
    one partial-agg count, per-column totals rejoined broadcast, and a
    WindowGroupLimit top-k with a deterministic (n DESC, value) order.
    Values are stringified so heterogeneous columns share one report
    schema; share is exact integer micros.
    """
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in columns
    )
    pairs = df.selectExpr(
        f"stack({len(columns)}, {stack_args}) AS (col_name, value)"
    ).filter(F.col("value").isNotNull())
    # two consumers (the totals agg and the join input): compute the
    # count frame ONCE — without the barrier the totals branch re-scans
    # the raw table
    counts = (
        pairs.groupBy("col_name", "value")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("col_name").agg(F.sum("n").alias("total"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("col_name").orderBy(
        F.desc("n"), F.asc("value")
    )
    return (
        counts.join(F.broadcast(totals), "col_name")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "col_name",
            "value",
            "n",
            F.expr("CAST(n * 1000000 div total AS BIGINT)").alias(
                "share_micro"
            ),
            F.col("rank").cast("int").alias("rank"),
        )
    )
