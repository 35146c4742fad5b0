"""Top-k / windowed-rank operators.

Reference semantics:
- global sort + LIMIT/OFFSET over (ev_count|belief)
  (reference: indra_db/client/readonly/query.py:464-470, _apply_limits);
- per-group top-N evidence via a correlated LATERAL subquery
  (reference: query.py:489-506).

Spark mapping: global top-k compiles to TakeOrderedAndProject (no full
sort/shuffle of the table — each partition keeps k rows, the driver merges);
per-group top-N is the canonical row_number() window rewrite, which Catalyst
prunes early via InferWindowGroupLimit (a per-partition group-limit runs
*before* the shuffle, so only ≤N rows per group per partition shuffle).

Both take explicit tie-breaker columns: at cluster scale, result stability
under re-partitioning requires a total order (SURVEY.md §7.4 risk 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by) -> list[Column]:
    if isinstance(order_by, (str, Column)):
        order_by = [order_by]
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def global_topk(df: DataFrame, order_by, k: int, offset: int = 0) -> DataFrame:
    """ORDER BY ... LIMIT k [OFFSET o] — physical plan: TakeOrderedAndProject."""
    out = df.orderBy(*_order_cols(order_by))
    if offset:
        out = out.offset(offset)
    return out.limit(k)


def grouped_topn(
    df: DataFrame,
    partition_by,
    order_by,
    n: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
) -> DataFrame:
    """Top-N rows per group (the LATERAL-join rewrite).

    row_number (not rank) + explicit tie-breakers in ``order_by`` gives a
    deterministic, exactly-N result per group.
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)


def argmax_per_group(df: DataFrame, partition_by, order_by) -> DataFrame:
    """Single best row per group (the reference's 'distill' reader-dedup
    shape, reference: readonly_dumping/export_assembly.py:174-233)."""
    return grouped_topn(df, partition_by, order_by, 1, keep_rank=False)


def kmv_distinct(
    df,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    bits: int = 52,
):
    """K-minimum-values distinct-count sketch per group →
    (*group_cols, kth_min, est_distinct) — the deterministic cousin of
    HyperLogLog: hash every value with md5, keep the k smallest hashes
    per group, and estimate |distinct| = (k-1) · 2^bits / kth_min.

    Deterministic end to end (md5, integer division) so an external SQL
    oracle reproduces the ESTIMATE bit-for-bit — unlike
    approx_count_distinct, whose HLL state is engine-private.  Exact when
    a group has < k distinct values (falls back to the true count).

    Shape: dedup (group, hash) with one partial-agg shuffle, then a
    per-group window over the distinct hashes.  The window input is
    O(distinct) — for genuinely unbounded-cardinality production use,
    swap in approx_count_distinct (bounded state, non-deterministic);
    this operator is the oracle-checkable member of the family and the
    shape you reuse for mergeable sketch tables (store each group's k
    minima, union + re-min to merge).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # int64 bound: the estimator numerator (k-1)·2^bits must fit — at the
    # default bits=52 that caps k at 2048 (2048·2^52 = 2^63).  Checked
    # eagerly so a bad configuration fails at plan time, not as an
    # engine-dependent overflow mid-job.
    if (k - 1) * (1 << bits) >= 2**63:
        raise ValueError(
            f"kmv_distinct: (k-1)*2^bits with k={k}, bits={bits} "
            "overflows int64; lower k or bits"
        )
    nhex = bits // 4
    h = F.substring(F.md5(F.col(value_col).cast("string")), 1, nhex)
    hashed = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kth = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        )
        .filter(
            (F.col("_rn") == k) | ((F.col("_n") < k) & (F.col("_rn") == F.col("_n")))
        )
        .withColumn("kth_min", F.conv(F.col("_h"), 16, 10).cast("long"))
    )
    exact = F.col("_n") < k
    est = F.when(exact, F.col("_n").cast("long")).otherwise(
        F.expr(f"({k} - 1) * cast({2**bits} as bigint) div kth_min")
    )
    return kth.select(
        *group_cols,
        "kth_min",
        est.alias("est_distinct"),
    )


def kmv_state(
    df,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    bits: int = 52,
):
    """Mergeable KMV sketch STATE per group → (*group_cols, minima) where
    ``minima`` is the sorted array of the group's ≤ k smallest value
    hashes — the persistable/mergeable half of :func:`kmv_distinct`
    (store each shard's state, union states with :func:`kmv_merge`,
    read the estimate with :func:`kmv_estimate`).

    Mergeability is exact, not approximate: the k minima of a union are
    a subset of the union of the per-shard k minima, so merge-then-
    estimate equals estimate-over-everything bit-for-bit (pinned in
    tests).  That is the property that lets a 100 TB job sketch per
    partition/day and fold the states, never re-scanning history.

    State is bounded: the per-group window keeps ≤ k rows before the
    collect, so no executor ever holds a group's full distinct set.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if (k - 1) * (1 << bits) >= 2**63:
        raise ValueError(
            f"kmv_state: (k-1)*2^bits with k={k}, bits={bits} "
            "overflows int64; lower k or bits"
        )
    nhex = bits // 4
    h = F.substring(F.md5(F.col(value_col).cast("string")), 1, nhex)
    hashed = df.select(*group_cols, h.alias("_h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(F.collect_list("_h")).alias("minima"),
            # bits travels WITH the state: merging states built with
            # different bits mixes hex strings of different lengths, and
            # the lexicographic kth-min silently stops being the true
            # kth minimum — merge/estimate validate this column instead
            # of trusting the caller's docstring discipline
            F.lit(bits).cast("int").alias("bits"),
        )
    )


def kmv_merge(states, group_cols: list[str], k: int = 64):
    """Fold several KMV states (same k/bits) into one: union the minima
    arrays per group, dedup, keep the k smallest.  One partial-agg
    shuffle over rows of ≤ k hashes each — merging N shards' sketches
    costs O(N·k) regardless of the data they summarized.

    The ``bits`` column written by :func:`kmv_state` is validated across
    every contributing state (a mixed-width merge would corrupt the
    lexicographic kth-min silently) and carried through; states without
    the column fall back to the hex width of their minima entries.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    states = [_with_bits(s) for s in states]
    u = reduce(lambda a, b: a.unionByName(b), states)
    merged = (
        u.select(*group_cols, "bits", F.explode("minima").alias("_h"))
        .groupBy(*group_cols)
        .agg(
            F.slice(
                F.array_sort(F.collect_set("_h")), 1, k
            ).alias("minima"),
            F.min("bits").alias("_bmin"),
            F.max("bits").alias("_bmax"),
        )
    )
    bits_ok = F.when(
        F.col("_bmin") == F.col("_bmax"), F.col("_bmin")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("kmv_merge: states built with different bits ("),
                F.col("_bmin"), F.lit(" vs "), F.col("_bmax"),
                F.lit(") cannot be merged"),
            )
        )
    )
    return merged.withColumn("bits", bits_ok).drop("_bmin", "_bmax")


def _with_bits(state):
    """Ensure a KMV state frame carries a ``bits`` column (hex width × 4
    of its minima entries when absent — legacy states)."""
    from pyspark.sql import functions as F

    if "bits" in state.columns:
        return state
    return state.withColumn(
        "bits", (F.length(F.element_at("minima", 1)) * 4).cast("int")
    )


def kmv_estimate(state, k: int = 64, bits: int | None = None):
    """Distinct-count estimate from a KMV state: exact when the group had
    < k distinct values, else (k-1)·2^bits / kth_min — identical to
    :func:`kmv_distinct`'s inline estimate.

    ``bits`` is read from the state's own column (written by
    :func:`kmv_state`, validated by :func:`kmv_merge`) so estimate and
    state can never disagree; passing ``bits`` explicitly adds a runtime
    cross-check that fails loudly on mismatch instead of estimating
    garbage.
    """
    from pyspark.sql import functions as F

    state = _with_bits(state)
    b = F.col("bits")
    if bits is not None and (k - 1) * (1 << bits) >= 2**63:
        raise ValueError(
            f"kmv_estimate: (k-1)*2^bits with k={k}, bits={bits} "
            "overflows int64; lower k or bits"
        )
    if bits is not None:
        b = F.when(F.col("bits") == bits, F.col("bits")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"kmv_estimate: caller expected bits={bits} but "
                          "state was built with bits="),
                    F.col("bits"),
                )
            )
        )
    n = F.size("minima")
    out = (
        state.withColumn("_bits", b)
        .withColumn(
            "_num",
            F.expr(
                f"cast({k - 1} as bigint) * shiftleft(cast(1 as bigint), _bits)"
            ),
        )
        .withColumn(
            "_den", F.conv(F.element_at("minima", k), 16, 10).cast("long")
        )
        .withColumn(
            "est_distinct",
            F.when(n < k, n.cast("long")).otherwise(F.expr("_num div _den")),
        )
    )
    return out.drop("minima", "bits", "_bits", "_num", "_den")


def rank_quantile_value(df, value_col: str, q: float):
    """Single-row frame ``(thr)``: the element at rank ceil(q·n) of
    ``value_col`` ascending — the global (ungrouped) sibling of
    :func:`discrete_quantiles`, computed via a VALUE histogram so it
    scales with DISTINCT values, not row count.

    Shape: one partial-agg shuffle builds the (value, count) histogram,
    one single-partition window cumulates it (bounded by the value
    domain — e.g. micro-unit scores have ≤ 1e6+1 distinct values
    regardless of corpus size), and the threshold is the smallest value
    whose cumulative count reaches the rank.  No single-partition window
    ever sees the raw rows, which is what makes this the 100 TB-safe way
    to calibrate a gate constant from the corpus instead of hard-coding
    it (fixed thresholds on corpus-dependent scores are scale-dependent:
    selectivity collapses as the corpus grows).

    Rank-selected ELEMENT, no interpolation, so a SQL oracle reproduces
    it bit-for-bit.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    hist = (
        df.groupBy(F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    n = hist.agg(F.sum("_c").alias("_n"))
    cum = hist.withColumn("_cum", F.sum("_c").over(w)).crossJoin(
        F.broadcast(n)
    )
    return cum.filter(
        F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n"))
    ).agg(F.min("_v").alias("thr"))


def discrete_quantiles(
    df,
    group_cols: list[str],
    value_col: str,
    probs: dict[str, float] | None = None,
):
    """Exact discrete quantiles per group (type-7-free: the element at
    rank ceil(p·n), no interpolation) → (*group_cols, n, <one col per
    prob>).  Discrete ranks make the result a pure function of the data —
    interpolating percentile implementations differ across engines, the
    rank-selected ELEMENT cannot.

    One window per group partition + one groupBy — the input shuffles
    once on the group key.  For unbounded groups at extreme scale,
    replace with approx_percentile and give up oracle-exactness.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    probs = probs or {"p25": 0.25, "median": 0.5, "p75": 0.75}
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wn = Window.partitionBy(*group_cols)
    r = (
        df.select(*group_cols, value_col)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    aggs = [F.max("_n").alias("n")]
    for name, p in probs.items():
        rank = F.ceil(F.lit(p) * F.col("_n")).cast("long")
        aggs.append(
            F.max(
                F.when(F.col("_rn") == rank, F.col(value_col))
            ).alias(name)
        )
    return r.groupBy(*group_cols).agg(*aggs)
