"""Temporal-join catalog entries: as-of join and banded range join over the
``events`` table.  Registered AFTER the relational + training families so
the driver's 50-entry window stays pinned (see catalog/__init__.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indra_db_spark.catalog import register
from indra_db_spark.operators.temporal import (
    asof_join,
    band_join,
    latest_per_key_ts,
)
from indra_db_spark.sources.lake import load_table as T


def _typed(spark, sf, event_type: str):
    return (
        T(spark, sf, "events")
        .filter(F.col("event_type") == event_type)
        .select("event_id", "ts", "user_id", "value")
    )


@register(
    "events_asof_join",
    """
    WITH p AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    c0 AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'click'
    ),
    c AS (
      SELECT event_id, ts, user_id, value FROM (
        SELECT c0.*, row_number() OVER (
          PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM c0
      ) WHERE rn = 1
    )
    SELECT p.event_id, p.ts, p.user_id, p.value,
           c.ts AS r_ts, c.event_id AS r_event_id, c.value AS r_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_asof_join(spark, sf):
    """Backward as-of join (operators/temporal.py): each purchase picks the
    user's latest click at-or-before it.  One shuffle on the key + one
    per-key ordered window — the union-merge formulation of pandas
    merge_asof; DuckDB's native ASOF JOIN is the oracle."""
    purchases = _typed(spark, sf, "purchase")
    clicks = latest_per_key_ts(
        _typed(spark, sf, "click"), "user_id", "ts", "event_id"
    )
    return asof_join(purchases, clicks, on="user_id")


_BAND_S = 900  # ±15 min


@register(
    "events_band_join",
    f"""
    SELECT a.event_id AS a_event_id, a.ts AS a_ts,
           a.user_id AS a_user_id, a.value AS a_value,
           b.event_id AS b_event_id, b.ts AS b_ts,
           b.user_id AS b_user_id, b.value AS b_value
    FROM (SELECT event_id, ts, user_id, value FROM events
          WHERE event_type = 'error') a
    JOIN (SELECT event_id, ts, user_id, value FROM events
          WHERE event_type = 'click') b
      ON a.user_id = b.user_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {_BAND_S} * 1000000
    """,
)
def events_band_join(spark, sf):
    """Banded range join (operators/temporal.py): error events paired with
    same-user clicks within ±{15} minutes via time-cell bucketing (explode
    factor 3, equi-join on (key, cell)) — the cross product never
    materializes; the oracle is the plain inequality join."""
    errors = _typed(spark, sf, "error")
    clicks = _typed(spark, sf, "click")
    return band_join(errors, clicks, on="user_id", band_seconds=_BAND_S)


_ATTR_HORIZON = "1 hour"


@register(
    "events_attribution",
    """
    SELECT t.user_id,
           t.event_id AS touch_id, t.ts AS touch_ts,
           c.event_id AS conv_id, c.ts AS conv_ts,
           c.value AS conv_value,
           epoch_us(c.ts) - epoch_us(t.ts) AS lag_us
    FROM (SELECT event_id, ts, user_id FROM events
          WHERE event_type = 'click') t
    JOIN (SELECT event_id, ts, user_id, value FROM events
          WHERE event_type = 'purchase') c
      ON t.user_id = c.user_id
     AND c.ts >= t.ts AND c.ts <= t.ts + INTERVAL 1 HOUR
    """,
)
def events_attribution(spark, sf):
    """Click→purchase attribution pairs within a 1-hour horizon — the
    batch face of the stream-stream watermarked interval join
    (streaming/ingest.py:interval_attribution; parity with an actual
    two-readStream run is pinned in tests/test_streaming.py).  One
    key-equi-join shuffle with the time band as a post-condition; on
    streams the two-sided bound is what makes join state evictable."""
    from indra_db_spark.streaming.ingest import interval_attribution

    return interval_attribution(
        _typed(spark, sf, "click"),
        _typed(spark, sf, "purchase"),
        horizon=_ATTR_HORIZON,
    )


@register(
    "events_hier_rollup",
    """
    SELECT event_type,
           date_trunc('hour', ts) AS hour,
           CAST(GROUPING(event_type) * 2 + GROUPING(date_trunc('hour', ts))
                AS INT) AS gid,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY ROLLUP (event_type, date_trunc('hour', ts))
    """,
)
def events_hier_rollup(spark, sf):
    """Hierarchical rollup (the hypertable continuous-aggregate shape):
    (type, hour) → (type) → grand total in ONE pass via GROUP BY ROLLUP —
    Spark expands grouping sets inside a single shuffle with partial
    aggregation, so the coarser resolutions are free riders on the finest
    one; gid (grouping_id) disambiguates subtotal rows from real NULLs.
    Decimal-exact sums keep the result partition-order independent."""
    ev = T(spark, sf, "events")
    return (
        ev.withColumn("hour", F.date_trunc("hour", "ts"))
        .rollup("event_type", "hour")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select("event_type", "hour", "gid", "n", "sum_value")
    )


_KMV_K = 64
_KMV_NHEX = 13  # 52 bits
_kmv_val = " + ".join(
    f"(strpos('0123456789abcdef', substr(_h, {i + 1}, 1)) - 1) "
    f"* CAST({16 ** (_KMV_NHEX - 1 - i)} AS BIGINT)"
    for i in range(_KMV_NHEX)
)


@register(
    "events_kmv_distinct",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             substr(md5(CAST(user_id AS VARCHAR)), 1, {_KMV_NHEX}) AS _h
      FROM events
    ),
    r AS (
      SELECT event_type, _h,
             row_number() OVER (PARTITION BY event_type ORDER BY _h) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM h
    ),
    kth AS (
      SELECT event_type, _h, n FROM r
      WHERE rn = {_KMV_K} OR (n < {_KMV_K} AND rn = n)
    )
    SELECT event_type,
           CAST({_kmv_val} AS BIGINT) AS kth_min,
           CAST(CASE WHEN n < {_KMV_K} THEN n
                ELSE ({_KMV_K - 1} * CAST({2 ** 52} AS BIGINT))
                     // ({_kmv_val}) END AS BIGINT) AS est_distinct
    FROM kth
    """,
)
def events_kmv_distinct(spark, sf):
    """Deterministic K-minimum-values distinct sketch: estimated distinct
    users per event type from the 64 smallest md5 hashes — the
    oracle-checkable member of the approx-distinct family (HLL state is
    engine-private; KMV's estimate is a pure function of the data).
    Mergeable: store each group's minima, union + re-min
    (operators/topk.py:kmv_distinct)."""
    from indra_db_spark.operators.topk import kmv_distinct

    return kmv_distinct(
        T(spark, sf, "events"), ["event_type"], "user_id", k=_KMV_K
    )


@register(
    "events_group_quantiles",
    """
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type, max(n) AS n,
           max(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN value END) AS p25,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN value END) AS median,
           max(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN value END) AS p75
    FROM r GROUP BY event_type
    """,
)
def events_group_quantiles(spark, sf):
    """Exact discrete per-group quantiles: the ELEMENT at rank ceil(p·n)
    — no interpolation, so any engine reproduces the value bit-for-bit
    (interpolating percentiles differ formula-by-formula across engines)
    (operators/topk.py:discrete_quantiles)."""
    from indra_db_spark.operators.topk import discrete_quantiles

    return discrete_quantiles(T(spark, sf, "events"), ["event_type"], "value")


_PR_ITERS = 5
_PR_TOTAL = 1_000_000_000_000
_PR_D = 850


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank: the DuckDB twin of
    operators/graph.py:pagerank with every integer division in the same
    order (a recursive CTE with aggregation is non-portable; a fixed
    iteration count unrolls cleanly)."""
    base = f"({_PR_TOTAL} * {1000 - _PR_D} // 1000)"
    ctes = [
        """e AS (
      SELECT p_partkey AS src, p_partkey // 2 AS dst FROM part
      WHERE p_partkey >= 2
      UNION
      SELECT p_partkey AS src, p_partkey // 3 AS dst FROM part
      WHERE p_partkey >= 3
    )""",
        "nodes AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
        f"pr0 AS (SELECT id, CAST({_PR_TOTAL} // n AS BIGINT) AS v "
        "FROM nodes, nn)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""c{i} AS (
      SELECT e.dst AS id, SUM(p.v // deg.d) AS s
      FROM pr{i - 1} p
      JOIN e ON e.src = p.id
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"""pr{i} AS (
      SELECT n.id,
             CAST({base} // nn.n
                  + {_PR_D} * COALESCE(c.s, 0) // 1000 AS BIGINT) AS v
      FROM nodes n LEFT JOIN c{i} c ON c.id = n.id, nn
    )"""
        )
    return (
        "WITH " + ",\n    ".join(ctes)
        + f"\n    SELECT id, v AS pr FROM pr{_PR_ITERS}"
    )


@register("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark, sf):
    """Fixed-point integer PageRank over the part-derived DAG (div-2 and
    div-3 edges): an ITERATIVE algorithm with a full value oracle —
    integer mass units make every round a pure function of the graph, so
    the DuckDB unrolled twin hash-matches what float PageRank never could
    (operators/graph.py:pagerank)."""
    from indra_db_spark.operators.graph import pagerank

    p = T(spark, sf, "part")
    e1 = p.filter(F.col("p_partkey") >= 2).select(
        F.col("p_partkey").alias("src"),
        F.expr("p_partkey div 2").alias("dst"),
    )
    e2 = p.filter(F.col("p_partkey") >= 3).select(
        F.col("p_partkey").alias("src"),
        F.expr("p_partkey div 3").alias("dst"),
    )
    edges = e1.union(e2).distinct()
    return pagerank(edges, iterations=_PR_ITERS, damping_milli=_PR_D,
                    total=_PR_TOTAL)


@register(
    "events_funnel",
    """
    WITH b AS (
      SELECT user_id AS u, ts AS t, event_type AS et FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    s1 AS (SELECT u, min(t) AS s1_ts FROM b WHERE et = 'signup' GROUP BY u),
    s2 AS (
      SELECT s1.u, s1.s1_ts,
             min(CASE WHEN c.t > s1.s1_ts THEN c.t END) AS s2_ts
      FROM s1 LEFT JOIN b c ON c.u = s1.u AND c.et = 'click'
      GROUP BY s1.u, s1.s1_ts
    ),
    s3 AS (
      SELECT s2.u, s2.s1_ts, s2.s2_ts,
             min(CASE WHEN p.t > s2.s2_ts THEN p.t END) AS s3_ts
      FROM s2 LEFT JOIN b p ON p.u = s2.u AND p.et = 'purchase'
      GROUP BY s2.u, s2.s1_ts, s2.s2_ts
    )
    SELECT u AS user_id, s1_ts, s2_ts, s3_ts,
           CAST(CAST(s1_ts IS NOT NULL AS INT)
                + CAST(s2_ts IS NOT NULL AS INT)
                + CAST(s3_ts IS NOT NULL AS INT) AS INT) AS n_steps
    FROM s3
    """,
)
def events_funnel(spark, sf):
    """Ordered conversion funnel signup → click → purchase: earliest
    completion of each step strictly after the previous one (greedy is
    optimal), one per-user aggregate + join per step — per-user state is a
    timestamp per step, never the event list
    (operators/analytics.py:funnel)."""
    from indra_db_spark.operators.analytics import funnel

    return funnel(
        T(spark, sf, "events"), ["signup", "click", "purchase"]
    )


@register(
    "events_cohort_retention",
    """
    WITH b AS (
      SELECT user_id AS u, date_trunc('day', ts) AS p FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    f AS (SELECT u, min(p) AS cohort FROM b GROUP BY u)
    SELECT cohort,
           CAST(date_diff('day', cohort, p) AS INT) AS period_offset,
           CAST(count(DISTINCT u) AS BIGINT) AS n_users
    FROM b JOIN f USING (u)
    GROUP BY cohort, period_offset
    """,
)
def events_cohort_retention(spark, sf):
    """Cohort retention triangle: users grouped by first-activity day,
    distinct-counted per day offset — two partial-agg shuffles
    (operators/analytics.py:cohort_retention)."""
    from indra_db_spark.operators.analytics import cohort_retention

    return cohort_retention(T(spark, sf, "events"))


@register(
    "events_paths",
    """
    WITH s AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    c AS (
      SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n_paths
      FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY e1, e2, e3
    )
    SELECT e1, e2, e3, n_paths,
           CAST(row_number() OVER
             (ORDER BY n_paths DESC, e1, e2, e3) AS INT) AS rank
    FROM c ORDER BY n_paths DESC, e1, e2, e3 LIMIT 20
    """,
)
def events_paths(spark, sf):
    """Path analysis: top 3-step event-type sequences in per-user
    (ts, event_id) order — one per-user window shuffle for the lead
    lookahead, partial-agg sequence counts, TakeOrderedAndProject top-k
    (operators/analytics.py:event_paths)."""
    from indra_db_spark.operators.analytics import event_paths

    return event_paths(T(spark, sf, "events"), n=3, k=20)


@register(
    "graph_triangles",
    """
    WITH base AS (SELECT p_partkey AS i FROM part),
    raw AS (
      SELECT i AS x, i // 2 AS y FROM base WHERE i >= 2
      UNION ALL
      SELECT i AS x, i // 4 AS y FROM base WHERE i >= 4
    ),
    e AS (
      SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v
      FROM raw WHERE least(x, y) < greatest(x, y)
    ),
    deg AS (
      SELECT id, count(*) AS d
      FROM (SELECT u AS id FROM e UNION ALL SELECT v AS id FROM e)
      GROUP BY id
    ),
    o AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dkd
      FROM e
      JOIN deg du ON du.id = e.u
      JOIN deg dv ON dv.id = e.v
    ),
    w AS (
      SELECT e1.src AS s, e1.dst AS b, e2.dst AS c
      FROM o e1 JOIN o e2
        ON e1.src = e2.src AND (e1.dkd, e1.dst) < (e2.dkd, e2.dst)
    ),
    tri AS (
      SELECT w.s, w.b, w.c FROM w
      JOIN o ON o.src = w.b AND o.dst = w.c
    ),
    corners AS (
      SELECT s AS id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY id
    """,
)
def graph_triangles(spark, sf):
    """Exact per-node triangle counts on a triangle-rich deterministic
    graph (tree edges i—i÷2 plus grandparent shortcuts i—i÷4): degree
    orientation bounds the wedge join at O(E^1.5) even on power-law
    graphs — three equi-join shuffles, no iteration
    (operators/graph.py:triangle_participation)."""
    from indra_db_spark.operators import graph as G

    base = T(spark, sf, "part").select(F.col("p_partkey").alias("i"))
    raw = base.filter(F.col("i") >= 2).select(
        F.col("i").alias("a"), F.expr("i div 2").alias("b")
    ).unionByName(
        base.filter(F.col("i") >= 4).select(
            F.col("i").alias("a"), F.expr("i div 4").alias("b")
        )
    )
    return G.triangle_participation(raw)


_KCORE_K = 2
_KCORE_ROUNDS = 6


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled peel: the same bounded-round definition the Spark
    operator computes, as chained CTEs (the PageRank-oracle pattern —
    iterative algorithms carry full value oracles when every step is
    integer).

    The per-round CTEs are MATERIALIZED: DuckDB inlines plain CTEs, and
    each round references the previous one three times, so the unrolled
    chain re-evaluated exponentially (~3^rounds — 135+ s at sf0.001 for
    6 rounds, the whole oracle-test budget of this entry).  Materializing
    makes it linear (0.07 s); results are identical by definition."""
    sql = """
    WITH base AS (SELECT p_partkey AS i FROM part),
    raw AS (
      SELECT i AS x, i // 2 AS y FROM base WHERE i >= 2
      UNION ALL
      SELECT i AS x, i // 4 AS y FROM base WHERE i >= 4
    ),
    e0 AS (
      SELECT DISTINCT least(x, y) AS s, greatest(x, y) AS t
      FROM raw WHERE least(x, y) < greatest(x, y)
    )"""
    for r in range(1, rounds + 1):
        sql += f""",
    d{r} AS MATERIALIZED (
      SELECT id, count(*) AS d
      FROM (SELECT s AS id FROM e{r - 1}
            UNION ALL SELECT t AS id FROM e{r - 1})
      GROUP BY id
    ),
    v{r} AS (SELECT id FROM d{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.s, e.t FROM e{r - 1} e
      JOIN v{r} a ON a.id = e.s
      JOIN v{r} b ON b.id = e.t
    )"""
    return sql + f"\n    SELECT id, d FROM d{rounds} WHERE d >= {k}"


@register("graph_kcore", _kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore(spark, sf):
    """Bounded-round k-core peel on the part-derived graph (tree edges
    i—i÷2 plus grandparent shortcuts i—i÷4): 6 rounds of "drop nodes
    with degree < 2" — past the fixed point at the test scales (pinned
    in tests), and a pure integer function of the graph either way, so
    the unrolled DuckDB twin hash-matches
    (operators/graph.py:kcore)."""
    from indra_db_spark.operators.graph import kcore

    base = T(spark, sf, "part").select(F.col("p_partkey").alias("i"))
    raw = base.filter(F.col("i") >= 2).select(
        F.col("i").alias("a"), F.expr("i div 2").alias("b")
    ).unionByName(
        base.filter(F.col("i") >= 4).select(
            F.col("i").alias("a"), F.expr("i div 4").alias("b")
        )
    )
    return kcore(raw, k=_KCORE_K, rounds=_KCORE_ROUNDS)


@register(
    "events_rate_anomaly",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS period,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL
      GROUP BY event_type, date_trunc('hour', ts)
    ),
    r1 AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n) AS rn,
             count(*) OVER (PARTITION BY event_type) AS c
      FROM hourly
    ),
    med AS (
      SELECT event_type, n AS med FROM r1
      WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)
    ),
    d AS (
      SELECT h.event_type, h.period, h.n, m.med,
             abs(h.n - m.med) AS deviation
      FROM hourly h JOIN med m USING (event_type)
    ),
    r2 AS (
      SELECT *, row_number() OVER
               (PARTITION BY event_type ORDER BY deviation) AS rn,
             count(*) OVER (PARTITION BY event_type) AS c
      FROM d
    ),
    mad AS (
      SELECT event_type, deviation AS mad FROM r2
      WHERE rn = CAST(ceil(0.5 * c) AS BIGINT)
    )
    SELECT d.event_type, d.period, d.n, d.med, mad.mad, d.deviation
    FROM d JOIN mad USING (event_type)
    WHERE d.deviation * 1000 > 1500 * greatest(mad.mad, 1)
    """,
)
def events_rate_anomaly(spark, sf):
    """Robust rate-anomaly monitoring: (type, hour) buckets whose count
    deviates from the type median by > 1.5x MAD — median/MAD via the
    deterministic rank-selected quantiles so the alarm is oracle-exact
    (sigma needs a sqrt no two engines round alike); raw events touched
    once, the statistics run over the tiny bucket frame
    (operators/analytics.py:rate_anomalies)."""
    from indra_db_spark.operators.analytics import rate_anomalies

    return rate_anomalies(T(spark, sf, "events"), k_milli=1500)


@register(
    "events_gapfill",
    """
    WITH e AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'purchase' AND user_id % 97 = 0
    ),
    surv AS (
      SELECT user_id, bucket, value FROM (
        SELECT user_id, date_trunc('hour', ts) AS bucket, value,
               row_number() OVER (
                 PARTITION BY user_id, date_trunc('hour', ts)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM e) WHERE rn = 1
    ),
    span AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
      FROM surv GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
      FROM span
    ),
    j AS (
      SELECT g.user_id, g.bucket, s.value
      FROM grid g LEFT JOIN surv s
        ON s.user_id = g.user_id AND s.bucket = g.bucket
    )
    SELECT user_id, bucket,
           last_value(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
    FROM j
    """,
)
def events_gapfill(spark, sf):
    """Per-user hourly densification + last-observation-carried-forward
    (operators/temporal.py:gapfill_locf): bucket survivors by partial-agg
    max(struct) argmax, per-key grids exploded executor-side via
    sequence(), LOCF by last(ignorenulls) over the SAME key partitioning —
    one shuffle shared by agg and window.  The gap-fill step every
    per-period metric needs so empty hours appear as carried values, not
    missing rows."""
    from indra_db_spark.operators.temporal import gapfill_locf

    e = (
        T(spark, sf, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0))
        .select("user_id", "ts", "event_id", "value")
    )
    return gapfill_locf(
        e, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id", unit="hour",
    )


# --------------------------------------------------------------------------
# round 7.5: warehouse-modeling + experimentation + graph-labeling families


_SCD2_CHANGES = """
    c AS (
      SELECT user_id, ts, event_id,
             CAST(floor(abs(value) * 2) AS BIGINT) % 3 AS tier
      FROM events
      WHERE event_type = 'view' AND user_id IS NOT NULL
        AND ts IS NOT NULL AND value IS NOT NULL
    ),
    one AS (
      SELECT user_id, ts, tier FROM (
        SELECT user_id, ts, tier,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC, tier DESC) AS rn
        FROM c) WHERE rn = 1
    ),
    flag AS (
      SELECT user_id, ts, tier,
             lag(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM one
    ),
    scd AS (
      SELECT user_id, tier, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               AS is_current
      FROM flag WHERE rn = 1 OR prev IS DISTINCT FROM tier
    )
"""


def _scd2_changes_df(spark, sf):
    return (
        T(spark, sf, "events")
        .filter(
            (F.col("event_type") == "view")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.floor(F.abs(F.col("value")) * 2).cast("bigint") % 3).alias(
                "tier"
            ),
        )
    )


@register(
    "events_scd2",
    f"WITH {_SCD2_CHANGES} SELECT * FROM scd",
)
def events_scd2(spark, sf):
    """Type-2 slowly-changing dimension built from a change stream
    (operators/temporal.py:scd2_build): same-instant collapse by
    partial-agg argmax, no-op suppression by null-safe lag compare,
    half-open validity intervals by lead — three steps sharing one key
    partitioning.  The warehouse history shape the reference can only
    approximate by re-dumping its readonly store per release."""
    from indra_db_spark.operators.temporal import scd2_build

    return scd2_build(
        _scd2_changes_df(spark, sf),
        key_col="user_id", ts_col="ts",
        attr_cols=["tier"], tiebreak_col="event_id",
    )


@register(
    "events_pit_join",
    f"""
    WITH {_SCD2_CHANGES},
    f AS (
      SELECT event_id, ts, user_id, value FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND ts IS NOT NULL
    )
    SELECT f.event_id, f.ts, f.user_id, f.value,
           d.valid_from AS d_valid_from, d.tier AS d_tier,
           d.valid_to AS d_valid_to, d.is_current AS d_is_current
    FROM f LEFT JOIN scd d
      ON f.user_id = d.user_id
     AND f.ts >= d.valid_from
     AND (d.valid_to IS NULL OR f.ts < d.valid_to)
    """,
)
def events_pit_join(spark, sf):
    """Point-in-time enrichment: every purchase picks the SCD2 dimension
    version valid AT the purchase instant (operators/temporal.py:
    pit_join) — expressed as a backward as-of join on valid_from (one
    union-merge shuffle) instead of the oracle's interval join, because
    SCD2 intervals are non-overlapping per key; a stale-interval
    post-filter keeps the left-outer contract.  The leakage-free
    as-of-event feature join of an ML training pipeline."""
    from indra_db_spark.operators.temporal import pit_join, scd2_build

    dim = scd2_build(
        _scd2_changes_df(spark, sf),
        key_col="user_id", ts_col="ts",
        attr_cols=["tier"], tiebreak_col="event_id",
    )
    facts = (
        T(spark, sf, "events")
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select("event_id", "ts", "user_id", "value")
    )
    return pit_join(facts, dim, on="user_id").select(
        "event_id", "ts", "user_id", "value",
        "d_valid_from", "d_tier", "d_valid_to", "d_is_current",
    )


_ROLL_S = 6 * 3600  # trailing 6 hours


@register(
    "events_rolling",
    f"""
    SELECT event_id, ts, user_id,
           CAST(sum(vm) OVER w AS BIGINT) AS roll_sum_micro,
           CAST(count(*) OVER w AS BIGINT) AS roll_n
    FROM (
      SELECT event_id, ts, user_id,
             CAST(floor(value * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND ts IS NOT NULL
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_ROLL_S * 1_000_000} PRECEDING
                       AND CURRENT ROW)
    """,
)
def events_rolling(spark, sf):
    """Trailing 6-hour rolling spend + event count per user, one value
    per purchase (operators/temporal.py:rolling_agg): a RANGE window
    over integer epoch-micros — ties share a frame so the result is
    partition-order-free, and the micro-int sum keeps addition exact
    across engines.  The per-event velocity metric behind rate limits
    and spend alerts."""
    from indra_db_spark.operators.temporal import rolling_agg

    p = (
        T(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value")
    )
    return rolling_agg(
        p, key_col="user_id", ts_col="ts",
        value_micro=F.floor(F.col("value") * 1_000_000),
        window_seconds=_ROLL_S,
    ).select("event_id", "ts", "user_id", "roll_sum_micro", "roll_n")


_COOC_CAP = 64
_COOC_MIN = 2


@register(
    "events_cooccur",
    f"""
    WITH ki AS (
      SELECT DISTINCT user_id AS k,
             event_type || '@' ||
               lpad(CAST(hour(ts) AS VARCHAR), 2, '0') AS i
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    kept AS (
      SELECT k, i FROM ki
      QUALIFY count(*) OVER (PARTITION BY k) <= {_COOC_CAP}
    ),
    per_item AS (
      SELECT i, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY i
    ),
    pairs AS (
      SELECT a.i AS item_a, b.i AS item_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM kept a JOIN kept b ON a.k = b.k AND a.i < b.i
      GROUP BY a.i, b.i HAVING count(*) >= {_COOC_MIN}
    )
    SELECT item_a, item_b, n_both, pa.n AS n_a, pb.n AS n_b,
           CAST(n_both * 1000000 // (pa.n + pb.n - n_both) AS BIGINT)
             AS jaccard_micro
    FROM pairs
    JOIN per_item pa ON pa.i = item_a
    JOIN per_item pb ON pb.i = item_b
    """,
)
def events_cooccur(spark, sf):
    """Item co-occurrence with exact integer Jaccard over (event_type,
    hour-of-day) baskets per user (operators/analytics.py:
    cooccurrence_pairs): distinct basket self-join bounded by the
    per-key cap — pair volume is quadratic in basket width, never in
    corpus size, and over-wide keys are dropped before the join (the
    hot-basket guard)."""
    from indra_db_spark.operators.analytics import cooccurrence_pairs

    e = T(spark, sf, "events").select(
        "user_id",
        F.concat(
            F.col("event_type"),
            F.lit("@"),
            F.lpad(F.hour("ts").cast("string"), 2, "0"),
        ).alias("item"),
    )
    return cooccurrence_pairs(
        e, key_col="user_id", item_col="item",
        max_items_per_key=_COOC_CAP, min_count=_COOC_MIN,
    )


@register(
    "events_ab_daily",
    """
    WITH pu AS (
      SELECT user_id AS u,
             min(date_trunc('day', ts)) AS exp_day,
             min(CASE WHEN event_type = 'purchase'
                      THEN date_trunc('day', ts) END) AS conv_day
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    pv AS (SELECT u, exp_day, conv_day, u % 2 AS variant FROM pu),
    ed AS (
      SELECT variant, exp_day AS day, CAST(count(*) AS BIGINT) AS n_exp
      FROM pv GROUP BY variant, exp_day
    ),
    cd AS (
      SELECT variant, conv_day AS day, CAST(count(*) AS BIGINT) AS n_conv
      FROM pv WHERE conv_day IS NOT NULL GROUP BY variant, conv_day
    ),
    days AS (
      SELECT day, variant
      FROM (SELECT day FROM ed UNION SELECT day FROM cd)
      CROSS JOIN (SELECT DISTINCT variant FROM pv)
    ),
    daily AS (
      SELECT d.day, d.variant,
             coalesce(e.n_exp, 0) AS n_exp,
             coalesce(c.n_conv, 0) AS n_conv
      FROM days d
      LEFT JOIN ed e ON e.variant = d.variant AND e.day = d.day
      LEFT JOIN cd c ON c.variant = d.variant AND c.day = d.day
    ),
    cum AS (
      SELECT day, variant,
             CAST(sum(n_exp) OVER w AS BIGINT) AS cum_exposed,
             CAST(sum(n_conv) OVER w AS BIGINT) AS cum_converted
      FROM daily
      WINDOW w AS (PARTITION BY variant ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT day, variant, cum_exposed, cum_converted,
           CASE WHEN cum_exposed > 0
                THEN CAST(cum_converted * 1000000 // cum_exposed AS BIGINT)
           END AS rate_micro
    FROM cum
    """,
)
def events_ab_daily(spark, sf):
    """Cumulative A/B conversion read-out (operators/analytics.py:
    ab_daily_uplift): deterministic variant assignment by id hash, one
    partial-agg pass over the raw log to per-user first-exposure /
    first-conversion days, then cumulative windows over the tiny
    days × variants grid — exact integer rates, monotone by
    construction."""
    from indra_db_spark.operators.analytics import ab_daily_uplift

    return ab_daily_uplift(T(spark, sf, "events"))


_LP_ROUNDS = 8


def _labelprop_oracle(rounds: int) -> str:
    """Unrolled synchronous min-label rounds (the kcore/PageRank oracle
    pattern: bounded-round iterative graph algorithms carry full value
    oracles because every step is integer)."""
    sql = """
    WITH base AS (SELECT p_partkey AS i FROM part),
    raw AS (
      SELECT i AS x, i // 2 AS y FROM base WHERE i >= 2
      UNION ALL
      SELECT i AS x, i // 4 AS y FROM base WHERE i >= 4
    ),
    e AS (
      SELECT DISTINCT least(x, y) AS s, greatest(x, y) AS t
      FROM raw WHERE least(x, y) < greatest(x, y)
    ),
    de AS (SELECT s, t FROM e UNION ALL SELECT t AS s, s AS t FROM e),
    l0 AS (SELECT DISTINCT s AS id, s AS lbl FROM de)"""
    for r in range(1, rounds + 1):
        sql += f""",
    l{r} AS MATERIALIZED (
      SELECT n.id, least(n.lbl, coalesce(m.nm, n.lbl)) AS lbl
      FROM l{r - 1} n LEFT JOIN (
        SELECT de.t AS id, min(l.lbl) AS nm
        FROM de JOIN l{r - 1} l ON l.id = de.s
        GROUP BY de.t) m ON m.id = n.id
    )"""
    return sql + f"\n    SELECT id, lbl FROM l{rounds}"


@register("graph_labelprop", _labelprop_oracle(_LP_ROUNDS))
def graph_labelprop(spark, sf):
    """Bounded-round synchronous min-label propagation on the
    part-derived graph (operators/graph.py:label_propagation): one
    labels⋈edges join + partial-agg min per round, labels frame bounded
    by |V|, hub skew absorbed map-side.  8 rounds exceed the fixture
    graph's min-label eccentricity (log₄ of the largest id), so the
    result equals per-component minima — pinned in tests; the oracle
    unrolls the identical rounds either way."""
    from indra_db_spark.operators.graph import label_propagation

    base = T(spark, sf, "part").select(F.col("p_partkey").alias("i"))
    raw = base.filter(F.col("i") >= 2).select(
        F.col("i").alias("a"), F.expr("i div 2").alias("b")
    ).unionByName(
        base.filter(F.col("i") >= 4).select(
            F.col("i").alias("a"), F.expr("i div 4").alias("b")
        )
    )
    return label_propagation(raw, rounds=_LP_ROUNDS)


# --------------------------------------------------------------------------
# round 7.6: reshaping + multi-grain aggregation + robust stats + centroids


@register(
    "lineitem_unpivot",
    """
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount
      FROM lineitem WHERE l_orderkey % 1000 = 0
    )
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
           l_quantity AS val FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM src
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
    """,
)
def lineitem_unpivot(spark, sf):
    """Wide→long reshaping (the inverse of source_pivot): measures melt
    into (measure, val) rows via the native ``unpivot`` operator — an
    Expand node, 3 output rows per input WITHOUT a shuffle or a union of
    3 re-scans (the oracle's UNION ALL spells out the semantics; the
    Spark plan reads the table once).  The long shape every
    metric-agnostic pipeline stage (profiling, anomaly scans) consumes."""
    src = (
        T(spark, sf, "lineitem")
        .filter(F.col("l_orderkey") % 1000 == 0)
        .select(
            "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount",
        )
    )
    return src.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    )


@register(
    "events_grouping_sets",
    """
    SELECT event_type, date_trunc('hour', ts) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(grouping(event_type) AS INT) AS g_type,
           CAST(grouping(date_trunc('hour', ts)) AS INT) AS g_hour
    FROM events WHERE ts IS NOT NULL
    GROUP BY CUBE (event_type, date_trunc('hour', ts))
    """,
)
def events_grouping_sets(spark, sf):
    """Multi-grain aggregation in ONE pass: CUBE(type, hour) emits all
    four grains (cell, per-type, per-hour, grand total) from a single
    Expand + partial agg — vs four separate scans of a 100-TB log; the
    GROUPING() flags disambiguate a NULL dimension value from an
    aggregated-out one (completes the ROLLUP entry,
    events_hier_rollup)."""
    e = (
        T(spark, sf, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_type", F.date_trunc("hour", "ts").alias("hour"))
    )
    return (
        e.cube("event_type", "hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hour").cast("int").alias("g_hour"),
        )
        .select("event_type", "hour", "n", "g_type", "g_hour")
    )


_WINS_LO, _WINS_HI = 0.05, 0.95


@register(
    "events_winsorized",
    f"""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, vm,
             row_number() OVER (PARTITION BY event_type ORDER BY vm) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    bounds AS (
      SELECT event_type,
             min(CASE WHEN rn = greatest(1, CAST(ceil(n * {_WINS_LO}) AS BIGINT))
                      THEN vm END) AS lo,
             min(CASE WHEN rn = greatest(1, CAST(ceil(n * {_WINS_HI}) AS BIGINT))
                      THEN vm END) AS hi
      FROM ranked GROUP BY event_type
    )
    SELECT v.event_type,
           CAST(count(*) AS BIGINT) AS n,
           b.lo AS lo_micro, b.hi AS hi_micro,
           CAST(sum(least(greatest(v.vm, b.lo), b.hi)) // count(*) AS BIGINT)
             AS wins_mean_micro
    FROM v JOIN bounds b ON b.event_type = v.event_type
    GROUP BY v.event_type, b.lo, b.hi
    """,
)
def events_winsorized(spark, sf):
    """Winsorized (outlier-clipped) per-type mean spend: p05/p95 bounds
    by deterministic rank selection (operators/topk.py:
    discrete_quantiles — elements of the data, no interpolation, so the
    whole statistic stays integer-exact across engines), values clipped
    to the bounds, mean as integer micro division.  The robust
    aggregation a metrics pipeline uses where one whale would otherwise
    move the mean; raw volume is touched twice (rank pass + clip pass)
    with the bounds frame broadcast."""
    from indra_db_spark.operators.topk import discrete_quantiles

    v = (
        T(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        )
    )
    bounds = discrete_quantiles(
        v, ["event_type"], "vm", {"lo": _WINS_LO, "hi": _WINS_HI}
    ).select("event_type", F.col("lo").alias("lo_micro"), F.col("hi").alias("hi_micro"))
    clipped = v.join(F.broadcast(bounds), "event_type").withColumn(
        "cvm",
        F.least(F.greatest(F.col("vm"), F.col("lo_micro")), F.col("hi_micro")),
    )
    return (
        clipped.groupBy("event_type", "lo_micro", "hi_micro")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("CAST(sum(cvm) div count(1) AS BIGINT)").alias(
                "wins_mean_micro"
            ),
        )
        .select(
            "event_type", "n", "lo_micro", "hi_micro", "wins_mean_micro"
        )
    )


@register(
    "emb_label_centroids",
    """
    SELECT label, CAST(ord - 1 AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           CAST(floor(
             CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                  AS DOUBLE) / count(*)
           ) AS BIGINT) AS mean_micro
    FROM (
      SELECT label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings WHERE label IS NOT NULL
    ) d
    GROUP BY label, dim
    """,
)
def emb_label_centroids(spark, sf):
    """Per-label centroid of the embedding column (nearest-centroid
    classification / cluster summarization): posexplode to (label, dim,
    component), one partial-agg shuffle on (label, dim) — never a
    per-label collect; components quantized to integer micros BEFORE
    summation so the cross-engine sum is exact, and the mean floors a
    double division of int64s (both engines' IEEE doubles agree below
    2^53)."""
    e = (
        T(spark, sf, "embeddings")
        .filter(F.col("label").isNotNull())
        .select("label", F.posexplode("embedding").alias("dim", "x"))
    )
    return (
        e.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(
                F.sum(
                    F.floor(F.col("x").cast("double") * 1_000_000).cast(
                        "bigint"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("mean_micro"),
        )
        .select("label", F.col("dim").cast("int").alias("dim"), "n", "mean_micro")
    )


_BFS_ROUNDS = 6


def _bfs_oracle(rounds: int, inf: int) -> str:
    """Unrolled synchronous BFS relaxations (labelprop/kcore pattern)."""
    sql = """
    WITH base AS (SELECT p_partkey AS i FROM part),
    raw AS (
      SELECT i AS x, i // 2 AS y FROM base WHERE i >= 2
      UNION ALL
      SELECT i AS x, i // 4 AS y FROM base WHERE i >= 4
    ),
    e AS (
      SELECT DISTINCT least(x, y) AS s, greatest(x, y) AS t
      FROM raw WHERE least(x, y) < greatest(x, y)
    ),
    de AS (SELECT s, t FROM e UNION ALL SELECT t AS s, s AS t FROM e),
    d0 AS (
      SELECT DISTINCT s AS id, 0 AS dist FROM de WHERE s <= 2
    )"""
    for r in range(1, rounds + 1):
        sql += f""",
    d{r} AS (
      SELECT coalesce(a.id, b.id) AS id,
             least(coalesce(a.dist, {inf}), coalesce(b.nd, {inf})) AS dist
      FROM d{r - 1} a FULL OUTER JOIN (
        SELECT de.t AS id, min(l.dist) + 1 AS nd
        FROM de JOIN d{r - 1} l ON l.id = de.s
        GROUP BY de.t) b ON a.id = b.id
    )"""
    return (
        sql
        + f"\n    SELECT id, CAST(dist AS INT) AS dist FROM d{rounds}"
        + f" WHERE dist < {inf}"
    )


from indra_db_spark.operators.graph import BFS_INF as _BFS_INF  # noqa: E402


@register("graph_bfs", _bfs_oracle(_BFS_ROUNDS, _BFS_INF))
def graph_bfs(spark, sf):
    """Bounded-round multi-source BFS distances on the part-derived graph
    (operators/graph.py:bfs_distances): 6 synchronous relaxations from
    sources {1, 2} — per round one frontier⋈edges join + partial-agg min
    + full-outer merge, frame bounded by |V|; the sentinel (not NULL)
    carries unreached distances so both engines' least() agree.  The
    k-hop blast-radius query of lineage/fraud graphs, oracle-unrolled
    like labelprop/kcore/PageRank."""
    from indra_db_spark.operators.graph import bfs_distances

    base = T(spark, sf, "part").select(F.col("p_partkey").alias("i"))
    raw = base.filter(F.col("i") >= 2).select(
        F.col("i").alias("a"), F.expr("i div 2").alias("b")
    ).unionByName(
        base.filter(F.col("i") >= 4).select(
            F.col("i").alias("a"), F.expr("i div 4").alias("b")
        )
    )
    sources = spark.range(1, 3).select(F.col("id"))
    return bfs_distances(raw, sources, rounds=_BFS_ROUNDS).select(
        "id", F.col("dist").cast("int").alias("dist")
    )


@register(
    "events_feature_scale",
    """
    WITH v AS (
      SELECT event_id, event_type,
             CAST(floor(value * 1000000) AS BIGINT) AS vm
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT event_id, event_type, vm,
             rank() OVER (PARTITION BY event_type ORDER BY vm) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n,
             min(vm) OVER (PARTITION BY event_type) AS lo,
             max(vm) OVER (PARTITION BY event_type) AS hi
      FROM v
    )
    SELECT event_id, event_type, vm,
           CASE WHEN n > 1
                THEN CAST(CAST(rk - 1 AS BIGINT) * 1000000 // (n - 1) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS pct_rank_micro,
           CASE WHEN hi > lo
                THEN CAST((vm - lo) * 1000000 // (hi - lo) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS minmax_micro
    FROM r
    """,
)
def events_feature_scale(spark, sf):
    """Per-group feature scaling in exact integer micros: percentile rank
    (rank() — ties share a value, so the statistic is a pure function of
    the data, no tie-order dependence) and min-max normalization, both
    from ONE per-type window partitioning (rank, count, min, max share
    the same exchange).  The leakage-free per-feature normalization step
    of a training pipeline; degenerate groups (one row / constant value)
    scale to 0 instead of dividing by zero."""
    from pyspark.sql import Window

    v = (
        T(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        )
    )
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("vm")
    r = (
        v.withColumn("rk", F.rank().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("lo", F.min("vm").over(wp))
        .withColumn("hi", F.max("vm").over(wp))
    )
    return r.select(
        "event_id",
        "event_type",
        "vm",
        F.when(
            F.col("n") > 1,
            F.expr(
                "CAST(CAST(rk - 1 AS BIGINT) * 1000000 div (n - 1) AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("pct_rank_micro"),
        F.when(
            F.col("hi") > F.col("lo"),
            F.expr("CAST((vm - lo) * 1000000 div (hi - lo) AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("minmax_micro"),
    )


_SKEW_K = 8


@register(
    "lake_skew_report",
    f"""
    WITH pairs AS (
      SELECT 'event_type' AS col_name, event_type AS value FROM events
      WHERE event_type IS NOT NULL
      UNION ALL
      SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      WHERE user_id IS NOT NULL
    ),
    c AS (
      SELECT col_name, value, CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY col_name, value
    ),
    t AS (SELECT col_name, CAST(sum(n) AS BIGINT) AS total FROM c
          GROUP BY col_name),
    r AS (
      SELECT c.col_name, c.value, c.n, t.total,
             row_number() OVER (PARTITION BY c.col_name
                                ORDER BY c.n DESC, c.value) AS rank
      FROM c JOIN t ON t.col_name = c.col_name
    )
    SELECT col_name, value, n,
           CAST(n * 1000000 // total AS BIGINT) AS share_micro,
           CAST(rank AS INT) AS rank
    FROM r WHERE rank <= {_SKEW_K}
    """,
)
def lake_skew_report(spark, sf):
    """Heavy-hitter skew diagnosis over candidate key columns
    (operators/profile.py:skew_report): one Expand scan, one partial-agg
    count, broadcast per-column totals, WindowGroupLimit top-k with a
    deterministic tie-break — the measurement that decides where the
    salting/chunking escapes pay for themselves."""
    from indra_db_spark.operators.profile import skew_report

    return skew_report(
        T(spark, sf, "events").select("event_type", "user_id"),
        ["event_type", "user_id"],
        k=_SKEW_K,
    )


@register(
    "events_attribution_model",
    """
    WITH pairs AS (
      SELECT t.event_id AS touch_id, t.ts AS touch_ts,
             c.event_id AS conv_id
      FROM (SELECT event_id, ts, user_id FROM events
            WHERE event_type = 'click') t
      JOIN (SELECT event_id, ts, user_id FROM events
            WHERE event_type = 'purchase') c
        ON t.user_id = c.user_id
       AND c.ts >= t.ts AND c.ts <= t.ts + INTERVAL 1 HOUR
    ),
    r AS (
      SELECT conv_id, touch_id, touch_ts,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY touch_ts DESC, touch_id DESC)
               AS rn,
             CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT)
               AS n_touches
      FROM pairs
    )
    SELECT conv_id, touch_id, touch_ts, n_touches,
           rn = 1 AS is_last,
           CAST(1000000 // n_touches AS BIGINT)
             + CASE WHEN rn = 1
                    THEN CAST(1000000 % n_touches AS BIGINT)
                    ELSE 0 END AS linear_credit_micro
    FROM r
    """,
)
def events_attribution_model(spark, sf):
    """Credit assignment over the click→purchase pairs (operators/
    analytics.py:attribution_credits): last-touch flag and linear credit
    in exact integer micros, the remainder assigned to the last touch so
    every conversion's credits sum to exactly 10⁶ — floor division alone
    leaks 10⁶ mod n micros per conversion, a silently vanishing revenue
    stream at volume.  One window partitioning on the conversion id
    covers both models."""
    from indra_db_spark.operators.analytics import attribution_credits
    from indra_db_spark.streaming.ingest import interval_attribution

    pairs = interval_attribution(
        _typed(spark, sf, "click"),
        _typed(spark, sf, "purchase"),
        horizon=_ATTR_HORIZON,
    ).select("touch_id", "touch_ts", "conv_id")
    return attribution_credits(pairs)


@register(
    "events_ivm_rollup",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_vm
    FROM (SELECT event_type, value FROM events
          WHERE value IS NOT NULL AND event_id IS NOT NULL)
    GROUP BY event_type
    """,
)
def events_ivm_rollup(spark, sf):
    """Incremental view maintenance, oracle-checked end to end: bootstrap
    the per-type rollup from the first ~90% of the log, fold the
    remaining slice in as an append-only change feed
    (plans/ivm.py:incremental_agg — one partial-agg shuffle of the DELTA
    + a join against the view), and the result must hash-match the
    oracle's straight GROUP BY over everything.  The maintained view IS
    the rebuilt view — the property that lets a 100-TB rollup update per
    commit without rescans.  Values fold in integer micros so the
    incremental and monolithic sums agree bit-for-bit."""
    from indra_db_spark.plans.ivm import grouped_snapshot, incremental_agg

    e = (
        T(spark, sf, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        )
    )
    day1 = e.filter(F.col("event_id") % 10 != 0)
    drop = e.filter(F.col("event_id") % 10 == 0)
    view = grouped_snapshot(day1, ["event_type"], ["vm"])
    maintained = incremental_agg(
        view, drop, ["event_type"], ["vm"], change_type_col=None
    )
    return maintained.select(
        "event_type", "n", F.col("sum_vm").alias("sum_vm")
    )


@register(
    "events_ivm_minmax",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           min(vm) AS min_vm,
           max(vm) AS max_vm
    FROM (SELECT event_type,
                 CAST(floor(value * 1000000) AS BIGINT) AS vm,
                 event_id
          FROM events
          WHERE value IS NOT NULL AND event_id IS NOT NULL)
    WHERE NOT (event_id % 10 <> 0 AND event_id % 7 = 0)
    GROUP BY event_type
    """,
)
def events_ivm_minmax(spark, sf):
    """Min/max view maintenance under RETRACTION, oracle-checked end to
    end (r8 verdict #6): bootstrap the per-type count/min/max view from
    the ~90% base slice, then fold in a CDF feed that both INSERTS the
    held-out slice and DELETES every 7th base row — deletions that
    provably remove some groups' stored extrema, forcing the dirty-group
    path.  plans/ivm.py:incremental_minmax folds clean groups from the
    delta alone and re-aggregates dirty groups from the new snapshot via
    a broadcast-semi-join prune; the maintained view must hash-match the
    oracle's straight GROUP BY over the post-change row set.  Values
    compare in integer micros so both engines agree bit-for-bit."""
    from indra_db_spark.plans.ivm import grouped_snapshot, incremental_minmax

    e = (
        T(spark, sf, "events")
        .filter(F.col("value").isNotNull() & F.col("event_id").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        )
    )
    base = e.filter(F.col("event_id") % 10 != 0)
    inserts = e.filter(F.col("event_id") % 10 == 0).withColumn(
        "_change_type", F.lit("insert")
    )
    deletes = base.filter(F.col("event_id") % 7 == 0).withColumn(
        "_change_type", F.lit("delete")
    )
    feed = inserts.unionByName(deletes)
    new_snapshot = e.filter(
        ~((F.col("event_id") % 10 != 0) & (F.col("event_id") % 7 == 0))
    )
    view = grouped_snapshot(base, ["event_type"], minmax_cols=["vm"])
    maintained = incremental_minmax(
        view, feed, new_snapshot, ["event_type"], ["vm"]
    )
    return maintained.select("event_type", "n", "min_vm", "max_vm")


@register(
    "events_ohlc",
    """
    WITH v AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id,
             CAST(floor(value * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE event_type = 'purchase' AND user_id IS NOT NULL
        AND ts IS NOT NULL
    ),
    o AS (
      SELECT user_id, bucket, vm AS open_micro FROM (
        SELECT user_id, bucket, vm, row_number() OVER (
          PARTITION BY user_id, bucket
          ORDER BY ts, event_id, vm) AS rn
        FROM v) WHERE rn = 1
    ),
    c AS (
      SELECT user_id, bucket, vm AS close_micro FROM (
        SELECT user_id, bucket, vm, row_number() OVER (
          PARTITION BY user_id, bucket
          ORDER BY ts DESC, event_id DESC, vm DESC) AS rn
        FROM v) WHERE rn = 1
    )
    SELECT v.user_id, v.bucket, o.open_micro,
           max(v.vm) AS high_micro, min(v.vm) AS low_micro,
           c.close_micro, CAST(count(*) AS BIGINT) AS n
    FROM v
    JOIN o ON o.user_id = v.user_id AND o.bucket = v.bucket
    JOIN c ON c.user_id = v.user_id AND c.bucket = v.bucket
    GROUP BY v.user_id, v.bucket, o.open_micro, c.close_micro
    """,
)
def events_ohlc(spark, sf):
    """Hourly OHLC bars per user over purchase values (operators/
    temporal.py:ohlc_bars) — the hypertable candlestick rollup as ONE
    partial-agg shuffle: open/close are min/max(struct(ts, tiebreak,
    value)) argmins, never a window, so hot keys combine map-side (the
    oracle spells the same semantics with rank-1 windows)."""
    from indra_db_spark.operators.temporal import ohlc_bars

    p = (
        T(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id",
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        )
    )
    return ohlc_bars(p, "user_id", "ts", "vm", tiebreak_col="event_id")


@register(
    "events_twap",
    """
    WITH one AS (
      SELECT user_id, ts, vm FROM (
        SELECT user_id, ts,
               CAST(floor(value * 1000000) AS BIGINT) AS vm,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC,
                                           floor(value * 1000000) DESC)
                 AS rn
        FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
          AND ts IS NOT NULL
      ) WHERE rn = 1
    ),
    timed AS (
      SELECT user_id, ts, vm,
             (epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts))
               - epoch_us(ts)) // 1000000 AS dur
      FROM one
    ),
    agg AS (
      SELECT user_id,
             CAST(sum(vm * dur) AS BIGINT) AS num,
             CAST(sum(dur) AS BIGINT) AS span_s,
             CAST(count(*) AS BIGINT) AS n_obs,
             max(struct_pack(t := ts, v := vm)) AS last_row
      FROM timed GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN span_s > 0
                THEN CAST(floor(CAST(num AS DOUBLE) / span_s) AS BIGINT)
                ELSE last_row.v END AS twap_micro,
           coalesce(span_s, 0) AS span_s, n_obs
    FROM agg
    """,
)
def events_twap(spark, sf):
    """Per-user time-weighted average purchase value (operators/
    temporal.py:twap): each observation holds until the next (LOCF), so
    burst sampling doesn't overweight busy periods — Σ(v·duration) and
    Σ(duration) are exact int64 sums on one key partitioning shared by
    the same-instant collapse, the lead() window and the final ratio;
    single-observation keys carry their value."""
    from indra_db_spark.operators.temporal import twap

    p = (
        T(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id",
            F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        )
    )
    return twap(p, "user_id", "ts", "vm", tiebreak_col="event_id")


from indra_db_spark.operators import text as _X  # noqa: E402

_CONF_COUNTS = ",\n      ".join(
    "len(list_filter(regexp_split_to_array(lower(text), '\\s+'), "
    "x -> x IN ({}))) AS c_{}".format(
        ", ".join(f"'{m}'" for m in markers), lang
    )
    for lang, markers in _X.LANG_MARKERS.items()
)


@register(
    "doc_langid_confusion",
    f"""
    WITH s AS (SELECT doc_id, lang, {_CONF_COUNTS}
      FROM documents WHERE lang IS NOT NULL),
    p AS (
      SELECT lang,
        CASE WHEN c_en > 0 AND c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
             WHEN c_de > 0 AND c_de >= c_fr AND c_de >= c_es THEN 'de'
             WHEN c_fr > 0 AND c_fr >= c_es THEN 'fr'
             WHEN c_es > 0 THEN 'es'
             ELSE 'und' END AS pred_lang
      FROM s),
    m AS (
      SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY lang, pred_lang
    ),
    t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total FROM m GROUP BY lang)
    SELECT m.lang, m.pred_lang, m.n,
           CAST(m.n * 1000000 // t.total AS BIGINT) AS rate_micro
    FROM m JOIN t ON t.lang = m.lang
    """,
)
def doc_langid_confusion(spark, sf):
    """Model-evaluation confusion matrix for the n-gram language
    identifier against the corpus's labeled ``lang`` column: (truth,
    prediction, count, per-truth rate in exact micros) — the eval table
    any classifier gate publishes before it filters a corpus.  Two
    partial-agg shuffles over the tiny (lang × pred) frame; the raw text
    is scanned once (langid is a pure column expression)."""
    from indra_db_spark.operators import text as X

    d = (
        T(spark, sf, "documents")
        .filter(F.col("lang").isNotNull())
        .select("lang", X.lang_id(F.col("text")).alias("pred_lang"))
    )
    # two consumers (totals + join): compute the tiny confusion frame
    # once or the totals branch re-scans the raw text
    m = (
        d.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    t = m.groupBy("lang").agg(F.sum("n").alias("total"))
    return m.join(F.broadcast(t), "lang").select(
        "lang",
        "pred_lang",
        "n",
        F.expr("CAST(n * 1000000 div total AS BIGINT)").alias("rate_micro"),
    )


@register(
    "graph_neighbor_agg",
    """
    WITH base AS (
      SELECT p_partkey AS i,
             CAST(floor(p_retailprice * 1000000) AS BIGINT) AS feat
      FROM part
    ),
    raw AS (
      SELECT i AS x, i // 2 AS y FROM base WHERE i >= 2
      UNION ALL
      SELECT i AS x, i // 4 AS y FROM base WHERE i >= 4
    ),
    e AS (
      SELECT DISTINCT least(x, y) AS s, greatest(x, y) AS t
      FROM raw WHERE least(x, y) < greatest(x, y)
    ),
    de AS (SELECT s, t FROM e UNION ALL SELECT t AS s, s AS t FROM e)
    SELECT de.t AS id,
           CAST(count(*) AS BIGINT) AS n_nbrs,
           CAST(sum(b.feat) AS BIGINT) AS sum_feat_micro,
           CAST(floor(CAST(sum(b.feat) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_feat_micro
    FROM de JOIN base b ON b.i = de.s
    GROUP BY de.t
    """,
)
def graph_neighbor_agg(spark, sf):
    """One round of neighbor feature aggregation (the GNN
    message-passing / feature-propagation primitive): every node
    collects count/sum/mean of its neighbors' feature over the
    part-derived graph — ONE edges⋈features join + ONE partial-agg
    shuffle keyed on the destination; hub fan-in collapses map-side.
    Features quantized to integer micros before summation; the mean
    floors a double over int64s (exact below 2^53).  Iterating this is
    exactly label_propagation/PageRank's loop — this entry pins the
    single-round shape with a plain-SQL oracle."""
    base = T(spark, sf, "part").select(
        F.col("p_partkey").alias("i"),
        F.floor(F.col("p_retailprice") * 1_000_000)
        .cast("bigint")
        .alias("feat"),
    )
    raw = base.filter(F.col("i") >= 2).select(
        F.col("i").alias("x"), F.expr("i div 2").alias("y")
    ).unionByName(
        base.filter(F.col("i") >= 4).select(
            F.col("i").alias("x"), F.expr("i div 4").alias("y")
        )
    )
    e = (
        raw.select(
            F.least("x", "y").alias("s"), F.greatest("x", "y").alias("t")
        )
        .filter(F.col("s") < F.col("t"))
        .distinct()
    )
    de = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    )
    return (
        de.join(base.select(F.col("i").alias("s"), "feat"), "s")
        .groupBy(F.col("t").alias("id"))
        .agg(
            F.count(F.lit(1)).alias("n_nbrs"),
            F.sum("feat").alias("sum_feat_micro"),
            F.floor(
                F.sum("feat").cast("double") / F.count(F.lit(1))
            )
            .cast("bigint")
            .alias("mean_feat_micro"),
        )
    )
