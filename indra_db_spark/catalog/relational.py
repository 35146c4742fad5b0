"""Relational-core catalog entries — generic analogs of the reference's
query-algebra leaves, set ops, joins, aggregations, windows and scalar
functions (SURVEY.md §2.2-§2.7) over the TPC-H-ish test tables.

Reference citations per entry point at the indra_db operator each query
models.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from indra_db_spark.catalog import register
from indra_db_spark.functions.decimals import davg, dec, drevenue, dsum
from indra_db_spark.operators.setops import (
    anti_join,
    keyed_except,
    keyed_intersect,
    keyed_union,
    semi_join,
)
from indra_db_spark.operators.topk import argmax_per_group, global_topk, grouped_topn
from indra_db_spark.sources.lake import load_table as T

# ---------------------------------------------------------------- §2.1 scans


@register(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 5
    """,
)
def scan_filter_project(spark, sf):
    """Projection + predicate pushed into the parquet scan (the reference's
    _base_query shape, query.py:925-933: every leaf is filter+project)."""
    return (
        T(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_quantity") < 5)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


# ------------------------------------------------------- §2.2 filter leaves


@register(
    "hash_isin",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey IN (1, 7, 77, 777, 1337)
    """,
)
def hash_isin(spark, sf):
    """HasHash: key ∈ list (reference: query.py:1520-1579)."""
    return (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey").isin(1, 7, 77, 777, 1337))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "type_in",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem WHERE l_returnflag IN ('A', 'R')
    GROUP BY l_returnflag, l_linestatus
    """,
)
def type_in(spark, sf):
    """HasType: type_num ∈ set (reference: query.py:2307-2362)."""
    return (
        T(spark, sf, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "evidence_bound",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_acctbal > 500 AND c_acctbal < 2500
    """,
)
def evidence_bound(spark, sf):
    """HasEvidenceBound: AND of relational bounds (query.py:2207-2304)."""
    return (
        T(spark, sf, "customer")
        .filter((F.col("c_acctbal") > 500) & (F.col("c_acctbal") < 2500))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "sources_and",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events
    GROUP BY user_id
    HAVING count(*) FILTER (WHERE event_type = 'purchase') > 0
       AND count(*) FILTER (WHERE event_type = 'error') > 0
    """,
)
def sources_and(spark, sf):
    """HasSources: AND over per-source counts > 0 (query.py:1399-1454)."""
    ev = T(spark, sf, "events")
    agg = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
    )
    return agg.filter((F.col("n_purchase") > 0) & (F.col("n_error") > 0))


@register(
    "only_source",
    """
    SELECT user_id, min(event_type) AS the_src, count(*) AS n
    FROM events WHERE value > 190
    GROUP BY user_id
    HAVING count(DISTINCT event_type) = 1
    """,
)
def only_source(spark, sf):
    """HasOnlySource: exactly one distinct source per key
    (reference: query.py:1356-1396, only_src column)."""
    return (
        T(spark, sf, "events")
        .filter(F.col("value") > 190)
        .groupBy("user_id")
        .agg(
            F.min("event_type").alias("the_src"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("_nd"),
        )
        .filter(F.col("_nd") == 1)
        .drop("_nd")
    )


@register(
    "source_pivot",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS click,
           count(*) FILTER (WHERE event_type = 'error') AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup') AS signup,
           count(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
)
def source_pivot(spark, sf):
    """Dynamic per-source count columns — the reference's pa_stmt_src
    crosstab pivot (readonly_schema.py:415-476) as groupBy().pivot()."""
    return (
        T(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "papers_semijoin",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def papers_semijoin(spark, sf):
    """FromPapers: filter a side table, semi-join through the fact
    (reference: query.py:1811-1900)."""
    cust = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return semi_join(
        T(spark, sf, "orders").withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        "c_custkey",
    ).select("o_orderkey", "o_totalprice")


@register(
    "invert_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def invert_anti(spark, sf):
    """Inverted multi-row predicate = EXCEPT against the universe →
    left_anti join (reference: ~HasAgent, query.py:1752-1765)."""
    urgent = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(T(spark, sf, "customer"), urgent, "c_custkey").select(
        "c_custkey", "c_name"
    )


# ------------------------------------------------------------ §2.3 set ops

_POS1 = "SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_POS2 = "SELECT o_orderkey FROM orders WHERE o_totalprice > 300000"


def _pos_branches(spark, sf):
    o = T(spark, sf, "orders")
    return (
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey"),
        o.filter(F.col("o_totalprice") > 300000).select("o_orderkey"),
    )


@register("set_intersection", f"{_POS1} INTERSECT {_POS2}")
def set_intersection(spark, sf):
    """Intersection of hash sets (reference: query.py:2520-2734)."""
    a, b = _pos_branches(spark, sf)
    return keyed_intersect([a, b], "o_orderkey")


@register("set_union", f"{_POS1} UNION {_POS2}")
def set_union(spark, sf):
    """Union of hash sets (reference: query.py:2795-2976)."""
    a, b = _pos_branches(spark, sf)
    return keyed_union([a, b], "o_orderkey")


@register("set_except", f"{_POS1} EXCEPT {_POS2}")
def set_except(spark, sf):
    """Positive-EXCEPT-negative (reference: query.py:2663-2709)."""
    a, b = _pos_branches(spark, sf)
    return keyed_except(a, b, "o_orderkey")


@register(
    "conjunction_collapse",
    """
    SELECT count(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20 AND l_discount < 0.05
    """,
)
def conjunction_collapse(spark, sf):
    """SourceIntersection: same-table conjunctions collapse to ONE
    multi-predicate scan, not an N-way intersect (query.py:1232-1345)."""
    return (
        T(spark, sf, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10, 20)
            & (F.col("l_discount") < 0.05)
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_extendedprice", "sum_price"))
    )


# -------------------------------------------------------------- §2.4 joins


@register(
    "join3_topk",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey LIMIT 10
    """,
)
def join3_topk(spark, sf):
    """3-way join + agg + top-k — the fast_raw_pa_link build shape
    (readonly_schema.py:320-337) with TakeOrderedAndProject serving."""
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = T(spark, sf, "lineitem")
    # pre-aggregate the fact side to one row per order BEFORE joining —
    # the join then moves |orders| rows instead of |lineitem| rows, and the
    # partial sum happens map-side on the scan (Catalyst does not push
    # aggregates below joins itself)
    lrev = l.groupBy("l_orderkey").agg(
        F.sum(drevenue()).alias("_rev")
    )
    joined = c.join(o, c.c_custkey == o.o_custkey).join(
        lrev, lrev.l_orderkey == o.o_orderkey
    )
    agg = joined.select(
        "o_orderkey", "o_orderdate", F.col("_rev").cast("double").alias("revenue")
    )
    return global_topk(agg, [F.desc("revenue"), F.asc("o_orderkey")], 10)


@register(
    "broadcast_dim_join",
    """
    SELECT r.r_name, count(*) AS n_cust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c.c_acctbal) AS avg_bal
    FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name
    """,
)
def broadcast_dim_join(spark, sf):
    """Small-dim joins broadcast explicitly: the fact table never shuffles
    (reference joins dims via FK pathing, databases.py:539-565)."""
    r = F.broadcast(T(spark, sf, "region"))
    n = F.broadcast(T(spark, sf, "nation"))
    c = T(spark, sf, "customer")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_cust"), davg("c_acctbal", "avg_bal"))
    )


@register(
    "left_outer_agg",
    """
    SELECT o.o_orderkey, COALESCE(x.n, 0) AS n_items
    FROM orders o LEFT JOIN (
      SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY l_orderkey
    ) x ON x.l_orderkey = o.o_orderkey
    """,
)
def left_outer_agg(spark, sf):
    """Left outer join onto aggregated metadata (the reference's outer joins
    to SourceMeta/ReadingRefLink, query.py:493-517)."""
    counts = (
        T(spark, sf, "lineitem").groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    )
    o = T(spark, sf, "orders")
    return o.join(counts, o.o_orderkey == counts.l_orderkey, "left").select(
        "o_orderkey", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_items")
    )


# ----------------------------------------------------------- §2.5/§2.6 aggs


@register(
    "group_count",
    "SELECT l_orderkey, count(*) AS ev_count FROM lineitem GROUP BY l_orderkey",
)
def group_count(spark, sf):
    """evidence_counts: count per hash (readonly_schema.py:209-211)."""
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("ev_count"))
    )


@register(
    "count_distinct",
    """
    SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp
    FROM lineitem GROUP BY l_partkey
    """,
)
def count_distinct(spark, sf):
    """pa_agent_counts: count(distinct) per key (readonly_schema.py:374)."""
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
    )


@register(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-06-30'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_rollup(spark, sf):
    """Relations roll-up: multi-measure groupBy (query.py:130-163
    RelationSQL.agg: sum(ev_count), max(belief), ...).  TPC-H Q1 shape;
    exact-decimal sums so results are partition-order independent."""
    return (
        T(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(drevenue()).cast("double").alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "collect_sorted_agg",
    """
    SELECT l_orderkey,
           array_to_string(list_sort(list(DISTINCT l_suppkey)), ',') AS supps
    FROM lineitem GROUP BY l_orderkey
    """,
)
def collect_sorted_agg(spark, sf):
    """agent_interactions-style map/array aggregation
    (readonly_schema.py:1286-1336 jsonb_object(array_agg, array_agg)) —
    surfaced as a canonical sorted string for engine-portable hashing."""
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_set("l_suppkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("supps")
        )
    )


@register(
    "distinct_dedup",
    "SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem",
)
def distinct_dedup(spark, sf):
    """distinct/dropDuplicates (reference: query.py:462, export dedup)."""
    return T(spark, sf, "lineitem").select("l_orderkey", "l_suppkey").distinct()


@register(
    "global_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def global_topk_q(spark, sf):
    """Global ORDER BY + LIMIT (query.py:464-470 _apply_limits) —
    TakeOrderedAndProject, no full sort."""
    return global_topk(
        T(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        25,
    )


@register(
    "grouped_topn",
    """
    SELECT * FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice,
             CAST(row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_extendedprice DESC, l_linenumber) AS INTEGER) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def grouped_topn_q(spark, sf):
    """Per-group top-N — the evidence ev_limit LATERAL join rewritten as a
    row_number window (reference: query.py:489-506)."""
    return grouped_topn(
        T(spark, sf, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        ),
        "l_orderkey",
        [F.desc("l_extendedprice"), F.asc("l_linenumber")],
        3,
    )


@register(
    "argmax_distill",
    """
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def argmax_distill(spark, sf):
    """distill: best row per group by priority order (reference:
    export_assembly.py:174-233 reader_prioritize)."""
    return argmax_per_group(
        T(spark, sf, "events"),
        "user_id",
        [F.desc("ts"), F.desc("event_id")],
    ).select("user_id", "event_id", "event_type", "value")


@register(
    "first_per_key_dedup",
    """
    SELECT e.user_id, e.event_type, e.event_id, e.value
    FROM events e JOIN (
      SELECT user_id, event_type, min(event_id) AS event_id
      FROM events GROUP BY user_id, event_type
    ) m ON e.event_id = m.event_id
    """,
)
def first_per_key_dedup(spark, sf):
    """deduplicate: keep first row per key (export_assembly.py:576-601) —
    min-id then join back for the payload."""
    ev = T(spark, sf, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("event_id")
    )
    return semi_join(ev, firsts, "event_id").select(
        "user_id", "event_type", "event_id", "value"
    )


# ------------------------------------------------- §2.7 scalar functions


@register(
    "scalar_strings",
    """
    SELECT p_partkey, lower(p_type) AS type_lc,
           CAST(length(p_name) AS INTEGER) AS name_len,
           substring(p_name, 1, 4) AS name_prefix
    FROM part WHERE p_name LIKE '%wid%' OR p_brand LIKE 'Brand#1%'
    """,
)
def scalar_strings(spark, sf):
    """lower/LIKE/length/substring (reference: readonly_schema.py:401-407,
    query.py:1732-1737, readonly_schema.py:824)."""
    return (
        T(spark, sf, "part")
        .filter(F.col("p_name").like("%wid%") | F.col("p_brand").like("Brand#1%"))
        .select(
            "p_partkey",
            F.lower("p_type").alias("type_lc"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
        )
    )


@register(
    "nullsafe_compare",
    """
    SELECT event_id,
           CASE WHEN value > 100 THEN event_type END AS et,
           (CASE WHEN value > 100 THEN event_type END IS NOT DISTINCT FROM 'click') AS is_click
    FROM events
    """,
)
def nullsafe_compare(spark, sf):
    """IS [NOT] DISTINCT FROM — null-safe equality, the only_src inversion
    semantics (reference: query.py:1393-1395)."""
    et = F.when(F.col("value") > 100, F.col("event_type"))
    return T(spark, sf, "events").select(
        "event_id", et.alias("et"), et.eqNullSafe("click").alias("is_click")
    )


@register(
    "json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark, sf):
    """JSON field extraction + aggregation (the reference's src_json /
    json_build_object handling, readonly_schema.py:905-941)."""
    return (
        T(spark, sf, "events")
        .select(
            "event_type",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "time_window_agg",
    """
    SELECT date_trunc('hour', ts) AS win, event_type, count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def time_window_agg(spark, sf):
    """Tumbling event-time window aggregation (batch form; the streaming
    twin lives in indra_db_spark.streaming)."""
    return (
        T(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("win"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
    )


@register(
    "md5_surrogate",
    """
    SELECT o_orderkey, md5(o_orderstatus || '|' || o_orderpriority) AS surrogate
    FROM orders WHERE o_orderkey < 1000
    """,
)
def md5_surrogate(spark, sf):
    """Deterministic hash surrogates (reference: md5 curator anonymization
    api.py:636-639; crc32 synth_ag_id readonly_dumping.py:1192-1202)."""
    return (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.md5(
                F.concat_ws("|", F.col("o_orderstatus"), F.col("o_orderpriority"))
            ).alias("surrogate"),
        )
    )


@register(
    "sessionize",
    """
    WITH lagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sess
      FROM lagged
    )
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, count(*) AS n_events
    FROM numbered GROUP BY user_id, sess
    """,
)
def sessionize_catalog(spark, sf):
    """Gap-based session windows via built-in session_window (streaming twin
    in indra_db_spark.streaming.ingest.sessionize; the reference has no
    streaming operators, SURVEY.md §2.11 — this is the training-pipeline
    extension).  The oracle is the classic gaps-and-islands rewrite."""
    from indra_db_spark.streaming.ingest import sessionize

    return sessionize(T(spark, sf, "events"), watermark="0 seconds")


@register(
    "priority_argmin",
    """
    WITH m AS (
      SELECT l_partkey, min(l_extendedprice) AS best_price
      FROM lineitem GROUP BY l_partkey
    )
    SELECT m.l_partkey, min(l.l_suppkey) AS best_supp,
           CAST(m.best_price AS DOUBLE) AS best_price
    FROM lineitem l
    JOIN m ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.best_price
    GROUP BY m.l_partkey, m.best_price
    """,
)
def priority_argmin(spark, sf):
    """Priority argmin per group — the SIF export's grounding-namespace
    selection shape (util/dump_sif.py:363-403: per agent, keep the id from
    the best-ranked namespace).  A lexicographic struct-min gives the
    deterministic (best priority, smallest id) row in ONE map-side partial
    aggregation; the oracle spells it as min + self-join."""
    best = (
        T(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.min(F.struct("l_extendedprice", "l_suppkey")).alias("b"))
    )
    return best.select(
        "l_partkey",
        F.col("b.l_suppkey").alias("best_supp"),
        F.col("b.l_extendedprice").cast("double").alias("best_price"),
    )


@register(
    "ranked_page",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50 OFFSET 100
    """,
)
def ranked_page(spark, sf):
    """Global sort + LIMIT/OFFSET paging (the reference's _apply_limits,
    query.py:464-470) with a unique total order so pages are deterministic;
    compiles to TakeOrderedAndProject."""
    return (
        T(spark, sf, "orders")
        .select("o_orderkey", F.col("o_totalprice").cast("double"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(100)
        .limit(50)
    )


@register(
    "kb_union_merge",
    """
    WITH u AS (
      SELECT l_partkey AS key, 'kb_r' AS src
      FROM lineitem WHERE l_returnflag = 'R'
      UNION ALL
      SELECT l_partkey AS key, 'kb_f' AS src
      FROM lineitem WHERE l_linestatus = 'F'
    ),
    per AS (SELECT key, src, count(*) AS cnt FROM u GROUP BY key, src)
    SELECT key,
      string_agg(src || ':' || CAST(cnt AS VARCHAR), ','
                 ORDER BY src || ':' || CAST(cnt AS VARCHAR)) AS src_counts,
      CAST(SUM(cnt) AS BIGINT) AS ev_count,
      CAST(count(*) AS INTEGER) AS num_srcs
    FROM per GROUP BY key
    """,
)
def kb_union_merge(spark, sf):
    """The knowledge-base merge shape (sources/knowledgebase.py +
    assembly/pipeline.py counts): N per-source extracts unioned, then ONE
    shuffle merges per-key source-count maps — the reference's kb pipeline
    union + src_counts map-merge (export_assembly.py:309-347).  Map-side
    partial aggregation collapses each extract before the exchange; at
    100 TB the union is scan-parallel and nothing materializes per-source.
    """
    li = T(spark, sf, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("key"), F.lit("kb_r").alias("src")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_partkey").alias("key"), F.lit("kb_f").alias("src")
    )
    per = (
        a.unionByName(b)
        .groupBy("key", "src")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per.groupBy("key").agg(
        F.concat_ws(
            ",",
            F.sort_array(
                F.collect_list(
                    F.concat_ws(":", "src", F.col("cnt").cast("string"))
                )
            ),
        ).alias("src_counts"),
        F.sum("cnt").alias("ev_count"),
        F.count(F.lit(1)).cast("int").alias("num_srcs"),
    )


@register(
    "curation_anonymize",
    """
    WITH c AS (
      SELECT o_custkey AS pa_hash,
             substr(md5(o_orderpriority || 'pepper'), 1, 16) AS curator
      FROM orders WHERE o_orderkey < 5000
    )
    SELECT pa_hash, CAST(count(*) AS INTEGER) AS curation_count,
           min(curator) AS a_curator
    FROM c GROUP BY pa_hash
    """,
)
def curation_anonymize(spark, sf):
    """Curation read path: salted md5[:16] curator masking + per-statement
    counts (reference: api.py:631-639 anonymization, call_handlers.py:336-354
    counts) — the same plans/principal.py functions the service uses."""
    from indra_db_spark.plans.principal import (
        anonymize_curators,
        curation_counts,
    )

    cur = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey") < 5000)
        .select(
            F.col("o_custkey").alias("pa_hash"),
            F.col("o_orderpriority").alias("curator"),
        )
    )
    anon = anonymize_curators(cur, salt="pepper")
    return curation_counts(anon).join(
        anon.groupBy("pa_hash").agg(F.min("curator").alias("a_curator")),
        "pa_hash",
    )


# ------------------------------------------------------------ skew escapes

from indra_db_spark.operators import skew as K  # noqa: E402


@register(
    "skew_two_phase_agg",
    """
    SELECT l_suppkey, count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_suppkey
    """,
)
def skew_two_phase_agg(spark, sf):
    """Salted two-phase aggregation ≡ plain GROUP BY (the oracle IS the
    unsalted form): one hot reduce key becomes salt_factor partial groups
    (operators/skew.py) — the escape hatch when AQE can't split a single
    flooded group."""
    li = T(spark, sf, "lineitem").select(
        "l_suppkey", F.col("l_quantity").cast("decimal(18,2)").alias("qty")
    )
    out = K.two_phase_agg(li, "l_suppkey", "qty")
    return out.select(
        "l_suppkey", "n", F.col("sum_qty").cast("double").alias("sum_qty")
    )


@register(
    "skew_salted_join",
    """
    SELECT n_name, count(*) AS n_items
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n_name
    """,
)
def skew_salted_join(spark, sf):
    """Salted fact⋈dim join ≡ the plain join (oracle is unsalted): the
    small side replicates per salt bucket so a hot supplier key spreads
    over salt_factor partitions (operators/skew.py:salted_join)."""
    li = T(spark, sf, "lineitem").select("l_suppkey")
    sup = T(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = F.broadcast(T(spark, sf, "nation").select("n_nationkey", "n_name"))
    j = K.salted_join(
        li.withColumnRenamed("l_suppkey", "s_suppkey"), sup, on="s_suppkey"
    )
    return (
        j.join(nat, j.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "english_render",
    """
    SELECT o_orderkey,
      CASE
        WHEN o_orderstatus = 'P'
          THEN c_name || ' binds ' || o_orderpriority || ', and '
               || c_mktsegment || '.'
        WHEN o_orderkey % 7 = 0 AND o_orderstatus = 'O'
          THEN o_orderpriority || ' is activated.'
        WHEN o_orderkey % 7 = 0
          THEN o_orderpriority || ' is phosphorylated.'
        WHEN o_orderstatus = 'O'
          THEN c_name || ' activates ' || o_orderpriority || '.'
        ELSE c_name || ' phosphorylates ' || o_orderpriority || '.'
      END AS english
    FROM orders JOIN customer ON c_custkey = o_custkey
    WHERE o_orderkey < 2000
    """,
)
def english_render(spark, sf):
    """English rendering as a pure column expression (functions/english.py)
    — the Spark-native replacement for the reference's row-at-a-time
    indra-assembler calls (indra_db_service/util.py:144-165,
    call_handlers.py:234-272).  The oracle writes the same grammar by hand:
    typed 2-agent active voice, missing-subject passive voice, and the
    Complex Oxford-comma list."""
    from indra_db_spark.functions.english import english_expr

    o = T(spark, sf, "orders").filter(F.col("o_orderkey") < 2000)
    c = T(spark, sf, "customer").select("c_custkey", "c_name", "c_mktsegment")
    o = o.join(c, o.o_custkey == c.c_custkey)
    type_name = (
        F.when(F.col("o_orderstatus") == "P", F.lit("Complex"))
        .when(F.col("o_orderstatus") == "O", F.lit("Activation"))
        .otherwise(F.lit("Phosphorylation"))
    )
    agents = (
        F.when(
            F.col("o_orderstatus") == "P",
            F.create_map(
                F.lit("0"), F.col("c_name"),
                F.lit("1"), F.col("o_orderpriority"),
                F.lit("2"), F.col("c_mktsegment"),
            ),
        )
        .when(
            F.col("o_orderkey") % 7 == 0,
            F.create_map(F.lit("1"), F.col("o_orderpriority")),
        )
        .otherwise(
            F.create_map(
                F.lit("0"), F.col("c_name"),
                F.lit("1"), F.col("o_orderpriority"),
            )
        )
    )
    return o.select(
        "o_orderkey", english_expr(type_name, agents).alias("english")
    )


@register(
    "er_blocking_join",
    """
    WITH cand AS (
      SELECT s.s_suppkey, c.c_custkey,
             levenshtein(s.s_name, c.c_name) AS dist
      FROM supplier s JOIN customer c
        ON substr(s.s_name, length(s.s_name) - 1, 2) =
           substr(c.c_name, length(c.c_name) - 1, 2)
    ),
    ok AS (SELECT * FROM cand WHERE dist <= 6),
    best AS (
      SELECT s_suppkey, c_custkey, dist,
             row_number() OVER (
               PARTITION BY s_suppkey ORDER BY dist, c_custkey) AS rn
      FROM ok
    )
    SELECT s_suppkey, c_custkey, dist FROM best WHERE rn = 1
    """,
)
def er_blocking_join(spark, sf):
    """Entity-resolution blocking join (operators/linkage.py): suppliers
    fuzzy-linked to customers — block on the name's last-2-digit key,
    verify candidates with built-in levenshtein (codegen, no Python), keep
    each supplier's best match via a partial-aggregate min(struct) argmin.
    Candidates exist only inside blocking buckets (never |S| x |C|); the
    oracle spells the same block/verify/best chain with a row_number
    window, which is hash-identical to the argmin because the tie-break
    (dist, c_custkey) is total."""
    from indra_db_spark.operators.linkage import fuzzy_link

    return fuzzy_link(
        T(spark, sf, "supplier"),
        T(spark, sf, "customer"),
        left_id="s_suppkey",
        right_id="c_custkey",
        left_text="s_name",
        right_text="c_name",
        left_block=F.substring(F.col("s_name"), -2, 2),
        right_block=F.substring(F.col("c_name"), -2, 2),
        max_dist=6,
    )


@register(
    "lake_profile",
    """
    SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
)
def lake_profile(spark, sf):
    """One-pass per-column profile of the orders table
    (operators/profile.py:profile_table) — the lake-native form of the
    reference's schema-snapshot guard (readonly_dumping/util.py:175-271):
    ONE scan, every metric for every column in a single groupBy().agg()
    (multi-distinct via Expand), unpivoted with stack().  Profiled columns
    are integer/varchar only: float-to-string rendering differs across
    engines, and the documented at-width path swaps exact distincts for
    the mergeable KMV sketch (operators/topk.py)."""
    from indra_db_spark.operators.profile import profile_table

    return profile_table(
        T(spark, sf, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@register(
    "lake_expectations",
    """
    WITH checks AS (
      SELECT 'unique:o_orderkey' AS expectation,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
      FROM orders
      UNION ALL
      SELECT 'not_null:o_custkey',
             CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'in_set:o_orderstatus',
             CAST(sum(CASE WHEN o_orderstatus IS NULL
                            OR o_orderstatus NOT IN ('O', 'F', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'min:o_totalprice',
             CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'fk:orders.o_custkey->customer.c_custkey',
             CAST((SELECT count(*) FROM orders o
                   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                   WHERE c.c_custkey IS NULL) AS BIGINT)
    )
    SELECT expectation, violations, violations = 0 AS passed FROM checks
    """,
)
def lake_expectations(spark, sf):
    """Declarative data-contract validation (operators/profile.py): the
    reference's build-abort snapshot diff and inline consistency asserts
    (readonly_dumping.py:2295-2302, query.py:126) generalized to a
    gate-able report — uniqueness, null, enum-domain, range, and
    referential-integrity checks, each a scalar aggregate or broadcast
    anti-join, unioned to (expectation, violations, passed)."""
    from indra_db_spark.operators import profile as P

    o = T(spark, sf, "orders")
    c = T(spark, sf, "customer")
    return P.run_expectations(
        [
            P.expect_unique(o, "o_orderkey"),
            P.expect_not_null(o, "o_custkey"),
            P.expect_in_set(o, "o_orderstatus", ["O", "F", "P"]),
            P.expect_range(o, "o_totalprice", 0.0),
            P.expect_fk(
                o, "o_custkey", c, "c_custkey",
                "orders.o_custkey->customer.c_custkey",
            ),
        ]
    )
