"""Int64-overflow hardening at production magnitudes.

The class of bug these tests exist for: a fixed-point formula that is
exact at sf0.1 but overflows int64 at 1e13-token / 1e10-document scale —
and then DIVERGES across engines instead of failing loudly (DuckDB
silently widens BIGINT arithmetic to HUGEINT; Spark wraps, or raises
under ANSI).  Each test drives the SINGLE shared formula builder with
extreme synthetic counts in BOTH engines and asserts bit-equality, so a
reintroduced int64 product fails here rather than in production.

Documented bounds (see the builder docstrings):

- BM25 (`operators/text.py:_bm25_sql`): idf·tfsat is a per-row double —
  valid to ~6e12 docs; pure-int operands bound tf/dl < 4.1e9,
  N < 4.6e15, corpus < 9.2e15 words.
- bigram LM (`operators/text.py:_p_micro_sql`): per-row double — valid
  past 9.2e12-count bigrams (int64 product died there).
- PageRank (`operators/graph.py:pagerank`): max intermediate is
  damping·total ≤ 8.5e14 at defaults, graph-size-independent; guarded.
- KMV (`operators/topk.py:kmv_distinct`): (k-1)·2^bits < 2^63; guarded.
- MMR (`operators/similarity.py:mmr_rerank`): |score| ≤ 1000·1e6 = 1e9,
  corpus-size-independent (cosines are bounded).
"""

import duckdb
import pytest

INT64_MAX = 2**63 - 1


def _duck_rows(sql):
    con = duckdb.connect()
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


# --------------------------------------------------------------- BM25


#: (tf, dl) cases: a normal doc, a 1e5-word doc saturated by one term,
#: and the documented 4.1e9 operand bound (a single 16 GB document)
_BM25_DOCS = [(3, 120), (100_000, 100_000), (4_000_000_000, 4_100_000_000)]
#: (n_docs, df): 1e9 and 1e10 docs — the latter overflowed the int64
#: idf·tfsat product before the per-row-double migration — and a rare
#: term (df=1, the idf maximum)
_BM25_STATS = [(10**9, 1), (10**10, 1), (10**10, 10**7)]


@pytest.mark.parametrize("n_docs,df0", _BM25_STATS)
def test_bm25_extreme_magnitudes_match_duckdb(spark, n_docs, df0):
    from indra_db_spark.operators.text import _bm25_sql

    avgdl_milli = 180_000  # 180-word average in thousandths
    expr = _bm25_sql(1, str(n_docs), str(avgdl_milli), [str(df0)], 1200, 750)
    sdf = spark.createDataFrame(_BM25_DOCS, "_tf0 long, dl long")
    got = sorted(
        r[0]
        for r in sdf.selectExpr(f"({expr}) AS s").collect()
    )
    vals = ", ".join(f"({tf}::BIGINT, {dl}::BIGINT)" for tf, dl in _BM25_DOCS)
    want = sorted(
        r[0]
        for r in _duck_rows(
            f"SELECT ({expr.replace(' div ', ' // ')}) AS s "
            f"FROM (VALUES {vals}) t(_tf0, dl)"
        )
    )
    assert got == want
    assert all(0 < s <= INT64_MAX for s in got)


# ---------------------------------------------------------- bigram LM


#: (c_ab, c_a, v): a normal bigram, the pre-fix int64 death point
#: (c_ab·1e6 > 2^63 at c_ab ≈ 9.2e12), and a 1e13-token corpus top
#: bigram against a 1e9-word vocabulary
_LM_CASES = [
    (7, 1_000, 50_000),
    (9_300_000_000_000, 9_400_000_000_000, 10**9),
    (10**13, 10**13, 10**9),
]


def test_lm_p_micro_extreme_magnitudes_match_duckdb(spark):
    from indra_db_spark.operators.text import _p_micro_sql

    expr = _p_micro_sql("c_ab", "c_a", "v")
    sdf = spark.createDataFrame(_LM_CASES, "c_ab long, c_a long, v long")
    got = sorted(r[0] for r in sdf.selectExpr(f"({expr}) AS p").collect())
    vals = ", ".join(
        f"({a}::BIGINT, {b}::BIGINT, {v}::BIGINT)" for a, b, v in _LM_CASES
    )
    want = sorted(
        r[0]
        for r in _duck_rows(
            f"SELECT ({expr}) AS p FROM (VALUES {vals}) t(c_ab, c_a, v)"
        )
    )
    assert got == want
    assert all(0 <= p <= 1_000_000 for p in got)  # it is a probability


# ------------------------------------------------------------ PageRank


def test_pagerank_bound_is_graph_size_independent():
    from indra_db_spark.operators.graph import pagerank  # noqa: F401

    # the invariant the guard encodes: mass is only split and damped, so
    # the largest intermediate is damping·total regardless of graph size
    assert 850 * 1_000_000_000_000 < 2**63


def test_pagerank_rejects_overflowing_total(spark):
    from indra_db_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="overflows int64"):
        pagerank(e, total=2**63)


def test_pagerank_default_total_runs(spark):
    from indra_db_spark.operators.graph import pagerank

    e = spark.createDataFrame([(1, 2), (2, 1), (1, 3)], "src long, dst long")
    rows = pagerank(e, iterations=3).collect()
    assert all(0 < r.pr <= 10**12 for r in rows)


# ----------------------------------------------------------------- KMV


def test_kmv_rejects_overflowing_k(spark):
    from indra_db_spark.operators.topk import kmv_distinct

    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError, match="overflows int64"):
        kmv_distinct(df, ["g"], "v", k=2049, bits=52)


def test_kmv_max_estimator_numerator_fits():
    # worst case the guard admits: k=2048, kth_min=1 → (k-1)·2^52
    assert 2047 * 2**52 < 2**63


# ----------------------------------------------------------------- MMR


def test_mmr_score_bound_corpus_independent():
    # score = λ·rel_micro − (1000−λ)·div_micro with cosines in [−1e6, 1e6]:
    # |score| ≤ 1000·1e6 = 1e9 for ANY corpus size — no magnitude test
    # can break it, which is itself the property worth pinning
    lam = 700
    worst = max(
        abs(lam * rel - (1000 - lam) * div)
        for rel in (-1_000_000, 1_000_000)
        for div in (-1_000_000, 1_000_000)
    )
    assert worst == 1_000 * 1_000_000
    assert worst < 2**63


def test_temperature_weights_bound_documented():
    """smooth = floor(sqrt(total)*1e3); the final numerator smooth*1e6
    must stay in int64 for totals up to the documented ~8.5e25 bound."""
    import math

    total = int(8.5e19)
    smooth = math.floor(math.sqrt(total) * 1000)
    assert smooth * 1_000_000 < 2**63
    # and one order further overflows (the bound is tight, not slack)
    assert math.floor(math.sqrt(total * 100) * 1000) * 1_000_000 >= 2**63
    # a 1e13-token corpus is six orders inside the bound
    assert int(1e13) < total // 10**6


def test_feature_scale_bounds_documented():
    """events_feature_scale (catalog/temporal.py): the rank product is
    computed as BIGINT — CAST(rk-1 AS BIGINT)·10⁶ — after the int32 form
    overflowed at sf0.1 (rank 20k · 10⁶ > 2³¹, caught by the oracle gate
    under ANSI).  The widened form bounds the per-GROUP row count at
    (2⁶³−1)/10⁶ ≈ 9.2e12 rows; min-max's (vm−lo)·10⁶ bounds the value
    RANGE at 9.2e12 micros (≈ 9.2e6 units).  Both are group-local, so
    corpus size doesn't tighten them."""
    INT64 = 2**63 - 1
    assert (10**13 - 1) * 1_000_000 > INT64  # 1e13-row group WOULD overflow
    assert (9 * 10**12) * 1_000_000 < INT64  # documented bound holds


def test_twap_duration_unit_bound_documented():
    """twap (operators/temporal.py): value_micro × duration must fit
    int64.  In MICROSECOND durations a 10⁹-micro value (a $1000 price)
    held one year is ~3.2e22 — overflow (caught by the ANSI oracle gate
    on first run).  The shipped SECOND-granularity form bounds the
    product at value_micro × 3.15e7 per year held: 10⁹-micro values fit
    for ~290 years per observation."""
    INT64 = 2**63 - 1
    YEAR_US, YEAR_S = 31_536_000 * 10**6, 31_536_000
    assert 10**9 * YEAR_US > INT64          # the µs form overflows
    assert 10**9 * YEAR_S * 290 < INT64     # the s form's headroom
