"""Temporal join operators Spark lacks as built-ins: as-of join and
banded range join.

The reference has no time-series joins (its only temporal logic is dated
batch update filtering, e.g. indra_db/cli/knowledgebase.py update runs and
xdd day ledgers); these are beyond-reference operators for the 100-TB
event-log side of a data platform, expressed with one shuffle each —
no per-row loops, no UDFs, no driver state.

Scale design:

- ``asof_join`` is ONE shuffle on the join key + one ordered window per
  key partition.  This is the classic union-merge formulation: tag both
  sides, sort by (time, side-tag), and carry the last right row forward
  with ``last(ignorenulls=True)``.  Compare pandas ``merge_asof`` (single
  node) — here partitions are per-key, so a 100-TB event log distributes
  evenly as long as no single key dominates (salt the hot key and keep
  per-salt results if one does).
- ``band_join`` buckets time into ``band``-wide cells: each left row
  explodes into its cell and the two adjacent cells, the right side keeps
  its own cell, and the equi-join on (key, cell) + exact predicate does
  the rest.  Pair volume is O(matches), never O(left × right); the
  explode factor is a constant 3.  This is the standard range-join
  optimization (Databricks' range-join hint and DuckDB's IEJoin solve the
  same problem engine-side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch_us(c: Column) -> Column:
    """Epoch microseconds as a LONG — integer-exact time arithmetic that
    works for TIMESTAMP and TIMESTAMP_NTZ alike (the lake session runs
    UTC, so the ltz cast is deterministic)."""
    return F.unix_micros(c.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "r_",
    tolerance_seconds: float | None = None,
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row picks the LATEST right row with
    the same key and ``right_ts <= left_ts`` (inclusive) — left outer, so
    unmatched left rows keep nulls.  Right columns come back prefixed.

    Determinism: equal-timestamp right rows within a key would make "the
    latest" ambiguous, so callers should dedup the right side to one row
    per (key, ts) first (see ``latest_per_key_ts``); equal left/right
    timestamps match (right sorts before left at the same instant).

    ``tolerance_seconds`` turns matches older than the window into nulls
    (pandas merge_asof semantics) — applied AFTER the match, so it does
    not change which row would have matched.

    ``chunk_seconds`` is the HOT-KEY escape: the default per-key window
    puts every row of a key into ONE ordered task, so a bot user owning
    10% of the log serializes 10% of the corpus on one core (AQE cannot
    split a window partition the way it splits skewed joins).  With
    ``chunk_seconds`` set, the carry-forward runs as a segmented scan:
    rows window within (key, time-chunk) — the hot key now spreads over
    time-range/chunk tasks — a per-(key, chunk) aggregate takes each
    chunk's latest right row, a per-key window over the CHUNK LIST (rows
    = #chunks, not #events) computes each chunk's carry-in, and a
    coalesce stitches them.  Results are bit-identical to the plain
    window (pinned in tests).  MEASURED crossover (scale probe, 10M
    events on local[32]): at a 10% hot key the two extra shuffles still
    dominate and the plain window wins; at a 90% hot key chunking is
    already 1.2× faster — and the plain window's hot task is
    O(hot_rows · log) on ONE core, so its cost grows without bound in
    the hot key's volume while the chunked plan stays flat.  Opt in when
    one key's row count approaches what a single core sorts in your
    latency budget (~10⁷ rows).
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    # null keys/timestamps cannot participate in an ordered merge — drop
    # them explicitly (pandas merge_asof rejects NaN keys for the same
    # reason) instead of letting NULLS FIRST place them nondeterministically
    left = left.filter(F.col(on).isNotNull() & F.col(left_ts).isNotNull())
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_ts).alias(f"{right_prefix}{right_ts}"),
            *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
        ).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None)
        .cast(
            r.schema["_r"].dataType
        )
        .alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    u = r.unionByName(l)
    if chunk_seconds is None:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.asc("_t"), F.asc("_tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = u.withColumn(
            "_m", F.last("_r", ignorenulls=True).over(w)
        ).filter(F.col("_tag") == 1)
    else:
        u = u.withColumn(
            "_ck", F.floor(_epoch_us(F.col("_t")) / (chunk_seconds * 1_000_000))
        )
        win_in = (
            Window.partitionBy("_k", "_ck")
            .orderBy(F.asc("_t"), F.asc("_tag"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        in_chunk = u.withColumn("_in", F.last("_r", ignorenulls=True).over(win_in))
        # each chunk's LATEST right row: struct max orders by _t first —
        # the right side is deduped per (key, ts), so the max is unique
        chunk_last = (
            u.filter(F.col("_tag") == 0)
            .groupBy("_k", "_ck")
            .agg(F.max(F.struct(F.col("_t"), F.col("_r"))).alias("_last"))
        )
        # carry-in per (key, chunk): latest right row of any STRICTLY
        # earlier chunk.  The window input is the chunk list (#chunks rows
        # per key, time-range/chunk — thousands, not the event volume), so
        # this per-key window cannot be the skew cliff the chunking removes.
        chunks = u.select("_k", "_ck").distinct()
        wc = (
            Window.partitionBy("_k")
            .orderBy(F.asc("_ck"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            chunks.join(chunk_last, ["_k", "_ck"], "left")
            .withColumn("_carry", F.max("_last").over(wc))
            .select("_k", "_ck", F.col("_carry._r").alias("_cin"))
        )
        matched = (
            in_chunk.filter(F.col("_tag") == 1)
            .join(carry, ["_k", "_ck"], "left")
            .withColumn("_m", F.coalesce(F.col("_in"), F.col("_cin")))
        )
    if tolerance_seconds is not None:
        too_old = (
            _epoch_us(F.col("_t"))
            - _epoch_us(F.col(f"_m.{right_prefix}{right_ts}"))
        ) > int(tolerance_seconds * 1_000_000)
        matched = matched.withColumn(
            "_m", F.when(too_old, F.lit(None)).otherwise(F.col("_m"))
        )
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_m.{right_prefix}{right_ts}").alias(f"{right_prefix}{right_ts}")
    ]
    out_cols += [
        F.col(f"_m.{right_prefix}{c}").alias(f"{right_prefix}{c}") for c in rcols
    ]
    return matched.select(*out_cols)


def latest_per_key_ts(
    df: DataFrame, on: str, ts: str = "ts", order_col: str | None = None
) -> DataFrame:
    """One row per (key, ts): the row with the greatest ``order_col``
    (default: the first column) — the deterministic right-side dedup an
    as-of join wants."""
    oc = order_col or df.columns[0]
    w = Window.partitionBy(on, ts).orderBy(F.desc(oc))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    band_seconds: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_prefix: str = "a_",
    right_prefix: str = "b_",
) -> DataFrame:
    """Banded range join: all (left, right) pairs with the same key and
    ``|left_ts - right_ts| <= band_seconds`` — via time-cell bucketing, so
    the cross product never materializes.

    Each left row lands in its cell plus both neighbors (explode factor
    3); the right side keeps one cell; the (key, cell) equi-join plus the
    exact band predicate yields each qualifying pair exactly once (the
    right row's single cell is covered by exactly one of the left row's
    three).  The 3× explode is the whole overhead — pair volume is
    output-bound, the classic bucketed range-join shape.
    """
    left = left.filter(F.col(on).isNotNull() & F.col(left_ts).isNotNull())
    right = right.filter(
        F.col(on).isNotNull() & F.col(right_ts).isNotNull()
    )
    band_us = band_seconds * 1_000_000
    cell = lambda c: F.expr(  # noqa: E731
        f"unix_micros(cast({c} as timestamp_ltz)) div {band_us}"
    )
    lv = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_lt"),
        F.struct(*[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns]).alias(
            "_l"
        ),
        F.explode(
            F.array(
                cell(left_ts) - 1, cell(left_ts), cell(left_ts) + 1
            )
        ).alias("_cell"),
    )
    rv = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_rt"),
        F.struct(
            *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns]
        ).alias("_r"),
        cell(right_ts).alias("_cell"),
    )
    pairs = lv.join(rv, ["_k", "_cell"]).filter(
        F.abs(_epoch_us(F.col("_lt")) - _epoch_us(F.col("_rt"))) <= band_us
    )
    lcols = [F.col(f"_l.{left_prefix}{c}").alias(f"{left_prefix}{c}")
             for c in left.columns]
    rcols = [F.col(f"_r.{right_prefix}{c}").alias(f"{right_prefix}{c}")
             for c in right.columns]
    return pairs.select(*lcols, *rcols)


def gapfill_locf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str | None = None,
    unit: str = "hour",
) -> DataFrame:
    """Densify a per-key time series to a regular ``unit`` grid and carry
    the last observation forward (LOCF) — the gap-fill step before any
    per-period metric (rates, retention denominators, training-mix drift
    curves) that must not silently skip empty periods.

    Three declarative steps, all keyed on ``key_col`` so they share ONE
    hash partitioning (the bucket agg's shuffle is reused by the window —
    no second exchange):

    1. bucket survivors: rows truncated to the unit; the in-bucket winner
       is the latest (ts, tiebreak) — a partial-aggregate ``max(struct)``
       argmax, not a window, so a hot key combines map-side;
    2. grid: per-key [min_bucket, max_bucket] exploded via ``sequence()``
       with a 1-``unit`` step — rows are generated executor-side from two
       aggregates, never driver-side;
    3. fill: left-join grid to survivors and run
       ``last(value, ignorenulls=True)`` over (key ORDER BY bucket).

    The window's full-history frame is bounded by the per-key grid length
    (span / unit), not corpus size; keys are independent so 100 TB of keys
    parallelize flat.  Returns (key, bucket, value) with value NULL only
    before a key's first observation (never — grids start at the first
    observation's bucket).
    """
    tb = tiebreak_col or ts_col
    b = df.select(
        F.col(key_col),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        F.col(ts_col),
        F.col(tb).alias("_tb"),
        F.col(value_col),
    )
    surv = (
        b.groupBy(key_col, "bucket")
        .agg(F.max(F.struct(ts_col, "_tb", value_col)).alias("_w"))
        .select(key_col, "bucket", F.col(f"_w.{value_col}").alias("_v"))
    )
    span = surv.groupBy(key_col).agg(
        F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.expr(f"sequence(_b0, _b1, interval 1 {unit})")
        ).alias("bucket"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(surv, [key_col, "bucket"], "left")
        .withColumn(value_col, F.last("_v", ignorenulls=True).over(w))
        .select(key_col, "bucket", value_col)
    )


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change stream:
    (key, ts, attrs) events become validity intervals (key, attrs,
    valid_from, valid_to, is_current) — the standard warehouse shape for
    "what did this entity look like at time T" questions, which the
    reference answers only by rebuilding its readonly store wholesale
    per release (readonly_dumping/; this keeps history instead).

    Three steps sharing ONE hash partitioning on the key:

    1. collapse same-instant updates: the (key, ts) winner is the
       greatest (tiebreak, attrs) — partial-agg ``max(struct)`` argmax,
       map-side combinable, no window;
    2. suppress no-op changes: a row whose attrs null-safely equal the
       previous row's (lag over key ORDER BY ts) opens no new version —
       real change streams are dominated by heartbeats that must not
       fragment history;
    3. intervals: valid_from = ts, valid_to = lead(ts) over the
       SURVIVORS (half-open [from, to)), is_current = no successor.

    The two windows and the aggregate all key on ``key_col``: one
    exchange total, keys independent, so 100 TB of entities parallelize
    flat; per-key work is bounded by that key's change count.
    """
    tb = tiebreak_col or ts_col
    one = (
        changes.groupBy(key_col, ts_col)
        .agg(F.max(F.struct(F.col(tb).alias("_tb"), *attr_cols)).alias("_w"))
        .select(
            key_col, ts_col, *[F.col(f"_w.{c}").alias(c) for c in attr_cols]
        )
    )
    wk = Window.partitionBy(key_col).orderBy(ts_col)
    same_as_prev = F.lit(True)
    for c in attr_cols:
        same_as_prev = same_as_prev & F.col(c).eqNullSafe(
            F.lag(F.col(c)).over(wk)
        )
    surv = (
        one.withColumn("_first", F.row_number().over(wk) == 1)
        .withColumn("_noop", ~F.col("_first") & same_as_prev)
        .filter(~F.col("_noop"))
        .drop("_first", "_noop")
    )
    return surv.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wk).alias("valid_to"),
        F.lead(ts_col).over(wk).isNull().alias("is_current"),
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    dim_prefix: str = "d_",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension version
    whose half-open validity interval [valid_from, valid_to) contains
    the fact timestamp — the lookup that makes an SCD2 dimension usable
    (enriching a 100-TB fact log with the attributes AS OF each event,
    the leakage-free feature join of an ML training pipeline).

    Not a range join: SCD2 intervals are non-overlapping per key, so the
    containing version is exactly the LATEST valid_from ≤ fact_ts — a
    backward as-of join (one union-merge shuffle, O(N log N) per key,
    never O(facts × versions)).  A post-filter nulls out matches whose
    interval CLOSED before the fact (fact_ts ≥ valid_to happens when
    history has holes, e.g. a deleted entity), keeping left-outer
    semantics: every fact survives, unmatched ones carry nulls.
    """
    matched = asof_join(
        facts, dim, on=on,
        left_ts=fact_ts, right_ts=valid_from, right_prefix=dim_prefix,
    )
    vt = F.col(f"{dim_prefix}{valid_to}")
    stale = vt.isNotNull() & (F.col(fact_ts) >= vt)
    dcols = [c for c in matched.columns if c.startswith(dim_prefix)]
    out = matched
    for c in dcols:
        out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out


def rolling_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_micro: Column,
    window_seconds: int,
    out_sum: str = "roll_sum_micro",
    out_n: str = "roll_n",
) -> DataFrame:
    """Trailing time-window aggregate per key: for every row, the sum and
    count of ``value_micro`` over [ts - window, ts] of the SAME key —
    the per-event rolling metric (spend velocity, rate limiting, feature
    windows) that tumbling buckets can't express because every event
    needs its OWN trailing window.

    One shuffle: a RANGE window over integer epoch-microseconds.  The
    range frame includes ALL rows tied on ts, so the result is a pure
    function of the data (no partition-order dependence), and
    ``value_micro`` must be integer (exact addition — float sums would
    hash-differ across engines by association order; callers convert
    with a fixed micro scale).  Frame cost is O(window density) per row;
    a hot key serializes its rows into one task — the asof_join
    chunk-escape analysis applies unchanged if one key dominates.
    """
    base = df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy(_epoch_us(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    return base.withColumn("_vm", value_micro.cast("long")).withColumn(
        out_sum, F.sum("_vm").over(w)
    ).withColumn(out_n, F.count(F.lit(1)).over(w)).drop("_vm")


def ohlc_bars(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_micro_col: str,
    tiebreak_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Downsample a tick stream to OHLC bars per (key, unit bucket) —
    the hypertable/candlestick rollup: open/close are the first/last
    values IN TIME (same-instant ties broken by ``tiebreak_col`` so the
    bar is a pure function of the data), high/low are extremes.

    ONE partial-aggregate shuffle: open/close are ``min(struct(ts, tb,
    v))``/``max(struct(ts, tb, v))`` argmins — no window, no per-key
    sort, so a hot instrument combines map-side like any other
    aggregate.  Values must already be integer micros (exact across
    engines).  Returns (key, bucket, open/high/low/close_micro, n).
    """
    b = df.select(
        F.col(key_col),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        F.col(ts_col).alias("_t"),
        F.col(tiebreak_col).alias("_tb"),
        F.col(value_micro_col).cast("bigint").alias("_v"),
    ).filter(F.col(key_col).isNotNull() & F.col("_t").isNotNull())
    return (
        b.groupBy(key_col, "bucket")
        .agg(
            F.min(F.struct("_t", "_tb", "_v")).alias("_o"),
            F.max(F.struct("_t", "_tb", "_v")).alias("_c"),
            F.max("_v").alias("high_micro"),
            F.min("_v").alias("low_micro"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            key_col,
            "bucket",
            F.col("_o._v").alias("open_micro"),
            "high_micro",
            "low_micro",
            F.col("_c._v").alias("close_micro"),
            "n",
        )
    )


def twap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_micro_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Time-weighted average per key over the key's own observation span
    — each value holds (LOCF) until the NEXT observation, so the
    statistic is Σ(value·duration) / Σ(duration), immune to burst
    sampling (an arithmetic mean over ticks overweights busy periods —
    the classic bar-vs-tick bias).

    One key partitioning: same-instant collapse by argmax(tiebreak),
    then a lead() window for each observation's holding duration, then
    the partial-agg ratio — numerator and denominator are exact int64
    sums.  Durations are WHOLE SECONDS (micros × microseconds overflows
    int64: a 10⁹-micro value held a year is ~3·10²²; in seconds the same
    product is 3·10¹⁶, leaving room for 10⁹-micro values held ~290
    years per observation), which bounds granularity error at one
    second per holding interval — negligible for event-time data and
    identical across engines.  The final division floors a double over
    the int64 sums (exact below 2^53).  Rows: (key, twap_micro,
    span_s, n_obs); keys with a single observation (zero span) carry
    that value.
    """
    one = (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col), F.col(ts_col).alias("_t"))
        .agg(
            F.max(
                F.struct(
                    F.col(tiebreak_col).alias("_tb"),
                    F.col(value_micro_col).cast("bigint").alias("_v"),
                )
            ).alias("_w")
        )
        .select(key_col, "_t", F.col("_w._v").alias("_v"))
    )
    w = Window.partitionBy(key_col).orderBy("_t")
    timed = one.withColumn(
        "_dur",
        (
            F.unix_micros(F.lead("_t").over(w).cast("timestamp_ltz"))
            - F.unix_micros(F.col("_t").cast("timestamp_ltz"))
        )
        / F.lit(1_000_000),
    ).withColumn("_dur", F.floor("_dur").cast("bigint"))
    return (
        timed.groupBy(key_col)
        .agg(
            F.sum(F.col("_v") * F.col("_dur")).alias("_num"),
            F.sum("_dur").alias("span_s"),
            F.count(F.lit(1)).alias("n_obs"),
            F.max(F.struct("_t", "_v")).alias("_last"),
        )
        .select(
            key_col,
            F.when(
                F.col("span_s") > 0,
                F.floor(
                    F.col("_num").cast("double") / F.col("span_s")
                ).cast("bigint"),
            )
            .otherwise(F.col("_last._v"))
            .alias("twap_micro"),
            F.coalesce("span_s", F.lit(0)).alias("span_s"),
            "n_obs",
        )
    )
