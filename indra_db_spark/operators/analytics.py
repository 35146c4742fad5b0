"""Event-analytics operators: ordered funnels and cohort retention.

Beyond-reference (the reference has no event analytics); these are the
standard product-analytics queries a 100-TB event log serves, expressed as
plain joins/aggregations so Catalyst handles them like any other relational
plan.

Scale notes: every stage shuffles on ``user_id`` (or the cohort key) with
map-side partial aggregation; funnel steps chain per-step aggregates so the
peak state per user is one timestamp per step, never the event list.  A
single hot user (bot) concentrates one partition — the standard salting
escape (operators/skew.py) applies if profiling shows it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered conversion funnel: for each user, the earliest time each
    step in ``steps`` was completed STRICTLY AFTER the previous step →
    (user, s1_ts, s2_ts, ..., n_steps).

    Earliest-completion semantics (the standard greedy funnel): step k's
    timestamp is the minimum event time of type ``steps[k]`` after step
    k-1's timestamp.  Greedy is optimal here — taking the earliest
    possible completion of each step never forecloses a later step.

    ``within_seconds`` adds the standard conversion-window constraint:
    every step must complete within that horizon of step 1 (candidates
    beyond the window don't count, so a user can stall at step k even
    with later qualifying events).

    One aggregate + one join per step, all keyed on the user: per-step
    state is a single timestamp per user, so memory is O(users × steps)
    regardless of event volume.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("et"),
    ).filter(F.col("t").isNotNull() & F.col("u").isNotNull())

    cur = (
        base.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("s1_ts"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = base.filter(F.col("et") == step).select(
            "u", F.col("t").alias("_cand")
        )
        # conditional min INSIDE the aggregate (not a pre-filter): a user
        # whose candidate events all precede the previous step must keep
        # their row with a NULL step time, not silently drop out
        cur = (
            cur.join(nxt, "u", "left")
            .groupBy("u", *[f"s{j}_ts" for j in range(1, k)])
            .agg(
                F.min(
                    F.when(
                        (F.col("_cand") > F.col(f"s{k - 1}_ts"))
                        & (
                            F.lit(within_seconds is None)
                            | (
                                F.unix_micros(
                                    F.col("_cand").cast("timestamp_ltz")
                                )
                                - F.unix_micros(
                                    F.col("s1_ts").cast("timestamp_ltz")
                                )
                                <= F.lit(
                                    (within_seconds or 0) * 1_000_000
                                )
                            )
                        ),
                        F.col("_cand"),
                    )
                ).alias(f"s{k}_ts")
            )
        )
    n_steps = sum(
        F.when(F.col(f"s{k}_ts").isNotNull(), 1).otherwise(0)
        for k in range(1, len(steps) + 1)
    )
    return cur.select(
        F.col("u").alias(user_col),
        *[f"s{k}_ts" for k in range(1, len(steps) + 1)],
        n_steps.cast("int").alias("n_steps"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel summary: users reaching at least step k, per k →
    (step, step_name, n_users) — the conversion-rate table."""
    f = funnel(events, steps, user_col, ts_col, type_col)
    # ONE pass over the funnel frame (k conditional sums), reshaped to
    # rows with stack() — k separate filter+agg branches would re-execute
    # the whole per-step join lineage k times
    wide = f.agg(
        *[
            F.sum(
                F.when(F.col(f"s{k}_ts").isNotNull(), 1).otherwise(0)
            ).cast("long").alias(f"n{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    stack_args = ", ".join(
        f"{k}, '{steps[k - 1]}', n{k}" for k in range(1, len(steps) + 1)
    )
    return wide.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, step_name, n_users)"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity period,
    counted per offset from their cohort →
    (cohort, period_offset, n_users).

    Two shuffles: first-seen per user (partial-agg min), then a distinct
    count per (cohort, offset).  ``period`` ∈ {day, week, month} — the
    units whose offset arithmetic is implemented exactly; anything else
    raises rather than silently returning day-based offsets.
    """
    if period not in ("day", "week", "month"):
        raise ValueError(
            f"cohort_retention supports day/week/month, got {period!r}"
        )
    base = events.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).alias("p"),
    ).filter(F.col("p").isNotNull() & F.col("u").isNotNull())
    first = base.groupBy("u").agg(F.min("p").alias("cohort"))
    joined = base.join(first, "u")
    offset = F.datediff(F.col("p"), F.col("cohort"))
    if period == "week":
        offset = (offset / 7).cast("int")
    elif period == "month":
        offset = (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        ).cast("int")
    return (
        joined.withColumn("period_offset", offset.cast("int"))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct("u").cast("long").alias("n_users"))
    )


def event_paths(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Top-``k`` most common ``n``-step event-type sequences across users
    → (e1 … eN, n_paths, rank) — the path-analysis view of an event log
    (what flows actually happen, vs the flows a funnel presupposes).

    Sequences are consecutive events per user in (ts, event_id) order —
    the id breaks timestamp ties so the result is a total-order pure
    function of the log.  One shuffle partitions each user's history for
    the ``lead`` window, then the sequence counts partial-aggregate
    (Zipfian — the hot path arrives at the reducer as one partial count
    per task) and the global top-k is TakeOrderedAndProject.

    The per-user window has the same bot-user skew surface as any per-key
    window (SCALING.md §6d): a bot owning 10% of the log serializes 10%
    of all rows through one window task.  ``chunk_seconds`` enables the
    segmented escape — sequence formation only needs ``n-1`` lookahead,
    so the history splits into time chunks processed in parallel
    ((user, chunk) windows), and only the chunk-boundary n-grams are
    recovered on a second, MUCH smaller frame:

    - pass 1 counts sequences fully inside a chunk;
    - pass 2 re-derives sequences that cross a boundary from just the
      first/last ``n-1`` rows of every (user, chunk) — O(chunks·n) rows
      per user regardless of event volume.  Any boundary-crossing n-gram
      lives entirely in that frame (its members are a suffix of one
      chunk followed by prefixes of following chunks, short chunks being
      contained whole), and pass 2 keeps exactly the sequences whose
      members span ≥ 2 chunks, so no n-gram is counted twice.

    Exactness is pinned by a parity test against the plain single-window
    path; the crossover economics mirror the as-of escape (SCALING.md
    §6d): pay ~2 extra small shuffles to break the hot key's serial sort.
    """
    if n < 2:
        raise ValueError("event_paths needs n >= 2")
    from pyspark.sql.window import Window

    base = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
        F.col(type_col).alias("e1"),
    ).filter(F.col("u").isNotNull() & F.col("t").isNotNull())
    cols = ["e1"] + [f"e{j}" for j in range(2, n + 1)]

    if chunk_seconds is None:
        w = Window.partitionBy("u").orderBy("t", "i")
        for j in range(2, n + 1):
            base = base.withColumn(f"e{j}", F.lead("e1", j - 1).over(w))
        counted = (
            base.filter(F.col(f"e{n}").isNotNull())
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("n_paths"))
        )
    else:
        counted = _chunked_path_counts(base, n, cols, chunk_seconds)

    rank_w = Window.orderBy(F.desc("n_paths"), *[F.asc(c) for c in cols])
    return (
        counted.orderBy(F.desc("n_paths"), *cols)
        .limit(k)
        .withColumn("rank", F.row_number().over(rank_w).cast("int"))
    )


def _chunked_path_counts(base, n: int, cols: list[str], chunk_seconds: int):
    """Segmented (hot-key-immune) n-gram counting over (u, t, i, e1):
    per-(user, chunk) windows + a boundary pass over first/last n-1 rows
    of each chunk.  See :func:`event_paths`."""
    from pyspark.sql.window import Window

    from indra_db_spark.operators.dedup import _materialize

    ck = F.floor(F.unix_timestamp("t") / chunk_seconds).cast("long")
    wc = Window.partitionBy("u", "c").orderBy("t", "i")
    tagged = base.withColumn("c", ck)
    # forward/backward ranks inside the chunk, each a parallel window
    tagged = _materialize(
        tagged.withColumn("_fwd", F.row_number().over(wc)).withColumn(
            "_rev",
            F.row_number().over(
                Window.partitionBy("u", "c").orderBy(F.desc("t"), F.desc("i"))
            ),
        )
    )
    inner = tagged
    for j in range(2, n + 1):
        inner = inner.withColumn(f"e{j}", F.lead("e1", j - 1).over(wc))
    pass1 = (
        inner.filter(F.col(f"e{n}").isNotNull())
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    # boundary frame: first/last n-1 rows of every (u, chunk) — bounded by
    # chunk COUNT, not event volume, so the hot user's window here is tiny
    edge = tagged.filter((F.col("_fwd") <= n - 1) | (F.col("_rev") <= n - 1))
    we = Window.partitionBy("u").orderBy("t", "i")
    crossing = edge
    for j in range(2, n + 1):
        crossing = crossing.withColumn(f"e{j}", F.lead("e1", j - 1).over(we))
    crossing = crossing.withColumn(f"c{n}", F.lead("c", n - 1).over(we))
    # keep exactly the n-grams pass 1 could not see: start in a chunk tail
    # (within n-1 of the end) and end in a LATER chunk
    pass2 = (
        crossing.filter(
            F.col(f"e{n}").isNotNull()
            & (F.col("_rev") <= n - 1)
            & (F.col(f"c{n}") > F.col("c"))
        )
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    return (
        pass1.unionByName(pass2)
        .groupBy(*cols)
        .agg(F.sum("n_paths").alias("n_paths"))
    )


def rate_anomalies(
    events: DataFrame,
    period: str = "hour",
    k_milli: int = 3000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Robust event-rate anomaly detection → the (event_type, period)
    buckets whose event count deviates from that type's median by more
    than ``k_milli``/1000 × MAD — the monitoring query a live event
    pipeline alarms on.

    Median/MAD instead of mean/σ for two reasons: robustness (one huge
    outlier hour inflates σ and hides itself — the classic failure of
    z-scores on rates) and DETERMINISM — the discrete rank-selected
    median (:func:`operators.topk.discrete_quantiles`) is a pure element
    of the data, while σ needs a sqrt no two engines round identically,
    so this stays inside the exact oracle gate.  The test is the integer
    cross-multiply ``dev · 1000 > k_milli · max(MAD, 1)`` (no division;
    the max(·,1) keeps a degenerate all-equal-counts type from flagging
    every bucket).

    Shape: one partial-agg shuffle to the (type, period) counts — a frame
    of O(types × periods) rows, tiny relative to the log — then two
    rank-selection windows per type over that SMALL frame.  The raw event
    volume is touched exactly once.
    """
    from indra_db_spark.operators.topk import discrete_quantiles

    hourly = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc(period, F.col(ts_col)).alias("period"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    med = discrete_quantiles(
        hourly, ["event_type"], "n", {"med": 0.5}
    ).select("event_type", "med")
    d = hourly.join(med, "event_type").withColumn(
        "deviation", F.abs(F.col("n") - F.col("med"))
    )
    mad = discrete_quantiles(
        d, ["event_type"], "deviation", {"mad": 0.5}
    ).select("event_type", "mad")
    return (
        d.join(mad, "event_type")
        .filter(
            F.col("deviation") * 1000
            > F.lit(k_milli) * F.greatest(F.col("mad"), F.lit(1))
        )
        .select("event_type", "period", "n", "med", "mad", "deviation")
    )


def cooccurrence_pairs(
    df: DataFrame,
    key_col: str,
    item_col: str,
    max_items_per_key: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Item co-occurrence ("users who did X also did Y"): for every
    unordered item pair, how many keys exhibit BOTH — the association
    mining / co-visitation primitive behind related-items, query
    expansion, and co-grounding (which agents appear in statements
    together), plus an exact integer Jaccard for strength.

    Shape: distinct (key, item) → self-join on the key with ``item_a <
    item_b`` → partial-agg count.  Pair volume is Σ_key C(items_k, 2) —
    quadratic in PER-KEY basket size, never in corpus size.  The cliff
    is a hot basket (a bot key touching 10⁵ items mints 5·10⁹ pairs), so
    ``max_items_per_key`` drops over-wide keys BEFORE the join — the
    standard cap (a key exhibiting everything correlates nothing; same
    economics as the LSH band cap in dedup.py).  Jaccard is exact
    integer micros: ``n_both·10⁶ div (n_a + n_b − n_both)`` — key counts
    per item come from the same distinct frame, one extra partial agg.

    Returns (item_a, item_b, n_both, n_a, n_b, jaccard_micro) for pairs
    with ``n_both ≥ min_count``.
    """
    ki = df.select(
        F.col(key_col).alias("_k"), F.col(item_col).alias("_i")
    ).filter(F.col("_k").isNotNull() & F.col("_i").isNotNull()).distinct()
    if max_items_per_key is not None:
        width = ki.groupBy("_k").agg(F.count(F.lit(1)).alias("_w"))
        ki = (
            ki.join(
                width.filter(F.col("_w") <= max_items_per_key), "_k", "semi"
            )
        )
    ki = ki.localCheckpoint(eager=False)  # shared by 3 consumers below
    per_item = ki.groupBy("_i").agg(F.count(F.lit(1)).alias("_n"))
    a = ki.select(F.col("_k"), F.col("_i").alias("item_a"))
    b = ki.select(F.col("_k"), F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_k")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_count)
    )
    return (
        pairs.join(
            per_item.select(
                F.col("_i").alias("item_a"), F.col("_n").alias("n_a")
            ),
            "item_a",
        )
        .join(
            per_item.select(
                F.col("_i").alias("item_b"), F.col("_n").alias("n_b")
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "CAST(n_both * 1000000 div (n_a + n_b - n_both) AS BIGINT)"
            ).alias("jaccard_micro"),
        )
    )


def ab_daily_uplift(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    n_variants: int = 2,
) -> DataFrame:
    """Cumulative A/B conversion tracking: assign each user a variant by
    a deterministic hash of the id, then for every day of the experiment
    emit each variant's cumulative exposed-user and converted-user
    counts and the exact integer conversion rate — the daily read-out an
    experimentation platform plots, with day-over-day monotone
    guarantees by construction (cumulative window, not per-day joins).

    Exposure = the user's first event of any kind; conversion = first
    ``convert_type`` event.  Both reduce per user with ONE partial agg
    over the raw log (min(day), conditional min) — the 100-TB input is
    touched exactly once, and everything after runs on frames bounded by
    users then by days × variants.  The day grid is the distinct set of
    first-exposure/first-conversion days CROSSED with the variants, so a
    variant with a quiet day still carries its cumulative values forward
    (no missing-row holes); rates are ``conv·10⁶ div exp`` — exact
    integers, null until the variant's first exposure.

    Returns (day, variant, cum_exposed, cum_converted, rate_micro).
    """
    per_user = (
        events.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("u"))
        .agg(
            F.min(F.date_trunc("day", F.col(ts_col))).alias("exp_day"),
            F.min(
                F.when(
                    F.col(type_col) == convert_type,
                    F.date_trunc("day", F.col(ts_col)),
                )
            ).alias("conv_day"),
        )
        .withColumn("variant", F.pmod(F.col("u"), F.lit(n_variants)))
        # four downstream consumers (exposures, conversions, day grid,
        # variant list): compute the per-user reduction of the raw log
        # ONCE — without the barrier every consumer re-scans the corpus
        # (the triangle-count lesson, measured 3.4× there)
        .localCheckpoint(eager=False)
    )
    exp_daily = per_user.groupBy(
        "variant", F.col("exp_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_exp"))
    conv_daily = (
        per_user.filter(F.col("conv_day").isNotNull())
        .groupBy("variant", F.col("conv_day").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_conv"))
    )
    days = (
        exp_daily.select("day")
        .union(conv_daily.select("day"))
        .distinct()
        .crossJoin(
            per_user.select("variant").distinct()
        )
    )
    daily = (
        days.join(exp_daily, ["variant", "day"], "left")
        .join(conv_daily, ["variant", "day"], "left")
        .select(
            "day",
            "variant",
            F.coalesce("n_exp", F.lit(0)).alias("n_exp"),
            F.coalesce("n_conv", F.lit(0)).alias("n_conv"),
        )
    )
    w = (
        Window.partitionBy("variant")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.withColumn("cum_exposed", F.sum("n_exp").over(w))
        .withColumn("cum_converted", F.sum("n_conv").over(w))
        .select(
            "day",
            "variant",
            "cum_exposed",
            "cum_converted",
            F.when(
                F.col("cum_exposed") > 0,
                F.expr(
                    "CAST(cum_converted * 1000000 div cum_exposed AS BIGINT)"
                ),
            ).alias("rate_micro"),
        )
    )


def attribution_credits(
    pairs: DataFrame,
    conv_col: str = "conv_id",
    touch_col: str = "touch_id",
    touch_ts_col: str = "touch_ts",
) -> DataFrame:
    """Credit assignment over (touch, conversion) pairs — the layer that
    turns an interval-attribution join into revenue numbers.  Emits one
    row per pair with BOTH standard models as exact integers:

    - ``is_last``: the last-touch flag (latest touch before conversion,
      touch id as the deterministic tie-break) — last-touch credit is
      10⁶ micro on that row, 0 elsewhere;
    - ``linear_credit_micro``: 10⁶ div n_touches, with the integer
      remainder assigned to the LAST touch so every conversion's credits
      sum to exactly 10⁶ (floor-division alone would leak
      10⁶ mod n micros per conversion — at 10⁹ conversions/day that's a
      silently vanishing revenue stream).

    One window partitioning on the conversion id covers both models
    (count + last-flag share the exchange); conversions are independent
    so 100 TB of them parallelize flat.
    """
    w = Window.partitionBy(conv_col)
    wo = w.orderBy(
        F.desc(touch_ts_col), F.desc(touch_col)
    )
    ranked = (
        pairs.withColumn("_rn", F.row_number().over(wo))
        .withColumn("n_touches", F.count(F.lit(1)).over(w))
        .withColumn("is_last", F.col("_rn") == 1)
    )
    base = F.expr("CAST(1000000 div n_touches AS BIGINT)")
    rem = F.expr("CAST(1000000 % n_touches AS BIGINT)")
    return ranked.select(
        conv_col,
        touch_col,
        touch_ts_col,
        "n_touches",
        "is_last",
        F.when(F.col("is_last"), base + rem)
        .otherwise(base)
        .alias("linear_credit_micro"),
    )
