"""Streaming ingestion operators.

Each transformation is written against the unified DataFrame API so the SAME
function serves batch backfill and continuous ingestion — batch parity is
the test oracle (run the transformation on a static read of the identical
files and compare).  Watermarks bound state for late data; dedup and
session windows are the two stateful shapes a statement-ingestion stream
needs (duplicate extraction drops = the streaming analog of the batch dedup
stage, export_assembly.py:576-601).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of immutable files (the streaming
    analog of the reference's daily dump drops)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def _with_event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Coerce the event-time column to TIMESTAMP (with local timezone).

    Parquet written with ``TIMESTAMP_NTZ`` cannot carry a watermark
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); the cast interprets the naive
    value in the session timezone, identically in batch and streaming, so
    batch-parity oracles are unaffected.
    """
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time tumbling-window aggregation with a late-data watermark.

    Works identically in batch mode (watermark is a no-op there), which is
    how the test compares stream output to a static run.
    """
    df = _with_event_time(events, ts_col).withWatermark(ts_col, watermark)
    agg = [F.count("*").alias("n")]
    if value_col is not None:
        agg.append(F.sum(value_col).alias("total"))
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(*agg)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            *[c for c in ("n", "total") if value_col is not None or c == "n"],
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: tuple[str, ...],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once rows per key within the watermark horizon —
    ``dropDuplicates`` keeps per-key state until the watermark passes, so
    state is bounded; the batch dedup stage with a memory ceiling."""
    return (
        _with_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicates([*key_cols, ts_col])
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Session windows (gap-based) per key — built-in ``session_window``
    handles the stateful merge; no applyInPandasWithState needed for this
    shape (custom state is reserved for non-mergeable aggregates)."""
    return (
        _with_event_time(events, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), *group_cols)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            *group_cols,
            "n_events",
        )
    )


def interval_attribution(
    touches: DataFrame,
    convs: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream watermarked interval join: every (touch, conversion)
    pair for the same key with ``conv_ts`` in ``[touch_ts, touch_ts +
    horizon]`` — the click→purchase attribution shape (and, in the
    reference's terms, correlating a reading event with the content
    update that preceded it).

    Unified batch/stream: in batch mode the watermark is a no-op and this
    is a plain interval join; on two streams the BOTH-sided watermark plus
    the two-sided time bound is exactly what lets Spark evict join state —
    a touch older than ``watermark + horizon`` can never match a future
    conversion, so per-key state is bounded by the horizon, not the stream
    length.  Inner join ⇒ append mode works and rows are emitted as soon
    as both sides arrive.

    At scale both sides shuffle once on the key (the join is an equi-join
    on ``key_col`` with the range as a post-condition); no window, no
    explode — skewed hot keys fall under the same segmented-escape
    analysis as the as-of join (operators/temporal.py).
    """
    t = (
        _with_event_time(touches, ts_col)
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("k"),
            F.col(id_col).alias("touch_id"),
            F.col(ts_col).alias("touch_ts"),
        )
    )
    c = (
        _with_event_time(convs, ts_col)
        .withWatermark(ts_col, watermark)
        .select(
            F.col(key_col).alias("_ck"),
            F.col(id_col).alias("conv_id"),
            F.col(ts_col).alias("conv_ts"),
            F.col(value_col).alias("conv_value"),
        )
    )
    return (
        t.join(
            c,
            (t["k"] == c["_ck"])
            & (c["conv_ts"] >= t["touch_ts"])
            & (
                c["conv_ts"]
                <= t["touch_ts"] + F.expr(f"INTERVAL {horizon}")
            ),
        )
        .select(
            F.col("k").alias(key_col),
            "touch_id",
            "touch_ts",
            "conv_id",
            "conv_ts",
            "conv_value",
            (F.unix_micros("conv_ts") - F.unix_micros("touch_ts")).alias(
                "lag_us"
            ),
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain a stream with the available-now trigger into an in-memory
    table; returns the static result (test/backfill harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def incremental_new_docs(
    docs: DataFrame,
    known_fingerprints: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    order_col: str | None = None,
) -> DataFrame:
    """Incremental corpus ingestion: keep only arriving documents that are
    (a) not already in the corpus — md5-fingerprint LEFT ANTI join against
    the static ``known_fingerprints`` frame (column ``fp``); stream-static
    anti joins are stateless on the stream side, the static side is the
    broadcast/lookup build — and (b) not duplicated *within* the stream,
    via watermarked ``dropDuplicates`` on the fingerprint (state evicted at
    the horizon).

    The daily-batch analog of the reference's supplement flow
    (preassemble_db.py:497-615: new statements dedup against themselves and
    against the existing corpus) as a continuous pipeline.  Works
    identically on a static ``docs`` frame (batch parity is the test
    oracle).
    """
    if docs.isStreaming and ts_col is None:
        raise ValueError(
            "streaming input requires ts_col: dropDuplicates without a "
            "watermark keeps one state entry per fingerprint forever"
        )
    out = docs.withColumn("fp", F.md5(F.col(text_col))).join(
        known_fingerprints.select("fp"), "fp", "left_anti"
    )
    if ts_col is not None:
        out = _with_event_time(out, ts_col).withWatermark(ts_col, watermark)
        return out.dropDuplicates(["fp"])
    # batch path: DETERMINISTIC in-batch dedup — dropDuplicates keeps an
    # arbitrary row per fingerprint (partitioning-dependent), so an
    # external oracle could never agree on which duplicate survived; keep
    # the row smallest under (order_col, *rest-of-columns).  order_col
    # defaults to the leading column (conventionally the id), but the
    # remaining columns are ALWAYS appended as tie-breakers: if the chosen
    # column is not unique per fingerprint, row_number over tied keys
    # would be partitioning-dependent again.
    # The streaming path above keeps arrival order, which is its own
    # well-defined contract.
    from pyspark.sql.window import Window

    lead = order_col if order_col is not None else docs.columns[0]
    ties = [c for c in docs.columns if c != lead]
    w = Window.partitionBy("fp").orderBy(F.col(lead), *[F.col(c) for c in ties])
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _maybe_maintain(
    tables,
    batch_id: int,
    committed: bool,
    maintain_every: int | None,
    maintain_kwargs: dict | None,
) -> None:
    """The streaming sinks' maintenance cadence (r11 verdict next-round
    #4): every ``maintain_every``-th COMMITTED batch, run
    :meth:`TxTable.maintain` on the sink's tables inside the foreachBatch
    boundary — per-trigger commits otherwise mint one tiny file + one
    tiny segment + DV churn forever, and nothing else owns the table.

    Exactly-once interplay, by construction:

    - maintenance commits are LAYOUT-only (compact_small /
      materialize_dv change no live rows and stay silent in the change
      feed), so they can never duplicate or drop a batch;
    - the cadence is gated on ``committed`` — a batch the per-writer
      watermark SKIPPED (a crash replay) triggers no maintenance, so a
      full replay still commits nothing at all;
    - maintenance failures NEVER fail the micro-batch: the batch's data
      already committed, so a CommitConflict (a co-running maintainer or
      racing delete won the claim) or any transient FS/IO error is
      logged and retried at the next cadence point — best-effort
      housekeeping must not take down the load-bearing stream.

    Cost stays O(churn since the last pass), never O(table) — the
    maintain() contract the SCALE_PROBE churn rows pin."""
    if not maintain_every or not committed:
        return
    if batch_id % maintain_every != maintain_every - 1:
        return
    import sys

    for tx in tables:
        try:
            tx.maintain(**(maintain_kwargs or {}))
        except Exception as e:  # noqa: BLE001 — housekeeping only
            print(
                f"stream maintenance skipped on {tx.root} at batch "
                f"{batch_id}: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:200] if str(e) else ''}",
                file=sys.stderr,
            )


def write_stream_txlog(
    stream_df: DataFrame,
    table_root: str,
    checkpoint_dir: str,
    app_id: str | None = None,
    available_now: bool = True,
    maintain_every: int | None = None,
    maintain_kwargs: dict | None = None,
):
    """Exactly-once streaming sink into a :class:`plans.txlog.TxTable`.

    Structured Streaming's ``foreachBatch`` gives AT-LEAST-ONCE batch
    delivery (a crash between the sink write and the checkpoint commit
    replays the batch); :meth:`TxTable.append_batch` makes the write
    IDEMPOTENT by recording the highest committed batch id per writer in
    the version manifest, so the replayed batch is recognized and
    skipped — the composition is exactly-once table contents, readable
    with snapshot isolation while the stream keeps committing.  This is
    the missing half of the lake's ingestion story: `incremental_new_docs`
    decides WHAT enters the corpus, this sink makes the landing itself
    transactional (concurrent compaction/vacuum of the same table rebase
    around the appends via the txlog's optimistic protocol).

    ``app_id`` defaults to the checkpoint dir, which already names the
    logical writer across restarts.  Returns the finished (available-now)
    or running StreamingQuery.

    ``maintain_every=N`` runs :meth:`TxTable.maintain` after every Nth
    committed batch (see :func:`_maybe_maintain` for why this preserves
    exactly-once), so live file and segment counts stay bounded while
    the stream runs for weeks; ``maintain_kwargs`` tunes the thresholds.
    """
    from indra_db_spark.plans.txlog import TxTable

    writer_id = app_id or checkpoint_dir

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        tx = TxTable(batch_df.sparkSession, table_root)
        v = tx.append_batch(batch_df, writer_id, batch_id)
        _maybe_maintain(
            [tx], batch_id, v is not None, maintain_every, maintain_kwargs
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def upsert_stream_txlog(
    stream_df: DataFrame,
    table_root: str,
    key_cols: list[str],
    checkpoint_dir: str,
    app_id: str | None = None,
    order_col: str | None = None,
    available_now: bool = True,
    maintain_every: int | None = None,
    maintain_kwargs: dict | None = None,
):
    """Exactly-once streaming UPSERT into a :class:`plans.txlog.TxTable`
    — the mutable-table twin of :func:`write_stream_txlog` (Delta's
    ``foreachBatch`` + ``MERGE INTO`` streaming-upsert pattern): each
    micro-batch is key-reduced, then :meth:`TxTable.merge_batch` replaces
    matched rows and inserts the rest, with the per-writer batch-id
    watermark making crash replays no-ops.  This is what turns an
    at-least-once CDC/event stream into a continuously-maintained
    dimension table readable with snapshot isolation.

    A micro-batch may carry several rows per key (two updates to the
    same entity in one trigger); :meth:`TxTable.merge` requires
    key-unique updates, so the sink first reduces each key to its LAST
    row — ordered by ``order_col`` (an event-time/sequence column) with
    every remaining column as a deterministic tie-breaker; with no
    ``order_col`` the ordering is all non-key columns, which is still
    deterministic but arbitrary, so pass one whenever a real sequence
    exists.  At 100 TB the reduction is one window shuffle of the BATCH
    (not the table) and the merge rewrites only key-matched files.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from indra_db_spark.plans.txlog import TxTable

    writer_id = app_id or checkpoint_dir

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        rest = [c for c in batch_df.columns if c not in key_cols]
        lead = [order_col] if order_col else []
        ordering = lead + [c for c in rest if c not in lead]
        reduced = (
            batch_df.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(*key_cols).orderBy(
                        *[F.col(c).desc_nulls_last() for c in ordering]
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        tx = TxTable(batch_df.sparkSession, table_root)
        v = tx.merge_batch(reduced, key_cols, writer_id, batch_id)
        # merge churn is heavier than append churn (copy-on-write file
        # rewrites + DV sidecars per batch) — same cadence policy
        _maybe_maintain(
            [tx], batch_id, v is not None, maintain_every, maintain_kwargs
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def maintain_rollup_stream(
    stream_df: DataFrame,
    fact_root: str,
    view_root: str,
    group_cols: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    app_id: str | None = None,
    available_now: bool = True,
    maintain_every: int | None = None,
    maintain_kwargs: dict | None = None,
):
    """Streaming materialized view: each micro-batch lands EXACTLY-ONCE
    in the fact table AND folds into a keyed count/sum rollup with
    O(batch) work — the silver→gold pattern that keeps a 100-TB fact
    log's aggregate continuously queryable without ever rescanning it.

    Per batch, in crash-safe order:

    1. ``append_batch`` the rows into the fact TxTable (idempotent via
       the per-writer watermark);
    2. recompute the rollup rows for exactly the TOUCHED groups —
       :func:`plans.ivm.incremental_agg` over the view slice semi-joined
       to the batch's group keys (the batch is append-only, so deltas
       are implicit +1s and groups never empty out);
    3. ``merge_batch`` the recomputed rows into the view TxTable by the
       group key (idempotent again).

    Crash anywhere between the two commits replays the batch: the side
    already committed skips on its watermark, the other recomputes from
    unchanged state — both tables converge to exactly-once contents.
    The view table's merge rewrites only the files holding touched
    groups (copy-on-write), so maintenance cost is O(batch + touched
    groups), never O(view).
    """
    from pyspark.sql import functions as F

    from indra_db_spark.plans.ivm import delta_agg, incremental_agg
    from indra_db_spark.plans.txlog import TxTable

    writer_id = app_id or checkpoint_dir

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        facts = TxTable(spark, fact_root)
        view = TxTable(spark, view_root)
        v_fact = facts.append_batch(batch_df, writer_id, batch_id)
        keys = batch_df.select(*group_cols).distinct()
        try:
            base = view.read().join(F.broadcast(keys), group_cols, "semi")
        except ValueError:  # view not bootstrapped yet
            base = delta_agg(
                batch_df.limit(0), group_cols, sum_cols, None
            ).select(
                *group_cols,
                F.col("d_n").alias("n"),
                *[
                    F.col(f"d_sum_{c}").alias(f"sum_{c}")
                    for c in sum_cols
                ],
            )
        updated = incremental_agg(
            base, batch_df, group_cols, sum_cols, change_type_col=None
        )
        view.merge_batch(updated, group_cols, writer_id, batch_id)
        # BOTH tables churn per trigger (fact: one small segment per
        # append; view: copy-on-write rewrites of touched-group files) —
        # gate on the FACT commit: the two tables share one watermark,
        # so a replayed batch skips both and triggers no maintenance
        _maybe_maintain(
            [facts, view],
            batch_id,
            v_fact is not None,
            maintain_every,
            maintain_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def scd2_stream_txlog(
    stream_df: DataFrame,
    view_root: str,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    checkpoint_dir: str,
    tiebreak_col: str | None = None,
    app_id: str | None = None,
    available_now: bool = True,
    maintain_every: int | None = None,
    maintain_kwargs: dict | None = None,
):
    """Streaming type-2 dimension maintenance: each micro-batch of change
    events extends the SCD2 history table exactly-once — the Delta
    "SCD2 MERGE" recipe, built from this repo's own pieces
    (operators/temporal.py:scd2_build for intra-batch versioning,
    TxTable.merge_batch for the idempotent copy-on-write commit).

    Per batch:

    1. version the batch itself (same-instant collapse, no-op
       suppression, intra-batch intervals) with ``scd2_build``;
    2. fetch the CURRENT row of every touched key from the view
       (semi-join — cost O(touched), never O(dimension));
    3. stitch across the boundary: a batch whose FIRST version carries
       the same attrs as the key's current row opens no new version
       (cross-batch heartbeat suppression — without it every batch
       fragments history); otherwise the current row CLOSES at the first
       new version's valid_from;
    4. ``merge_batch`` the changed/new interval rows by
       (key, valid_from) — replays are no-ops via the writer watermark.

    Contract: batches must arrive in event-time order per key (the
    standard streaming-SCD2 limitation — a late change older than the
    current row would need history rewriting; route such data through a
    batch rebuild).  Under that contract the maintained table is pinned
    EQUAL to ``scd2_build`` over the full static history in tests.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from indra_db_spark.operators.temporal import scd2_build
    from indra_db_spark.plans.txlog import TxTable

    if len(key_cols) != 1:
        # scd2_build keys on one column; composite keys pre-concat
        raise ValueError("scd2_stream_txlog takes a single key column")
    writer_id = app_id or checkpoint_dir
    merge_keys = [*key_cols, "valid_from"]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        view = TxTable(spark, view_root)
        # maintenance gating: unlike the other sinks, an SCD2 batch whose
        # computed updates are EMPTY is common (cross-batch heartbeat
        # suppression) and commits nothing — gating the cadence on this
        # batch's own commit would let a sparse stream defer compaction
        # forever.  Gate on "not a KNOWN replay" via the manifest's
        # writer watermark instead: replays of update-carrying batches
        # are recorded there and skip; an empty-update batch never
        # advances the watermark, so its (equally empty) replay may run
        # one redundant maintenance pass — layout-only and harmless.
        # Only probed when a cadence is configured at all (r12 ADVICE:
        # the extra manifest read has no business on the hot path of a
        # stream that never maintains).
        known_replay = bool(maintain_every) and (
            view._snapshot_full()[2].get(writer_id, -1) >= batch_id
        )
        b = scd2_build(
            batch_df, key_cols[0], ts_col, attr_cols, tiebreak_col
        )
        keys = b.select(*key_cols).distinct()
        try:
            cur = (
                view.read()
                .filter(F.col("is_current"))
                .join(F.broadcast(keys), key_cols, "semi")
            )
        except ValueError:  # empty view: everything is new history
            view.merge_batch(b, merge_keys, writer_id, batch_id)
            _maybe_maintain(
                [view], batch_id, not known_replay,
                maintain_every, maintain_kwargs,
            )
            return
        k = key_cols[0]
        first = (
            b.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(k).orderBy("valid_from")
                ),
            )
        )
        f1 = first.filter(F.col("_rn") == 1).select(
            k,
            F.col("valid_from").alias("_b_from"),
            *[F.col(c).alias(f"_b_{c}") for c in attr_cols],
        )
        joined = cur.join(f1, k, "inner")
        same = F.lit(True)
        for c in attr_cols:
            same = same & F.col(c).eqNullSafe(F.col(f"_b_{c}"))
        # keys whose first batch version is a cross-boundary heartbeat:
        # that version row is dropped from the batch history
        noop_keys = joined.filter(same).select(k, F.col("_b_from"))
        b_kept = b.join(
            noop_keys.withColumnRenamed("_b_from", "valid_from"),
            [k, "valid_from"],
            "left_anti",
        )
        # the dropped heartbeat's SUCCESSOR (if any) now closes the
        # current row; recompute each key's first KEPT version
        fk = (
            b_kept.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(k).orderBy("valid_from")
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(k, F.col("valid_from").alias("_close_at"))
        )
        closed = (
            cur.join(fk, k, "inner")
            .select(
                k,
                *attr_cols,
                "valid_from",
                F.col("_close_at").alias("valid_to"),
                F.lit(False).alias("is_current"),
            )
        )
        # a kept heartbeat-dropped key with NO successor leaves its
        # current row untouched (no row in fk → no close)
        updates = closed.unionByName(b_kept)
        if updates.limit(1).count():
            view.merge_batch(updates, merge_keys, writer_id, batch_id)
        # cadence runs even when this batch's updates were all suppressed
        # (see known_replay above) — earlier batches' churn still ages
        _maybe_maintain(
            [view], batch_id, not known_replay,
            maintain_every, maintain_kwargs,
        )

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
