"""Bucketed-table storage for shuffle-free co-located joins.

The readonly lake's hottest join key is ``mk_hash`` (every meta table,
every semi/anti join in the algebra).  Persisting both sides bucketed by
the same key into the session catalog lets Spark plan those joins with NO
exchange on either side — the 100 TB answer to "this join shuffles 90 GB
every query".  Plain parquet directories can't carry bucket metadata, so
this path goes through ``saveAsTable`` (the metastore records bucket spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "mk_hash",
    buckets: int = 64,
    sort_col: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """``sort_col`` may be a list — e.g. ``["user_id", "ts"]`` for event
    tables, so windows partitioned by user and ordered by time elide the
    Sort as well as the Exchange."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, bucket_col)
    )
    if sort_col is not None:
        cols = [sort_col] if isinstance(sort_col, str) else list(sort_col)
        writer = writer.sortBy(*cols)
    try:
        writer.saveAsTable(table)
    except Exception as e:  # noqa: BLE001
        if mode != "overwrite" or "LOCATION_ALREADY_EXISTS" not in str(e):
            raise
        # an interrupted earlier writer left the managed location on disk
        # while the metastore lost the table entry (crash residue of
        # managed tables — the metastore write and the directory create
        # are not atomic).  Overwrite semantics already promise the old
        # data is gone, so clear the orphan and retry once.  The location
        # is taken from the ERROR ITSELF — reconstructing it from
        # warehouse-dir + table name would ignore the session's current
        # database and custom LOCATIONs and could delete an unrelated
        # table's data.  Local-FS remove: managed warehouses here are
        # file: (an HDFS warehouse would route this through
        # FileSystem.delete).
        import re
        import shutil
        from urllib.parse import urlparse

        m = re.search(r"location '([^']+)' already exists", str(e))
        if m is None:
            raise
        loc = urlparse(m.group(1)).path or m.group(1)
        shutil.rmtree(loc, ignore_errors=True)
        writer.saveAsTable(table)


def write_events_bucketed(
    events: DataFrame,
    table: str = "indra_lake.events",
    buckets: int = 32,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> None:
    """Analytics-optimized event layout: bucketed by user, sorted by
    (user, ts) within buckets.  Every per-user window in the analytics
    family (funnel, paths, sessionize, as-of's per-key ordering) requires
    exactly hash-distribution on ``user_col`` + ordering by
    ``(user_col, ts_col)`` — this layout satisfies both from the catalog
    metadata, so those operators plan with neither an Exchange nor a
    Sort on the events side (asserted in tests/test_lake_storage.py).
    The single-shot sort at write time is paid once per ingest/compaction
    instead of once per query — the same trade the readonly lake makes
    for mk_hash joins.

    The Exchange elision is unconditional.  The SORT elision additionally
    needs ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``
    (Spark ≥3.0 stopped propagating bucket sort order by default because
    multi-file buckets would need sorted-merge reads; this writer
    produces exactly ONE file per bucket — the repartition below — so
    the propagation is safe and measured: paths/funnel plan 0 sorts on
    the events side with the flag, and an already-sorted linear-run
    TimSort without it)."""
    spark = events.sparkSession
    db = table.split(".")[0] if "." in table else None
    if db:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    # ONE file per bucket: Spark only propagates the sortBy ordering into
    # the scan's outputOrdering when each bucket holds a single file, and
    # that ordering is what lets the per-user windows skip their Sort —
    # the repartition is the write-time cost of the read-time elision
    write_bucketed(
        events.repartition(buckets, user_col), table,
        bucket_col=user_col, buckets=buckets,
        sort_col=[user_col, ts_col, id_col],
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
