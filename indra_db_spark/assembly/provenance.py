"""Update-provenance ledger: the bookkeeping tables the reference keeps in
the principal schema to drive incremental runs (reference:
schemas/principal_schema.py:1008-1104 — ``source_file``, ``updates``,
``reading_updates``, ``xdd_updates``, ``preassembly_updates``,
``discarded_statements``) and the query helpers layered on them
(cli/content.py:548-557 get_latest_update, cli/reading.py:89-92
latest reading datetimes, cli/preassembly.py:13-21 list_last_updates).

Spark-first shape: each table is an append-only parquet directory under
``<root>/provenance/<table>`` written through the normal DataFrame writer,
so the ledger works on any Hadoop filesystem scheme (local, HDFS, object
store) and appends are atomic per-write at 100 TB exactly as at test
scale.  Reads return an empty, correctly-typed DataFrame when a table has
never been written — the "database has not had an initial upload" case
(cli/content.py:553-556).

Timestamps are always passed in by the caller (the reference lets
Postgres ``func.now()`` default them); an explicit ``now`` keeps every
run replayable and the tests deterministic.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: principal_schema.py:1008-1104, one entry per bookkeeping table.  Column
#: names follow the reference; serial ``id`` columns are dropped — parquet
#: appends have no serial sequence and nothing in the reference queries
#: them.
PROVENANCE_SCHEMAS: dict[str, StructType] = {
    # principal_schema.py:1007-1018 — pubmed source files already processed
    "source_file": StructType(
        [
            StructField("source", StringType(), False),
            StructField("name", StringType(), False),
            StructField("load_date", TimestampType()),
        ]
    ),
    # principal_schema.py:1021-1032 — text_ref/content update runs
    "updates": StructType(
        [
            StructField("init_upload", BooleanType(), False),
            StructField("source", StringType(), False),
            StructField("datetime", TimestampType()),
        ]
    ),
    # principal_schema.py:1034-1047 — reader runs over the content
    "reading_updates": StructType(
        [
            StructField("complete_read", BooleanType(), False),
            StructField("reader", StringType(), False),
            StructField("reader_version", StringType(), False),
            StructField("run_datetime", TimestampType()),
            StructField("earliest_datetime", TimestampType()),
            StructField("latest_datetime", TimestampType()),
        ]
    ),
    # principal_schema.py:1049-1059 — xDD daily dumps processed
    "xdd_updates": StructType(
        [
            StructField("reader_versions", StringType()),  # JSON string
            StructField("indra_version", StringType()),
            StructField("day_str", StringType(), False),
            StructField("processed_date", TimestampType()),
        ]
    ),
    # principal_schema.py:1085-1095 — statements dropped with a reason
    "discarded_statements": StructType(
        [
            StructField("stmt_id", LongType(), False),
            StructField("reason", StringType(), False),
            StructField("insert_date", TimestampType()),
        ]
    ),
    # principal_schema.py:1097-1104 — preassembly corpus update runs;
    # stmt_type NULL means a whole-corpus run
    "preassembly_updates": StructType(
        [
            StructField("corpus_init", BooleanType(), False),
            StructField("run_datetime", TimestampType()),
            StructField("stmt_type", StringType()),
        ]
    ),
}


def _fs_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


class ProvenanceLedger:
    """Append/read access to the provenance tables under one root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")

    def _path(self, table: str) -> str:
        if table not in PROVENANCE_SCHEMAS:
            raise KeyError(f"unknown provenance table: {table}")
        return f"{self.root}/provenance/{table}"

    def record(self, table: str, rows: list[dict]) -> None:
        """Append rows (plain dicts matching the table schema)."""
        if not rows:
            return
        from indra_db_spark.session import local_artifact_df

        df = local_artifact_df(self.spark, rows, PROVENANCE_SCHEMAS[table])
        df.coalesce(1).write.mode("append").parquet(self._path(table))

    def load(self, table: str) -> DataFrame:
        """The full table; empty with the right schema if never written."""
        path = self._path(table)
        if not _fs_exists(self.spark, path):
            from indra_db_spark.session import local_artifact_df

            return local_artifact_df(self.spark, [], PROVENANCE_SCHEMAS[table])
        return self.spark.read.schema(PROVENANCE_SCHEMAS[table]).parquet(path)

    # -- content bookkeeping (cli/content.py) --------------------------------

    def has_source_file(self, source: str, name: str) -> bool:
        """Was this archive already processed?  (content.py:820-827; the
        unique (source, name) constraint, principal_schema.py:1015-1017)."""
        return bool(
            self.load("source_file")
            .filter((F.col("source") == source) & (F.col("name") == name))
            .head(1)
        )

    def latest_content_update(self, source: str) -> datetime | None:
        """max(updates.datetime) for one source (content.py:548-557);
        None when the source has never had an initial upload."""
        row = (
            self.load("updates")
            .filter(F.col("source") == source)
            .agg(F.max("datetime").alias("dt"))
            .first()
        )
        return row["dt"] if row else None

    # -- reading bookkeeping (cli/reading.py:89-92) --------------------------

    def latest_reading_datetimes(self) -> dict[str, datetime]:
        """reader -> max(latest_datetime): the high-water mark each reader
        has read content up to."""
        rows = (
            self.load("reading_updates")
            .groupBy("reader")
            .agg(F.max("latest_datetime").alias("latest"))
            .collect()
        )
        return {r["reader"]: r["latest"] for r in rows}

    # -- xDD bookkeeping (cli/xdd.py:25-33) ----------------------------------

    def processed_xdd_days(self) -> set[str]:
        """day_str values already ingested; XddManager.load_groups skips
        these."""
        return {
            r["day_str"] for r in self.load("xdd_updates").select("day_str").collect()
        }

    # -- preassembly bookkeeping (cli/preassembly.py:9-32,55-63) -------------

    def last_preassembly_updates(self, stmt_types: list[str]) -> dict[str, datetime]:
        """Per-type latest preassembly run, where a whole-corpus run
        (stmt_type NULL) counts for every type — the
        ``filter_updates(st) | {last_full_update}`` union of
        preassembly.py:18-20.  Raises if no whole-corpus run exists, like
        the reference's ``max()`` over an empty set."""
        rows = self.load("preassembly_updates").collect()
        full = [r["run_datetime"] for r in rows if r["stmt_type"] is None]
        if not full:
            raise ValueError("no whole-corpus preassembly run recorded")
        last_full = max(full)
        by_type: dict[str, list[datetime]] = {}
        for r in rows:
            if r["stmt_type"] is not None:
                by_type.setdefault(r["stmt_type"], []).append(r["run_datetime"])
        return {
            st: max(by_type.get(st, []) + [last_full]) for st in stmt_types
        }

    def types_needing_update(
        self, latest_raw_by_type: dict[str, datetime]
    ) -> list[str]:
        """Statement types with raw statements newer than their last
        preassembly run (preassembly.py:55-63).  ``latest_raw_by_type``
        is type -> max(raw create date), the list_latest_raw_stmts analog
        (preassembly.py:24-31) — computed by the caller because raw
        arrival times live with the raw batch, not the ledger."""
        last_updates = self.last_preassembly_updates(list(latest_raw_by_type))
        return sorted(
            st
            for st, latest_raw in latest_raw_by_type.items()
            if latest_raw > last_updates[st]
        )
