"""The readonly Parquet lake — the rebuild's counterpart of the reference's
materialized ``readonly`` Postgres schema (SURVEY.md §1.4).

Holds one DataFrame per readonly table and serves them to the query algebra.
At scale: each table is a partitioned/bucketed Parquet dataset; the three
agent-meta tables (name/text/other) are the reference's skew-busting
partition of pa_meta by namespace (readonly_schema.py:991-1021) and keep
that routing here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from indra_db_spark.schemas import READONLY_SCHEMAS

#: tables every lake must provide for the query algebra
CORE_TABLES = (
    "name_meta",
    "text_meta",
    "other_meta",
    "source_meta",
    "mesh_term_meta",
    "mesh_concept_meta",
)


class ReadonlyLake:
    def __init__(self, tables: dict[str, DataFrame]):
        missing = [t for t in CORE_TABLES if t not in tables]
        if missing:
            raise ValueError(f"readonly lake missing core tables: {missing}")
        self._tables = dict(tables)

    def __getitem__(self, name: str) -> DataFrame:
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables

    def tables(self) -> dict[str, DataFrame]:
        return dict(self._tables)

    @property
    def spark(self) -> SparkSession:
        return self._tables["source_meta"].sparkSession

    def universe(self) -> DataFrame:
        """The hash universe: one row per statement with payload columns
        (source_meta is the reference's EXCEPT base, query.py:1752-1765)."""
        return self._tables["source_meta"].select("mk_hash", "ev_count", "belief")

    def register_views(self, prefix: str = "") -> None:
        """Expose every lake table as a temp view so the whole readonly
        layer is queryable in plain Spark SQL (the free SQL surface the
        reference lacks — its only query language is the algebra)."""
        for name, df in self._tables.items():
            df.createOrReplaceTempView(f"{prefix}{name}")

    @classmethod
    def from_parquet(cls, spark: SparkSession, root: str) -> "ReadonlyLake":
        tables = {}
        for name in READONLY_SCHEMAS:
            path = os.path.join(root, name)
            if os.path.exists(path):
                tables[name] = spark.read.parquet(path)
        return cls(tables)

    def write_parquet(self, root: str, mode: str = "overwrite") -> None:
        for name, df in self._tables.items():
            df.write.mode(mode).parquet(os.path.join(root, name))

    #: tables served sorted by ev_count (the algebra's default sort key) —
    #: range-partitioned + sorted files let parquet row-group min/max stats
    #: prune top-k scans, replacing the reference's btree indexes + CLUSTER
    #: (schemas/mixins.py:70-97, readonly_schema.py:635-637)
    RANKED_TABLES = (
        "name_meta", "text_meta", "other_meta", "source_meta",
        "mesh_term_meta", "mesh_concept_meta", "agent_interactions",
    )

    def write_optimized(
        self, root: str, mode: str = "overwrite", partitions: int = 32
    ) -> None:
        """At-scale physical layout: ranked tables range-partitioned on
        descending ev_count and sorted within files; everything else
        hash-partitioned on its join key so co-keyed joins between lake
        tables shuffle one side at most."""
        from pyspark.sql import functions as F

        for name, df in self._tables.items():
            if name in self.RANKED_TABLES:
                out = df.repartitionByRange(
                    partitions, F.desc("ev_count"), F.asc("mk_hash")
                ).sortWithinPartitions(F.desc("ev_count"), F.asc("mk_hash"))
            elif "mk_hash" in df.columns:
                out = df.repartition(partitions, "mk_hash")
            elif "sid" in df.columns:
                out = df.repartition(partitions, "sid")
            else:
                out = df
            out.write.mode(mode).parquet(os.path.join(root, name))

    @classmethod
    def from_rows(cls, spark: SparkSession, rows_by_table: dict[str, list]) -> "ReadonlyLake":
        """Build a lake from python row dicts (fixtures/tests)."""
        tables = {}
        for name, rows in rows_by_table.items():
            schema = READONLY_SCHEMAS[name]
            tables[name] = spark.createDataFrame(rows, schema)
        return cls(tables)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_within: list[str] | None = None,
) -> dict:
    """Small-file compaction for an append-heavy parquet table: rewrite
    ``path`` into ~``target_file_mb`` files, preserving rows exactly →
    stats dict (files before/after, bytes, rows).

    The lake's incremental paths (xdd day drops, stream sinks, KB update
    batches) append small files per run; scan parallelism then tracks file
    COUNT instead of data size and footer-read overhead dominates.
    Compaction is the standard maintenance job (what OPTIMIZE does in
    table formats).

    Mechanics: size the output from the Hadoop content summary (works for
    any FS scheme, not just file:), repartition to ceil(bytes/target),
    optionally sort within partitions (restores row-group min/max locality
    for ranked tables — see ``write_optimized``), write to a sibling tmp
    dir, then swap via rename.  Rename is atomic on HDFS/local; on object
    stores it is copy+delete, so production object-store lakes should
    layer a table format (Delta/Iceberg) over this — documented trade, the
    job itself is format-agnostic.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())

    def _listing():
        out = {}
        for f in fs.listStatus(hpath):
            name = f.getPath().getName()
            if f.isDirectory() and not name.startswith((".", "_")):
                # hive-partitioned layout: a flat rewrite would embed the
                # partition column into data files and silently destroy
                # partition pruning for every reader
                raise ValueError(
                    f"{path} contains subdirectory {name!r} — "
                    "compact_parquet only handles flat parquet dirs; "
                    "compact hive-partitioned tables per partition"
                )
            if name.endswith(".parquet"):
                out[name] = (f.getLen(), f.getModificationTime())
        return out

    before = _listing()
    total_bytes = sum(sz for sz, _ in before.values())
    n_out = max(1, -(-int(total_bytes) // (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    rows = df.count()
    out = df.repartition(n_out)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    tmp = path.rstrip("/") + ".compact-tmp"
    out.write.mode("overwrite").parquet(tmp)
    # verify the rewrite BEFORE the swap — a failed job must never eat data
    rows_after = spark.read.parquet(tmp).count()
    if rows_after != rows:
        raise RuntimeError(
            f"compaction row mismatch ({rows} -> {rows_after}); "
            f"original left untouched, rewrite kept at {tmp}"
        )
    # concurrent-writer fence: if ANY file appeared/changed since the
    # snapshot we compacted, deleting the dir would eat the new data —
    # abort with the original intact.  (Not fully atomic: a writer landing
    # between this check and the delete still loses; run compaction in the
    # maintenance window that owns the table, as table-format OPTIMIZE
    # does via its transaction log.)
    if _listing() != before:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise RuntimeError(
            f"{path} changed during compaction (concurrent writer?); "
            "original left untouched — rerun inside a maintenance window"
        )
    if not fs.delete(hpath, True):
        raise RuntimeError(f"failed to delete {path}; rewrite kept at {tmp}")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath):
        raise RuntimeError(
            f"rename {tmp} -> {path} failed; the ONLY copy of the data "
            f"is at {tmp} — restore it manually before serving reads"
        )
    files_after = sum(
        1 for n in _listing()
    )
    return {
        "files_before": len(before),
        "files_after": files_after,
        "bytes": int(total_bytes),
        "rows": rows,
    }
