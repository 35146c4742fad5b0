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
