"""Parquet lake access.

The reference's "scan" layer is Postgres COPY dumps + tsv.gz readers
(reference: indra_db/readonly_dumping/readonly_dumping.py:2075-2127 and
:558-605); the Spark-native equivalent is a directory of Parquet tables read
with schema/predicate pushdown.  ``load_table`` is the single entry point so
every operator benefits from column pruning (callers ``.select`` immediately)
and Catalyst pushes filters into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table from a scale-factor directory.

    ``events.ts`` is stored as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos long
    and is rebuilt here as a micro-precision timestamp (sub-microsecond
    detail is immaterial for event-time semantics).  The conf is set here at
    runtime (it is a dynamic SQLConf) so callers with a vanilla
    ``SparkSession`` — e.g. an external harness — read the lake without
    needing session-builder cooperation.
    """
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC so event-time queries (date_trunc/window) agree with the
    # naive-timestamp oracle regardless of the host machine's zone.
    # NB: conf.get must not pass a fallback here — Spark validates the
    # fallback string against the conf's validator and rejects e.g. "".
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in (names or TABLES)]


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register the lake as temp views so plans are expressible in Spark SQL."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_tsv_gz(spark: SparkSession, path: str, schema, sep: str = "\t") -> DataFrame:
    """TSV.gz reader matching the reference's assembly-stage file format
    (reference: readonly_dumping.py:558-605 load_file_to_table_spark)."""
    return spark.read.csv(path, schema=schema, sep=sep, header=False, nullValue="\\N")


def write_parquet(df: DataFrame, path: str, partition_by=None, mode: str = "overwrite") -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
