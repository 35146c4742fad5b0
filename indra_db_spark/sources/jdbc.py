"""JDBC source/sink wrappers (reference: the Spark loader writes readonly
tables into Postgres via df.write.jdbc, readonly_dumping.py:597-605, and
the principal dump reads via COPY, :2075-2127).

A Parquet lake replaces the serving database in this rebuild, but the JDBC
path is kept for interop: reading a principal Postgres directly, or
publishing readonly tables back to a Postgres for legacy clients.

Scale notes: a naive ``spark.read.jdbc(url, table)`` is ONE task reading the
whole table through one connection; always pass a partition column + bounds
(or predicates) so the read parallelizes — mirrored here as required-ish
arguments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    properties: dict | None = None,
) -> DataFrame:
    """Parallel JDBC read.  Without a partition column the read is a single
    connection/task — allowed only for small dimension tables."""
    props = dict(properties or {})
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    properties: dict | None = None,
) -> None:
    """JDBC sink with batched inserts (readonly_dumping.py:597-605)."""
    props = dict(properties or {})
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
        .mode(mode)
    )
    for k, v in props.items():
        writer = writer.option(k, v)
    writer.save()
