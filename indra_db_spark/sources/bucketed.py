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
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
