"""SparkSession factory with scale-oriented defaults.

Designed for a multi-executor cluster but testable on local[N]:
- AQE on (runtime join re-selection, skew-join splitting, partition
  coalescing) — replaces the reference's hand-tuned Postgres planner.
- Arrow on for the few Pandas-UDF paths (grounding/scoring analogs).
- Session timezone pinned to UTC so timestamp literals and parquet
  round-trips are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    # the test tables store TIMESTAMP(NANOS) which Spark's vectorized reader
    # rejects; read as long and rebuild timestamps at the source layer
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    # Local-mode friendliness; harmless on a cluster where the submitter
    # overrides these.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "indra-db-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32) so tests and
    bench share one code path; on a real cluster pass ``master=None`` with
    ``spark.master`` preconfigured, or an explicit URL.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or int(cpus))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


#: rows per slice for driver-built row-list frames (see
#: :func:`local_artifact_df`)
_LOCAL_DF_ROWS_PER_SLICE = 4096


def local_artifact_df(spark: SparkSession, rows, schema):
    """A driver-built row list as a DataFrame whose slice count scales
    with the row count (ceil(rows / 4096), capped at defaultParallelism)
    instead of one pickled slice per core.

    A bare ``createDataFrame(local_rows)`` parallelizes into
    ``defaultParallelism`` pickled slices, so ANY scan of the frame —
    including a 1-row parquet append or a broadcast-exchange build —
    pays one Python-runner round trip per core to deserialize a handful
    of rows each (measured r13/r14: 8–9 executor-seconds for a 128-row
    codebook scan; 4.2 s for a one-row curation-ledger append, 0.3 s
    through this constructor).  Artifact frames are hyperparameter- or
    event-sized, so they land at 1–2 slices at every real sizing;
    corpus-sized frames never take this constructor.  Canonical home of
    the r13 helper (``operators.pq`` re-exports it)."""
    rows = rows if isinstance(rows, (list, tuple)) else list(rows)
    sc = spark.sparkContext
    n = max(
        1,
        min(
            sc.defaultParallelism,
            -(-len(rows) // _LOCAL_DF_ROWS_PER_SLICE),
        ),
    )
    return spark.createDataFrame(sc.parallelize(rows, n), schema)
