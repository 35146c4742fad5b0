"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are populated from
``indra_db_spark.catalog`` — one entry per operator line of SURVEY.md §2
plus the training-data operator families.  ``entry`` runs the flagship
multi-measure rollup (TPC-H Q1 shape = the reference's relations roll-up,
client/readonly/query.py:130-163) on sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from indra_db_spark import catalog

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = catalog.REGISTRY["agg_rollup"]
    return fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
