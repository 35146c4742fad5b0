"""Driver-gate query catalog.

Each entry pairs a Spark DataFrame program (built on indra_db_spark
operators) with an equivalent ANSI-SQL oracle string runnable by DuckDB on
the same parquet tables.  Entries map 1:1 to operator lines in SURVEY.md §2
(relational core) plus the training-data operator families (dedup,
similarity, text, multimodal, graph).

Column names are aliased identically on both sides; float aggregation goes
through exact decimals (see functions/decimals.py) so hashes match
bit-for-bit regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# importing the modules populates REGISTRY
from indra_db_spark.catalog import relational  # noqa: E402,F401
from indra_db_spark.catalog import training  # noqa: E402,F401


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
