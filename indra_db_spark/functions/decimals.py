"""Order-independent (exact-decimal) aggregation helpers.

Floating-point SUM is order-dependent; on a 1000-executor cluster the
partitioning (and therefore the summation order) is nondeterministic, so any
engine-vs-engine comparison — and any run-vs-run comparison — of a double
SUM can differ in the last ulps.  The reference sidesteps this because
Postgres executes serially; Spark must not rely on that.

Pattern: cast the measure to an exact DECIMAL, aggregate exactly (decimal
addition is associative+commutative → partition-order independent), then
cast the final scalar to DOUBLE once.  The DuckDB oracle does the same, so
results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Exact decimal SUM surfaced as a double."""
    return F.sum(dec(col, scale)).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).alias(alias)


def drevenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """TPC-H style revenue term price*(1-discount) in exact decimal."""
    return dec(price) * (F.lit(1).cast("decimal(18,2)") - dec(discount))
