"""Top-k / windowed-rank operators.

Reference semantics:
- global sort + LIMIT/OFFSET over (ev_count|belief)
  (reference: indra_db/client/readonly/query.py:464-470, _apply_limits);
- per-group top-N evidence via a correlated LATERAL subquery
  (reference: query.py:489-506).

Spark mapping: global top-k compiles to TakeOrderedAndProject (no full
sort/shuffle of the table — each partition keeps k rows, the driver merges);
per-group top-N is the canonical row_number() window rewrite, which Catalyst
prunes early via InferWindowGroupLimit (a per-partition group-limit runs
*before* the shuffle, so only ≤N rows per group per partition shuffle).

Both take explicit tie-breaker columns: at cluster scale, result stability
under re-partitioning requires a total order (SURVEY.md §7.4 risk 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order_by) -> list[Column]:
    if isinstance(order_by, (str, Column)):
        order_by = [order_by]
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def global_topk(df: DataFrame, order_by, k: int, offset: int = 0) -> DataFrame:
    """ORDER BY ... LIMIT k [OFFSET o] — physical plan: TakeOrderedAndProject."""
    out = df.orderBy(*_order_cols(order_by))
    if offset:
        out = out.offset(offset)
    return out.limit(k)


def grouped_topn(
    df: DataFrame,
    partition_by,
    order_by,
    n: int,
    rank_col: str = "rn",
    keep_rank: bool = True,
) -> DataFrame:
    """Top-N rows per group (the LATERAL-join rewrite).

    row_number (not rank) + explicit tie-breakers in ``order_by`` gives a
    deterministic, exactly-N result per group.
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
    return out if keep_rank else out.drop(rank_col)


def argmax_per_group(df: DataFrame, partition_by, order_by) -> DataFrame:
    """Single best row per group (the reference's 'distill' reader-dedup
    shape, reference: readonly_dumping/export_assembly.py:174-233)."""
    return grouped_topn(df, partition_by, order_by, 1, keep_rank=False)
