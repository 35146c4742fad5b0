"""Keyed set operations.

The reference's merge queries (Intersection/Union, reference:
indra_db/client/readonly/query.py:2520-2976) operate on hash *sets*: every
branch produces (mk_hash, ev_count, belief) and branches combine by INTERSECT
/ UNION / EXCEPT on mk_hash.  On Spark, key-based joins beat the generic
INTERSECT/EXCEPT operators because (a) they keep the payload columns without
a second join back, and (b) all branches shuffle on the *same* key, so AQE
can reuse one exchange across consecutive set ops.

Inversion (~q) = EXCEPT against the hash universe (source_meta) — here
exposed as ``anti_join`` (reference: query.py:1752-1765).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def semi_join(df: DataFrame, keys_df: DataFrame, on) -> DataFrame:
    """df ⋉ keys_df — rows of df whose key appears in keys_df."""
    return df.join(keys_df.select(on).distinct(), on=on, how="left_semi")


def anti_join(df: DataFrame, keys_df: DataFrame, on) -> DataFrame:
    """df ▷ keys_df — rows of df whose key does NOT appear in keys_df."""
    return df.join(keys_df.select(on).distinct(), on=on, how="left_anti")


def keyed_intersect(dfs: list[DataFrame], on) -> DataFrame:
    """INTERSECT of N branches on a key, keeping the first branch's payload.

    Chained left_semi joins: each is a shuffle on the same key, and the
    non-first branches are reduced to distinct key sets (often broadcastable
    after their own filters)."""
    first, rest = dfs[0], dfs[1:]
    return reduce(lambda acc, d: semi_join(acc, d, on), rest, first)


def keyed_union(dfs: list[DataFrame], on=None) -> DataFrame:
    """UNION (distinct) of N branches; dedup on ``on`` if given else all cols.

    unionByName so branch column order never matters."""
    out = reduce(lambda a, b: a.unionByName(b), dfs)
    if on is None:
        return out.dropDuplicates()
    return out.dropDuplicates([on] if isinstance(on, str) else list(on))


def keyed_except(pos: DataFrame, neg: DataFrame, on) -> DataFrame:
    """pos EXCEPT neg on a key — one left_anti join (the reference's
    positive-EXCEPT-negative rewrite, query.py:2663-2709)."""
    return anti_join(pos, neg, on)
