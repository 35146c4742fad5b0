"""Incremental view maintenance over the transaction log's change feeds.

A 100-TB fact table's rollups cannot be rebuilt per commit; they must be
MAINTAINED: apply the delta between two snapshots to the materialized
aggregate with work proportional to the CHANGE, not the table.  This is
the classic IVM result for distributive aggregates (count/sum are
self-maintainable from the delta alone; min/max are not — a deleted
minimum needs a rescan of its group, so they are deliberately excluded).

Two feed shapes, matching :class:`plans.txlog.TxTable`'s two reads:

- append-only ranges (:meth:`TxTable.changes`): every delta row is an
  insert — ``incremental_agg(base, delta, ...)`` with implicit +1 signs;
- row-mutating ranges (:meth:`TxTable.row_changes`): the CDF carries
  ``_change_type`` ∈ {insert, delete, update_preimage, update_postimage};
  post-images and inserts count +1, pre-images and deletes −1 — an
  update contributes its SIGNED PAIR, so the group moves by exactly the
  row's attribute change.

Scale shape: ONE partial-agg shuffle of the delta on the group key plus a
full-outer join against the base aggregate (at 100 TB the base is itself
keyed storage; bucketed on the group key the join is exchange-free on
that side).  Groups whose row count reaches zero are dropped — the
aggregate stays exactly equal to a from-scratch rebuild, which is what
the tests pin through the txlog end to end.

No reference analog (the reference rebuilds its readonly store wholesale
per release, readonly_dumping/); public semantics follow the standard
delta-propagation literature and the materialized-view maintenance the
table formats document for their CDF readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: CDF row types that add a row to the group / remove one from it
_POS = ("insert", "update_postimage")
_NEG = ("delete", "update_preimage")


def delta_agg(
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    change_type_col: str | None = "_change_type",
) -> DataFrame:
    """Reduce a change feed to per-group signed deltas: ``d_n`` (row-count
    delta) and ``d_sum_<c>`` per sum column.  With ``change_type_col``
    None the feed is treated as append-only (all +1).  One partial-agg
    shuffle of the delta."""
    sum_cols = sum_cols or []
    if change_type_col is None:
        sign = F.lit(1)
    else:
        sign = (
            F.when(F.col(change_type_col).isin(*_POS), F.lit(1))
            .when(F.col(change_type_col).isin(*_NEG), F.lit(-1))
        )
        unknown = feed.filter(sign.isNull()).limit(1).count()
        if unknown:
            raise ValueError(
                f"feed contains a {change_type_col} outside the CDF row "
                f"types {_POS + _NEG}"
            )
    aggs = [F.sum(sign).alias("d_n")] + [
        F.sum(sign * F.col(c)).alias(f"d_sum_{c}") for c in sum_cols
    ]
    return feed.groupBy(*group_cols).agg(*aggs)


def incremental_agg(
    base_agg: DataFrame,
    feed: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    count_col: str = "n",
    change_type_col: str | None = "_change_type",
) -> DataFrame:
    """Maintain a keyed count/sum aggregate from a change feed.

    ``base_agg`` must carry ``group_cols``, ``count_col`` and one
    ``sum_<c>`` column per entry of ``sum_cols`` — the exact shape
    :func:`grouped_snapshot` produces, so maintenance composes with its
    own bootstrap.  Returns the same shape, equal (pinned in tests) to
    recomputing :func:`grouped_snapshot` on the new snapshot: full-outer
    join base × delta on the group key, add, drop emptied groups.
    Work is O(delta) + one join against the base — never a fact rescan.
    """
    sum_cols = sum_cols or []
    d = delta_agg(feed, group_cols, sum_cols, change_type_col)
    merged = base_agg.join(d, group_cols, "full_outer")
    out_cols = list(group_cols)
    n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("d_n"), F.lit(0)
    )
    out_cols.append(n.alias(count_col))
    for c in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"d_sum_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
        )
    return merged.select(*out_cols).filter(F.col(count_col) > 0)


def grouped_snapshot(
    snapshot: DataFrame,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    count_col: str = "n",
) -> DataFrame:
    """The bootstrap (and the oracle): the keyed count/sum aggregate of a
    full snapshot, in :func:`incremental_agg`'s column shape."""
    sum_cols = sum_cols or []
    aggs = [F.count(F.lit(1)).alias(count_col)] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    return snapshot.groupBy(*group_cols).agg(*aggs)
