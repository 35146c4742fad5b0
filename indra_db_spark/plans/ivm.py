"""Incremental view maintenance over the transaction log's change feeds.

A 100-TB fact table's rollups cannot be rebuilt per commit; they must be
MAINTAINED: apply the delta between two snapshots to the materialized
aggregate with work proportional to the CHANGE, not the table.  This is
the classic IVM result for distributive aggregates (count/sum are
self-maintainable from the delta alone; min/max are not — a deleted
minimum needs a rescan of its group).  :func:`incremental_agg` covers
count/sum; :func:`incremental_minmax` adds min/max with the standard
dirty-group protocol: groups whose retractions cannot have touched the
extremum fold the delta in directly, groups where a deleted value ties
or beats the stored extremum are re-aggregated from the NEW snapshot —
pruned to exactly those groups by a broadcast semi-join, so the rescan
is O(rows of dirty groups), never a fact rescan.

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


def _feed_sign(feed: DataFrame, change_type_col: str | None):
    """±1 sign expression for a change feed (all +1 when
    ``change_type_col`` is None = append-only); raises on a row type
    outside the CDF vocabulary — shared by every maintenance entry so the
    row-type set and its validation live in one place."""
    if change_type_col is None:
        return F.lit(1)
    sign = (
        F.when(F.col(change_type_col).isin(*_POS), F.lit(1))
        .when(F.col(change_type_col).isin(*_NEG), F.lit(-1))
    )
    if feed.filter(sign.isNull()).limit(1).count():
        raise ValueError(
            f"feed contains a {change_type_col} outside the CDF row "
            f"types {_POS + _NEG}"
        )
    return sign


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
    sign = _feed_sign(feed, change_type_col)
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
    minmax_cols: list[str] | None = None,
) -> DataFrame:
    """The bootstrap (and the oracle): the keyed count/sum(/min/max)
    aggregate of a full snapshot, in :func:`incremental_agg` /
    :func:`incremental_minmax`'s column shape."""
    sum_cols = sum_cols or []
    aggs = [F.count(F.lit(1)).alias(count_col)] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    for c in minmax_cols or []:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return snapshot.groupBy(*group_cols).agg(*aggs)


def incremental_minmax(
    base_agg: DataFrame,
    feed: DataFrame,
    new_snapshot: DataFrame,
    group_cols: list[str],
    minmax_cols: list[str],
    count_col: str = "n",
    change_type_col: str | None = "_change_type",
) -> DataFrame:
    """Maintain a keyed count/min/max aggregate from a change feed.

    Min/max are NOT self-maintainable under retraction — deleting the
    row that held a group's minimum leaves the new minimum unknowable
    from (old aggregate, delta) alone.  The classic fix, implemented
    here: classify each group by whether its retractions could have
    touched an extremum.

    - **Clean groups** (no retraction, or every retracted value is
      strictly inside the stored [min, max] envelope): fold the delta
      in directly — ``min' = least(min, min of inserted)``, symmetric
      for max, count from the signed delta.  O(delta) work.
    - **Dirty groups** (some retracted value ties or beats the stored
      extremum — the deleted row may BE the extremum; also any group
      retracted before it ever had a base row, where no envelope
      exists): re-aggregate from ``new_snapshot``, pruned to exactly
      the dirty keys by a semi-join.  On a 100-TB fact table keyed or
      bucketed by ``group_cols`` this reads only those groups'
      partitions; the rescan cost is Θ(rows of dirty groups) and the
      dirty set is empty whenever a delta only appends (the common
      feed), so steady-state maintenance stays O(delta).

    ``new_snapshot`` must be the POST-change table (e.g.
    ``TxTable.read()`` after the commits the feed spans — the row set
    equal to base ⊕ feed).  ``base_agg`` carries ``group_cols``,
    ``count_col`` and ``min_<c>``/``max_<c>`` per entry of
    ``minmax_cols`` — :func:`grouped_snapshot`'s shape.  Groups whose
    count reaches zero are dropped; the result is pinned ≡ a
    from-scratch :func:`grouped_snapshot` of ``new_snapshot``."""
    if not minmax_cols:
        raise ValueError("minmax_cols must name at least one column")
    sign = _feed_sign(feed, change_type_col)
    pos, neg = sign == 1, sign == -1
    aggs = [F.sum(sign).alias("d_n")]
    for c in minmax_cols:
        aggs += [
            F.min(F.when(pos, F.col(c))).alias(f"ins_min_{c}"),
            F.max(F.when(pos, F.col(c))).alias(f"ins_max_{c}"),
            F.min(F.when(neg, F.col(c))).alias(f"del_min_{c}"),
            F.max(F.when(neg, F.col(c))).alias(f"del_max_{c}"),
        ]
    d = feed.groupBy(*group_cols).agg(*aggs)
    merged = base_agg.join(d, group_cols, "full_outer")

    # a group is dirty when any retracted value reaches the stored
    # envelope boundary (the retraction may have removed the extremum),
    # or when retractions hit a group the base never aggregated
    dirty = F.lit(False)
    for c in minmax_cols:
        touched = F.col(f"del_min_{c}").isNotNull() | F.col(
            f"del_max_{c}"
        ).isNotNull()
        no_envelope = F.col(f"min_{c}").isNull()
        at_boundary = (F.col(f"del_min_{c}") <= F.col(f"min_{c}")) | (
            F.col(f"del_max_{c}") >= F.col(f"max_{c}")
        )
        dirty = dirty | (touched & (no_envelope | at_boundary))
    merged = merged.withColumn("_ivm_dirty", dirty)

    n = F.coalesce(F.col(count_col), F.lit(0)) + F.coalesce(
        F.col("d_n"), F.lit(0)
    )
    clean_cols = list(group_cols) + [n.alias(count_col)]
    for c in minmax_cols:
        clean_cols.append(
            F.least(F.col(f"min_{c}"), F.col(f"ins_min_{c}")).alias(f"min_{c}")
        )
        clean_cols.append(
            F.greatest(F.col(f"max_{c}"), F.col(f"ins_max_{c}")).alias(
                f"max_{c}"
            )
        )
    clean = (
        merged.filter(~F.col("_ivm_dirty"))
        .select(*clean_cols)
        .filter(F.col(count_col) > 0)
    )
    dirty_keys = merged.filter(F.col("_ivm_dirty")).select(*group_cols)
    rescanned = grouped_snapshot(
        new_snapshot.join(F.broadcast(dirty_keys), group_cols, "semi"),
        group_cols,
        count_col=count_col,
        minmax_cols=minmax_cols,
    ).select(*[c for c in clean.columns])
    return clean.unionByName(rescanned)
