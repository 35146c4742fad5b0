"""Transaction-log catalog entries — the txlog SERVING path under the
driver's hard oracle gate.

The txlog layer (plans/txlog.py: optimistic manifests, DV merge-on-read
deletes, RESTORE) is the engine's largest post-r7 component and was
previously verified only by pytest (the 50+ race/conflict/crash matrix);
``txlog_dv_read`` puts its READ path — the thing a 100-TB serving tier
actually executes — under the same DuckDB oracle every relational entry
answers to (r8 verdict #5 / r9 top-next).

Reference parity: the reference serves its readonly tier from dumped
principal snapshots (indra_db/readonly_dumping + util/dump_mgmt); the
txlog-served lake is this engine's equivalent of that snapshot serving
boundary, with row-level deletes and rollback added.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from indra_db_spark.catalog import register
from indra_db_spark.sources.lake import load_table as T

#: columns the entry round-trips through the transaction log
_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


@register(
    "txlog_dv_read",
    f"""
    SELECT {', '.join(_COLS)}
    FROM orders
    WHERE o_orderkey % 97 = 0 AND NOT (o_orderstatus = 'F')
    """,
)
def txlog_dv_read(spark, sf):
    """End-to-end txlog serving check: write a deterministic ``orders``
    slice through :class:`~indra_db_spark.plans.txlog.TxTable` as TWO
    appends (the snapshot read unions multiple manifests' file lists),
    apply a merge-on-read deletion-vector DELETE, apply a SECOND DV
    delete, RESTORE to the boundary between them, and read the head
    snapshot.  The surviving rows must equal plain SQL over the source
    table with only the FIRST delete applied — so the oracle hash fails
    if DV sidecars are not anti-joined at read, if the second delete
    leaks through the restore, or if the restore rolls back too far.

    Scratch resolution reuses the corpus barrier's cluster-visible rule
    (explicit conf -> checkpoint dir -> local temp only under local[*])
    with process-exit cleanup; the returned DataFrame reads the txlog
    snapshot lazily, so the data path stays fully distributed — nothing
    is collected to the driver."""
    from indra_db_spark.operators.sampling import _barrier_dir
    from indra_db_spark.plans.txlog import TxTable

    sliced = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(*_COLS)
    )
    root = _barrier_dir(spark, "txlog_dv_read_", what="txlog_dv_read")
    tx = TxTable(spark, root)
    # the second append pushes the live file count past
    # INLINE_MANIFEST_FILES, so from v2 on the manifests are SEGMENTED
    # (round 10) — the gate then also fails if segment write/resolution,
    # the remove-rewrite of intersected segments, or restore-over-segments
    # corrupts the file list
    tx.append(sliced.filter(F.col("o_orderkey") % 194 == 0).repartition(24))
    tx.append(sliced.filter(F.col("o_orderkey") % 194 != 0).repartition(48))
    tx.delete_where(F.col("o_orderstatus") == "F", mode="dv")
    v_second = tx.delete_where(F.col("o_totalprice") > 150000.0, mode="dv")
    # roll back whenever the second delete COMMITTED — even when the
    # first matched nothing (then v_second-1 is the last append): the
    # oracle applies only the first predicate, so a v_first-gated guard
    # would leak the second delete at a scale factor where no 'F' row
    # falls in the slice
    if v_second is not None:
        tx.restore(v_second - 1)
    # targeted DV materialization is a LAYOUT action: folding the
    # surviving delete into fresh files must leave the answer untouched,
    # so the same oracle also gates materialize_dv (round 10)
    tx.materialize_dv(min_sidecars=1)
    return tx.read().select(*_COLS)


@register(
    "txlog_skip_read",
    f"""
    SELECT {', '.join(_COLS)}
    FROM orders
    WHERE o_orderkey % 7 = 0
      AND o_totalprice >= 50000.0 AND o_totalprice <= 100000.0
    """,
)
def txlog_skip_read(spark, sf):
    """Manifest-stats pruning under the oracle (round 10): write an
    ``orders`` slice through the txlog range-partitioned on
    ``o_totalprice`` with ``set_stats_columns`` active, then answer a box
    predicate via :meth:`TxTable.skip_read` — the driver-side
    manifest-stats prune plus the exact residual filter must equal plain
    SQL, and the entry asserts the prune actually engaged (files_read <
    files_total) so a silently stats-less manifest fails loudly rather
    than degrading to a full scan."""
    from indra_db_spark.operators.sampling import _barrier_dir
    from indra_db_spark.plans.txlog import TxTable

    sliced = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(*_COLS)
    )
    root = _barrier_dir(spark, "txlog_skip_read_", what="txlog_skip_read")
    tx = TxTable(spark, root)
    tx.set_stats_columns("o_totalprice")
    tx.append(sliced.repartitionByRange(8, "o_totalprice"))
    df, files_read, files_total = tx.skip_read(
        predicates={"o_totalprice": (50000.0, 100000.0)}
    )
    if not files_read < files_total:
        raise AssertionError(
            f"manifest-stats prune did not engage: read {files_read} of "
            f"{files_total} files for a box on the range-partition key"
        )
    return df.select(*_COLS)
