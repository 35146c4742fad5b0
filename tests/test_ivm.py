"""Incremental view maintenance: a keyed count/sum rollup maintained from
the txlog's change feeds must equal the from-scratch rebuild at every
version — the O(delta) alternative to the reference's wholesale readonly
rebuild (readonly_dumping/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indra_db_spark.plans.ivm import (
    delta_agg,
    grouped_snapshot,
    incremental_agg,
)
from indra_db_spark.plans.txlog import TxTable


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "grp", "v"])


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ivm_tracks_merge_delete_append_end_to_end(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], ["v"])

    # update k=2 (a: sum 30→35), move k=3 to grp a, insert k=4 in b,
    # then delete k=1
    t.merge(
        _df(spark, [(2, "a", 25), (3, "a", 5), (4, "b", 7)]), ["k"]
    )
    t.delete_where(F.col("k") == 1)
    v2 = t.snapshot()[0]

    feed = t.row_changes(["k"], since_version=v1, to_version=v2)
    maintained = incremental_agg(view, feed, ["grp"], ["v"])
    _assert_same(maintained, grouped_snapshot(t.read(v2), ["grp"], ["v"]))
    got = {r.grp: (r.n, r.sum_v) for r in maintained.collect()}
    assert got == {"a": (2, 30), "b": (1, 7)}


def test_ivm_drops_emptied_groups(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10), (2, "b", 1)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], ["v"])
    t.delete_where(F.col("grp") == "a")
    feed = t.row_changes(["k"], since_version=v1)
    maintained = incremental_agg(view, feed, ["grp"], ["v"])
    assert [r.grp for r in maintained.collect()] == ["b"]


def test_ivm_append_only_fast_path_uses_changes_feed(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], ["v"])
    t.append(_df(spark, [(2, "a", 5), (3, "c", 9)]))
    # the O(delta-files) feed, no snapshot diff needed for appends
    feed = t.changes(v1)
    maintained = incremental_agg(
        view, feed, ["grp"], ["v"], change_type_col=None
    )
    _assert_same(maintained, grouped_snapshot(t.read(), ["grp"], ["v"]))


def test_ivm_group_key_change_moves_the_row(spark, tmp_path):
    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10), (2, "a", 20)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], ["v"])
    t.merge(_df(spark, [(1, "b", 10)]), ["k"])  # k=1 migrates a→b
    feed = t.row_changes(["k"], since_version=v1)
    maintained = incremental_agg(view, feed, ["grp"], ["v"])
    got = {r.grp: (r.n, r.sum_v) for r in maintained.collect()}
    assert got == {"a": (1, 20), "b": (1, 10)}


def test_delta_agg_rejects_unknown_change_types(spark):
    bad = spark.createDataFrame(
        [(1, "a", 10, "upsert")], ["k", "grp", "v", "_change_type"]
    )
    with pytest.raises(ValueError, match="outside the CDF row types"):
        delta_agg(bad, ["grp"], ["v"])


def test_streaming_materialized_view_exactly_once(spark, tmp_path):
    """foreachBatch: facts land exactly-once AND the rollup view folds
    each batch in O(batch) — after every drain the view must equal a
    from-scratch aggregate of the fact table, across restarts and
    replays."""
    from indra_db_spark.streaming.ingest import (
        maintain_rollup_stream,
        read_stream,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)], ["k", "grp", "v"]
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    facts_root = str(tmp_path / "facts")
    view_root = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")

    maintain_rollup_stream(
        read_stream(spark, src, schema),
        facts_root, view_root, ["grp"], ["v"], ckpt,
    )
    facts = TxTable(spark, facts_root)
    view = TxTable(spark, view_root)
    _assert_same(view.read(), grouped_snapshot(facts.read(), ["grp"], ["v"]))
    got = {r.grp: (r.n, r.sum_v) for r in view.read().collect()}
    assert got == {"a": (2, 30), "b": (1, 5)}

    # second drop: existing group grows, new group appears
    spark.createDataFrame(
        [(4, "a", 1), (5, "c", 7)], ["k", "grp", "v"]
    ).write.mode("append").parquet(src)
    maintain_rollup_stream(
        read_stream(spark, src, schema),
        facts_root, view_root, ["grp"], ["v"], ckpt,
    )
    assert facts.read().count() == 5
    _assert_same(view.read(), grouped_snapshot(facts.read(), ["grp"], ["v"]))
    got = {r.grp: (r.n, r.sum_v) for r in view.read().collect()}
    assert got == {"a": (3, 31), "b": (1, 5), "c": (1, 7)}

    # zombie replay of batch 0 against BOTH tables: no-ops
    fv, vv = facts.snapshot()[0], view.snapshot()[0]
    batch0 = spark.read.parquet(src).limit(3)
    assert facts.append_batch(batch0, ckpt, 0) is None
    assert view.merge_batch(
        grouped_snapshot(batch0, ["grp"], ["v"]), ["grp"], ckpt, 0
    ) is None
    assert facts.snapshot()[0] == fv and view.snapshot()[0] == vv


def test_streaming_scd2_matches_batch_build(spark, tmp_path):
    """Drive the streaming SCD2 maintainer over two time-ordered drops —
    including a cross-batch heartbeat and a same-instant tie — and the
    maintained table must equal scd2_build over the full static
    history."""
    import datetime as dt

    from indra_db_spark.operators.temporal import scd2_build
    from indra_db_spark.streaming.ingest import read_stream, scd2_stream_txlog

    t = lambda h: dt.datetime(2024, 1, 1, h)  # noqa: E731
    drop1 = [
        (1, t(0), 10, "A"),
        (1, t(1), 11, "B"),
        (2, t(0), 20, "X"),
    ]
    drop2 = [
        (1, t(2), 12, "B"),   # cross-batch heartbeat: no new version
        (1, t(3), 13, "C"),   # real change: closes B at t3
        (2, t(4), 21, "Y"),   # change for key 2
        (3, t(4), 30, "Z"),   # brand-new key
        (3, t(4), 31, "W"),   # same-instant tie: eid 31 wins
    ]
    cols = ["k", "ts", "eid", "attr"]
    src = str(tmp_path / "src")
    view_root = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(drop1, cols).write.parquet(src)
    schema = spark.read.parquet(src).schema
    scd2_stream_txlog(
        read_stream(spark, src, schema), view_root,
        ["k"], "ts", ["attr"], ckpt, tiebreak_col="eid",
    )
    spark.createDataFrame(drop2, cols).write.mode("append").parquet(src)
    scd2_stream_txlog(
        read_stream(spark, src, schema), view_root,
        ["k"], "ts", ["attr"], ckpt, tiebreak_col="eid",
    )

    expected = scd2_build(
        spark.createDataFrame(drop1 + drop2, cols),
        "k", "ts", ["attr"], tiebreak_col="eid",
    )
    got = TxTable(spark, view_root).read().select(
        "k", "attr", "valid_from", "valid_to", "is_current"
    )
    _assert_same(got, expected)
    rows = {
        (r.k, r.attr): (r.valid_to, r.is_current) for r in got.collect()
    }
    # heartbeat did NOT fragment: key 1's B interval runs t1 -> t3
    assert rows[(1, "B")][0].hour == 3
    assert rows[(1, "C")] == (None, True)
    assert rows[(3, "W")] == (None, True)
    assert (3, "Z") not in rows  # same-instant argmax by eid


# ---- min/max maintenance under retraction (r8 verdict #6) -----------------


def test_ivm_minmax_tracks_txlog_mutations_end_to_end(spark, tmp_path):
    """count/min/max maintained from the txlog's row_changes CDF across
    merge (update), delete, and append must equal the from-scratch
    rebuild — including groups whose deleted row WAS the extremum (the
    retraction-rescan path) and groups untouched at the boundary (the
    delta-only path)."""
    from indra_db_spark.plans.ivm import incremental_minmax

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "b", 9)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], minmax_cols=["v"])

    t.delete_where(F.col("k") == 2)   # removes a's MAX → dirty
    t.merge(_df(spark, [(4, "b", 8), (5, "a", 3), (6, "c", 1)]), ["k"])
    v2 = t.snapshot()[0]

    feed = t.row_changes(["k"], since_version=v1, to_version=v2)
    maintained = incremental_minmax(
        view, feed, t.read(v2), ["grp"], ["v"]
    )
    _assert_same(
        maintained, grouped_snapshot(t.read(v2), ["grp"], minmax_cols=["v"])
    )
    got = {r.grp: (r.n, r.min_v, r.max_v) for r in maintained.collect()}
    assert got == {"a": (2, 3, 10), "b": (2, 5, 8), "c": (1, 1, 1)}


def test_ivm_minmax_rescans_only_dirty_groups(spark, tmp_path):
    """The rescan is PRUNED: with the new snapshot replaced by only the
    dirty groups' rows, maintenance still agrees — proof the clean
    groups never consulted the snapshot (the property that keeps
    steady-state maintenance O(delta) at 100 TB)."""
    from indra_db_spark.plans.ivm import incremental_minmax

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5), (4, "b", 9)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], minmax_cols=["v"])
    t.delete_where(F.col("k") == 1)   # removes a's MIN → a dirty
    t.append(_df(spark, [(5, "b", 7)]))  # insert inside b's envelope → clean
    v2 = t.snapshot()[0]
    feed = t.row_changes(["k"], since_version=v1, to_version=v2)
    # poison pill: b's rows are ABSENT from the snapshot handed to the
    # maintainer — if the clean path consulted it, b would come out wrong
    snapshot_dirty_only = t.read(v2).filter(F.col("grp") == "a")
    maintained = incremental_minmax(
        view, feed, snapshot_dirty_only, ["grp"], ["v"]
    )
    got = {r.grp: (r.n, r.min_v, r.max_v) for r in maintained.collect()}
    assert got == {"a": (1, 20, 20), "b": (3, 5, 9)}


def test_ivm_minmax_group_born_and_killed_inside_feed(spark, tmp_path):
    """A group created and fully retracted within one feed window (no
    base row, no surviving row) must not resurface, and a group with no
    base row whose feed both inserts and deletes must resolve through
    the rescan (insert-side min alone would be wrong when the deleted
    value was the inserted extremum)."""
    from indra_db_spark.plans.ivm import incremental_minmax

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a", 10)]))
    v1 = t.snapshot()[0]
    view = grouped_snapshot(t.read(v1), ["grp"], minmax_cols=["v"])
    t.append(_df(spark, [(2, "x", 1), (3, "x", 9), (4, "y", 2)]))
    t.delete_where(F.col("k").isin(2, 4))  # x loses its min; y emptied
    v2 = t.snapshot()[0]
    feed = t.row_changes(["k"], since_version=v1, to_version=v2)
    maintained = incremental_minmax(
        view, feed, t.read(v2), ["grp"], ["v"]
    )
    got = {r.grp: (r.n, r.min_v, r.max_v) for r in maintained.collect()}
    assert got == {"a": (1, 10, 10), "x": (1, 9, 9)}


def test_ivm_minmax_rejects_unknown_change_types(spark):
    from indra_db_spark.plans.ivm import incremental_minmax

    base = grouped_snapshot(
        _df(spark, [(1, "a", 1)]), ["grp"], minmax_cols=["v"]
    )
    bad = _df(spark, [(2, "a", 2)]).withColumn(
        "_change_type", F.lit("upsert")
    )
    with pytest.raises(ValueError, match="CDF row types"):
        incremental_minmax(
            base, bad, _df(spark, [(1, "a", 1)]), ["grp"], ["v"]
        ).collect()
