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
