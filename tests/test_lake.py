

def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path):
    from indra_db_spark.plans.lake import compact_parquet

    path = str(tmp_path / "frag")
    # fragment: 40 tiny files
    spark.range(4000).selectExpr("id", "id % 7 AS k").repartition(
        40
    ).write.parquet(path)
    import glob

    before = len(glob.glob(path + "/*.parquet"))
    assert before >= 30
    stats = compact_parquet(spark, path, target_file_mb=128)
    after_files = glob.glob(path + "/*.parquet")
    assert stats["rows"] == 4000
    assert stats["files_after"] == len(after_files) == 1
    got = spark.read.parquet(path)
    assert got.count() == 4000
    assert got.selectExpr("sum(id)").collect()[0][0] == 4000 * 3999 // 2


def test_compact_parquet_sort_within_restores_locality(spark, tmp_path):
    from indra_db_spark.plans.lake import compact_parquet

    path = str(tmp_path / "frag2")
    spark.range(1000).selectExpr("id", "id % 5 AS k").repartition(
        10
    ).write.parquet(path)
    compact_parquet(spark, path, target_file_mb=128, sort_within=["k"])
    got = spark.read.parquet(path)
    assert got.count() == 1000


def test_compact_parquet_partitioned_preserves_pruning(spark, tmp_path):
    import glob

    from indra_db_spark.plans.lake import compact_parquet

    path = str(tmp_path / "part_table")
    spark.range(3000).selectExpr("id", "id % 3 AS day").repartition(
        10
    ).write.partitionBy("day").parquet(path)
    frag = len(glob.glob(path + "/day=*/*.parquet"))
    assert frag >= 15  # fragmented input, several files per partition
    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["rows"] == 3000
    assert stats["partitions"] == 3
    assert stats["files_after"] == 3  # one file per leaf
    assert len(glob.glob(path + "/day=*/*.parquet")) == 3
    got = spark.read.parquet(path)
    assert got.count() == 3000
    assert sorted(got.columns) == ["day", "id"]
    # the point of per-leaf rewriting: partition pruning must survive
    plan = got.filter("day = 1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    assert got.filter("day = 1").count() == 1000


def test_compact_parquet_rejects_non_hive_subdirs(spark, tmp_path):
    import pytest

    from indra_db_spark.plans.lake import compact_parquet

    path = tmp_path / "weird"
    (path / "not_a_partition").mkdir(parents=True)
    with pytest.raises(ValueError, match="non-hive"):
        compact_parquet(spark, str(path))


def test_compact_parquet_concurrent_writer_fence(spark, tmp_path, monkeypatch):
    import glob

    from indra_db_spark.plans import lake

    path = str(tmp_path / "fenced")
    spark.range(500).repartition(5).write.parquet(path)
    before = sorted(glob.glob(path + "/*.parquet"))

    # a writer lands a new file between the snapshot and the swap — the
    # _pre_fence_hook seam fires at exactly the last instant the fence
    # can still catch it
    def sabotage(dpath):
        spark.range(7).write.mode("append").parquet(path)

    monkeypatch.setattr(lake, "_pre_fence_hook", sabotage)
    import pytest

    with pytest.raises(RuntimeError, match="concurrent writer"):
        lake.compact_parquet(spark, path)
    # fence fired BEFORE any mutation: original files intact, all rows
    # (old + concurrent append) readable
    assert set(before) <= set(glob.glob(path + "/*.parquet"))
    assert spark.read.parquet(path).count() == 507


def test_compact_parquet_manifest_recovery(spark, tmp_path):
    """An interrupted swap (manifest present) is rolled forward/back to a
    consistent dir on the next invocation, then a rerun compacts."""
    import glob

    import pytest

    from indra_db_spark.plans import lake

    path = str(tmp_path / "crashy")
    spark.range(400).repartition(4).write.parquet(path)
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        jsc.hadoopConfiguration()
    )
    names = [
        p.rsplit("/", 1)[1] for p in sorted(glob.glob(path + "/*.parquet"))
    ]
    # simulate a crash BETWEEN manifest write and the file moves: the
    # manifest says two phantom files should appear — none did, so
    # recovery must ROLL BACK (keep the old files, drop the manifest)
    lake._write_manifest(
        fs, jvm, path, {"add": ["part-phantom-a", "part-phantom-b"],
                        "remove": names}
    )
    with pytest.raises(RuntimeError, match="rolled_back"):
        lake.compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == 400
    # simulate a crash AFTER the moves but before cleanup: adds exist,
    # old files listed for removal — recovery ROLLS FORWARD
    stats = lake.compact_parquet(spark, path)  # clean dir now compacts
    assert stats["rows"] == 400
    new_names = [
        p.rsplit("/", 1)[1] for p in glob.glob(path + "/*.parquet")
    ]
    spark.range(9).write.mode("append").parquet(path)
    leftover = [
        p.rsplit("/", 1)[1]
        for p in glob.glob(path + "/*.parquet")
        if p.rsplit("/", 1)[1] not in new_names
    ]
    lake._write_manifest(
        fs, jvm, path, {"add": new_names, "remove": leftover}
    )
    with pytest.raises(RuntimeError, match="rolled_forward"):
        lake.compact_parquet(spark, path)
    assert spark.read.parquet(path).count() == 400  # appended 9 retired
    assert not (tmp_path / "crashy" / lake.MANIFEST_NAME).exists()
