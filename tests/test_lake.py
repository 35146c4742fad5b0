

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


def test_compact_parquet_rejects_partitioned_layout(spark, tmp_path):
    import pytest

    from indra_db_spark.plans.lake import compact_parquet

    path = str(tmp_path / "part_table")
    spark.range(100).selectExpr("id", "id % 3 AS day").write.partitionBy(
        "day"
    ).parquet(path)
    with pytest.raises(ValueError, match="per partition"):
        compact_parquet(spark, path)
    # original untouched
    assert spark.read.parquet(path).count() == 100
