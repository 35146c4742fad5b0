"""Measure the bucketed-lake serving path against plain parquet on the
join-heavy query-algebra operations (r6 verdict #4): same algebra, same
data, two physical layouts — report per-query Exchange counts and steady
wall time.  Results land in SCALING.md §1b.

Amplification replicates the fixture model with shifted hashes so the join
sides are large enough that layout matters and partition counts are
realistic (each table repartitioned to defaultParallelism before writing,
per the probe discipline — a 1-2-file table measures file layout, not the
operator).

Usage:  PYTHONPATH=. python tools/bucketed_bench.py [factor]
"""

from __future__ import annotations

import sys
import time


def amplified_rows(spark, factor: int):
    """Fixture lake tables with `factor` hash-shifted copies of the model."""
    from pyspark.sql import functions as F

    from indra_db_spark.plans.fixtures import fixture_lake

    lake, _, _ = fixture_lake(spark)
    par = spark.sparkContext.defaultParallelism
    out = {}
    for name, df in lake.tables().items():
        if "mk_hash" in df.columns and factor > 1:
            k = spark.range(factor).select(F.col("id").alias("_k"))
            df = df.crossJoin(k).withColumn(
                "mk_hash",
                F.col("mk_hash") + F.col("_k") * F.lit(1 << 44),
            ).drop("_k")
        out[name] = df.repartition(par)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from pyspark.sql import functions as F  # noqa: F401

    from indra_db_spark.plans.lake import ReadonlyLake
    from indra_db_spark.plans.queries import HasAgent, HasEvidenceBound, HasType
    from indra_db_spark.plans.shaping import get_hashes
    from indra_db_spark.session import get_spark

    spark = get_spark("bucketed-bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    tables = amplified_rows(spark, factor)
    lake = ReadonlyLake(tables)
    import tempfile

    root = tempfile.mkdtemp(prefix="bklake_")
    lake.write_optimized(root, partitions=spark.sparkContext.defaultParallelism)
    plain = ReadonlyLake.from_parquet(spark, root)
    lake.write_bucketed(spark, database="bkbench", buckets=32)
    bucketed = ReadonlyLake.from_bucketed(spark, "bkbench")

    queries = {
        "agent_and_type": HasAgent("MEK", role="SUBJECT")
        & HasType(["Phosphorylation"]),
        "union_minus": (HasAgent("ERK") | HasAgent("RAF")) & ~HasAgent("MEK"),
        "intrusive_bound": HasAgent("MEK") & HasEvidenceBound([">= 1"]),
    }

    def run(lk, q):
        df = get_hashes(q, lk)
        t0 = time.monotonic()
        n = df.count()
        dt = time.monotonic() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        return n, dt, plan.count("Exchange")

    print(f"factor={factor}")
    for name, q in queries.items():
        # warm both paths once, then take min of 3 steady runs
        for lk_name, lk in (("plain", plain), ("bucketed", bucketed)):
            run(lk, q)
            times, exch, rows = [], None, None
            for _ in range(3):
                n, dt, ex = run(lk, q)
                times.append(dt)
                exch, rows = ex, n
            print(
                f"{name:>16} {lk_name:>8}: rows={rows} "
                f"exchanges={exch} t={min(times):.2f}s"
            )
    spark.sql("DROP DATABASE IF EXISTS bkbench CASCADE")
    big_join(spark)


def big_join(spark) -> None:
    """Byte-heavy companion measurement: the fixture lake is KB-scale, so
    the exchange it saves is cheaper than the fixed 32-bucket task fan-out
    — layout only pays when shuffle BYTES dominate.  orders⋈lineitem at
    $SPARK_GRAFT_SF_DIR supplies real bytes: here the bucketed layout
    removes both the two exchanges and the two SMJ sorts."""
    import os
    import tempfile
    import time

    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    root = tempfile.mkdtemp(prefix="bkbig_")
    par = spark.sparkContext.defaultParallelism
    li.repartition(par).write.parquet(os.path.join(root, "li"))
    od.repartition(par).write.parquet(os.path.join(root, "od"))
    spark.sql("CREATE DATABASE IF NOT EXISTS bkbig")
    from indra_db_spark.sources.bucketed import write_bucketed

    write_bucketed(li, "bkbig.li", "l_orderkey", buckets=32,
                   sort_col="l_orderkey")
    write_bucketed(od, "bkbig.od", "o_orderkey", buckets=32,
                   sort_col="o_orderkey")

    def q(li_df, od_df):
        return (
            od_df.join(li_df, od_df.o_orderkey == li_df.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum("l_extendedprice").alias("rev"),
                F.count("*").alias("n"),
            )
        )

    pairs = {
        "plain": (
            spark.read.parquet(os.path.join(root, "li")),
            spark.read.parquet(os.path.join(root, "od")),
        ),
        "bucketed": (spark.table("bkbig.li"), spark.table("bkbig.od")),
    }
    for name, (l, o) in pairs.items():
        df = q(l, o)
        df.count()  # warm
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            df.count()
            times.append(time.monotonic() - t0)
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(
            f"   big_join {name:>8}: exchanges={plan.count('Exchange')} "
            f"sorts={plan.count('Sort')} t={min(times):.2f}s"
        )
    spark.sql("DROP DATABASE IF EXISTS bkbig CASCADE")


if __name__ == "__main__":
    main()
