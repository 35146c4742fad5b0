"""Time a subset of catalog entries exactly the way bench.py does (same
session factory, same warmup, noop sink, 1 cold + N_STEADY timed runs,
min/mean) — for before/after comparisons during an optimization round
without paying for the full headline list.

    PYTHONPATH=. python tools/time_subset.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from indra_db_spark import catalog
    from indra_db_spark.session import get_spark

    spark = get_spark("time-subset")
    for tbl in (
        "lineitem", "orders", "part", "customer", "supplier", "nation",
        "region", "events", "documents", "embeddings",
    ):
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).count()
    from pyspark.sql import functions as F

    warm = spark.range(100_000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    warm.groupBy("k").agg(F.sum("v")).join(
        F.broadcast(warm.limit(10).select("k")), "k"
    ).write.mode("overwrite").format("noop").save()
    spark.sparkContext.setLogLevel("FATAL")

    out = {}
    for name in names:
        fn, _ = catalog.REGISTRY[name]

        def _drain():
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

        t0 = time.monotonic()
        _drain()
        cold = time.monotonic() - t0
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            _drain()
            runs.append(time.monotonic() - t0)
        out[name] = {
            "min": round(min(runs), 3),
            "mean": round(sum(runs) / 3, 3),
            "cold": round(cold, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"subset_total_min": round(sum(v["min"] for v in out.values()), 3)}))


if __name__ == "__main__":
    main()
