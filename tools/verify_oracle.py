"""Local mirror of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle, compare row count, column names, and values
(order-insensitive, column-name-sorted).  Usage:

    PYTHONPATH=. python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    from indra_db_spark import catalog
    from indra_db_spark.testing import compare_frames, duckdb_con

    # deliberately a VANILLA session (not session.get_spark): the external
    # harness builds its own, so every query must be self-sufficient —
    # load_table sets the dynamic confs it needs at read time
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("verify-oracle")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb_con(sf_dir)

    failures = 0
    for name, (fn, sql) in catalog.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        t_spark = time.monotonic() - t0
        if sql is None:
            print(f"SKIP {name}: no oracle (rows={len(sdf)}, {t_spark:.1f}s)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare_frames(sdf, odf)
        real = [p for p in problems if not p.startswith("WARN")]
        tag = "FAIL" if real else ("WARN" if problems else "OK  ")
        failures += bool(real)
        print(f"{tag} {name}: rows={len(sdf)} ({t_spark:.1f}s) {'; '.join(problems)}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
