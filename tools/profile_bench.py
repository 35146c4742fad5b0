"""Per-query profiling harness for the optimization rounds.

For each named catalog entry (default: the bench HEADLINE list), this
drains the query once cold, then once timed inside its own job group, and
attributes the timed run to Spark jobs/stages via the live UI REST API:
wall seconds, job count, stage count, task count, executor run time,
shuffle read/write bytes, and the noop-sink action breakdown.  It also
writes ``plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt`` (default r14) with ``.explain('formatted')`` so
plan-shape claims are checkable without running Spark.

    PYTHONPATH=. python tools/profile_bench.py [--tag before] [--sf DIR] [name ...]

Output: one JSON line per query on stdout + a summary.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    from indra_db_spark import catalog
    from indra_db_spark.session import get_spark

    from bench import HEADLINE

    if not names:
        names = list(HEADLINE)

    spark = get_spark(
        "profile-bench", extra_conf={"spark.ui.enabled": "true"}
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    # warm the same way bench.py does
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

    results = {}
    for name in names:
        fn, _ = catalog.REGISTRY[name]

        def _drain():
            out = fn(spark, sf_dir)
            if out is not None:
                out.write.mode("overwrite").format("noop").save()
            return out

        # cold run (codegen/JIT absorb) — also dump the plan from it
        df = fn(spark, sf_dir)
        if df is not None:
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            df.write.mode("overwrite").format("noop").save()

        # timed run inside a job group
        sc.setJobGroup(name, name)
        t0 = time.monotonic()
        _drain()
        wall = time.monotonic() - t0
        sc.setJobGroup(None, None)

        # attribute via REST
        jobs = _rest(base, "/jobs?status=succeeded")
        mine = [j for j in jobs if j.get("jobGroup") == name]
        stage_ids = sorted(
            {s for j in mine for s in j.get("stageIds", [])}
        )
        n_tasks = 0
        run_ms = 0
        sh_read = 0
        sh_write = 0
        in_bytes = 0
        n_stages = 0
        for sid in stage_ids:
            try:
                infos = _rest(base, f"/stages/{sid}")
            except Exception:
                continue
            for st in infos:
                if st.get("status") != "COMPLETE":
                    continue
                n_stages += 1
                n_tasks += st.get("numCompleteTasks", 0)
                run_ms += st.get("executorRunTime", 0)
                sh_read += st.get("shuffleReadBytes", 0)
                sh_write += st.get("shuffleWriteBytes", 0)
                in_bytes += st.get("inputBytes", 0)
        results[name] = {
            "wall": round(wall, 3),
            "jobs": len(mine),
            "stages": n_stages,
            "tasks": n_tasks,
            "exec_run_s": round(run_ms / 1000.0, 3),
            "shuffle_read_mb": round(sh_read / 1e6, 2),
            "shuffle_write_mb": round(sh_write / 1e6, 2),
            "input_mb": round(in_bytes / 1e6, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)

    total = round(sum(r["wall"] for r in results.values()), 3)
    print(
        json.dumps(
            {"metric": "profile_total", "value": total, "tag": tag,
             "results": results}
        )
    )


if __name__ == "__main__":
    main()
