"""One-off: run one catalog entry and dump per-stage executor time,
descending — for attributing residual core-seconds within a query.

    PYTHONPATH=. python tools/stage_attr.py NAME [N_RUNS]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from indra_db_spark import catalog
    from indra_db_spark.session import get_spark

    spark = get_spark("stage-attr", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    for tbl in ("events", "documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet")).count()
    spark.sparkContext.setLogLevel("FATAL")

    fn, _ = catalog.REGISTRY[name]

    def _drain():
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    _drain()  # cold
    for run in range(n_runs):
        sc.setJobGroup(f"{name}#{run}", name)
        t0 = time.monotonic()
        _drain()
        wall = time.monotonic() - t0
        sc.setJobGroup(None, None)

        with urllib.request.urlopen(base + "/jobs?status=succeeded", timeout=30) as r:
            jobs = json.loads(r.read())
        mine = [j for j in jobs if j.get("jobGroup") == f"{name}#{run}"]
        rows = []
        for j in mine:
            for sid in j.get("stageIds", []):
                try:
                    with urllib.request.urlopen(base + f"/stages/{sid}", timeout=30) as r:
                        infos = json.loads(r.read())
                except Exception:
                    continue
                for st in infos:
                    if st.get("status") != "COMPLETE":
                        continue
                    rows.append({
                        "job": j["jobId"],
                        "stage": sid,
                        "tasks": st.get("numCompleteTasks"),
                        "run_ms": st.get("executorRunTime"),
                        "cpu_ms": round(st.get("executorCpuTime", 0) / 1e6),
                        "in_mb": round(st.get("inputBytes", 0) / 1e6, 2),
                        "sh_r_mb": round(st.get("shuffleReadBytes", 0) / 1e6, 2),
                        "sh_w_mb": round(st.get("shuffleWriteBytes", 0) / 1e6, 2),
                        "name": (st.get("name") or "")[:70],
                        "desc": (st.get("description") or "")[:50],
                    })
        rows.sort(key=lambda r: -(r["run_ms"] or 0))
        print(f"=== run {run}: wall {wall:.2f}s, {len(mine)} jobs, "
              f"{sum(r['run_ms'] for r in rows)/1000:.2f} exec-s ===")
        for r in rows:
            print(json.dumps(r))


if __name__ == "__main__":
    main()
