"""Local mirror of the driver's correctness gate: run every catalog query on
Spark AND its DuckDB oracle, compare row count, column names, and values
(order-insensitive, column-name-sorted).  Empty results are HARD failures
unless the entry opted into catalog.ALLOW_EMPTY (r6 verdict: a vacuous
empty-vs-empty pass must never read as green).  Usage:

    PYTHONPATH=. python tools/verify_oracle.py [sf_dir] [query ...]
    PYTHONPATH=. python tools/verify_oracle.py --all-sf [out.json] [query ...]

``--all-sf`` sweeps EVERY entry at sf0.001, sf0.01 AND sf0.1 and writes a
machine-readable report (default ORACLE_SWEEP.json) so scale-dependent
selectivity collapse can never hide past the default sf again.
"""

from __future__ import annotations

import json
import os
import sys
import time

ALL_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _run_one(spark, con, sf_dir, name, fn, sql, allow_empty) -> dict:
    from indra_db_spark.testing import compare_frames

    t0 = time.monotonic()
    try:
        sdf = fn(spark, sf_dir).toPandas()
    except Exception as e:
        return {"status": "FAIL", "rows": None, "secs": None,
                "problems": [f"spark error: {e}"]}
    secs = round(time.monotonic() - t0, 1)
    if sql is None:
        status = "SKIP" if len(sdf) > 0 or allow_empty else "FAIL"
        probs = [] if status == "SKIP" else ["oracle-less entry returned 0 rows"]
        return {"status": status, "rows": len(sdf), "secs": secs,
                "problems": probs}
    try:
        odf = con.execute(sql).df()
    except Exception as e:
        return {"status": "FAIL", "rows": len(sdf), "secs": secs,
                "problems": [f"duckdb error: {e}"]}
    problems = compare_frames(sdf, odf, allow_empty=allow_empty)
    real = [p for p in problems if not p.startswith("WARN")]
    status = "FAIL" if real else ("WARN" if problems else "OK")
    return {"status": status, "rows": len(sdf), "secs": secs,
            "problems": problems}


def _connect(sf_dir: str):
    from indra_db_spark.testing import duckdb_con

    return duckdb_con(sf_dir)


def _spark():
    from pyspark.sql import SparkSession

    # deliberately a VANILLA session (not session.get_spark): the external
    # harness builds its own, so every query must be self-sufficient —
    # load_table sets the dynamic confs it needs at read time
    return (
        SparkSession.builder.master("local[32]")
        .appName("verify-oracle")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    from indra_db_spark import catalog

    args = sys.argv[1:]
    all_sf = args and args[0] == "--all-sf"
    if all_sf:
        args = args[1:]
        out_path = "ORACLE_SWEEP.json"
        if args and args[0].endswith(".json"):
            out_path, args = args[0], args[1:]
        only = set(args)
        spark = _spark()
        report: dict = {}
        failures = 0
        for sf_dir in ALL_SF_DIRS:
            con = _connect(sf_dir)
            sf_key = sf_dir.rsplit("/", 1)[-1]
            report[sf_key] = {}
            for name, (fn, sql) in catalog.REGISTRY.items():
                if only and name not in only:
                    continue
                res = _run_one(
                    spark, con, sf_dir, name, fn, sql,
                    name in catalog.ALLOW_EMPTY,
                )
                report[sf_key][name] = res
                failures += res["status"] == "FAIL"
                print(f"{res['status']:<4} [{sf_key}] {name}: "
                      f"rows={res['rows']} ({res['secs']}s) "
                      f"{'; '.join(res['problems'])}")
        if only and os.path.exists(out_path):
            # subset runs MERGE into the existing report (scale_probe's
            # convention) instead of clobbering full-sweep coverage
            try:
                with open(out_path) as f:
                    prior = json.load(f).get("results", {})
                for sf_key, rows in report.items():
                    merged = dict(prior.get(sf_key, {}))
                    merged.update(rows)
                    report[sf_key] = merged
            except (OSError, json.JSONDecodeError):
                pass
        summary = {
            "failures": sum(
                r["status"] == "FAIL"
                for per_sf in report.values() for r in per_sf.values()
            ),
            "warns": sum(
                r["status"] == "WARN"
                for per_sf in report.values() for r in per_sf.values()
            ),
            "entries": len(next(iter(report.values()), {})),
            "sf_dirs": ALL_SF_DIRS,
        }
        with open(out_path, "w") as f:
            json.dump({"summary": summary, "results": report}, f, indent=1)
        # exit code and printed count derive from the MERGED report tally
        # (r7 ADVICE): a subset rerun that fixed its own entries but merged
        # over prior failures must still exit nonzero — a driver gating on
        # the exit code and a human reading the report see ONE verdict
        print(
            f"\n{summary['failures']} failures"
            f" ({failures} in this run); report → {out_path}"
        )
        return 1 if summary["failures"] else 0

    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = _spark()
    con = _connect(sf_dir)
    failures = 0
    for name, (fn, sql) in catalog.REGISTRY.items():
        if only and name not in only:
            continue
        res = _run_one(
            spark, con, sf_dir, name, fn, sql, name in catalog.ALLOW_EMPTY
        )
        failures += res["status"] == "FAIL"
        tag = {"OK": "OK  "}.get(res["status"], res["status"])
        print(f"{tag} {name}: rows={res['rows']} ({res['secs']}s) "
              f"{'; '.join(res['problems'])}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
