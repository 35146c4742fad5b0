"""Service-layer latency harness — the reference's REST benchmarker analog
(reference: benchmarker/util.py:21-54 run_test: per-test mean/σ over
num_runs; benchmarker/cli.py:57-129 corpus selection).

Runs a corpus of representative API calls (get_hashes / get_statements /
interactions grains / mesh_ref_counts) against the fixture readonly lake and
prints ONE JSON line::

    {"metric": "service_latency", "runs": N,
     "tests": {name: {"mean_s": m, "std_s": s, "passed": 1.0}}, ...}

Usage:  PYTHONPATH=. python tools/service_bench.py [num_runs]
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def _corpus(lake):
    from indra_db_spark.plans.queries import (
        HasAgent,
        HasDatabases,
        HasType,
    )
    from indra_db_spark.plans.shaping import (
        get_agents,
        get_hashes,
        get_interactions,
        get_mesh_ref_counts,
        get_relations,
        get_statements,
    )

    q_agent = HasAgent("MEK")
    q_mixed = HasAgent("ERK") & HasType(["Phosphorylation", "Activation"])
    q_db = HasDatabases()

    def drain(df):
        df.collect()

    return {
        "hashes_by_agent": lambda: drain(get_hashes(q_agent, lake, limit=100)),
        "hashes_mixed": lambda: drain(get_hashes(q_mixed, lake, limit=100)),
        "statements_ev10": lambda: get_statements(
            q_agent, lake, limit=50, ev_limit=10
        ),
        "statements_sorted_belief": lambda: get_statements(
            q_db, lake, limit=50, ev_limit=5, sort_by="belief"
        ),
        "interactions": lambda: drain(get_interactions(q_agent, lake, limit=50)),
        "relations": lambda: drain(get_relations(q_agent, lake, limit=50)),
        "agents": lambda: drain(get_agents(q_agent, lake, limit=50)[0]),
        "mesh_ref_counts": lambda: drain(
            get_mesh_ref_counts(q_agent, lake, ["D000818", "D001234"])
        ),
    }


def main() -> None:
    num_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from indra_db_spark.plans.fixtures import fixture_lake
    from indra_db_spark.session import get_spark

    spark = get_spark("service-bench")
    lake, _, _ = fixture_lake(spark)

    results: dict[str, dict] = {}
    for name, fn in _corpus(lake).items():
        times, ok = [], 0
        for _ in range(num_runs):
            t0 = time.monotonic()
            try:
                fn()
                ok += 1
            except Exception:  # noqa: BLE001 — report, don't abort the suite
                pass
            times.append(time.monotonic() - t0)
        results[name] = {
            "mean_s": round(statistics.mean(times), 3),
            "std_s": round(statistics.pstdev(times), 3),
            "passed": ok / num_runs,
        }

    print(
        json.dumps(
            {"metric": "service_latency", "runs": num_runs, "tests": results}
        )
    )


if __name__ == "__main__":
    main()
