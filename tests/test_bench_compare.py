"""tools/bench_compare.py unit coverage — statistic selection, regression
flags, and the machine-condition warning bands (r8 verdict #3: two rounds
of bench adjudication needed a judge re-run to tell load pollution from a
real regression; the warnings make the artifact self-describing)."""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from tools.bench_compare import compare, load_bench, run_warnings


def _doc(queries, sigma=None, **extra):
    d = {"queries": queries, "queries_mean": queries}
    if sigma is not None:
        d["queries_sigma"] = sigma
    d.update(extra)
    return d


def test_regression_flagged_and_sigma_gates():
    old = _doc({"q1": 1.0, "q2": 2.0})
    new = _doc({"q1": 1.5, "q2": 2.1}, sigma={"q1": 0.01, "q2": 0.01})
    out = compare(old, new)
    assert [r["query"] for r in out["regressions"]] == ["q1"]
    # a slowdown inside 2σ of the new run's spread is NOT flagged
    noisy = _doc({"q1": 1.5, "q2": 2.1}, sigma={"q1": 0.4, "q2": 0.01})
    assert compare(old, noisy)["regressions"] == []


def test_warn_on_busy_machine_at_start():
    busy = _doc({"q1": 1.0}, load_start=[9.0, 4.0, 1.0], cpus=32)
    idle = _doc({"q1": 1.0}, load_start=[0.2, 0.1, 0.0], cpus=32)
    assert any("loadavg" in w for w in run_warnings("new", busy))
    assert run_warnings("new", idle) == []
    out = compare(idle, busy)
    assert any(w.startswith("new:") and "loadavg" in w
               for w in out["warnings"])


def test_warn_on_wide_steady_state_spread():
    wide = _doc(
        {"q1": 1.0, "q2": 1.0, "q3": 1.0},
        sigma={"q1": 0.2, "q2": 0.25, "q3": 0.3},
    )
    tight = _doc(
        {"q1": 1.0, "q2": 1.0, "q3": 1.0},
        sigma={"q1": 0.01, "q2": 0.02, "q3": 0.01},
    )
    assert any("sigma/mean" in w for w in run_warnings("old", wide))
    assert run_warnings("old", tight) == []


def test_legacy_artifact_without_load_fields_warns_nothing():
    legacy = _doc({"q1": 1.0})
    assert run_warnings("old", legacy) == []
    assert compare(legacy, legacy)["warnings"] == []


def test_load_bench_accepts_wrapper_tail_with_env(tmp_path):
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 1.0,
            "unit": "sec",
            "queries": {"q1": 1.0},
            "queries_mean": {"q1": 1.1},
            "queries_sigma": {"q1": 0.05},
            "load_start": [0.1, 0.1, 0.1],
            "load_end": [30.0, 12.0, 4.0],
            "cpus": 32,
            "sf": 0.1,
        }
    )
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({"tail": "noise\n" + line + "\n"}))
    doc = load_bench(str(p))
    assert doc["queries"] == {"q1": 1.0}
    assert doc["load_start"] == [0.1, 0.1, 0.1] and doc["cpus"] == 32
    # end-of-run load is dominated by the bench's own local[*] work and
    # must not trip the warning band on its own
    assert run_warnings("new", doc) == []
