"""Compare two bench.py result files and flag per-query regressions.

Usage::

    python tools/bench_compare.py BENCH_r05.json BENCH_r06.json
    python tools/bench_compare.py --threshold 1.15 old.json new.json

The reference's benchmarker persists per-test timing summaries and
compares stacks run-over-run (reference: benchmarker/util.py:21-146,
mean/σ per corpus test); this is that comparison for the headline-query
bench.  A query is flagged as a REGRESSION when both hold:

- ratio: new_min / old_min > threshold (default 1.2 — inside the band
  shared-machine noise routinely produces, see BENCH_r03 vs r04), and
- significance: the slowdown exceeds 2σ of the new run's steady-state
  spread, when σ is recorded (older BENCH files lack it — then the ratio
  alone decides, which is exactly the ambiguity σ was added to remove).

Prints one JSON line: per-query ratios, flagged regressions and
improvements, and totals over the SHARED query set (round-over-round
totals are meaningless when the headline list grew).  Exits 1 if any
regression is flagged, so the compare can gate CI.
"""

from __future__ import annotations

import argparse
import json
import sys


#: pre-existing 1-min load ÷ cores above this at bench START means the run
#: competed with other work — the exact condition that inflated the r3 and
#: r8 artifacts and twice needed a judge re-run to interpret
LOAD_BAND = 0.25
#: median per-query σ/mean above this marks a run whose steady-state spread
#: is too wide to compare at the default ratio threshold
SPREAD_BAND = 0.10


def run_warnings(side: str, doc: dict) -> list[str]:
    """Machine-condition warnings for ONE bench artifact: taints the
    comparison rather than any single query, so they ride a top-level
    ``warnings`` list instead of the per-query regression flags."""
    out: list[str] = []
    load = doc.get("load_start")
    cpus = doc.get("cpus")
    if load and cpus and load[0] / cpus > LOAD_BAND:
        out.append(
            f"{side}: 1-min loadavg {load[0]} at bench start on {cpus} "
            f"cores (>{LOAD_BAND:.0%} busy) — timings likely inflated by "
            "concurrent work; re-run idle before adjudicating regressions"
        )
    means, sigmas = doc.get("queries_mean", {}), doc.get("queries_sigma", {})
    rels = sorted(
        sigmas[q] / means[q] for q in sigmas if q in means and means[q]
    )
    if rels and rels[len(rels) // 2] > SPREAD_BAND:
        out.append(
            f"{side}: median per-query sigma/mean "
            f"{rels[len(rels) // 2]:.2f} exceeds {SPREAD_BAND} — "
            "steady-state runs are too noisy for the ratio threshold"
        )
    return out


def compare(old: dict, new: dict, threshold: float = 1.2) -> dict:
    oq, nq = old.get("queries", {}), new.get("queries", {})
    nsig = new.get("queries_sigma", {})
    # apples-to-apples statistic selection: when EITHER side only has
    # steady-state means (recovered from the compact summary line), compare
    # mean-vs-mean on both sides if the other side recorded means —
    # mean-vs-min ratios are systematically inflated (mean ≥ min) and
    # would over-flag regressions with no real slowdown
    mean_based = "queries_mean" in {old.get("recovered_from"),
                                    new.get("recovered_from")}
    if mean_based:
        oq = old.get("queries_mean", oq)
        nq = new.get("queries_mean", nq)
    shared = sorted(set(oq) & set(nq))
    ratios: dict[str, float] = {}
    regressions: list[dict] = []
    improvements: list[dict] = []
    for name in shared:
        o, n = oq[name], nq[name]
        if not o:
            continue
        r = round(n / o, 3)
        ratios[name] = r
        sig = nsig.get(name)
        significant = sig is None or (n - o) > 2 * sig
        if r > threshold and significant:
            regressions.append(
                {"query": name, "old": o, "new": n, "ratio": r, "sigma": sig}
            )
        elif r < 1 / threshold:
            improvements.append(
                {"query": name, "old": o, "new": n, "ratio": r}
            )
    tot_old = round(sum(oq[n] for n in shared), 3)
    tot_new = round(sum(nq[n] for n in shared), 3)
    return {
        "shared_queries": len(shared),
        # which statistic each side actually carried: min (full line),
        # mean (compact summary), or cold single-shots (last-resort
        # recovery) — cross-KIND ratios, cold especially, are noisy and
        # systematically ≥ 1; read regressions below with that in mind
        "old_stat": old.get("recovered_from", "queries"),
        "new_stat": new.get("recovered_from", "queries"),
        "only_old": sorted(set(oq) - set(nq)),
        "only_new": sorted(set(nq) - set(oq)),
        "total_old": tot_old,
        "total_new": tot_new,
        "total_ratio": round(tot_new / tot_old, 3) if tot_old else None,
        "threshold": threshold,
        "ratios": ratios,
        "regressions": regressions,
        "improvements": improvements,
        "warnings": run_warnings("old", old) + run_warnings("new", new),
    }


def _merge_serving(doc: dict) -> dict:
    """Fold the txlog ``serving`` group (bench.py round 12) into the
    per-query maps so the SAME ratio/σ machinery diffs it — the serve_*
    names are disjoint from headline names, and the shared-set totals
    ignore entries the other side lacks, so old artifacts without the
    group compare unchanged."""
    for dst, src in (
        ("queries", "serving"),
        ("queries_mean", "serving_mean"),
        ("queries_sigma", "serving_sigma"),
    ):
        extra = doc.get(src)
        if extra and isinstance(doc.get(dst), dict):
            doc[dst] = {**doc[dst], **extra}
        elif extra and dst not in doc:
            doc[dst] = dict(extra)
    return doc


def load_bench(path: str) -> dict:
    return _merge_serving(_load_bench_raw(path))


def _load_bench_raw(path: str) -> dict:
    """Accept bench.py's raw JSON line or the driver's BENCH_r{N} wrapper:
    prefer the wrapper's ``parsed`` metrics when present, then a complete
    metrics line inside ``tail`` — including the compact
    ``headline_queries_summary`` line bench.py prints LAST precisely so it
    survives the driver's ~2 KB tail capture (its ``queries_mean`` map is
    promoted to ``queries``; mean ≥ min, so a mean-vs-mean compare is
    apples-to-apples and a mean-vs-min baseline only UNDER-flags
    regressions) — and finally regex-recover the ``queries``/
    ``queries_sigma`` maps from a FRONT-TRUNCATED tail (the driver caps the
    captured tail, which can cut a metrics line mid-way — BENCH_r06/r07 are
    such files)."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and "queries" in parsed:
        return parsed
    tail = doc.get("tail", "")
    # prefer a surviving COMPLETE metrics line (min-based "queries" map)
    # over the compact summary: the summary exists for when truncation ate
    # the full line, not to displace it
    summary = None
    for line in reversed(tail.splitlines()):
        line = line.strip()
        if not (line.startswith("{") and (
            '"queries"' in line or '"queries_mean"' in line
        )):
            continue
        try:
            got = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" in got:
            return got
        if summary is None and "queries_mean" in got:
            summary = got
    if summary is not None:
        summary["queries"] = summary["queries_mean"]
        summary["recovered_from"] = "queries_mean"
        return summary
    import re

    out: dict = {}
    # fallback order: the min map, then the mean map (when the truncation
    # cut the min map's opener — compare means against mins consciously:
    # mean ≥ min, so an old-mean baseline only UNDER-flags regressions),
    # then the cold single-shot map as the last resort (BENCH_r07's tail
    # kept ONLY sigma+cold: cold ≥ warm numbers, so treat cross-kind
    # ratios as noisy — recovered_from says which kind you got)
    for key in ("queries", "queries_mean", "queries_cold"):
        frag = re.search(r'"%s": \{(.*?)\}' % key, tail)
        if frag:
            out["queries"] = {
                k: float(v)
                for k, v in re.findall(
                    r'"([A-Za-z0-9_]+)": ([0-9.]+)', frag.group(1)
                )
            }
            out["recovered_from"] = key
            break
    frag = re.search(r'"queries_sigma": \{(.*?)\}', tail)
    if frag:
        out["queries_sigma"] = {
            k: float(v)
            for k, v in re.findall(
                r'"([A-Za-z0-9_]+)": ([0-9.]+)', frag.group(1)
            )
        }
    if out.get("queries"):
        return out
    raise SystemExit(f"{path}: no bench metrics line found")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.2)
    args = ap.parse_args()
    old = load_bench(args.old)
    new = load_bench(args.new)
    out = compare(old, new, args.threshold)
    print(json.dumps(out))
    return 1 if out["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
