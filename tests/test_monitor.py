"""Monitoring tests: DataGatherer/DGContext contract, store digestion
(runtimes + per-stage counts, incl. midnight wrap-around), the distributed
stats jobs against a driver-side re-implementation of the reference's
per-row scans (visualization.py:393-428), and the /summary + /monitor
REST routes."""

from __future__ import annotations

import json
from collections import Counter
from datetime import datetime, timezone

import pytest

from indra_db_spark.plans.fixtures import build_principal_tables, generate_model
from indra_db_spark.schemas import PRINCIPAL_SCHEMAS
from indra_db_spark.service.monitor import (
    UNGROUNDED_NS,
    DataGatherer,
    DGContext,
    LocalStageStore,
    belief_distribution,
    digest_store,
    entity_pair_stats,
    evidence_distribution,
    generate_db_stats,
    source_stats,
    stmt_type_distribution,
    text_content_stats,
    unique_stmt_stats,
)


@pytest.fixture(scope="module")
def principal(spark):
    stmts, papers = generate_model(seed=42)
    rows = build_principal_tables(stmts, papers, seed=42)
    dfs = {
        name: spark.createDataFrame(r, PRINCIPAL_SCHEMAS[name])
        for name, r in rows.items()
    }
    return dfs, rows


# ------------------------------------------------------------ data gatherer


def test_data_gatherer_contract(tmp_path):
    store = LocalStageStore(str(tmp_path))
    g = DataGatherer("reading", ["refs", "content"], store=store)
    g.start()
    g.add("refs", 3)
    g.add("content")
    with pytest.raises(ValueError):
        g.add("bogus")
    key = g.dump()
    assert key.endswith(".json") and "/reading_" in key
    blob = store.get(key)
    assert blob["counts"] == {"refs": 3, "content": 1}
    assert blob["error"] is None
    assert blob["timing"]["end"] >= blob["timing"]["start"]
    assert blob["timing"]["dur"] >= 0
    # out of context
    with pytest.raises(RuntimeError):
        g.add("refs")


def test_dg_context_wrap_records_error(tmp_path):
    store = LocalStageStore(str(tmp_path))
    g = DataGatherer("preassembly", ["stmts"], store=store)

    @DGContext.wrap(g, sub_label="flavor1")
    def boom():
        g.add("stmts", 2)
        raise RuntimeError("kaput")

    with pytest.raises(RuntimeError):
        boom()  # error recorded AND propagated (data_gatherer.py:26-27)
    (key,) = store.list()
    assert "/preassembly/flavor1_" in key
    blob = store.get(key)
    assert blob["error"]["type"] == "RuntimeError"
    assert "kaput" in blob["error"]["traceback"]
    assert blob["counts"] == {"stmts": 2}


def _put_run(store, day, label, sub, start_h, dur_h, counts):
    day_ts = (
        datetime.strptime(day, "%Y%m%d").replace(tzinfo=timezone.utc).timestamp()
        * 1000
    )
    key = f"{day}/{label}" + (f"/{sub}" if sub else "") + f"_{int(start_h):02d}0000.json"
    ms = 3600 * 1000
    store.put(
        key,
        {
            # UTC end-to-end: blob day key and timing share the same
            # epoch, so start_h is directly hours since UTC midnight
            "timing": {
                "start": day_ts + start_h * ms,
                "end": day_ts + (start_h + dur_h) * ms,
                "dur": dur_h * ms,
            },
            "counts": counts,
            "error": None,
        },
    )


def test_digest_store_runtimes_and_counts(tmp_path):
    store = LocalStageStore(str(tmp_path))
    _put_run(store, "20260810", "reading", "sparser", 6, 2, {"refs": 10})
    _put_run(store, "20260810", "reading", "reach", 7, 1, {"refs": 4})
    _put_run(store, "20260811", "preassembly", None, 9, 3, {"stmts": 7})
    runtimes, digests = digest_store(store)

    assert [d["day_str"] for d in runtimes] == ["Aug 10 2026", "Aug 11 2026"]
    day0 = runtimes[0]["times"]["reading"]
    assert day0["sparser"] == [[6.0, 8.0]]
    assert sorted(day0["all"]) == [[6.0, 8.0], [7.0, 8.0]]
    assert runtimes[1]["times"]["preassembly"]["all"] == [[9.0, 12.0]]

    assert set(digests) == {"reading", "preassembly"}
    refs = digests["reading"]["refs"]
    assert [n for _, n in refs["total"]] == [14]
    assert [n for _, n in refs["sparser"]] == [10]
    assert [n for _, n in digests["reading"]["jobs"]["total"]] == [2]
    # digests are also written back to the store (api serves them as files)
    assert store.get("runtimes.json") == runtimes
    assert store.get("reading.json") == digests["reading"]


def test_digest_store_midnight_wraparound(tmp_path):
    store = LocalStageStore(str(tmp_path))
    # starts 22:00 on the monitor axis, runs 30h: 22->24 today, 0->24
    # tomorrow, 0->4 the day after (DayStack, data_gatherer.py:236-244)
    _put_run(store, "20260810", "dump", None, 22, 30, {"files": 1})
    _put_run(store, "20260811", "reading", None, 8, 1, {"refs": 1})
    _put_run(store, "20260812", "reading", None, 8, 1, {"refs": 1})
    runtimes, _ = digest_store(store)
    by_day = {d["day_str"]: d["times"] for d in runtimes}
    assert by_day["Aug 10 2026"]["dump"]["all"] == [[22.0, 24.0]]
    assert by_day["Aug 11 2026"]["dump"]["all"] == [[0.0, 24.0]]
    assert by_day["Aug 12 2026"]["dump"]["all"] == [[0.0, 4.0]]


# -------------------------------------------------------------- stats jobs


def test_text_content_stats(spark, principal):
    dfs, rows = principal
    got = {
        r.text_type: r["count"] for r in text_content_stats(dfs["text_content"]).collect()
    }
    want = Counter(
        r["text_type"]
        for r in rows["text_content"]
        if r["text_type"] in ("abstract", "fulltext", "title")
    )
    assert got == dict(want)


def test_unique_stmt_stats_matches_rowwise_scan(spark, principal):
    """Differential: the one-pass Spark aggregation must equal the
    reference's per-statement loop (visualization.py:408-424) re-run
    driver-side on the same rows."""
    dfs, rows = principal
    agents_by_stmt: dict = {}
    for r in rows["pa_agents"]:
        agents_by_stmt.setdefault(r["stmt_mk_hash"], {}).setdefault(
            r["ag_num"], set()
        ).add(r["db_name"])
    want = Counter()
    for r in rows["pa_statements"]:
        want["unique_statement"] += 1
        ags = agents_by_stmt.get(r["mk_hash"], {})
        if not ags:
            continue
        grounded = sum(
            1 for ns_set in ags.values() if ns_set - set(UNGROUNDED_NS)
        )
        if grounded == len(ags):
            want["grounding_full"] += 1
        elif grounded == 0:
            want["grounding_ungrounded"] += 1
        else:
            want["grounding_partial"] += 1
    got = unique_stmt_stats(dfs["pa_statements"], dfs["pa_agents"])
    assert got == {
        "unique_statement": want["unique_statement"],
        "grounding_full": want["grounding_full"],
        "grounding_partial": want["grounding_partial"],
        "grounding_ungrounded": want["grounding_ungrounded"],
    }


def test_source_and_type_distributions(spark, principal):
    from indra_db_spark.assembly.readonly import build_readonly

    dfs, rows = principal
    built = build_readonly(dfs)
    src = source_stats(built["fast_raw_pa_link"]).collect()
    assert sum(r["count"] for r in src) == built["fast_raw_pa_link"].count()
    assert [r["count"] for r in src] == sorted(
        (r["count"] for r in src), reverse=True
    )

    types = stmt_type_distribution(dfs["pa_statements"]).collect()
    want = Counter(r["type"] for r in rows["pa_statements"])
    assert {r["type"]: r["count"] for r in types} == dict(want)

    ev = evidence_distribution(built["evidence_counts"]).collect()
    assert sum(r.num_statements for r in ev) == built["evidence_counts"].count()


def test_belief_distribution_buckets(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, 0.05), (3, 0.55), (4, 1.0), (5, 0.999)],
        "mk_hash long, belief double",
    )
    got = {r.bucket: r["count"] for r in belief_distribution(df, bins=10).collect()}
    # 1.0 clamps into the top bucket instead of creating an 11th
    assert got == {0: 2, 5: 1, 9: 2}


def test_entity_pair_stats_semantics(spark):
    """2-agent statements count one directed pair; Complex counts all
    unordered group combos both ways plus (g,g) for duplicated groups
    (visualization.py:357-374)."""
    pa_statements = spark.createDataFrame(
        [
            (1, "k1", "Phosphorylation", bytearray(b"{}")),
            (2, "k2", "Complex", bytearray(b"{}")),
            (3, "k3", "Activation", bytearray(b"{}")),  # one TEXT-only agent
        ],
        PRINCIPAL_SCHEMAS["pa_statements"],
    )
    ag = [
        # stmt 1: HGNC then CHEBI -> directed (gene, small molecule)
        (1, 0, "HGNC", "1", 0),
        (1, 0, "TEXT", "braf", 0),
        (1, 1, "CHEBI", "C1", 2),
        # stmt 2: Complex of two genes + one chemical
        (2, 0, "HGNC", "1", 1),
        (2, 1, "FPLX", "MEK", 1),
        (2, 2, "CHEBI", "C1", 1),
        # stmt 3: only one grounded agent -> below the 2-agent floor
        (3, 0, "TEXT", "x", 0),
        (3, 1, "HGNC", "2", 2),
    ]
    pa_agents = spark.createDataFrame(
        [
            {"stmt_mk_hash": h, "ag_num": n, "db_name": ns, "db_id": i, "role_num": r}
            for h, n, ns, i, r in ag
        ],
        PRINCIPAL_SCHEMAS["pa_agents"],
    )
    got = {
        (r.source, r.target): r.value
        for r in entity_pair_stats(pa_statements, pa_agents).collect()
    }
    gene, chem = "human gene/protein", "small molecule"
    assert got == {
        (gene, chem): 2,  # stmt1 directed + stmt2 combo
        (chem, gene): 1,  # stmt2 combo reverse
        (gene, gene): 1,  # stmt2 self-pair (two gene-group agents)
    }


def test_generate_db_stats_payload(spark, principal):
    from indra_db_spark.assembly.readonly import build_readonly

    dfs, _ = principal
    built = build_readonly(dfs)
    stats = generate_db_stats(dfs, built)
    assert stats["unique_statement"] > 0
    assert stats["total_evidence"] == built["fast_raw_pa_link"].count()
    assert (
        stats["grounding_full"]
        + stats["grounding_partial"]
        + stats["grounding_ungrounded"]
        <= stats["unique_statement"]
    )
    pct = (
        stats["grounding_full_pct"]
        + stats["grounding_partial_pct"]
        + stats["grounding_ungrounded_pct"]
    )
    assert pct == pytest.approx(100.0)


# -------------------------------------------------------------- REST routes


def test_monitor_rest_routes(spark, tmp_path):
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from indra_db_spark.plans.fixtures import fixture_lake
    from indra_db_spark.service.rest import serve

    store = LocalStageStore(str(tmp_path))
    _put_run(store, "20260810", "reading", "reach", 6, 2, {"refs": 5})
    lake, _, _ = fixture_lake(spark)
    stats = {"unique_statement": 12, "total_evidence": 34}
    server = serve(lake, stats=stats, stage_store=store)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        assert json.load(urlopen(f"{base}/summary/data/stats")) == stats
        stages = json.load(urlopen(f"{base}/monitor/data/liststages"))
        assert stages == {"results": ["reading"]}
        runtime = json.load(urlopen(f"{base}/monitor/data/runtime"))
        assert runtime["results"][0]["times"]["reading"]["reach"] == [[6.0, 8.0]]
        digest = json.load(urlopen(f"{base}/monitor/data/reading"))
        assert [n for _, n in digest["refs"]["total"]] == [5]
        with pytest.raises(HTTPError) as e:
            urlopen(f"{base}/monitor/data/nope")
        assert e.value.code == 404
    finally:
        server.shutdown()


def test_monitor_routes_unmounted_503(spark):
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from indra_db_spark.plans.fixtures import fixture_lake
    from indra_db_spark.service.rest import serve

    lake, _, _ = fixture_lake(spark)
    server = serve(lake)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        for path in ("/summary/data/stats", "/monitor/data/runtime"):
            with pytest.raises(HTTPError) as e:
                urlopen(f"{base}{path}")
            assert e.value.code == 503
    finally:
        server.shutdown()


def test_digest_store_late_evening_run_stays_on_its_day(tmp_path):
    # a 22:00-22:30 UTC run must render as [22.0, 22.5] on its own day —
    # no inverted bar, no phantom next-day segment (the reference's +5
    # offset, correct for its US/Eastern keying, would push this past the
    # 24 h carry threshold under UTC keying)
    store = LocalStageStore(str(tmp_path))
    _put_run(store, "20260810", "reading", "sparser", 22.0, 0.5, {"refs": 1})
    runtimes, _ = digest_store(store)
    (day,) = runtimes
    (pair,) = day["times"]["reading"]["sparser"]
    assert pair == [22.0, 22.5]
    assert len(runtimes) == 1  # nothing carried to a following day


def test_digest_store_carry_lands_on_real_day_across_gaps(tmp_path):
    # run on day 1 crosses midnight; days 2-6 have no blobs; day 7 has one.
    # The overflow must appear on day 2 (its real day), not day 7.
    store = LocalStageStore(str(tmp_path))
    _put_run(store, "20260810", "reading", None, 23.0, 2.0, {"refs": 1})
    _put_run(store, "20260816", "preassembly", None, 9.0, 1.0, {"stmts": 1})
    runtimes, _ = digest_store(store)
    by_day = {d["day_str"]: d["times"] for d in runtimes}
    assert by_day["Aug 10 2026"]["reading"]["all"] == [[23.0, 24.0]]
    assert by_day["Aug 11 2026"]["reading"]["all"] == [[0.0, 1.0]]
    assert "reading" not in by_day["Aug 16 2026"]
    assert set(by_day) == {"Aug 10 2026", "Aug 11 2026", "Aug 16 2026"}
