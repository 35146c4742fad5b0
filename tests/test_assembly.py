"""Assembly-DAG tests.

The centerpiece is the round trip: principal-side fixtures (with stale-
reading distractors) -> build_readonly -> must reproduce the directly-built
readonly fixture lake table by table (the reference's snapshot-diff gate,
readonly_dumping/util.py:175-271, made exact).  Mesh-chain tables are
checked against an independent in-test Python oracle because principal mesh
is paper-attached while the readonly fixture attaches it per statement.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from indra_db_spark.assembly import (
    belief_scores,
    build_readonly,
    distill_readings,
    refinement_pairs,
)
from indra_db_spark.plans.fixtures import (
    READERS,
    build_principal_tables,
    build_tables,
    generate_model,
)
from indra_db_spark.schemas import BELIEF_SCHEMA, PRINCIPAL_SCHEMAS


def _canon(v):
    if isinstance(v, dict):
        return frozenset(v.items())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if isinstance(v, float):
        return round(v, 5)
    return v


def _rows(df, cols):
    return Counter(
        tuple(_canon(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


def _expected(rows, cols):
    return Counter(tuple(_canon(r.get(c)) for c in cols) for r in rows)


@pytest.fixture(scope="module")
def model():
    return generate_model(seed=42)


@pytest.fixture(scope="module")
def readonly_built(spark, model):
    stmts, papers = model
    principal_rows = build_principal_tables(stmts, papers, seed=42)
    principal = {
        name: spark.createDataFrame(rows, PRINCIPAL_SCHEMAS[name])
        for name, rows in principal_rows.items()
    }
    belief = spark.createDataFrame(
        [{"mk_hash": s.mk_hash, "belief": s.belief} for s in stmts],
        BELIEF_SCHEMA,
    )
    built = build_readonly(principal, belief=belief)
    return built, build_tables(stmts, papers), principal_rows


TABLE_COLS = {
    "raw_stmt_src": ["sid", "src"],
    "evidence_counts": ["mk_hash", "ev_count"],
    "pa_agent_counts": ["mk_hash", "agent_count"],
    "fast_raw_pa_link": [
        "id", "raw_json", "reading_id", "db_info_id", "mk_hash", "pa_json",
        "type_num", "src",
    ],
    "reading_ref_link": [
        "trid", "pmid", "pmid_num", "pmcid", "pmcid_num", "doi", "doi_id",
        "tcid", "source", "rid", "reader",
    ],
    "source_meta": [
        "mk_hash", "src_json", "only_src", "num_srcs", "has_rd", "has_db",
        "ev_count", "belief", "type_num", "activity", "is_active",
        "agent_count",
    ],
    "name_meta": [
        "ag_num", "db_id", "role_num", "mk_hash", "is_complex_dup",
        "type_num", "ev_count", "belief", "activity", "is_active",
        "agent_count",
    ],
    "text_meta": None,  # same as name_meta
    "other_meta": None,  # name_meta + db_name
    "agent_interactions": [
        "mk_hash", "agent_json", "src_json", "is_complex_dup", "ev_count",
        "belief", "type_num", "activity", "is_active", "agent_count",
    ],
}
TABLE_COLS["text_meta"] = TABLE_COLS["name_meta"]
TABLE_COLS["other_meta"] = TABLE_COLS["name_meta"] + ["db_name"]


@pytest.mark.parametrize("table", [t for t in TABLE_COLS])
def test_round_trip_table(readonly_built, table):
    built, expected_tables, _ = readonly_built
    cols = TABLE_COLS[table]
    got = _rows(built[table], cols)
    want = _expected(expected_tables[table], cols)
    assert got == want, (
        f"{table}: {len(got - want)} unexpected, {len(want - got)} missing"
    )


# ---------------------------------------------------------------- mesh chain


def _mesh_oracle(principal_rows, model):
    """Independent recomputation of the mesh chain from principal rows."""
    stmts, papers = model
    pmid_of_trid = {p.trid: int(p.pmid) for p in papers}
    # distill: keep highest reader_version per (text_ref, reader)
    best = {}
    for r in principal_rows["reading"]:
        trid = r["text_content_id"] // 10
        key = (trid, r["reader"])
        if key not in best or r["reader_version"] > best[key]["reader_version"]:
            best[key] = r
    kept_rids = {r["rid"] for r in best.values()}

    mesh_of_pmid: dict[int, set] = {}
    for a in principal_rows["mesh_ref_annotations"]:
        mesh_of_pmid.setdefault(a["pmid_num"], set()).add(
            (a["mesh_num"], a["is_concept"])
        )

    sid_mesh = set()
    sid_hash_pmid = []
    for rs in principal_rows["raw_statements"]:
        if rs["reading_id"] not in kept_rids:
            continue
        reading = next(
            r for r in principal_rows["reading"] if r["rid"] == rs["reading_id"]
        )
        pmid = pmid_of_trid[reading["text_content_id"] // 10]
        sid_hash_pmid.append((rs["sid"], rs["mk_hash"], pmid))
        for mesh_num, is_concept in mesh_of_pmid.get(pmid, ()):
            sid_mesh.add((rs["sid"], mesh_num, is_concept))
    return kept_rids, sid_mesh, sid_hash_pmid


def test_raw_stmt_mesh_and_meta(readonly_built, model):
    built, _, principal_rows = readonly_built
    _, sid_mesh, sid_hash_pmid = _mesh_oracle(principal_rows, model)

    got_terms = _rows(built["raw_stmt_mesh_terms"], ["sid", "mesh_num"])
    want_terms = Counter(
        (s, m) for s, m, c in sid_mesh if not c
    )
    assert got_terms == want_terms

    got_concepts = _rows(built["raw_stmt_mesh_concepts"], ["sid", "mesh_num"])
    want_concepts = Counter((s, m) for s, m, c in sid_mesh if c)
    assert got_concepts == want_concepts

    hash_of_sid = {s: h for s, h, _ in sid_hash_pmid}
    want_meta = {
        (hash_of_sid[s], m) for s, m, c in sid_mesh if not c and s in hash_of_sid
    }
    got_meta = set(
        (r.mk_hash, r.mesh_num)
        for r in built["mesh_term_meta"].select("mk_hash", "mesh_num").collect()
    )
    assert got_meta == want_meta


def test_mesh_ref_counts(readonly_built, model):
    built, _, principal_rows = readonly_built
    _, sid_mesh, sid_hash_pmid = _mesh_oracle(principal_rows, model)
    pmid_of_sid = {s: p for s, _, p in sid_hash_pmid}
    hash_of_sid = {s: h for s, h, _ in sid_hash_pmid}

    want_pmids: dict[int, set] = {}
    for s, h, p in sid_hash_pmid:
        want_pmids.setdefault(h, set()).add(p)
    want_ref: dict[tuple, set] = {}
    for s, m, c in sid_mesh:
        if c or s not in hash_of_sid:
            continue
        want_ref.setdefault((hash_of_sid[s], m), set()).add(pmid_of_sid[s])

    got = {
        (r.mk_hash, r.mesh_num): (r.ref_count, r.pmid_count)
        for r in built["mesh_term_ref_counts"].collect()
    }
    want = {
        k: (len(v), len(want_pmids[k[0]])) for k, v in want_ref.items()
    }
    assert got == want


# ------------------------------------------------------------------- distill


def test_distill_prefers_fulltext_and_newest_version(spark):
    content = spark.createDataFrame(
        [
            (10, 1, "pubmed", "text", "abstract", False),
            (11, 1, "pmc_oa", "xml", "fulltext", False),
        ],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [
            (100, 10, "reach", "1.0", 1),
            (101, 10, "reach", "2.0", 1),
            (102, 11, "reach", "1.0", 1),
            (103, 11, "reach", "2.0", 1),
            (104, 10, "sparser", "3.0", 1),
        ],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {r.rid for r in distill_readings(content, reading).collect()}
    # reach: fulltext (pmc_oa) at newest version beats every abstract read;
    # sparser only read the abstract, its newest stays
    assert kept == {103, 104}


def test_distill_version_priority_map_beats_lexicographic(spark):
    # export_assembly.py:185-189 ranks by the reader_versions registry index;
    # '10.0' is newer than '2.0' though lexicographically smaller
    content = spark.createDataFrame(
        [(10, 1, "pubmed", "text", "abstract", False)],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [(100, 10, "reach", "2.0", 1), (101, 10, "reach", "10.0", 1)],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {
        r.rid
        for r in distill_readings(
            content, reading, version_priority={"reach": ["2.0", "10.0"]}
        ).collect()
    }
    assert kept == {101}
    # without the map, lexicographic ordering picks '2.0'
    kept_lex = {r.rid for r in distill_readings(content, reading).collect()}
    assert kept_lex == {100}


def test_distill_keeps_abstract_and_title_without_fulltext(spark):
    # export_assembly.py:204-214 — no fulltext: the abstract does not include
    # the title, so BOTH survive
    content = spark.createDataFrame(
        [
            (10, 1, "pubmed", "text", "abstract", False),
            (11, 1, "pubmed", "text", "title", False),
        ],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [(100, 10, "reach", "1.0", 1), (101, 11, "reach", "1.0", 1)],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {r.rid for r in distill_readings(content, reading).collect()}
    assert kept == {100, 101}


def test_distill_cord19_abstract_supersedes_pubmed(spark):
    # export_assembly.py:209-214 — a cord19 abstract includes the title, so
    # it drops the pubmed abstract AND title
    content = spark.createDataFrame(
        [
            (10, 1, "pubmed", "text", "abstract", False),
            (11, 1, "pubmed", "text", "title", False),
            (12, 1, "cord19_abstract", "text", "abstract", False),
        ],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [
            (100, 10, "reach", "1.0", 1),
            (101, 11, "reach", "1.0", 1),
            (102, 12, "reach", "1.0", 1),
        ],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {r.rid for r in distill_readings(content, reading).collect()}
    assert kept == {102}


def test_distill_unknown_fulltext_source_beats_abstract(spark):
    # any text_type='fulltext' outranks non-fulltext even when the source is
    # absent from FULLTEXT_PRIORITY
    content = spark.createDataFrame(
        [
            (10, 1, "pubmed", "text", "abstract", False),
            (11, 1, "mystery_archive", "xml", "fulltext", False),
        ],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [(100, 10, "reach", "1.0", 1), (101, 11, "reach", "1.0", 1)],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {r.rid for r in distill_readings(content, reading).collect()}
    assert kept == {101}


def test_distill_fulltext_priority_order(spark):
    # export_assembly.py:218-227 order (reversed sort): pmc_oa > manuscripts
    # > cord19_pmc_xml > elsevier > cord19_pdf > xdd-biorxiv > xdd > xdd-pubmed
    content = spark.createDataFrame(
        [
            (10, 1, "elsevier", "xml", "fulltext", False),
            (11, 1, "cord19_pmc_xml", "xml", "fulltext", False),
            (12, 1, "xdd", "xml", "fulltext", False),
        ],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [
            (100, 10, "reach", "1.0", 1),
            (101, 11, "reach", "1.0", 1),
            (102, 12, "reach", "1.0", 1),
        ],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {r.rid for r in distill_readings(content, reading).collect()}
    assert kept == {101}


# ---------------------------------------------------------------- refinement


def test_refinement_pairs(spark):
    pa_statements = spark.createDataFrame(
        [
            (1, "k1", "Phosphorylation", b""),
            (2, "k2", "Phosphorylation", b""),
            (3, "k3", "Activation", b""),
            (4, "k4", "Phosphorylation", b""),
        ],
        PRINCIPAL_SCHEMAS["pa_statements"],
    )
    pa_agents = spark.createDataFrame(
        [
            (1, 0, "NAME", "MEK", -1), (1, 1, "NAME", "ERK", 1),
            (2, 0, "NAME", "MEK", -1), (2, 1, "NAME", "MAPK", 1),
            (3, 0, "NAME", "MEK", -1), (3, 1, "NAME", "MAPK", 1),
            (4, 0, "NAME", "RAF", -1), (4, 1, "NAME", "MAPK", 1),
        ],
        PRINCIPAL_SCHEMAS["pa_agents"],
    )
    ontology = spark.createDataFrame(
        [("ERK", "MAPK")], "child string, parent string"
    )
    got = {
        (r.supporting_mk_hash, r.supported_mk_hash)
        for r in refinement_pairs(pa_statements, pa_agents, ontology).collect()
    }
    # 1 (MEK→ERK) refines 2 (MEK→MAPK); type blocks exclude 3; agent
    # mismatch excludes 4; nothing refines itself or goes backwards
    assert got == {(1, 2)}


# -------------------------------------------------------------------- belief


def test_belief_scores_closed_form(spark):
    counts = spark.createDataFrame(
        [(1, "reach", 2), (2, "reach", 1), (3, "signor", 1)],
        "mk_hash long, src string, n long",
    )
    links = spark.createDataFrame(
        [(2, 1)], "supporting_mk_hash long, supported_mk_hash long"
    )
    got = {
        r.mk_hash: r.belief for r in belief_scores(counts, links).collect()
    }
    # hash 1 inherits hash 2's evidence: n_reach = 3
    assert math.isclose(
        got[1], 1 - (0.05 + 0.95 * 0.35**3), rel_tol=1e-6
    )
    assert math.isclose(
        got[2], 1 - (0.05 + 0.95 * 0.35), rel_tol=1e-6
    )
    assert math.isclose(
        got[3], 1 - (0.05 + 0.95 * 0.35), rel_tol=1e-6
    )


def test_belief_on_fixture_refinements(spark, model):
    """End-to-end: refinement pairs from the fixture PA tables feed belief;
    every score is a valid probability and supporters only raise belief."""
    stmts, papers = model
    principal_rows = build_principal_tables(stmts, papers, seed=42)
    pa_statements = spark.createDataFrame(
        principal_rows["pa_statements"], PRINCIPAL_SCHEMAS["pa_statements"]
    )
    pa_agents = spark.createDataFrame(
        principal_rows["pa_agents"], PRINCIPAL_SCHEMAS["pa_agents"]
    )
    ontology = spark.createDataFrame(
        [("ERK", "MAPK")], "child string, parent string"
    )
    links = refinement_pairs(pa_statements, pa_agents, ontology)
    counts = spark.createDataFrame(
        [
            {"mk_hash": s.mk_hash, "src": src, "n": n}
            for s in stmts
            for src, n in s.src_counts.items()
        ],
        "mk_hash long, src string, n long",
    )
    scores = {r.mk_hash: r.belief for r in belief_scores(counts, links).collect()}
    assert len(scores) == len(stmts)
    assert all(0.0 < b < 1.0 for b in scores.values())

    # supported statements (with inherited evidence) score at least as high
    # as their own-evidence-only belief
    own_only = {
        r.mk_hash: r.belief
        for r in belief_scores(
            counts, links.filter(F.lit(False))
        ).collect()
    }
    for r in links.collect():
        assert scores[r.supported_mk_hash] >= own_only[r.supported_mk_hash] - 1e-6


# ------------------------------------------------------------------ snapshot


def test_snapshot_diff(readonly_built, spark):
    from indra_db_spark.assembly.snapshot import diff_snapshots, snapshot

    built, _, _ = readonly_built
    snap = snapshot({"source_meta": built["source_meta"]})
    assert diff_snapshots(snap, snap) == []

    drifted = {
        "source_meta": {
            "columns": snap["source_meta"]["columns"][:-1],
            "rows": snap["source_meta"]["rows"] + 5,
        }
    }
    problems = diff_snapshots(snap, drifted)
    assert any("schema drift" in p for p in problems)
    assert any("rows" in p for p in problems)
    assert diff_snapshots(snap, {}) == ["missing table: source_meta"]


def test_distill_unlisted_reader_falls_back_to_lexicographic(spark):
    # a version_priority naming only reach must not collapse OTHER readers'
    # version ordering to rid order (regression: unlisted pairs all ranked
    # -1, keeping the superseded version)
    content = spark.createDataFrame(
        [(10, 1, "pubmed", "text", "abstract", False)],
        PRINCIPAL_SCHEMAS["text_content"],
    )
    reading = spark.createDataFrame(
        [(100, 10, "medscan", "1.0", 1), (101, 10, "medscan", "2.0", 1)],
        PRINCIPAL_SCHEMAS["reading"],
    )
    kept = {
        r.rid
        for r in distill_readings(
            content, reading, version_priority={"reach": ["1.0", "2.0"]}
        ).collect()
    }
    assert kept == {101}  # lexicographically newest survives


def test_grounding_map_rewrites_agent_groundings(spark):
    # regression: renaming only stmt['agents'] desynchronized the hash/JSON
    # from the pa_agents rows built from agent_groundings
    import json as _json

    from indra_db_spark.assembly.preprocess import preprocess_statements

    stmt = {
        "id": "u1",
        "type": "Activation",
        "agents": ["MEK", "ERK"],
        "agent_groundings": [{"NAME": "MEK"}, {"NAME": "ERK"}],
        "evidence": {"source_api": "reach"},
    }
    raw = spark.createDataFrame(
        [(1, _json.dumps(stmt).encode())], "sid long, json binary"
    )
    out = preprocess_statements(raw, grounding_map={"MEK": "MAP2K1"}).collect()
    got = _json.loads(bytes(out[0]["json"]).decode())
    assert got["agents"] == ["MAP2K1", "ERK"]
    assert got["agent_groundings"][0]["NAME"] == "MAP2K1"


def test_raw_stmt_src_counts_dual_id_row_once(spark):
    from indra_db_spark.assembly.readonly import build_raw_stmt_src

    raws = spark.createDataFrame(
        [(1, 100, 5), (2, 100, None), (3, None, 5)],
        "sid long, reading_id long, db_info_id int",
    )
    reading = spark.createDataFrame(
        [(100, 1, "REACH", "1.0", 1)], PRINCIPAL_SCHEMAS["reading"]
    )
    db_info = spark.createDataFrame(
        [(5, "signor", "SIGNOR")], "id int, db_name string, db_full_name string"
    )
    out = sorted(
        (r.sid, r.src) for r in build_raw_stmt_src(raws, reading, db_info).collect()
    )
    # sid 1 has BOTH ids -> database-sourced once (branch-split priority)
    assert out == [(1, "signor"), (2, "reach"), (3, "signor")]
