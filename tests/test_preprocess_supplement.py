"""Preprocess (repair/validate/ground/rehash) and incremental-supplement
tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from indra_db_spark.assembly.preprocess import (
    clean_json_loads,
    compute_mk_hash,
    dedup_statements,
    preprocess_statements,
    validate_statement_semantics,
)
from indra_db_spark.assembly.refinement import refinement_pairs
from indra_db_spark.assembly.supplement import supplement_corpus
from indra_db_spark.plans.fixtures import stable_hash
from indra_db_spark.schemas import PRINCIPAL_SCHEMAS


def _raw(sid, stmt, corrupt=False):
    payload = json.dumps(stmt)
    if corrupt:
        payload = payload.replace("\\u", "\\\\u")
    return (sid, f"u{sid}", 1, 0, 0, None, 1, stmt.get("type", ""), payload.encode())


def test_clean_json_and_validation():
    assert clean_json_loads(b'{"a": "\\\\u00e9"}') == {"a": "é"}
    assert clean_json_loads(b"not json") is None
    assert validate_statement_semantics({"type": "Complex", "agents": ["A"]}) is False
    assert validate_statement_semantics({"type": "Complex", "agents": ["A", "B"]})
    assert validate_statement_semantics({"type": "", "agents": ["A"]}) is False
    # agent_groundings must align 1:1 with agents when present
    assert validate_statement_semantics(
        {"type": "Activation", "agents": ["A", "B"],
         "agent_groundings": [{"HGNC": "1"}]}
    ) is False
    assert validate_statement_semantics(
        {"type": "Activation", "agents": ["A", "B"],
         "agent_groundings": [{"HGNC": "1"}, {"HGNC": "2"}]}
    )


def test_preprocess_repairs_grounds_and_rehashes(spark):
    rows = [
        _raw(1, {"type": "Phosphorylation", "agents": ["MEK", "Café"]},
             corrupt=True),
        _raw(2, {"type": "Activation", "agents": ["RAW1", "ERK"]}),
        _raw(3, {"type": "Complex", "agents": ["A"]}),          # invalid
        _raw(4, {"type": "Activation", "agents": []}),           # invalid
    ]
    raw = spark.createDataFrame(rows, PRINCIPAL_SCHEMAS["raw_statements"])
    got = {
        r.sid: r
        for r in preprocess_statements(
            raw, grounding_map={"RAW1": "MAPK1"}
        ).collect()
    }
    assert set(got) == {1, 2}
    # repaired unicode reaches the hash input
    assert got[1].mk_hash == compute_mk_hash(
        {"type": "Phosphorylation", "agents": ["MEK", "Café"]}
    )
    # grounding applied before hashing
    assert got[2].mk_hash == stable_hash("Activation:MAPK1,ERK:None:False")
    assert json.loads(bytes(got[2].json))["agents"] == ["MAPK1", "ERK"]


def test_dedup_statements_keeps_min_sid(spark):
    stmt = {"type": "Activation", "agents": ["A", "B"]}
    rows = [_raw(i, stmt) for i in (5, 3, 9)]
    raw = spark.createDataFrame(rows, PRINCIPAL_SCHEMAS["raw_statements"])
    out = dedup_statements(preprocess_statements(raw)).collect()
    assert len(out) == 1 and out[0].sid == 3


# ------------------------------------------------------------- supplement


@pytest.fixture(scope="module")
def corpus(spark):
    """Old corpus: 2 statements; new batch: 1 duplicate + 2 novel (one of
    which refines an old statement through the ontology)."""
    pa_old = spark.createDataFrame(
        [
            (1, "k1", "Phosphorylation", b""),
            (2, "k2", "Phosphorylation", b""),
        ],
        PRINCIPAL_SCHEMAS["pa_statements"],
    )
    agents = spark.createDataFrame(
        [
            (1, 0, "NAME", "MEK", -1), (1, 1, "NAME", "MAPK", 1),
            (2, 0, "NAME", "RAF", -1), (2, 1, "NAME", "MAPK", 1),
            (3, 0, "NAME", "MEK", -1), (3, 1, "NAME", "ERK", 1),
            (4, 0, "NAME", "MEK", -1), (4, 1, "NAME", "JNK", 1),
        ],
        PRINCIPAL_SCHEMAS["pa_agents"],
    )
    new = spark.createDataFrame(
        [
            (101, 2, "Phosphorylation", b""),   # dup of old hash 2
            (102, 3, "Phosphorylation", b""),   # novel: MEK -> ERK
            (103, 4, "Phosphorylation", b""),   # novel: MEK -> JNK
        ],
        "sid long, mk_hash long, type string, json binary",
    )
    ontology = spark.createDataFrame(
        [("ERK", "MAPK"), ("JNK", "MAPK")], "child string, parent string"
    )
    links_old = refinement_pairs(pa_old, agents, ontology)
    return pa_old, agents, new, ontology, links_old


def test_supplement_matches_full_recompute(spark, corpus):
    pa_old, agents, new, ontology, links_old = corpus
    out = supplement_corpus(pa_old, links_old, agents, new, ontology)

    assert {r.mk_hash for r in out["new_statements"].collect()} == {3, 4}
    got_links = {
        (r.supporting_mk_hash, r.supported_mk_hash)
        for r in out["pa_support_links"].collect()
    }
    full = {
        (r.supporting_mk_hash, r.supported_mk_hash)
        for r in refinement_pairs(
            out["pa_statements"].select(
                "mk_hash", F.col("type"), F.lit("").alias("matches_key"),
                F.lit(b"").alias("json"),
            ).select("mk_hash", "matches_key", "type", "json"),
            agents,
            ontology,
        ).collect()
    }
    assert got_links == full
    # the new statements refine old statement 1 (MEK->ERK/JNK ⊑ MEK->MAPK)
    assert (3, 1) in got_links and (4, 1) in got_links


def test_expand_agent_json(spark):
    from indra_db_spark.plans.fixtures import fixture_lake
    from indra_db_spark.plans.shaping import expand_agent_json

    lake, stmts, _ = fixture_lake(spark)
    rels = expand_agent_json(lake, {"0": "MEK", "1": "ERK"}).collect()
    want_types = {
        s.type_num for s in stmts
        if [a["NAME"] for a in s.agents] == ["MEK", "ERK"]
    }
    assert {r.type_num for r in rels} == want_types and len(rels) == len(want_types)
    inter = expand_agent_json(
        lake, {"0": "MEK", "1": "ERK"}, stmt_type="Phosphorylation"
    ).collect()
    assert len(inter) == 1


def test_refinement_requires_matching_arity(spark):
    """A 2-ary statement must not 'refine' a 3-ary one even when its
    positions all match (review finding: gen-side arity check)."""
    pa_statements = spark.createDataFrame(
        [(1, "k1", "Complex", b""), (2, "k2", "Complex", b"")],
        PRINCIPAL_SCHEMAS["pa_statements"],
    )
    pa_agents = spark.createDataFrame(
        [
            (1, 0, "NAME", "Y", 0), (1, 1, "NAME", "B", 0),
            (2, 0, "NAME", "X", 0), (2, 1, "NAME", "B", 0), (2, 2, "NAME", "C", 0),
        ],
        PRINCIPAL_SCHEMAS["pa_agents"],
    )
    ontology = spark.createDataFrame([("Y", "X")], "child string, parent string")
    assert refinement_pairs(pa_statements, pa_agents, ontology).count() == 0
