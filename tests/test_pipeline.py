"""Full end-to-end assembly test: principal fixtures WITHOUT any
precomputed PA tables -> run_assembly -> the readonly lake must equal the
directly-built fixture tables (everything except belief, which the pipeline
now *computes* rather than receives, and the mesh chain, oracle-checked in
test_assembly)."""

from __future__ import annotations

from collections import Counter

import pytest

from indra_db_spark.assembly.pipeline import run_assembly
from indra_db_spark.plans.fixtures import (
    build_principal_tables,
    build_tables,
    generate_model,
)
from indra_db_spark.schemas import PRINCIPAL_SCHEMAS
from tests.test_assembly import TABLE_COLS, _expected, _rows


@pytest.fixture(scope="module")
def e2e(spark):
    stmts, papers = generate_model(seed=42)
    rows = build_principal_tables(stmts, papers, seed=42)
    principal = {
        name: spark.createDataFrame(r, PRINCIPAL_SCHEMAS[name])
        for name, r in rows.items()
        if name in (
            "text_ref", "text_content", "reading", "db_info",
            "raw_statements", "mesh_ref_annotations",
        )
    }
    return run_assembly(principal), build_tables(stmts, papers), stmts


@pytest.mark.parametrize("table", [t for t in TABLE_COLS])
def test_e2e_table(e2e, table):
    built, expected_tables, _ = e2e
    cols = [c for c in TABLE_COLS[table] if c != "belief"]
    got = _rows(built[table], cols)
    want = _expected(expected_tables[table], cols)
    assert got == want, (
        f"{table}: {len(got - want)} unexpected, {len(want - got)} missing"
    )


def test_e2e_belief_is_probability(e2e):
    built, _, stmts = e2e
    scores = {r.mk_hash: r.belief for r in built["belief"].collect()}
    assert set(scores) == {s.mk_hash for s in stmts}
    assert all(0.0 < b < 1.0 for b in scores.values())
