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


def test_curate_increment_daily_drop(spark):
    """Incremental curation of a daily drop against frozen artifacts:
    known docs are rejected as non-novel, survivors pass every gate, the
    LM gate against the frozen model matches the self-trained score on
    the training slice, and splits are stable under re-run."""
    from pyspark.sql import functions as F

    from indra_db_spark.operators.sampling import curate_increment
    from indra_db_spark.operators.text import (
        bigram_lm_score,
        gopher_rules,
        train_bigram_lm,
    )
    from indra_db_spark.sources.lake import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    benchmark = docs.filter(F.col("doc_id") % 41 == 0)
    model = train_bigram_lm(day1)
    known = day1.select(F.md5("text").alias("fp"))
    # the drop contains yesterday's docs (must be rejected) + day2
    drop = docs
    out = curate_increment(drop, known, model, benchmark,
                           calibration_docs=day1)
    rows = out.collect()
    assert rows
    # the gate must filter in BOTH directions: some novel docs survive and
    # some are rejected — an all-pass or all-reject gate verifies nothing
    novel = drop.count() - day1.count()
    assert 0 < len(rows) < novel
    # neither gate mode may silently default: no calibration and no
    # absolute threshold is a configuration error
    import pytest

    with pytest.raises(ValueError, match="calibration_docs"):
        curate_increment(drop, known, model, benchmark)
    ids = {r.doc_id for r in rows}
    day1_ids = {r.doc_id for r in day1.select("doc_id").collect()}
    # novelty: no known document survives (identical text ⇒ same fp)
    assert not (ids & day1_ids)
    # survivors pass the quality gate (re-checked independently)
    passed = {
        r.doc_id
        for r in gopher_rules(docs).filter(F.col("passed") == 1).collect()
    }
    assert ids <= passed
    # deterministic: re-running produces the identical result
    again = {(r.doc_id, r.split) for r in curate_increment(
        drop, known, model, benchmark, calibration_docs=day1).collect()}
    assert again == {(r.doc_id, r.split) for r in rows}
    # the LM gate matches self-training semantics on the training slice:
    # scoring day1 against its own model ≡ bigram_lm_score(day1)
    from indra_db_spark.operators.text import score_docs_with_lm

    a = {
        (r.doc_id, r.sum_p_micro)
        for r in score_docs_with_lm(day1, model).collect()
    }
    b = {
        (r.doc_id, r.sum_p_micro) for r in bigram_lm_score(day1).collect()
    }
    assert a == b
