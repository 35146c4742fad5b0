"""Differential test: every catalog query vs its DuckDB oracle at sf0.001.

This mirrors the driver's correctness gate (row count + columns +
order-insensitive values) and the reference's oracle-based test strategy
(SURVEY.md §5)."""

import pytest

from indra_db_spark import catalog
from indra_db_spark.testing import compare_frames, duckdb_con


@pytest.fixture(scope="module")
def oracle(sf_dir):
    return duckdb_con(sf_dir)


@pytest.mark.parametrize("name", sorted(catalog.REGISTRY))
def test_catalog_query_matches_oracle(name, spark, sf_dir, oracle):
    fn, sql = catalog.REGISTRY[name]
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        # rows-only check for non-SQL-expressible ops — non-vacuous: every
        # oracle-less entry must produce rows with a stable schema
        assert len(sdf) > 0 and list(sdf.columns)
        return
    odf = oracle.execute(sql).df()
    # empty results HARD-fail unless the entry opted into ALLOW_EMPTY —
    # a vacuous empty-vs-empty agreement verifies nothing (r6 verdict #1)
    problems = [
        p
        for p in compare_frames(sdf, odf, allow_empty=name in catalog.ALLOW_EMPTY)
        if not p.startswith("WARN")
    ]
    assert not problems, f"{name}: {problems}"


DRIVER_WINDOW = 50

# The driver gate checks only the first DRIVER_WINDOW registrations; these
# families must never be displaced past it (round-2 regression: six entries
# silently fell out of the checked window when new entries were inserted
# mid-order).
CRITICAL_IN_WINDOW = [
    "closure_ancestors",
    "belief_ancestor_agg",
    "multimodal_meta",
    "doc_dup_clusters",
    # round-7 rotation (r6 verdict #5): the end-to-end compositions and the
    # newest operator families must sit inside the externally-enforced gate
    "doc_corpus_pipeline_v2",
    "doc_curate_increment",
    "graph_triangles",
    "events_paths",
    "events_rate_anomaly",
    # round-7.2 rotation: supervised classifier gate + composed IVFPQ
    "doc_quality_classifier",
    "emb_ivfpq_topk",
    # round-7.3 rotation: bounded-round k-core (the second iterative-graph
    # family alongside the closure)
    "graph_kcore",
    # round-8 rotation (r7 verdict #1): the round-7 surface — IVM, the
    # warehouse-modeling pair, OHLC/TWAP rollups, skew diagnosis,
    # attribution credit models (supersedes events_attribution in the
    # window), langid eval, neighbor aggregation, Z-order pruning
    "events_ivm_rollup",
    "events_scd2",
    "events_pit_join",
    "events_ohlc",
    "events_twap",
    "lake_skew_report",
    "events_attribution_model",
    "doc_langid_confusion",
    "graph_neighbor_agg",
    "lake_zorder_value",
    # round-8.2 rotation: the IMI exact near-dup (growing-cell-count scale
    # path) replaces the brute-force emb_topk baseline in the window
    "emb_neardup_imi",
    # round-10 rotation (r8 verdict #5 / r9 top-next): the txlog SERVING
    # read path — segmented manifests, DV anti-join, restore boundary,
    # targeted materialization — displaces json_extract (the scalar
    # family stays checked through curation_anonymize, and json_extract
    # stays in the 3-SF sweep)
    "txlog_dv_read",
    # round-11 rotation (r10 verdict next-round #6): the streaming
    # exactly-once watermark protocol (foreachBatch append_batch +
    # merge_batch IVM view, replay-skipped) displaces only_source (its
    # null-safe ≠ stays checked by the nullsafe_compare sweep entry)
    "stream_matview_rollup",
    # round-12 rotation (r11 verdict next-round #2): the
    # btree-replacement serving path end to end (algebra leaf → pinned
    # txlog handle → manifest bloom prune with engagement asserted →
    # oracle hash match) displaces curation_anonymize (the scalar family
    # stays sweep-checked)
    "algebra_txlog_hash_lookup",
    # round-13 rotations (r12 verdict next-round #1/#3): the mesh/paper
    # IN-list routing displaces source_pivot (§2.7's crosstab stays
    # sweep-checked at 3 SFs), and the statement-page evidence serving
    # path displaces left_outer_agg (its left-outer join shape stays
    # in-window through the page's reading_ref_link metadata join)
    "algebra_txlog_mesh_lookup",
    "serving_statement_page",
]


def test_critical_entries_inside_driver_window():
    names = list(catalog.REGISTRY)[:DRIVER_WINDOW]
    missing = [n for n in CRITICAL_IN_WINDOW if n not in names]
    assert not missing, f"critical entries outside driver window: {missing}"


def test_window_entries_all_have_oracles():
    # every checked slot should carry the strong (hash) check; rows-only
    # entries belong past the window
    window = list(catalog.REGISTRY.items())[:DRIVER_WINDOW]
    weak = [name for name, (_, sql) in window if sql is None]
    assert not weak, f"oracle-less entries consuming checked slots: {weak}"
