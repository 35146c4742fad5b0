"""Spark SQL parity: the catalog's oracle SQL strings double as a user-facing
SQL surface — for entries written in engine-neutral ANSI SQL, ``spark.sql``
over the registered lake views must return exactly what the DataFrame
program returns.

This pins two properties at once: (a) the DataFrame plans really are the
declared relational semantics (a third engine-independent expression of
each query agrees), and (b) a SQL-only user of the rebuilt engine gets
correct answers from the same strings the DuckDB gate runs.  Entries using
DuckDB-specific functions (string_split/unnest/strpos/list_filter/
regexp_split_to_array/recursive CTEs) are excluded — their cross-engine
check is the DuckDB oracle itself.
"""

import pytest

from indra_db_spark import catalog
from indra_db_spark.sources.lake import register_views
from indra_db_spark.testing import compare_frames

# oracle SQL that is plain ANSI and runs unmodified on Spark SQL
ANSI_ENTRIES = [
    "scan_filter_project",
    "hash_isin",
    "type_in",
    "evidence_bound",
    "join3_topk",
    "left_outer_agg",
    "group_count",
    "count_distinct",
    "agg_rollup",
    "distinct_dedup",
    "ranked_page",
    "first_per_key_dedup",
    "scalar_strings",
    "doc_exact_dedup",
    "doc_mix_weights",
    "skew_two_phase_agg",
    "skew_salted_join",
    "doc_incremental_new",
    "broadcast_dim_join",
    "global_topk",
    # round 7.5/7.6 (the rest of the new families use // or DuckDB list
    # functions — their cross-engine check is the DuckDB oracle itself)
    "events_scd2",
    "events_pit_join",
    "lineitem_unpivot",
    "events_grouping_sets",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", ANSI_ENTRIES)
def test_oracle_sql_runs_on_spark_sql(name, spark, sf_dir):
    fn, sql = catalog.REGISTRY[name]
    assert sql is not None
    sdf = fn(spark, sf_dir).toPandas()
    qdf = spark.sql(sql).toPandas()
    problems = [p for p in compare_frames(sdf, qdf) if not p.startswith("WARN")]
    assert not problems, f"{name}: {problems}"
