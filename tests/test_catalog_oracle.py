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
    problems = [p for p in compare_frames(sdf, odf) if not p.startswith("WARN")]
    assert not problems, f"{name}: {problems}"
