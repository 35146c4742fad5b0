"""Incremental preassembly ("supplement"): fold a new batch of statements
into an existing corpus without recomputing it (reference:
preassembly/preassemble_db.py:497-615 supplement_corpus — dedup the new
batch, then refine new x new and new x old, never old x old).

Spark-first: the restriction is two semi-joined variants of the same
equi-join used by the full refinement pass — the shuffle touches only
new-batch rows plus the matching slice of the old corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.assembly.refinement import refinement_pairs


def new_unique_statements(
    preprocessed_new: DataFrame, existing_pa: DataFrame
) -> DataFrame:
    """New-batch statements whose hash is not in the corpus yet (the
    supplement's dedup step, preassemble_db.py:497-550)."""
    return preprocessed_new.join(
        existing_pa.select("mk_hash"), "mk_hash", "left_anti"
    ).dropDuplicates(["mk_hash"])


def supplement_refinements(
    pa_statements_all: DataFrame,
    pa_agents_all: DataFrame,
    new_hashes: DataFrame,
    ontology_edges: DataFrame,
) -> DataFrame:
    """Refinement pairs where at least one side is new: (new x all) union
    (all x new) — each side restricted BEFORE the join, so only new-batch
    rows and their matching corpus slice shuffle (new x new appears in
    both; distinct collapses it).  Combined with the existing
    pa_support_links this equals a full recompute — tested against exactly
    that invariant.
    """
    nh = new_hashes.select("mk_hash").distinct()
    new_as_spec = refinement_pairs(
        pa_statements_all, pa_agents_all, ontology_edges, spec_hashes=nh
    )
    new_as_gen = refinement_pairs(
        pa_statements_all, pa_agents_all, ontology_edges, gen_hashes=nh
    )
    return new_as_spec.unionByName(new_as_gen).distinct()


def supplement_corpus(
    existing_pa: DataFrame,
    existing_links: DataFrame,
    pa_agents_all: DataFrame,
    preprocessed_new: DataFrame,
    ontology_edges: DataFrame,
) -> dict[str, DataFrame]:
    """One supplement round: returns the updated ``pa_statements`` and
    ``pa_support_links`` plus the ``new_statements`` delta."""
    new_stmts = new_unique_statements(preprocessed_new, existing_pa)
    pa_all = existing_pa.select("mk_hash", "type").unionByName(
        new_stmts.select("mk_hash", "type")
    )
    new_links = supplement_refinements(
        pa_all, pa_agents_all, new_stmts.select("mk_hash"), ontology_edges
    )
    links = (
        existing_links.select("supporting_mk_hash", "supported_mk_hash")
        .unionByName(new_links)
        .distinct()
    )
    return {
        "new_statements": new_stmts,
        "pa_statements": pa_all,
        "pa_support_links": links,
    }
