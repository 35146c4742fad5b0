"""The full assembly pipeline, end to end (reference:
export_assembly.py:888-1025 steps 0-5 + export_assembly_refinement.py:32-127
steps 6-7 + readonly_dumping.py:2242-2303 step 8 — three separate processes
there; ONE lazily-composed Spark DAG here).

    raw_statements (readings + knowledge bases)
      -> distill (readonly.build_readonly does this internally)
      -> preprocess (repair/validate/ground/rehash)
      -> dedup -> pa_statements
      -> agent extraction -> pa_agents
      -> refinement -> pa_support_links
      -> belief
      -> build_readonly -> ReadonlyLake
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.assembly.belief import belief_scores
from indra_db_spark.assembly.preprocess import (
    dedup_statements,
    preprocess_statements,
)
from indra_db_spark.assembly.distill import distill_readings
from indra_db_spark.assembly.readonly import build_readonly
from indra_db_spark.assembly.refinement import refinement_pairs
from indra_db_spark.schemas import PA_AGENTS_SCHEMA, ROLE_NUMS


def extract_agent_rows(pa_statements: DataFrame) -> DataFrame:
    """Explode statement JSON into pa_agents rows — the reference's
    ``extract_agent_data`` UDTF shape (util/insert.py:177).

    Statements may carry ``agent_groundings`` ([{ns: id}, ...] aligned with
    ``agents``); names alone fall back to NAME-namespace rows.  Roles follow
    the statement shape: Complex/unary -> OTHER, else SUBJECT/OBJECT.
    """

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("stmt_mk_hash", "ag_num", "db_name", "db_id", "role_num")}
            for mk_hash, raw in zip(pdf["mk_hash"], pdf["json"]):
                stmt = json.loads(bytes(raw).decode())
                agents = stmt.get("agents") or []
                groundings = stmt.get("agent_groundings") or [
                    {"NAME": a} for a in agents
                ]
                n = len(agents)
                for i, g in enumerate(groundings):
                    if stmt["type"] == "Complex" or n == 1:
                        role = ROLE_NUMS["OTHER"]
                    else:
                        role = -1 if i == 0 else 1
                    # a None/absent agent slot (e.g. Phosphorylation with
                    # unknown enzyme) contributes no grounding rows
                    for ns, db_id in (g or {}).items():
                        out["stmt_mk_hash"].append(mk_hash)
                        out["ag_num"].append(i)
                        out["db_name"].append(ns)
                        out["db_id"].append(str(db_id))
                        out["role_num"].append(role)
            yield pd.DataFrame(out)

    return pa_statements.select("mk_hash", "json").mapInPandas(
        _batches, PA_AGENTS_SCHEMA
    )


def run_assembly(
    principal: dict[str, DataFrame],
    ontology_edges: DataFrame | None = None,
    grounding_map: dict[str, str] | None = None,
    persist: bool = True,
    version_priority: dict[str, list[str]] | None = None,
) -> dict[str, DataFrame]:
    """Principal inputs -> every readonly table, deriving the PA side from
    the raw statement JSON itself (no precomputed pa_* needed).

    ``principal`` needs raw_statements, text_ref, text_content, reading,
    db_info, mesh_ref_annotations.  Returns the readonly tables plus the
    derived pa_statements / pa_agents / pa_support_links under their own
    keys.
    """
    spark = principal["raw_statements"].sparkSession
    # distill FIRST so superseded readings feed neither statements nor
    # belief counts (export_assembly.py:984-999 stage order)
    kept = distill_readings(
        principal["text_content"], principal["reading"],
        version_priority=version_priority,
    )
    # disjoint branches: a row with BOTH ids set counts once, not twice
    raw0 = principal["raw_statements"].filter(
        F.col("db_info_id").isNotNull()
    ).unionByName(
        principal["raw_statements"]
        .filter(F.col("reading_id").isNotNull() & F.col("db_info_id").isNull())
        .join(
            kept.withColumnRenamed("rid", "reading_id"),
            "reading_id",
            "left_semi",
        )
    )
    def _p(df):
        if persist:
            from pyspark.storagelevel import StorageLevel

            return df.persist(StorageLevel.MEMORY_AND_DISK)
        return df

    # the preprocess output fans out to dedup, links, and counts — persist
    # so the Python repair/rehash pass runs ONCE, not per consumer
    pre = _p(preprocess_statements(raw0, grounding_map=grounding_map))
    unique = dedup_statements(pre)
    pa_statements = unique.select(
        "mk_hash",
        F.concat_ws(":", "type", F.col("mk_hash").cast("string")).alias(
            "matches_key"
        ),
        "type",
        "json",
    )
    pa_statements = _p(pa_statements)
    pa_agents = _p(extract_agent_rows(pa_statements))

    if ontology_edges is None:
        from indra_db_spark.session import local_artifact_df

        ontology_edges = local_artifact_df(
            spark, [], "child string, parent string"
        )
    links = _p(refinement_pairs(pa_statements, pa_agents, ontology_edges))

    # rehashed raw statements + links derived from the preprocess output
    raw = raw0.drop("mk_hash", "type").join(
        pre.select("sid", "mk_hash", "type"), "sid"
    )
    counts = (
        raw.join(
            principal["reading"].select(
                F.col("rid").alias("reading_id"), "reader"
            ),
            "reading_id",
            "left",
        )
        .join(
            principal["db_info"].select(
                F.col("id").alias("db_info_id"), "db_name"
            ),
            "db_info_id",
            "left",
        )
        .select(
            "mk_hash",
            F.lower(F.coalesce("reader", "db_name")).alias("src"),
        )
        .groupBy("mk_hash", "src")
        .agg(F.count("*").alias("n"))
    )
    belief = belief_scores(counts, links)

    js = F.col("json").cast("string")
    pa_activity = (
        pa_statements.select(
            F.col("mk_hash").alias("stmt_mk_hash"),
            F.get_json_object(js, "$.activity").alias("activity"),
            F.get_json_object(js, "$.is_active").cast("boolean").alias(
                "is_active"
            ),
        )
        .filter(F.col("activity").isNotNull())
    )
    derived = dict(
        principal,
        raw_statements=raw,
        pa_statements=pa_statements,
        pa_agents=pa_agents,
        pa_activity=pa_activity,
        pa_support_links=links,
    )
    derived.pop("raw_unique_links", None)  # regenerated from rehashed raws
    # pass the distillation result through: build_readonly must not
    # re-execute the two window shuffles over reading x text_content
    out = build_readonly(
        derived, belief=belief, persist=persist, distilled=kept
    )
    out["pa_statements"] = pa_statements
    out["pa_agents"] = pa_agents
    out["pa_support_links"] = links
    return out
