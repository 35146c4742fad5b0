"""SIF (simple interaction format) export: the readonly lake flattened to
one row per directed agent pair, then aggregated to interaction edges
(reference: indra_db/util/dump_sif.py:87-465; namespace priority :363-403;
Complex pair permutations :409-416; edge aggregation :601-607).

Spark shape: per-(hash, ag_num) grounding argmin via ``min_by`` over a
namespace-rank struct (no pivot needed), per-hash agent arrays via
``collect_list`` + ``sort_array``, pair explosion with built-in array
functions — the whole job is three shuffles (agent argmin, per-hash
collect, edge group-by) regardless of corpus size.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.plans.lake import ReadonlyLake
from indra_db_spark.schemas import TYPE_NUMS

#: grounding-namespace preference, best first (dump_sif.py:363-403)
NS_PRIORITY = (
    "FPLX", "UPPRO", "HGNC", "UP", "CHEBI", "GO", "MESH", "MIRBASE",
    "DOID", "HP", "EFO", "NAME", "TEXT",
)


def _ns_rank() -> F.Column:
    m = F.create_map(
        *chain.from_iterable(
            (F.lit(ns), F.lit(i)) for i, ns in enumerate(NS_PRIORITY)
        )
    )
    return F.coalesce(m[F.col("db_name")], F.lit(len(NS_PRIORITY)))


def _all_agent_rows(lake: ReadonlyLake) -> DataFrame:
    name = lake["name_meta"].withColumn("db_name", F.lit("NAME"))
    text = lake["text_meta"].withColumn("db_name", F.lit("TEXT"))
    other = lake["other_meta"]
    cols = ["mk_hash", "ag_num", "db_name", "db_id", "is_complex_dup"]
    return (
        name.select(*cols)
        .unionByName(text.select(*cols))
        .unionByName(other.select(*cols))
        .filter(~F.col("is_complex_dup"))
    )


def sif_pairs(lake: ReadonlyLake, max_complex_members: int = 3) -> DataFrame:
    """One row per directed agent pair per statement.

    Two-agent statements emit (ag0 -> ag1); Complexes with at most
    ``max_complex_members`` members emit every ordered pair (the
    reference's permutations cap, dump_sif.py:409-416).
    """
    agents = _all_agent_rows(lake)
    best = agents.groupBy("mk_hash", "ag_num").agg(
        F.min_by(
            F.struct(
                F.col("db_name").alias("ns"), F.col("db_id").alias("id")
            ),
            _ns_rank(),
        ).alias("g"),
        F.max(F.when(F.col("db_name") == "NAME", F.col("db_id"))).alias("name"),
    )
    per_hash = best.groupBy("mk_hash").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "ag_num",
                    F.col("g.ns").alias("ns"),
                    F.col("g.id").alias("id"),
                    "name",
                )
            )
        ).alias("ags")
    )

    meta = lake["source_meta"].select(
        "mk_hash", "type_num", "ev_count", "belief", "src_json"
    )
    complex_num = TYPE_NUMS["Complex"]
    rows = per_hash.join(meta, "mk_hash").filter(
        (F.size("ags") == 2)
        | (
            (F.col("type_num") == complex_num)
            & (F.size("ags") <= max_complex_members)
        )
    )
    # ordered pair explosion: indices (i, j), i != j; plain 2-agent
    # statements keep only the directed (0, 1) reading
    idx = F.sequence(F.lit(0), F.size("ags") - 1)
    pairs = rows.select(
        "*",
        F.explode(
            F.when(
                F.col("type_num") == complex_num,
                F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.filter(
                            F.transform(
                                idx, lambda j: F.struct(i.alias("i"), j.alias("j"))
                            ),
                            lambda p: p["i"] != p["j"],
                        ),
                    )
                ),
            ).otherwise(F.array(F.struct(F.lit(0).alias("i"), F.lit(1).alias("j"))))
        ).alias("p"),
    )
    type_name = F.create_map(
        *chain.from_iterable(
            (F.lit(n), F.lit(t)) for t, n in TYPE_NUMS.items()
        )
    )[F.col("type_num")]
    a = F.col("ags")[F.col("p.i")]
    b = F.col("ags")[F.col("p.j")]
    return pairs.select(
        a["ns"].alias("agA_ns"),
        a["id"].alias("agA_id"),
        a["name"].alias("agA_name"),
        b["ns"].alias("agB_ns"),
        b["id"].alias("agB_id"),
        b["name"].alias("agB_name"),
        type_name.alias("stmt_type"),
        F.col("ev_count").alias("evidence_count"),
        F.col("mk_hash").alias("stmt_hash"),
        "belief",
        F.col("src_json").alias("source_counts"),
    )


def sif_edges(pairs: DataFrame) -> DataFrame:
    """Aggregate pair rows to interaction edges: sum evidence, max belief,
    collect hashes (dump_sif.py:601-607 groupby-sum)."""
    return (
        pairs.groupBy(
            "agA_ns", "agA_id", "agA_name", "agB_ns", "agB_id", "agB_name",
            "stmt_type",
        )
        .agg(
            F.sum("evidence_count").alias("evidence_count"),
            F.max("belief").alias("belief"),
            F.sort_array(F.collect_list("stmt_hash")).alias("stmt_hashes"),
        )
    )

