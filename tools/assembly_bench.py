"""Assembly-DAG stress bench: generate an N-row synthetic principal corpus
DISTRIBUTIVELY (spark.range + column expressions — no driver-side rows),
run the full run_assembly pipeline, and print per-output row counts and the
end-to-end wall time as one JSON line.

    PYTHONPATH=. python tools/assembly_bench.py [n_raw_statements]

This is the honest scale check for the materialization side: every stage
(preprocess mapInPandas, dedup, agent extraction, refinement equi-join,
belief closure, the 17 readonly builders) executes over partitioned data
exactly as it would on a cluster.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def synth_principal(spark, n: int):
    """n raw statements over n//20 distinct (type, agent-pair) shapes,
    read from n//100 papers by two readers, plus one knowledge base."""
    n_papers = max(n // 100, 10)
    n_genes = max(int(n ** 0.25) * 4, 20)

    papers = spark.range(1, n_papers + 1).select(
        F.col("id").cast("int").alias("trid"),
        F.col("id").cast("string").alias("pmid"),
        F.col("id").cast("int").alias("pmid_num"),
        F.format_string("PMC%d", "id").alias("pmcid"),
        F.col("id").cast("int").alias("pmcid_num"),
        F.lit(None).cast("int").alias("pmcid_version"),
        F.format_string("10.1000/j%d", "id").alias("doi"),
        F.lit(1000).alias("doi_ns"),
        F.format_string("j%d", "id").alias("doi_id"),
        F.lit(None).cast("string").alias("pii"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("manuscript_id"),
    )
    content = papers.select(
        (F.col("trid") * 10).alias("tcid"),
        F.col("trid").alias("text_ref_id"),
        F.lit("pubmed").alias("source"),
        F.lit("text").alias("format"),
        F.lit("abstract").alias("text_type"),
        F.lit(False).alias("preprint"),
    )
    readers = spark.createDataFrame(
        [("reach",), ("sparser",)], "reader string"
    )
    reading = content.crossJoin(readers).select(
        (F.col("tcid") * 100 + F.when(F.col("reader") == "reach", 1).otherwise(2))
        .cast("long")
        .alias("rid"),
        F.col("tcid").alias("text_content_id"),
        "reader",
        F.lit("2.0").alias("reader_version"),
        F.lit(1).alias("batch_id"),
    )
    db_info = spark.createDataFrame(
        [(1, "signor", "SIGNOR", "signor")],
        "id int, db_name string, db_full_name string, source_api string",
    )

    raw = spark.range(1, n + 1).select(
        F.col("id").alias("sid"),
        F.format_string("u%d", "id").alias("uuid"),
        F.lit(1).alias("batch_id"),
        F.lit(0).cast("long").alias("mk_hash"),
        F.col("id").alias("source_hash"),
        # ~2% of statements come from the knowledge base
        F.when(F.col("id") % 50 == 0, F.lit(None).cast("long")).otherwise(
            (
                (F.col("id") % F.lit(n_papers) + 1) * 1000
                + F.when(F.col("id") % 2 == 0, 1).otherwise(2)
            ).cast("long")
        ).alias("reading_id"),
        F.when(F.col("id") % 50 == 0, F.lit(1)).otherwise(
            F.lit(None).cast("int")
        ).alias("db_info_id"),
        F.lit("Activation").alias("type"),
        F.encode(
            F.format_string(
                '{"type": "Activation", "agents": ["G%d", "G%d"]}',
                (F.col("id") % F.lit(n_genes)).cast("int"),
                ((F.col("id") * 7) % F.lit(n_genes)).cast("int"),
            ),
            "utf-8",
        ).alias("json"),
    )
    mesh = papers.select(
        "pmid_num",
        (F.col("pmid_num") % 500).alias("mesh_num"),
        F.lit(False).alias("major_topic"),
        (F.col("pmid_num") % 7 == 0).alias("is_concept"),
    )
    return {
        "text_ref": papers,
        "text_content": content,
        "reading": reading,
        "db_info": db_info,
        "raw_statements": raw,
        "mesh_ref_annotations": mesh,
    }


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from indra_db_spark.assembly.pipeline import run_assembly
    from indra_db_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("assembly-bench")
    principal = synth_principal(spark, n)
    # fix reading_id to reference actual rids (tcid*100 + reader slot)
    t0 = time.monotonic()
    out = run_assembly(principal)
    counts = {
        name: out[name].count()
        for name in (
            "source_meta", "name_meta", "fast_raw_pa_link",
            "evidence_counts", "belief", "agent_interactions",
            "mesh_term_meta", "reading_ref_link",
        )
    }
    print(
        json.dumps(
            {
                "metric": "assembly_e2e",
                "value": round(time.monotonic() - t0, 3),
                "unit": "sec",
                "n_raw": n,
                "counts": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
