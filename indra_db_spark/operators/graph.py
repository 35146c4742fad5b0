"""Iterative graph operators: transitive closure and ancestor aggregation.

The reference computes a refinement graph (specific→general statement pairs)
and scores belief from each statement's evidence plus all *ancestors'*
evidence (reference: indra_db/readonly_dumping/export_assembly.py:613-735,
driver-side networkx).  networkx on the driver dies at 100M+ edges; the
Spark-native form is semi-naive iterative joins: each round extends known
paths by one hop and unions in only the *new* pairs, converging in
O(graph depth) rounds.  Each round is a distributed shuffle join — no
driver-side graph state; the driver only runs the (depth-bounded) loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iterations: int = 30,
) -> DataFrame:
    """All (child, anc) pairs where anc is reachable via parent edges.

    Semi-naive evaluation: ``frontier`` holds pairs discovered in the last
    round only, so each join touches new paths, not the whole closure.
    ``localCheckpoint`` truncates lineage each round (iterative plans
    otherwise grow exponentially and overwhelm Catalyst).
    """
    def _ckpt(df: DataFrame) -> DataFrame:
        # the fresh Project gives the checkpoint a clean attribute set
        # (checkpointing a bare Union of prior checkpoints trips Spark's
        # constraint-rewrite on reused expression ids)
        return df.select("child", "anc").localCheckpoint(eager=True)

    # Spark's constraint rewrite chokes on iterative plans over checkpointed
    # RDDs (NoSuchElementException on reused expr ids); constraints buy
    # nothing for this loop, so scope them off.
    spark = edges.sparkSession
    conf_key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        return _closure_loop(edges, child_col, parent_col, max_iterations, _ckpt)
    finally:
        spark.conf.set(conf_key, prev)


def _closure_loop(edges, child_col, parent_col, max_iterations, _ckpt) -> DataFrame:
    e = edges.select(
        F.col(child_col).alias("child"), F.col(parent_col).alias("anc")
    ).distinct()
    closure = _ckpt(e)
    frontier = closure
    for _ in range(max_iterations):
        # extend frontier one hop: (child -> anc) + (anc -> anc2)
        step = (
            frontier.alias("f")
            .join(e.alias("e"), F.col("f.anc") == F.col("e.child"))
            .select(F.col("f.child").alias("child"), F.col("e.anc").alias("anc"))
            .distinct()
        )
        new = _ckpt(step.join(closure, ["child", "anc"], "left_anti"))
        if new.isEmpty():
            break
        closure = _ckpt(closure.unionByName(new))
        frontier = new
    return closure


def ancestor_aggregate(
    nodes: DataFrame,
    edges: DataFrame,
    value_col: str,
    node_col: str = "id",
    child_col: str = "child",
    parent_col: str = "parent",
    out_col: str = "agg_value",
) -> DataFrame:
    """Per node: value + sum of all ancestors' values (the belief-score
    input shape: own evidence + refinement-ancestor evidence).

    closure ⋈ nodes on the ancestor side, grouped by child, then a left
    join back so root nodes (no ancestors) keep their own value.
    """
    closure = transitive_closure(edges, child_col, parent_col)
    anc_vals = (
        closure.join(
            nodes.select(
                F.col(node_col).alias("anc"), F.col(value_col).alias("_v")
            ),
            "anc",
        )
        .groupBy("child")
        .agg(F.sum("_v").alias("_anc_sum"))
    )
    return (
        nodes.join(
            anc_vals.withColumnRenamed("child", node_col), node_col, "left"
        )
        .withColumn(
            out_col, F.col(value_col) + F.coalesce(F.col("_anc_sum"), F.lit(0))
        )
        .drop("_anc_sum")
    )
