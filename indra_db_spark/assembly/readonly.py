"""Readonly-lake builders: principal tables -> the denormalized query-side
tables, as one DataFrame DAG (reference: the 17-builder RUN_ORDER in
readonly_dumping/readonly_dumping.py:64-82 + the SQL definitions in
schemas/readonly_schema.py; SURVEY.md §1.4 / §2.8).

Design deltas vs the reference (deliberate, SURVEY.md §7.1):
- the dynamic per-source crosstab columns (readonly_schema.py:415-476)
  become one ``src_json map<string,int>`` column — absent source ⇒ absent
  key ⇒ NULL lookup;
- name/text/other_meta stay three outputs (the reference's skew-busting
  namespace partition, readonly_schema.py:991-1156) but are produced by one
  plan partitioned by a routing column;
- every builder is a pure function of DataFrames; the RUN_ORDER dependency
  DAG lives in :func:`build_readonly`.

Scale notes: all joins are equi-joins on mk_hash/sid/ids; the enum maps are
literal map expressions (no shuffle); reused inputs (the evidence-grain
link) should be persisted or written to Parquet between stages by the
caller at real scale.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.assembly.distill import distill_readings
from indra_db_spark.schemas import DB_SOURCES, READER_SOURCES, TYPE_NUMS

def _type_num_map() -> "F.Column":
    """Literal type->type_num map (the reference builds the same dictionary
    as a SQL VALUES clause, readonly_schema.py:69-95).  Built lazily —
    Column literals need an active session."""
    return F.create_map(
        *chain.from_iterable((F.lit(t), F.lit(n)) for t, n in TYPE_NUMS.items())
    )


def build_raw_stmt_src(
    raw_statements: DataFrame, reading: DataFrame, db_info: DataFrame
) -> DataFrame:
    """sid -> lower(reader) UNION sid -> lower(db_name)
    (readonly_schema.py:382-413)."""
    # db_info_id IS NULL keeps the branches disjoint: a malformed row with
    # BOTH ids set counts once — as database-sourced, the same priority the
    # raw branch split in build_readonly and pipeline.py applies — instead
    # of emitting two src rows that would double its evidence downstream
    rd = (
        raw_statements.filter(
            F.col("reading_id").isNotNull() & F.col("db_info_id").isNull()
        )
        .join(reading, raw_statements["reading_id"] == reading["rid"])
        .select(F.col("sid"), F.lower("reader").alias("src"))
    )
    db = (
        raw_statements.filter(F.col("db_info_id").isNotNull())
        .join(F.broadcast(db_info), raw_statements["db_info_id"] == db_info["id"])
        .select(F.col("sid"), F.lower("db_name").alias("src"))
    )
    return rd.unionByName(db)


def build_fast_raw_pa_link(
    raw_statements: DataFrame,
    raw_unique_links: DataFrame,
    pa_statements: DataFrame,
    raw_stmt_src: DataFrame,
) -> DataFrame:
    """raw ⋈ links ⋈ pa ⋈ src + type_num — one row per evidence
    (readonly_schema.py:296-357)."""
    return (
        raw_statements.alias("raw")
        .join(
            raw_unique_links.alias("l"),
            F.col("raw.sid") == F.col("l.raw_stmt_id"),
        )
        .join(
            pa_statements.alias("pa"),
            F.col("l.pa_stmt_mk_hash") == F.col("pa.mk_hash"),
        )
        .join(raw_stmt_src.alias("s"), "sid")
        .select(
            F.col("sid").alias("id"),
            F.col("raw.json").alias("raw_json"),
            F.col("raw.reading_id"),
            F.col("raw.db_info_id"),
            F.col("pa.mk_hash"),
            F.col("pa.json").alias("pa_json"),
            _type_num_map()[F.col("pa.type")].cast("short").alias("type_num"),
            F.col("s.src"),
        )
    )


def build_reading_ref_link(
    text_ref: DataFrame, text_content: DataFrame, reading: DataFrame
) -> DataFrame:
    """text_ref ⋈ text_content ⋈ reading flattened provenance
    (readonly_schema.py:217-294)."""
    return (
        text_ref.join(
            text_content, text_ref["trid"] == text_content["text_ref_id"]
        )
        .join(reading, text_content["tcid"] == reading["text_content_id"])
        .select(
            "trid", "pmid", "pmid_num", "pmcid", "pmcid_num", "pmcid_version",
            "doi", "doi_ns", "doi_id", "pii", "url", "manuscript_id",
            "tcid", "source", "rid", "reader",
        )
    )


def build_source_meta(
    fast_raw_pa_link: DataFrame, sort_group: DataFrame
) -> DataFrame:
    """Per-hash source-count map + derived has_rd/has_db/only_src/num_srcs
    (readonly_schema.py:870-989; crosstab replaced by the map column)."""
    counts = (
        fast_raw_pa_link.groupBy("mk_hash", "src")
        .agg(F.count("*").cast("int").alias("n"))
        .groupBy("mk_hash")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("src", "n")))
            ).alias("src_json")
        )
    )
    keys = F.map_keys("src_json")
    return (
        counts.withColumn("num_srcs", F.size(keys))
        .withColumn(
            "only_src", F.when(F.col("num_srcs") == 1, keys[0])
        )
        .withColumn(
            "has_rd",
            F.arrays_overlap(keys, F.array(*[F.lit(s) for s in READER_SOURCES])),
        )
        .withColumn(
            "has_db",
            F.arrays_overlap(keys, F.array(*[F.lit(s) for s in DB_SOURCES])),
        )
        .join(sort_group, "mk_hash")
        .select(
            "mk_hash", "src_json", "only_src", "num_srcs", "has_rd", "has_db",
            "ev_count", "belief", "type_num", "activity", "is_active",
            "agent_count",
        )
    )


def build_sort_group(
    pa_statements: DataFrame,
    belief: DataFrame,
    evidence_counts: DataFrame,
    pa_agent_counts: DataFrame,
    pa_activity: DataFrame,
) -> DataFrame:
    """The shared sort/group column block every meta table carries
    (readonly_schema.py:139-157): ev_count, belief, type_num, activity,
    is_active, agent_count keyed by mk_hash."""
    return (
        pa_statements.select(
            "mk_hash", _type_num_map()[F.col("type")].cast("short").alias("type_num")
        )
        .join(belief, "mk_hash", "left")
        .join(evidence_counts, "mk_hash")
        .join(pa_agent_counts, "mk_hash")
        .join(
            pa_activity.select(
                F.col("stmt_mk_hash").alias("mk_hash"), "activity", "is_active"
            ),
            "mk_hash",
            "left",
        )
        .withColumn("is_active", F.coalesce("is_active", F.lit(False)))
    )


def build_agent_metas(
    pa_agents: DataFrame, sort_group: DataFrame
) -> dict[str, DataFrame]:
    """pa_meta with Complex role duplication, partitioned into
    name/text/other_meta by namespace (readonly_schema.py:759-868; dup
    insert :849-856; partition :991-1156).

    Complex agent rows (role_num 0) are duplicated as the two directed
    roles — (ag_num 0, role -1) and (ag_num 1, role 1) — flagged
    is_complex_dup so interaction grains can drop them.
    """
    base = pa_agents.join(
        sort_group.withColumnRenamed("mk_hash", "stmt_mk_hash"), "stmt_mk_hash"
    ).filter(F.length("db_id") < 2000)  # guard, readonly_schema.py:824
    complex_num = TYPE_NUMS["Complex"]

    dup_variants = F.when(
        F.col("type_num") == complex_num,
        F.array(
            F.struct(
                F.col("ag_num").alias("ag_num"),
                F.col("role_num").alias("role_num"),
                F.lit(False).alias("is_complex_dup"),
            ),
            F.struct(
                F.lit(0).alias("ag_num"),
                F.lit(-1).cast("short").alias("role_num"),
                F.lit(True).alias("is_complex_dup"),
            ),
            F.struct(
                F.lit(1).alias("ag_num"),
                F.lit(1).cast("short").alias("role_num"),
                F.lit(True).alias("is_complex_dup"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("ag_num").alias("ag_num"),
                F.col("role_num").alias("role_num"),
                F.lit(False).alias("is_complex_dup"),
            )
        )
    )
    exploded = (
        base.withColumn("_v", F.explode(dup_variants))
        .select(
            F.col("stmt_mk_hash").alias("mk_hash"),
            F.col("_v.ag_num").alias("ag_num"),
            "db_name",
            "db_id",
            F.col("_v.role_num").alias("role_num"),
            F.col("_v.is_complex_dup").alias("is_complex_dup"),
            "ev_count", "belief", "type_num", "activity", "is_active",
            "agent_count",
        )
        .withColumn("ag_id", F.monotonically_increasing_id())
    )
    cols = [
        "ag_id", "ag_num", "db_id", "role_num", "mk_hash", "is_complex_dup",
        "type_num", "ev_count", "belief", "activity", "is_active",
        "agent_count",
    ]
    return {
        "name_meta": exploded.filter(F.col("db_name") == "NAME").select(*cols),
        "text_meta": exploded.filter(F.col("db_name") == "TEXT").select(*cols),
        "other_meta": exploded.filter(
            ~F.col("db_name").isin("NAME", "TEXT")
        ).select(*cols, "db_name"),
    }


def build_agent_interactions(
    pa_agents: DataFrame, source_meta: DataFrame
) -> DataFrame:
    """Per-hash agent map + ordered-pair explosion for Complex
    (readonly_schema.py:1257-1389; permutations :1344-1377)."""
    names = pa_agents.filter(F.col("db_name") == "NAME").select(
        F.col("stmt_mk_hash").alias("mk_hash"), "ag_num", "db_id"
    )
    base = names.groupBy("mk_hash").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("ag_num").cast("string"), "db_id"))
            )
        ).alias("agent_json")
    ).withColumn("is_complex_dup", F.lit(False))

    complex_num = TYPE_NUMS["Complex"]
    meta = source_meta.select(
        "mk_hash", "src_json", "ev_count", "belief", "type_num", "activity",
        "is_active", "agent_count",
    )
    cx = names.join(
        meta.filter(F.col("type_num") == complex_num).select("mk_hash"),
        "mk_hash",
        "left_semi",
    )
    pairs = (
        cx.alias("a")
        .join(cx.alias("b"), "mk_hash")
        .filter(F.col("a.ag_num") != F.col("b.ag_num"))
        .select(
            "mk_hash",
            F.map_from_arrays(
                F.array(F.lit("0"), F.lit("1")),
                F.array(F.col("a.db_id"), F.col("b.db_id")),
            ).alias("agent_json"),
        )
        .withColumn("is_complex_dup", F.lit(True))
    )
    return base.unionByName(pairs).join(meta, "mk_hash").select(
        "mk_hash", "agent_json", "src_json", "is_complex_dup",
        "ev_count", "belief", "type_num", "activity", "is_active",
        "agent_count",
    )


def build_raw_stmt_mesh(
    mesh_ref_annotations: DataFrame,
    text_ref: DataFrame,
    text_content: DataFrame,
    reading: DataFrame,
    raw_statements: DataFrame,
) -> dict[str, DataFrame]:
    """DISTINCT (raw sid, mesh_num) via the 4-way chain mesh -> text_ref ->
    text_content -> reading -> raw_statements (readonly_schema.py:688-757),
    split by the D/C annotation kind."""
    chain_df = (
        mesh_ref_annotations.join(
            text_ref.select("trid", "pmid_num"), "pmid_num"
        )
        .join(
            text_content.select("tcid", "text_ref_id"),
            F.col("trid") == F.col("text_ref_id"),
        )
        .join(
            reading.select("rid", "text_content_id"),
            F.col("tcid") == F.col("text_content_id"),
        )
        .join(
            raw_statements.select("sid", "reading_id"),
            F.col("rid") == F.col("reading_id"),
        )
        .select("sid", "mesh_num", "is_concept")
        .distinct()
    )
    return {
        "raw_stmt_mesh_terms": chain_df.filter(~F.col("is_concept")).select(
            "sid", "mesh_num"
        ),
        "raw_stmt_mesh_concepts": chain_df.filter(F.col("is_concept")).select(
            "sid", "mesh_num"
        ),
    }


def build_mesh_meta(
    raw_stmt_mesh: DataFrame, fast_raw_pa_link: DataFrame, sort_group: DataFrame
) -> DataFrame:
    """DISTINCT (mk_hash, mesh_num) + the sort/group block
    (readonly_schema.py:1158-1255)."""
    return (
        raw_stmt_mesh.join(
            fast_raw_pa_link.select(F.col("id").alias("sid"), "mk_hash"), "sid"
        )
        .select("mk_hash", "mesh_num")
        .distinct()
        .join(sort_group, "mk_hash")
        .select(
            "mk_hash", "mesh_num", "ev_count", "belief", "type_num",
            "activity", "is_active", "agent_count",
        )
    )


def build_mesh_ref_counts(
    raw_stmt_mesh: DataFrame,
    fast_raw_pa_link: DataFrame,
    reading_ref_link: DataFrame,
) -> DataFrame:
    """Per (mk_hash, mesh_num): distinct supporting pmids; plus per-hash
    distinct pmid count (the reference's CTE chain,
    readonly_schema.py:597-686)."""
    hash_pmid = (
        fast_raw_pa_link.select(F.col("id").alias("sid"), "mk_hash", "reading_id")
        .join(
            reading_ref_link.select(
                F.col("rid").alias("reading_id"), "pmid_num"
            ),
            "reading_id",
        )
    )
    pmid_counts = (
        hash_pmid.groupBy("mk_hash")
        .agg(F.countDistinct("pmid_num").cast("int").alias("pmid_count"))
    )
    ref_counts = (
        raw_stmt_mesh.join(hash_pmid, "sid")
        .groupBy("mk_hash", "mesh_num")
        .agg(F.countDistinct("pmid_num").cast("int").alias("ref_count"))
    )
    return ref_counts.join(pmid_counts, "mk_hash").select(
        "mk_hash", "mesh_num", "ref_count", "pmid_count"
    )


def build_readonly(
    principal: dict[str, DataFrame],
    belief: DataFrame | None = None,
    persist: bool = False,
    version_priority: dict[str, list[str]] | None = None,
    distilled: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Run the full RUN_ORDER DAG (readonly_dumping.py:64-82): principal
    tables -> every readonly table, as lazily-composed DataFrames.

    ``belief`` (mk_hash, belief) may be precomputed by
    :func:`indra_db_spark.assembly.belief.belief_scores`; defaults to 0.0
    when absent (the reference loads it from the belief-stage output).

    ``distilled`` (rid) may carry an already-computed distillation result —
    run_assembly passes its own so the two distillation window shuffles
    execute once, not once per layer; ``version_priority`` feeds
    :func:`distill_readings` when it is computed here.

    ``persist=True`` caches the fan-out intermediates (the evidence-grain
    link, the sort/group block, source_meta) with MEMORY_AND_DISK — without
    it, materializing each of the ~17 outputs re-executes the whole shared
    prefix.  At production scale, write stage outputs to Parquet instead
    (the reference's per-table staging, readonly_dumping.py:858-886).
    """

    def _p(df: DataFrame) -> DataFrame:
        if persist:
            from pyspark.storagelevel import StorageLevel

            return df.persist(StorageLevel.MEMORY_AND_DISK)
        return df
    kept = (
        distilled
        if distilled is not None
        else distill_readings(
            principal["text_content"],
            principal["reading"],
            version_priority=version_priority,
        )
    )
    reading = principal["reading"].join(kept, "rid", "left_semi")
    # branches kept disjoint: a malformed row with BOTH ids set counts once
    # (as database-sourced), never twice
    raw = principal["raw_statements"].filter(
        F.col("db_info_id").isNotNull()
    ).unionByName(
        principal["raw_statements"]
        .filter(F.col("reading_id").isNotNull() & F.col("db_info_id").isNull())
        .join(kept.withColumnRenamed("rid", "reading_id"), "reading_id", "left_semi")
    )
    links = principal.get("raw_unique_links")
    if links is not None:
        # only links whose raw statement survived distillation
        links = links.join(
            raw.select(F.col("sid").alias("raw_stmt_id")), "raw_stmt_id", "left_semi"
        )
    else:
        links = raw.select(
            F.col("sid").alias("raw_stmt_id"),
            F.col("mk_hash").alias("pa_stmt_mk_hash"),
        )

    out: dict[str, DataFrame] = {}
    out["raw_stmt_src"] = _p(build_raw_stmt_src(raw, reading, principal["db_info"]))
    out["fast_raw_pa_link"] = _p(build_fast_raw_pa_link(
        raw, links, principal["pa_statements"], out["raw_stmt_src"]
    ))
    out["reading_ref_link"] = build_reading_ref_link(
        principal["text_ref"], principal["text_content"], reading
    )
    out["evidence_counts"] = (
        out["fast_raw_pa_link"]
        .groupBy("mk_hash")
        .agg(F.count("id").cast("int").alias("ev_count"))
    )
    out["pa_agent_counts"] = (
        principal["pa_agents"]
        .groupBy(F.col("stmt_mk_hash").alias("mk_hash"))
        .agg(F.countDistinct("ag_num").cast("int").alias("agent_count"))
    )
    if belief is None:
        belief = out["evidence_counts"].select(
            "mk_hash", F.lit(0.0).cast("float").alias("belief")
        )
    out["belief"] = belief

    sort_group = _p(build_sort_group(
        principal["pa_statements"],
        out["belief"],
        out["evidence_counts"],
        out["pa_agent_counts"],
        principal["pa_activity"],
    ))
    out["source_meta"] = _p(build_source_meta(out["fast_raw_pa_link"], sort_group))
    out.update(build_agent_metas(principal["pa_agents"], sort_group))
    out["agent_interactions"] = build_agent_interactions(
        principal["pa_agents"], out["source_meta"]
    )
    mesh = build_raw_stmt_mesh(
        principal["mesh_ref_annotations"],
        principal["text_ref"],
        principal["text_content"],
        reading,
        raw,
    )
    out.update(mesh)
    out["mesh_term_meta"] = build_mesh_meta(
        mesh["raw_stmt_mesh_terms"], out["fast_raw_pa_link"], sort_group
    )
    out["mesh_concept_meta"] = build_mesh_meta(
        mesh["raw_stmt_mesh_concepts"], out["fast_raw_pa_link"], sort_group
    )
    out["mesh_term_ref_counts"] = build_mesh_ref_counts(
        mesh["raw_stmt_mesh_terms"],
        out["fast_raw_pa_link"],
        out["reading_ref_link"],
    )
    out["mesh_concept_ref_counts"] = build_mesh_ref_counts(
        mesh["raw_stmt_mesh_concepts"],
        out["fast_raw_pa_link"],
        out["reading_ref_link"],
    )
    return out
