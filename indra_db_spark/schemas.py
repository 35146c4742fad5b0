"""Spark StructTypes for the readonly (query-side) tables, plus the
dictionary-encoded enum maps.

Shapes follow the reference's loader schemas
(indra_db/readonly_dumping/readonly_dumping.py:1431-1444 name/text_meta,
:1509-1523 other_meta, :1074-1088 source_meta, :2017-2026 mesh_*_meta,
:932-941 fast_raw_pa_link, :520-537 reading_ref_link, :414-417 raw_stmt_src,
:255-260 mesh_*_ref_counts, :337-340 belief, :625-628 evidence_counts,
:454-457 pa_agent_counts) with one deliberate redesign: the reference's
*dynamic* per-source integer columns (pa_stmt_src crosstab,
readonly_schema.py:430-476) become a single ``src_json map<string,int>``
column — absent source ⇒ absent key ⇒ NULL lookup, preserving the
NULL-not-zero semantics HasSources inversion depends on (query.py:1444-1453).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

# ----------------------------------------------------------------- enums

# role dictionary (readonly_schema.py:61-66)
ROLE_NUMS = {"SUBJECT": -1, "OTHER": 0, "OBJECT": 1}

# statement-type dictionary: type_num = index into the sorted registry
# (readonly_schema.py:69-95 builds the same from sorted class names).
# Self-contained registry — a superset of the types the fixtures use.
TYPE_REGISTRY = sorted(
    [
        "Acetylation",
        "Activation",
        "ActiveForm",
        "Autophosphorylation",
        "Complex",
        "Conversion",
        "DecreaseAmount",
        "Dephosphorylation",
        "Deubiquitination",
        "Gap",
        "Gef",
        "IncreaseAmount",
        "Inhibition",
        "Methylation",
        "Phosphorylation",
        "Translocation",
        "Ubiquitination",
    ]
)
TYPE_NUMS = {t: i for i, t in enumerate(TYPE_REGISTRY)}

# minimal statement-class hierarchy for HasType(include_subclasses=True)
# (the reference expands via the INDRA class tree, query.py:2330-2338)
TYPE_SUBCLASSES: dict[str, list[str]] = {
    "Modification": [
        "Acetylation",
        "Dephosphorylation",
        "Deubiquitination",
        "Methylation",
        "Phosphorylation",
        "Ubiquitination",
    ],
    "SelfModification": ["Autophosphorylation"],
    "RegulateActivity": ["Activation", "Inhibition"],
    "RegulateAmount": ["DecreaseAmount", "IncreaseAmount"],
}

# reader vs database source groups (readonly_schema.py:902-954 has_rd/has_db)
READER_SOURCES = ("reach", "medscan", "sparser", "eidos", "trips", "isi", "rlimsp")
DB_SOURCES = ("pc", "signor", "tas", "biogrid", "ctd", "drugbank", "hprd")


def expand_types(types: list[str], include_subclasses: bool = False) -> list[str]:
    """Expand statement-type names to concrete registry types.

    Abstract class names (keys of TYPE_SUBCLASSES) ALWAYS expand — they have
    no type_num of their own, so "don't expand" would mean "match nothing".
    ``include_subclasses`` additionally pulls in registered subclasses of
    concrete names (the reference's INDRA class-tree walk,
    query.py:2330-2338).  Unknown names raise — a typo'd type must not
    silently empty the whole query.
    """
    out: list[str] = []
    for t in types:
        if t in TYPE_SUBCLASSES:
            out.extend(TYPE_SUBCLASSES[t])
        elif t in TYPE_NUMS:
            out.append(t)
            if include_subclasses:
                out.extend(TYPE_SUBCLASSES.get(t, []))
        else:
            raise ValueError(
                f"unknown statement type {t!r}; known: "
                f"{TYPE_REGISTRY + sorted(TYPE_SUBCLASSES)}"
            )
    return sorted(set(out))


# --------------------------------------------------- readonly StructTypes

_sort_group_cols = [
    StructField("ev_count", IntegerType()),
    StructField("belief", FloatType()),
    StructField("type_num", ShortType()),
    StructField("activity", StringType()),
    StructField("is_active", BooleanType()),
    StructField("agent_count", IntegerType()),
]

# name_meta / text_meta (readonly_dumping.py:1431-1444)
AGENT_META_SCHEMA = StructType(
    [
        # surrogate row id; long (not int) — it is generated distributively
        # via monotonically_increasing_id, which exceeds 32 bits beyond
        # partition 0
        StructField("ag_id", LongType()),
        StructField("ag_num", IntegerType()),
        StructField("db_id", StringType()),
        StructField("role_num", ShortType()),
        StructField("mk_hash", LongType()),
        StructField("is_complex_dup", BooleanType()),
        StructField("type_num", ShortType()),
        StructField("ev_count", IntegerType()),
        StructField("belief", FloatType()),
        StructField("activity", StringType()),
        StructField("is_active", BooleanType()),
        StructField("agent_count", IntegerType()),
    ]
)

# other_meta adds the namespace column (readonly_dumping.py:1509-1523)
OTHER_META_SCHEMA = StructType(
    list(AGENT_META_SCHEMA.fields) + [StructField("db_name", StringType())]
)

# source_meta (readonly_dumping.py:1074-1088; src_json map replaces the
# dynamic per-source columns)
SOURCE_META_SCHEMA = StructType(
    [
        StructField("mk_hash", LongType()),
        StructField("src_json", MapType(StringType(), IntegerType())),
        StructField("only_src", StringType()),
        StructField("num_srcs", IntegerType()),
        StructField("has_rd", BooleanType()),
        StructField("has_db", BooleanType()),
    ]
    + _sort_group_cols
)

# mesh_term_meta / mesh_concept_meta (readonly_dumping.py:2017-2026)
MESH_META_SCHEMA = StructType(
    [
        StructField("mk_hash", LongType()),
        StructField("mesh_num", IntegerType()),
    ]
    + _sort_group_cols
)

# agent_interactions (readonly_schema.py:1379-1388)
AGENT_INTERACTIONS_SCHEMA = StructType(
    [
        StructField("mk_hash", LongType()),
        StructField("agent_json", MapType(StringType(), StringType())),
        StructField("src_json", MapType(StringType(), IntegerType())),
        StructField("is_complex_dup", BooleanType()),
    ]
    + _sort_group_cols
)

# fast_raw_pa_link (readonly_dumping.py:932-941) — one row per evidence
FAST_RAW_PA_LINK_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("raw_json", BinaryType()),
        StructField("reading_id", LongType()),
        StructField("db_info_id", IntegerType()),
        StructField("mk_hash", LongType()),
        StructField("pa_json", BinaryType()),
        StructField("type_num", ShortType()),
        StructField("src", StringType()),
    ]
)

# reading_ref_link (readonly_dumping.py:520-537)
READING_REF_LINK_SCHEMA = StructType(
    [
        StructField("trid", IntegerType()),
        StructField("pmid", StringType()),
        StructField("pmid_num", IntegerType()),
        StructField("pmcid", StringType()),
        StructField("pmcid_num", IntegerType()),
        StructField("pmcid_version", IntegerType()),
        StructField("doi", StringType()),
        StructField("doi_ns", IntegerType()),
        StructField("doi_id", StringType()),
        StructField("pii", StringType()),
        StructField("url", StringType()),
        StructField("manuscript_id", StringType()),
        StructField("tcid", IntegerType()),
        StructField("source", StringType()),
        StructField("rid", LongType()),
        StructField("reader", StringType()),
    ]
)

RAW_STMT_SRC_SCHEMA = StructType(
    [StructField("sid", LongType()), StructField("src", StringType())]
)

RAW_STMT_MESH_SCHEMA = StructType(
    [StructField("sid", LongType()), StructField("mesh_num", IntegerType())]
)

MESH_REF_COUNTS_SCHEMA = StructType(
    [
        StructField("mk_hash", LongType()),
        StructField("mesh_num", IntegerType()),
        StructField("ref_count", IntegerType()),
        StructField("pmid_count", IntegerType()),
    ]
)

BELIEF_SCHEMA = StructType(
    [StructField("mk_hash", LongType()), StructField("belief", FloatType())]
)

EVIDENCE_COUNTS_SCHEMA = StructType(
    [StructField("mk_hash", LongType()), StructField("ev_count", IntegerType())]
)

PA_AGENT_COUNTS_SCHEMA = StructType(
    [StructField("mk_hash", LongType()), StructField("agent_count", IntegerType())]
)

# --------------------------------------------------- principal StructTypes
#
# Input-side (normalized) tables feeding the assembly DAG; shapes follow
# indra_db/schemas/principal_schema.py (SURVEY.md §1.4).  Only the columns
# the materialization pipeline reads are declared.

TEXT_REF_SCHEMA = StructType(
    [
        StructField("trid", IntegerType()),  # principal_schema.py:198 id
        StructField("pmid", StringType()),
        StructField("pmid_num", IntegerType()),
        StructField("pmcid", StringType()),
        StructField("pmcid_num", IntegerType()),
        StructField("pmcid_version", IntegerType()),
        StructField("doi", StringType()),
        StructField("doi_ns", IntegerType()),
        StructField("doi_id", StringType()),
        StructField("pii", StringType()),
        StructField("url", StringType()),
        StructField("manuscript_id", StringType()),
    ]
)

# text_content (principal_schema.py:368-437)
TEXT_CONTENT_SCHEMA = StructType(
    [
        StructField("tcid", IntegerType()),
        StructField("text_ref_id", IntegerType()),
        StructField("source", StringType()),
        StructField("format", StringType()),
        StructField("text_type", StringType()),  # abstract|fulltext|title
        StructField("preprint", BooleanType()),
    ]
)

# reading (principal_schema.py:439-514); id is hash-structured
READING_SCHEMA = StructType(
    [
        StructField("rid", LongType()),
        StructField("text_content_id", IntegerType()),
        StructField("reader", StringType()),
        StructField("reader_version", StringType()),
        StructField("batch_id", IntegerType()),
    ]
)

# db_info (principal_schema.py:516-559)
DB_INFO_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("db_name", StringType()),
        StructField("db_full_name", StringType()),
        StructField("source_api", StringType()),
    ]
)

# raw_statements (principal_schema.py:561-656)
RAW_STATEMENTS_SCHEMA = StructType(
    [
        StructField("sid", LongType()),
        StructField("uuid", StringType()),
        StructField("batch_id", IntegerType()),
        StructField("mk_hash", LongType()),
        StructField("source_hash", LongType()),
        StructField("reading_id", LongType()),
        StructField("db_info_id", IntegerType()),
        StructField("type", StringType()),
        StructField("json", BinaryType()),
    ]
)

# raw_unique_links (principal_schema.py:721-779)
RAW_UNIQUE_LINKS_SCHEMA = StructType(
    [
        StructField("raw_stmt_id", LongType()),
        StructField("pa_stmt_mk_hash", LongType()),
    ]
)

# pa_statements (principal_schema.py:781-837)
PA_STATEMENTS_SCHEMA = StructType(
    [
        StructField("mk_hash", LongType()),
        StructField("matches_key", StringType()),
        StructField("type", StringType()),
        StructField("json", BinaryType()),
    ]
)

# pa_agents (principal_schema.py:883-947)
PA_AGENTS_SCHEMA = StructType(
    [
        StructField("stmt_mk_hash", LongType()),
        StructField("ag_num", IntegerType()),
        StructField("db_name", StringType()),
        StructField("db_id", StringType()),
        StructField("role_num", ShortType()),
    ]
)

# pa_activity (principal_schema.py:883-947)
PA_ACTIVITY_SCHEMA = StructType(
    [
        StructField("stmt_mk_hash", LongType()),
        StructField("activity", StringType()),
        StructField("is_active", BooleanType()),
    ]
)

# pa_support_links (principal_schema.py:839-881): refinement edges
PA_SUPPORT_LINKS_SCHEMA = StructType(
    [
        StructField("supporting_mk_hash", LongType()),  # specific
        StructField("supported_mk_hash", LongType()),  # general
    ]
)

# mesh_ref_annotations (principal_schema.py:259-366): paper-topic labels
MESH_REF_ANNOTATIONS_SCHEMA = StructType(
    [
        StructField("pmid_num", IntegerType()),
        StructField("mesh_num", IntegerType()),
        StructField("major_topic", BooleanType()),
        StructField("is_concept", BooleanType()),
    ]
)

# raw_agents (principal_schema.py:658-719): exploded raw-statement agents
RAW_AGENTS_SCHEMA = StructType(
    [
        StructField("stmt_id", LongType()),
        StructField("ag_num", IntegerType()),
        StructField("db_name", StringType()),
        StructField("db_id", StringType()),
        StructField("role_num", ShortType()),
    ]
)

# curation (principal_schema.py:949-1006): user feedback on statements;
# ``source`` is the access point (e.g. "DB REST API"), ``date`` an ISO-8601
# submission time, ``pa_json``/``ev_json`` the curated JSON payloads
CURATION_SCHEMA = StructType(
    [
        StructField("id", IntegerType()),
        StructField("pa_hash", LongType()),
        StructField("source_hash", LongType()),
        StructField("tag", StringType()),
        StructField("curator", StringType()),
        StructField("text", StringType()),
        StructField("ip", StringType()),
        StructField("source", StringType()),
        StructField("date", StringType()),
        StructField("pa_json", BinaryType()),
        StructField("ev_json", BinaryType()),
    ]
)

PRINCIPAL_SCHEMAS = {
    "raw_agents": RAW_AGENTS_SCHEMA,
    "curation": CURATION_SCHEMA,
    "text_ref": TEXT_REF_SCHEMA,
    "text_content": TEXT_CONTENT_SCHEMA,
    "reading": READING_SCHEMA,
    "db_info": DB_INFO_SCHEMA,
    "raw_statements": RAW_STATEMENTS_SCHEMA,
    "raw_unique_links": RAW_UNIQUE_LINKS_SCHEMA,
    "pa_statements": PA_STATEMENTS_SCHEMA,
    "pa_agents": PA_AGENTS_SCHEMA,
    "pa_activity": PA_ACTIVITY_SCHEMA,
    "pa_support_links": PA_SUPPORT_LINKS_SCHEMA,
    "mesh_ref_annotations": MESH_REF_ANNOTATIONS_SCHEMA,
}


READONLY_SCHEMAS = {
    "name_meta": AGENT_META_SCHEMA,
    "text_meta": AGENT_META_SCHEMA,
    "other_meta": OTHER_META_SCHEMA,
    "source_meta": SOURCE_META_SCHEMA,
    "mesh_term_meta": MESH_META_SCHEMA,
    "mesh_concept_meta": MESH_META_SCHEMA,
    "agent_interactions": AGENT_INTERACTIONS_SCHEMA,
    "fast_raw_pa_link": FAST_RAW_PA_LINK_SCHEMA,
    "reading_ref_link": READING_REF_LINK_SCHEMA,
    "raw_stmt_src": RAW_STMT_SRC_SCHEMA,
    "raw_stmt_mesh_terms": RAW_STMT_MESH_SCHEMA,
    "raw_stmt_mesh_concepts": RAW_STMT_MESH_SCHEMA,
    "mesh_term_ref_counts": MESH_REF_COUNTS_SCHEMA,
    "mesh_concept_ref_counts": MESH_REF_COUNTS_SCHEMA,
    "belief": BELIEF_SCHEMA,
    "evidence_counts": EVIDENCE_COUNTS_SCHEMA,
    "pa_agent_counts": PA_AGENT_COUNTS_SCHEMA,
}
