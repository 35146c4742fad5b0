"""Source-connector tests: PubMed XML parsing, knowledge-base framework."""

from __future__ import annotations

import json

import pytest

from indra_db_spark.assembly.preprocess import preprocess_statements
from indra_db_spark.sources.knowledgebase import (
    StaticKnowledgebase,
    db_info_rows,
    load_knowledgebases,
)
from indra_db_spark.sources.pubmed import (
    parse_articles,
    parse_mesh_annotations,
    xml_documents,
)

PUBMED_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation>
      <PMID>12345</PMID>
      <Article><ArticleTitle>MEK phosphorylates ERK</ArticleTitle></Article>
      <MeshHeadingList>
        <MeshHeading>
          <DescriptorName UI="D000818" MajorTopicYN="Y">Animals</DescriptorName>
        </MeshHeading>
        <MeshHeading>
          <DescriptorName UI="C537123" MajorTopicYN="N">RareThing</DescriptorName>
        </MeshHeading>
        <MeshHeading>
          <DescriptorName UI="Q000187">qualifier-only-ignored</DescriptorName>
        </MeshHeading>
      </MeshHeadingList>
    </MedlineCitation>
    <PubmedData>
      <ArticleIdList><ArticleId IdType="doi">10.1/abc</ArticleId></ArticleIdList>
    </PubmedData>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation><PMID>99</PMID></MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""


def test_parse_mesh_annotations(spark):
    docs = xml_documents(spark, [PUBMED_XML])
    rows = {
        (r.pmid_num, r.mesh_id, r.mesh_num, r.major_topic, r.is_concept)
        for r in parse_mesh_annotations(docs).collect()
    }
    assert rows == {
        (12345, "D000818", 818, True, False),
        (12345, "C537123", 537123, False, True),
    }


def test_parse_articles(spark):
    rows = {
        (r.pmid_num, r.doi, r.title)
        for r in parse_articles(xml_documents(spark, [PUBMED_XML])).collect()
    }
    assert (12345, "10.1/abc", "MEK phosphorylates ERK") in rows
    assert (99, None, None) in rows


def test_knowledgebase_pipeline_feeds_preprocess(spark):
    managers = [
        StaticKnowledgebase(
            "signor",
            [
                {"type": "Activation", "agents": ["MEK", "ERK"]},
                {"type": "Complex", "agents": ["only-one"]},  # invalid
            ],
        ),
        StaticKnowledgebase(
            "tas", [{"type": "Inhibition", "agents": ["Vemurafenib", "BRAF"]}]
        ),
    ]
    info = db_info_rows(managers)
    assert [d["db_name"] for d in info] == ["signor", "tas"]

    raw = load_knowledgebases(spark, managers)
    assert raw.count() == 3
    got = preprocess_statements(raw).collect()
    # the invalid Complex is dropped by preprocess validation
    assert {json.loads(bytes(r.json))["type"] for r in got} == {
        "Activation",
        "Inhibition",
    }
    assert all(r.mk_hash != 0 for r in got)


def test_tsv_gz_round_trip(spark, tmp_path):
    """read_tsv_gz matches the reference's assembly-stage TSV format
    (tab-separated, no header, \\N nulls)."""
    import gzip

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from indra_db_spark.sources.lake import read_tsv_gz

    path = str(tmp_path / "stage.tsv.gz")
    with gzip.open(path, "wt") as f:
        f.write("1\thello\n2\t\\N\n3\tworld\n")
    schema = StructType(
        [StructField("id", IntegerType()), StructField("val", StringType())]
    )
    rows = {(r.id, r.val) for r in read_tsv_gz(spark, path, schema).collect()}
    assert rows == {(1, "hello"), (2, None), (3, "world")}


def test_fk_join_pathing(spark):
    from indra_db_spark.plans.fixtures import (
        build_principal_tables,
        generate_model,
    )
    from indra_db_spark.plans.links import join_path, link
    from indra_db_spark.schemas import PRINCIPAL_SCHEMAS

    stmts, papers = generate_model(seed=42)
    rows = build_principal_tables(stmts, papers, seed=42)
    dfs = {
        name: spark.createDataFrame(r, PRINCIPAL_SCHEMAS[name])
        for name, r in rows.items()
    }
    path = join_path("text_ref", "pa_statements")
    assert [h[2] for h in path] == [
        "text_content", "reading", "raw_statements", "raw_unique_links",
        "pa_statements",
    ]
    joined = link(dfs, "text_ref", "pa_statements")
    # every reading-backed raw statement (incl. stale-reading distractors —
    # the FK walk is pre-distill) reaches its PA statement
    want = {
        r["mk_hash"]
        for r in rows["raw_statements"]
        if r["reading_id"] is not None
    }
    # raw_statements carries its own mk_hash; disambiguate by source frame
    got = {
        r.mk_hash
        for r in joined.select(dfs["pa_statements"]["mk_hash"]).collect()
    }
    assert got == want


def test_camel_helpers():
    from indra_db_spark.functions.ids import camel_to_snake, make_statement_camel

    assert make_statement_camel("increase_amount") == "IncreaseAmount"
    assert make_statement_camel("phosphorylation") == "Phosphorylation"
    assert camel_to_snake("IncreaseAmount") == "increase_amount"


def test_fk_link_through_repeated_column_names(spark):
    """link() must survive paths where a column name (mk_hash) appears in
    multiple hops (review finding: resolve keys against originating
    frames)."""
    from indra_db_spark.plans.fixtures import (
        build_principal_tables,
        generate_model,
    )
    from indra_db_spark.plans.links import link
    from indra_db_spark.schemas import PRINCIPAL_SCHEMAS

    stmts, papers = generate_model(seed=42)
    rows = build_principal_tables(stmts, papers, seed=42)
    dfs = {
        name: spark.createDataFrame(r, PRINCIPAL_SCHEMAS[name])
        for name, r in rows.items()
    }
    joined = link(dfs, "text_ref", "pa_agents")  # crashed before the fix
    assert joined.count() > 0


def test_camel_idempotent():
    from indra_db_spark.functions.ids import make_statement_camel

    assert make_statement_camel("IncreaseAmount") == "IncreaseAmount"
    assert make_statement_camel(make_statement_camel("increase_amount")) == (
        "IncreaseAmount"
    )
