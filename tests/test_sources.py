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
