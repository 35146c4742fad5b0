"""PubMed XML source: parse baseline/update article XML into text_ref rows
and MeSH annotations (reference: readonly_dumping/readonly_dumping.py:
1549-1640 download + :1795-1803 per-PMID MeSH extraction; the reference
parses driver-side with a Python loop).

Spark shape: the *download* is driver-side (network; STUBBED here — no
network in this environment), but parsing distributes: one ``mapInPandas``
over a DataFrame of XML document strings, stdlib ``xml.etree`` per batch.
At production scale (~1,200 baseline files x ~30 MB gz) that is one task
per file — exactly the right granularity.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MESH_ANNOTATION_SCHEMA = StructType(
    [
        StructField("pmid_num", IntegerType()),
        StructField("mesh_id", StringType()),
        StructField("mesh_num", IntegerType()),
        StructField("major_topic", BooleanType()),
        StructField("is_concept", BooleanType()),
    ]
)

ARTICLE_SCHEMA = StructType(
    [
        StructField("pmid_num", IntegerType()),
        StructField("doi", StringType()),
        StructField("title", StringType()),
    ]
)


def download_baseline(*_args, **_kwargs):  # pragma: no cover - network stub
    """Driver-side download of PubMed baseline+update files with md5
    verification (readonly_dumping.py:1549-1640).  Requires network access;
    not available in this environment."""
    raise NotImplementedError(
        "PubMed download needs network access; feed XML strings to "
        "parse_mesh_annotations/parse_articles instead"
    )


def _iter_articles(xml_text: str):
    root = ET.fromstring(xml_text)
    for art in root.iter("PubmedArticle"):
        pmid_el = art.find(".//PMID")
        if pmid_el is None or not (pmid_el.text or "").isdigit():
            continue
        yield int(pmid_el.text), art


def _mesh_rows(pmid: int, art) -> Iterator[tuple]:
    for heading in art.iter("MeshHeading"):
        desc = heading.find("DescriptorName")
        if desc is None:
            continue
        ui = desc.get("UI", "")
        if not ui or ui[0] not in "DC":
            continue
        yield (
            pmid,
            ui,
            int(ui[1:]),
            desc.get("MajorTopicYN", "N") == "Y",
            ui[0] == "C",
        )


def parse_mesh_annotations(
    xml_docs: DataFrame, xml_col: str = "xml"
) -> DataFrame:
    """(pmid_num, mesh_id, mesh_num, major_topic, is_concept) rows from a
    DataFrame of PubMed XML document strings."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                row
                for xml_text in pdf[xml_col]
                for pmid, art in _iter_articles(xml_text)
                for row in _mesh_rows(pmid, art)
            ]
            yield pd.DataFrame(
                rows, columns=[f.name for f in MESH_ANNOTATION_SCHEMA.fields]
            )

    return xml_docs.mapInPandas(_batches, MESH_ANNOTATION_SCHEMA)


def parse_articles(xml_docs: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(pmid_num, doi, title) text-ref candidate rows."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for xml_text in pdf[xml_col]:
                for pmid, art in _iter_articles(xml_text):
                    doi = None
                    for aid in art.iter("ArticleId"):
                        if aid.get("IdType") == "doi":
                            doi = aid.text
                    title_el = art.find(".//ArticleTitle")
                    rows.append(
                        (pmid, doi, title_el.text if title_el is not None else None)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ARTICLE_SCHEMA.fields]
            )

    return xml_docs.mapInPandas(_batches, ARTICLE_SCHEMA)


def xml_documents(spark: SparkSession, texts: list[str]) -> DataFrame:
    """Wrap already-downloaded XML strings as the 1-column input frame."""
    from indra_db_spark.session import local_artifact_df

    return local_artifact_df(
        spark,
        [(t,) for t in texts],
        StructType([StructField("xml", StringType())]),
    )
