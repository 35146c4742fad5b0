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


# ---------------------------------------------------- concrete KB managers

TAS_CSV = """chembl_id,compound_name,gene_name,hgnc_id,class_min
CHEMBL1,Vemurafenib,BRAF,1097,1
CHEMBL2,Dabrafenib,BRAF,1097,2
CHEMBL3,Sorafenib,RAF1,9829,5
CHEMBL4,,MAP2K1,6840,1
CHEMBL5,Trametinib,MAP2K1,6840,1
"""

SIGNOR_CSV = """entity_a,id_a,database_a,entity_b,id_b,database_b,effect,mechanism,pmid
MEK,P36507,UNIPROT,ERK,P28482,UNIPROT,up-regulates activity,phosphorylation,111
BRAF,P15056,UNIPROT,MEK,P36507,UNIPROT,up-regulates,,222
TP53,P04637,UNIPROT,MDM2,Q00987,UNIPROT,down-regulates quantity,,333
FOO,X1,UNIPROT,BAR,X2,UNIPROT,unknown,,444
RAF1,P04049,UNIPROT,MAP2K1,Q02750,UNIPROT,,binding,555
"""

SIGNOR_COMPLEXES_CSV = """complex_id,components
SIGNOR-C1,BRAF;RAF1
SIGNOR-C2,ERK
"""

TRRUST_TSV = (
    "MYC\tTERT\tActivation\t777;888\n"
    "TP53\tCDKN1A\tActivation\t999\n"
    "REST\tSCN2A\tRepression\t123\n"
    "ATF1\tCCND1\tUnknown\t456\n"
)


def _kb_fixtures(tmp_path):
    from indra_db_spark.sources.knowledgebase import (
        SignorManager,
        TasManager,
        TrrustManager,
    )

    tas = tmp_path / "tas.csv"
    tas.write_text(TAS_CSV)
    signor = tmp_path / "signor.csv"
    signor.write_text(SIGNOR_CSV)
    cplx = tmp_path / "signor_complexes.csv"
    cplx.write_text(SIGNOR_COMPLEXES_CSV)
    trrust = tmp_path / "trrust.tsv"
    trrust.write_text(TRRUST_TSV)
    return [
        TasManager(str(tas)),
        SignorManager(str(signor), complexes_path=str(cplx)),
        TrrustManager(str(trrust)),
    ]


def test_tas_manager_binding_and_name_filters(tmp_path):
    tas = _kb_fixtures(tmp_path)[0]
    stmts = list(tas.get_statements())
    # class_min 5 (non-binding) and the unnamed compound are dropped
    assert [s["agents"] for s in stmts] == [
        ["Vemurafenib", "BRAF"],
        ["Dabrafenib", "BRAF"],
        ["Trametinib", "MAP2K1"],
    ]
    assert all(s["type"] == "Inhibition" for s in stmts)
    assert stmts[0]["agent_groundings"][0] == {
        "NAME": "Vemurafenib",
        "CHEMBL": "CHEMBL1",
    }
    assert stmts[0]["agent_groundings"][1] == {"NAME": "BRAF", "HGNC": "1097"}
    assert len(tas.get_source_version()) == 32  # md5 of the dump


def test_signor_manager_type_mapping(tmp_path):
    signor = _kb_fixtures(tmp_path)[1]
    types = {tuple(s["agents"]): s["type"] for s in signor.get_statements()}
    assert types[("MEK", "ERK")] == "Phosphorylation"  # mechanism wins
    assert types[("BRAF", "MEK")] == "Activation"
    assert types[("TP53", "MDM2")] == "Inhibition"
    assert ("FOO", "BAR") not in types  # no effect, no mechanism
    assert types[("RAF1", "MAP2K1")] == "Complex"  # binding mechanism
    assert types[("BRAF", "RAF1")] == "Complex"  # complexes file
    assert ("ERK",) not in types  # 1-member complex dropped
    ev = {
        tuple(s["agents"]): s["evidence"] for s in signor.get_statements()
    }
    assert ev[("MEK", "ERK")]["pmid"] == "111"
    assert ev[("MEK", "ERK")]["source_api"] == "signor"


def test_trrust_manager_per_pmid_expansion(tmp_path):
    trrust = _kb_fixtures(tmp_path)[2]
    stmts = list(trrust.get_statements())
    myc = [s for s in stmts if s["agents"] == ["MYC", "TERT"]]
    assert len(myc) == 2  # one statement per pmid
    assert {s["evidence"]["pmid"] for s in myc} == {"777", "888"}
    assert all(s["type"] == "IncreaseAmount" for s in myc)
    rest = [s for s in stmts if s["agents"] == ["REST", "SCN2A"]]
    assert [s["type"] for s in rest] == ["DecreaseAmount"]
    assert not [s for s in stmts if s["agents"] == ["ATF1", "CCND1"]]  # Unknown


def test_kb_update_is_incremental(spark, tmp_path):
    """The reference's update() inserts only statements whose
    (mk_hash, source_hash) is new (cli/knowledgebase.py:62-76); here as a
    distributed anti-join."""
    from indra_db_spark.sources.knowledgebase import TrrustManager, kb_update, load_knowledgebases

    p = tmp_path / "trrust.tsv"
    p.write_text(TRRUST_TSV)
    mgr = TrrustManager(str(p))
    existing = load_knowledgebases(spark, [mgr])
    n0 = existing.count()
    assert n0 == 4  # 2 MYC pmids + TP53 + REST

    # same source again -> nothing new
    assert kb_update(spark, mgr, 1, existing, start_sid=n0 + 1).count() == 0

    # a new pmid lands on an EXISTING statement + one brand-new statement
    p.write_text(TRRUST_TSV + "MYC\tTERT\tActivation\t555\nE2F1\tMYC\tActivation\t666\n")
    new = kb_update(spark, mgr, 1, existing, start_sid=n0 + 1)
    got = {
        (r.mk_hash, json.loads(bytes(r.json))["evidence"].get("pmid"))
        for r in new.collect()
    }
    assert len(got) == 2
    assert {p for _, p in got} == {"555", "666"}
    # the new-evidence row reuses the existing statement's mk_hash
    myc_hash = {r.mk_hash for r in existing.collect() if b"TERT" in bytes(r.json)}
    assert len(myc_hash) == 1 and (next(iter(myc_hash)), "555") in got


def test_kb_statements_flow_through_assembly(spark, tmp_path):
    """KB-sourced statements must ride the full DAG: union into
    raw_statements -> preprocess/dedup -> readonly tables with per-source
    counts attributed to the KB's db_name."""
    from indra_db_spark.assembly.pipeline import run_assembly
    from indra_db_spark.plans.fixtures import (
        build_principal_tables,
        generate_model,
    )
    from indra_db_spark.schemas import PRINCIPAL_SCHEMAS
    from indra_db_spark.sources.knowledgebase import (
        db_info_rows,
        load_knowledgebases,
    )

    stmts, papers = generate_model(seed=42)
    rows = build_principal_tables(stmts, papers, seed=42)
    principal = {
        name: spark.createDataFrame(r, PRINCIPAL_SCHEMAS[name])
        for name, r in rows.items()
        if name in (
            "text_ref", "text_content", "reading", "db_info",
            "raw_statements", "mesh_ref_annotations",
        )
    }
    managers = _kb_fixtures(tmp_path)
    db0 = max(r["id"] for r in rows["db_info"]) + 1
    sid0 = max(r["sid"] for r in rows["raw_statements"]) + 1
    kb_raw = load_knowledgebases(
        spark, managers, start_sid=sid0, start_db_info_id=db0
    )
    principal["raw_statements"] = principal["raw_statements"].unionByName(kb_raw)
    principal["db_info"] = principal["db_info"].unionByName(
        spark.createDataFrame(
            db_info_rows(managers, start_id=db0), PRINCIPAL_SCHEMAS["db_info"]
        )
    )

    from collections import Counter

    built = run_assembly(principal)
    by_src = Counter(
        r.src for r in built["raw_stmt_src"].collect() if r.sid >= sid0
    )
    # every manager's source label shows up with its per-evidence counts
    # (tas: 3 binding rows; signor: 4 data rows + 1 complex; trrust: 4
    # pmid-expanded rows)
    assert by_src["tas"] == 3
    assert by_src["signor"] == 5
    assert by_src["trrust"] == 4
    # and the KB statements reach source_meta attributed to their source
    kb_hashes = {r.mk_hash for r in kb_raw.collect()}
    sm = built["source_meta"].filter("src_json['tas'] >= 1").collect()
    assert {r.mk_hash for r in sm} & kb_hashes
    tr = built["source_meta"].filter("src_json['trrust'] >= 1").collect()
    assert {r.mk_hash for r in tr} <= kb_hashes and tr
