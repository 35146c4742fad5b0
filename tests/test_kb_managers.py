"""Fixture-driven parity tests for the concrete knowledge-base managers
(reference: cli/knowledgebase.py:190-737).  Each test writes a small dump in
the PUBLIC format the upstream source publishes and asserts the manager's
parse/filter semantics; the integration test at the bottom unions all
managers through load_knowledgebases."""

from __future__ import annotations

import gzip
import json

import pytest

from indra_db_spark.sources.knowledgebase import (
    ALL_MANAGER_CLASSES,
    BelLcManager,
    BiogridManager,
    CbnManager,
    ConibManager,
    CrogManager,
    CTDManager,
    DgiManager,
    DrugBankManager,
    HPRDManager,
    PathwayCommonsManager,
    PhosphoElmManager,
    PhosphositeManager,
    RlimspManager,
    SignorManager,
    TasManager,
    TrrustManager,
    UbiBrowserManager,
    VirHostNetManager,
    load_knowledgebases,
)


def test_all_manager_roster_matches_reference():
    # reference __all__ + DgiManager/CrogManager/ConibManager/UbiBrowserManager
    # (cli/knowledgebase.py:1-5, 624-737) = 18 concrete managers
    assert len(ALL_MANAGER_CLASSES) == 18
    shorts = {m.short_name for m in ALL_MANAGER_CLASSES}
    assert shorts == {
        "tas", "signor", "trrust", "cbn", "biogrid", "pc", "ctd",
        "drugbank", "vhn", "pe", "hprd", "bel_lc", "psp", "rlimsp",
        "dgi", "crog", "conib", "ubibrowser",
    }


# ------------------------------------------------------------------ fixtures


def _cbn_fixture(tmp_path):
    d = tmp_path / "cbn"
    d.mkdir(exist_ok=True)
    graph = {
        "graph": {
            "nodes": [
                {"id": "n1", "label": "TP53"},
                {"id": "n2", "label": "MDM2"},
                {"id": "n3", "label": "AKT1"},
            ],
            "edges": [
                {
                    "source": "n1", "target": "n2", "relation": "increases",
                    "metadata": {"evidences": [
                        {"citation": {"type": "PubMed", "id": 111},
                         "summary_text": "p53 induces MDM2"},
                        {"citation": {"type": "PubMed", "id": 222}},
                    ]},
                },
                {"source": "n2", "target": "n1",
                 "relation": "directlyDecreases", "metadata": {}},
                # unknown relation: skipped
                {"source": "n3", "target": "n1", "relation": "analogous"},
            ],
        }
    }
    (d / "net1.jgif").write_text(json.dumps(graph))
    return CbnManager(str(d))


def test_cbn_jgif_edges_expand_per_evidence(tmp_path):
    stmts = list(_cbn_fixture(tmp_path).get_statements())
    # 2 evidences on edge 1 + 1 default on edge 2; unknown relation dropped
    assert len(stmts) == 3
    assert [s["type"] for s in stmts] == ["Activation", "Activation", "Inhibition"]
    assert stmts[0]["agents"] == ["TP53", "MDM2"]
    assert stmts[0]["evidence"]["pmid"] == "111"
    assert stmts[0]["evidence"]["annotations"]["text"] == "p53 induces MDM2"
    assert stmts[1]["evidence"]["pmid"] == "222"
    assert "pmid" not in stmts[2]["evidence"]
    mgr = _cbn_fixture(tmp_path)
    assert mgr.source_api == "bel" and mgr.short_name == "cbn"


def _biogrid_fixture(tmp_path):
    p = tmp_path / "biogrid.tab3.txt"
    cols = ["#BioGRID Interaction ID", "Entrez Gene Interactor A",
            "Entrez Gene Interactor B", "Official Symbol Interactor A",
            "Official Symbol Interactor B", "Experimental System Type",
            "Publication Source"]
    rows = [
        ["1", "7157", "4193", "TP53", "MDM2", "physical", "PUBMED:333"],
        ["2", "207", "7157", "AKT1", "TP53", "genetic", "PUBMED:444"],
        ["3", "-", "-", "-", "MDM2", "physical", "PUBMED:555"],
    ]
    header = "\t".join(c.lstrip("#") for c in cols)
    p.write_text(header + "\n" + "\n".join("\t".join(r) for r in rows) + "\n")
    return BiogridManager(str(p))


def test_biogrid_physical_only(tmp_path):
    stmts = list(_biogrid_fixture(tmp_path).get_statements())
    # genetic and nameless rows are dropped
    assert len(stmts) == 1
    (s,) = stmts
    assert s["type"] == "Complex"
    assert s["agents"] == ["TP53", "MDM2"]
    assert s["agent_groundings"][0]["EGID"] == "7157"
    assert s["evidence"]["pmid"] == "333"


def _pc_fixture(tmp_path):
    p = tmp_path / "pc.sif.txt"
    header = ("PARTICIPANT_A\tINTERACTION_TYPE\tPARTICIPANT_B\t"
              "INTERACTION_DATA_SOURCE\tINTERACTION_PUBMED_ID\tPATHWAY_NAMES")
    rows = [
        "MAP2K1\tcontrols-phosphorylation-of\tMAPK1\tReactome\t777;888\t",
        # backed only by skipped sources: dropped (cli/knowledgebase.py:272-288)
        "AKT1\tin-complex-with\tTP53\tBioGRID;CTD\t999\t",
        # mixed skipped + kept source survives
        "EGFR\tcontrols-expression-of\tMYC\tdrugbank;Reactome\t\t",
        "FOO\tneighbor-of\tBAR\tReactome\t123\t",  # unmapped type
    ]
    p.write_text(header + "\n" + "\n".join(rows) + "\n")
    return PathwayCommonsManager(str(p))


def test_pathway_commons_skips_filter_and_expansion(tmp_path):
    stmts = list(_pc_fixture(tmp_path).get_statements())
    assert len(stmts) == 3  # 2 pmids of row1 + 1 pmid-less row3
    assert stmts[0]["type"] == "Phosphorylation"
    assert {stmts[0]["evidence"]["pmid"], stmts[1]["evidence"]["pmid"]} == {
        "777", "888"
    }
    assert stmts[2]["type"] == "IncreaseAmount"
    assert stmts[2]["evidence"]["annotations"]["source_sub_id"] == (
        "drugbank;reactome"
    )
    mgr = _pc_fixture(tmp_path)
    assert mgr.source_api == "biopax"


def _ctd_fixture(tmp_path):
    p = tmp_path / "ctd_chem_gene.csv"
    lines = [
        "# CTD chemical-gene interactions",
        "# ChemicalName,ChemicalID,CasRN,GeneSymbol,GeneID,GeneForms,"
        "Organism,OrganismID,Interaction,InteractionActions,PubMedIDs",
        'Aspirin,D001241,50-78-2,PTGS2,5743,protein,Homo sapiens,9606,'
        '"Aspirin decreases activity of PTGS2",decreases^activity,'
        "1001|1002",
        'Dexamethasone,D003907,,NR3C1,2908,protein,Homo sapiens,9606,'
        '"binds",weird^thing,2001',
    ]
    p.write_text("\n".join(lines) + "\n")
    return CTDManager(str(p))


def test_ctd_action_mapping_and_pmid_expansion(tmp_path):
    stmts = list(_ctd_fixture(tmp_path).get_statements())
    assert len(stmts) == 2  # one per pmid; the unmapped action row dropped
    for s in stmts:
        assert s["type"] == "Inhibition"
        assert s["agents"] == ["Aspirin", "PTGS2"]
        assert s["agent_groundings"][0]["MESH"] == "D001241"
    assert {s["evidence"]["pmid"] for s in stmts} == {"1001", "1002"}


DRUGBANK_XML = """<?xml version="1.0" encoding="UTF-8"?>
<drugbank xmlns="http://www.drugbank.ca" version="5.1">
  <drug type="small molecule">
    <drugbank-id primary="true">DB00945</drugbank-id>
    <name>Aspirin</name>
    <targets>
      <target>
        <name>Prostaglandin G/H synthase 2</name>
        <actions><action>inhibitor</action></actions>
        <polypeptide id="P35354">
          <gene-name>PTGS2</gene-name>
        </polypeptide>
      </target>
      <target>
        <name>Unknown receptor</name>
        <actions/>
      </target>
    </targets>
  </drug>
  <drug type="biotech">
    <drugbank-id primary="true">DB00001</drugbank-id>
    <name>Lepirudin</name>
  </drug>
</drugbank>
"""


def test_drugbank_xml_targets(tmp_path):
    p = tmp_path / "drugbank.xml"
    p.write_text(DRUGBANK_XML)
    stmts = list(DrugBankManager(str(p)).get_statements())
    assert len(stmts) == 2  # Lepirudin has no targets
    first = stmts[0]
    assert first["type"] == "Inhibition"
    assert first["agents"] == ["Aspirin", "PTGS2"]
    assert first["agent_groundings"][0]["DRUGBANK"] == "DB00945"
    assert first["agent_groundings"][1]["UP"] == "P35354"
    assert first["evidence"]["annotations"]["actions"] == ["inhibitor"]
    # target without polypeptide falls back to the target name
    assert stmts[1]["agents"] == ["Aspirin", "Unknown receptor"]


def _vhn_fixture(tmp_path):
    p = tmp_path / "vhn.mitab"
    row = "\t".join([
        "uniprotkb:P03070", "uniprotkb:P06400",
        "-", "-",
        "uniprotkb:LT_SV40|uniprotkb:LT(gene name)",
        "uniprotkb:RB1_HUMAN|uniprotkb:RB1(gene name)",
        "psi-mi:MI:0018", "author", "pubmed:2175676",
        "taxid:1891767", "taxid:9606", "psi-mi:MI:0915", "-", "-", "-",
    ])
    short = "\t".join(["uniprotkb:X", "uniprotkb:Y"])  # <15 cols: skipped
    p.write_text(row + "\n" + short + "\n")
    return VirHostNetManager(str(p))


def test_virhostnet_mitab(tmp_path):
    stmts = list(_vhn_fixture(tmp_path).get_statements())
    assert len(stmts) == 1
    (s,) = stmts
    assert s["type"] == "Complex"
    assert s["agents"] == ["LT", "RB1"]
    assert s["agent_groundings"][0]["UP"] == "P03070"
    assert s["evidence"]["pmid"] == "2175676"
    assert s["evidence"]["source_api"] == "virhostnet"


def _pe_fixture(tmp_path):
    p = tmp_path / "phosphoELM_all_2015-04.dump"
    header = "acc\tsequence\tposition\tcode\tpmids\tkinases\tsource\tspecies\tentry_date"
    rows = [
        "P04637\tMEEPQ\t15\tS\t10570149;12810724\tATM\tLTP\tHomo sapiens\t2004-12-31",
        "P04637\tMEEPQ\t20\tS\t555\t\tLTP\tHomo sapiens\t2004-12-31",  # no kinase
    ]
    p.write_text(header + "\n" + "\n".join(rows) + "\n")
    return PhosphoElmManager(str(p))


def test_phosphoelm_kinase_rows_only(tmp_path):
    stmts = list(_pe_fixture(tmp_path).get_statements())
    assert len(stmts) == 2  # 2 pmids on the kinase row; kinase-less dropped
    for s in stmts:
        assert s["type"] == "Phosphorylation"
        assert s["agents"] == ["ATM", "P04637"]
        assert s["evidence"]["annotations"] == {
            "residue": "S", "position": "15"
        }
    assert {s["evidence"]["pmid"] for s in stmts} == {"10570149", "12810724"}


def _hprd_fixture(tmp_path):
    d = tmp_path / "FLAT_FILES"
    d.mkdir()
    (d / "HPRD_ID_MAPPINGS.txt").write_text(
        "00001\tALDH1A1\tNM_000689\t216\n"
        "00002\tTP53\tNM_000546\t7157\n"
        "00003\tMDM2\tNM_002392\t4193\n"
    )
    (d / "BINARY_PROTEIN_PROTEIN_INTERACTIONS.txt").write_text(
        "TP53\t00002\tNM_000546\tMDM2\t00003\tNM_002392\tin vivo\t111,222\n"
    )
    (d / "POST_TRANSLATIONAL_MODIFICATIONS.txt").write_text(
        "00002\tTP53\t1\tNM_000546\t15\tS\tATM\t00004\tPhosphorylation\tin vivo\t333\n"
        "00002\tTP53\t1\tNM_000546\t-\t-\tFOO\t00005\tWeirdification\t-\t444\n"
    )
    (d / "PROTEIN_COMPLEXES.txt").write_text(
        "COM_1\t00002\tTP53\tNM_000546\n"
        "COM_1\t00003\tMDM2\tNM_002392\n"
        "COM_2\t00001\tALDH1A1\tNM_000689\n"  # singleton: dropped
    )
    return HPRDManager(str(d))


def test_hprd_flat_files(tmp_path):
    stmts = list(_hprd_fixture(tmp_path).get_statements())
    # 2 ppi evidences + 1 ptm + 1 complex
    assert len(stmts) == 4
    ppi = [s for s in stmts if s["type"] == "Complex" and len(s["agents"]) == 2
           and "complex_id" not in (s["evidence"].get("annotations") or {})]
    assert {s["evidence"]["pmid"] for s in ppi} == {"111", "222"}
    ptm = [s for s in stmts if s["type"] == "Phosphorylation"]
    assert len(ptm) == 1  # unknown mod type dropped
    assert ptm[0]["agents"] == ["ATM", "TP53"]
    assert ptm[0]["evidence"]["annotations"] == {
        "residue": "S", "position": "15"
    }
    # PMIDs come from column 10 (reference_id); column 9 is the experiment
    # type and must never leak into the pmid field
    assert ptm[0]["evidence"]["pmid"] == "333"
    comp = [s for s in stmts
            if "complex_id" in (s["evidence"].get("annotations") or {})]
    assert len(comp) == 1 and comp[0]["agents"] == ["TP53", "MDM2"]


def _nodelink(tmp_path, fname, pmid="  101 "):
    payload = {
        "nodes": [
            {"concept": {"namespace": "hgnc", "name": "APP",
                         "identifier": "620"}},
            {"concept": {"namespace": "hgnc", "name": "MAPT"}},
        ],
        "links": [
            {"source": 0, "target": 1, "relation": "increases",
             "citation": {"db": "pubmed", "id": pmid},
             "evidence": "APP upregulates tau"},
            {"source": 1, "target": 0, "relation": "partOf"},  # skipped
        ],
    }
    p = tmp_path / fname
    p.write_text(json.dumps(payload))
    return str(p)


def test_bel_corpus_and_conib_nodelink(tmp_path):
    large = _nodelink(tmp_path, "large.json")
    small = _nodelink(tmp_path, "small.json", pmid="202")
    stmts = list(BelLcManager(large, small).get_statements())
    assert len(stmts) == 2  # one per corpus; unknown relation skipped
    assert all(s["type"] == "Activation" for s in stmts)
    assert stmts[0]["agent_groundings"][0] == {"NAME": "APP", "HGNC": "620"}
    # CONIB: the stray-space PMID is stripped (cli/knowledgebase.py:690-696)
    conib = list(ConibManager(large).get_statements())
    assert conib[0]["evidence"]["pmid"] == "101"
    assert ConibManager(large).source_api == "bel"


PSP_KS = """110817
Kinase_Substrate_Dataset downloaded
GENE\tKINASE\tKIN_ACC_ID\tGENE_ID\tKIN_ORGANISM\tSUBSTRATE\tSUB_GENE_ID\tSUB_ACC_ID\tSUB_GENE\tSUB_ORGANISM\tSUB_MOD_RSD\tSITE_GRP_ID\tSITE_+/-7_AA
AKT1\tAkt1\tP31749\t207\thuman\tGSK3B\t2932\tP49841\tGSK3B\thuman\tS9\t447635\tsRARtssFAEPGs
\tAkt1\tP31749\t207\thuman\t\t0\t\t\thuman\tT308\t1\tx
"""


def test_phosphosite_kinase_substrate(tmp_path):
    p = tmp_path / "Kinase_Substrate_Dataset.gz"
    with gzip.open(p, "wt") as f:
        f.write(PSP_KS)
    stmts = list(PhosphositeManager(str(p)).get_statements())
    assert len(stmts) == 1  # substrate-less row dropped
    (s,) = stmts
    assert s["type"] == "Phosphorylation"
    assert s["agents"] == ["Akt1", "GSK3B"]
    assert s["evidence"]["annotations"] == {"residue": "S", "position": "9"}
    assert s["evidence"]["source_api"] == "biopax"


def _rlimsp_fixture(tmp_path):
    med = tmp_path / "rlims.medline.json"
    med.write_text(
        json.dumps({
            "docId": "123", "extractions": [
                {"kinase": {"name": "ATM"}, "substrate": {"name": "TP53"},
                 "site": "Ser-15", "trigger": "phosphorylates"},
                {"kinase": {}, "substrate": {"name": "X"}},  # no kinase name
            ],
        }) + "\nnot json\n"
    )
    pmc = tmp_path / "rlims.pmc.json"
    pmc.write_text(json.dumps({
        "docId": "PMC77", "extractions": [
            {"kinase": {"name": "AKT1"}, "substrate": {"name": "GSK3B"}},
        ],
    }) + "\n")
    return RlimspManager([(str(med), "pmid"), (str(pmc), "pmcid")])


def test_rlimsp_jsonl(tmp_path):
    stmts = list(_rlimsp_fixture(tmp_path).get_statements())
    assert len(stmts) == 2
    med, pmc = stmts
    assert med["evidence"]["pmid"] == "123"
    assert med["evidence"]["annotations"] == {
        "residue": "Ser", "position": "15", "trigger": "phosphorylates"
    }
    assert pmc["evidence"]["pmcid"] == "PMC77"
    assert "pmid" not in pmc["evidence"]


def _dgi_fixture(tmp_path):
    p = tmp_path / "interactions.tsv"
    header = "gene_name\tentrez_id\tdrug_name\tdrug_concept_id\tinteraction_types\tPMIDs"
    rows = [
        "EGFR\t1956\tGEFITINIB\tchembl:CHEMBL939\tinhibitor\t111|222",
        "DRD2\t1813\tHALOPERIDOL\t\tantagonist,binder\t",
        "ABC1\t1\tMYSTERY\t\tpotentiator\t333",  # unmapped type
    ]
    p.write_text(header + "\n" + "\n".join(rows) + "\n")
    return DgiManager(str(p))


def test_dgi_type_mapping(tmp_path):
    stmts = list(_dgi_fixture(tmp_path).get_statements())
    # EGFR: Inhibition x 2 pmids; DRD2: Complex + Inhibition (sorted)
    assert len(stmts) == 4
    egfr = [s for s in stmts if s["agents"][1] == "EGFR"]
    assert {s["evidence"]["pmid"] for s in egfr} == {"111", "222"}
    assert egfr[0]["agent_groundings"][0]["CHEMBL"] == "CHEMBL939"
    drd2_types = [s["type"] for s in stmts if s["agents"][1] == "DRD2"]
    assert drd2_types == ["Complex", "Inhibition"]


def _crog_fixture(tmp_path):
    p = tmp_path / "crog.indra.json"
    payload = [
        {"type": "Activation",
         "subj": {"name": "estradiol", "db_refs": {"CHEBI": "CHEBI:23965",
                                                   "TEXT": "estradiol"}},
         "obj": {"name": "ESR1", "db_refs": {"HGNC": "3467"}},
         "evidence": [{"pmid": 555, "text": "estradiol activates ER"},
                      {"pmid": 556}]},
        {"type": "Complex",
         "members": [{"name": "A"}, {"name": "B"}],
         "evidence": [{}]},
        {"type": "Inhibition", "subj": {"name": "X"}},  # one agent: dropped
    ]
    p.write_text(json.dumps(payload))
    return CrogManager(str(p))


def test_crog_indra_json(tmp_path):
    stmts = list(_crog_fixture(tmp_path).get_statements())
    assert len(stmts) == 3  # 2 expanded evidences + 1 complex
    assert stmts[0]["evidence"]["pmid"] == "555"
    assert stmts[0]["agent_groundings"][0] == {
        "NAME": "estradiol", "CHEBI": "CHEBI:23965"
    }  # TEXT ref dropped
    assert stmts[1]["evidence"]["pmid"] == "556"
    assert stmts[2]["agents"] == ["A", "B"]


def _ubibrowser_fixture(tmp_path):
    e3 = tmp_path / "literature.E3.txt"
    e3.write_text(
        "SwissProt AC (E3)\tGene Symbol (E3)\tSwissProt AC (Substrate)\t"
        "Gene Symbol (Substrate)\tPMID\tSOURCE\n"
        "Q00987\tMDM2\tP04637\tTP53\t12345\tliterature\n"
        "-\t-\tP04637\tTP53\t12346\tliterature\n"
    )
    dub = tmp_path / "literature.DUB.txt"
    dub.write_text(
        "SwissProt AC (DUB)\tGene Symbol (DUB)\tSwissProt AC (Substrate)\t"
        "Gene Symbol (Substrate)\tPMID\tSOURCE\n"
        "Q93009\tUSP7\tP04637\tTP53\t54321\tliterature\n"
    )
    return UbiBrowserManager(str(e3), str(dub))


def test_ubibrowser_e3_and_dub(tmp_path):
    stmts = list(_ubibrowser_fixture(tmp_path).get_statements())
    assert len(stmts) == 2  # the '-' enzyme row is dropped
    ub, dub = stmts
    assert ub["type"] == "Ubiquitination"
    assert ub["agents"] == ["MDM2", "TP53"]
    assert ub["agent_groundings"][0]["UP"] == "Q00987"
    assert ub["evidence"]["pmid"] == "12345"
    assert dub["type"] == "Deubiquitination"
    assert dub["agents"] == ["USP7", "TP53"]


# --------------------------------------------------------------- integration


def test_load_knowledgebases_unions_full_roster(spark, tmp_path):
    """load_knowledgebases over ≥15 concrete managers: one db_info_id per
    manager, dense sids, per-manager (mk_hash, source_hash) dedup
    (cli/knowledgebase.py:146)."""
    tas = tmp_path / "tas.csv"
    tas.write_text(
        "chembl_id,compound_name,gene_name,hgnc_id,class_min\n"
        "CHEMBL25,aspirin,PTGS2,9605,1\n"
        "CHEMBL25,aspirin,PTGS2,9605,1\n"  # exact dup: must collapse
    )
    signor = tmp_path / "signor.csv"
    signor.write_text(
        "entity_a,id_a,database_a,entity_b,id_b,database_b,effect,mechanism,pmid\n"
        "MAP2K1,Q02750,UNIPROT,MAPK1,P28482,UNIPROT,up-regulates,"
        "phosphorylation,101\n"
    )
    trrust = tmp_path / "trrust.tsv"
    trrust.write_text("TP53\tMDM2\tActivation\t102\n")

    managers = [
        TasManager(str(tas)),
        SignorManager(str(signor)),
        TrrustManager(str(trrust)),
        _cbn_fixture(tmp_path),
        _biogrid_fixture(tmp_path),
        _pc_fixture(tmp_path),
        _ctd_fixture(tmp_path),
        _vhn_fixture(tmp_path),
        _pe_fixture(tmp_path),
        _hprd_fixture(tmp_path),
        _rlimsp_fixture(tmp_path),
        _dgi_fixture(tmp_path),
        _crog_fixture(tmp_path),
        _ubibrowser_fixture(tmp_path),
    ]
    db = tmp_path / "drugbank.xml"
    db.write_text(DRUGBANK_XML)
    managers.append(DrugBankManager(str(db)))
    large = _nodelink(tmp_path, "lc.json")
    managers.append(BelLcManager(large))
    managers.append(ConibManager(_nodelink(tmp_path, "conib.json")))
    psp = tmp_path / "ks.gz"
    with gzip.open(psp, "wt") as f:
        f.write(PSP_KS)
    managers.append(PhosphositeManager(str(psp)))

    assert len(managers) == 18
    df = load_knowledgebases(spark, managers)
    rows = df.collect()
    assert len({r.db_info_id for r in rows}) == 18
    # dense, collision-free sids
    sids = sorted(r.sid for r in rows)
    assert sids == list(range(1, len(rows) + 1))
    # the TAS exact duplicate collapsed to one row
    tas_rows = [r for r in rows if r.db_info_id == 1]
    assert len(tas_rows) == 1
    # (mk_hash, source_hash) unique across the union
    keys = [(r.mk_hash, r.source_hash) for r in rows]
    assert len(keys) == len(set(keys))
