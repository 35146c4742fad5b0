"""Concrete knowledge-base managers beyond TAS/SIGNOR/TRRUST (reference:
cli/knowledgebase.py:190-737 — CBNManager, BiogridManager,
PathwayCommonsManager, CTDManager, DrugBankManager, VirHostNetManager,
PhosphoElmManager, HPRDManager, BelLcManager, PhosphositeManager,
RlimspManager, DgiManager, CrogManager, ConibManager, UbiBrowserManager).

Scope of the port: the reference managers FETCH over HTTP and delegate the
low-level file parsing to the public ``indra.sources.*`` processors; their
own portable logic is source filtering, ``_expanded`` evidence flattening
(cli/knowledgebase.py:612-621 — one evidence per statement), and
``extract_duplicates(KeyFunc.mk_and_one_ev_src)`` dedup.  Here each manager
is file-backed (the sandbox has no network; point it at the downloaded dump
in production) and parses the PUBLIC dump format its upstream processor
consumes — JGIF for CBN, BioGRID tab3, PSI-MITAB for VirHostNet, CTD csv,
DrugBank XML, phospho.ELM dump TSV, HPRD flat files, PyBEL node-link JSON
for the BEL corpora and CONIB, RLIMS-P JSONL, DGI interactions TSV, CRoG
INDRA-statement JSON, and UbiBrowser literature TSVs.  For the two
BioPAX-OWL sources (Pathway Commons, PhosphositePlus) the OWL graph
extraction lives in a Java library even in the reference (Paxtools via
indra.sources.biopax); the file-based equivalents parsed here are the
publisher's flat exports (PC extended SIF, PSP kinase-substrate dataset)
with the manager's own filter semantics (PathwayCommonsManager.skips,
cli/knowledgebase.py:272-288) applied — a declared parity boundary.

Every ``get_statements`` yields the framework dict shape (see
``knowledgebase.KnowledgebaseManager.get_statements``): one evidence per
dict, already "_expanded"."""

from __future__ import annotations

import csv
import gzip
import json
import os
from collections.abc import Iterator

from indra_db_spark.sources.knowledgebase import FileKnowledgebaseManager

__all__ = [
    "CbnManager",
    "BiogridManager",
    "PathwayCommonsManager",
    "CTDManager",
    "DrugBankManager",
    "VirHostNetManager",
    "PhosphoElmManager",
    "HPRDManager",
    "BelLcManager",
    "PhosphositeManager",
    "RlimspManager",
    "DgiManager",
    "CrogManager",
    "ConibManager",
    "UbiBrowserManager",
]


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


# --------------------------------------------------------------- BEL family

#: BEL relation -> statement type (the subset the INDRA PyBEL processor
#: turns into binary statements; unlisted relations are skipped)
BEL_RELATIONS = {
    "increases": "Activation",
    "directlyIncreases": "Activation",
    "decreases": "Inhibition",
    "directlyDecreases": "Inhibition",
    # NB: bare "regulates" is deliberately absent — it maps to INDRA's
    # abstract Regulation class, which is not a concrete statement type
    # (schemas.TYPE_REGISTRY) and would surface as a NULL type_num
    # downstream; like the INDRA PyBEL processor, ambiguous-polarity
    # edges are skipped
    "association": "Complex",
    "hasComponent": "Complex",
}


def _bel_nodelink_statements(payload: dict, source_api: str) -> Iterator[dict]:
    """Statements from a PyBEL node-link JSON graph: ``nodes`` with a
    concept {namespace, name}, ``links`` with (source, target, relation,
    citation, evidence).  Mirrors what process_pybel_graph extracts at the
    grain this engine models (type + agents + pmid evidence)."""
    nodes = payload.get("nodes") or []

    def _name(idx) -> str | None:
        if not isinstance(idx, int) or idx >= len(nodes):
            return None
        node = nodes[idx]
        concept = node.get("concept") or {}
        return concept.get("name") or node.get("name")

    def _grounding(idx) -> dict:
        node = nodes[idx]
        concept = node.get("concept") or {}
        g = {"NAME": concept.get("name") or node.get("name")}
        ns = (concept.get("namespace") or "").upper()
        ident = concept.get("identifier")
        if ns and ident:
            g[ns] = ident
        return g

    for link in payload.get("links") or []:
        stype = BEL_RELATIONS.get(link.get("relation"))
        if stype is None:
            continue
        a, b = _name(link.get("source")), _name(link.get("target"))
        if not a or not b:
            continue
        ev: dict = {"source_api": source_api}
        citation = link.get("citation") or {}
        db = (citation.get("db") or citation.get("namespace") or "").lower()
        cid = citation.get("id") or citation.get("identifier")
        if db == "pubmed" and cid:
            # CONIB ships PMIDs with stray spaces; strip like the
            # reference's fix (cli/knowledgebase.py:690-696)
            ev["pmid"] = str(cid).strip()
        if link.get("evidence"):
            ev["annotations"] = {"text": link["evidence"]}
        yield {
            "type": stype,
            "agents": [a, b],
            "agent_groundings": [
                _grounding(link["source"]),
                _grounding(link["target"]),
            ],
            "evidence": ev,
        }


class CbnManager(FileKnowledgebaseManager):
    """Causal Bionet: a directory (the unzipped Human archive) of JGIF
    graph files (reference: cli/knowledgebase.py:190-244 — download zip,
    process every .jgf/.jgif member).  JGIF shape: ``{"graph": {"edges":
    [{"source", "target", "relation", "metadata": {"evidences": [...]}}]}}``
    with node labels as entity names; one statement per edge evidence
    (``_expanded``)."""

    short_name = "cbn"
    full_name = "Causal Bionet"
    source_api = "bel"

    def get_statements(self) -> Iterator[dict]:
        names = sorted(
            n
            for n in os.listdir(self.path)
            if n.endswith((".jgf", ".jgif"))
        )
        for fname in names:
            with _open(os.path.join(self.path, fname)) as f:
                payload = json.load(f)
            graph = payload.get("graph") or {}
            labels = {
                n.get("id"): n.get("label") or n.get("id")
                for n in graph.get("nodes") or []
            }
            for edge in graph.get("edges") or []:
                stype = BEL_RELATIONS.get(edge.get("relation"))
                if stype is None:
                    continue
                a = labels.get(edge.get("source"))
                b = labels.get(edge.get("target"))
                if not a or not b:
                    continue
                meta = edge.get("metadata") or {}
                evidences = meta.get("evidences") or [{}]
                for evd in evidences:
                    ev: dict = {"source_api": "bel"}
                    citation = evd.get("citation") or {}
                    if (citation.get("type") or "").lower() == "pubmed" and citation.get("id"):
                        ev["pmid"] = str(citation["id"])
                    if evd.get("summary_text"):
                        ev["annotations"] = {"text": evd["summary_text"]}
                    yield {
                        "type": stype,
                        "agents": [a, b],
                        "agent_groundings": [{"NAME": a}, {"NAME": b}],
                        "evidence": ev,
                    }

    def get_source_version(self) -> str:
        import hashlib

        h = hashlib.md5()
        for fname in sorted(os.listdir(self.path)):
            if fname.endswith((".jgf", ".jgif")):
                with open(os.path.join(self.path, fname), "rb") as f:
                    h.update(f.read())
        return h.hexdigest()


class BelLcManager(FileKnowledgebaseManager):
    """BEL large + small corpus (reference: cli/knowledgebase.py:500-520 —
    process_large_corpus() + process_small_corpus(), concatenated before
    dedup).  Both corpora are PyBEL node-link JSON files."""

    short_name = "bel_lc"
    full_name = "BEL Large Corpus"
    source_api = "bel"

    def __init__(self, path: str, small_path: str | None = None):
        super().__init__(path)
        self.small_path = small_path

    def get_statements(self) -> Iterator[dict]:
        for path in filter(None, [self.path, self.small_path]):
            with _open(path) as f:
                payload = json.load(f)
            yield from _bel_nodelink_statements(payload, "bel")


class ConibManager(FileKnowledgebaseManager):
    """CONIB curated neurodegeneration BEL graph (reference:
    cli/knowledgebase.py:672-709): one node-link JSON; PMIDs stripped of
    stray whitespace (:690-696)."""

    short_name = "conib"
    full_name = "CONIB"
    source_api = "bel"

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            payload = json.load(f)
        yield from _bel_nodelink_statements(payload, "bel")


# ----------------------------------------------------- interaction networks


class BiogridManager(FileKnowledgebaseManager):
    """BioGRID tab3 dump (reference: cli/knowledgebase.py:247-265 via
    indra.sources.biogrid).  Physical interactions become Complex
    statements; genetic interactions are skipped (the INDRA processor's
    physical-only rule).  Columns used: ``Official Symbol Interactor A/B``,
    ``Entrez Gene Interactor A/B``, ``Experimental System Type``,
    ``Publication Source`` (PUBMED:id)."""

    short_name = "biogrid"
    full_name = "BioGRID"

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                if (row.get("Experimental System Type") or "").lower() != "physical":
                    continue
                a = row.get("Official Symbol Interactor A")
                b = row.get("Official Symbol Interactor B")
                if not a or not b or a == "-" or b == "-":
                    continue
                ga, gb = {"NAME": a}, {"NAME": b}
                if row.get("Entrez Gene Interactor A"):
                    ga["EGID"] = row["Entrez Gene Interactor A"]
                if row.get("Entrez Gene Interactor B"):
                    gb["EGID"] = row["Entrez Gene Interactor B"]
                ev: dict = {"source_api": "biogrid"}
                pub = row.get("Publication Source") or ""
                if pub.upper().startswith("PUBMED:"):
                    ev["pmid"] = pub.split(":", 1)[1]
                yield {
                    "type": "Complex",
                    "agents": [a, b],
                    "agent_groundings": [ga, gb],
                    "evidence": ev,
                }


class VirHostNetManager(FileKnowledgebaseManager):
    """VirHostNet virus-host interactions, PSI-MITAB 2.5 (reference:
    cli/knowledgebase.py:383-399 via indra.sources.virhostnet).  Columns:
    id A/B (``uniprotkb:P12345``), alias A/B (``uniprotkb:NAME(gene
    name)``), pub ids (``pubmed:123``), taxid A/B."""

    short_name = "vhn"
    full_name = "VirHostNet"
    source_api = "virhostnet"

    @staticmethod
    def _field(raw: str, key: str) -> str | None:
        for part in (raw or "").split("|"):
            if part.startswith(key + ":"):
                return part.split(":", 1)[1]
        return None

    @staticmethod
    def _gene_name(alias_raw: str) -> str | None:
        # uniprotkb:MKKS_HUMAN|uniprotkb:MKKS(gene name)|...
        for part in (alias_raw or "").split("|"):
            if part.endswith("(gene name)"):
                return part.split(":", 1)[1].split("(", 1)[0]
        return None

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            for row in csv.reader(f, delimiter="\t"):
                if len(row) < 15 or row[0].startswith("#"):
                    continue
                up_a = self._field(row[0], "uniprotkb")
                up_b = self._field(row[1], "uniprotkb")
                name_a = self._gene_name(row[4]) or up_a
                name_b = self._gene_name(row[5]) or up_b
                if not name_a or not name_b:
                    continue
                ev: dict = {"source_api": "virhostnet"}
                pmid = self._field(row[8], "pubmed")
                if pmid:
                    ev["pmid"] = pmid
                ga = {"NAME": name_a}
                gb = {"NAME": name_b}
                if up_a:
                    ga["UP"] = up_a
                if up_b:
                    gb["UP"] = up_b
                yield {
                    "type": "Complex",
                    "agents": [name_a, name_b],
                    "agent_groundings": [ga, gb],
                    "evidence": ev,
                }


class HPRDManager(FileKnowledgebaseManager):
    """HPRD flat files (reference: cli/knowledgebase.py:429-497 —
    tar of FLAT_FILES with ID mappings, binary PPIs, PTMs, complexes;
    processed by indra.sources.hprd.process_flat_files).  ``path`` is the
    extracted FLAT_FILES directory.  PPIs -> Complex, PTMs -> the named
    modification with residue/position, complexes -> one Complex per
    complex id."""

    short_name = "hprd"
    full_name = "HPRD"

    #: HPRD modification labels -> statement types (the subset the INDRA
    #: processor maps; others are skipped)
    MOD_TYPES = {
        "phosphorylation": "Phosphorylation",
        "dephosphorylation": "Dephosphorylation",
        "ubiquitination": "Ubiquitination",
        "acetylation": "Acetylation",
        "methylation": "Methylation",
        "glycosylation": "Glycosylation",
        "sumoylation": "Sumoylation",
    }

    def _rows(self, fname: str) -> Iterator[list[str]]:
        fpath = os.path.join(self.path, fname)
        if not os.path.exists(fpath):
            return
        with open(fpath, newline="") as f:
            for row in csv.reader(f, delimiter="\t"):
                if row:
                    yield row

    def get_statements(self) -> Iterator[dict]:
        # HPRD_ID_MAPPINGS.txt: hprd_id, symbol, refseq, entrez, ...
        symbols: dict[str, str] = {}
        for row in self._rows("HPRD_ID_MAPPINGS.txt"):
            if len(row) >= 2 and row[1] != "-":
                symbols[row[0]] = row[1]

        def _agent(hprd_id: str, symbol: str) -> tuple[str, dict] | None:
            name = symbol if symbol and symbol != "-" else symbols.get(hprd_id)
            if not name:
                return None
            g = {"NAME": name}
            if hprd_id and hprd_id != "-":
                g["HPRD"] = hprd_id
            return name, g

        # BINARY_PROTEIN_PROTEIN_INTERACTIONS.txt:
        # sym_a, hprd_a, refseq_a, sym_b, hprd_b, refseq_b, expt, pmids
        for row in self._rows("BINARY_PROTEIN_PROTEIN_INTERACTIONS.txt"):
            if len(row) < 6:
                continue
            a = _agent(row[1], row[0])
            b = _agent(row[4], row[3])
            if not a or not b:
                continue
            pmids = row[7].split(",") if len(row) > 7 else [""]
            for pmid in pmids or [""]:
                ev: dict = {"source_api": "hprd"}
                if pmid.strip():
                    ev["pmid"] = pmid.strip()
                yield {
                    "type": "Complex",
                    "agents": [a[0], b[0]],
                    "agent_groundings": [a[1], b[1]],
                    "evidence": ev,
                }

        # POST_TRANSLATIONAL_MODIFICATIONS.txt: sub_hprd, sub_sym, sub_iso,
        # sub_refseq, site, residue, enz_sym, enz_hprd, mod_type,
        # experiment_type, reference_id (comma-joined PMIDs) — the PMIDs
        # live at column 10; column 9 is the experiment type ("in vivo"/
        # "in vitro"), NOT a reference
        for row in self._rows("POST_TRANSLATIONAL_MODIFICATIONS.txt"):
            if len(row) < 9:
                continue
            stype = self.MOD_TYPES.get((row[8] or "").strip().lower())
            if stype is None:
                continue
            sub = _agent(row[0], row[1])
            enz = _agent(row[7], row[6])
            if not sub or not enz:
                continue
            ev = {"source_api": "hprd"}
            pmids = row[10].split(",") if len(row) > 10 else []
            ann: dict = {}
            if row[5].strip():
                ann["residue"] = row[5].strip()
            if row[4].strip() and row[4].strip() != "-":
                ann["position"] = row[4].strip()
            if ann:
                ev["annotations"] = ann
            for pmid in [p for p in pmids if p.strip()] or [""]:
                evi = dict(ev)
                if pmid.strip():
                    evi["pmid"] = pmid.strip()
                yield {
                    "type": stype,
                    "agents": [enz[0], sub[0]],
                    "agent_groundings": [enz[1], sub[1]],
                    "evidence": evi,
                }

        # PROTEIN_COMPLEXES.txt: complex_id, hprd_id, symbol, refseq
        complexes: dict[str, list[tuple[str, dict]]] = {}
        for row in self._rows("PROTEIN_COMPLEXES.txt"):
            if len(row) < 3:
                continue
            member = _agent(row[1], row[2])
            if member:
                complexes.setdefault(row[0], []).append(member)
        for comp_id, members in sorted(complexes.items()):
            if len(members) < 2:
                continue
            yield {
                "type": "Complex",
                "agents": [m[0] for m in members],
                "agent_groundings": [m[1] for m in members],
                "evidence": {
                    "source_api": "hprd",
                    "annotations": {"complex_id": comp_id},
                },
            }


# ----------------------------------------------------------- drug / chem KBs


class CTDManager(FileKnowledgebaseManager):
    """CTD chemical-gene interactions (reference: cli/knowledgebase.py:
    325-354 — three subsets processed via indra.sources.ctd).  ``path`` is
    the chem-gene CSV (CTD_chem_gene_ixns): ChemicalName, ChemicalID,
    CasRN, GeneSymbol, GeneID, GeneForms, Organism, OrganismID,
    Interaction, InteractionActions ('^'-joined pairs like
    ``increases^phosphorylation``), PubMedIDs ('|'-joined)."""

    short_name = "ctd"
    full_name = "CTD"

    #: (direction, process) -> statement type; the INDRA CTD processor's
    #: action table at the grain this engine models
    ACTIONS = {
        ("increases", "phosphorylation"): "Phosphorylation",
        ("decreases", "phosphorylation"): "Dephosphorylation",
        ("increases", "activity"): "Activation",
        ("decreases", "activity"): "Inhibition",
        ("increases", "expression"): "IncreaseAmount",
        ("decreases", "expression"): "DecreaseAmount",
        ("increases", "ubiquitination"): "Ubiquitination",
        ("increases", "acetylation"): "Acetylation",
        ("increases", "methylation"): "Methylation",
    }

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            # CTD csvs carry '#' comment headers; the column line is the
            # last comment before data
            header: list[str] | None = None
            reader = csv.reader(f)
            for row in reader:
                if not row:
                    continue
                if row[0].startswith("#"):
                    if len(row) > 1 or "," in row[0].strip("# "):
                        header = [c.strip("# ") for c in row]
                        header[0] = header[0].lstrip("# ")
                    continue
                if header is None:
                    header = [
                        "ChemicalName", "ChemicalID", "CasRN", "GeneSymbol",
                        "GeneID", "GeneForms", "Organism", "OrganismID",
                        "Interaction", "InteractionActions", "PubMedIDs",
                    ]
                rec = dict(zip(header, row))
                chem = rec.get("ChemicalName")
                gene = rec.get("GeneSymbol")
                if not chem or not gene:
                    continue
                pmids = [
                    p for p in (rec.get("PubMedIDs") or "").split("|") if p
                ]
                for action in (rec.get("InteractionActions") or "").split("|"):
                    parts = action.split("^")
                    if len(parts) != 2:
                        continue
                    stype = self.ACTIONS.get((parts[0], parts[1]))
                    if stype is None:
                        continue
                    gch = {"NAME": chem}
                    if rec.get("ChemicalID"):
                        gch["MESH"] = rec["ChemicalID"]
                    gg = {"NAME": gene}
                    if rec.get("GeneID"):
                        gg["EGID"] = rec["GeneID"]
                    for pmid in pmids or [""]:
                        ev: dict = {"source_api": "ctd"}
                        if pmid:
                            ev["pmid"] = pmid
                        yield {
                            "type": stype,
                            "agents": [chem, gene],
                            "agent_groundings": [gch, gg],
                            "evidence": ev,
                        }


class DrugBankManager(FileKnowledgebaseManager):
    """DrugBank XML (reference: cli/knowledgebase.py:357-380 via
    indra.sources.drugbank.process_xml).  One Inhibition per
    (drug, target) with known pharmacological action; the action label
    rides the annotations."""

    short_name = "drugbank"
    full_name = "DrugBank"

    NS = "{http://www.drugbank.ca}"

    def get_statements(self) -> Iterator[dict]:
        import xml.etree.ElementTree as ET

        tree = ET.parse(self.path)
        for drug in tree.getroot().findall(f"{self.NS}drug"):
            name_el = drug.find(f"{self.NS}name")
            if name_el is None or not name_el.text:
                continue
            drug_name = name_el.text
            dbid = None
            for id_el in drug.findall(f"{self.NS}drugbank-id"):
                if id_el.get("primary") == "true":
                    dbid = id_el.text
                    break
            targets = drug.find(f"{self.NS}targets")
            if targets is None:
                continue
            for target in targets.findall(f"{self.NS}target"):
                poly = target.find(f"{self.NS}polypeptide")
                gene_el = (
                    poly.find(f"{self.NS}gene-name") if poly is not None else None
                )
                tname_el = target.find(f"{self.NS}name")
                tname = (
                    gene_el.text
                    if gene_el is not None and gene_el.text
                    else (tname_el.text if tname_el is not None else None)
                )
                if not tname:
                    continue
                actions = [
                    a.text
                    for a in target.findall(f"{self.NS}actions/{self.NS}action")
                    if a.text
                ]
                gd = {"NAME": drug_name}
                if dbid:
                    gd["DRUGBANK"] = dbid
                gt = {"NAME": tname}
                if poly is not None and poly.get("id"):
                    gt["UP"] = poly.get("id")
                ev: dict = {"source_api": "drugbank"}
                if actions:
                    ev["annotations"] = {"actions": sorted(actions)}
                yield {
                    "type": "Inhibition",
                    "agents": [drug_name, tname],
                    "agent_groundings": [gd, gt],
                    "evidence": ev,
                }


class DgiManager(FileKnowledgebaseManager):
    """DGI drug-gene interactions TSV (reference: cli/knowledgebase.py:
    624-645 via indra.sources.dgi.process_version).  Columns:
    ``gene_name, entrez_id, drug_name, drug_concept_id,
    interaction_types, PMIDs``."""

    short_name = "dgi"
    full_name = "DGI"

    TYPE_MAP = {
        "inhibitor": "Inhibition",
        "antagonist": "Inhibition",
        "blocker": "Inhibition",
        "channel blocker": "Inhibition",
        "negative modulator": "Inhibition",
        "agonist": "Activation",
        "activator": "Activation",
        "positive modulator": "Activation",
        "binder": "Complex",
    }

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                gene = row.get("gene_name")
                drug = row.get("drug_name")
                if not gene or not drug:
                    continue
                itypes = [
                    t.strip().lower()
                    for t in (row.get("interaction_types") or "").split(",")
                    if t.strip()
                ]
                stypes = {self.TYPE_MAP[t] for t in itypes if t in self.TYPE_MAP}
                if not stypes:
                    continue
                gd = {"NAME": drug}
                if row.get("drug_concept_id"):
                    gd["CHEMBL"] = row["drug_concept_id"].removeprefix("chembl:")
                gg = {"NAME": gene}
                if row.get("entrez_id"):
                    gg["EGID"] = row["entrez_id"]
                pmids = [
                    p for p in (row.get("PMIDs") or "").split("|") if p.strip()
                ]
                for stype in sorted(stypes):
                    for pmid in pmids or [""]:
                        ev: dict = {"source_api": "dgi"}
                        if pmid:
                            ev["pmid"] = pmid.strip()
                        yield {
                            "type": stype,
                            "agents": [drug, gene],
                            "agent_groundings": [gd, gg],
                            "evidence": ev,
                        }


# ------------------------------------------------------- phospho/ubiquitin


class PhosphoElmManager(FileKnowledgebaseManager):
    """phospho.ELM dump (reference: cli/knowledgebase.py:402-425 via
    indra.sources.phosphoelm.process_from_dump).  TSV columns: ``acc,
    sequence, position, code, pmids, kinases, source, species, entry_date``;
    only rows naming a kinase become Phosphorylation statements (the INDRA
    processor's rule), one per PMID."""

    short_name = "pe"
    full_name = "Phospho.ELM"
    source_api = "phosphoelm"

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                kinase = (row.get("kinases") or "").strip()
                acc = (row.get("acc") or "").strip()
                if not kinase or not acc:
                    continue
                ann = {}
                if row.get("code"):
                    ann["residue"] = row["code"]
                if row.get("position"):
                    ann["position"] = row["position"]
                pmids = [
                    p for p in (row.get("pmids") or "").split(";") if p.strip()
                ]
                for pmid in pmids or [""]:
                    ev: dict = {"source_api": "phosphoelm"}
                    if pmid:
                        ev["pmid"] = pmid.strip()
                    if ann:
                        ev["annotations"] = dict(ann)
                    yield {
                        "type": "Phosphorylation",
                        "agents": [kinase, acc],
                        "agent_groundings": [
                            {"NAME": kinase},
                            {"NAME": acc, "UP": acc},
                        ],
                        "evidence": ev,
                    }


class PhosphositeManager(FileKnowledgebaseManager):
    """PhosphositePlus kinase-substrate dataset (reference:
    cli/knowledgebase.py:523-542 processes the BioPAX export
    Kinase_substrates.owl.gz through Paxtools; the flat kinase-substrate
    TSV parsed here is the publisher's equivalent export — declared parity
    boundary).  Columns: ``GENE, KINASE, KIN_ACC_ID, SUBSTRATE, SUB_GENE,
    SUB_ACC_ID, SUB_MOD_RSD (e.g. S473), ...`` — tab file with a few
    preamble lines before the header."""

    short_name = "psp"
    full_name = "Phosphosite Plus"
    source_api = "biopax"

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            lines = f.read().splitlines()
        # skip the licensing preamble: the header line starts with GENE\t
        start = next(
            (i for i, l in enumerate(lines) if l.startswith("GENE\t")), 0
        )
        reader = csv.DictReader(lines[start:], delimiter="\t")
        for row in reader:
            kinase = (row.get("KINASE") or row.get("GENE") or "").strip()
            sub = (row.get("SUB_GENE") or row.get("SUBSTRATE") or "").strip()
            if not kinase or not sub:
                continue
            gk = {"NAME": kinase}
            if row.get("KIN_ACC_ID"):
                gk["UP"] = row["KIN_ACC_ID"]
            gs = {"NAME": sub}
            if row.get("SUB_ACC_ID"):
                gs["UP"] = row["SUB_ACC_ID"]
            ev: dict = {"source_api": "biopax"}
            rsd = (row.get("SUB_MOD_RSD") or "").strip()
            if rsd:
                ev["annotations"] = {
                    "residue": rsd[0],
                    "position": rsd[1:],
                }
            yield {
                "type": "Phosphorylation",
                "agents": [kinase, sub],
                "agent_groundings": [gk, gs],
                "evidence": ev,
            }


class UbiBrowserManager(FileKnowledgebaseManager):
    """UbiBrowser literature E3/DUB files (reference: cli/knowledgebase.py:
    712-736 via indra.sources.ubibrowser; literature.E3.txt +
    literature.DUB.txt).  TSV columns include ``SwissProt AC (E3/DUB)``,
    ``Gene Symbol (E3/DUB)``, ``SwissProt AC (Substrate)``, ``Gene Symbol
    (Substrate)``, ``PMID``.  E3 rows -> Ubiquitination, DUB rows ->
    Deubiquitination."""

    short_name = "ubibrowser"
    full_name = "UbiBrowser"

    def __init__(self, e3_path: str | None = None, dub_path: str | None = None):
        super().__init__(e3_path or dub_path)
        self.e3_path = e3_path
        self.dub_path = dub_path

    def _yield_file(self, path: str, stype: str) -> Iterator[dict]:
        with _open(path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                row = {k.strip(): v for k, v in row.items() if k}
                enz_key = "E3" if stype == "Ubiquitination" else "DUB"
                enz = (
                    row.get(f"Gene Symbol ({enz_key})")
                    or row.get(enz_key)
                    or ""
                ).strip()
                sub = (
                    row.get("Gene Symbol (Substrate)")
                    or row.get("Substrate")
                    or ""
                ).strip()
                if not enz or not sub or enz == "-" or sub == "-":
                    continue
                ge = {"NAME": enz}
                up = (row.get(f"SwissProt AC ({enz_key})") or "").strip()
                if up and up != "-":
                    ge["UP"] = up
                gs = {"NAME": sub}
                up_s = (row.get("SwissProt AC (Substrate)") or "").strip()
                if up_s and up_s != "-":
                    gs["UP"] = up_s
                ev: dict = {"source_api": "ubibrowser"}
                pmid = (row.get("PMID") or "").strip()
                if pmid and pmid != "-":
                    ev["pmid"] = pmid
                yield {
                    "type": stype,
                    "agents": [enz, sub],
                    "agent_groundings": [ge, gs],
                    "evidence": ev,
                }

    def get_statements(self) -> Iterator[dict]:
        if self.e3_path:
            yield from self._yield_file(self.e3_path, "Ubiquitination")
        if self.dub_path:
            yield from self._yield_file(self.dub_path, "Deubiquitination")


# ------------------------------------------------------------- text mining


class RlimspManager(FileKnowledgebaseManager):
    """RLIMS-P phosphorylation text mining (reference:
    cli/knowledgebase.py:545-587 — medline + pmc JSONL exports via
    indra.sources.rlimsp).  Each JSONL line: ``{"docId": ..., "extractions"
    : [{"kinase": {"name":...}, "substrate": {"name":...}, "site":
    "Ser-473", "trigger": ...}]}``; ``id_type`` tags whether docId is a
    pmid or pmcid, exactly like the reference's file list (:550-551)."""

    short_name = "rlimsp"
    full_name = "RLIMS-P"

    def __init__(self, files: list[tuple[str, str]]):
        """``files``: [(path, id_type)] with id_type in {'pmid', 'pmcid'}."""
        super().__init__(files[0][0])
        self.files = files

    def get_statements(self) -> Iterator[dict]:
        for path, id_type in self.files:
            with _open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        entry = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    doc_id = str(entry.get("docId") or "")
                    for ext in entry.get("extractions") or []:
                        kinase = (ext.get("kinase") or {}).get("name")
                        substrate = (ext.get("substrate") or {}).get("name")
                        if not kinase or not substrate:
                            continue
                        ev: dict = {"source_api": "rlimsp"}
                        if doc_id:
                            ev["pmid" if id_type == "pmid" else "pmcid"] = doc_id
                        ann = {}
                        site = ext.get("site")
                        if site and "-" in site:
                            residue, pos = site.split("-", 1)
                            ann = {"residue": residue, "position": pos}
                        if ext.get("trigger"):
                            ann["trigger"] = ext["trigger"]
                        if ann:
                            ev["annotations"] = ann
                        yield {
                            "type": "Phosphorylation",
                            "agents": [kinase, substrate],
                            "agent_groundings": [
                                {"NAME": kinase},
                                {"NAME": substrate},
                            ],
                            "evidence": ev,
                        }


# ------------------------------------------------------------ pathway dumps


class PathwayCommonsManager(FileKnowledgebaseManager):
    """Pathway Commons (reference: cli/knowledgebase.py:268-321 — the
    BioPAX OWL processed through Paxtools; parsed here from the PC
    extended-SIF export, the publisher's flat equivalent — declared parity
    boundary).  The manager's own logic is the source filter: sub-sources
    already ingested directly (psp, hprd, biogrid, ctd, drugbank, …) are
    skipped (``skips``, cli/knowledgebase.py:272-288).

    Extended SIF columns: ``PARTICIPANT_A, INTERACTION_TYPE, PARTICIPANT_B,
    INTERACTION_DATA_SOURCE, INTERACTION_PUBMED_ID, PATHWAY_NAMES``."""

    short_name = "pc"
    full_name = "Pathway Commons"
    source_api = "biopax"

    skips = {
        "psp", "hprd", "biogrid", "phosphosite", "phosphositeplus", "ctd",
        "drugbank",
    }

    SIF_TYPES = {
        "controls-phosphorylation-of": "Phosphorylation",
        "controls-state-change-of": "Activation",
        "controls-expression-of": "IncreaseAmount",
        "in-complex-with": "Complex",
        "interacts-with": "Complex",
    }

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                stype = self.SIF_TYPES.get(row.get("INTERACTION_TYPE") or "")
                if stype is None:
                    continue
                a, b = row.get("PARTICIPANT_A"), row.get("PARTICIPANT_B")
                if not a or not b:
                    continue
                sources = {
                    s.strip().lower()
                    for s in (row.get("INTERACTION_DATA_SOURCE") or "").split(";")
                    if s.strip()
                }
                # the reference skips a statement when its source_sub_id is
                # a skipped source; here every contributing source must be
                # skipped for the row to drop (a row also backed by e.g.
                # reactome is kept)
                if sources and sources <= self.skips:
                    continue
                pmids = [
                    p
                    for p in (row.get("INTERACTION_PUBMED_ID") or "").split(";")
                    if p.strip()
                ]
                for pmid in pmids or [""]:
                    ev: dict = {"source_api": "biopax"}
                    if pmid:
                        ev["pmid"] = pmid.strip()
                    if sources:
                        ev["annotations"] = {
                            "source_sub_id": ";".join(sorted(sources))
                        }
                    yield {
                        "type": stype,
                        "agents": [a, b],
                        "agent_groundings": [{"NAME": a}, {"NAME": b}],
                        "evidence": ev,
                    }


class CrogManager(FileKnowledgebaseManager):
    """CRoG chemical roles (reference: cli/knowledgebase.py:648-669 —
    crog.indra.json is already a list of INDRA statement JSONs).  Converts
    each to the framework dict: subj/obj (or members) names + groundings,
    evidence flattened one-per-statement (``_expanded``)."""

    short_name = "crog"
    full_name = "CRoG"

    @staticmethod
    def _agent(aj: dict) -> tuple[str, dict] | None:
        name = aj.get("name")
        if not name:
            return None
        g = {"NAME": name}
        for ns, val in (aj.get("db_refs") or {}).items():
            if ns != "TEXT":
                g[ns] = val
        return name, g

    def get_statements(self) -> Iterator[dict]:
        with _open(self.path) as f:
            payload = json.load(f)
        for sj in payload:
            stype = sj.get("type")
            if not stype:
                continue
            if "members" in sj:
                agents = [self._agent(m) for m in sj["members"]]
            else:
                agents = [
                    self._agent(sj[k]) for k in ("subj", "obj") if k in sj
                ]
            agents = [a for a in agents if a]
            if len(agents) < 2:
                continue
            evs = sj.get("evidence") or [{}]
            for evj in evs:
                ev: dict = {"source_api": "crog"}
                if evj.get("pmid"):
                    ev["pmid"] = str(evj["pmid"])
                if evj.get("text"):
                    ev["annotations"] = {"text": evj["text"]}
                yield {
                    "type": stype,
                    "agents": [a[0] for a in agents],
                    "agent_groundings": [a[1] for a in agents],
                    "evidence": ev,
                }
