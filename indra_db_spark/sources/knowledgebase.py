"""Knowledge-base sources (reference: cli/knowledgebase.py:45-123
``KnowledgebaseManager`` + ~20 subclasses, one per curated database).

Each manager loads its source driver-side (the upstream files are small —
curated databases, not corpora) and yields statement dicts;
``load_knowledgebases`` turns every manager's yield into one union
DataFrame of raw-statement rows ready for the preprocess stage, and
``kb_update`` is the incremental path: only statements whose
(mk_hash, source_hash) pair is not already present are inserted — the
reference's driver-side seen-set filter (cli/knowledgebase.py:62-76)
re-expressed as a distributed anti-join.

The reference managers fetch over HTTP (TAS csv at cli/knowledgebase.py:143,
SIGNOR at :163-186, TRRUST at :656-680); this sandbox has no network, so the
concrete managers here are file-backed with the same parse/filter semantics
— point them at a downloaded dump in production, at a fixture in tests.
"""

from __future__ import annotations

import csv
import json
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indra_db_spark.plans.fixtures import stable_hash
from indra_db_spark.schemas import RAW_STATEMENTS_SCHEMA


class KnowledgebaseManager:
    """One curated source.  ``short_name`` becomes the source label
    (lower-cased into raw_stmt_src, readonly_schema.py:401-407);
    ``source_api`` may differ (reference: CBNManager short_name='cbn',
    source='bel', cli/knowledgebase.py:190-194)."""

    short_name: str = "kb"
    full_name: str = "Knowledge Base"
    source_api: str | None = None  # defaults to short_name

    def get_statements(self) -> Iterable[dict]:  # pragma: no cover - abstract
        """Yield one statement dict per evidence:
        ``{'type': ..., 'agents': [...], 'agent_groundings': [...],
        'evidence': {'source_api': ..., 'pmid': ...}}`` — the reference's
        ``_expanded`` evidence flattening (cli/knowledgebase.py:145)."""
        raise NotImplementedError

    def get_source_version(self) -> str:
        """Content-hash version of the source (the reference md5s the
        downloaded payload, cli/knowledgebase.py:150-186)."""
        raise NotImplementedError


class StaticKnowledgebase(KnowledgebaseManager):
    """Deterministic in-memory manager (tests / fixtures)."""

    def __init__(self, short_name: str, statements: list[dict]):
        self.short_name = short_name
        self.full_name = short_name.upper()
        self._statements = statements

    def get_statements(self) -> Iterable[dict]:
        return iter(self._statements)

    def get_source_version(self) -> str:
        return stable_hash(json.dumps(self._statements, sort_keys=True)).__format__("x")


class FileKnowledgebaseManager(KnowledgebaseManager):
    """Base for file-backed managers: parse a local dump with the same
    row semantics the reference applies to the downloaded payload."""

    def __init__(self, path: str):
        self.path = path

    def get_source_version(self) -> str:
        import hashlib

        with open(self.path, "rb") as f:
            return hashlib.md5(f.read()).hexdigest()

    def _csv_rows(self, path: str | None = None, delimiter: str = ",") -> Iterator[dict]:
        with open(path or self.path, newline="") as f:
            yield from csv.DictReader(f, delimiter=delimiter)


class TasManager(FileKnowledgebaseManager):
    """Target Affinity Spectrum: drug→target binding classes
    (reference: cli/knowledgebase.py:125-154).

    Reference filter semantics (docstring at cli/knowledgebase.py:133-141):
    - only affinity classes that indicate binding are included;
    - only agents with a real name are included — compounds known by a
      bare ID are dropped.

    Expected columns: ``chembl_id, compound_name, gene_name, hgnc_id,
    class_min`` (class_min 1 = strong binding … 10 = no binding).
    """

    short_name = "tas"
    full_name = "TAS"
    #: classes 1-2 are the binding-affinity range
    MAX_BINDING_CLASS = 2

    def get_statements(self) -> Iterator[dict]:
        for row in self._csv_rows():
            if not row.get("compound_name") or not row.get("gene_name"):
                continue  # ID-only agents are excluded
            if int(row["class_min"]) > self.MAX_BINDING_CLASS:
                continue  # non-binding affinity
            drug = {"NAME": row["compound_name"]}
            if row.get("chembl_id"):
                drug["CHEMBL"] = row["chembl_id"]
            target = {"NAME": row["gene_name"]}
            if row.get("hgnc_id"):
                target["HGNC"] = row["hgnc_id"]
            yield {
                "type": "Inhibition",
                "agents": [row["compound_name"], row["gene_name"]],
                "agent_groundings": [drug, target],
                "evidence": {"source_api": "tas", "annotations": {"class_min": int(row["class_min"])}},
            }


class SignorManager(FileKnowledgebaseManager):
    """SIGNOR curated causal relations (reference: cli/knowledgebase.py:157-187;
    row semantics from the public INDRA signor processor).

    Data columns: ``entity_a, id_a, database_a, entity_b, id_b, database_b,
    effect, mechanism, pmid``.  The statement type comes from the mechanism
    when it names a modification, else from the up/down-regulation effect;
    rows with neither are skipped.  An optional complexes file
    (``complex_id, components`` with ';'-separated members) yields Complex
    statements, mirroring signor_complexes_file (cli/knowledgebase.py:166-169).
    """

    short_name = "signor"
    full_name = "Signor"

    MECHANISM_TYPES = {
        "phosphorylation": "Phosphorylation",
        "dephosphorylation": "Dephosphorylation",
        "ubiquitination": "Ubiquitination",
        "deubiquitination": "Deubiquitination",
        "acetylation": "Acetylation",
        "methylation": "Methylation",
        "binding": "Complex",
    }

    def __init__(self, path: str, complexes_path: str | None = None):
        super().__init__(path)
        self.complexes_path = complexes_path

    @staticmethod
    def _grounding(name: str, db: str, dbid: str) -> dict:
        g = {"NAME": name}
        if dbid:
            ns = {"UNIPROT": "UP", "SIGNOR": "SIGNOR", "CHEBI": "CHEBI"}.get(
                (db or "").upper(), (db or "").upper() or "SIGNOR"
            )
            g[ns] = dbid
        return g

    def get_statements(self) -> Iterator[dict]:
        for row in self._csv_rows():
            mech = (row.get("mechanism") or "").strip().lower()
            effect = (row.get("effect") or "").strip().lower()
            if mech in self.MECHANISM_TYPES:
                stype = self.MECHANISM_TYPES[mech]
            elif effect.startswith("up-regulates"):
                stype = "Activation"
            elif effect.startswith("down-regulates"):
                stype = "Inhibition"
            else:
                continue
            a, b = row["entity_a"], row["entity_b"]
            if not a or not b:
                continue
            ev = {"source_api": "signor"}
            if row.get("pmid"):
                ev["pmid"] = row["pmid"]
            yield {
                "type": stype,
                "agents": [a, b],
                "agent_groundings": [
                    self._grounding(a, row.get("database_a", ""), row.get("id_a", "")),
                    self._grounding(b, row.get("database_b", ""), row.get("id_b", "")),
                ],
                "evidence": ev,
            }
        if self.complexes_path:
            for row in self._csv_rows(self.complexes_path):
                members = [m for m in row["components"].split(";") if m]
                if len(members) < 2:
                    continue
                yield {
                    "type": "Complex",
                    "agents": members,
                    "agent_groundings": [{"NAME": m} for m in members],
                    "evidence": {
                        "source_api": "signor",
                        "annotations": {"complex_id": row["complex_id"]},
                    },
                }


class TrrustManager(FileKnowledgebaseManager):
    """TRRUST transcription-factor → target regulation (reference:
    cli/knowledgebase.py:652-682).  Headerless TSV: ``tf, target, mode,
    pmids`` with ';'-separated PMIDs; one statement per PMID (the
    reference expands evidences the same way)."""

    short_name = "trrust"
    full_name = "TRRUST"

    MODES = {"Activation": "IncreaseAmount", "Repression": "DecreaseAmount"}

    def get_statements(self) -> Iterator[dict]:
        with open(self.path, newline="") as f:
            for row in csv.reader(f, delimiter="\t"):
                if len(row) < 4:  # blank/truncated line: skip, don't abort
                    continue
                tf, target, mode, pmids = row[:4]
                stype = self.MODES.get(mode)
                if stype is None:  # 'Unknown' rows carry no direction
                    continue
                for pmid in [p for p in pmids.split(";") if p]:
                    yield {
                        "type": stype,
                        "agents": [tf, target],
                        "agent_groundings": [{"NAME": tf}, {"NAME": target}],
                        "evidence": {"source_api": "trrust", "pmid": pmid},
                    }


def db_info_rows(
    managers: list[KnowledgebaseManager], start_id: int = 1
) -> list[dict]:
    """db_info registry rows in manager order (principal_schema.py:516-559);
    ``start_id`` offsets past an existing registry when unioning new KBs
    into a populated principal schema."""
    return [
        {
            "id": start_id + i,
            "db_name": m.short_name,
            "db_full_name": m.full_name,
            "source_api": m.source_api or m.short_name,
        }
        for i, m in enumerate(managers)
    ]


def _statement_rows(
    mgr: KnowledgebaseManager, db_info_id: int, start_sid: int, batch_id: int
) -> Iterator[dict]:
    """raw_statements rows for one manager.  mk_hash is computed up front
    with the SAME function preprocess uses to rehash, so the incremental
    (mk_hash, source_hash) filter sees stable keys; source_hash
    fingerprints the evidence (reference:
    evidence[0].get_source_hash(), cli/knowledgebase.py:73)."""
    from indra_db_spark.assembly.preprocess import compute_mk_hash

    from indra_db_spark.schemas import TYPE_NUMS

    sid = start_sid
    seen: set[tuple[int, int]] = set()
    for stmt in mgr.get_statements():
        # every manager's type values come from a static relation map, so
        # an unregistered type is a DEV error (it would surface as a NULL
        # type_num downstream, invisible to HasType) — fail loudly here
        if stmt.get("type") not in TYPE_NUMS:
            raise ValueError(
                f"{mgr.short_name} emitted unregistered statement type "
                f"{stmt.get('type')!r} (not in schemas.TYPE_REGISTRY)"
            )
        ev = stmt.get("evidence") or {}
        # per-manager exact dedup on (mk_hash, source_hash) — the
        # reference's extract_duplicates(KeyFunc.mk_and_one_ev_src) applied
        # to every manager's output before insert (cli/knowledgebase.py:146)
        key = (
            compute_mk_hash(stmt),
            stable_hash(f"{mgr.short_name}|{json.dumps(ev, sort_keys=True)}"),
        )
        if key in seen:
            continue
        seen.add(key)
        yield {
            "sid": sid,
            "uuid": f"kb-{mgr.short_name}-{sid}",
            "batch_id": batch_id,
            "mk_hash": key[0],
            "source_hash": key[1],
            "reading_id": None,
            "db_info_id": db_info_id,
            "type": stmt.get("type"),
            "json": json.dumps(stmt).encode(),
        }
        sid += 1


def load_knowledgebases(
    spark: SparkSession,
    managers: list[KnowledgebaseManager],
    start_sid: int = 1,
    batch_id: int = 0,
    start_db_info_id: int = 1,
) -> DataFrame:
    """raw_statements rows from every manager, unioned (the kb pipeline,
    export_assembly.py:309-347).  The per-manager yield is driver-side (the
    upstream dumps are curated-database-sized, not corpus-sized);
    everything downstream — preprocess, dedup, assembly — distributes."""
    rows = []
    sid = start_sid
    for info, mgr in zip(db_info_rows(managers, start_db_info_id), managers):
        batch = list(_statement_rows(mgr, info["id"], sid, batch_id))
        rows.extend(batch)
        sid += len(batch)
    from indra_db_spark.session import local_artifact_df

    return local_artifact_df(spark, rows, RAW_STATEMENTS_SCHEMA)


def kb_update(
    spark: SparkSession,
    manager: KnowledgebaseManager,
    db_info_id: int,
    existing_raw: DataFrame,
    start_sid: int,
    batch_id: int = 0,
) -> DataFrame:
    """Incremental update: the manager's current statements MINUS those
    already present for this db_info_id, keyed on (mk_hash, source_hash) —
    the reference's update() seen-set filter (cli/knowledgebase.py:62-76)
    as a left-anti join, so the existing side never leaves the cluster.

    Returns only the NEW rows; union them onto raw_statements and re-run
    the (incremental) assembly."""
    from indra_db_spark.session import local_artifact_df

    candidate = local_artifact_df(
        spark,
        list(_statement_rows(manager, db_info_id, start_sid, batch_id)),
        RAW_STATEMENTS_SCHEMA,
    )
    seen = existing_raw.filter(F.col("db_info_id") == db_info_id).select(
        "mk_hash", "source_hash"
    )
    return candidate.join(seen, ["mk_hash", "source_hash"], "left_anti")


# Concrete managers beyond TAS/SIGNOR/TRRUST live in kb_managers.py
# (reference: cli/knowledgebase.py:190-737); re-exported here so the full
# roster imports from one place.
from indra_db_spark.sources.kb_managers import (  # noqa: E402,F401
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
    UbiBrowserManager,
    VirHostNetManager,
)

ALL_MANAGER_CLASSES = [
    TasManager,
    SignorManager,
    TrrustManager,
    CbnManager,
    BiogridManager,
    PathwayCommonsManager,
    CTDManager,
    DrugBankManager,
    VirHostNetManager,
    PhosphoElmManager,
    HPRDManager,
    BelLcManager,
    PhosphositeManager,
    RlimspManager,
    DgiManager,
    CrogManager,
    ConibManager,
    UbiBrowserManager,
]
