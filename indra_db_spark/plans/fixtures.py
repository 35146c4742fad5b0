"""Deterministic readonly-lake fixture generator.

Synthesizes a small statement corpus with the same shape the reference's
randomized test-set builder produces (indra_db/tests/test_query.py:24-178;
recipe documented in FIXTURES.md §A): 4 agents × (3 two-agent types +
Complex + ActiveForm variants), random sources/mesh/belief, and all the
derived readonly tables with their invariants:

1. every mk_hash appears in source_meta (the hash universe);
2. ev_count identical across tables and equal to sum(src_json.values());
3. absent sources are absent keys (NULL lookups), never 0;
4. mesh ids split by D/C prefix between term/concept tables;
5. Complex duplication rows flagged is_complex_dup=True — both the
   pa_meta role-duplication (readonly_schema.py:849-856) and the
   agent_interactions ordered-pair explosion (readonly_schema.py:1344-1377).
"""

from __future__ import annotations

import hashlib
import itertools
import json
import random
from dataclasses import dataclass, field

from indra_db_spark.schemas import DB_SOURCES, READER_SOURCES, ROLE_NUMS, TYPE_NUMS

AGENTS = [
    {"NAME": "ERK", "FPLX": "ERK", "TEXT": "MAPK"},
    {"NAME": "TP53", "HGNC": "11998"},
    {"NAME": "MEK", "FPLX": "MEK"},
    {"NAME": "Vemurafenib", "CHEBI": "CHEBI:63637"},
]
TWO_AGENT_TYPES = ["Phosphorylation", "Activation", "Inhibition"]
SOURCES = ["medscan", "reach", "pc", "signor"]
MESH_TERMS = ["D000225", "D002352", "D015536", "D00123413", "D0000334"]
MESH_CONCEPTS = ["C0001243", "C005758"]
READERS = {"medscan": "medscan", "reach": "reach"}


def stable_hash(key: str) -> int:
    """Deterministic signed-63-bit surrogate for the INDRA matches-key hash
    (reference keys everything on it, export_assembly.py:463)."""
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big") >> 1


def stmt_json_bytes(s: "StatementFx") -> bytes:
    """THE statement JSON serialization — used identically for raw and PA
    json in both fixture builders so byte-equality (and the rehash done by
    assembly.preprocess) holds end to end."""
    d: dict = {
        "type": s.stmt_type,
        "agents": [ag["NAME"] for ag in s.agents],
        "agent_groundings": [dict(ag) for ag in s.agents],
    }
    if s.activity is not None:
        d["activity"] = s.activity
        d["is_active"] = s.is_active
    return json.dumps(d).encode()


@dataclass
class EvidenceFx:
    sid: int
    src: str
    reading_id: int | None
    db_info_id: int | None
    trid: int | None  # paper, for reader evidence


@dataclass
class StatementFx:
    mk_hash: int
    stmt_type: str
    agents: list[dict]  # grounding dicts
    activity: str | None = None
    is_active: bool = False
    src_counts: dict = field(default_factory=dict)
    belief: float = 0.0
    mesh_terms: list[str] = field(default_factory=list)
    mesh_concepts: list[str] = field(default_factory=list)
    evidences: list[EvidenceFx] = field(default_factory=list)

    @property
    def type_num(self) -> int:
        return TYPE_NUMS[self.stmt_type]

    @property
    def ev_count(self) -> int:
        return sum(self.src_counts.values())

    @property
    def agent_count(self) -> int:
        return len(self.agents)

    @property
    def only_src(self) -> str | None:
        return next(iter(self.src_counts)) if len(self.src_counts) == 1 else None

    @property
    def has_rd(self) -> bool:
        return any(s in READER_SOURCES for s in self.src_counts)

    @property
    def has_db(self) -> bool:
        return any(s in DB_SOURCES for s in self.src_counts)


@dataclass
class PaperFx:
    trid: int
    pmid: str
    pmcid: str
    doi: str


def generate_model(seed: int = 42) -> tuple[list[StatementFx], list[PaperFx]]:
    rng = random.Random(seed)
    papers = [
        PaperFx(
            trid=100 + i,
            pmid=str(70000 + i),
            pmcid=f"PMC9{i:03d}",
            doi=f"10.1000/j{i}",
        )
        for i in range(10)
    ]

    stmts: list[StatementFx] = []
    for t in TWO_AGENT_TYPES + ["Complex"]:
        for a, b in itertools.permutations(range(len(AGENTS)), 2):
            if t == "Complex" and a > b:
                continue  # complexes are unordered: keep one per pair
            stmts.append(StatementFx(0, t, [AGENTS[a], AGENTS[b]]))
    for a in range(len(AGENTS)):
        for activity in ("transcription", "activity"):
            for is_active in (True, False):
                stmts.append(
                    StatementFx(
                        0,
                        "ActiveForm",
                        [AGENTS[a]],
                        activity=activity,
                        is_active=is_active,
                    )
                )

    sid = 1
    for s in stmts:
        names = ",".join(ag["NAME"] for ag in s.agents)
        s.mk_hash = stable_hash(
            f"{s.stmt_type}:{names}:{s.activity}:{s.is_active}"
        )
        n_src = rng.randint(1, len(SOURCES))
        for src in sorted(rng.sample(SOURCES, n_src)):
            s.src_counts[src] = rng.randint(1, 50)
        s.belief = round(rng.random(), 4)
        if s.has_rd:
            for m in MESH_TERMS:
                if rng.random() < 0.3:
                    s.mesh_terms.append(m)
            for m in MESH_CONCEPTS:
                if rng.random() < 0.2:
                    s.mesh_concepts.append(m)
        # one evidence row per count unit (fast_raw_pa_link grain)
        for src, n in s.src_counts.items():
            for _ in range(n):
                if src in READERS:
                    paper = rng.choice(papers)
                    rid = stable_hash(f"rid:{paper.trid}:{src}") % (1 << 40)
                    s.evidences.append(EvidenceFx(sid, src, rid, None, paper.trid))
                else:
                    s.evidences.append(
                        EvidenceFx(sid, src, None, 1 + DB_SOURCES.index(src), None)
                    )
                sid += 1
    return stmts, papers


def build_tables(stmts: list[StatementFx], papers: list[PaperFx]) -> dict[str, list]:
    """Materialize readonly-table row dicts from the statement model."""
    t: dict[str, list] = {k: [] for k in (
        "name_meta", "text_meta", "other_meta", "source_meta",
        "mesh_term_meta", "mesh_concept_meta", "agent_interactions",
        "fast_raw_pa_link", "reading_ref_link", "raw_stmt_src",
        "raw_stmt_mesh_terms", "raw_stmt_mesh_concepts",
        "mesh_term_ref_counts", "mesh_concept_ref_counts",
        "belief", "evidence_counts", "pa_agent_counts",
    )}
    ag_id = 1

    def meta_common(s: StatementFx) -> dict:
        return {
            "ev_count": s.ev_count,
            "belief": s.belief,
            "type_num": s.type_num,
            "activity": s.activity,
            "is_active": s.is_active,
            "agent_count": s.agent_count,
        }

    for s in stmts:
        common = meta_common(s)

        def agent_row(ag_num, db_id, role_num, dup, extra=None):
            nonlocal ag_id
            row = {
                "ag_id": ag_id,
                "ag_num": ag_num,
                "db_id": db_id,
                "role_num": role_num,
                "mk_hash": s.mk_hash,
                "is_complex_dup": dup,
                **common,
            }
            if extra:
                row.update(extra)
            ag_id += 1
            return row

        # agent meta rows, routed by namespace (pa_meta partition,
        # readonly_schema.py:991-1156)
        for i, ag in enumerate(s.agents):
            if s.stmt_type == "Complex":
                roles = [(i, 0, False), (0, -1, True), (1, 1, True)]
            elif s.stmt_type == "ActiveForm":
                roles = [(i, ROLE_NUMS["OTHER"], False)]
            else:
                roles = [(i, -1 if i == 0 else 1, False)]
            for ag_num, role_num, dup in roles:
                for ns, db_id in ag.items():
                    if ns == "NAME":
                        t["name_meta"].append(agent_row(ag_num, db_id, role_num, dup))
                    elif ns == "TEXT":
                        t["text_meta"].append(agent_row(ag_num, db_id, role_num, dup))
                    else:
                        t["other_meta"].append(
                            agent_row(ag_num, db_id, role_num, dup, {"db_name": ns})
                        )

        t["source_meta"].append(
            {
                "mk_hash": s.mk_hash,
                "src_json": dict(s.src_counts),
                "only_src": s.only_src,
                "num_srcs": len(s.src_counts),
                "has_rd": s.has_rd,
                "has_db": s.has_db,
                **common,
            }
        )

        for m in s.mesh_terms:
            t["mesh_term_meta"].append(
                {"mk_hash": s.mk_hash, "mesh_num": int(m[1:]), **common}
            )
        for m in s.mesh_concepts:
            t["mesh_concept_meta"].append(
                {"mk_hash": s.mk_hash, "mesh_num": int(m[1:]), **common}
            )

        # agent_interactions: base row + ordered-pair explosion for Complex
        base_json = {str(i): ag["NAME"] for i, ag in enumerate(s.agents)}
        inter_common = {
            "mk_hash": s.mk_hash,
            "src_json": dict(s.src_counts),
            **common,
        }
        t["agent_interactions"].append(
            {"agent_json": base_json, "is_complex_dup": False, **inter_common}
        )
        if s.stmt_type == "Complex":
            for pair in itertools.permutations(range(len(s.agents)), 2):
                pj = {
                    "0": s.agents[pair[0]]["NAME"],
                    "1": s.agents[pair[1]]["NAME"],
                }
                t["agent_interactions"].append(
                    {"agent_json": pj, "is_complex_dup": True, **inter_common}
                )

        # evidence-grain tables
        raw_json = stmt_json_bytes(s)
        for ev in s.evidences:
            t["fast_raw_pa_link"].append(
                {
                    "id": ev.sid,
                    "raw_json": raw_json,
                    "reading_id": ev.reading_id,
                    "db_info_id": ev.db_info_id,
                    "mk_hash": s.mk_hash,
                    "pa_json": raw_json,
                    "type_num": s.type_num,
                    "src": ev.src,
                }
            )
            t["raw_stmt_src"].append({"sid": ev.sid, "src": ev.src})
            if ev.reading_id is not None:
                for m in s.mesh_terms:
                    t["raw_stmt_mesh_terms"].append(
                        {"sid": ev.sid, "mesh_num": int(m[1:])}
                    )
                for m in s.mesh_concepts:
                    t["raw_stmt_mesh_concepts"].append(
                        {"sid": ev.sid, "mesh_num": int(m[1:])}
                    )

        reader_pmids = {
            ev.trid for ev in s.evidences if ev.trid is not None
        }
        pmid_count = len(reader_pmids)
        for m, table in [(x, "mesh_term_ref_counts") for x in s.mesh_terms] + [
            (x, "mesh_concept_ref_counts") for x in s.mesh_concepts
        ]:
            t[table].append(
                {
                    "mk_hash": s.mk_hash,
                    "mesh_num": int(m[1:]),
                    "ref_count": pmid_count,
                    "pmid_count": pmid_count,
                }
            )

        t["belief"].append({"mk_hash": s.mk_hash, "belief": s.belief})
        t["evidence_counts"].append(
            {"mk_hash": s.mk_hash, "ev_count": s.ev_count}
        )
        t["pa_agent_counts"].append(
            {"mk_hash": s.mk_hash, "agent_count": s.agent_count}
        )

    seen_rids = set()
    for s in stmts:
        for ev in s.evidences:
            if ev.reading_id is None or ev.reading_id in seen_rids:
                continue
            seen_rids.add(ev.reading_id)
            paper = next(p for p in papers if p.trid == ev.trid)
            t["reading_ref_link"].append(
                {
                    "trid": paper.trid,
                    "pmid": paper.pmid,
                    "pmid_num": int(paper.pmid),
                    "pmcid": paper.pmcid,
                    "pmcid_num": int(paper.pmcid[3:]),
                    "pmcid_version": None,
                    "doi": paper.doi,
                    "doi_ns": 1000,
                    "doi_id": paper.doi.split("/", 1)[1].lower(),
                    "pii": None,
                    "url": None,
                    "manuscript_id": None,
                    "tcid": paper.trid * 10,
                    "source": "pubmed",
                    "rid": ev.reading_id,
                    "reader": READERS.get(ev.src, "reach"),
                }
            )
    return t


def build_principal_tables(
    stmts: list[StatementFx], papers: list[PaperFx], seed: int = 42
) -> dict[str, list]:
    """Materialize principal-side (input) row dicts from the same model —
    the assembly DAG run on these must reproduce :func:`build_tables`.

    Adds *distractor* stale readings (older reader_version) carrying
    duplicate raw statements; the distill stage (reader de-duplication,
    export_assembly.py:174-306) must drop them for the round trip to match.
    """
    rng = random.Random(seed + 1)
    t: dict[str, list] = {k: [] for k in (
        "text_ref", "text_content", "reading", "db_info", "raw_statements",
        "raw_unique_links", "raw_agents", "curation", "pa_statements",
        "pa_agents", "pa_activity", "pa_support_links",
        "mesh_ref_annotations",
    )}

    for p in papers:
        t["text_ref"].append(
            {
                "trid": p.trid,
                "pmid": p.pmid,
                "pmid_num": int(p.pmid),
                "pmcid": p.pmcid,
                "pmcid_num": int(p.pmcid[3:]),
                "pmcid_version": None,
                "doi": p.doi,
                "doi_ns": 1000,
                "doi_id": p.doi.split("/", 1)[1].lower(),
                "pii": None,
                "url": None,
                "manuscript_id": None,
            }
        )
        t["text_content"].append(
            {
                "tcid": p.trid * 10,
                "text_ref_id": p.trid,
                "source": "pubmed",
                "format": "text",
                "text_type": "abstract",
                "preprint": False,
            }
        )

    for i, src in enumerate(DB_SOURCES):
        t["db_info"].append(
            {
                "id": 1 + i,
                "db_name": src,
                "db_full_name": src.upper(),
                "source_api": src,
            }
        )

    # current readings: one per (paper, reader-source) used by the model
    seen_rids: set[int] = set()
    for s in stmts:
        for ev in s.evidences:
            if ev.reading_id is None or ev.reading_id in seen_rids:
                continue
            seen_rids.add(ev.reading_id)
            t["reading"].append(
                {
                    "rid": ev.reading_id,
                    "text_content_id": ev.trid * 10,
                    "reader": READERS[ev.src],
                    "reader_version": "2.0",
                    "batch_id": 1,
                }
            )

    # raw statements: one per model evidence (these must survive distill)
    for s in stmts:
        raw_json = stmt_json_bytes(s)
        for ev in s.evidences:
            t["raw_statements"].append(
                {
                    "sid": ev.sid,
                    "uuid": f"u{ev.sid}",
                    "batch_id": 1,
                    "mk_hash": s.mk_hash,
                    "source_hash": stable_hash(f"srch:{ev.sid}"),
                    "reading_id": ev.reading_id,
                    "db_info_id": ev.db_info_id,
                    "type": s.stmt_type,
                    "json": raw_json,
                }
            )
            t["raw_unique_links"].append(
                {"raw_stmt_id": ev.sid, "pa_stmt_mk_hash": s.mk_hash}
            )
            for i, ag in enumerate(s.agents):
                if s.stmt_type in ("Complex", "ActiveForm"):
                    role_num = 0
                else:
                    role_num = -1 if i == 0 else 1
                for ns, db_id in ag.items():
                    t["raw_agents"].append(
                        {
                            "stmt_id": ev.sid,
                            "ag_num": i,
                            "db_name": ns,
                            "db_id": db_id,
                            "role_num": role_num,
                        }
                    )

    # distractors: stale readings (version 1.0) re-reading the same papers;
    # their raw statements duplicate model statements and MUST be distilled
    # away (drop_readings, export_assembly.py:236-306)
    distractor_sid = 10_000_000
    for trid_src in sorted({(ev.trid, ev.src) for s in stmts for ev in s.evidences
                            if ev.reading_id is not None}):
        if rng.random() >= 0.4:
            continue
        trid, src = trid_src
        old_rid = stable_hash(f"ridold:{trid}:{src}") % (1 << 40)
        t["reading"].append(
            {
                "rid": old_rid,
                "text_content_id": trid * 10,
                "reader": READERS[src],
                "reader_version": "1.0",
                "batch_id": 0,
            }
        )
        victim = rng.choice(stmts)
        t["raw_statements"].append(
            {
                "sid": distractor_sid,
                "uuid": f"u{distractor_sid}",
                "batch_id": 0,
                "mk_hash": victim.mk_hash,
                "source_hash": stable_hash(f"srch:{distractor_sid}"),
                "reading_id": old_rid,
                "db_info_id": None,
                "type": victim.stmt_type,
                "json": b"{}",
            }
        )
        # linked like a real duplicate extraction — only distillation
        # (not the link join) removes it from the readonly build
        t["raw_unique_links"].append(
            {"raw_stmt_id": distractor_sid, "pa_stmt_mk_hash": victim.mk_hash}
        )
        distractor_sid += 1

    # PA side
    for s in stmts:
        pa_json = stmt_json_bytes(s)
        t["pa_statements"].append(
            {
                "mk_hash": s.mk_hash,
                "matches_key": f"{s.stmt_type}:{s.mk_hash}",
                "type": s.stmt_type,
                "json": pa_json,
            }
        )
        for i, ag in enumerate(s.agents):
            if s.stmt_type == "Complex":
                role_num = 0
            elif s.stmt_type == "ActiveForm":
                role_num = ROLE_NUMS["OTHER"]
            else:
                role_num = -1 if i == 0 else 1
            for ns, db_id in ag.items():
                t["pa_agents"].append(
                    {
                        "stmt_mk_hash": s.mk_hash,
                        "ag_num": i,
                        "db_name": ns,
                        "db_id": db_id,
                        "role_num": role_num,
                    }
                )
        if s.stmt_type == "ActiveForm":
            t["pa_activity"].append(
                {
                    "stmt_mk_hash": s.mk_hash,
                    "activity": s.activity,
                    "is_active": s.is_active,
                }
            )

    # curations: one per 7th statement, tagged on its first evidence
    for ci, s in enumerate(stmts):
        if ci % 7 or not s.evidences:
            continue
        t["curation"].append(
            {
                "id": ci,
                "pa_hash": s.mk_hash,
                "source_hash": stable_hash(f"srch:{s.evidences[0].sid}"),
                "tag": "correct" if ci % 2 == 0 else "grounding",
                "curator": f"user{ci % 3}@example.org",
                "text": None,
                "ip": "127.0.0.1",
                "source": "fixture",
                "date": "2024-01-01T00:00:00",
                "pa_json": None,
                "ev_json": None,
            }
        )

    # paper-attached mesh: union of the mesh of statements read from the
    # paper (principal mesh is a property of papers, not statements)
    mesh_by_pmid: dict[int, set[tuple[int, bool]]] = {}
    for s in stmts:
        trids = {ev.trid for ev in s.evidences if ev.trid is not None}
        for trid in trids:
            pmid_num = int(next(p.pmid for p in papers if p.trid == trid))
            bucket = mesh_by_pmid.setdefault(pmid_num, set())
            for m in s.mesh_terms:
                bucket.add((int(m[1:]), False))
            for m in s.mesh_concepts:
                bucket.add((int(m[1:]), True))
    for pmid_num, pairs in sorted(mesh_by_pmid.items()):
        for mesh_num, is_concept in sorted(pairs):
            t["mesh_ref_annotations"].append(
                {
                    "pmid_num": pmid_num,
                    "mesh_num": mesh_num,
                    "major_topic": False,
                    "is_concept": is_concept,
                }
            )
    return t


def fixture_principal(spark, seed: int = 42):
    """Principal-side input DataFrames + the model they derive from."""
    from indra_db_spark.schemas import PRINCIPAL_SCHEMAS

    stmts, papers = generate_model(seed)
    tables = build_principal_tables(stmts, papers, seed)
    from indra_db_spark.session import local_artifact_df

    dfs = {
        name: local_artifact_df(spark, rows, PRINCIPAL_SCHEMAS[name])
        for name, rows in tables.items()
    }
    return dfs, stmts, papers


def fixture_lake(spark, seed: int = 42):
    """Build the full in-memory readonly lake + the model it came from."""
    from indra_db_spark.plans.lake import ReadonlyLake

    stmts, papers = generate_model(seed)
    tables = build_tables(stmts, papers)
    return ReadonlyLake.from_rows(spark, tables), stmts, papers
