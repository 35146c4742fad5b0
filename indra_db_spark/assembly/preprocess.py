"""Preprocess stage: repair raw-statement JSON, validate semantics, apply
grounding, and recompute the matches-key hash (reference:
export_assembly.py:368-490 preprocess; JSON repair
readonly_dumping/util.py:67-152 clean_escaped_stmt_json_string /
clean_json_loads; validation :154-172 validate_statement_semantics).

The heavy Python (INDRA's gilda/adeft grounding, protmapper) is exactly the
kind of work that must NOT run row-at-a-time: this stage is ONE
``mapInPandas`` pass — Arrow batches in, Arrow batches out — with the
model-dependent pieces injected as plain Python callables so the real INDRA
functions can be swapped in without touching the Spark plumbing.  The
default implementations are deterministic stand-ins (SURVEY.md §7.4 risk 1:
never recompute hashes in two places — this module's ``stable_hash`` IS the
fixture hash).

These injected callables are the DECLARED PARITY BOUNDARY of the rebuild:
everything on the Spark side of the seam (batching, schema, dedup grain,
hash plumbing, source-count aggregation) is reference-parity and tested;
the ML models behind the seam (gilda/adeft grounding, protmapper sequence
mapping, the sklearn belief scorer) are external, nondeterministic
dependencies that a production deployment injects here unchanged.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Callable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from indra_db_spark.plans.fixtures import stable_hash

PREPROCESSED_SCHEMA = StructType(
    [
        StructField("sid", LongType()),
        StructField("mk_hash", LongType()),
        StructField("type", StringType()),
        StructField("json", BinaryType()),
    ]
)


def clean_json_str(raw: str) -> str:
    """Repair double-escaped unicode sequences (``\\\\uXXXX`` written by a
    buggy upstream dumper) before parsing — byte-exact repairs matter
    because hashes derive from content (readonly_dumping/util.py:67-152)."""
    return raw.replace("\\\\u", "\\u")


def clean_json_loads(raw: bytes | str) -> Optional[dict]:
    """Tolerant parse: repair, then parse; None for irrecoverable rows
    (the reference drops them into rejected_statements)."""
    if isinstance(raw, (bytes, bytearray)):
        try:
            raw = bytes(raw).decode()
        except UnicodeDecodeError:
            return None
    try:
        return json.loads(clean_json_str(raw))
    except (json.JSONDecodeError, TypeError):
        return None


def validate_statement_semantics(stmt: dict) -> bool:
    """Semantic validation (readonly_dumping/util.py:154-172): a statement
    needs a type and agents; a Complex needs >= 2 members."""
    if not stmt.get("type") or not isinstance(stmt.get("agents"), list):
        return False
    agents = [a for a in stmt["agents"] if a]
    if not agents:
        return False
    # agent_groundings, when present, must align 1:1 with agents — a
    # mismatched list would silently misassign ag_num/role downstream
    groundings = stmt.get("agent_groundings")
    if groundings is not None and (
        not isinstance(groundings, list) or len(groundings) != len(stmt["agents"])
    ):
        return False
    if stmt["type"] == "Complex" and len(agents) < 2:
        return False
    return True


def compute_mk_hash(stmt: dict) -> int:
    """Deterministic matches-key surrogate over the canonical statement form
    (the one place hashes are computed; fixture-identical).

    Modification detail (residue/position) joins the key only when present
    — INDRA's matches-key distinguishes Phosphorylation(MEK, ERK, T, 124)
    from Phosphorylation(MEK, ERK) (the reference's curated set depends on
    it, tests/test_preassembly.py:548-563), while detail-free statements
    keep the historical key so fixture hashes are unchanged."""
    names = ",".join(str(a) for a in stmt.get("agents", []))
    key = (
        f"{stmt['type']}:{names}:{stmt.get('activity')}:"
        f"{bool(stmt.get('is_active'))}"
    )
    if stmt.get("residue") is not None or stmt.get("position") is not None:
        key += f":{stmt.get('residue')}:{stmt.get('position')}"
    return stable_hash(key)


def preprocess_statements(
    raw_statements: DataFrame,
    grounding_map: Optional[dict[str, str]] = None,
    ground: Optional[Callable[[dict], dict]] = None,
    validate: Callable[[dict], bool] = validate_statement_semantics,
) -> DataFrame:
    """(sid, mk_hash, type, json) for every raw statement that survives
    repair + validation, with grounding applied and the hash recomputed
    (``stmt.get_hash(refresh=True)``, export_assembly.py:463).

    ``grounding_map`` renames agents (the gilda/adeft stand-in);
    ``ground`` may replace the whole grounding step with a real model.
    """
    gmap = dict(grounding_map or {})

    def _ground(stmt: dict) -> dict:
        if ground is not None:
            return ground(stmt)
        if gmap:
            stmt["agents"] = [gmap.get(a, a) for a in stmt.get("agents", [])]
            # agent_groundings feed extract_agent_rows (pipeline.py) and
            # from there pa_agents/name_meta — renaming only `agents` would
            # desynchronize the recomputed hash/JSON from the meta rows
            # the query algebra routes on
            for g in stmt.get("agent_groundings") or []:
                if isinstance(g, dict) and "NAME" in g:
                    g["NAME"] = gmap.get(g["NAME"], g["NAME"])
        return stmt

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"sid": [], "mk_hash": [], "type": [], "json": []}
            for sid, raw in zip(pdf["sid"], pdf["json"]):
                stmt = clean_json_loads(raw)
                if stmt is None or not validate(stmt):
                    continue
                stmt = _ground(stmt)
                out["sid"].append(sid)
                out["mk_hash"].append(compute_mk_hash(stmt))
                out["type"].append(stmt["type"])
                out["json"].append(
                    json.dumps(stmt, sort_keys=False).encode()
                )
            yield pd.DataFrame(out)

    return raw_statements.select("sid", "json").mapInPandas(
        _batches, PREPROCESSED_SCHEMA
    )


def dedup_statements(preprocessed: DataFrame) -> DataFrame:
    """First row per hash (export_assembly.py:576-601): at 100 TB a single
    shuffle on mk_hash with min(sid) as the deterministic representative —
    not the reference's 2.5-3 h single-process seen-set loop."""
    from pyspark.sql import functions as F

    return (
        preprocessed.groupBy("mk_hash")
        .agg(
            F.min_by(F.struct("sid", "type", "json"), F.col("sid")).alias("r")
        )
        .select(
            F.col("r.sid").alias("sid"),
            "mk_hash",
            F.col("r.type").alias("type"),
            F.col("r.json").alias("json"),
        )
    )
