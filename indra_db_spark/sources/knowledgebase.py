"""Knowledge-base source framework (reference: cli/knowledgebase.py:45-123
KnowledgebaseManager + ~20 subclasses, one per curated database).

Each manager fetches/loads its source driver-side (network or file) and
yields statement dicts; ``load_knowledgebases`` turns every manager's yield
into one union DataFrame of raw-statement rows ready for the preprocess
stage.  Real managers (TAS, SIGNOR, BioGRID, ...) need network access —
they subclass and override ``get_statements``; the framework plus the
deterministic ``StaticKnowledgebase`` is what is testable here.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from indra_db_spark.schemas import RAW_STATEMENTS_SCHEMA


class KnowledgebaseManager:
    """One curated source.  ``short_name`` becomes the source label
    (lower-cased into raw_stmt_src, readonly_schema.py:401-407)."""

    short_name: str = "kb"
    full_name: str = "Knowledge Base"

    def get_statements(self) -> Iterable[dict]:  # pragma: no cover - abstract
        """Yield statement dicts ({'type': ..., 'agents': [...]}); real
        managers fetch from their upstream here (driver-side)."""
        raise NotImplementedError

    def update(self) -> Iterable[dict]:
        """Daily-update hook; defaults to a full refresh
        (cli/knowledgebase.py:44-70 _get_statements/update split)."""
        return self.get_statements()


class StaticKnowledgebase(KnowledgebaseManager):
    """Deterministic in-memory manager (tests / fixtures)."""

    def __init__(self, short_name: str, statements: list[dict]):
        self.short_name = short_name
        self.full_name = short_name.upper()
        self._statements = statements

    def get_statements(self) -> Iterable[dict]:
        return iter(self._statements)


def db_info_rows(managers: list[KnowledgebaseManager]) -> list[dict]:
    """db_info registry rows, 1-indexed in manager order
    (principal_schema.py:516-559)."""
    return [
        {
            "id": i + 1,
            "db_name": m.short_name,
            "db_full_name": m.full_name,
            "source_api": m.short_name,
        }
        for i, m in enumerate(managers)
    ]


def load_knowledgebases(
    spark: SparkSession,
    managers: list[KnowledgebaseManager],
    start_sid: int = 1,
    batch_id: int = 0,
) -> DataFrame:
    """raw_statements rows from every manager, unioned (the kb pipeline,
    export_assembly.py:309-347).  The per-manager yield is driver-side (the
    upstream APIs are not distributable); everything downstream —
    preprocess, dedup, assembly — distributes."""
    rows = []
    sid = start_sid
    for info, mgr in zip(db_info_rows(managers), managers):
        for stmt in mgr.get_statements():
            rows.append(
                {
                    "sid": sid,
                    "uuid": f"kb-{info['db_name']}-{sid}",
                    "batch_id": batch_id,
                    "mk_hash": 0,  # assigned by preprocess rehash
                    "source_hash": None,
                    "reading_id": None,
                    "db_info_id": info["id"],
                    "type": stmt.get("type"),
                    "json": json.dumps(stmt).encode(),
                }
            )
            sid += 1
    return spark.createDataFrame(rows, RAW_STATEMENTS_SCHEMA)
