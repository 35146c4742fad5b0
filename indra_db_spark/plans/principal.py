"""Principal-side (input DB) clients: raw-statement agent search and
curation operators (reference: indra_db/client/principal/raw_statements.py
and curation handling in indra_db_service/call_handlers.py:336-354).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indra_db_spark.schemas import ROLE_NUMS


def _escape_like(s: str) -> str:
    """Sanitize user text for LIKE: escape %/_ unless the caller opted into
    wildcards (reference: raw_statements.py:100-102)."""
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")


def raw_statement_search(
    raw_statements: DataFrame,
    raw_agents: DataFrame,
    agents: Sequence[tuple[Optional[str], str, Optional[str]]],
    stmt_type: Optional[str] = None,
    allow_wildcards: bool = False,
) -> DataFrame:
    """Raw statements matching ALL given agent constraints.

    ``agents`` is a list of (role, agent_id, namespace) — role in
    SUBJECT/OBJECT/None, namespace None matching any.  Compiled as the
    intersection of per-agent stmt_id sets (reference ``intersect_all``,
    raw_statements.py:94-135) = chained semi-joins, one per constraint, so
    each constraint prunes before the next join.
    """
    if not agents and stmt_type is None:
        raise ValueError("need at least one agent constraint or a type")
    out = raw_statements
    if stmt_type is not None:
        out = out.filter(F.col("type") == stmt_type)
    for role, agent_id, namespace in agents:
        rows = raw_agents
        if namespace is not None:
            rows = rows.filter(F.col("db_name") == namespace)
        pat = agent_id if allow_wildcards else _escape_like(agent_id)
        if "%" in pat or "_" in pat:
            rows = rows.filter(F.col("db_id").like(pat))
        else:
            rows = rows.filter(F.col("db_id") == agent_id)
        if role is not None:
            rows = rows.filter(F.col("role_num") == ROLE_NUMS[role.upper()])
        out = out.join(
            rows.select(F.col("stmt_id").alias("sid")).distinct(),
            "sid",
            "left_semi",
        )
    return out


def curation_counts(curation: DataFrame) -> DataFrame:
    """Curations per pa_hash (reference counts client-side with a Counter,
    call_handlers.py:336-354; here it distributes)."""
    return curation.groupBy("pa_hash").agg(
        F.count("*").cast("int").alias("curation_count")
    )


def curations_for(
    curation: DataFrame,
    pa_hash: Optional[int] = None,
    source_hash: Optional[int] = None,
    tag: Optional[str] = None,
) -> DataFrame:
    """Point lookups over the curation table with curator anonymization
    (md5, reference api.py:636-639)."""
    out = curation
    if pa_hash is not None:
        out = out.filter(F.col("pa_hash") == pa_hash)
    if source_hash is not None:
        out = out.filter(F.col("source_hash") == source_hash)
    if tag is not None:
        out = out.filter(F.col("tag") == tag)
    return out.withColumn("curator", F.md5(F.col("curator")))
