"""FK-inferred join pathing (reference: databases.py:539-565 ``db.link`` —
walks a declared foreign-key map to build join clauses between any two
tables, so clients never hand-write the chain).

The map below mirrors the reference's principal-side FK graph
(principal_schema.py:22-31) plus the readonly link keys.  ``join_path``
BFSes the shortest chain and ``link`` folds it into one DataFrame join.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame

#: (table_a, col_a, table_b, col_b) foreign-key edges
FK_EDGES: list[tuple[str, str, str, str]] = [
    ("text_ref", "trid", "text_content", "text_ref_id"),
    ("text_content", "tcid", "reading", "text_content_id"),
    ("reading", "rid", "raw_statements", "reading_id"),
    ("db_info", "id", "raw_statements", "db_info_id"),
    ("raw_statements", "sid", "raw_unique_links", "raw_stmt_id"),
    ("raw_statements", "sid", "raw_agents", "stmt_id"),
    ("raw_unique_links", "pa_stmt_mk_hash", "pa_statements", "mk_hash"),
    ("pa_statements", "mk_hash", "pa_agents", "stmt_mk_hash"),
    ("pa_statements", "mk_hash", "pa_activity", "stmt_mk_hash"),
    ("pa_statements", "mk_hash", "curation", "pa_hash"),
    ("pa_statements", "mk_hash", "pa_support_links", "supporting_mk_hash"),
]


def join_path(start: str, end: str) -> list[tuple[str, str, str, str]]:
    """Shortest FK chain from ``start`` to ``end`` as (tbl_a, col_a, tbl_b,
    col_b) hops; raises when no path exists."""
    adj: dict[str, list[tuple[str, str, str, str]]] = {}
    for a, ca, b, cb in FK_EDGES:
        adj.setdefault(a, []).append((a, ca, b, cb))
        adj.setdefault(b, []).append((b, cb, a, ca))
    seen = {start}
    queue = deque([(start, [])])
    while queue:
        node, path = queue.popleft()
        if node == end:
            return path
        for hop in adj.get(node, ()):
            nxt = hop[2]
            if nxt not in seen:
                seen.add(nxt)
                queue.append((nxt, path + [hop]))
    raise ValueError(f"no FK path from {start} to {end}")


def link(
    tables: dict[str, DataFrame], start: str, end: str, how: str = "inner"
) -> DataFrame:
    """Join ``start``..``end`` along the FK chain (db.link rebuild)."""
    path = join_path(start, end)
    out = tables[start]
    for tbl_a, col_a, tbl_b, col_b in path:
        # resolve the left key against the ORIGINATING frame, not the
        # accumulated join — column names (e.g. mk_hash) repeat across hops
        out = out.join(
            tables[tbl_b], tables[tbl_a][col_a] == tables[tbl_b][col_b], how
        )
    return out
