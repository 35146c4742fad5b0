"""Schema/row-count snapshot + diff — the materialization regression gate.

The reference dumps a {table -> (columns, row count)} snapshot of the built
readonly DB and aborts the release when it drifts from a golden copy
(readonly_dumping/util.py:175-271, checked at readonly_dumping.py:2295-2302).
Same contract here over DataFrames; counts run as one job per table (cheap:
count() is a partial-aggregated scan).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def snapshot(tables: dict[str, DataFrame]) -> dict:
    return {
        name: {
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in df.schema.fields
            ],
            "rows": df.count(),
        }
        for name, df in sorted(tables.items())
    }


def diff_snapshots(golden: dict, current: dict, row_tolerance: float = 0.0) -> list[str]:
    """Human-readable drift list; empty means the build matches golden.

    ``row_tolerance`` permits fractional row-count drift (supplemental
    builds grow tables; schema drift is never tolerated).
    """
    problems: list[str] = []
    for name in sorted(set(golden) | set(current)):
        if name not in current:
            problems.append(f"missing table: {name}")
            continue
        if name not in golden:
            problems.append(f"unexpected table: {name}")
            continue
        g, c = golden[name], current[name]
        if g["columns"] != c["columns"]:
            problems.append(
                f"{name}: schema drift {json.dumps(g['columns'])} -> "
                f"{json.dumps(c['columns'])}"
            )
        lo = g["rows"] * (1 - row_tolerance)
        hi = g["rows"] * (1 + row_tolerance)
        if not (lo <= c["rows"] <= hi):
            problems.append(f"{name}: rows {g['rows']} -> {c['rows']}")
    return problems
