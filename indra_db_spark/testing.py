"""Shared helpers for differential testing against a DuckDB oracle —
the rebuild's version of the reference's set-behavior oracle strategy
(reference: indra_db/tests/test_query.py:394-568; SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pandas as pd

ORACLE_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ORACLE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Column-name-sorted, row-sorted, tz-stripped canonical frame."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare_frames(
    sdf: pd.DataFrame, odf: pd.DataFrame, allow_empty: bool = False
) -> list[str]:
    """Differences between a Spark result and an oracle result; [] if
    identical up to row order.  Floats must match bit-for-bit (all catalog
    aggregates are decimal-exact or single-expression deterministic).

    An EMPTY result is a hard failure by default: two engines agreeing on
    zero rows verifies nothing, and a scale-dependent selectivity collapse
    (the r6 ``doc_curate_increment`` incident — a fixed gate constant
    whose survivor set shrank to zero as the corpus grew) then reads as
    green.  Entries whose semantics genuinely permit an empty result at
    some scale must opt in via ``allow_empty`` (catalog.ALLOW_EMPTY)."""
    problems: list[str] = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [
            f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        ]
    if len(sdf) != len(odf):
        return [f"row count: spark={len(sdf)} oracle={len(odf)}"]
    if len(sdf) == 0:
        if allow_empty:
            return ["WARN: empty result (weak check; entry opted in)"]
        return ["empty result (vacuous pass — no values were checked)"]
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sa = sv.astype(float).to_numpy()
            oa = ov.astype(float).to_numpy()
            eq = (sa == oa) | (np.isnan(sa) & np.isnan(oa))
            if not eq.all():
                idx = np.where(~eq)[0][:3]
                diffs = [(int(i), sa[i], oa[i]) for i in idx]
                problems.append(
                    f"col {c}: {np.count_nonzero(~eq)} float mismatches, e.g. {diffs}"
                )
        else:
            eq = (sv.to_numpy() == ov.to_numpy()) | (sv.isna() & ov.isna()).to_numpy()
            if not eq.all():
                bad = np.where(~eq)[0][:3]
                diffs = [(int(i), sv.iloc[i], ov.iloc[i]) for i in bad]
                problems.append(f"col {c}: value mismatches, e.g. {diffs}")
    return problems
