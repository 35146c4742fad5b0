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


def cosine_neardup_pairs(
    emb,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int | None = 6,
    max_rows: int | None = 100_000,
):
    """TESTING-ONLY exact near-dup oracle: embedding near-duplicate pairs,
    cosine ≥ threshold, id_a < id_b, via the unconditionally-QUADRATIC
    all-pairs join.

    Demoted here from operators/similarity.py (and out of the query
    catalog) in round 8 (r7 verdict #5): the library must expose no O(n²)
    path a user could reach.  Recall-floor tests compare
    emb_srp_neardup / emb_neardup_cells / the PQ stack against this
    ground truth on small fixtures; the production paths are
    cosine_neardup_cells (exact, cell-pruned) and srp_neardup_pairs
    (approximate, bucketed).  ``max_rows`` is a guard rail even here: the
    corpus size is probed with a bounded count and the call fails fast
    with a pointer to the scale paths instead of launching a 10¹⁰-pair
    join; pass ``max_rows=None`` to run it anyway (small fixtures)."""
    from pyspark.sql import functions as F

    from indra_db_spark.operators.similarity import _pair_sim, norm

    if max_rows is not None:
        over = emb.limit(max_rows + 1).count() > max_rows
        if over:
            raise ValueError(
                f"cosine_neardup_pairs is exact all-pairs (quadratic) and "
                f"the input exceeds max_rows={max_rows}; use "
                "cosine_neardup_cells (exact, cell-pruned) or "
                "srp_neardup_pairs (approximate, bucketed) at this scale, "
                "or pass max_rows=None to force the exact join"
            )
    a = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    sim = _pair_sim(
        F.col("va"), F.col("vb"), F.col("na"), F.col("nb"), sim_decimals
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


#: alias kept for readability at call sites that use it as ground truth
exact_neardup_baseline = cosine_neardup_pairs
