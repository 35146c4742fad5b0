"""Custom stateful streaming via ``applyInPandasWithState`` — the escape
hatch for aggregates the built-in windowed/sessionized operators can't
express (non-mergeable state, cross-event logic).  The reference has no
streaming at all (SURVEY.md §2.11); this models continuous ingestion
bookkeeping, e.g. per-source running statement counts during a live load.

Shape notes: state is an explicit tuple schema, updates arrive as pandas
batches per key, and emission happens per micro-batch — so state size is
O(keys), not O(events), and a crashed query resumes from the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
_STATE_SCHEMA = "n LONG, total DOUBLE"


def running_totals(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Cumulative (count, sum) per key, re-emitted every micro-batch.

    Works on a stream (update output mode) via ``applyInPandasWithState``;
    the same call on a batch DataFrame degenerates to one "micro-batch",
    which is exactly the batch groupBy — the parity test oracle.
    """

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.select(key_col, value_col).groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Live ordered-funnel state machine: the streaming twin of
    ``operators.analytics.funnel`` — per user, the earliest completion
    time of each step strictly after the previous step, updated across
    micro-batches and re-emitted whenever a user's state changes.

    State is ``len(steps)`` epoch-microsecond longs per user (-1 =
    incomplete) — O(users × steps), never the event list, the same bound
    the batch funnel's chained aggregates have.  The greedy scan is
    order-final: once step k's earliest qualifying time is fixed, no
    LATER event can change it, so processing events in timestamp order
    reproduces the batch result exactly (parity-tested).  The in-order
    assumption is per user and across micro-batches — the shape a
    time-partitioned ingest (daily drops, kafka per-key ordering) gives
    you; out-of-order late data would need retained per-step candidate
    sets (unbounded state), which is the documented trade for the
    bounded-state form.

    Emits ``(user, s1_ts … sk_ts, n_steps)`` in update mode; the latest
    emission per user is the funnel state.
    """
    if not steps:
        raise ValueError("streaming_funnel needs at least one step")
    from pyspark.sql.types import IntegerType, TimestampType

    k = len(steps)
    out_schema = StructType(
        [StructField("user", LongType())]
        + [StructField(f"s{j}_ts", TimestampType()) for j in range(1, k + 1)]
        + [StructField("n_steps", IntegerType())]
    )
    state_schema = ", ".join(f"s{j} LONG" for j in range(1, k + 1))
    win_us = None if within_seconds is None else within_seconds * 1_000_000
    step_index = {s: j for j, s in enumerate(steps)}

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = list(state.get) if state.exists else [-1] * k
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # stable ts sort: in-order greedy scan == the batch funnel's
        # chained min aggregates (see docstring)
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        changed = False
        ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
        for us, et in zip(ts_us, pdf[type_col]):
            j = step_index.get(et)
            if j is None or st[j] >= 0:
                continue
            if j == 0:
                st[0] = int(us)
                changed = True
            elif st[j - 1] >= 0 and us > st[j - 1] and (
                win_us is None or us - st[0] <= win_us
            ):
                st[j] = int(us)
                changed = True
        if changed:
            state.update(tuple(st))
        if st[0] >= 0 and changed:
            row = {"user": [key[0]]}
            for j in range(k):
                row[f"s{j + 1}_ts"] = [
                    pd.Timestamp(st[j], unit="us") if st[j] >= 0 else pd.NaT
                ]
            row["n_steps"] = [sum(1 for v in st if v >= 0)]
            yield pd.DataFrame(row)

    return (
        events.select(
            F.col(user_col).cast("long").alias("u"),
            F.col(ts_col).alias(ts_col),
            F.col(type_col).alias(type_col),
        )
        .filter(F.col("u").isNotNull() & F.col(ts_col).isNotNull())
        .groupBy("u")
        .applyInPandasWithState(
            _update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
