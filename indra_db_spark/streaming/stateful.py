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
