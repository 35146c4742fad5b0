"""Structured Streaming extension.

The reference is batch-only — incrementality is dated batch "update" runs
(xdd_updates / preassembly_updates, principal_schema.py:1022-1104; SURVEY.md
§2.11) — so nothing here is required for parity.  This layer upgrades that
model: the same DataFrame transformations run over ``readStream`` sources
with event-time watermarks, making ingestion continuous instead of daily.
"""

from indra_db_spark.streaming.ingest import (
    read_stream,
    sessionize,
    stream_dedup,
    windowed_counts,
)
from indra_db_spark.streaming.stateful import running_totals, streaming_funnel

__all__ = [
    "read_stream",
    "running_totals",
    "sessionize",
    "stream_dedup",
    "streaming_funnel",
    "windowed_counts",
]
