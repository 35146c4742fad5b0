"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The decode step itself is STUBBED (image/audio libs are not available in
this environment — see ``_decode_stub``): it derives deterministic fake
metadata from the raw bytes.  Everything around it is real and is the part
that matters at 100 TB:

- schema: ``binary`` payload + typed metadata struct, never strings;
- ``mapInPandas`` (Arrow batches) rather than a row-at-a-time UDF —
  decode cost amortizes over ~10k-row batches and bytes cross the
  JVM↔Python boundary once, zero-copy via Arrow;
- per-frame explosion (video frame sampling) emits multiple rows per input
  inside the same pandas batch — a UDTF shape without a driver loop;
- partitioning: callers should repartition by a size-balanced key before
  heavy decode so one executor doesn't get all the 4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
    ]
)

_FORMATS = ("png", "jpeg", "webp")


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of the
    text stand in for real image/audio bytes)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: real code would call PIL/libav here.

    Raises nothing and uses only byte length so an external oracle can
    reproduce it; swap for a real decoder behind the same signature.
    """
    n = len(payload)
    width = 32 + n % 608
    height = 32 + (n * 7) % 608
    fmt = _FORMATS[n % 3]
    return n, width, height, fmt


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched 'decode': (doc_id, n_bytes, width, height, format)."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                meta, columns=["n_bytes", "width", "height", "format"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return src.mapInPandas(batches, schema=DECODED_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_frames: int = 4,
) -> DataFrame:
    """Frame-sampling stub: each payload yields 1..max_frames rows
    (doc_id, frame_idx, frame_bytes) — the UDTF/explode shape for video."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n = len(p)
                n_frames = n % max_frames + 1
                for i in range(n_frames):
                    rows.append((doc_id, i, n // n_frames))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return src.mapInPandas(batches, schema=FRAME_SCHEMA)
