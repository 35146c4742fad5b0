"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions.

The image-metadata decode is a REAL struct-level header parser
(:func:`parse_image_header`): PNG IHDR (big-endian), JPEG SOF marker scan,
GIF logical-screen descriptor (little-endian) — no external imaging
library, pure ``struct`` reads, so it runs anywhere and an external oracle
can check ACTUAL decoded width/height on fixture images (the catalog entry
builds byte-exact minimal images and the DuckDB oracle predicts the
dimensions the parser must extract).  Pixel-data decode (PIL/libav) remains
out of scope for this environment; :func:`sample_frames` stays a declared
stub for the video path.

The Spark-side plumbing is the part that matters at 100 TB:

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

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
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

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: JPEG start-of-frame markers that carry dimensions (C0-CF minus the
#: non-SOF C4=DHT, C8=JPG-extension, CC=DAC)
_JPEG_SOF = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of the
    text stand in for real image/audio bytes)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


# --------------------------------------------------- byte-exact test images
#
# Minimal VALID headers (what a real camera file starts with), used by the
# catalog entry and tests so the parser is exercised against true binary
# structure, with arbitrary trailing bytes standing in for the pixel data.

def mk_png(width: int, height: int, tail: bytes = b"") -> bytes:
    """8-byte signature + IHDR chunk (length, type, 13-byte data, CRC32):
    33 bytes + tail."""
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        PNG_SIG
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
        + tail
    )


def mk_jpeg(width: int, height: int, tail: bytes = b"") -> bytes:
    """SOI + SOF0 segment (precision, height, width, 3 components):
    21 bytes + tail."""
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return b"\xff\xd8\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof + tail


def mk_gif(width: int, height: int, tail: bytes = b"") -> bytes:
    """GIF89a signature + little-endian logical screen size: 10 bytes
    + tail."""
    return b"GIF89a" + struct.pack("<HH", width, height) + tail


def parse_image_header(payload: bytes) -> tuple[int, int | None, int | None, str]:
    """(n_bytes, width, height, format) from raw image bytes — pure
    struct-level header reads, no imaging library:

    - PNG: dimensions are big-endian u32 at bytes 16-23 of the IHDR chunk
      (which the spec requires first);
    - JPEG: walk the marker segments from SOI until a start-of-frame
      marker; height/width are big-endian u16 at offsets 5/7 inside it;
    - GIF: little-endian u16 pair at bytes 6-9 of the logical screen
      descriptor.

    Unrecognized payloads return (n, None, None, 'unknown') rather than
    raising — at 100 TB some fraction of any crawl is corrupt, and a
    decode stage that dies on the first bad file is unusable; route the
    'unknown' rows to a quarantine sink instead.
    """
    n = len(payload)
    if payload[:8] == PNG_SIG and n >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return n, w, h, "png"
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= n and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return n, w, h, "jpeg"
            if 0xD0 <= marker <= 0xD9:  # standalone RST/SOI/EOI markers
                i += 2
                continue
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seglen
        return n, None, None, "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a") and n >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return n, w, h, "gif"
    return n, None, None, "unknown"


def attach_synthetic_images(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, payload): byte-exact minimal images whose FORMAT cycles
    png/jpeg/gif by doc_id % 3 and whose dimensions are a pure function of
    the id (width = 1 + id % 512, height = 1 + 7·id % 512), with the
    document's utf-8 bytes appended as stand-in pixel data.

    This is the oracle-able fixture generator: an external SQL engine
    predicts (n_bytes, width, height, format) arithmetically, and the only
    way the Spark side agrees is if :func:`parse_image_header` truly
    extracts the values embedded in the binary structure.
    """
    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("tail"),
    )

    mk = {0: mk_png, 1: mk_jpeg, 2: mk_gif}

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [
                mk[int(i) % 3](1 + int(i) % 512, 1 + (7 * int(i)) % 512, bytes(t))
                for i, t in zip(pdf["doc_id"], pdf["tail"])
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return src.mapInPandas(batches, schema=PAYLOAD_SCHEMA)


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched header decode: (doc_id, n_bytes, width, height,
    format) via :func:`parse_image_header`."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [parse_image_header(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "n_bytes": pd.array([m[0] for m in meta], dtype="Int32"),
                    "width": pd.array([m[1] for m in meta], dtype="Int32"),
                    "height": pd.array([m[2] for m in meta], dtype="Int32"),
                    "format": [m[3] for m in meta],
                }
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
    (doc_id, frame_idx, frame_bytes) — the UDTF/explode shape for video.
    Real code would call libav here; the frame count/size derivation from
    byte length is the declared stand-in."""
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
