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


MANIFEST_NAME = "manifest.json"


def _fs_write_text(spark, path: str, text: str) -> None:
    """Write a small text file through the Hadoop FileSystem API so release
    roots can be any scheme Spark itself can write (file://, hdfs://,
    s3a://, …) — builtin open() only handles local paths."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _fs_read_text(spark, path: str) -> str:
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jpath)
    try:
        # commons-io ships with Hadoop; a py4j-side read loop would not see
        # Java's writes into a passed bytearray (py4j copies by value)
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def _join(root: str, *parts: str) -> str:
    # '/'-join, not os.path.join: object-store URIs are always
    # slash-separated regardless of the driver's platform
    return "/".join([root.rstrip("/"), *parts])


def write_release(lake, root: str, meta: dict | None = None, optimized: bool = True) -> dict:
    """Write the readonly lake as a release artifact: Parquet tables + a
    ``manifest.json`` recording per-table schema/row counts and caller
    metadata — the reference's Start→…→End dump chain with its S3 manifest
    role (databases.py:1121-1228, cli/dump.py:284-614) re-expressed as a
    self-describing Parquet directory.

    ``root`` may be any Hadoop-FS scheme (local path, hdfs://, s3a://): the
    manifest goes through the FileSystem API next to the tables.  The
    manifest is computed by RE-READING the written Parquet — a partial or
    failed table write cannot produce a manifest that validates.
    """
    if optimized:
        lake.write_optimized(root)
    else:
        lake.write_parquet(root)
    spark = next(iter(lake.tables().values())).sparkSession
    written = {
        name: spark.read.parquet(_join(root, name)) for name in lake.tables()
    }
    manifest = {"tables": snapshot(written), "meta": meta or {}}
    _fs_write_text(
        spark,
        _join(root, MANIFEST_NAME),
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def load_release(spark, root: str, strict: bool = True, row_tolerance: float = 0.0):
    """Load a release directory back into a ReadonlyLake, validating the
    stored manifest against what was actually read (the reference's golden
    snapshot check at restore time, readonly_dumping.py:2295-2302).

    Returns (lake, problems); ``strict`` raises on any drift.
    """
    from indra_db_spark.plans.lake import ReadonlyLake

    manifest = json.loads(_fs_read_text(spark, _join(root, MANIFEST_NAME)))
    lake = ReadonlyLake(
        {
            name: spark.read.parquet(_join(root, name))
            for name in manifest["tables"]
        }
    )
    problems = diff_snapshots(
        manifest["tables"], snapshot(lake.tables()), row_tolerance
    )
    if strict and problems:
        raise ValueError(f"release drift: {problems}")
    return lake, problems
