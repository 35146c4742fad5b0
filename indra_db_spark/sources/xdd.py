"""xDD dump ingestion (reference: cli/xdd.py ``XddManager``).

The reference walks a bucket of per-day dump groups, each holding
``<run_id>[_<id_src>]_bib.json`` / ``..._stmts.json`` pairs; it skips days
already recorded in ``xdd_updates`` (cli/xdd.py:25-33), joins statements to
their bibliography by the content's xDD id to recover a DOI
(cli/xdd.py:35-79), looks up / creates text_refs by DOI
(cli/xdd.py:197-211), derives text_content / reading / raw_statement rows
(cli/xdd.py:81-137), and records an ``xdd_updates`` row only for groups
where every file pair loaded cleanly so partial days are retried next run
(cli/xdd.py:139-146).

Spark-first shape: the reference loads every file driver-side; here only
the directory LISTING and pairing happen on the driver (one FS listing per
day — thousands of entries, not data).  File contents are read once,
distributed, with a whole-file text read + an Arrow-batched
``mapInPandas`` parse (statement JSON is schema-free, so Spark's JSON
schema inference is the wrong tool), and everything downstream — bib join,
DOI→trid resolution, id assignment, retry dedup — is DataFrame joins and
window functions.  New serial ids (trid/tcid/sid) are assigned with
per-day ``row_number`` plus per-day offsets so no global single-partition
window appears even when many days land in one run.

Partial-day retry safety: raw statements are deduplicated against the
existing corpus by uuid anti-join (the reference's ``copy_report_lazy``
skipped-uuid path, cli/xdd.py:125-135), so re-ingesting an incomplete day
is idempotent.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from indra_db_spark.assembly.provenance import ProvenanceLedger
from indra_db_spark.session import local_artifact_df
from indra_db_spark.schemas import (
    RAW_STATEMENTS_SCHEMA,
    READING_SCHEMA,
    TEXT_CONTENT_SCHEMA,
)

#: reader -> unique integer id used in the reading-id hash
#: (reference: databases.py:119 ``readers``)
READER_IDS = {"REACH": 1, "SPARSER": 2, "TRIPS": 3, "ISI": 4, "EIDOS": 5, "MTI": 6}

#: reader -> ordered known-version list; a reading id encodes the INDEX of
#: its version in this list (reference: databases.py:128 ``reader_versions``)
READER_VERSION_REGISTRY = {
    "sparser": ["sept14-linux\n", "sept14-linux", "June2018-linux",
                "October2018-linux", "February2020-linux", "April2020-linux"],
    "reach": ["61059a-biores-e9ee36", "1.3.3-61059a-biores-", "1.6.1",
              "1.6.3-e48717"],
    "trips": ["STATIC", "2019Nov14", "2021Jan26"],
    "isi": ["20180503"],
    "eidos": ["0.2.3-SNAPSHOT", "1.7.1-SNAPSHOT"],
    "mti": ["1.0"],
}

#: the reader versions the xDD collaboration runs (cli/xdd.py:15-16)
XDD_READER_VERSIONS = {"REACH": "1.3.3-61059a-biores-e9ee36",
                       "SPARSER": "February2020-linux"}
XDD_INDRA_VERSION = "1.16.0-c439fdbc936f4eac00cafd559927d7ee06c492e8"


def generate_reading_id(tcid: int, reader: str, reader_version: str) -> int:
    """``AABBCCCCCCCCCC`` reading-id hash: reader id, version index, tcid
    (reference: reading/read_db.py:37-62; version matched on its first 20
    chars as there)."""
    rid = READER_IDS[reader.upper()] * int(10e12)
    rid += (
        READER_VERSION_REGISTRY[reader.lower()].index(reader_version[:20])
        * int(10e10)
    )
    return rid + int(tcid)


# -- driver-side listing / pairing (cli/xdd.py:153-193) ----------------------

_PARSED_SCHEMA = StructType(
    [
        StructField("day_str", StringType()),
        StructField("run_id", StringType()),
        StructField("id_src", StringType()),
        StructField("kind", StringType()),  # bib | stmts
        StructField("xddid", StringType()),
        StructField("doi", StringType()),
        StructField("publisher", StringType()),
        StructField("reader", StringType()),
        StructField("stmt_json", StringType()),
        StructField("parse_error", BooleanType()),
    ]
)


class XDDFileError(Exception):
    pass


def _split_key(name: str) -> tuple[str, str | None, str]:
    """``<run_id>[_<id_src>]_<kind>.json`` -> (run_id, id_src, kind)
    (cli/xdd.py:158-169; unknown shapes raise, as there)."""
    parts = name.split("_")
    if len(parts) == 2:
        run_id, suffix = parts
        id_src = None
    elif len(parts) == 3:
        run_id, id_src, suffix = parts
    else:
        raise XDDFileError(f"XDD file does not match known standards: {name}")
    return run_id, id_src, suffix.split(".")[0]


def _list_groups(spark: SparkSession, root: str) -> dict[str, list[tuple]]:
    """day_str -> [(path, run_id, id_src, kind)] via the Hadoop FS API so
    any scheme works."""
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return {}
    groups: dict[str, list[tuple]] = {}
    for day_status in fs.listStatus(jroot):
        if not day_status.isDirectory():
            continue
        day = day_status.getPath().getName()
        files = []
        for f_status in fs.listStatus(day_status.getPath()):
            name = f_status.getPath().getName()
            if not name.endswith(".json"):
                continue
            run_id, id_src, kind = _split_key(name)
            files.append((str(f_status.getPath().toString()), run_id, id_src, kind))
        groups[day] = files
    return groups


def _pair_files(
    files: list[tuple],
) -> tuple[list[tuple], bool]:
    """Keep only (run_id, id_src) pairs with BOTH bib and stmts
    (cli/xdd.py:184-192); got_all=False when any run is incomplete."""
    by_run: dict[tuple, dict[str, str]] = {}
    for path, run_id, id_src, kind in files:
        by_run.setdefault((run_id, id_src), {})[kind] = path
    kept, got_all = [], True
    for (run_id, id_src), kinds in sorted(by_run.items(), key=str):
        if "bib" not in kinds or "stmts" not in kinds:
            got_all = False
            continue
        kept.append((run_id, id_src, kinds["bib"], kinds["stmts"]))
    return kept, got_all


# -- distributed parse -------------------------------------------------------

def _parse_files(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One whole file per input row -> one output row per bib entry /
    statement.  Bib rows carry doi+publisher (identifier-less bibs yield
    doi=None: their statements are later dropped, cli/xdd.py:57-60);
    statement rows carry the raw statement JSON plus its CONTENT_ID and
    READER text_refs (cli/xdd.py:55-68).  A file that fails to parse
    yields a single parse_error row so the day can be marked incomplete
    (cli/xdd.py:174-181)."""
    for pdf in iterator:
        out = []
        for row in pdf.itertuples(index=False):
            base = {
                "day_str": row.day_str,
                "run_id": row.run_id,
                "id_src": row.id_src,
                "kind": row.kind,
                "xddid": None,
                "doi": None,
                "publisher": None,
                "reader": None,
                "stmt_json": None,
                "parse_error": False,
            }
            # the whole extraction is inside the try: a malformed ENTRY
            # (bib identifier without 'id', a non-dict payload element, …)
            # must also degrade to the file-level parse_error row instead
            # of killing the executor task — file_rows buffers the partial
            # output so a mid-file failure leaves no half-parsed rows
            file_rows: list[dict] = []
            try:
                payload = json.loads(row.value)
                if not isinstance(payload, list):
                    raise ValueError("expected a JSON array")
                if row.kind == "bib":
                    for bib in payload:
                        ident = bib.get("identifier") or []
                        file_rows.append(
                            {
                                **base,
                                "xddid": bib.get("_xddid"),
                                "doi": ident[0]["id"].upper() if ident else None,
                                "publisher": bib.get("publisher"),
                            }
                        )
                else:
                    for sj in payload:
                        ev = (sj.get("evidence") or [{}])[0]
                        trefs = ev.get("text_refs") or {}
                        ev.pop("pmid", None)  # cli/xdd.py:56
                        file_rows.append(
                            {
                                **base,
                                "xddid": trefs.get("CONTENT_ID"),
                                "reader": trefs.get("READER"),
                                "stmt_json": json.dumps(sj, sort_keys=True),
                            }
                        )
            except (ValueError, TypeError, KeyError, AttributeError, IndexError):
                out.append({**base, "parse_error": True})
                continue
            out.extend(file_rows)
        yield pd.DataFrame(out, columns=[f.name for f in _PARSED_SCHEMA.fields])


_ENRICHED_SCHEMA = StructType(
    [
        StructField("day_str", StringType()),
        StructField("uuid", StringType()),
        StructField("mk_hash", LongType()),
        StructField("source_hash", LongType()),
        StructField("reading_id", LongType()),
        StructField("type", StringType()),
        StructField("json", StringType()),
    ]
)


def _enrich_statements(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Inject DOI/TRID/XDD_RUN_ID/XDD_GROUP_ID into each statement's
    evidence text_refs (cli/xdd.py:61-67) and compute the row's hashes the
    same way the kb path does, so downstream preprocess/rehash sees stable
    keys."""
    from indra_db_spark.assembly.preprocess import compute_mk_hash
    from indra_db_spark.plans.fixtures import stable_hash

    for pdf in iterator:
        rows = []
        for row in pdf.itertuples(index=False):
            sj = json.loads(row.stmt_json)
            ev = (sj.get("evidence") or [{}])[0]
            trefs = ev.setdefault("text_refs", {})
            trefs["DOI"] = row.doi
            trefs["TRID"] = int(row.trid)
            trefs["XDD_RUN_ID"] = row.run_id
            trefs["XDD_GROUP_ID"] = row.day_str
            payload = json.dumps(sj, sort_keys=True)
            rows.append(
                {
                    "day_str": row.day_str,
                    "uuid": sj.get("id") or f"xdd-{stable_hash(payload):x}",
                    "mk_hash": compute_mk_hash(sj),
                    "source_hash": stable_hash(f"xdd|{json.dumps(ev, sort_keys=True)}"),
                    "reading_id": int(row.reading_id),
                    "type": sj.get("type"),
                    "json": payload,
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _ENRICHED_SCHEMA.fields])


# -- id assignment -----------------------------------------------------------

def _dense_ids(df: DataFrame, order_cols: list[str], start: int, out_col: str) -> DataFrame:
    """Deterministic dense ids: row_number within each day plus per-day
    offsets, so no single global window partition forms — days are the
    natural parallel unit of an xDD run."""
    w = Window.partitionBy("day_str").orderBy(*order_cols)
    numbered = df.withColumn("_rn", F.row_number().over(w))
    counts = (
        numbered.groupBy("day_str")
        .agg(F.max("_rn").alias("_cnt"))
        .orderBy("day_str")
        .collect()
    )
    if not counts:  # empty frame: create_map() with no pairs won't analyze
        return numbered.withColumn(out_col, F.lit(None).cast("long")).drop("_rn")
    offsets, acc = {}, start
    for r in counts:
        offsets[r["day_str"]] = acc
        acc += r["_cnt"]
    offmap = F.create_map(
        *[x for day, off in sorted(offsets.items()) for x in (F.lit(day), F.lit(off))]
    )
    return numbered.withColumn(
        out_col, (offmap[F.col("day_str")] + F.col("_rn")).cast("long")
    ).drop("_rn")


@dataclass
class XddBatch:
    """New principal-table rows from one xDD ingestion run."""

    text_refs_new: DataFrame      # TEXT_REF-shaped (trid, doi) for new DOIs
    text_content_new: DataFrame   # TEXT_CONTENT_SCHEMA
    reading_new: DataFrame        # READING_SCHEMA
    raw_statements_new: DataFrame  # RAW_STATEMENTS_SCHEMA
    skipped_no_doi: int           # statements whose bib lacked a DOI
    days_complete: list[str]      # groups safe to record in xdd_updates
    days_partial: list[str]       # ingested but NOT recorded (retried later)


def process_xdd_groups(
    spark: SparkSession,
    root: str,
    text_refs: DataFrame,
    existing_raw: DataFrame | None = None,
    ledger: ProvenanceLedger | None = None,
    batch_id: int = 0,
    max_existing: dict[str, int] | None = None,
    text_content: DataFrame | None = None,
) -> XddBatch:
    """One XddManager.run() (cli/xdd.py:138-146) over ``root``.

    ``text_refs`` is the current text_ref table (trid, doi, ... —
    TEXT_REF_SCHEMA); DOIs found there are reused, new DOIs get fresh
    trids above the current max.  ``existing_raw`` enables the
    idempotent-retry uuid filter.  ``max_existing`` may pin the id
    high-water marks {'trid', 'tcid', 'sid'} explicitly; otherwise trid
    comes from ``text_refs``, sid from ``existing_raw``, and tcid from
    ``text_content`` — pass the current text_content table (or pin tcid)
    on ANY run against a non-empty corpus, or minted tcids (and the
    reading ids derived from them) restart at 1 and collide with earlier
    runs'."""
    all_groups = _list_groups(spark, root)
    done = ledger.processed_xdd_days() if ledger is not None else set()
    days = sorted(d for d in all_groups if d not in done)

    reads, complete = [], {}
    for day in days:
        pairs, got_all = _pair_files(all_groups[day])
        complete[day] = got_all
        for run_id, id_src, bib_path, stmts_path in pairs:
            reads.append((day, run_id, id_src, "bib", bib_path))
            reads.append((day, run_id, id_src, "stmts", stmts_path))

    if not reads:
        empty = XddBatch(
            text_refs_new=local_artifact_df(
                spark, [], "trid int, doi string"
            ),
            text_content_new=local_artifact_df(spark, [], TEXT_CONTENT_SCHEMA),
            reading_new=local_artifact_df(spark, [], READING_SCHEMA),
            raw_statements_new=local_artifact_df(
                spark, [], RAW_STATEMENTS_SCHEMA
            ),
            skipped_no_doi=0,
            days_complete=[d for d, ok in complete.items() if ok],
            days_partial=[d for d, ok in complete.items() if not ok],
        )
        return empty

    # ONE distributed whole-file read over every (bib, stmts) file — a
    # per-file DataFrame chained through unionByName builds an O(files)-deep
    # plan that stalls the driver at thousands of files.  The (day, run,
    # src, kind) tags come from a broadcast path-keyed lookup instead.
    # '' is the sentinel for "no id_src": the bib<->stmts equi-join must
    # match on it, and NULL keys never equi-join.
    def _canon(p: str) -> str:
        # canonical join key for a listing URI: unify file:-scheme slash
        # variants to a plain path; any other scheme (s3a://, hdfs://, …)
        # passes through untouched — _list_groups returns fully-qualified
        # URIs, so abspath only applies to a caller-supplied bare path.
        # The listing side is NOT percent-encoded (Hadoop Path.toString()
        # is the decoded form), so no decoding happens here; the
        # executor side decodes input_file_name() to match.
        import re as _re

        if p.startswith("file:"):
            return _re.sub("^file:/{0,2}/", "/", p)
        if _re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", p):
            return p
        return os.path.abspath(p)

    path_rows = [
        (_canon(path), day, run_id, id_src or "", kind)
        for day, run_id, id_src, kind, path in reads
    ]
    lookup = local_artifact_df(
        spark,
        path_rows,
        "path string, day_str string, run_id string, id_src string, kind string",
    )
    # input_file_name() is the percent-encoded URI form; url_decode maps it
    # back to the listing's decoded form.  '+' must be protected first:
    # URL-decoding treats it as a space, but a literal '+' in a file name
    # rides the URI unencoded.
    decoded = F.url_decode(F.regexp_replace(F.input_file_name(), r"\+", "%2B"))
    canon = F.when(
        decoded.startswith("file:"),
        F.regexp_replace(decoded, "^file:/{0,2}/", "/"),
    ).otherwise(decoded)
    raw_files = (
        # the read gets the ORIGINAL listing URIs — canonicalization is
        # only ever a join-key transform, never handed back to Hadoop
        spark.read.option("wholetext", "true")
        .text([path for day, run_id, id_src, kind, path in reads])
        .withColumn("path", canon)
        .join(F.broadcast(lookup), "path", "left")
        # a key mismatch must fail loudly naming the file, not silently
        # drop its rows (the day could otherwise be marked complete and
        # permanently skipped by the ledger with data missing)
        .withColumn(
            "day_str",
            F.when(
                F.col("day_str").isNull(),
                F.raise_error(
                    F.concat(
                        F.lit("xdd listing/read join key mismatch for file: "),
                        F.col("path"),
                    )
                ),
            ).otherwise(F.col("day_str")),
        )
        .select("day_str", "run_id", "id_src", "kind", "value")
    )

    parsed = raw_files.mapInPandas(_parse_files, _PARSED_SCHEMA)
    parsed = parsed.localCheckpoint(eager=False)

    # Days where any file failed to parse are demoted to partial.
    error_days = {
        r["day_str"]
        for r in parsed.filter("parse_error").select("day_str").distinct().collect()
    }
    for d in error_days:
        complete[d] = False

    # one bib per content id: a dump that repeats an _xddid would otherwise
    # multiply every statement of that content through the left join below
    # (the reference's dict keyed on xddid collapses duplicates implicitly)
    bibs = (
        parsed.filter("kind = 'bib' AND NOT parse_error")
        .select("day_str", "run_id", "id_src", "xddid", "doi", "publisher")
        .dropDuplicates(["day_str", "run_id", "id_src", "xddid"])
    )
    stmts = parsed.filter("kind = 'stmts' AND NOT parse_error").select(
        "day_str", "run_id", "id_src", "xddid", "reader", "stmt_json"
    )

    # Statement <- bib join on the content id within its run; no-DOI bibs
    # drop their statements (cli/xdd.py:57-60).
    joined = stmts.join(bibs, ["day_str", "run_id", "id_src", "xddid"], "left")
    skipped_no_doi = joined.filter(F.col("doi").isNull()).count()
    joined = joined.filter(F.col("doi").isNotNull())

    # DOI -> trid: reuse existing text_refs, mint new trids for the rest
    # (cli/xdd.py:197-211).
    tr = text_refs.select(F.col("trid"), F.upper("doi").alias("doi")).filter(
        F.col("doi").isNotNull()
    )
    if max_existing and "trid" in max_existing:
        max_trid = max_existing["trid"]
    else:
        max_trid = (text_refs.agg(F.max("trid")).first()[0] or 0)
    dois = joined.select("doi", "day_str").groupBy("doi").agg(
        F.min("day_str").alias("day_str")
    )
    resolved = dois.join(tr, "doi", "left")
    new_refs = _dense_ids(
        resolved.filter(F.col("trid").isNull()).drop("trid"),
        ["doi"],
        max_trid,
        "trid",
    ).select(F.col("trid").cast("int").alias("trid"), "doi")
    doi_map = (
        resolved.filter(F.col("trid").isNotNull()).select("trid", "doi")
        .unionByName(new_refs)
    )
    joined = joined.join(doi_map, "doi")

    # text_content: one row per (trid, source) with source xdd[-<id_src>]
    # (cli/xdd.py:70-78); preprint mirrors publisher == 'bioRxiv'.
    src_col = F.when(
        F.col("id_src") != "", F.concat(F.lit("xdd-"), F.col("id_src"))
    ).otherwise(F.lit("xdd"))
    tc = (
        joined.select(
            "day_str",
            F.col("trid").alias("text_ref_id"),
            src_col.alias("source"),
            (F.col("publisher") == "bioRxiv").alias("preprint"),
        )
        .groupBy("text_ref_id", "source")
        .agg(
            F.min("day_str").alias("day_str"),
            F.max("preprint").alias("preprint"),
        )
    )
    if max_existing and "tcid" in max_existing:
        max_tcid = max_existing["tcid"]
    elif text_content is not None:
        max_tcid = text_content.agg(F.max("tcid")).first()[0] or 0
    else:
        # fail safe: text_refs (or existing_raw) says the corpus is
        # non-empty, so text_content rows almost certainly exist too —
        # silently minting tcids from 1 would collide with them (and with
        # the reading ids derived from them).  max_trid is already computed
        # above, so this check costs nothing.
        if max_trid > 0 or existing_raw is not None:
            raise ValueError(
                "process_xdd_groups: tcid high-water mark unknown over a "
                "non-empty corpus — pass text_content or pin "
                "max_existing['tcid'] (0 only if the corpus truly has no "
                "text_content rows)"
            )
        max_tcid = 0
    tc = _dense_ids(tc, ["text_ref_id", "source"], max_tcid, "tcid")
    text_content_new = tc.select(
        F.col("tcid").cast("int"),
        F.col("text_ref_id").cast("int"),
        "source",
        F.lit("xdd").alias("format"),
        F.lit("fulltext").alias("text_type"),
        "preprint",
    )

    # reading: the AABBC hash id per (tcid, reader) (cli/xdd.py:104-112).
    version_map = F.create_map(
        *[
            x
            for rdr, ver in sorted(XDD_READER_VERSIONS.items())
            for x in (F.lit(rdr), F.lit(ver))
        ]
    )
    rid_base_map = F.create_map(
        *[
            x
            for rdr, ver in sorted(XDD_READER_VERSIONS.items())
            for x in (
                F.lit(rdr),
                F.lit(generate_reading_id(0, rdr, ver)),
            )
        ]
    )
    with_tc = joined.join(
        tc.select("text_ref_id", "source", "tcid").withColumn(
            "id_src_key", F.col("source")
        ),
        (joined["trid"] == F.col("text_ref_id")) & (src_col == F.col("id_src_key")),
    ).withColumn("reader_uc", F.upper("reader"))
    # a statement whose READER is absent or unregistered has no reading-id
    # base; it must be dropped here, not carried as a NULL that turns into
    # a NaN->int crash inside _enrich_statements
    with_tc = with_tc.filter(
        F.col("reader_uc").isin(*XDD_READER_VERSIONS.keys())
    )
    with_rid = with_tc.withColumn(
        "reading_id", (rid_base_map[F.col("reader_uc")] + F.col("tcid")).cast("long")
    )
    reading_new = (
        with_rid.select(
            F.col("reading_id").alias("rid"),
            F.col("tcid").cast("int").alias("text_content_id"),
            F.col("reader_uc").alias("reader"),
            version_map[F.col("reader_uc")].alias("reader_version"),
        )
        .distinct()
        .withColumn("batch_id", F.lit(batch_id).cast("int"))
    )

    # raw_statements: enrich evidence text_refs, hash, and dedup against
    # the existing corpus by uuid (idempotent retry, cli/xdd.py:125-135).
    enriched = with_rid.select(
        "day_str", "run_id", "doi", "trid", "reading_id", "stmt_json"
    ).mapInPandas(_enrich_statements, _ENRICHED_SCHEMA)
    # in-batch uuid dedup: the anti-join below only guards against rows
    # already persisted; a uuid repeated WITHIN the batch (e.g. the same
    # statement listed under two runs) must also collapse to one row —
    # deterministically (first by day/json), not dropDuplicates' partition
    # lottery, so a retried run reproduces the same surviving row
    w_uuid = Window.partitionBy("uuid").orderBy("day_str", "json")
    enriched = (
        enriched.withColumn("_rn", F.row_number().over(w_uuid))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if existing_raw is not None:
        enriched = enriched.join(
            existing_raw.select("uuid"), "uuid", "left_anti"
        )
    if max_existing and "sid" in max_existing:
        max_sid = max_existing["sid"]
    elif existing_raw is not None:
        max_sid = existing_raw.agg(F.max("sid")).first()[0] or 0
    else:
        max_sid = 0
    enriched = _dense_ids(enriched, ["uuid"], max_sid, "sid")
    raw_statements_new = enriched.select(
        F.col("sid").cast("long"),
        "uuid",
        F.lit(batch_id).cast("int").alias("batch_id"),
        "mk_hash",
        "source_hash",
        "reading_id",
        F.lit(None).cast(IntegerType()).alias("db_info_id"),
        "type",
        F.col("json").cast("binary"),
    )

    return XddBatch(
        text_refs_new=new_refs,
        text_content_new=text_content_new,
        reading_new=reading_new,
        raw_statements_new=raw_statements_new,
        skipped_no_doi=skipped_no_doi,
        days_complete=sorted(d for d, ok in complete.items() if ok),
        days_partial=sorted(d for d, ok in complete.items() if not ok),
    )


def record_xdd_run(ledger: ProvenanceLedger, batch: XddBatch, now) -> None:
    """Record xdd_updates rows for the COMPLETE days only, so partial days
    are re-listed (and idempotently re-ingested) next run
    (cli/xdd.py:139-146)."""
    ledger.record(
        "xdd_updates",
        [
            {
                "reader_versions": json.dumps(XDD_READER_VERSIONS, sort_keys=True),
                "indra_version": XDD_INDRA_VERSION,
                "day_str": day,
                "processed_date": now,
            }
            for day in batch.days_complete
        ],
    )
