"""Distillation: reader de-duplication.

The reference groups text_content rows by text_ref × reader, keeps only the
newest reader version per (source, text_type), prefers fulltext by a
source-priority list and otherwise keeps the abstract/title fallbacks, and
emits the set of reading ids to drop (reference:
readonly_dumping/export_assembly.py:174-233 reader_prioritize, :236-306
distill_statements; legacy in-DB variant util/distill_statements.py:254-318).

Per (text_ref, reader) group the reference keeps:

* exactly ONE reading when any fulltext exists — the best fulltext by
  source priority (export_assembly.py:218-232); every non-fulltext row is
  dropped.  A fulltext from a source missing from the priority list still
  beats every non-fulltext row (we rank it worst *among fulltexts*; the
  reference would raise on ``priority.index``, so this is the benign
  extension).
* ALL surviving non-fulltext readings when no fulltext exists — both the
  abstract and the title (export_assembly.py:204-214).  The one exception:
  a ``cord19_abstract`` abstract includes the title, so its presence drops
  the ``pubmed`` abstract and title.

Spark-first: the reference's single-process pandas loop (~1.5 h at
production scale, export_assembly.py:257) becomes two window passes — a
version argmax per (text_ref, reader, source, text_type) and a keep
predicate over (text_ref, reader).  No Python in the hot path; at 100 TB
this is two narrow-key shuffles, both partial-aggregation friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fulltext source preference, best first (export_assembly.py:218-227 lists
#: worst-first and sorts reverse; this is the same order inverted).
FULLTEXT_PRIORITY = (
    "pmc_oa",
    "manuscripts",
    "cord19_pmc_xml",
    "elsevier",
    "cord19_pdf",
    "xdd-biorxiv",
    "xdd",
    "xdd-pubmed",
)


def _fulltext_rank() -> "F.Column":
    # Unknown fulltext sources rank after every listed one but still beat
    # non-fulltext (the window below orders fulltext rows first).
    expr = F.lit(len(FULLTEXT_PRIORITY))
    for i, src in enumerate(FULLTEXT_PRIORITY):
        expr = F.when(F.col("source") == src, F.lit(i)).otherwise(expr)
    return expr


def _version_rank(version_priority: dict[str, "list[str]"] | None) -> "F.Column":
    """Explicit reader-version ordering (export_assembly.py:185-189 sorts by
    ``reader_versions[reader].index(version)``, newest = highest index).
    Falls back to lexicographic ``reader_version`` for unlisted pairs, which
    is correct for same-width version strings.

    The rank is a STRING so both regimes compose in one ORDER BY: listed
    (reader, version) pairs rank ``"1:<zero-padded index>"`` — above every
    unlisted pair (explicit priority wins) — while unlisted pairs rank
    ``"0:<version>"``, preserving lexicographic order among themselves
    instead of collapsing to an arbitrary tie."""
    if not version_priority:
        return F.col("reader_version")
    expr = F.concat(F.lit("0:"), F.col("reader_version"))
    for reader, versions in version_priority.items():
        for i, v in enumerate(versions):
            expr = F.when(
                (F.col("reader") == reader) & (F.col("reader_version") == v),
                F.lit(f"1:{i:06d}"),
            ).otherwise(expr)
    return expr


#: Content-source preference for STATEMENT-level distillation, worst first
#: (the legacy algorithm's text_content_sources list,
#: util/distill_statements.py:129-137; iterated reversed = best first).
STMT_SOURCE_PRIORITY = (
    ("pubmed", "title"),
    ("cord19_abstract", "abstract"),
    ("pubmed", "abstract"),
    ("cord19_pdf", "fulltext"),
    ("elsevier", "fulltext"),
    ("cord19_pmc_xml", "fulltext"),
    ("manuscripts", "fulltext"),
    ("pmc_oa", "fulltext"),
)


def distill_statements_level(
    stmts: DataFrame,
    version_priority: dict[str, "list[str]"] | None = None,
) -> DataFrame:
    """STATEMENT-level distillation — the reference's legacy in-DB
    algorithm (util/distill_statements.py:140-228 get_filtered_rdg_stmts),
    distinct from the modern reading-level :func:`distill_readings`: a
    statement survives or dies individually, by hash, so an abstract-only
    finding outlives a fulltext re-read that did not reproduce it.

    Input columns: ``sid trid src text_type tcid reader rv rid mk_hash
    text_hash linked`` (``linked`` = already included in a prior
    preassembly — the reference's ``linked_sids``).  Output: every input
    sid with ``status`` ∈:

    - ``kept`` — the copy propagated to preassembly: per (text_ref,
      reader, statement-hash), the one from the best-ranked content
      source among newest-reader-version readings;
    - ``bettered`` — superseded by a better alternative: either read by
      an OLDER version of the same reader on the same content
      (distill_statements.py:154-163), or a worse-source copy of a kept
      hash that was already linked (:200-207 — the 'old' branch);
    - ``dropped`` — a worse-source duplicate never yet linked: the
      reference silently discards these (neither kept nor bettered).

    Spark mapping: two window functions — a version argmax per
    (trid, src, text_type, tcid, reader) and a source-priority argmin per
    (trid, reader, mk_hash, text_hash) — so the whole pass is two
    narrow-key shuffles with no Python, vs the reference's driver-side
    NestedDict walk.  Golden parity with the reference's own curated
    distillation set is pinned in tests/test_assembly_golden.py.
    """
    rank = {p: i for i, p in enumerate(STMT_SOURCE_PRIORITY)}
    src_rank = F.lit(-1)
    for (src, tt), i in rank.items():
        src_rank = F.when(
            (F.col("src") == src) & (F.col("text_type") == tt), F.lit(i)
        ).otherwise(src_rank)

    vrank = F.col("rv")
    if version_priority:
        vrank = F.concat(F.lit("0:"), F.col("rv"))
        for reader, versions in version_priority.items():
            for i, v in enumerate(versions):
                vrank = F.when(
                    (F.col("reader") == reader) & (F.col("rv") == v),
                    F.lit(f"1:{i:06d}"),
                ).otherwise(vrank)

    w_ver = Window.partitionBy("trid", "src", "text_type", "tcid", "reader")
    cand = stmts.withColumn("_vr", vrank).withColumn(
        "_best_vr", F.max("_vr").over(w_ver)
    )
    old_version = F.col("_vr") != F.col("_best_vr")

    w_hash = Window.partitionBy(
        "trid", "reader", "mk_hash", "text_hash"
    ).orderBy(
        F.desc("_src_rank"), F.asc("tcid"), F.asc("rid"), F.asc("sid")
    )
    ranked = (
        cand.filter(~old_version)
        .withColumn("_src_rank", src_rank)
        .withColumn("_rn", F.row_number().over(w_hash))
    )
    status_best = F.when(F.col("_rn") == 1, F.lit("kept")).otherwise(
        F.when(F.col("linked"), F.lit("bettered")).otherwise(F.lit("dropped"))
    )
    best_rv = ranked.select("sid", status_best.alias("status"))
    old_rv = cand.filter(old_version).select(
        "sid", F.lit("bettered").alias("status")
    )
    return best_rv.unionByName(old_rv)


def distill_readings(
    text_content: DataFrame,
    reading: DataFrame,
    version_priority: dict[str, "list[str]"] | None = None,
) -> DataFrame:
    """Reading ids that survive distillation.

    Returns a 1-column DataFrame ``rid`` — semi-join raw_statements against
    it to drop statements extracted from superseded readings (the
    reference's ``drop_readings`` set, export_assembly.py:236-306).  May
    contain several rids per (text_ref, reader): abstract + title both
    survive when no fulltext exists.

    ``version_priority`` maps reader → version list oldest-first (the
    reference's ``reader_versions`` registry); without it, versions order
    lexicographically.
    """
    cand = reading.join(
        text_content.select("tcid", "text_ref_id", "source", "text_type"),
        reading["text_content_id"] == text_content["tcid"],
    )

    # Newest reader version per (text_ref, reader, source, text_type)
    # (export_assembly.py:180-193).
    w_ver = Window.partitionBy(
        "text_ref_id", "reader", "source", "text_type"
    ).orderBy(_version_rank(version_priority).desc(), F.col("rid").asc())
    cand = (
        cand.withColumn("_vn", F.row_number().over(w_ver))
        .filter(F.col("_vn") == 1)
        .drop("_vn")
    )

    is_ft = F.col("text_type") == "fulltext"
    grp = Window.partitionBy("text_ref_id", "reader")
    w_best = grp.orderBy(
        is_ft.cast("int").desc(), _fulltext_rank().asc(), F.col("rid").asc()
    )
    cand = (
        cand.withColumn("_has_ft", F.max(is_ft.cast("int")).over(grp))
        .withColumn(
            "_has_c19",
            F.max(
                (
                    (F.col("source") == "cord19_abstract")
                    & (F.col("text_type") == "abstract")
                ).cast("int")
            ).over(grp),
        )
        .withColumn("_rn", F.row_number().over(w_best))
    )

    keep = F.when(F.col("_has_ft") == 1, F.col("_rn") == 1).otherwise(
        ~(
            (F.col("_has_c19") == 1)
            & (F.col("source") == "pubmed")
            & F.col("text_type").isin("abstract", "title")
        )
    )
    return cand.filter(keep).select("rid")
