"""Distillation: reader de-duplication.

The reference groups text_content rows by text_ref × reader, keeps only the
newest reader version per (source, text_type), prefers fulltext by a
source-priority list and otherwise falls back to abstract/title, and emits
the set of reading ids to drop (reference:
readonly_dumping/export_assembly.py:174-233 reader_prioritize, :236-306
distill_statements; legacy in-DB variant util/distill_statements.py:254-318).

Spark-first: the reference's single-process pandas loop (~1.5 h at
production scale, export_assembly.py:257) is a window argmax — rank
candidate readings per (text_ref, reader) by (content priority, version
desc) and keep row_number()==1.  No Python in the hot path; at 100 TB this
is one shuffle on (text_ref_id, reader).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fulltext source preference, best first (export_assembly.py:174-196);
#: non-fulltext (abstract > title) ranks after every fulltext source.
FULLTEXT_PRIORITY = ("pmc_oa", "manuscripts", "elsevier", "cord19_pdf", "pmc")
TEXT_TYPE_FALLBACK = {"abstract": 100, "title": 101}


def _content_priority() -> "F.Column":
    expr = F.lit(len(FULLTEXT_PRIORITY) + 200)  # unknown: worst
    for tt, p in TEXT_TYPE_FALLBACK.items():
        expr = F.when(F.col("text_type") == tt, F.lit(p)).otherwise(expr)
    for i, src in enumerate(FULLTEXT_PRIORITY):
        expr = F.when(
            (F.col("text_type") == "fulltext") & (F.col("source") == src),
            F.lit(i),
        ).otherwise(expr)
    return expr


def distill_readings(text_content: DataFrame, reading: DataFrame) -> DataFrame:
    """Reading ids that survive distillation, one per (text_ref, reader).

    Returns a 1-column DataFrame ``rid`` — semi-join raw_statements against
    it to drop statements extracted from superseded readings (the
    reference's ``drop_readings`` set, export_assembly.py:236-306).
    """
    cand = reading.join(
        text_content.select("tcid", "text_ref_id", "source", "text_type"),
        reading["text_content_id"] == text_content["tcid"],
    )
    w = (
        Window.partitionBy("text_ref_id", "reader")
        .orderBy(
            _content_priority().asc(),
            F.col("reader_version").desc(),
            F.col("rid").asc(),
        )
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("rid")
    )
