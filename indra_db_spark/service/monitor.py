"""Pipeline monitoring: stage-runtime ledger + corpus statistics jobs.

The reference instruments every manager with a ``DataGatherer`` that dumps
per-run timing/count JSON to S3 (indra_db/util/data_gatherer.py:19-120),
digests those blobs into ``runtimes.json`` + per-stage count series
(data_gatherer.py:182-260), and serves them from the ``/monitor`` routes
(indra_db_service/api.py:274-338).  The ``/summary`` page additionally
serves ``db_stats.json`` built by full driver-side scans of the 48M-row
unique-statements TSV (indra_db/util/visualization.py:393-428,554-611).

This module keeps the gatherer/digest surface byte-compatible in shape but
swaps S3 for a pluggable blob store (``LocalStageStore``), and re-expresses
every statistics scan as a distributed aggregation over the principal /
readonly DataFrames — at 100 TB the stats are partial-aggregated
map-side and only the tiny digest reaches the driver, where the reference
iterates the corpus row by row with tqdm.

Parity seam: the reference types entities through ``bio_ontology.get_type``
(an external ontology model); :data:`NS_GROUP_MAP` stands in with a
namespace-derived mapping onto the same seven display groups
(visualization.py:29-52), declared as a boundary like the
grounding/scorer stand-ins.
"""

from __future__ import annotations

import functools
import json
import os
import re
import traceback
from collections import defaultdict
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_FMT = "%Y%m%d"
TIME_FMT = "%H%M%S"


# --------------------------------------------------------------- blob store


class LocalStageStore:
    """Filesystem analog of the reference's S3 stage bucket
    (data_gatherer.py:14 S3_DATA_LOC): keys are relative paths under
    ``root``, values JSON-serializable objects.  A production deployment
    would point the same three methods at object storage."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def put(self, key: str, obj) -> None:
        path = os.path.join(self.root, key)
        os.makedirs(os.path.dirname(path) or self.root, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)

    def get(self, key: str):
        with open(os.path.join(self.root, key)) as f:
            return json.load(f)

    def list(self, prefix: str = "") -> list[str]:
        out = []
        for dirpath, _, files in os.walk(self.root):
            for name in files:
                rel = os.path.relpath(os.path.join(dirpath, name), self.root)
                rel = rel.replace(os.sep, "/")
                if rel.startswith(prefix) and rel.endswith(".json"):
                    out.append(rel)
        return sorted(out)


# ------------------------------------------------------------ data gatherer


class DataGatherer:
    """Stage instrumentation with the reference's exact API — ``start`` /
    ``add(field)`` / ``dump`` and the ``DGContext.wrap`` decorator
    (data_gatherer.py:42-120) — minus boto3: blobs go to a
    :class:`LocalStageStore` (or anything with ``.put``)."""

    def __init__(self, label: str, counts_fields, store: LocalStageStore | None = None):
        self._label = label
        self._sub_label = None
        self._counts_fields = list(counts_fields)
        self._timing = self._counts = self._error = None
        self._in_context = False
        self.store = store

    def set_sub_label(self, sub_label: str) -> None:
        self._sub_label = sub_label

    def start(self) -> None:
        self._timing = {"start": datetime.now(timezone.utc), "end": None, "dur": None}
        self._counts = dict.fromkeys(self._counts_fields, 0)
        self._error = None
        self._in_context = True

    def add(self, field: str, num: int = 1) -> None:
        if field not in self._counts:
            raise ValueError(
                f"Unexpected field: {field}. Should be one of: {self._counts_fields}."
            )
        if not self._in_context:
            raise RuntimeError(f"Attempted to update value {field} out of context.")
        self._counts[field] += num

    def dump(self, err_type=None, err=None, tb=None) -> str:
        """Close the stage and persist the run blob; returns the key
        (``{day}/{label}[/{sub}]_{time}.json``, data_gatherer.py:93-99)."""
        if err_type:
            self._error = {
                "type": err_type.__name__,
                "value": str(err),
                "traceback": "".join(traceback.format_exception(err_type, err, tb)),
            }
        self._timing["end"] = datetime.now(timezone.utc)
        self._timing["dur"] = self._timing["end"] - self._timing["start"]

        key = self._timing["start"].strftime(DAY_FMT) + "/" + self._label
        if self._sub_label:
            key += "/" + self._sub_label
        key += "_" + self._timing["start"].strftime(TIME_FMT) + ".json"

        stats = {
            "timing": {
                "start": self._timing["start"].timestamp() * 1000,
                "end": self._timing["end"].timestamp() * 1000,
                "dur": self._timing["dur"].total_seconds() * 1000,
            },
            "counts": self._counts,
            "error": self._error,
        }
        if self.store is not None:
            self.store.put(key, stats)
        self._in_context = False
        self._last = stats
        return key


class DGContext:
    """``with DGContext(gatherer): ...`` / ``@DGContext.wrap(gatherer)``
    (data_gatherer.py:19-39): dumps on exit, error captured, not
    swallowed."""

    def __init__(self, gatherer: DataGatherer):
        self.gatherer = gatherer

    def __enter__(self):
        self.gatherer.start()

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.gatherer.dump(exc_type, exc_val, exc_tb)

    @classmethod
    def wrap(cls, gatherer: DataGatherer, sub_label: str | None = None):
        def sub_wrap(func):
            @functools.wraps(func)
            def decorated(*args, **kwargs):
                if sub_label:
                    gatherer.set_sub_label(sub_label)
                with cls(gatherer):
                    return func(*args, **kwargs)

            return decorated

        return sub_wrap


_KEY_PATT = re.compile(r"([0-9]+)/(\w*?)/?(\w+)_([0-9]+)\.json$")


def digest_store(store: LocalStageStore) -> tuple[list, dict]:
    """Aggregate the per-run blobs into the monitor page's two artifacts
    (data_gatherer.py:182-260):

    - ``runtimes``: per day, per stage/flavor, ``[start_h, end_h]`` pairs
      in hours since UTC midnight of the blob's day — runs that cross
      midnight carry ``[0, end]`` segments into the following days (the
      DayStack logic);
    - per-stage count digests: ``{field: {flavor|total: [[day_ts, n]...]}}``.

    Writes ``runtimes.json`` and ``<stage>.json`` back to the store and
    returns both.
    """
    days: dict[str, list[str]] = defaultdict(list)
    for key in store.list():
        if "/" not in key:
            continue
        days[key.split("/", 1)[0]].append(key)

    runtime_data = []
    carry: dict[int, list] = defaultdict(list)  # days-in-future -> segments
    stage_counts: dict = defaultdict(  # stage -> field -> flavor -> day -> n
        lambda: defaultdict(lambda: defaultdict(lambda: defaultdict(int)))
    )
    # iterate EVERY calendar day between the first and last blob day — the
    # carry is keyed by days-in-future, so skipping blob-less days would
    # land a midnight-crossing run's overflow segment on the next day that
    # happens to have blobs (possibly a week late) instead of its real day
    if days:
        from datetime import timedelta

        first = datetime.strptime(min(days), DAY_FMT)
        last = datetime.strptime(max(days), DAY_FMT)
        all_days = [
            (first + timedelta(days=i)).strftime(DAY_FMT)
            for i in range((last - first).days + 1)
        ]
    else:
        all_days = []
    for day in all_days:
        day_obj = datetime.strptime(day, DAY_FMT).replace(tzinfo=timezone.utc)
        day_ts = day_obj.timestamp() * 1000
        times: dict = defaultdict(lambda: defaultdict(list))

        for stage, flavor, pair in carry.pop(0, []):
            if flavor:
                times[stage][flavor].append(pair)
            times[stage]["all"].append(pair)
        carry = defaultdict(list, {k - 1: v for k, v in carry.items() if k > 0})

        for key in days.get(day, []):
            m = _KEY_PATT.match(key)
            if not m:
                continue
            data = store.get(key)
            _, stage, flavor, _ = m.groups()
            if not stage:
                stage, flavor = flavor, None
            div = 3600 * 1000
            # hours since UTC midnight of the blob's day.  The reference
            # adds +5 here (data_gatherer.py:232-233) to compensate for
            # keying blobs by a HOST-LOCAL (US/Eastern) day while timing
            # in UTC; this port keys and times in UTC end-to-end, so the
            # offset would shift post-19:00-UTC runs past the 24 h carry
            # threshold and render inverted bars
            start = (data["timing"]["start"] - day_ts) / div
            end = (data["timing"]["end"] - day_ts) / div
            n_days_future = int(end // 24)
            for fut in range(n_days_future - 1):
                carry[fut].append((stage, flavor, [0.0, 24.0]))
            if n_days_future and end % 24:
                carry[n_days_future - 1].append((stage, flavor, [0.0, end % 24]))
            if n_days_future:
                end = 24.0
            pair = [start, end]
            if flavor:
                times[stage][flavor].append(pair)
            times[stage]["all"].append(pair)

            for field, n in (data.get("counts") or {}).items():
                if flavor:
                    stage_counts[stage][field][flavor][day_ts] += n
                stage_counts[stage][field]["total"][day_ts] += n
            stage_counts[stage]["jobs"]["total"][day_ts] += 1
            if flavor:
                stage_counts[stage]["jobs"][flavor][day_ts] += 1

        if times:  # blob-less days only appear if a carry landed on them
            runtime_data.append(
                {
                    "day_str": day_obj.strftime("%b %d %Y"),
                    "day_ts": day_ts,
                    "times": {s: dict(fv) for s, fv in times.items()},
                }
            )

    digests = {
        stage: {
            field: {
                flavor: sorted([d, n] for d, n in by_day.items())
                for flavor, by_day in by_flavor.items()
            }
            for field, by_flavor in fields.items()
        }
        for stage, fields in stage_counts.items()
    }
    store.put("runtimes.json", runtime_data)
    for stage, digest in digests.items():
        store.put(stage + ".json", digest)
    return runtime_data, digests


# ------------------------------------------------------------- stats jobs

#: agent namespaces that are surface forms, not groundings
#: (visualization.py:415: set(db_refs) - {TEXT, TEXT_NORM}; NAME is the
#: display name the readonly build splits into name_meta, so it is not a
#: grounding either)
UNGROUNDED_NS = ("TEXT", "TEXT_NORM", "NAME", "AUTO")

#: namespace -> display group: the stand-in for bio_ontology.get_type +
#: GROUP_MAP (visualization.py:29-52) — same seven output groups, typed by
#: grounding namespace instead of the ontology model
NS_GROUP_MAP = {
    "HGNC": "human gene/protein",
    "UP": "human gene/protein",
    "UPPRO": "human gene/protein",
    "FPLX": "human gene/protein",
    "MIRBASE": "human gene/protein",
    "CHEBI": "small molecule",
    "CHEMBL": "small molecule",
    "PUBCHEM": "small molecule",
    "DRUGBANK": "small molecule",
    "CAS": "small molecule",
    "HMS-LINCS": "small molecule",
    "LINCS": "small molecule",
    "GO": "biological process",
    "MESH": "disease or phenotype",
    "DOID": "disease or phenotype",
    "HP": "disease or phenotype",
    "EFO": "experimental factor",
    "TAXONOMY": "other",
    "UBERON": "other",
    "CL": "other",
}

TEXT_TYPES = ("abstract", "fulltext", "title")


def text_content_stats(text_content: DataFrame) -> DataFrame:
    """(text_type, count) over abstract/fulltext/title — the reference's
    raw SQL in generate_db_stats (visualization.py:556-570)."""
    return (
        text_content.filter(F.col("text_type").isin(*TEXT_TYPES))
        .groupBy("text_type")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _grounding_buckets(pa_statements: DataFrame, pa_agents: DataFrame) -> DataFrame:
    """One row per statement: (mk_hash, num_agents, num_grounded) — the
    distributed form of the reference's per-statement
    ``real_agent_list`` / db_refs scan (visualization.py:408-424)."""
    per_stmt = (
        pa_agents.groupBy(F.col("stmt_mk_hash").alias("mk_hash"))
        .agg(
            F.count_distinct("ag_num").alias("num_agents"),
            F.count_distinct(
                F.when(~F.col("db_name").isin(*UNGROUNDED_NS), F.col("ag_num"))
            ).alias("num_grounded"),
        )
    )
    return pa_statements.select("mk_hash").join(per_stmt, "mk_hash", "left")


def unique_stmt_stats(pa_statements: DataFrame, pa_agents: DataFrame) -> dict:
    """Counts for total + grounding (compute_unique_stmt_stats,
    visualization.py:393-428): one aggregation job, four numbers back."""
    b = _grounding_buckets(pa_statements, pa_agents)
    row = b.agg(
        F.count(F.lit(1)).alias("unique_statement"),
        F.sum(
            (
                (F.col("num_agents") > 0)
                & (F.col("num_grounded") == F.col("num_agents"))
            ).cast("int")
        ).alias("grounding_full"),
        F.sum(
            ((F.col("num_agents") > 0) & (F.col("num_grounded") == 0)).cast("int")
        ).alias("grounding_ungrounded"),
        F.sum(
            (
                (F.col("num_grounded") > 0)
                & (F.col("num_grounded") < F.col("num_agents"))
            ).cast("int")
        ).alias("grounding_partial"),
    ).collect()[0]
    return {
        "unique_statement": int(row.unique_statement),
        "grounding_full": int(row.grounding_full or 0),
        "grounding_partial": int(row.grounding_partial or 0),
        "grounding_ungrounded": int(row.grounding_ungrounded or 0),
    }


def source_stats(fast_raw_pa_link: DataFrame) -> DataFrame:
    """(src, count) over the evidence-grain link, count desc
    (generate_source_stats, visualization.py:592-611; the reference
    coalesces with raw_stmt_src — here src is non-null by construction
    of build_fast_raw_pa_link, so the group-by is direct)."""
    return (
        fast_raw_pa_link.groupBy("src")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("src"))
    )


def stmt_type_distribution(pa_statements: DataFrame) -> DataFrame:
    """(type, count) desc (statement_type_distribution_graph,
    visualization.py:54-75)."""
    return (
        pa_statements.groupBy("type")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("type"))
    )


def belief_distribution(belief: DataFrame, bins: int = 10) -> DataFrame:
    """(bucket, count): belief scores histogrammed into ``bins`` equal
    buckets, belief==1.0 clamped into the top one (the data behind
    belief_score_distribution_graph)."""
    bucket = F.least(
        F.floor(F.col("belief") * bins).cast("int"), F.lit(bins - 1)
    )
    return (
        belief.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("bucket")
    )


def evidence_distribution(evidence_counts: DataFrame) -> DataFrame:
    """(ev_count, num_statements): the log-log scatter data of
    evidence_vs_statement_graph (visualization.py:470-500) as a frequency
    table — two nested aggregations, no driver-side Counter."""
    return (
        evidence_counts.groupBy("ev_count")
        .agg(F.count(F.lit(1)).alias("num_statements"))
        .orderBy("ev_count")
    )


def entity_pair_stats(pa_statements: DataFrame, pa_agents: DataFrame) -> DataFrame:
    """(source, target, value) directed entity-group pair counts
    (generate_entity_pair_stats, visualization.py:334-390).

    Reference semantics, re-expressed as array expressions over one
    grouped collect: per statement take each grounded agent's display
    group (namespace-typed, :data:`NS_GROUP_MAP`); for a plain 2-agent
    statement count the ordered (first, second) pair once; for a Complex
    or >2-agent statement count every unordered group combination in both
    directions plus (g, g) for any group appearing on ≥2 agents."""
    grounded = (
        pa_agents.filter(~F.col("db_name").isin(*UNGROUNDED_NS))
        .withColumn(
            "grp",
            F.coalesce(
                *(
                    [
                        F.when(F.col("db_name") == ns, F.lit(g))
                        for ns, g in NS_GROUP_MAP.items()
                    ]
                    + [F.lit("other")]
                )
            ),
        )
        # one group per agent slot: the smallest group name wins, standing
        # in for the reference's single bio_ontology type per agent
        .groupBy(F.col("stmt_mk_hash").alias("mk_hash"), "ag_num")
        .agg(F.min("grp").alias("grp"))
    )
    per_stmt = (
        grounded.join(
            pa_statements.select("mk_hash", "type"), "mk_hash"
        )
        .groupBy("mk_hash", "type")
        .agg(F.array_sort(F.collect_list(F.struct("ag_num", "grp"))).alias("ags"))
        .select(
            "type",
            F.transform("ags", lambda s: s["grp"]).alias("groups"),
        )
        .filter(F.size("groups") >= 2)
    )
    multi = per_stmt.filter(
        (F.col("type") == "Complex") | (F.size("groups") > 2)
    )
    two = per_stmt.filter(
        (F.col("type") != "Complex") & (F.size("groups") == 2)
    ).select(
        F.element_at("groups", 1).alias("source"),
        F.element_at("groups", 2).alias("target"),
    )
    uniq = multi.select(
        F.array_sort(F.array_distinct("groups")).alias("u"), "groups"
    )
    cross = uniq.select(
        F.explode(
            F.flatten(
                F.transform(
                    "u",
                    lambda a: F.filter(
                        F.transform(
                            F.col("u"),
                            lambda b: F.struct(a.alias("source"), b.alias("target")),
                        ),
                        lambda p: p["source"] != p["target"],
                    ),
                )
            )
        ).alias("p")
    ).select("p.source", "p.target")
    self_pairs = uniq.select(
        F.explode(
            F.filter(
                F.col("u"),
                lambda g: F.size(F.filter(F.col("groups"), lambda x: x == g)) >= 2,
            )
        ).alias("source")
    ).select("source", F.col("source").alias("target"))
    return (
        two.unionByName(cross)
        .unionByName(self_pairs)
        .groupBy("source", "target")
        .agg(F.count(F.lit(1)).alias("value"))
        .orderBy(F.desc("value"), F.asc("source"), F.asc("target"))
    )


def generate_db_stats(
    principal: dict[str, DataFrame], readonly: dict[str, DataFrame]
) -> dict:
    """The ``/summary/data/stats`` payload (generate_db_stats,
    visualization.py:554-587): text-content type counts + unique-statement
    grounding stats + total evidence + grounding percentages."""
    stats: dict = {
        r.text_type: int(r["count"])
        for r in text_content_stats(principal["text_content"]).collect()
    }
    stats.update(
        unique_stmt_stats(principal["pa_statements"], principal["pa_agents"])
    )
    stats["total_evidence"] = readonly["fast_raw_pa_link"].count()
    denom = (
        stats["grounding_full"]
        + stats["grounding_partial"]
        + stats["grounding_ungrounded"]
    ) or 1
    for k in ("full", "partial", "ungrounded"):
        stats[f"grounding_{k}_pct"] = stats[f"grounding_{k}"] / denom * 100
    return stats
