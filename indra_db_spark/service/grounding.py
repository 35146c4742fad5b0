"""Corpus-derived AUTO-namespace grounding.

The reference grounds free text through gilda (client/readonly/query.py:
gilda_ground; HasAgent's AUTO branch at query.py:1586-1612 and the
``/ground`` route, indra_db_service/api.py:199-206).  gilda itself is an
external model; this module provides a concrete, dependency-free grounder
with the same API shape, derived from the readonly lake itself:

every agent occurrence carries both its NAME/TEXT surface forms
(name_meta / text_meta) and its database groundings (other_meta) under the
same (mk_hash, ag_num) key, so a distributed join + count yields a
frequency-ranked surface-form -> (db_name, db_id) index — the corpus's own
disambiguation prior.  The index build is one Spark job (aggregate down to
distinct surface forms BEFORE the driver collect); lookups are driver-side
dict hits, like gilda's in-memory grounder.

Install either way:

    grounder = LakeNameGrounder.from_lake(lake)
    HasAgent.grounding_service = grounder.as_seam()   # AUTO queries
    serve(lake, grounder=grounder)                    # /ground route
"""

from __future__ import annotations

from pyspark.sql import functions as F

#: qualifier words dropped one at a time when the full surface form misses
#: (gilda reaches similar forms via its term expansions)
_STOP_SUFFIXES = ("kinase", "protein", "gene", "receptor", "enzyme")


def _normalize(text: str) -> str:
    return " ".join(text.lower().split())


class LakeNameGrounder:
    """Frequency-ranked surface-form index: text -> gilda-shaped matches
    ``[{"term": {"db": ..., "id": ..., "entry_name": ...}, "score": ...}]``
    with score = this grounding's share of the surface form's corpus
    occurrences (ties broken by (db, id) for determinism)."""

    def __init__(
        self,
        index: dict[str, list[dict]],
        totals: dict[str, int] | None = None,
    ):
        self._index = index
        #: per-surface corpus occurrence totals — the autocomplete rank
        self._totals = totals or {}
        #: sorted key list for prefix (autocomplete) scans via bisect
        self._sorted = sorted(index)

    @classmethod
    def from_lake(
        cls, lake, max_matches_per_term: int = 5, max_terms: int = 2_000_000
    ) -> "LakeNameGrounder":
        """One aggregation job over the meta tables.  Scale shape: the
        surface×grounding pair space aggregates distributively (partial
        counts absorb the Zipf head); only the ranked distinct index — at
        most ``max_terms × max_matches_per_term`` small rows — reaches the
        driver, mirroring how a production deployment would snapshot the
        index to a broadcast file."""
        from pyspark.sql import Window

        surfaces = None
        for table in ("name_meta", "text_meta"):
            part = lake[table].select(
                "mk_hash",
                "ag_num",
                F.lower(F.trim(F.col("db_id"))).alias("surface"),
                F.col("db_id").alias("entry_name"),
            )
            surfaces = part if surfaces is None else surfaces.unionByName(part)
        grounded = lake["other_meta"].select(
            "mk_hash", "ag_num", "db_name", F.col("db_id").alias("gid")
        )
        counts = (
            surfaces.join(grounded, ["mk_hash", "ag_num"])
            .groupBy("surface", "db_name", "gid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.any_value("entry_name").alias("entry_name"),
            )
        )
        w = Window.partitionBy("surface").orderBy(
            F.desc("n"), F.asc("db_name"), F.asc("gid")
        )
        total = Window.partitionBy("surface")
        ranked = (
            counts.withColumn("rn", F.row_number().over(w))
            .withColumn("share", F.col("n") / F.sum("n").over(total))
            .withColumn("total_n", F.sum("n").over(total))
            .filter(F.col("rn") <= max_matches_per_term)
            .select(
                "surface", "db_name", "gid", "entry_name", "share", "rn",
                "total_n",
            )
            .limit(max_terms * max_matches_per_term)
        )
        index: dict[str, list[dict]] = {}
        totals: dict[str, int] = {}
        for r in ranked.collect():
            index.setdefault(r.surface, []).append(
                {
                    "term": {
                        "db": r.db_name,
                        "id": r.gid,
                        "entry_name": r.entry_name,
                    },
                    "score": round(float(r.share), 6),
                }
            )
            totals[r.surface] = int(r.total_n)
        for matches in index.values():
            matches.sort(key=lambda m: (-m["score"], m["term"]["db"], m["term"]["id"]))
        return cls(index, totals)

    def __call__(self, text: str) -> list[dict]:
        key = _normalize(text)
        hit = self._index.get(key)
        if hit:
            return hit
        # drop one trailing qualifier word ("mek kinase" -> "mek"), the
        # lightweight analog of gilda's term expansion
        words = key.split()
        if len(words) > 1 and words[-1] in _STOP_SUFFIXES:
            return self._index.get(" ".join(words[:-1]), [])
        return []

    def suggest(self, prefix: str, limit: int = 10) -> list[dict]:
        """Agent-name autocomplete: surface forms starting with ``prefix``,
        ranked by corpus occurrence count (the same frequency prior the
        grounding uses) → ``[{"name", "n", "top": <top match term>}]``.

        The backing store is the already-built in-memory index, so a
        suggestion is a bisect prefix scan over the sorted key list —
        O(log terms + hits), the latency shape an interactive search box
        needs (the reference's search page resolves agent text through
        the same grounding service this index stands in for)."""
        from bisect import bisect_left

        key = _normalize(prefix)
        if not key:
            return []
        start = bisect_left(self._sorted, key)
        hits = []
        for surface in self._sorted[start:]:
            if not surface.startswith(key):
                break
            hits.append(surface)
        hits.sort(key=lambda s: (-self._totals.get(s, 0), s))
        return [
            {
                "name": s,
                "n": self._totals.get(s, 0),
                "top": self._index[s][0]["term"],
            }
            for s in hits[:limit]
        ]

    def as_seam(self):
        """Adapter for ``HasAgent.grounding_service``: text -> (ns, id) of
        the top match, or None (query then falls back to a NAME match)."""

        def seam(text: str):
            matches = self(text)
            if not matches:
                return None
            term = matches[0]["term"]
            return term["db"], term["id"]

        return seam
