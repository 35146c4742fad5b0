"""Set-behavior oracle for the query algebra — the rebuild of the
reference's crown-jewel test (indra_db/tests/test_query.py:394-568,
SURVEY.md §5): every leaf query's Spark result is compared against plain
Python set logic over the fixture rows; inversions against universe-minus;
pairs and triples against set algebra on the individual results."""

from __future__ import annotations

import pytest

from indra_db_spark.plans import (
    EmptyQuery,
    FromAgentJson,
    FromMeshIds,
    FromPapers,
    HasAgent,
    HasDatabases,
    HasEvidenceBound,
    HasHash,
    HasNumAgents,
    HasNumEvidence,
    HasOnlySource,
    HasReadings,
    HasSources,
    HasType,
    Query,
)
from indra_db_spark.plans.fixtures import build_tables, generate_model
from indra_db_spark.schemas import ROLE_NUMS, expand_types


@pytest.fixture(scope="module")
def fx(spark):
    from indra_db_spark.plans.lake import ReadonlyLake

    stmts, papers = generate_model(seed=42)
    tables = build_tables(stmts, papers)
    lake = ReadonlyLake.from_rows(spark, tables)
    return lake, stmts, tables


def run(q, lake) -> set[int]:
    return {r.mk_hash for r in q.hashes(lake).select("mk_hash").collect()}


# ------------------------------------------------ python-side expectations


def _agent_set(tables, agent_id, namespace="NAME", role=None, agent_num=None):
    if namespace in ("NAME", "AUTO"):
        rows = tables["name_meta"]
    elif namespace == "TEXT":
        rows = tables["text_meta"]
    else:
        rows = [r for r in tables["other_meta"] if r["db_name"] == namespace]
    out = set()
    for r in rows:
        if r["db_id"] != agent_id:
            continue
        if role is not None and r["role_num"] != ROLE_NUMS[role]:
            continue
        if agent_num is not None and r["ag_num"] != agent_num:
            continue
        out.add(r["mk_hash"])
    return out


def _cases(stmts, tables):
    """(query, expected_hash_set) pairs covering every leaf class."""
    hashes = sorted(s.mk_hash for s in stmts)
    trid_by_pmid = {"70003": 103}
    return [
        (HasAgent("ERK"), _agent_set(tables, "ERK")),
        (
            HasAgent("ERK", role="SUBJECT"),
            _agent_set(tables, "ERK", role="SUBJECT"),
        ),
        (
            HasAgent("TP53", agent_num=1),
            _agent_set(tables, "TP53", agent_num=1),
        ),
        (HasAgent("MAPK", namespace="TEXT"), _agent_set(tables, "MAPK", "TEXT")),
        (
            HasAgent("11998", namespace="HGNC"),
            _agent_set(tables, "11998", "HGNC"),
        ),
        (
            HasAgent("CHEBI:63637", namespace="CHEBI"),
            _agent_set(tables, "CHEBI:63637", "CHEBI"),
        ),
        (HasAgent("%EK", namespace="FPLX"), _agent_set(tables, "MEK", "FPLX")),
        (
            HasType(["Phosphorylation"]),
            {s.mk_hash for s in stmts if s.stmt_type == "Phosphorylation"},
        ),
        (
            HasType(["Modification", "Complex"], include_subclasses=True),
            {
                s.mk_hash
                for s in stmts
                if s.stmt_type in expand_types(["Modification", "Complex"], True)
            },
        ),
        (HasNumAgents([2]), {s.mk_hash for s in stmts if s.agent_count == 2}),
        (
            HasNumEvidence(list(range(40, 200))),
            {s.mk_hash for s in stmts if 40 <= s.ev_count < 200},
        ),
        (
            HasEvidenceBound(["< 50", ">= 10"]),
            {s.mk_hash for s in stmts if 10 <= s.ev_count < 50},
        ),
        (HasHash(hashes[:7]), set(hashes[:7])),
        (
            HasSources(["reach", "pc"]),
            {s.mk_hash for s in stmts if {"reach", "pc"} <= set(s.src_counts)},
        ),
        (
            HasOnlySource("medscan"),
            {s.mk_hash for s in stmts if s.only_src == "medscan"},
        ),
        (HasReadings(), {s.mk_hash for s in stmts if s.has_rd}),
        (HasDatabases(), {s.mk_hash for s in stmts if s.has_db}),
        (
            FromMeshIds(["D000225", "C0001243"]),
            {
                s.mk_hash
                for s in stmts
                if "D000225" in s.mesh_terms or "C0001243" in s.mesh_concepts
            },
        ),
        (
            FromPapers([("pmid", "70003")]),
            {
                s.mk_hash
                for s in stmts
                if any(e.trid == trid_by_pmid["70003"] for e in s.evidences)
            },
        ),
        (
            FromAgentJson({"0": "ERK", "1": "TP53"}, stmt_type="Activation"),
            {
                s.mk_hash
                for s in stmts
                if s.stmt_type == "Activation"
                and [a["NAME"] for a in s.agents] == ["ERK", "TP53"]
            },
        ),
    ]


def test_leaves_and_inversions(fx):
    lake, stmts, tables = fx
    universe = {s.mk_hash for s in stmts}
    for q, expected in _cases(stmts, tables):
        got = run(q, lake)
        assert got == expected, f"{q}: {len(got)} vs expected {len(expected)}"
        inv = run(~q, lake)
        assert inv == universe - expected, f"~{q}"


def test_pairs_match_set_algebra(fx):
    lake, stmts, tables = fx
    cases = _cases(stmts, tables)
    # deterministic striding over the case list keeps runtime bounded while
    # mixing leaf classes (incl. intrusive × non-intrusive combinations)
    picks = [
        (0, 7), (1, 8), (3, 9), (4, 13), (5, 10), (7, 14), (8, 15),
        (9, 17), (10, 18), (12, 7), (13, 16), (17, 19),
    ]
    for i, j in picks:
        (q1, e1), (q2, e2) = cases[i], cases[j]
        assert run(q1 & q2, lake) == e1 & e2, f"{q1} & {q2}"
        assert run(q1 | q2, lake) == e1 | e2, f"{q1} | {q2}"


def test_mixed_polarity_and_triples(fx):
    lake, stmts, tables = fx
    universe = {s.mk_hash for s in stmts}
    cases = _cases(stmts, tables)
    picks = [(0, 7, 13), (1, 9, 17), (8, 10, 18)]
    for i, j, k in picks:
        (q1, e1), (q2, e2), (q3, e3) = cases[i], cases[j], cases[k]
        assert run(q1 & ~q2, lake) == e1 - e2, f"{q1} - {q2}"
        assert run((q1 & q2) | q3, lake) == (e1 & e2) | e3
        assert run(~(q1 | q2), lake) == universe - (e1 | e2)
        assert run((q1 | q2) & ~q3, lake) == (e1 | e2) - e3


def test_json_round_trip(fx):
    _, stmts, tables = fx
    for q, _ in _cases(stmts, tables):
        assert Query.from_json(q.to_json()) == q
        assert Query.from_json((~q).to_json()) == ~q
    combined = (_cases(stmts, tables)[0][0] & _cases(stmts, tables)[7][0]) | ~_cases(
        stmts, tables
    )[13][0]
    assert Query.from_json(combined.to_json()) == combined


def test_constructor_normalization():
    q = HasAgent("ERK")
    t = HasType(["Phosphorylation"])
    # neutral element
    assert (EmptyQuery() & q) == q
    assert (EmptyQuery() | q) == q
    # contradiction / tautology
    assert (q & ~q).is_empty()
    assert (q | ~q).is_full()
    # same-class list merging (∩ under AND, ∪ under OR)
    assert (HasHash([1, 2, 3]) & HasHash([2, 3, 4])) == HasHash([2, 3])
    assert (HasHash([1]) | HasHash([2])) == HasHash([1, 2])
    assert (HasHash([1]) & HasHash([2])).is_empty()
    # inverted-polarity merge: ¬A ∧ ¬B ≡ ¬(A ∪ B)
    assert (~HasHash([1]) & ~HasHash([2])) == ~HasHash([1, 2])
    # De Morgan on merges
    assert ~(q & t) == (~q | ~t)
    # empty annihilation / full identity
    assert (HasHash([]) & q).is_empty()
    assert (HasHash([], inverted=True) & q) == q
    # flattening is order-insensitive
    assert ((q & t) & HasReadings()) == (q & (t & HasReadings()))


def test_fixture_invariants(fx):
    _, stmts, tables = fx
    universe = {s.mk_hash for s in stmts}
    # 1. every hash in every meta table appears in source_meta
    for name in ("name_meta", "text_meta", "other_meta", "mesh_term_meta"):
        assert {r["mk_hash"] for r in tables[name]} <= universe
    # 2. ev_count == sum(src_json)
    for r in tables["source_meta"]:
        assert r["ev_count"] == sum(r["src_json"].values())
    # 5. complex dups flagged
    dup_rows = [r for r in tables["agent_interactions"] if r["is_complex_dup"]]
    assert dup_rows and all(
        len(r["agent_json"]) == 2 for r in dup_rows
    )


def test_from_papers_doi_namespace_pair(fx):
    """DOI matching uses the (namespace, group-id) pair — a colliding
    group id in another namespace must not match (mixins.py:431-446)."""
    lake, stmts, tables = fx
    ref = tables["reading_ref_link"][0]
    doi = f"10.{ref['doi_ns']}/{ref['doi_id']}"
    hit = run(FromPapers([("doi", doi)]), lake)
    assert hit
    wrong_ns = f"10.{ref['doi_ns'] + 1}/{ref['doi_id']}"
    assert run(FromPapers([("doi", wrong_ns)]), lake) == set()


def test_fuzz_random_trees(fx):
    """Seeded random query trees (depth <= 3, mixed &/|/~) against Python
    set algebra — the randomized generalization of the pair/triple cases
    (reference runs the same style of oracle loop, test_query.py:394-568)."""
    import random

    lake, stmts, tables = fx
    universe = {s.mk_hash for s in stmts}
    cases = _cases(stmts, tables)
    rng = random.Random(20260813)

    def build(depth: int):
        if depth == 0 or rng.random() < 0.3:
            q, e = cases[rng.randrange(len(cases))]
            return q, e
        op = rng.choice(["and", "or", "not"])
        if op == "not":
            q, e = build(depth - 1)
            return ~q, universe - e
        q1, e1 = build(depth - 1)
        q2, e2 = build(depth - 1)
        if op == "and":
            return q1 & q2, e1 & e2
        return q1 | q2, e1 | e2

    for trial in range(20):
        q, expected = build(3)
        got = run(q, lake)
        assert got == expected, f"trial {trial}: {q}"


def test_like_prefix_box_superset_property():
    """Soundness of the prefix-LIKE range (round 12): the box must
    contain EVERY string the pattern can match — the prune may only ever
    see a superset (the exact LIKE re-applies on top)."""
    from indra_db_spark.plans.queries import _like_prefix_box

    assert _like_prefix_box("%EK") is None          # no literal prefix
    assert _like_prefix_box("_EK") is None
    assert _like_prefix_box("ME%") == ("ME", "MF")
    assert _like_prefix_box("ME_K%") == ("ME", "MF")
    assert _like_prefix_box("Z%") == ("Z", "[")
    assert _like_prefix_box(chr(0x10FFFF) * 2 + "%") is None
    # carry past a maxed trailing code point: increment an earlier one
    lo, hi = _like_prefix_box("A" + chr(0x10FFFF) + "%")
    assert lo == "A" + chr(0x10FFFF) and hi == "B"
    # sampled matches always fall inside the box
    for suffix in ("", "K", "K1", "zzz", chr(0x10FFFF)):
        v = "ME" + suffix
        lo, hi = _like_prefix_box("ME%")
        assert lo <= v <= hi


def test_intersection_prune_hints_intersect_same_column_lists():
    """r12 ADVICE: two non-inverted point-list leaves on the SAME column
    inside one conjunction must drive pruning with the INTERSECTION of
    their lists (setdefault kept only the first — sound but loose).  An
    empty intersection is a proof of emptiness the scan path honors."""
    from indra_db_spark.plans.queries import (
        HasHash,
        HasNumEvidence,
        Intersection,
    )

    # construct directly: build_intersection folds same-class leaves,
    # but JSON round-trips / hand-built plans can carry both
    conj = Intersection([HasNumEvidence([1, 2, 3]), HasNumEvidence([2, 3, 9])])
    eq_hints, _ = conj._prune_hints()
    assert eq_hints["ev_count"] == [2, 3]

    conj2 = Intersection([HasHash([10, 11]), HasHash([12])])
    eq_hints2, _ = conj2._prune_hints()
    assert eq_hints2["mk_hash"] == []  # provably empty — no scan needed


def test_intersection_empty_hint_yields_empty_without_scan(spark):
    """The empty-intersection case must produce the correct EMPTY result
    (never reach skip_read, whose empty-eq-list guard raises)."""
    from indra_db_spark.plans.fixtures import fixture_lake
    from indra_db_spark.plans.queries import HasHash, Intersection
    from indra_db_spark.plans.shaping import get_hashes

    lake, _, _ = fixture_lake(spark)
    conj = Intersection([HasHash([1]), HasHash([2])])
    assert get_hashes(conj, lake).count() == 0


def test_like_prefix_box_escaped_wildcards_take_plain_path():
    """r12 ADVICE (high): LIKE treats ``\\%``/``\\_`` as LITERALS, so
    r'AMPK\\_alpha%' matches 'AMPK_alpha…' — which does NOT start with
    'AMPK\\'.  Deriving a box from the raw split would EXCLUDE every
    real match (a wrong prune, not a loose one); any backslash-carrying
    pattern must return None."""
    from indra_db_spark.plans.queries import _like_prefix_box

    assert _like_prefix_box(r"AMPK\_alpha%") is None
    assert _like_prefix_box(r"100\%_pure%") is None
    assert _like_prefix_box("A\\B%") is None  # even a plain literal \\


def test_like_prefix_box_never_emits_lone_surrogate():
    """r12 ADVICE (low): incrementing a prefix ending in U+D7FF must not
    yield chr(0xD800) — a lone surrogate py4j cannot UTF-8-encode (the
    residual box filter would raise at query time).  The bound skips the
    surrogate block to U+E000; no valid UTF-8 string sorts in between,
    so the box stays a superset."""
    from indra_db_spark.plans.queries import _like_prefix_box

    lo, hi = _like_prefix_box("X" + chr(0xD7FF) + "%")
    assert lo == "X" + chr(0xD7FF) and hi == "X" + chr(0xE000)
    hi.encode("utf-8")  # must be encodable — the actual failure mode
    # superset property holds across the skipped block
    for suffix in ("", "a", chr(0x10FFFF)):
        assert lo <= lo + suffix < hi
