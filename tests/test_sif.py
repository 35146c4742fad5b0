"""SIF export tests against a Python recompute from the fixture model."""

from __future__ import annotations

from collections import Counter

import pytest

from indra_db_spark.assembly.sif import NS_PRIORITY, sif_edges, sif_pairs
from indra_db_spark.plans.fixtures import fixture_lake


@pytest.fixture(scope="module")
def lake_model(spark):
    return fixture_lake(spark)


def _best_grounding(agent: dict) -> tuple[str, str]:
    ns = min(agent, key=lambda n: NS_PRIORITY.index(n))
    return ns, agent[ns]


def _expected_pairs(stmts):
    out = []
    for s in stmts:
        groundings = [_best_grounding(a) + (a["NAME"],) for a in s.agents]
        if s.stmt_type == "Complex" and len(s.agents) <= 3:
            idx_pairs = [
                (i, j)
                for i in range(len(s.agents))
                for j in range(len(s.agents))
                if i != j
            ]
        elif len(s.agents) == 2:
            idx_pairs = [(0, 1)]
        else:
            continue
        for i, j in idx_pairs:
            out.append(
                (*groundings[i], *groundings[j], s.stmt_type, s.ev_count,
                 s.mk_hash)
            )
    return Counter(out)


def test_sif_pairs_match_model(lake_model):
    lake, stmts, _ = lake_model
    got = Counter(
        (r.agA_ns, r.agA_id, r.agA_name, r.agB_ns, r.agB_id, r.agB_name,
         r.stmt_type, r.evidence_count, r.stmt_hash)
        for r in sif_pairs(lake).collect()
    )
    assert got == _expected_pairs(stmts)


def test_sif_edges_aggregate(lake_model):
    lake, stmts, _ = lake_model
    pairs = sif_pairs(lake)
    edges = {
        (r.agA_ns, r.agA_id, r.agB_ns, r.agB_id, r.stmt_type): (
            r.evidence_count,
            sorted(r.stmt_hashes),
        )
        for r in sif_edges(pairs).collect()
    }
    want: dict = {}
    for (ans, aid, _an, bns, bid, _bn, t, ev, h), n in _expected_pairs(
        stmts
    ).items():
        assert n == 1
        key = (ans, aid, bns, bid, t)
        ev_sum, hashes = want.get(key, (0, []))
        want[key] = (ev_sum + ev, sorted(hashes + [h]))
    assert edges == want
