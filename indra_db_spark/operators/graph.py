"""Iterative graph operators: transitive closure and ancestor aggregation.

The reference computes a refinement graph (specific→general statement pairs)
and scores belief from each statement's evidence plus all *ancestors'*
evidence (reference: indra_db/readonly_dumping/export_assembly.py:613-735,
driver-side networkx).  networkx on the driver dies at 100M+ edges; the
Spark-native form is semi-naive iterative joins: each round extends known
paths by one hop and unions in only the *new* pairs, converging in
O(graph depth) rounds.  Each round is a distributed shuffle join — no
driver-side graph state; the driver only runs the (depth-bounded) loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: below this many distinct edges the closure is computed driver-side —
#: the graph analog of the broadcast-join threshold.  The reference ALWAYS
#: runs driver-side (networkx, export_assembly.py:859-877); here it is a
#: size-gated fast path with a distributed fallback.  The value is
#: MEASURED, not guessed: the r5 scale probe put the driver-vs-distributed
#: crossover between 20k edges (driver 4× faster) and 200k edges (driver
#: 1.4× slower) on a binary tree, so the gate sits at the geometric middle
#: — see SCALE_PROBE.json closure_auto/closure_dist and SCALING.md.
DRIVER_MAX_EDGES = 100_000


def _ckpt_level(big: bool):
    """Checkpoint storage for the iterative loops, size-gated like the
    execution strategy itself: small graphs keep the fast deserialized
    blocks; past the driver-gate edge count the retained per-round deltas
    are stored SERIALIZED (PySpark's MEMORY_AND_DISK) — deserialized row
    objects OOM an 8g heap near ~40M closure pairs where the serialized
    form spills gracefully (found by the 100x scale probe)."""
    from pyspark.storagelevel import StorageLevel

    return StorageLevel.MEMORY_AND_DISK if big else StorageLevel.MEMORY_AND_DISK_DESER


#: serialized-checkpoint byte gate for the iterative loops: if the FIRST
#: checkpointed piece (the edge set) caches more than this many bytes, the
#: retained per-round deltas are stored serialized.  ~10 bytes/pair
#: serialized (measured: 20k long-pairs → 192 KB), so 1 MiB ≈ the
#: 100k-edge DRIVER_MAX_EDGES gate expressed in the unit that actually
#: OOMs (the r5 scale probe found deserialized blocks dying near ~40M
#: retained closure pairs on an 8g heap).
CKPT_SER_BYTES = 1 << 20

#: same gate in Catalyst-ESTIMATE units: plan statistics report ~2.5
#: bytes/row for a parquet-derived long-pair frame (vs ~10 serialized), so
#: 256 KiB estimated ≈ 100k edges — the measured ser/deser crossover
#: (deser wins at 20k edges: 2.07 vs 2.27 s; ser already wins at 200k:
#: 9.9 vs 11.5 s on the x10 probe)
CKPT_SER_EST_BYTES = 256 << 10


def _sized_ckpt(project):
    """Checkpoint callback whose storage level is sized off the FIRST
    checkpointed frame's own cached footprint instead of a separate
    bounded scan job: the first piece (the edge set — always materialized
    anyway) gets its level from Catalyst's free driver-side size ESTIMATE
    (small estimate → deserialized, large or stat-less or unavailable →
    serialized, the safe side; stat-less plans report huge sizeInBytes so
    they clamp serialized by construction), and its block-manager byte
    total — a driver-side metadata read (``getRDDStorageInfo``), no job
    at all — picks the level for every later round's delta.  The residual
    risk is a stats UNDER-estimate landing a genuinely large first frame
    deserialized; the measured-bytes gate corrects every subsequent
    round, and the 8× deserialized-inflation factor keeps that gate
    honest about how the first piece was actually stored.  Replaces the r5 pre-count (`limit(N+1).count()`),
    a full extra scan per execution that cost the forced-distributed
    closure ~10% at sf0.1 (the BENCH r4→r5 regression), and even beats a
    count over the cached blocks (0.14 s/job on local[32] scheduling vs
    9 ms for the metadata call).

    ``project`` re-projects the frame before checkpointing (a fresh
    Project gives the checkpoint a clean attribute set; checkpointing a
    bare Union of prior checkpoints trips Spark's constraint-rewrite on
    reused expression ids).
    """
    from pyspark.storagelevel import StorageLevel

    holder: dict = {"level": None}

    def _ckpt(df: DataFrame) -> DataFrame:
        first = holder["level"] is None
        if first:
            # the first piece's own level comes from Catalyst's free
            # driver-side size estimate (CKPT_SER_EST_BYTES ≈ the 100k-edge
            # crossover in estimate units); stat-less plans report huge
            # sizeInBytes and land serialized, the safe side.  Keeping the
            # first piece deserialized on small graphs matters: it is
            # re-read every round and paying per-access deserialization
            # cost it ~7% at sf0.1.
            try:
                est = int(
                    df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                )
            except Exception:
                est = CKPT_SER_EST_BYTES + 1
            lvl = _ckpt_level(est > CKPT_SER_EST_BYTES)
            try:
                jsc = df.sparkSession.sparkContext._jsc.sc()
                before = {r.id() for r in jsc.getRDDStorageInfo()}
            except Exception:
                jsc = None
        else:
            lvl = holder["level"]
        out = project(df).localCheckpoint(eager=True, storageLevel=lvl)
        if first:
            if jsc is not None:
                new_bytes = sum(
                    r.memSize() + r.diskSize()
                    for r in jsc.getRDDStorageInfo()
                    if r.id() not in before
                )
                # deserialized blocks inflate ~8.7× over serialized
                # (measured: 20k long-pairs → 1.67 MB deser vs 192 KB
                # ser), so the measured gate scales with how the first
                # piece was actually stored
                gate = CKPT_SER_BYTES * (8 if lvl.deserialized else 1)
                big = new_bytes > gate
            else:  # metadata API unavailable: one cheap cached-block count
                big = out.count() > DRIVER_MAX_EDGES
            holder["level"] = _ckpt_level(big)
        return out

    return _ckpt


def _driver_closure(rows) -> list | None:
    """Memoized reverse-topological closure on the driver; returns None on a
    cycle (caller falls back to the distributed loop — the reference instead
    aborts the build, export_assembly.py:859-877 cycle check)."""
    from collections import defaultdict, deque

    parents = defaultdict(list)
    out_deg: dict = {}
    dependents = defaultdict(list)  # parent -> children waiting on it
    nodes = set()
    for child, anc in rows:
        parents[child].append(anc)
        nodes.add(child)
        nodes.add(anc)
    for n in nodes:
        out_deg[n] = len(parents.get(n, ()))
        for p in parents.get(n, ()):
            dependents[p].append(n)

    anc_sets: dict = {}
    ready = deque(n for n, d in out_deg.items() if d == 0)
    done = 0
    while ready:
        n = ready.popleft()
        done += 1
        s = set()
        for p in parents.get(n, ()):
            s.add(p)
            s.update(anc_sets[p])
        anc_sets[n] = s
        for c in dependents.get(n, ()):
            out_deg[c] -= 1
            if out_deg[c] == 0:
                ready.append(c)
    if done != len(nodes):  # cycle
        return None
    return [(c, a) for c, s in anc_sets.items() for a in s]


def transitive_closure(
    edges: DataFrame,
    child_col: str = "child",
    parent_col: str = "parent",
    max_iterations: int = 30,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> DataFrame:
    """All (child, anc) pairs where anc is reachable via parent edges.

    Semi-naive evaluation with *path doubling*: the frontier (paths found
    last round, length in (2^(k-1), 2^k]) joins the full closure (length
    <= 2^k), so reachable path length doubles per round and a depth-d graph
    converges in ceil(log2 d)+1 rounds instead of d — at 100 TB the round
    count, not per-round size, dominates wall-clock (each round is a full
    shuffle barrier).  ``localCheckpoint`` truncates lineage each round
    (iterative plans otherwise grow exponentially and overwhelm Catalyst).
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col(child_col).alias("child"), F.col(parent_col).alias("anc")
    ).distinct()

    # size-gated driver fast path: one early-stopping Arrow collect decides;
    # small graphs skip the iterative shuffle rounds entirely.  The probe
    # skips distinct (a full shuffle) — the driver algorithm dedups sets
    # anyway — and moves data both ways as Arrow batches, not pickled Rows.
    raw = edges.select(
        F.col(child_col).alias("child"), F.col(parent_col).alias("anc")
    )
    if driver_max_edges > 0:
        probe = raw.limit(driver_max_edges + 1).toPandas()
        if len(probe) <= driver_max_edges:
            pairs = _driver_closure(
                zip(probe["child"].tolist(), probe["anc"].tolist())
            )
            if pairs is not None:
                import pandas as pd

                pdf = pd.DataFrame(pairs, columns=["child", "anc"])
                return spark.createDataFrame(pdf, e.schema)

    # distributed path (probe exceeded, cycle fallback, or forced): the
    # checkpoint storage level is sized off the first checkpointed piece's
    # cached count — no separate pre-count scan job (see _sized_ckpt)
    _ckpt = _sized_ckpt(lambda df: df.select("child", "anc"))

    # Spark's constraint rewrite chokes on iterative plans over checkpointed
    # RDDs (NoSuchElementException on reused expr ids); constraints buy
    # nothing for this loop, so scope them off.
    conf_key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        return _closure_loop(e, "child", "anc", max_iterations, _ckpt)
    finally:
        spark.conf.set(conf_key, prev)


def _closure_loop(edges, child_col, parent_col, max_iterations, _ckpt) -> DataFrame:
    def _union(dfs):
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    e = edges.select(
        F.col(child_col).alias("child"), F.col(parent_col).alias("anc")
    ).distinct()
    # closure = lazy union of materialized frontier pieces: avoids
    # re-checkpointing (copying) the whole closure every round — only the
    # per-round delta is ever materialized
    pieces = [_ckpt(e)]
    frontier = pieces[0]
    for _ in range(max_iterations):
        closure = _union(pieces)
        # double the reachable path length: frontier ∘ closure
        step = (
            frontier.alias("f")
            .join(closure.alias("c"), F.col("f.anc") == F.col("c.child"))
            .select(F.col("f.child").alias("child"), F.col("c.anc").alias("anc"))
            .distinct()
        )
        new = _ckpt(step.join(closure, ["child", "anc"], "left_anti"))
        if new.isEmpty():
            break
        pieces.append(new)
        frontier = new
    return _union(pieces)


def ancestor_aggregate(
    nodes: DataFrame,
    edges: DataFrame,
    value_col: str,
    node_col: str = "id",
    child_col: str = "child",
    parent_col: str = "parent",
    out_col: str = "agg_value",
) -> DataFrame:
    """Per node: value + sum of all ancestors' values (the belief-score
    input shape: own evidence + refinement-ancestor evidence).

    closure ⋈ nodes on the ancestor side, grouped by child, then a left
    join back so root nodes (no ancestors) keep their own value.
    """
    closure = transitive_closure(edges, child_col, parent_col)
    anc_vals = (
        closure.join(
            nodes.select(
                F.col(node_col).alias("anc"), F.col(value_col).alias("_v")
            ),
            "anc",
        )
        .groupBy("child")
        .agg(F.sum("_v").alias("_anc_sum"))
    )
    return (
        nodes.join(
            anc_vals.withColumnRenamed("child", node_col), node_col, "left"
        )
        .withColumn(
            out_col, F.col(value_col) + F.coalesce(F.col("_anc_sum"), F.lit(0))
        )
        .drop("_anc_sum")
    )


def _driver_components(pairs) -> list:
    """Union-find on the driver (size-gated fast path)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(n, find(n)) for n in parent]


def connected_components(
    edges: DataFrame,
    left_col: str = "a",
    right_col: str = "b",
    max_iterations: int = 30,
    driver_max_edges: int = DRIVER_MAX_EDGES,
) -> DataFrame:
    """(node, component) labeling of the undirected graph; the component id
    is the smallest node id it contains.

    The reference's legacy belief variant partitions statements by
    connected components driver-side (indra_db/belief.py:167-197).  Same
    strategy split as transitive_closure: union-find on the driver below
    the edge threshold, distributed min-label propagation above it
    (label(n) <- min(label(n), min over neighbors) per round; rounds =
    graph diameter, each one shuffle).
    """
    spark = edges.sparkSession
    raw = edges.select(
        F.col(left_col).alias("a"), F.col(right_col).alias("b")
    )
    if driver_max_edges > 0:
        probe = raw.limit(driver_max_edges + 1).toPandas()
        if len(probe) <= driver_max_edges:
            import pandas as pd

            out = _driver_components(
                zip(probe["a"].tolist(), probe["b"].tolist())
            )
            t = raw.schema["a"].dataType.simpleString()
            return spark.createDataFrame(
                pd.DataFrame(out, columns=["node", "component"]),
                f"node {t}, component {t}",
            )

    # distributed path: first checkpoint (the symmetrized edge set, the
    # largest frame in the loop) sizes the level for the label rounds
    _ckpt = _sized_ckpt(lambda df: df)

    conf_key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        sym = raw.unionByName(
            raw.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct()
        sym = _ckpt(sym)
        labels = _ckpt(
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )
        converged = False
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(
                    labels.withColumnRenamed("node", "b"), "b"
                )
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("component").alias("_nbr"))
            )
            stepped = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.least(
                    "component", F.coalesce("_nbr", "component")
                ).alias("component"),
            )
            # pointer jumping: also adopt the label OF the current label, so
            # label distance doubles per round (log-diameter convergence,
            # not one hop per round)
            jump = labels.select(
                F.col("node").alias("component"),
                F.col("component").alias("_jmp"),
            )
            new = _ckpt(
                stepped.join(jump, "component", "left").select(
                    "node",
                    F.least(
                        "component", F.coalesce("_jmp", "component")
                    ).alias("component"),
                )
            )
            unchanged = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") != F.col("o.component"))
                .isEmpty()
            )
            labels = new
            if unchanged:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} "
                "rounds; raise max_iterations"
            )
        return labels
    finally:
        spark.conf.set(conf_key, prev)


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping_milli: int = 850,
    total: int = 1_000_000_000_000,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point integer PageRank → (id, pr): ``iterations`` rounds of
    power iteration with damping ``damping_milli``/1000, all mass in
    integer units summing to ~``total``.

    Every step is integer arithmetic (contribution = pr div out-degree,
    damped sum = d·Σ div 1000), so the result is a PURE function of the
    graph — reproducible across engines, partitionings and runs, which is
    what lets an iterative algorithm carry a full value oracle (the DuckDB
    side unrolls the same ``iterations`` rounds; float PageRank could
    never hash-match across engines because distributed float sums are
    order-dependent, while integer sums commute).  Dangling-node mass is
    dropped, the common simplification.

    Scale shape: per round, ONE join of the rank vector against the edge
    list on src (both shuffle-partitioned on the same key, so AQE reuses
    the exchange across rounds) + one partial-agg groupBy on dst; the
    rank vector is O(nodes), never materialized on the driver.  Round
    count is a constant — at 100 TB the cost is ``iterations`` × (edge
    shuffle), the canonical distributed PageRank plan.
    """
    # int64 bound: per-node mass ≤ total (mass is only ever split and
    # damped), so the largest intermediate is damping_milli · Σ(contrib)
    # ≤ damping_milli · total — graph-size-INDEPENDENT.  The default
    # total=1e12 peaks at 8.5e14; the gate below rejects configurations
    # that could overflow at any graph (the sf-passes-then-explodes
    # class of bug caught by tests/test_overflow_bounds.py).
    if damping_milli * total >= 2**63:
        raise ValueError(
            f"pagerank: damping_milli*total = {damping_milli * total} "
            "overflows int64; lower `total`"
        )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = e.join(deg, "src").localCheckpoint(eager=False)
    n = nodes.count()
    if n == 0:
        # empty graph → empty (id, pr), like the other graph operators
        return nodes.withColumn("pr", F.lit(0).cast("long")).select("id", "pr")
    base = (total * (1000 - damping_milli) // 1000) // n
    pr = nodes.withColumn("v", F.lit(total // n).cast("long"))
    for _ in range(iterations):
        contrib = (
            pr.join(ed, pr["id"] == ed["src"])
            .select(F.col("dst").alias("id"), F.expr("v div d").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damping_milli} * coalesce(s, 0) div 1000"
                    )
                ).cast("long").alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    return pr.select("id", F.col("v").alias("pr"))


def triangle_participation(
    edges: DataFrame,
    left_col: str = "a",
    right_col: str = "b",
) -> DataFrame:
    """Exact per-node triangle counts → (id, n_triangles), undirected
    edges (self-loops and duplicates tolerated) — the clustering-structure
    measurement behind community/quality analysis of a similarity or
    citation graph.

    The scale trick is DEGREE ORIENTATION (the standard distributed
    triangle algorithm): direct every edge from its (degree, id)-smaller
    endpoint to the larger, which makes the oriented out-degree O(√E)
    even on power-law graphs, so the wedge join — out-neighbors of the
    same node, joined pairwise — generates O(E^1.5) wedges worst-case
    instead of Σdeg² (a hub with degree 10⁶ would otherwise explode into
    10¹² wedge pairs).  Each wedge closes against the oriented edge list
    with one more equi-join; every triangle is found exactly once, then
    exploded to its three corners for the per-node counts.

    Three shuffles total (orient-degree agg, wedge join, closing join) —
    all equi-joins Catalyst plans like any other; no iteration, no state.
    """
    from indra_db_spark.operators.dedup import _materialize

    # the canonical edge set feeds the degree count AND both sides of the
    # orientation join — materialize once or the dedup shuffle re-runs
    # per consumer (same for the oriented list: wedge sides + closing)
    e = _materialize(
        edges.select(
            F.least(left_col, right_col).alias("u"),
            F.greatest(left_col, right_col).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionByName(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): src is the smaller endpoint in that order
    with_deg = (
        e.join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
    )
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = _materialize(
        with_deg.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(fwd, kv).otherwise(ku).alias("_dk"),
        )
    )
    e1 = oriented.select("src", F.col("dst").alias("b"), F.col("_dk").alias("kb"))
    e2 = oriented.select("src", F.col("dst").alias("c"), F.col("_dk").alias("kc"))
    wedges = e1.join(e2, "src").filter(F.col("kb") < F.col("kc")).select(
        "src", "b", "c"
    )
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    corners = (
        tris.select(F.col("src").alias("id"))
        .unionByName(tris.select(F.col("b").alias("id")))
        .unionByName(tris.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def kcore(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 6,
    left_col: str = "a",
    right_col: str = "b",
) -> DataFrame:
    """Bounded-round k-core peel → (id, d): nodes surviving ``rounds`` of
    "drop every node with degree < k" over the undirected simple graph,
    with their degree at the last peel — the density-core extraction
    behind spam-farm/community detection on link graphs (and the graph
    twin of the curation pipeline's quality gates).

    The result is defined as EXACTLY ``rounds`` peels, which makes an
    iterative deletion algorithm a pure function of the graph: both
    engines unroll the identical rounds (DuckDB oracle = chained CTEs),
    converged or not — on fixture graphs the round count is chosen past
    the fixed point, asserted in tests.  All arithmetic is integer
    counting, so hashes match across engines and partitionings.

    Scale shape per round: ONE partial-agg degree count (map-side
    combine; a node's degree rows collapse before the exchange) + two
    semi-joins filtering the edge list by the survivor set — all keyed
    shuffles of the CURRENT edge set, which only ever shrinks.  Round
    count is a constant; lineage is cut with a lazy localCheckpoint per
    round exactly like :func:`pagerank`.
    """
    u, v = F.col(left_col), F.col(right_col)
    e = (
        edges.select(
            F.least(u, v).alias("s"), F.greatest(u, v).alias("t")
        )
        .filter(F.col("s") < F.col("t"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = None
    for _ in range(rounds):
        deg = (
            e.select(F.col("s").alias("id"))
            .union(e.select(F.col("t").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).localCheckpoint(eager=False)
        e = (
            e.join(keep.select(F.col("id").alias("s")), "s", "semi")
            .join(keep.select(F.col("id").alias("t")), "t", "semi")
            .select("s", "t")
            .localCheckpoint(eager=False)
        )
    if deg is None:  # rounds=0: degenerate, everything survives
        deg = (
            e.select(F.col("s").alias("id"))
            .union(e.select(F.col("t").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
    return deg.filter(F.col("d") >= k)


def label_propagation(
    edges: DataFrame,
    rounds: int = 5,
    left_col: str = "a",
    right_col: str = "b",
) -> DataFrame:
    """Bounded-round synchronous min-label propagation → (id, lbl): every
    node starts labeled with its own id; each round, a node adopts the
    minimum of its label and its neighbors' PREVIOUS-round labels.  After
    enough rounds labels converge to per-component minima (a third
    connected-components formulation besides the pointer-jumping and
    driver paths in :func:`connected_components`), but the operator's
    contract is EXACTLY ``rounds`` synchronous steps — deterministic
    whether converged or not, so the DuckDB twin unrolls the identical
    rounds and hash-matches (the kcore/PageRank oracle discipline).
    Convergence needs rounds ≥ the component's min-label eccentricity;
    fixture round counts are pinned past the fixed point in tests.

    Scale shape per round: ONE join (labels ⋈ directed edges, keyed on
    the source) + one partial-agg min keyed on the destination — both
    shuffles on node id, label frame never exceeds |V| rows, lineage cut
    by a lazy localCheckpoint per round exactly like :func:`pagerank`.
    Hub skew is absorbed by the map-side combine (a hub's incoming
    candidates collapse to one min per partition before the exchange).
    """
    u, v = F.col(left_col), F.col(right_col)
    und = edges.select(
        F.least(u, v).alias("s"), F.greatest(u, v).alias("t")
    ).filter(F.col("s") < F.col("t")).distinct()
    # both directions: propagation is symmetric
    dir_e = und.unionByName(
        und.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=False)
    labels = (
        dir_e.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        labels = _lp_round(dir_e, labels).localCheckpoint(eager=False)
    return labels


def _lp_round(dir_e: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous step: neighbor-min via join + partial-agg min,
    then least() against the node's own label.  Module-level so the
    plan-hygiene test can pin the partial aggregation on the round body
    itself (the returned frame of :func:`label_propagation` is a
    checkpoint scan that hides per-round plans)."""
    nbr_min = (
        dir_e.join(labels.select(F.col("id").alias("s"), "lbl"), "s")
        .groupBy(F.col("t").alias("id"))
        .agg(F.min("lbl").alias("_nm"))
    )
    return labels.join(nbr_min, "id", "left").select(
        "id",
        F.least(F.col("lbl"), F.coalesce("_nm", F.col("lbl"))).alias("lbl"),
    )


#: unreached-distance sentinel shared by the operator and its SQL oracle —
#: an explicit value instead of NULL so both engines' least() agree without
#: depending on their (different) null-skipping rules
BFS_INF = 999_999_999


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 6,
    left_col: str = "a",
    right_col: str = "b",
) -> DataFrame:
    """Bounded-round multi-source BFS over the undirected simple graph →
    (id, dist): every node's hop distance to the nearest source,
    computed as ``rounds`` synchronous relaxations (dist = min(dist,
    min(neighbor dist) + 1)) — the k-hop-neighborhood / blast-radius
    query of lineage and fraud graphs.  Exactly-``rounds`` semantics
    keep it a pure integer function of (graph, sources): the DuckDB twin
    unrolls identical rounds (the labelprop/kcore/PageRank discipline),
    and nodes farther than ``rounds`` hops are absent from the result.

    Scale shape per round: one frontier⋈edges join + a partial-agg min
    keyed on the destination, then a full-outer merge with the running
    distance frame — all shuffles on node id, frame bounded by |V|,
    lineage cut per round.  Unreached nodes carry :data:`BFS_INF`
    internally (never NULL — engines disagree on null-skipping in
    least()) and are filtered at the end.
    """
    u, v = F.col(left_col), F.col(right_col)
    und = edges.select(
        F.least(u, v).alias("s"), F.greatest(u, v).alias("t")
    ).filter(F.col("s") < F.col("t")).distinct()
    dir_e = und.unionByName(
        und.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=False)
    # distances are defined over GRAPH NODES: sources absent from the
    # edge set are dropped (matching the unrolled oracle, which seeds
    # from the directed-edge endpoints) rather than emitted at dist 0
    dist = (
        sources.select(F.col(sources.columns[0]).alias("id"))
        .distinct()
        .join(dir_e.select("s").withColumnRenamed("s", "id").distinct(),
              "id", "semi")
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        nbr = (
            dir_e.join(dist.select(F.col("id").alias("s"), "dist"), "s")
            .groupBy(F.col("t").alias("id"))
            .agg((F.min("dist") + 1).alias("_nd"))
        )
        dist = (
            dist.join(nbr, "id", "full_outer")
            .select(
                "id",
                F.least(
                    F.coalesce("dist", F.lit(BFS_INF)),
                    F.coalesce("_nd", F.lit(BFS_INF)),
                ).alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
    return dist.filter(F.col("dist") < BFS_INF)
