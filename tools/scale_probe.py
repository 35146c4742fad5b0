"""Empirical scaling probe: time the corpus-curation operators at 1×, 10×,
and 100× the sf0.1 corpus and report the log-log scaling slope per op.

The 100 TB argument in SCALING.md is made from plan shapes; this tool adds
measured evidence on one machine: if an operator is linear (slope ≈ 1 on
data× vs time×), its plan has no hidden quadratic or skew cliff in the
probed range.

Amplification: copy k of each document rewrites every word with a
``_k`` suffix (pure ``transform``), so copies share NO shingles — the
near-dup pair structure stays proportional to the corpus instead of gaining
K² cross-copy pairs, which is what a real 100× corpus looks like (more
documents, not 100 identical copies of each).  Embedding copy k shifts one
component deterministically for the same reason.  Amplified inputs are
cached as parquet under ``.scale_data/`` (gitignored).

Usage:  PYTHONPATH=. python tools/scale_probe.py [factor ...]   # default 1 10 100
Writes SCALE_PROBE.json and prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".scale_data")


def _amplified(spark, table: str, factor: int, build):
    path = os.path.join(CACHE, f"{table}_x{factor}.parquet")
    if not os.path.exists(path):
        # write MANY files: the amplification plan ends at 1-2 partitions,
        # and a 1-2-file parquet caps every scan-bound op at 1-2 tasks —
        # the probe would then measure file layout, not the operator (a
        # real amplified corpus arrives as many files)
        par = spark.sparkContext.defaultParallelism
        build(spark, factor).repartition(par).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)


def _docs_x(spark, factor: int):
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    out = base.select("*", copies)
    suffix = F.concat(F.lit("_"), F.col("k").cast("string"))
    # long k: int k * 1e7 overflows 32-bit under ANSI at factor >= 215
    return out.select(
        (F.col("doc_id") + F.col("k").cast("long") * F.lit(10_000_000)).alias("doc_id"),
        F.when(F.col("k") == 0, F.col("text"))
        .otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "), lambda w: F.concat(w, suffix)
                ),
            )
        )
        .alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def _emb_x(spark, factor: int):
    """Amplified embeddings with near-dup structure PROPORTIONAL to the
    corpus: copy k applies the orthogonal rotation pair
    (first half circularly rotated by k mod 32, second half by
    (k div 32) mod 32) — 32×32 = 1024 distinct maps, covering factor
    1000.  Same-k copies of a base pair keep their exact dot product
    (both halves rotate identically), so every base near-dup pair
    replicates once per copy: output ∝ factor.  Cross-k copies
    decorrelate (measured cos ≈ ±0.1 on the fixture), so no copy chains.
    The previous single-component +0.01k shift was fine for top-k probes
    but made low-k copies near-duplicates of EACH OTHER — a K² pair
    explosion that would measure the amplifier, not the operator, for
    threshold near-dup ops (r7 verdict #6 probe extension)."""
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    out = base.select("*", copies)
    h = 32  # fixture embeddings are dim 64: two 32-component halves
    ka = (F.col("k") % h).cast("int")
    kb = ((F.col("k") / h).cast("int") % h).cast("int")
    first, second = F.slice("embedding", 1, h), F.slice("embedding", h + 1, h)

    def rot(half, off):
        return F.concat(
            F.slice(half, off + F.lit(1), F.lit(h) - off),
            F.slice(half, F.lit(1), off),
        )

    # long k: int k * 1e7 overflows 32-bit under ANSI at factor >= 215
    return out.select(
        (F.col("vec_id") + F.col("k").cast("long") * F.lit(10_000_000)).alias("vec_id"),
        F.concat(rot(first, ka), rot(second, kb)).alias("embedding"),
        "label",
    )


def _events_x(spark, factor: int):
    """Amplified event log: each copy shifts user_id and event_id into its
    own range — growth = MORE USERS at constant per-user volume (what a
    real 100x event log looks like), so per-key window/join partitions
    stay bounded while totals scale."""
    from pyspark.sql import functions as F

    from indra_db_spark.sources.lake import load_table

    # load_table, not raw read: events.ts may be TIMESTAMP(NANOS) and the
    # lake loader rebuilds it — a raw read would hand the time-based probe
    # ops epoch-nanos longs and they would time semantically empty queries
    base = load_table(spark, SF_DIR, "events")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("k")
    out = base.select("*", copies)
    k = F.col("k").cast("long")  # int k * 1e8 overflows 32-bit at x100
    return out.select(
        (F.col("event_id") + k * F.lit(100_000_000)).alias("event_id"),
        "ts",
        (F.col("user_id") + k * F.lit(10_000_000)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def _tree_edges(spark, factor: int):
    """Amplified binary-tree hierarchy (same shape as the closure catalog
    entries' part-derived edges: child i -> parent i//2): N scales with the
    factor, depth with log2(N) — so the closure probe measures BOTH a wider
    per-round shuffle and the extra doubling rounds a deeper graph costs."""
    from pyspark.sql import functions as F

    base_n = spark.read.parquet(
        os.path.join(SF_DIR, "part.parquet")
    ).count()
    return spark.range(2, base_n * factor).select(
        F.col("id").alias("child"), F.expr("id div 2").alias("parent")
    )


def _emb_product(spark, factor: int):
    """Product-structured embedding corpus — the EXACT-near-dup design
    regime (SCALING.md §6g): an s×s grid of half-codewords
    (s = sqrt(n/20), so the factor structure grows WITH the corpus),
    each point = (A[i] ⧺ B[j]) + small full-dim noise, 20 members per
    code combo.  Near-dup pairs (cos ≈ 0.97) are the within-combo
    pairs → output ∝ n; cross-combo points differ in at least one half
    (distance ≈ 1 on the unit sphere) → the per-half prune has real
    structure to certify.  The ISOTROPIC amplifier deliberately does NOT
    feed the exact near-dup probe: concentration of measure makes every
    metric bound vacuous there and ANY exact method is provably
    all-pairs — that regime is measured once and documented, not
    re-probed (§6g)."""
    import math

    from pyspark.sql import functions as F

    n = 2000 * factor
    m = 20
    s = max(2, int(math.isqrt(n // m)))
    dims = F.sequence(F.lit(0), F.lit(63))
    code = F.expr(f"id div {m}")
    i_ = F.pmod(code, F.lit(s))
    j_ = F.pmod(F.expr(f"(id div {m}) div {s}"), F.lit(s))

    def comp(d):
        h1 = (F.pmod(F.xxhash64(F.lit(11), i_, d), F.lit(1000)).cast("double")) / 500.0 - 1.0
        h2 = (F.pmod(F.xxhash64(F.lit(22), j_, d), F.lit(1000)).cast("double")) / 500.0 - 1.0
        base = F.when(d < 32, h1).otherwise(h2)
        jitter = (F.pmod(F.xxhash64(F.col("id"), d, F.lit(7)), F.lit(1000)).cast("double")) / 500.0 - 1.0
        return base + 0.12 * jitter

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(dims, lambda d: comp(d).cast("float")).alias("embedding"),
    )


def _srp_planes(factor: int) -> int:
    """SRP bucket-count growth law for the near-dup probe: planes grows
    log₂ with the corpus so the per-bucket population stays constant —
    the knob a real deployment turns, and the reason the LSH path stays
    linear where any fixed-bucket scheme is quadratic-within-bucket."""
    import math

    return 6 + int(round(math.log2(factor)))


def _ops(spark, docs, emb, edges, ivf_index, ivf_centers, events,
         pq_artifacts=None, emb_prod=None, factor=1):
    from pyspark.sql import functions as F

    from indra_db_spark.operators import analytics as AN
    from indra_db_spark.operators import bpe as B
    from indra_db_spark.operators import dedup as D
    from indra_db_spark.operators import temporal as TP
    from indra_db_spark.operators import classify as CF
    from indra_db_spark.operators import pq as PQm
    from indra_db_spark.streaming.ingest import interval_attribution as _IA
    from indra_db_spark.operators import topk as TK
    from indra_db_spark.operators import graph as G
    from indra_db_spark.operators import sampling as SM
    from indra_db_spark.operators import similarity as S
    from indra_db_spark.operators import text as X

    is_test = F.col("doc_id") % 41 == 0
    queries = emb.filter(F.col("vec_id") < 10) if emb is not None else None

    return {
        "exact_dedup": lambda: D.exact_dedup(docs),
        "minhash_verified": lambda: D.minhash_verified_pairs(
            docs, num_hashes=12, bands=4, threshold=0.2
        ),
        "simhash": lambda: D.simhash(docs, bits=32),
        "vocab_topk": lambda: X.vocab_topk(docs, k=100),
        "decontaminate": lambda: SM.decontaminate(
            docs.filter(~is_test), docs.filter(is_test), min_overlap=2
        ),
        "stratified_sample": lambda: SM.stratified_sample(
            docs, ("lang",), 30
        ),
        "shard_stats": lambda: SM.shard_assign(docs, 16)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n")),
        # the ANN triple: exact baseline vs SRP buckets vs IVF probe over a
        # prebuilt index — the crossover between them is the measurement
        "emb_topk_exact": lambda: S.brute_force_topk(emb, queries, k=5),
        "srp_topk": lambda: S.srp_topk(emb, queries, k=5, planes=6),
        # the exact threshold near-dup scale paths (r7 verdict #6 /
        # r8 triage): "imi" is the inverted-multi-index exact prune on
        # the product-structured corpus — its DESIGN regime, cell count
        # growing with the corpus, candidates ∝ output.  "srp_neardup"
        # is the LSH generate-then-verify path on the ISOTROPIC corpus
        # with planes growing log₂(n) (constant per-bucket population) —
        # each probed where its geometry assumption holds: SRP's
        # axis-aligned sign bits need SPREAD data (on the product corpus
        # they collapse onto the half-1 codeword and the bucket count
        # stops growing — measured 3.7 s → 45 s over 10×→100× before the
        # corpus swap, the predicted n^1.5), while the exact metric
        # prune needs STRUCTURE (on the isotropic corpus concentration
        # of measure makes every bound vacuous and ANY exact method is
        # provably all-pairs — measured 7.4 s → 84.8 s over 1×→10× when
        # the retired flat-"cells" row probed it).  The complementarity
        # is the point: SCALING.md §6g documents which regime routes to
        # which operator.
        "imi": lambda: S.cosine_neardup_imi(
            emb_prod, threshold=0.9, target_cell_rows=20
        ),
        "srp_neardup": lambda: S.srp_neardup_pairs(
            emb, threshold=0.35, planes=_srp_planes(factor)
        ),
        "ivf_probe": lambda: S.ivf_probe(
            ivf_index, ivf_centers, queries, k=5, nprobe=2
        ),
        # closure: auto (size-gated driver fast path may engage) vs forced
        # distributed doubling loop — their gap is the driver-vs-cluster
        # crossover at each scale
        "closure_auto": lambda: G.transitive_closure(edges),
        "closure_dist": lambda: G.transitive_closure(
            edges, driver_max_edges=0
        ),
        # round-5 additions: substring-span dedup (detect + rewrite), the
        # bigram-LM scorer, fused keyword search, pinned-tokenizer BPE
        "dup_spans": lambda: D.duplicate_spans(docs, k=4),
        "dedup_rewrite": lambda: D.remove_duplicate_spans(docs, k=4),
        "lm_score": lambda: X.bigram_lm_score(docs),
        "keyword_search": lambda: X.keyword_search(
            docs, ["query", "window", "stream"], k=10
        ),
        "bpe_tokens": lambda: B.bpe_token_counts(docs, B.PINNED_MERGES_V1),
        # events family: temporal joins, funnel, retention, statistics —
        # amplified as more users (per-key partitions stay bounded)
        "asof_join": lambda: TP.asof_join(
            events.filter(F.col("event_type") == "purchase").select(
                "event_id", "ts", "user_id", "value"
            ),
            TP.latest_per_key_ts(
                events.filter(F.col("event_type") == "click").select(
                    "event_id", "ts", "user_id", "value"
                ),
                "user_id", "ts", "event_id",
            ),
            on="user_id",
        ),
        "band_join": lambda: TP.band_join(
            events.filter(F.col("event_type") == "error").select(
                "event_id", "ts", "user_id"
            ),
            events.filter(F.col("event_type") == "click").select(
                "event_id", "ts", "user_id"
            ),
            on="user_id", band_seconds=900,
        ),
        "funnel": lambda: AN.funnel(
            events, ["signup", "click", "purchase"]
        ),
        "cohort_retention": lambda: AN.cohort_retention(events),
        "hier_rollup": lambda: events.withColumn(
            "hour", F.date_trunc("hour", "ts")
        ).rollup("event_type", "hour").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        ),
        "kmv_distinct": lambda: TK.kmv_distinct(
            events, ["event_type"], "user_id", k=64
        ),
        "group_quantiles": lambda: TK.discrete_quantiles(
            events, ["event_type"], "value"
        ),
        # hot-key skew family: one bot user owns ~10% of ALL events (the
        # share stays 10% at every amplification, so the skew cliff grows
        # with the corpus).  asof_skew (single per-key window) vs
        # asof_skew_chunked (segmented carry-forward) is the measured
        # evidence for the chunk_seconds escape; funnel_skew demonstrates
        # the per-step aggregates absorb the hot key map-side (partial
        # aggregation) without any escape.
        "asof_skew": lambda: TP.asof_join(
            _skewed(events).filter(F.col("event_type") == "purchase").select(
                "event_id", "ts", "user_id", "value"
            ),
            TP.latest_per_key_ts(
                _skewed(events).filter(F.col("event_type") == "click").select(
                    "event_id", "ts", "user_id", "value"
                ),
                "user_id", "ts", "event_id",
            ),
            on="user_id",
        ),
        "asof_skew_chunked": lambda: TP.asof_join(
            _skewed(events).filter(F.col("event_type") == "purchase").select(
                "event_id", "ts", "user_id", "value"
            ),
            TP.latest_per_key_ts(
                _skewed(events).filter(F.col("event_type") == "click").select(
                    "event_id", "ts", "user_id", "value"
                ),
                "user_id", "ts", "event_id",
            ),
            on="user_id",
            chunk_seconds=3600,
        ),
        "funnel_skew": lambda: AN.funnel(
            _skewed(events), ["signup", "click", "purchase"]
        ),
        # path analysis under the same 10%-bot skew: plain single-window
        # vs the segmented (u, chunk) escape with (n-1)-row boundary
        # recovery — the measured crossover evidence for event_paths'
        # chunk_seconds parameter (parity is pinned by
        # test_event_paths_chunked_parity_under_skew)
        "paths_skew": lambda: AN.event_paths(_skewed(events)),
        "paths_skew_chunked": lambda: AN.event_paths(
            _skewed(events), chunk_seconds=3600
        ),
        # the composed corpus pipeline (span rewrite → LM gate →
        # decontaminate → pack): the end-to-end number a nightly
        # training-data run cares about — SAME function as the oracle-
        # checked catalog entry, so the measured thing is the proven thing
        "corpus_v2": lambda: SM.corpus_pipeline_v2(docs),
        # round-6 additions: degree-oriented triangles (tree + grandparent
        # shortcuts derived from the same edge frame), per-user path
        # n-grams, median/MAD anomaly buckets, PMI collocations, per-doc
        # keywords, shuffle-free chunking, fingerprint corpus diff
        "triangles": lambda: G.triangle_participation(
            edges.unionByName(
                edges.filter(F.col("child") >= 4).select(
                    F.col("child"),
                    F.expr("child div 4").alias("parent"),
                )
            ),
            "child", "parent",
        ),
        "event_paths": lambda: AN.event_paths(events),
        "rate_anomaly": lambda: AN.rate_anomalies(events),
        "pmi_terms": lambda: X.pmi_terms(docs),
        "top_terms": lambda: X.top_terms_per_doc(docs),
        "chunks": lambda: X.chunk_documents(docs),
        "corpus_diff": lambda: SM.corpus_diff(
            docs.filter(F.col("doc_id") % 19 != 0),
            docs.filter(F.col("doc_id") % 23 != 0),
        ),
        # round-7 addition: canonical-copy selection over the LSH cluster
        # map.  The exact near-dup probes live above ("imi" /
        # "srp_neardup", on the product-structured corpus) — see the
        # comment there and SCALING.md §6g for why the isotropic
        # amplifier cannot host an exact-near-dup slope.
        # round-7.2: supervised classifier gate (train + score, one
        # lineage — training is the dominant ≤n_buckets-key agg) and the
        # PQ family: build (train+encode) vs the per-query-batch ADC scan
        # and the IVF-pruned composed search over PREBUILT artifacts
        # (index construction is a build-time cost, same treatment as the
        # IVF index above)
        "quality_classifier": lambda: CF.score_with_classifier(
            docs, CF.train_polarity_classifier(
                docs.withColumn("label", (F.col("lang") == "en").cast("int"))
            )
        ),
        "pq_build": lambda: PQm.pq_encode(
            emb, PQm.pq_train(emb, m=16, k=16, rounds=2), m=16
        ),
        "pq_adc": lambda: PQm.pq_adc_topk(
            pq_artifacts["codes"], pq_artifacts["cb"], queries,
            k_top=5, m=16,
        ),
        "ivfpq": lambda: PQm.ivfpq_topk(
            emb, queries, m=16, k=16,
            coarse=pq_artifacts["coarse"], codebook=pq_artifacts["cb"],
            codes=pq_artifacts["codes"],
        ),
        # round-10 triage of ivfpq's super-linear final decade (r8 verdict
        # #2): the SERVED path — codes stored partitioned by coarse cell
        # (ncell ≈ √N, built untimed like every index artifact), query
        # batch reads ONLY the probed cells' partitions.  ivfpq above
        # keeps timing the fixed-ncell recompute-per-batch configuration,
        # whose Θ(N·ncell + N) per batch is the documented asymptote.
        "ivfpq_served": lambda: PQm.ivfpq_query_index(
            spark, pq_artifacts["served_path"], queries, nprobe=3, k_top=5,
        ),
        # round-7.3: bounded-round k-core peel (shrinking edge set per
        # round), stream-stream-shaped interval attribution run in batch
        # (one key shuffle + post-condition), and bloom-guarded
        # decontamination (fixed-size bitmap broadcast + shuffled verify)
        "kcore": lambda: G.kcore(
            edges.unionByName(
                edges.filter(F.col("child") >= 4).select(
                    F.col("child"),
                    F.expr("child div 4").alias("parent"),
                )
            ),
            k=2, rounds=4, left_col="child", right_col="parent",
        ),
        "attribution": lambda: _IA(
            events.filter(F.col("event_type") == "click"),
            events.filter(F.col("event_type") == "purchase"),
        ),
        "decontaminate_bloom": lambda: SM.decontaminate_bloom(
            docs.filter(F.col("doc_id") % 41 != 0),
            docs.filter(F.col("doc_id") % 41 == 0),
        ),
        "dup_cluster_reps": lambda: D.dup_cluster_representatives(
            docs.withColumn("n_words", X.token_count(F.col("text"))),
            G.connected_components(
                D.minhash_lsh_pairs(docs, num_hashes=8, bands=4),
                "id_a", "id_b",
            ),
        ),
        # round-7 additions: master-data fuzzy linkage (fixed right side —
        # the realistic ER shape: an arriving corpus matched against a
        # bounded master list, so candidates grow linearly with the left;
        # growing BOTH sides under a fixed block-key cardinality would be
        # quadratic by construction — the block key must widen with the
        # corpus, see SCALING.md), incremental near-dup probe, gap-fill
        # (more users at constant per-user span), one-pass profile
        "er_linkage": lambda: _linkage(docs),
        "minhash_increment": lambda: D.minhash_incremental_pairs(
            docs.filter(F.col("doc_id") % 3 != 0),
            docs.filter(F.col("doc_id") % 3 == 0),
            num_hashes=8, bands=4, threshold=0.2,
        ),
        "gapfill": lambda: TP.gapfill_locf(
            events.filter(F.col("event_type") == "purchase").select(
                "user_id", "ts", "event_id", "value"
            ),
            tiebreak_col="event_id",
        ),
        "lake_profile": lambda: _profile(docs),
        # round-7.5: warehouse modeling (SCD2 build + point-in-time
        # enrichment — amplified as more users, per-key change counts
        # constant), trailing rolling windows (frame density constant),
        # capped basket co-occurrence (basket width bounded by the item
        # vocabulary, so pair volume grows linearly in keys), the one-pass
        # A/B read-out, and bounded-round min-label propagation over the
        # same shrinking-edge graph family as kcore
        "scd2": lambda: TP.scd2_build(
            events.filter(F.col("event_type") == "view").select(
                "user_id", "ts", "event_id",
                (F.floor(F.abs(F.col("value")) * 2).cast("bigint") % 3)
                .alias("tier"),
            ),
            key_col="user_id", ts_col="ts", attr_cols=["tier"],
            tiebreak_col="event_id",
        ),
        "pit_join": lambda: TP.pit_join(
            events.filter(F.col("event_type") == "purchase").select(
                "event_id", "ts", "user_id", "value"
            ),
            TP.scd2_build(
                events.filter(F.col("event_type") == "view").select(
                    "user_id", "ts", "event_id",
                    (F.floor(F.abs(F.col("value")) * 2).cast("bigint") % 3)
                    .alias("tier"),
                ),
                key_col="user_id", ts_col="ts", attr_cols=["tier"],
                tiebreak_col="event_id",
            ),
            on="user_id",
        ),
        "rolling": lambda: TP.rolling_agg(
            events.filter(F.col("event_type") == "purchase").select(
                "event_id", "ts", "user_id", "value"
            ),
            key_col="user_id", ts_col="ts",
            value_micro=F.floor(F.col("value") * 1_000_000),
            window_seconds=6 * 3600,
        ),
        "cooccur": lambda: AN.cooccurrence_pairs(
            events.select(
                "user_id",
                F.concat(
                    F.col("event_type"), F.lit("@"),
                    F.lpad(F.hour("ts").cast("string"), 2, "0"),
                ).alias("item"),
            ),
            key_col="user_id", item_col="item",
            max_items_per_key=64, min_count=2,
        ),
        "ab_daily": lambda: AN.ab_daily_uplift(events),
        "labelprop": lambda: G.label_propagation(
            edges.unionByName(
                edges.filter(F.col("child") >= 4).select(
                    F.col("child"),
                    F.expr("child div 4").alias("parent"),
                )
            ),
            rounds=4, left_col="child", right_col="parent",
        ),
        # round-7.6/7.7: bounded-round BFS (same shrinking-frontier family
        # as labelprop), one-exchange feature scaling, two-pass winsorized
        # means, explode+partial-agg centroids, conversion-keyed
        # attribution credits, and the Expand-based skew report
        "bfs": lambda: G.bfs_distances(
            edges.unionByName(
                edges.filter(F.col("child") >= 4).select(
                    F.col("child"),
                    F.expr("child div 4").alias("parent"),
                )
            ),
            edges.sparkSession.range(1, 3),
            rounds=4, left_col="child", right_col="parent",
        ),
        "feature_scale": lambda: _feature_scale(events),
        "winsorized": lambda: _winsorized(events),
        "label_centroids": lambda: emb.filter(
            F.col("label").isNotNull()
        )
        .select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("x").cast("double") * 1_000_000).cast(
                    "bigint"
                )
            ).alias("s"),
        ),
        "attribution_model": lambda: _attr_model(events),
        "skew_report": lambda: _skew_report(events),
    }


def _feature_scale(events):
    from pyspark.sql import functions as F

    from indra_db_spark.catalog.temporal import events_feature_scale  # noqa: F401
    from pyspark.sql import Window

    v = events.filter(F.col("value").isNotNull()).select(
        "event_id", "event_type",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
    )
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("vm")
    return (
        v.withColumn("rk", F.rank().over(wo))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn("lo", F.min("vm").over(wp))
        .withColumn("hi", F.max("vm").over(wp))
    )


def _winsorized(events):
    from pyspark.sql import functions as F

    from indra_db_spark.operators.topk import discrete_quantiles

    v = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
    )
    bounds = discrete_quantiles(
        v, ["event_type"], "vm", {"lo": 0.05, "hi": 0.95}
    )
    return (
        v.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("vm"), F.col("lo")), F.col("hi"))
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def _attr_model(events):
    from pyspark.sql import functions as F

    from indra_db_spark.operators.analytics import attribution_credits
    from indra_db_spark.streaming.ingest import interval_attribution

    pairs = interval_attribution(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    ).select("touch_id", "touch_ts", "conv_id")
    return attribution_credits(pairs)


def _skew_report(events):
    from indra_db_spark.operators.profile import skew_report

    return skew_report(
        events.select("event_type", "user_id"),
        ["event_type", "user_id"],
        k=8,
    )


def _linkage(docs):
    """Fuzzy-link amplified entities against the FIXED base-copy master
    list (doc_id < 10_000_000 is the k=0 amplification copy, constant at
    every factor): block on the name's last-3-digit key, verify with
    levenshtein, best match per left row."""
    from pyspark.sql import functions as F

    from indra_db_spark.operators.linkage import fuzzy_link

    name = F.concat(
        F.lit("entity-"), F.lpad((F.col("doc_id") % 100_000).cast("string"), 9, "0")
    )
    left = docs.select(F.col("doc_id").alias("lid"), name.alias("lname"))
    right = docs.filter(F.col("doc_id") < 10_000_000).select(
        F.col("doc_id").alias("rid"), name.alias("rname")
    )
    return fuzzy_link(
        left, right, "lid", "rid", "lname", "rname",
        F.substring("lname", -3, 3), F.substring("rname", -3, 3),
        max_dist=3,
    )


def _profile(docs):
    from indra_db_spark.operators.profile import profile_table

    return profile_table(docs, ["doc_id", "lang", "source"])


def _skewed(events):
    """~10% of events reassigned to one bot user (deterministic)."""
    from pyspark.sql import functions as F

    return events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(1)).otherwise(
            F.col("user_id")
        ),
    )


DV_SIDECAR_COUNTS = (0, 8, 64)


def _dv_probe(
    spark, events, sidecar_counts=DV_SIDECAR_COUNTS
) -> dict[str, float]:
    """Deletion-vector READ amplification vs sidecar count (r8 verdict
    #7): commit the amplified event log into a TxTable once, then time
    the snapshot read under s accumulated DV sidecars PER DATA FILE —
    the state a table reaches after s small merge-on-read deletes with
    no intervening OPTIMIZE.  The deleted surface is fixed (2% of rows,
    attributed once); only the sidecar FILE COUNT varies, so the
    s0→s64 ratio isolates pure read amplification: sidecar opens plus
    the widening anti-join build side.

    Sidecar states are crafted through the manifest (one commit per s
    with the staged sidecars mapped to every data file) rather than s
    sequential delete_where calls — the probe measures the READ path;
    s full delete scans at factor 1000 would measure the writer."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from indra_db_spark.plans.txlog import TxTable

    root = tempfile.mkdtemp(prefix="txlog_dv_probe_")
    out: dict[str, float] = {}
    try:
        tx = TxTable(spark, root)
        tx.append(events.select("event_id", "user_id", "event_type", "value"))
        version, files = tx.snapshot()
        body = tx._read_version(version)
        schema = body.get("schema")
        matched = (
            tx._read_files(files, schema)
            .select(
                F.col("_metadata.file_name").alias("file"),
                F.col("_metadata.row_index").alias("pos"),
                "event_id",
            )
            .filter(F.col("event_id") % 50 == 0)
            .select("file", "pos")
        )
        for s in sidecar_counts:
            if s == 0:
                read_v = version
            else:
                dv_names = tx._stage(matched, n_files=s)
                cur, cur_files, txns, sch, cons, _ = tx._snapshot_full()
                dvmap = {f: list(dv_names) for f in files}
                ok = tx._try_claim(
                    cur + 1, cur_files, "dv_delete", txns, sch, cons, dvmap
                )
                assert ok, "dv probe claim lost (single writer)"
                read_v = cur + 1
            tx.read(read_v).write.mode("overwrite").format("noop").save()
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                tx.read(read_v).write.mode("overwrite").format("noop").save()
                best = min(best, time.monotonic() - t0)
            out[f"txlog_dv_s{s}"] = round(best, 3)
            print(
                f"probe txlog_dv s={s}: {out[f'txlog_dv_s{s}']}",
                file=sys.stderr,
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _maintain_probe(spark, events, windows: int = 3) -> dict[str, float]:
    """maintain() churn-proportionality (r10 verdict next-round #4): the
    claim "cost ∝ churn, never the table" was argued from construction
    (threshold-targeted DV rewrites + small-file-only bin-packing +
    single listing RPC); this measures it.  The table's BASE is the
    factor-scaled event log; each maintenance window then lands a
    FIXED-SIZE churn (20 small appended files + 8 crafted DV sidecars on
    each) and times ONE ``maintain()`` pass.  Flat per-window wall time
    across factors (log-log slope ≈ 0 while the base grows 1000×) is the
    evidence; the only table-proportional term left is compact_small's
    single data-dir listing, which is one RPC over O(files), not a scan.

    Churn is crafted the way _dv_probe crafts sidecar states — through
    the manifest, never via delete_where table scans — so the timer sees
    the MAINTENANCE path, not a writer's predicate scan."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from indra_db_spark.plans.txlog import TxTable

    root = tempfile.mkdtemp(prefix="txlog_maint_probe_")
    times: list[float] = []
    try:
        tx = TxTable(spark, root)
        tx.append(events.select("event_id", "user_id", "event_type", "value"))
        churn_base = (
            events.select("event_id", "user_id", "event_type", "value")
            .limit(20_000)
            .localCheckpoint(eager=True)
        )
        for w in range(windows):
            before = set(tx.snapshot()[1])
            batch = churn_base.select(
                (
                    F.col("event_id") + F.lit(10_000_000_000 + w * 100_000_000)
                ).alias("event_id"),
                "user_id",
                "event_type",
                "value",
            )
            tx.append(batch.repartition(20))           # untimed: the churn
            cur, cur_files, txns, sch, cons, dv = tx._snapshot_full()
            fresh = sorted(set(cur_files) - before)
            matched = (
                tx._read_files(fresh, sch)
                .select(
                    F.col("_metadata.file_name").alias("file"),
                    F.col("_metadata.row_index").alias("pos"),
                )
                .filter(F.col("pos") % 50 == 0)
            )
            dv_names = tx._stage(matched, n_files=8)   # 8 sidecars/file
            dvmap = {**{f: list(lst) for f, lst in dv.items()},
                     **{f: list(dv_names) for f in fresh}}
            ok = tx._try_claim(
                cur + 1, cur_files, "dv_delete", txns, sch, cons, dvmap
            )
            assert ok, "maintain probe claim lost (single writer)"
            t0 = time.monotonic()
            done = tx.maintain(
                dv_sidecar_threshold=8, max_file_mb=16, small_min_files=16
            )
            times.append(time.monotonic() - t0)
            assert "materialize_dv" in done and "compact_small" in done, (
                f"window {w}: maintain ran {sorted(done)} — the crafted "
                "churn must trigger BOTH policies or the probe times a no-op"
            )
            print(
                f"probe txlog_maintain w={w}: {round(times[-1], 3)}",
                file=sys.stderr,
                flush=True,
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    times.sort()
    return {"txlog_maintain": round(times[len(times) // 2], 3)}


def _cold_point_probe(spark, factor: int) -> dict[str, float]:
    """Cold metadata cost vs SEGMENT count (r11 verdict next-round #6):
    the churn probe covers maintenance; this measures what a serving
    tier pays for a COLD point lookup — fresh TxTable handle (empty
    caches), raw-manifest read, segment-level pruning, then the admitted
    segments' resolution and the pruned scan.  Factor f probes 10·f
    segments (10/100/1000 at the default factors), each of 4
    hash-distributed files, with segment-tier membership blooms
    configured — so the expected shape is FLAT-ish wall time
    (O(admitted + one manifest parse), never O(segments) round trips),
    which the assertions pin structurally (seg_opens stays ~1 while the
    segment count grows 100×).  The table builds once per factor and is
    cached like the amplified inputs."""
    import shutil

    from pyspark.sql import functions as F

    import indra_db_spark.plans.txlog as txmod

    n_segments = 10 * factor
    root = os.path.join(CACHE, f"txlog_cold_s{n_segments}", "t")
    done = os.path.join(os.path.dirname(root), "_PROBE_DONE")
    n_files = n_segments * 4
    if not os.path.exists(done):
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        saved = (txmod.INLINE_MANIFEST_FILES, txmod.SEGMENT_TARGET_FILES)
        txmod.INLINE_MANIFEST_FILES = 0
        txmod.SEGMENT_TARGET_FILES = 4
        try:
            t = txmod.TxTable(spark, root)
            t.set_stats_columns(bloom=("k",))
            t.append(
                spark.range(0, n_files * 2)
                .select(F.col("id").alias("k"))
                .repartition(n_files, "k")
            )
        finally:
            txmod.INLINE_MANIFEST_FILES, txmod.SEGMENT_TARGET_FILES = saved
        open(done, "w").close()
    times: list[float] = []
    for _ in range(3):
        t0 = time.monotonic()
        cold = txmod.TxTable(spark, root)
        df, fr, ft = cold.skip_read(eq={"k": 37})
        n = df.count()
        times.append(time.monotonic() - t0)
        assert n == 1 and fr <= 4, (n, fr)
        # the structural pin: opens ∝ admitted segments, not the table
        assert cold.seg_opens <= 4, cold.seg_opens
    times.sort()
    print(
        f"probe txlog_cold_point segs={n_segments}: "
        f"{[round(x, 3) for x in times]}",
        file=sys.stderr,
        flush=True,
    )
    out = {"txlog_cold_point": round(times[len(times) // 2], 3)}

    # the round-13 unique-key path (r12 verdict next-round #2): a
    # key-ordered layout with plain RANGE stats (no blooms at all — a
    # unique key's segment union saturates at production budgets) must
    # stay flat too, with the segment-level range check doing the work:
    # _plan_segments packs the range-partitioned files in key-min order,
    # so seg_meta ranges are disjoint and a cold probe opens ~one segment
    root_o = os.path.join(CACHE, f"txlog_cold_ord_s{n_segments}", "t")
    done_o = os.path.join(os.path.dirname(root_o), "_PROBE_DONE")
    if not os.path.exists(done_o):
        shutil.rmtree(os.path.dirname(root_o), ignore_errors=True)
        saved = (txmod.INLINE_MANIFEST_FILES, txmod.SEGMENT_TARGET_FILES)
        txmod.INLINE_MANIFEST_FILES = 0
        txmod.SEGMENT_TARGET_FILES = 4
        try:
            t = txmod.TxTable(spark, root_o)
            t.set_stats_columns("k")
            t.append(
                spark.range(0, n_files * 2)
                .select(F.col("id").alias("k"))
                .repartitionByRange(n_files, "k")
            )
        finally:
            txmod.INLINE_MANIFEST_FILES, txmod.SEGMENT_TARGET_FILES = saved
        open(done_o, "w").close()
    times_o: list[float] = []
    for _ in range(3):
        t0 = time.monotonic()
        cold = txmod.TxTable(spark, root_o)
        df, fr, ft = cold.skip_read(eq={"k": 37})
        n = df.count()
        times_o.append(time.monotonic() - t0)
        assert n == 1 and fr <= 2, (n, fr)
        # disjoint seg ranges: opens ∝ range-admitted segments (~1)
        assert cold.seg_opens <= 2, cold.seg_opens
    times_o.sort()
    print(
        f"probe txlog_cold_point_ordered segs={n_segments}: "
        f"{[round(x, 3) for x in times_o]}",
        file=sys.stderr,
        flush=True,
    )
    out["txlog_cold_point_ordered"] = round(times_o[len(times_o) // 2], 3)
    return out


def _prune_cost_probe(spark, factor: int) -> dict[str, float]:
    """Driver-side prune COST envelope (r12 verdict next-round #4):
    skip_read's bloom probing is pure-Python dict work, so a
    MAX_LIST_LEN-ish 2000-value IN list against a 1000·factor-file
    manifest costs O(files × values × k) lookups — this measures that
    wall time and the admission ratio directly, against a manifest whose
    per-file word maps carry PRODUCTION load (~0.31: m=8192, ~850
    distinct keys per file, every word slot populated), the worst case
    for the short-circuit miss path.

    The table is 2 REAL files plus synthetic manifest entries (the fake
    files are never read: the probe values are crafted absent, so every
    file prunes and only the real schema carrier is opened — the probing
    code path is byte-for-byte the production one, only the file COUNT is
    synthetic).  Segment-tier blooms saturate exactly as a unique key
    does at scale (the per-segment OR-union blows the occupancy gate and
    is dropped), so the FILE tier takes the full probe load.  The probe
    budget is lifted for the measurement — the point is the unbudgeted
    cost curve the budget constant must be tuned against.  Reported per
    factor: cold (manifest+segments parse + probe) and warm (probe only,
    segments cached) wall seconds."""
    import shutil

    from pyspark.sql import functions as F

    import indra_db_spark.plans.txlog as txmod

    n_fake = 1000 * factor
    V = 2000
    m_bits, k_hashes = 8192, 3
    root = os.path.join(CACHE, f"prune_cost_f{n_fake}", "t")
    done = os.path.join(os.path.dirname(root), "_PROBE_DONE")
    if not os.path.exists(done):
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        saved = (txmod.INLINE_MANIFEST_FILES, txmod.SEGMENT_TARGET_FILES)
        txmod.INLINE_MANIFEST_FILES = 0
        txmod.SEGMENT_TARGET_FILES = 1024  # production segment size
        try:
            t = txmod.TxTable(spark, root)
            t.set_stats_columns(bloom=("k",), bloom_m=m_bits)
            t.append(
                spark.range(0, 4)
                .select(F.col("id").alias("k"))
                .repartition(2)
            )
            # synthetic per-file stats at production bloom load: every
            # word slot populated, ~31% of bits set (deterministic masks)
            import hashlib

            def _mask(i: int, w: int) -> int:
                h = hashlib.md5(f"{i}:{w}".encode()).digest()
                a = int.from_bytes(h[:8], "big")
                b = int.from_bytes(h[8:], "big")
                return a & b  # E[popcount] = 16/64 = 0.25 per word
            fakes = {
                # 'zz-' names sort AFTER the real uuid files, so the
                # schema-carrier fallback (first member of the first
                # segment) stays a real readable file
                f"zz-fake-{i:07d}.parquet": {
                    "n": 850,
                    "b": {
                        "k": [
                            m_bits,
                            k_hashes,
                            {
                                str(w): _mask(i, w)
                                for w in range(m_bits // 64)
                            },
                        ]
                    },
                }
                for i in range(n_fake)
            }
            cur, files, txns, schema, cons, dv = t._snapshot_full()
            t._pending_stats.update(fakes)
            ok = t._try_claim(
                cur + 1, files + sorted(fakes), "append", txns, schema,
                cons, dv,
            )
            assert ok, "prune-cost probe claim lost (single writer)"
        finally:
            txmod.INLINE_MANIFEST_FILES, txmod.SEGMENT_TARGET_FILES = saved
        open(done, "w").close()
    # absent probe values — but at production load a 2000-value list has
    # a ~1.6% per-value FPR, so nearly EVERY file is admitted by some
    # false positive (the admission ratio reported below IS the finding:
    # bloom IN-list pruning decays with list length; big pages need the
    # key-ordered range layout).  The admitted fakes must not be READ,
    # so the scan constructor is stubbed for the measurement — the
    # probing path up to the survivors list is byte-for-byte production.
    vals = list(range(10_000_000, 10_000_000 + V))
    saved_budget = txmod.SKIP_READ_PROBE_BUDGET
    saved_read = txmod.TxTable._read_files_dv
    txmod.SKIP_READ_PROBE_BUDGET = 1 << 62
    txmod.TxTable._read_files_dv = (
        lambda self, names, schema, dv, dv_rows=None: spark.range(0).select(
            F.col("id").alias("k")
        )
    )
    try:
        t = txmod.TxTable(spark, root)
        t0 = time.monotonic()
        _, fr, ft = t.skip_read(eq={"k": vals})
        cold = time.monotonic() - t0
        warms = []
        for _ in range(2):
            t0 = time.monotonic()
            _, fr, ft = t.skip_read(eq={"k": vals})
            warms.append(time.monotonic() - t0)
    finally:
        txmod.SKIP_READ_PROBE_BUDGET = saved_budget
        txmod.TxTable._read_files_dv = saved_read
    warm = min(warms)
    print(
        f"probe prune_cost files={ft} vals={V}: cold={round(cold, 3)} "
        f"warm={round(warm, 3)} admitted={fr}/{ft}",
        file=sys.stderr,
        flush=True,
    )
    return {
        "prune_cost_cold": round(cold, 3),
        "prune_cost_warm": round(warm, 3),
        "prune_admit_ratio": round(fr / ft, 5),
    }


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    # the 100x closure holds ~40M (child, anc) pairs in retained checkpoint
    # blocks; give the single local JVM room (the machine has 128 GiB —
    # callers can still override)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from indra_db_spark.session import get_spark

    spark = get_spark("scale-probe")
    os.makedirs(CACHE, exist_ok=True)

    from indra_db_spark.operators import similarity as S

    # input needs per op family: with SPARK_GRAFT_PROBE_OPS set, only the
    # inputs a selected op touches are amplified/built — a factor-1000
    # docs probe must not pay a 100M-row events amplification it never
    # reads (r7 verdict #6: the third-decade runs are per-family)
    EMB_OPS = {
        "emb_topk_exact", "srp_topk", "ivf_probe", "pq_build", "pq_adc",
        "ivfpq", "ivfpq_served", "label_centroids", "srp_neardup",
    }
    PROD_OPS = {"imi"}
    EDGE_OPS = {"closure_auto", "closure_dist", "triangles", "kcore",
                "labelprop", "bfs"}
    EVENT_OPS = {
        "asof_join", "band_join", "funnel", "cohort_retention",
        "hier_rollup", "kmv_distinct", "group_quantiles", "asof_skew",
        "asof_skew_chunked", "funnel_skew", "paths_skew",
        "paths_skew_chunked", "event_paths", "rate_anomaly", "attribution",
        "gapfill", "scd2", "pit_join", "rolling", "cooccur", "ab_daily",
        "feature_scale", "winsorized", "attribution_model", "skew_report",
    }
    TX_OPS = {"txlog_dv", "txlog_maintain"}
    # cold-open probe builds its own tiny txlog table — no corpus input
    COLD_OPS = {"txlog_cold_point"}
    # driver-side prune cost probe crafts its own synthetic manifest
    PRUNE_OPS = {"prune_cost"}

    results: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    only = {
        s for s in os.environ.get("SPARK_GRAFT_PROBE_OPS", "").split(",") if s
    }

    def _needs(group: set[str]) -> bool:
        return not only or bool(only & group)

    all_names: set[str] = set()  # filled from _ops keys on first factor
    # the DV read-amplification rows live outside _ops; keep them from
    # being treated as retired by the merge
    all_names.update(f"txlog_dv_s{s}" for s in DV_SIDECAR_COUNTS)
    all_names.add("txlog_maintain")
    all_names.add("txlog_cold_point")
    all_names.add("txlog_cold_point_ordered")
    all_names.update(
        {"prune_cost_cold", "prune_cost_warm", "prune_admit_ratio"}
    )
    for factor in factors:
        docs = emb = events = edges = emb_prod = None
        index = centers = None
        pq_artifacts = {"cb": None, "codes": None, "coarse": None}
        persisted = []
        # docs feed every op not in another family; build unless the
        # selection is entirely emb/edges/events/product
        if not only or (only - EMB_OPS - PROD_OPS - EDGE_OPS - EVENT_OPS
                        - TX_OPS - COLD_OPS - PRUNE_OPS):
            docs = _amplified(spark, "documents", factor, _docs_x)
            docs.count()
        if _needs(EMB_OPS):
            emb = _amplified(spark, "embeddings", factor, _emb_x)
            emb.count()
        if _needs(EMB_OPS - {"srp_neardup"}):
            # IVF index + PQ artifacts built ONCE per corpus (untimed:
            # index construction is a build-time cost; the probe is what
            # runs per query batch) — skipped when only the SRP probe
            # touches the isotropic corpus
            centers = S.ivf_train_centroids(emb, nlist=16)
            index = S.ivf_build_index(emb, centers).persist()
            index.count()
            from indra_db_spark.operators import pq as _PQ
            _cb = _PQ.pq_train(emb, m=16, k=16, rounds=2).persist()
            _codes = _PQ.pq_encode(emb, _cb, m=16).persist()
            _codes.count()
            pq_artifacts = {
                "cb": _cb,
                "codes": _codes,
                "coarse": _PQ.coarse_cells_from_seeds(emb, 8).persist(),
            }
            persisted += [index, _cb, _codes, pq_artifacts["coarse"]]
            if _needs({"ivfpq_served"}):
                # the served layout: production cell sizing ncell ≈ √N
                # (the FAISS rule), index materialized ONCE per corpus and
                # cached like the amplified inputs — query batches are
                # what the probe times
                n_emb = emb.count()
                ncell_scaled = max(8, min(4096, math.isqrt(n_emb)))
                served_path = os.path.join(
                    CACHE, f"ivfpq_index_x{factor}_c{ncell_scaled}"
                )
                # completion marker: a crash mid-build leaves a partial
                # index dir that plain exists() would happily reuse,
                # corrupting the served timing on the next run
                done = os.path.join(served_path, "_PROBE_DONE")
                if not os.path.exists(done):
                    import shutil as _sh

                    _sh.rmtree(served_path, ignore_errors=True)
                    _PQ.ivfpq_write_index(
                        emb, served_path, ncell=ncell_scaled, m=16, k=16
                    )
                    open(done, "w").close()
                pq_artifacts["served_path"] = served_path
        if _needs(PROD_OPS):
            emb_prod = _amplified(spark, "emb_product", factor, _emb_product)
            emb_prod.count()
        if _needs(EVENT_OPS) or _needs(TX_OPS):
            events = _amplified(spark, "events", factor, _events_x)
            events.count()
        if _needs(EDGE_OPS):
            edges = _tree_edges(spark, factor).localCheckpoint(eager=True)
        timings: dict[str, float] = {}
        for name, build in _ops(spark, docs, emb, edges, index, centers,
                                events, pq_artifacts, emb_prod,
                                factor).items():
            all_names.add(name)
            if only and name not in only:
                continue
            # one op blowing up at high amplification (e.g. an executor OOM)
            # must not void the whole probe: record the failure and move on
            try:
                build().write.mode("overwrite").format("noop").save()  # warm
                best = float("inf")
                for _ in range(2):
                    t0 = time.monotonic()
                    build().write.mode("overwrite").format("noop").save()
                    best = min(best, time.monotonic() - t0)
                timings[name] = round(best, 3)
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                errors[f"{name}@x{factor}"] = msg
                print(f"ERROR {name}@x{factor}: {msg}", file=sys.stderr)
            print(
                f"probe x{factor} {name}: {timings.get(name, 'ERROR')}",
                file=sys.stderr,
                flush=True,
            )
        for frame in persisted:
            frame.unpersist()
        if _needs({"txlog_dv"}):
            # same one-op-must-not-void-the-run rule as the _ops loop
            try:
                timings.update(_dv_probe(spark, events))
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                errors[f"txlog_dv@x{factor}"] = msg
                print(f"ERROR txlog_dv@x{factor}: {msg}", file=sys.stderr)
        if _needs({"txlog_maintain"}):
            try:
                timings.update(_maintain_probe(spark, events))
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                errors[f"txlog_maintain@x{factor}"] = msg
                print(
                    f"ERROR txlog_maintain@x{factor}: {msg}", file=sys.stderr
                )
        if _needs({"txlog_cold_point"}):
            try:
                timings.update(_cold_point_probe(spark, factor))
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                errors[f"txlog_cold_point@x{factor}"] = msg
                print(
                    f"ERROR txlog_cold_point@x{factor}: {msg}",
                    file=sys.stderr,
                )
        if _needs({"prune_cost"}):
            try:
                timings.update(_prune_cost_probe(spark, factor))
            except Exception as e:  # noqa: BLE001
                msg = str(e).splitlines()[0][:200] if str(e) else type(e).__name__
                print(f"ERROR prune_cost@x{factor}: {msg}", file=sys.stderr)
                errors[f"prune_cost@x{factor}"] = msg
        results[str(factor)] = timings

    # partial runs (SPARK_GRAFT_PROBE_OPS) merge into the existing probe
    # file instead of clobbering the other operators' measurements
    out_path = os.path.join(ROOT, "SCALE_PROBE.json")
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            for fct, t in prev.get("timings_s", {}).items():
                # retired ops (no longer in _ops) drop out of the merged
                # report — a probe row nobody can re-run is stale evidence
                merged = {
                    op: v for op, v in t.items()
                    if not all_names or op in all_names
                }
                merged.update(results.get(fct, {}))
                results[fct] = merged
            for k, v in prev.get("errors", {}).items():
                op, fct = k.rsplit("@x", 1)
                if op not in results.get(fct, {}):
                    errors.setdefault(k, v)
        except (json.JSONDecodeError, OSError):
            pass
    errors = {
        k: v
        for k, v in errors.items()
        if k.rsplit("@x", 1)[0] not in results.get(k.rsplit("@x", 1)[1], {})
    }

    # slopes are recomputed from the MERGED timings (not just this run's
    # factors), PER OP over the factor range that op was actually probed
    # at — so extending only the heaviest families a third decade
    # (r7 verdict #6) cannot wipe the other operators' recorded slopes,
    # and a single-factor partial re-run updates estimates instead of
    # clobbering them
    slopes = {}
    merged_factors = sorted(int(f) for f in results if results.get(f))
    all_ops = {op for t in results.values() for op in t}
    for op in sorted(all_ops):
        fs = [f for f in merged_factors if op in results.get(str(f), {})]
        if len(fs) < 2:
            continue
        lo, hi = str(min(fs)), str(max(fs))
        ratio = math.log(max(fs) / min(fs))
        t_lo, t_hi = results[lo][op], results[hi][op]
        # subtract nothing: fixed overhead makes slopes UNDER-estimate,
        # so a slope ≤ 1 is conservative evidence of linearity
        slopes[op] = round(
            math.log(max(t_hi, 1e-9) / max(t_lo, 1e-9)) / ratio, 3
        )

    payload = {
        "metric": "scale_probe",
        "sf_dir": SF_DIR,
        "factors": merged_factors or factors,
        "timings_s": results,
        "loglog_slope": slopes,
    }
    if errors:
        payload["errors"] = errors
    with open(os.path.join(ROOT, "SCALE_PROBE.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
