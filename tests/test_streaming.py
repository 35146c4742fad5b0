"""Streaming parity tests: each streaming transformation drained with the
available-now trigger must equal the same function applied to a static read
of the identical files (unified-API oracle)."""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from indra_db_spark.sources.lake import load_table
from indra_db_spark.streaming.ingest import (
    read_stream,
    run_to_memory_sink,
    sessionize,
    stream_dedup,
    windowed_counts,
)


@pytest.fixture(scope="module")
def event_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 30)
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


@pytest.fixture(scope="module")
def batch_events(spark, event_dir):
    return spark.read.parquet(event_dir)


def _counter(df):
    return Counter(tuple(r) for r in df.collect())


def test_windowed_counts_stream_matches_batch(spark, event_dir, batch_events):
    stream = read_stream(
        spark, event_dir, batch_events.schema, max_files_per_trigger=2
    )
    got = run_to_memory_sink(
        windowed_counts(stream), "wc_sink", output_mode="complete"
    )
    want = windowed_counts(batch_events)
    assert _counter(got) == _counter(want)
    assert got.schema == want.schema


def test_sessionize_stream_matches_batch(spark, event_dir, batch_events):
    stream = read_stream(spark, event_dir, batch_events.schema)
    got = run_to_memory_sink(
        sessionize(stream), "sess_sink", output_mode="complete"
    )
    want = sessionize(batch_events)
    assert _counter(got) == _counter(want)


def test_stream_dedup(spark, event_dir, batch_events):
    # duplicate every file's rows by reading the dir twice via union source
    stream = read_stream(spark, event_dir, batch_events.schema)
    doubled = stream.unionByName(stream)
    got = run_to_memory_sink(
        stream_dedup(doubled, ("event_id",)), "dedup_sink", output_mode="append"
    )
    want = batch_events.dropDuplicates(["event_id", "ts"])
    assert got.count() == want.count()


def test_stateful_running_totals(spark, event_dir, batch_events):
    from pyspark.sql import functions as F

    from indra_db_spark.streaming.stateful import running_totals

    stream = read_stream(
        spark, event_dir, batch_events.schema, max_files_per_trigger=1
    )
    q = (
        running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # the row with the highest cumulative count per key is the final state
    # (collect order across micro-batches is not contractual)
    final = {}
    for r in spark.table("running_sink").collect():
        if r.key not in final or r.n_events > final[r.key][0]:
            final[r.key] = (r.n_events, r.total_value)
    want = {
        r.event_type: (r.n, float(r.total))
        for r in batch_events.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    got_counts = {k: v[0] for k, v in final.items()}
    want_counts = {k: v[0] for k, v in want.items()}
    assert got_counts == want_counts
    for k in want:
        assert abs(final[k][1] - want[k][1]) < 1e-6 * max(1.0, abs(want[k][1]))


def test_text_gates_stream_matches_batch(spark, tmp_path_factory):
    """The stateless document gates (Gopher rules, split assignment) applied
    to a readStream equal the batch computation — the unified-API proof that
    the corpus-filter stage runs incrementally over daily document drops."""
    from indra_db_spark.operators.text import gopher_rules, split_assign

    path = str(tmp_path_factory.mktemp("docs_stream"))
    # write a small doc corpus as the "daily drop"
    batch = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch.coalesce(2).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path)

    stream = read_stream(spark, path, static.schema)
    got_gopher = _counter(
        run_to_memory_sink(gopher_rules(stream), "gates_gopher")
    )
    want_gopher = _counter(gopher_rules(static))
    assert got_gopher == want_gopher and got_gopher

    got_split = _counter(run_to_memory_sink(split_assign(stream), "gates_split"))
    assert got_split == _counter(split_assign(static))


def test_incremental_new_docs_stream_matches_batch(spark, tmp_path):
    import pandas as pd
    from indra_db_spark.streaming.ingest import (
        incremental_new_docs,
        read_stream,
        run_to_memory_sink,
    )

    # corpus knows fingerprints of texts "known-0".."known-4"
    known = spark.createDataFrame(
        [(f"known-{i}",) for i in range(5)], ["text"]
    ).select(F.md5("text").alias("fp"))
    # arriving batch: 3 genuinely new texts (one duplicated in-stream),
    # 2 already-known texts
    rows = [
        (1, "fresh-a"), (2, "fresh-b"), (3, "fresh-a"),
        (4, "known-1"), (5, "known-3"), (6, "fresh-c"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        pdf["doc_id"], unit="m"
    )
    path = tmp_path / "docs_stream"
    path.mkdir()
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(path)
    )

    static = spark.read.parquet(str(path))
    batch_out = incremental_new_docs(static, known, ts_col="ts")
    stream = read_stream(
        spark, str(path), static.schema, max_files_per_trigger=1
    )
    # a streaming input without an event-time column must be refused —
    # unbounded dedup state otherwise
    import pytest

    with pytest.raises(ValueError, match="watermark"):
        incremental_new_docs(stream, known)
    stream_out = run_to_memory_sink(
        incremental_new_docs(stream, known, ts_col="ts"), "inc_docs"
    )

    got_b = sorted(r.text for r in batch_out.collect())
    got_s = sorted(r.text for r in stream_out.collect())
    assert got_b == ["fresh-a", "fresh-b", "fresh-c"]
    assert got_s == got_b


def test_lm_scoring_stream_matches_batch(spark, tmp_path_factory):
    """Train the bigram LM in batch, score a readStream of documents
    against it — the CCNet train-offline / score-the-crawl deployment.
    Integer micro-units make stream and batch results identical, and
    scoring the training corpus itself must reproduce the self-trained
    bigram_lm_score bit-for-bit."""
    from indra_db_spark.operators.text import (
        bigram_lm_score,
        score_docs_with_lm,
        train_bigram_lm,
    )

    path = str(tmp_path_factory.mktemp("docs_lm_stream"))
    batch = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch.coalesce(2).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path)

    model = train_bigram_lm(static)
    want = {
        r.doc_id: (r.n_bigrams, r.sum_p_micro, r.rare_bigrams)
        for r in bigram_lm_score(static).collect()
    }
    # batch scoring against the trained model == self-trained scoring
    got_batch = {
        r.doc_id: (r.n_bigrams, r.sum_p_micro, r.rare_bigrams)
        for r in score_docs_with_lm(static, model).collect()
    }
    assert got_batch == want

    # stream scoring == batch scoring (complete mode: per-doc aggregate)
    stream = read_stream(spark, path, static.schema)
    got_stream = {
        r.doc_id: (r.n_bigrams, r.sum_p_micro, r.rare_bigrams)
        for r in run_to_memory_sink(
            score_docs_with_lm(stream, model), "lm_stream", "complete"
        ).collect()
    }
    assert got_stream == want


def test_keyword_scoring_stream_matches_batch(spark, tmp_path_factory):
    """Index-once / score-the-stream keyword search: frozen corpus stats
    baked into a pure per-row expression (no stream-static join), append
    mode.  Batch scoring must reproduce keyword_search's scores."""
    from indra_db_spark.operators.text import (
        corpus_search_stats,
        keyword_score,
        keyword_search,
    )

    terms = ["query", "window", "stream"]
    path = str(tmp_path_factory.mktemp("docs_kw_stream"))
    batch = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch.coalesce(2).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path)

    stats = corpus_search_stats(static, terms)
    want = {
        r.doc_id: r.score_micro for r in keyword_score(static, terms, stats).collect()
    }
    # parity with the self-contained entry (same scores, top-k cut aside)
    topk = keyword_search(static, terms, k=10).collect()
    assert all(want[r.doc_id] == r.score_micro for r in topk)

    stream = read_stream(spark, path, static.schema)
    got = {
        r.doc_id: r.score_micro
        for r in run_to_memory_sink(
            keyword_score(stream, terms, stats), "kw_stream"
        ).collect()
    }
    assert got == want and got


def test_stream_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """The incremental-ingestion durability story: a file-source stream
    with a checkpointLocation processes a first batch of files, STOPS,
    new files land, and a restarted query processes ONLY the new files —
    the daily-drop update run surviving a process restart without
    reprocessing or loss."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    os.makedirs(src)

    spark.range(0, 100).withColumn("batch", F.lit("day1")).coalesce(
        1
    ).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(sink).count() == 100

    # second drop lands while the query is DOWN
    spark.range(100, 150).withColumn("batch", F.lit("day2")).coalesce(
        1
    ).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(sink)
    # exactly-once: 150 total, no duplicates of day1
    assert got.count() == 150
    assert got.select("id").distinct().count() == 150
    # a third restart with no new data writes nothing new
    run_once()
    assert spark.read.parquet(sink).count() == 150


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """The applyInPandasWithState funnel replayed over time-ordered file
    drops equals the batch funnel — per-user state machine parity,
    including the conversion-window variant."""
    import os
    import time

    from indra_db_spark.operators.analytics import funnel
    from indra_db_spark.streaming.stateful import streaming_funnel

    steps = ["signup", "click", "purchase"]
    batch = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts", "event_type")
    )
    # three time-sliced drops with ascending mtimes: the file source
    # processes them oldest-first, so per-user event order across
    # micro-batches follows event time (the in-order contract)
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    qs = batch.select(
        F.percentile_approx(us, [0.33, 0.66]).alias("p")
    ).collect()[0].p
    cuts = [None, *qs, None]
    path = str(tmp_path / "drops")
    os.makedirs(path)
    for i in range(3):
        part = batch
        if cuts[i] is not None:
            part = part.filter(us > cuts[i])
        if cuts[i + 1] is not None:
            part = part.filter(us <= cuts[i + 1])
        part.coalesce(1).write.mode("overwrite").parquet(f"{path}/d{i}")
        # one file per drop dir -> move into the watched dir with mtimes
        # in slice order
        src = [f for f in os.listdir(f"{path}/d{i}") if f.endswith(".parquet")][0]
        dst = f"{path}/slice{i}.parquet"
        os.rename(f"{path}/d{i}/{src}", dst)
        os.utime(dst, (time.time() - 300 + i * 60,) * 2)

    for within in (None, 86400 * 3):
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )
        name = f"funnel_sink_{within or 0}"
        q = (
            streaming_funnel(stream, steps, within_seconds=within)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # latest emission per user = most completed steps (monotone)
        got = {}
        for r in spark.table(name).collect():
            if r.user not in got or r.n_steps >= got[r.user].n_steps:
                got[r.user] = r
        want = {
            r.user_id: r
            for r in funnel(batch, steps, within_seconds=within).collect()
        }
        assert set(got) == set(want)
        for u, w in want.items():
            g = got[u]
            assert (g.s1_ts, g.s2_ts, g.s3_ts) == (
                w.s1_ts, w.s2_ts, w.s3_ts,
            ), (u, within)


def test_classifier_scoring_stream_matches_batch(spark, tmp_path_factory):
    """Train the quality classifier in batch, score a readStream against
    the frozen weight table — the fastText/DCLM train-offline /
    score-the-crawl deployment.  Integer posteriors make stream and batch
    results identical."""
    from indra_db_spark.operators.classify import (
        score_with_classifier,
        train_polarity_classifier,
    )

    path = str(tmp_path_factory.mktemp("docs_cf_stream"))
    batch = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch.coalesce(2).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path)

    model = train_polarity_classifier(
        static.withColumn("label", (F.col("lang") == "en").cast("int")),
        n_buckets=4096,
    )
    want = {
        r.doc_id: (r.n_tokens, r.sum_w_micro, r.score_micro, r.keep)
        for r in score_with_classifier(static, model).collect()
    }
    stream = read_stream(spark, path, static.schema)
    got = {
        r.doc_id: (r.n_tokens, r.sum_w_micro, r.score_micro, r.keep)
        for r in run_to_memory_sink(
            score_with_classifier(stream, model), "cf_stream", "complete"
        ).collect()
    }
    assert got == want


def test_pq_encode_stream_matches_batch(spark, tmp_path_factory):
    """PQ index maintenance on the ingest stream: encoding a readStream
    of embeddings against the frozen codebook (min-struct argmin) must
    equal the batch encoder (window argmin) row for row — integer
    distances with (distance, centroid) tie-break make both exact."""
    from indra_db_spark.operators.pq import (
        pq_encode,
        pq_encode_streaming,
        pq_train,
    )

    path = str(tmp_path_factory.mktemp("emb_pq_stream"))
    batch = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    batch.coalesce(2).write.mode("overwrite").parquet(path)
    static = spark.read.parquet(path)

    m = 16
    cb = pq_train(static, m=m, k=16, rounds=2)
    want = sorted(
        (r.id, r.s, r.code) for r in pq_encode(static, cb, m=m).collect()
    )
    # the streaming-safe formulation must agree on a static frame...
    got_static = sorted(
        (r.id, r.s, r.code)
        for r in pq_encode_streaming(static, cb, m=m).collect()
    )
    assert got_static == want
    # ...and on an actual readStream of the same files
    stream = read_stream(spark, path, static.schema)
    got_stream = sorted(
        (r.id, r.s, r.code)
        for r in run_to_memory_sink(
            pq_encode_streaming(stream, cb, m=m), "pq_stream", "complete"
        ).collect()
    )
    assert got_stream == want


def test_interval_attribution_stream_matches_batch(
    spark, event_dir, batch_events
):
    """Stream-stream watermarked interval join == the same function on
    static frames (two independent readStream sources over the same files,
    inner join ⇒ append mode)."""
    from indra_db_spark.streaming.ingest import interval_attribution

    def split(df):
        return (
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        )

    want = _counter(interval_attribution(*split(batch_events)))
    assert sum(want.values()) > 0, "fixture must produce matched pairs"
    touches = read_stream(spark, event_dir, batch_events.schema)
    convs = read_stream(spark, event_dir, batch_events.schema)
    got = _counter(
        run_to_memory_sink(
            interval_attribution(split(touches)[0], split(convs)[1]),
            "attr_sink",
            output_mode="append",
        )
    )
    assert got == want
