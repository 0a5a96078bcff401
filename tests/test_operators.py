"""Tests for operators without a DuckDB oracle: IVF ANN recall vs brute
force, multimodal decode plumbing, and the Structured-Streaming twin of
the w1 window aggregation (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_ann_ivf_structure_and_recall(spark):
    from crawler_spark.operators.similarity import N_QUERIES, TOP_K, ann_ivf
    from crawler_spark.queries import all_queries

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    approx = ann_ivf(spark, emb, n_centroids=16, nprobe=8).collect()
    assert len(approx) == N_QUERIES * TOP_K
    per_q = {}
    for r in approx:
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rows in per_q.items():
        assert [r.rank for r in sorted(rows, key=lambda x: x.rank)] == list(
            range(1, TOP_K + 1)
        )
        assert all(r.vec_id != qid for r in rows)
    # recall vs the exact brute-force top-k (random vectors → centroids
    # are weak, but probing half the buckets must recover a decent share)
    brute = all_queries()["ann_brute_topk"].run(spark, SF_DIR).collect()
    bset = {(r.query_id, r.vec_id) for r in brute}
    aset = {(r.query_id, r.vec_id) for r in approx}
    recall = len(aset & bset) / len(bset)
    assert recall >= 0.3, f"IVF recall too low: {recall}"
    # scores are true cosines: approx scores can never exceed brute max
    bmax = max(r.cos_sim for r in brute)
    assert all(r.cos_sim <= bmax + 1e-9 for r in approx)


def test_embedding_lsh_recall_and_precision(spark):
    """Random-hyperplane LSH near-dup (the scale path of
    dedup_embedding_cosine): every emitted pair must also be a true
    brute-force pair at the same threshold (exact confirm ⇒ perfect
    precision), and recall at 8 bands × 4 bits must clear a floor."""
    from crawler_spark.queries import all_queries

    qs = all_queries()
    lsh = {
        (r.vec_a, r.vec_b)
        for r in qs["dedup_embedding_lsh"].run(spark, SF_DIR).collect()
    }
    brute = {
        (r.vec_a, r.vec_b)
        for r in qs["dedup_embedding_cosine"].run(spark, SF_DIR).collect()
    }
    assert lsh <= brute, "LSH emitted a pair brute force rejects"
    recall = len(lsh) / len(brute)
    assert recall >= 0.55, f"embedding-LSH recall too low: {recall:.3f}"


def test_mm_decode_plumbing(spark):
    from crawler_spark.operators.multimodal import (
        decode_batches,
        documents_as_payload,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = decode_batches(documents_as_payload(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    r0 = next(r for r in rows if r.decode_ok)
    assert len(r0.feature) == 8
    assert all(0.0 <= x <= 1.0 for x in r0.feature)
    # determinism: same payload → same features
    again = {r.doc_id: r.feature for r in out.collect()}
    for r in rows:
        assert again[r.doc_id] == r.feature
    # null payloads are quarantined, not crashed
    null_df = spark.createDataFrame(
        [(999999, None)], "doc_id long, payload binary"
    )
    nr = decode_batches(null_df).collect()[0]
    assert nr.decode_ok is False and nr.feature is None


@pytest.mark.slow
def test_streaming_window_agg_matches_batch(spark, tmp_path):
    """§2.9: the same 5-minute windowed aggregation expressed as a
    Structured Streaming query over the events table must produce the
    batch w1 result (availableNow over a file source, memory sink)."""
    import os
    import shutil

    # stage the events parquet as a streaming source directory
    src = str(tmp_path / "events_stream")
    os.makedirs(src, exist_ok=True)
    p = f"{SF_DIR}/events.parquet"
    if os.path.isdir(p):
        shutil.copytree(p, src, dirs_exist_ok=True)
    else:
        shutil.copy(p, os.path.join(src, "events.parquet"))

    batch_df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    schema = batch_df.schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.unix_timestamp("window.start").alias("bucket_s"),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("w1_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.bucket_s, r.event_type): (r.n, r.total_value)
            for r in spark.sql("SELECT * FROM w1_stream").collect()
        }
    finally:
        q.stop()
    from crawler_spark.queries import all_queries

    exp = {
        (r.bucket_s, r.event_type): (r.n, r.total_value)
        for r in all_queries()["w1_window_agg"].run(spark, SF_DIR).collect()
    }
    assert got == exp


def test_streaming_hopping_window_matches_batch(spark, tmp_path):
    """§2.9: the hopping-window (10 min / 5 min slide) streaming agg
    must produce the batch w3_hopping_window result."""
    import os
    import shutil

    from crawler_spark.streaming import hopping_event_agg

    src = str(tmp_path / "events_hop")
    os.makedirs(src, exist_ok=True)
    p = f"{SF_DIR}/events.parquet"
    if os.path.isdir(p):
        shutil.copytree(p, src, dirs_exist_ok=True)
    else:
        shutil.copy(p, os.path.join(src, "events.parquet"))

    batch_df = spark.read.parquet(p)
    stream = hopping_event_agg(
        spark.readStream.schema(batch_df.schema).parquet(src)
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("w3_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.ws: (r.n_events, r.value_cents)
            for r in spark.sql("SELECT * FROM w3_stream").collect()
        }
    finally:
        q.stop()
    from crawler_spark.queries import all_queries

    exp = {
        r.ws: (r.n_events, r.value_cents)
        for r in all_queries()["w3_hopping_window"].run(spark, SF_DIR).collect()
    }
    assert got == exp


def test_streaming_session_window_matches_batch_w2(spark, tmp_path):
    """§2.9: native session_window streaming sessionization must
    reproduce the batch w2 sessions (same starts, counts, sums). A
    far-future sentinel event advances the global watermark so every
    real session closes and is emitted in append mode."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from crawler_spark.streaming import sessionized_event_agg

    src = str(tmp_path / "events_sess")
    os.makedirs(src, exist_ok=True)
    p = f"{SF_DIR}/events.parquet"
    if os.path.isdir(p):
        shutil.copytree(p, src, dirs_exist_ok=True)
    else:
        shutil.copy(p, os.path.join(src, "events.parquet"))

    batch_df = spark.read.parquet(p)
    real_max_ms = batch_df.agg(
        F.unix_millis(F.max("ts").cast("timestamp"))
    ).collect()[0][0]

    stream = sessionized_event_agg(
        spark.readStream.schema(batch_df.schema).parquet(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("w2_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        # flush the tail: one sentinel event 2h past the end pushes the
        # watermark beyond every real session's close
        row = batch_df.orderBy(F.col("ts").desc()).limit(1).collect()[0]
        import datetime as _dt

        sent_row = [
            (
                10**9,
                row.ts + _dt.timedelta(hours=2),
                -1,
                "sentinel",
                0.0,
                "{}",
            )
        ]
        spark.createDataFrame(sent_row, batch_df.schema).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = {
            (r.user_id, r.session_start_ms): (r.n_events, r.total_value)
            for r in spark.sql("SELECT * FROM w2_stream").collect()
            if r.session_start_ms <= real_max_ms and r.user_id != -1
        }
    finally:
        q.stop()

    from crawler_spark.queries import all_queries

    exp = {
        (r.user_id, r.session_start_ms): (r.n_events, r.total_value)
        for r in all_queries()["w2_sessionize"].run(spark, SF_DIR).collect()
    }
    assert got == exp


def test_stateful_running_totals(spark, tmp_path):
    """§2.9 custom stateful operator: applyInPandasWithState running
    totals over the events stream must converge to the batch groupBy."""
    import os
    import shutil

    from crawler_spark.streaming import running_totals_stateful

    src = str(tmp_path / "ev")
    os.makedirs(src, exist_ok=True)
    p = f"{SF_DIR}/events.parquet"
    if os.path.isdir(p):
        shutil.copytree(p, src, dirs_exist_ok=True)
    else:
        shutil.copy(p, os.path.join(src, "events.parquet"))

    batch_df = spark.read.parquet(p)
    stream = spark.readStream.schema(batch_df.schema).parquet(src)
    q = (
        running_totals_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("run_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT event_type, max(n_events) n, max(total_value) v "
            "FROM run_totals GROUP BY event_type"
        ).collect()
    finally:
        q.stop()
    got = {r.event_type: (r.n, round(r.v, 4)) for r in rows}
    exp = {
        r.event_type: (r.n, round(r.v, 4))
        for r in batch_df.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == exp


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation on a known topology: a 5-node chain (needs
    multiple propagation rounds — label must travel the diameter), one
    triangle, and isolated singletons."""
    from crawler_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        # chain 10-11-12-13-14; triangle 20-21-22 (one redundant edge)
        [(11, 10), (11, 12), (12, 13), (13, 14),
         (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [10, 11, 12, 13, 14, 20, 21, 22, 30, 31]],
        "doc_id long",
    )
    got = {
        r.doc_id: r.comp_id
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
                   20: 20, 21: 20, 22: 20, 30: 30, 31: 31}


def test_gopher_and_source_stats_null_and_empty_text_parity(spark, tmp_path):
    """Cross-engine edge cases the sf corpora never hit: a zero-word
    document (DuckDB list_sum([]) is NULL, Spark's fold is 0) and NULL
    text (count(*) vs count(text) in the dup audit) must agree."""
    import duckdb

    from crawler_spark.operators import textstats

    rows = [
        (1, "the quick brown fox and the hound of it on a to is that", "en", "s0", 56),
        (2, "", "en", "s0", 0),                      # zero words
        (3, None, "en", "s0", None),                 # NULL text
        (4, "the quick brown fox and the hound of it on a to is that", "en", "s0", 56),  # exact dup of 1
        (5, "!!! ???", "und", "s1", 7),              # words with no alpha
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(p)
    sdocs = spark.read.parquet(p)
    sdocs.createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    try:
        for sql_s, sql_d in (
            (textstats.gopher_rules_spark(), textstats.gopher_rules_duck()),
            (textstats.SOURCE_STATS_SPARK, textstats.SOURCE_STATS_DUCK),
        ):
            got = {tuple(r) for r in spark.sql(sql_s).collect()}
            exp = {tuple(r) for r in con.execute(sql_d).fetchall()}
            assert got == exp, (got, exp)
        # the dup audit itself: source s0 has 3 non-null texts, 2 distinct
        stats = {r.source: r.n_dup_docs for r in spark.sql(textstats.SOURCE_STATS_SPARK).collect()}
        assert stats["s0"] == 1 and stats["s1"] == 0
    finally:
        spark.catalog.dropTempView("documents")


def test_stateful_url_seen_dedup(spark, tmp_path):
    """§2.9/J4 streaming twin: applyInPandasWithState URL-seen emits
    every url exactly once ACROSS micro-batches — re-discoveries in a
    later batch are dropped against checkpointed per-host state."""
    import os

    import pandas as pd

    src = str(tmp_path / "urls")
    os.makedirs(src, exist_ok=True)
    b0 = pd.DataFrame(
        {
            "host": ["a.com", "a.com", "b.com"],
            "url": ["http://a.com/1", "http://a.com/2", "http://b.com/1"],
        }
    )
    # batch 1 re-discovers a.com/2 and b.com/1, adds two new urls
    b1 = pd.DataFrame(
        {
            "host": ["a.com", "b.com", "b.com", "a.com"],
            "url": [
                "http://a.com/2",
                "http://b.com/1",
                "http://b.com/2",
                "http://a.com/3",
            ],
        }
    )
    spark.createDataFrame(b0).coalesce(1).write.parquet(f"{src}/d=0")
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/d=1")

    from crawler_spark.streaming import url_seen_dedup_stateful

    schema = spark.read.parquet(f"{src}/d=0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/d=*")
    )
    q = (
        url_seen_dedup_stateful(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("url_seen")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT host, url FROM url_seen").collect()
    finally:
        q.stop()
    got = sorted((r.host, r.url) for r in rows)
    want = sorted(
        set(zip(b0["host"], b0["url"])) | set(zip(b1["host"], b1["url"]))
    )
    # exactly once: no url appears twice, and the union is complete
    assert got == want


def test_stateful_url_seen_restart_from_checkpoint(spark, tmp_path):
    """§2.9 restart-recovery contract (VERDICT r3 #4): the batch engine
    proves kill/resume via its manifest (test_resume.py); this is the
    streaming twin. Stop the URL-seen stream after batch 1, deliver two
    more batches full of re-discoveries, restart the SAME query against
    the same checkpoint dir and a fault-tolerant file sink, and the
    append output must still be exactly-once: every distinct url
    exactly one row — no double-emit of batch-1 urls (sink replay) and
    no re-emission of re-discovered urls (state loss) — then a third
    restart with no new data appends nothing."""
    import os

    import pandas as pd

    from crawler_spark.streaming import url_seen_dedup_stateful

    src = str(tmp_path / "urls")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    b0 = pd.DataFrame(
        {
            "host": ["a.com", "a.com", "b.com"],
            "url": ["http://a.com/1", "http://a.com/2", "http://b.com/1"],
        }
    )
    # later batches re-discover every b0 url and add three new ones
    b1 = pd.DataFrame(
        {
            "host": ["a.com", "b.com", "b.com"],
            "url": ["http://a.com/2", "http://b.com/1", "http://b.com/2"],
        }
    )
    b2 = pd.DataFrame(
        {
            "host": ["a.com", "a.com", "b.com"],
            "url": ["http://a.com/1", "http://a.com/3", "http://b.com/3"],
        }
    )
    spark.createDataFrame(b0).coalesce(1).write.parquet(f"{src}/d=0")
    schema = spark.read.parquet(f"{src}/d=0").schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/d=*")
        )
        return (
            url_seen_dedup_stateful(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # run 1: batch 0 only, then stop (the "kill")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # new discoveries arrive while the stream is down
    spark.createDataFrame(b1).coalesce(1).write.parquet(f"{src}/d=1")
    spark.createDataFrame(b2).coalesce(1).write.parquet(f"{src}/d=2")

    # run 2: restart from the same checkpoint
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.read.parquet(out).collect()
    got = sorted((r.host, r.url) for r in rows)
    want = sorted(
        set(zip(b0["host"], b0["url"]))
        | set(zip(b1["host"], b1["url"]))
        | set(zip(b2["host"], b2["url"]))
    )
    assert got == want, "restart broke exactly-once emission"

    # run 3: nothing new — restart must append zero rows
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(
        (r.host, r.url) for r in spark.read.parquet(out).collect()
    ) == want


def test_stateful_politeness_rate_limit(spark, tmp_path):
    """§2.9/O3 streaming twin: per-host budget of k urls per trigger,
    overflow carried as FIFO backlog in state and drained later —
    exactly-once release, never more than k per (host, trigger)."""
    import os

    import pandas as pd

    src = str(tmp_path / "disc")
    os.makedirs(src, exist_ok=True)
    files = [
        # trigger 1: host a discovers 4 urls at once, b discovers 1
        pd.DataFrame(
            {
                "host": ["a.com"] * 4 + ["b.com"],
                "url": [f"http://a.com/{i}" for i in range(4)]
                + ["http://b.com/0"],
            }
        ),
        # triggers 2 and 3: one more discovery each, so both hosts keep
        # being invoked and the backlog drains
        pd.DataFrame(
            {"host": ["a.com", "b.com"],
             "url": ["http://a.com/4", "http://b.com/1"]}
        ),
        pd.DataFrame(
            {"host": ["a.com", "b.com"],
             "url": ["http://a.com/5", "http://b.com/2"]}
        ),
    ]
    for i, pdf in enumerate(files):
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{src}/d={i}")

    from crawler_spark.streaming import politeness_rate_limit_stateful

    schema = spark.read.parquet(f"{src}/d=0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/d=*")
    )
    q = (
        politeness_rate_limit_stateful(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_limited")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT host, url, trigger_seq FROM rate_limited"
        ).collect()
    finally:
        q.stop()

    # budget law: never more than k=2 per (host, trigger)
    per_trigger: dict[tuple, int] = {}
    for r in rows:
        per_trigger[(r.host, r.trigger_seq)] = (
            per_trigger.get((r.host, r.trigger_seq), 0) + 1
        )
    assert per_trigger and all(v <= 2 for v in per_trigger.values())
    # exactly-once: a.com released all 6 urls total (4+1+1 over 3
    # triggers at k=2), b.com all 3; no duplicates, nothing lost
    emitted = [(r.host, r.url) for r in rows]
    assert len(emitted) == len(set(emitted))
    want = {(h, u) for f in files for h, u in zip(f["host"], f["url"])}
    assert set(emitted) == want
    # FIFO + budget: host a emits exactly 2 on every trigger
    a_counts = sorted(
        v for (h, t), v in per_trigger.items() if h == "a.com"
    )
    assert a_counts == [2, 2, 2]


def test_hll_sketch_error_bound(spark):
    """HLL guarantee: with m=64 buckets the typical relative error is
    1.04/sqrt(64) ≈ 13%; assert every group sits inside ~2.7σ (35%) of
    its exact audit column. (Deterministic data — this pins the sketch
    math, not luck: observed 8.1% at sf0.01.)"""
    from crawler_spark.queries import all_queries

    rows = all_queries()["sketch_hll_vocab"].run(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rel = abs(r.hll_distinct - r.exact_distinct) / r.exact_distinct
        assert rel < 0.35, (r.lang, r.hll_distinct, r.exact_distinct)


def test_cms_sketch_upper_bound(spark):
    """CMS guarantees: the estimate NEVER undercounts, and with w=128
    the overestimate is bounded by (e/w)·N w.h.p. (N = total events;
    observed max overestimate 68 ≤ 212 at sf0.01)."""
    from crawler_spark.queries import all_queries

    rows = (
        all_queries()["sketch_cms_heavy_hitters"].run(spark, SF_DIR).collect()
    )
    assert rows
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    bound = 2.718281828 / 128 * n_events
    for r in rows:
        assert r.cms_n >= r.exact_n, r
        assert r.cms_n - r.exact_n <= bound, (r, bound)


def test_quantile_hist_error_bound(spark):
    """Histogram-quantile guarantee: the estimate is the upper edge of
    the bin holding the target rank, so |est - exact| <= one bin width
    (exact percentile computed in-test as the audit)."""
    from crawler_spark.queries import all_queries

    rows = all_queries()["sketch_quantile_hist"].run(spark, SF_DIR).collect()
    assert {r.qp for r in rows} == {500, 900, 990}
    lo, hi = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .selectExpr("min(value)", "max(value)")
        .first()
    )
    width = (hi - lo) / 1024
    exact = dict(
        zip(
            (500, 900, 990),
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .selectExpr("percentile(value, array(0.5, 0.9, 0.99)) AS p")
            .first()
            .p,
        )
    )
    for r in rows:
        assert abs(r.est_value - exact[r.qp]) <= width, (r, exact[r.qp], width)


def test_priority_sampling_weighted(spark):
    """Priority sampling returns exactly k rows and is weight-biased:
    the sampled docs' mean weight exceeds the corpus mean (long docs
    are proportionally more likely — the point of the operator)."""
    from crawler_spark.queries import all_queries

    rows = all_queries()["sample_weighted_priority"].run(spark, SF_DIR).collect()
    assert len(rows) == 100
    # deterministic: priorities strictly ordered after the tie-break
    pris = [(r.priority, r.doc_id) for r in rows]
    assert pris == sorted(pris, key=lambda t: (-t[0], t[1]))
    corpus_mean = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .selectExpr("avg(n_chars)")
        .first()[0]
    )
    sample_mean = sum(r.weight for r in rows) / len(rows)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)
    # ADVICE r3: the bit-identical cross-engine claim rests on
    # weight * 2^32 being an exact f64 integer — true iff w < 2^21,
    # which the least(n_chars, cap) in both SQLs now enforces. Pin the
    # boundary so a cap change re-derives the bound, and confirm no
    # emitted weight exceeds it.
    from crawler_spark.operators.textstats import _PRI_W_CAP

    assert float(_PRI_W_CAP * (1 << 32)) == _PRI_W_CAP * (1 << 32)
    assert _PRI_W_CAP * (1 << 32) <= 1 << 53
    assert all(r.weight <= _PRI_W_CAP for r in rows)


def test_containment_catches_what_jaccard_misses(spark):
    """Every deterministic 3-doc composite must be flagged as
    containing each of its three sources (containment ~1.0), while
    ngram-jaccard at its 0.5 gate reports NONE of those pairs — the
    asymmetric case is the operator's reason to exist."""
    from crawler_spark.queries import all_queries

    rows = all_queries()["dedup_containment"].run(spark, SF_DIR).collect()
    comp_pairs = {
        (r.doc_a, r.doc_b) for r in rows if r.doc_b >= 1_000_000
    }
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    expected = {
        (base + off, base + 1_000_000)
        for base in range(0, n_docs - 2, 25)
        for off in (0, 1, 2)
    }
    assert expected <= comp_pairs, sorted(expected - comp_pairs)[:5]
    # the same pairs sit BELOW ngram-jaccard's 0.5 gate: a 3-doc
    # composite shares ~1/3 of its shingle union with each source
    from crawler_spark.operators import dedup
    from crawler_spark.operators.textprep import spark_shingle_sql
    from crawler_spark.queries import load_views

    load_views(spark, SF_DIR)
    sh = spark_shingle_sql(2).replace(
        "FROM documents", f"FROM ({dedup.CONT_SRC_SPARK})"
    )
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in spark.sql(
            f"""WITH sh AS ({sh}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          WHERE b.doc_id >= 1000000 GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       cast(i.c AS double) / (sa.n + sb.n - i.c) AS jaccard
FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id"""
        ).collect()
    }
    below_gate = [p for p in expected if jac.get(p, 0.0) < 0.5]
    # the vast majority of composite containments are invisible to
    # jaccard (52/60 at sf0.01; the rest have one source so much longer
    # than its siblings that it dominates the union)
    assert len(below_gate) >= 0.75 * len(expected), (
        len(below_gate),
        len(expected),
    )


def test_embedding_lsh_hi_finds_all_planted_near_dups(spark):
    """The 16-bit/16-band scale variant must find EVERY planted
    re-ingest pair (cosine >= 0.992 by construction; banding math in
    the operator docstring predicts ~1.0 recall there). The 4-bit
    default variant is the low-threshold small-corpus form; this one
    is the 10^5+-vector path the ops_scale probe exercises."""
    from pyspark.sql import functions as F

    from crawler_spark.queries import all_queries

    rows = all_queries()["dedup_embedding_lsh_hi"].run(spark, SF_DIR)
    found = {
        (r.vec_a, r.vec_b)
        for r in rows.collect()
        if r.vec_b >= 1_000_000  # base -> snapshot pairs
    }
    planted = {
        (r.vec_id, r.vec_id + 1_000_000)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F.pmod("vec_id", F.lit(20)) == 0)
        .collect()
    }
    assert planted, "fixture lost its planted ids"
    assert found >= planted, planted - found


def test_simhash_block_combination_banding_exact(spark):
    """Manku m=2 block-combination keys must return EXACTLY the pairs
    the classic m=1 banding returns at the same hamming cutoff (both
    pigeonhole-exact for d <= 8 - m) — the m knob changes the plan's
    candidate volume, never the result."""
    from crawler_spark.operators import dedup

    m1 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_banded_df(
            spark, SF_DIR, max_hamming=6, m=1
        ).collect()
    }
    m2 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_banded_df(
            spark, SF_DIR, max_hamming=6, m=2
        ).collect()
    }
    assert m1 == m2 and m1


def test_all_pairs_guards_refuse_large_corpora(spark, monkeypatch):
    """The exact all-pairs oracles (dedup_simhash, dedup_embedding_
    cosine) and the 8-bit m=1 banding have measured quadratic regimes;
    the registered queries must refuse past their bounds with a pointer
    to the scale twin instead of silently launching an O(n²) job."""
    from crawler_spark.operators import dedup

    monkeypatch.setenv("CRAWLER_SPARK_ALL_PAIRS_MAX", "10")
    with pytest.raises(ValueError, match="dedup_simhash_banded_m2"):
        dedup.simhash_pairs_df(spark, SF_DIR)
    with pytest.raises(ValueError, match="dedup_embedding_lsh"):
        dedup.embedding_pairs_df(spark, SF_DIR)

    monkeypatch.setenv("CRAWLER_SPARK_BANDED_M1_MAX", "10")
    with pytest.raises(ValueError, match="dedup_simhash_banded_m2"):
        dedup.simhash_banded_df(spark, SF_DIR, max_hamming=6, m=1)
    # m=2 (the scale path) is NOT gated by the m=1 bound
    assert dedup.simhash_banded_df(
        spark, SF_DIR, max_hamming=6, m=2
    ).count() >= 0

    monkeypatch.setenv("CRAWLER_SPARK_EMB_LSH_4BIT_MAX", "10")
    with pytest.raises(ValueError, match="dedup_embedding_lsh_hi"):
        dedup.embedding_lsh_4bit_df(spark, SF_DIR)

    # under the bounds the oracles still run
    monkeypatch.setenv("CRAWLER_SPARK_ALL_PAIRS_MAX", "1000000")
    assert dedup.simhash_pairs_df(spark, SF_DIR).count() >= 0
    monkeypatch.setenv("CRAWLER_SPARK_EMB_LSH_4BIT_MAX", "1000000")
    assert dedup.embedding_lsh_4bit_df(spark, SF_DIR).count() >= 0


def test_streaming_watermark_drops_late_rows(spark, tmp_path):
    """§2.9 late-data contract: once the watermark (10 min) passes a
    5-minute window's end, a straggler for that window is DROPPED — in
    append mode the window finalizes exactly once, without the late
    row. Re-crawled pages arriving hours late must not corrupt
    committed per-epoch aggregates."""
    import os
    from datetime import datetime

    import pandas as pd

    def ev(ts, value):
        return {
            "event_id": 1,
            "ts": datetime(2026, 1, 1, *ts),
            "user_id": 1,
            "event_type": "view",
            "value": value,
            "props": "{}",
        }

    src = str(tmp_path / "ev")
    os.makedirs(src, exist_ok=True)
    # trigger 1: two rows in the 10:00 window, then one at 10:40 that
    # advances the watermark to 10:30 — past the 10:00 window's end.
    # (A straggler in the VERY NEXT trigger may still merge: dropping
    # is best-effort until the state is evicted, per the Structured
    # Streaming watermark contract.)
    b0 = pd.DataFrame([ev((10, 0, 10), 1.0), ev((10, 1, 20), 2.0),
                       ev((10, 40, 0), 4.0)])
    # trigger 2: fresh data only — the batch runs with watermark 10:30,
    # finalizing (evicting + emitting) the 10:00 window
    b1 = pd.DataFrame([ev((10, 50, 0), 8.0)])
    # trigger 3: the straggler for the now-FINALIZED window — must be
    # dropped, never re-opening or double-emitting the window
    b2 = pd.DataFrame([ev((10, 2, 30), 100.0), ev((11, 0, 0), 16.0)])
    for i, b in enumerate((b0, b1, b2)):
        spark.createDataFrame(b).coalesce(1).write.parquet(f"{src}/d={i}")

    from crawler_spark.streaming import windowed_event_agg

    schema = spark.read.parquet(f"{src}/d=0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/d=*")
    )
    q = (
        windowed_event_agg(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_windows")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        emitted = spark.sql(
            "SELECT bucket_s, n, total_value FROM late_windows"
        ).collect()
    finally:
        q.stop()
    t0 = int(datetime(2026, 1, 1, 10, 0).timestamp())
    mine = [(r.n, r.total_value) for r in emitted if r.bucket_s == t0]
    # the 10:00 window finalized EXACTLY ONCE, with the two on-time
    # rows only — the 100.0 straggler neither merged nor re-opened it
    assert mine == [(2, 3.0)], emitted


def test_paragraph_dedup_planted_duplicates(spark, tmp_path):
    """CCNet paragraph dedup: the corpus-wide FIRST occurrence of each
    paragraph hash survives, every later occurrence (cross-doc copy,
    shared boilerplate prefix, intra-doc repeat) is flagged dup."""
    from crawler_spark.operators import dedup

    w = dedup.PARA_W
    para_a = " ".join(f"a{i}" for i in range(w))   # shared boilerplate
    para_b = " ".join(f"b{i}" for i in range(w))
    para_c = " ".join(f"c{i}" for i in range(w))
    rows = [
        (1, f"{para_a} {para_b}"),                  # first owner of a, b
        (2, f"{para_a} {para_c}"),                  # a is boilerplate dup
        (3, f"{para_a} {para_b}"),                  # full copy of doc 1
        (4, f"{para_c} {para_c}"),                  # both paras seen in doc 2
        (5, "tail only short"),                     # single ragged paragraph
    ]
    schema = "doc_id long, text string"
    p = str(tmp_path / "pdocs.parquet")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("documents")
    try:
        got = {
            r.doc_id: (r.n_paras, r.kept_paras, r.dup_paras, r.kept_bp)
            for r in spark.sql(dedup.paragraph_dedup_spark()).collect()
        }
    finally:
        spark.catalog.dropTempView("documents")
    assert got[1] == (2, 2, 0, 10000)   # first occurrences of a and b
    assert got[2] == (2, 1, 1, 5000)    # a already seen, c fresh
    assert got[3] == (2, 0, 2, 0)       # exact copy — nothing survives
    # doc 4: both paragraphs are para_c — seen first in doc 2, so even
    # the doc's own first occurrence is a dup (corpus-wide rule)
    assert got[4] == (2, 0, 2, 0)
    assert got[5] == (1, 1, 0, 10000)   # ragged tail is a paragraph


def test_paragraph_dedup_oracle_on_planted_corpus(spark, tmp_path):
    """Cross-engine parity on the planted corpus (the sf-dir parity run
    lives in test_queries_oracle; this pins the edge rows: ragged
    tails, intra-doc repeats, corpus-wide first-occurrence ties)."""
    import duckdb

    from crawler_spark.operators import dedup

    w = dedup.PARA_W
    texts = [
        " ".join(f"t{i % 7}" for i in range(3 * w + 5)),   # ragged tail
        " ".join(f"t{i % 7}" for i in range(3 * w + 5)),   # exact copy
        " ".join(f"u{i}" for i in range(w)) * 1,
        "one-word",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    p = str(tmp_path / "pdocs2.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(p)
    spark.read.parquet(p).createOrReplaceTempView("documents")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    try:
        got = {tuple(r) for r in spark.sql(dedup.paragraph_dedup_spark()).collect()}
        exp = {tuple(r) for r in con.execute(dedup.paragraph_dedup_duck()).fetchall()}
    finally:
        spark.catalog.dropTempView("documents")
    assert got == exp


def test_hll_union_merge_is_lossless_and_bounded(spark):
    """sketch_hll_union: the '__ALL__' row must (a) strictly exceed
    every per-source estimate on the sf corpus (bigram sets genuinely
    differ per source), (b) equal the estimate computed DIRECTLY over
    the un-sharded corpus — max-merge is lossless by Flajolet §4 —
    and (c) sit within the m=64 HLL error envelope of the exact
    distinct count."""
    from crawler_spark.operators import sketch
    from crawler_spark.queries import all_queries

    rows = {
        r.source: (r.hll_distinct, r.exact_distinct)
        for r in all_queries()["sketch_hll_union"].run(spark, SF_DIR).collect()
    }
    union_est, union_exact = rows.pop("__ALL__")
    assert all(union_est > est for est, _ in rows.values())
    # direct computation over the corpus with source collapsed: rewrite
    # the per-source sketch to a single shard — the merged estimate
    # must come out identical (max of per-source max == corpus max)
    views, final = sketch.hll_union_views_spark()
    direct_views = [
        (n, s.replace("SELECT source,", "SELECT 'one' AS source,"))
        for n, s in views
    ]
    from crawler_spark.queries import _views_fn

    direct = {
        r.source: r.hll_distinct
        for r in _views_fn(direct_views, final)(spark, SF_DIR).collect()
    }
    assert direct["__ALL__"] == union_est == direct["one"]
    # m=64 standard error is 1.04/8 = 13%; allow 3 sigma
    assert abs(union_est - union_exact) <= 0.4 * union_exact


def test_temperature_sampling_rates_follow_sqrt_law(spark):
    """sample_temperature: per-language kept fraction tracks
    sqrt(min/cnt) (α=0.5), sitting strictly BETWEEN full balancing
    (min/cnt) and no sampling for every over-represented language; the
    rarest language keeps everything."""
    import math

    from crawler_spark.queries import all_queries

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    census = {r.lang: r.cnt for r in docs.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    mn = min(census.values())
    kept = {
        lang: n
        for lang, n in (
            all_queries()["sample_temperature"]
            .run(spark, SF_DIR)
            .groupBy("lang")
            .agg(F.count("*").alias("n"))
            .collect()
        )
    }
    rare = min(census, key=census.get)
    assert kept[rare] == census[rare]
    for lang, cnt in census.items():
        expect = math.sqrt(mn / cnt)
        got = kept[lang] / cnt
        # binomial noise at these counts: ±3σ
        sd = math.sqrt(expect * (1 - expect) / cnt) if cnt else 0.0
        assert abs(got - expect) <= 3 * sd + 1 / cnt, (lang, got, expect)
        if cnt > mn * 2:  # clearly over-represented
            assert mn / cnt < got < 1.0


def test_stateful_politeness_rate_restart_from_checkpoint(spark, tmp_path):
    """§2.9 restart-recovery for the rate limiter (VERDICT r4 #6): the
    FIFO backlog is exactly the state most likely to double-release on
    a bad resume. Stop after trigger 1 with a 3-url backlog parked in
    state, deliver more urls while down, restart the SAME checkpoint:
    trigger 2 must (a) resume the trigger ordinal at 2 — a reset to 1
    means the state was lost, (b) release the OLD backlog in FIFO order
    before any new arrival, (c) never re-emit trigger 1's releases
    (sink replay), and (d) cap the release at k. A third restart with
    no new data appends nothing."""
    import os

    import pandas as pd

    from crawler_spark.streaming import _RATE_K, politeness_rate_limit_stateful

    assert _RATE_K == 2  # closed form below is written for k=2
    src = str(tmp_path / "urls")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    b0 = [f"http://a.com/{i}" for i in range(5)]  # a.com/0 .. a.com/4
    b1 = ["http://a.com/x", "http://a.com/y"]
    pd0 = pd.DataFrame({"host": ["a.com"] * 5, "url": b0})
    pd1 = pd.DataFrame({"host": ["a.com"] * 2, "url": b1})
    spark.createDataFrame(pd0).coalesce(1).write.parquet(f"{src}/d=0")
    schema = spark.read.parquet(f"{src}/d=0").schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/d=*")
        )
        return (
            politeness_rate_limit_stateful(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got1 = sorted(
        (r.url, r.trigger_seq) for r in spark.read.parquet(out).collect()
    )
    # trigger 1: sorted(b0)[:2]; backlog [2,3,4] parked in state
    assert got1 == [(b0[0], 1), (b0[1], 1)], got1

    spark.createDataFrame(pd1).coalesce(1).write.parquet(f"{src}/d=1")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got2 = sorted(
        (r.url, r.trigger_seq) for r in spark.read.parquet(out).collect()
    )
    # trigger 2 resumed the ordinal AND drained the OLD backlog first:
    # avail = [a/2, a/3, a/4, a/x, a/y][:2]
    assert got2 == [
        (b0[0], 1),
        (b0[1], 1),
        (b0[2], 2),
        (b0[3], 2),
    ], got2

    # empty restart: no trigger fires, nothing appended, state intact
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got3 = sorted(
        (r.url, r.trigger_seq) for r in spark.read.parquet(out).collect()
    )
    assert got3 == got2


def test_stateful_paragraph_dedup_restart_from_checkpoint(spark, tmp_path):
    """§2.9 restart-recovery for the paragraph-dedup stream (VERDICT r4
    #6): per-shard seen-hash state must survive a kill/restart —
    re-discoveries of pre-restart paragraphs stay suppressed (state
    loss would re-emit them), pre-restart winners are not re-appended
    (sink replay), and an empty restart appends zero rows."""
    import os

    import pandas as pd

    from crawler_spark.streaming import paragraph_dedup_stateful

    src = str(tmp_path / "paras")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def frame(rows):
        return pd.DataFrame(
            [(h[0], h, d, p) for h, d, p in rows],
            columns=["shard", "h", "doc_id", "pidx"],
        )

    # two shards ('a', 'f'); b1/b2 re-discover earlier hashes from docs
    # with LOWER (doc_id, pidx) than some first sightings — a lost state
    # would not just re-emit, it would re-emit with different winners
    b0 = [("aaa1", 1, 0), ("fff1", 1, 1), ("aaa2", 2, 0)]
    b1 = [("aaa1", 3, 0), ("fff2", 3, 1), ("fff1", 4, 0)]
    b2 = [("aaa2", 5, 0), ("aaa3", 5, 1)]
    spark.createDataFrame(frame(b0)).coalesce(1).write.parquet(f"{src}/d=0")
    schema = spark.read.parquet(f"{src}/d=0").schema

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/d=*")
        )
        return (
            paragraph_dedup_stateful(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    spark.createDataFrame(frame(b1)).coalesce(1).write.parquet(f"{src}/d=1")
    spark.createDataFrame(frame(b2)).coalesce(1).write.parquet(f"{src}/d=2")
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.h, r.doc_id, r.pidx) for r in spark.read.parquet(out).collect()
    )
    assert got == [
        ("aaa1", 1, 0),
        ("aaa2", 2, 0),
        ("aaa3", 5, 1),
        ("fff1", 1, 1),
        ("fff2", 3, 1),
    ], got

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert (
        sorted(
            (r.h, r.doc_id, r.pidx)
            for r in spark.read.parquet(out).collect()
        )
        == got
    )
