"""Structured Streaming metrics: availableNow catch-up over a parquet log
directory, incremental pickup of late-arriving files, watermark wiring."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from web_scraper_spark.streaming.metrics import (
    FETCH_LOG_SCHEMA,
    read_fetch_log_stream,
    run_available_now,
    windowed_error_breakdown,
    windowed_host_stats,
)

T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


def _rows(start_min, n, host, ok=True, error=None):
    return [
        (
            T0 + datetime.timedelta(minutes=start_min, seconds=i * 10),
            host,
            hash((host, start_min, i)),
            ok,
            1000 if ok else None,
            error,
        )
        for i in range(n)
    ]


def _write(spark, path, rows):
    spark.createDataFrame(rows, schema=FETCH_LOG_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_windowed_host_stats_available_now(spark, tmp_path):
    log = str(tmp_path / "log")
    _write(spark, log, _rows(0, 6, "a.test") + _rows(0, 3, "b.test", ok=False, error="HTTP 404 not found"))
    _write(spark, log, _rows(1, 6, "a.test"))

    stats = windowed_host_stats(read_fetch_log_stream(spark, log), "1 minute", "2 minutes")
    out = run_available_now(stats, "host_stats_t1", str(tmp_path / "ck1"))
    got = {(r["window_start"].minute, r["host"]): (r["n"], r["n_ok"], r["bytes"]) for r in out.collect()}
    assert got[(0, "a.test")] == (6, 6, 6000)
    assert got[(0, "b.test")] == (3, 0, 0)
    assert got[(1, "a.test")] == (6, 6, 6000)


def test_streaming_picks_up_new_files_on_restart(spark, tmp_path):
    """availableNow + checkpoint: a second run consumes ONLY new files but
    complete-mode output covers all state — the streaming analog of the
    engine's resume-from-snapshot."""
    log = str(tmp_path / "log2")
    ck = str(tmp_path / "ck2")
    _write(spark, log, _rows(0, 4, "a.test"))
    stats = windowed_host_stats(read_fetch_log_stream(spark, log), "1 minute", "2 minutes")
    out1 = run_available_now(stats, "host_stats_t2a", ck)
    assert {(r["host"], r["n"]) for r in out1.collect()} == {("a.test", 4)}

    _write(spark, log, _rows(0, 2, "c.test"))
    out2 = run_available_now(stats, "host_stats_t2b", ck)
    got = {(r["host"], r["n"]) for r in out2.collect()}
    assert ("c.test", 2) in got


def test_windowed_error_breakdown(spark, tmp_path):
    log = str(tmp_path / "log3")
    _write(
        spark,
        log,
        _rows(0, 2, "a.test", ok=False, error="rate_limit")
        + _rows(0, 3, "b.test", ok=False, error="network")
        + _rows(0, 5, "a.test"),
    )
    br = windowed_error_breakdown(read_fetch_log_stream(spark, log), "5 minutes", "10 minutes")
    out = run_available_now(br, "err_break_t3", str(tmp_path / "ck3"))
    got = {r["error_class"]: r["n"] for r in out.collect()}
    assert got == {"rate_limit": 2, "network": 3}


# ------------------------------------------------------- stateful dedup

URL_SCHEMA = "url_hash long, url string, ts timestamp"


def _urls(spark, path, rows):
    spark.createDataFrame(rows, schema=URL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_dedup(spark, path, ck, out, ttl_minutes=None):
    """availableNow run with a DURABLE sink (parquet): append-mode memory
    sinks refuse checkpoint recovery, and the whole point here is state
    surviving restarts. Returns the accumulated (url_hash, url) multiset."""
    from web_scraper_spark.streaming.dedup import first_seen_dedup

    stream = (
        spark.readStream.schema(URL_SCHEMA).option("maxFilesPerTrigger", 10).parquet(path)
    )
    q = (
        first_seen_dedup(stream, ttl_minutes=ttl_minutes)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted((r["url_hash"], r["url"]) for r in spark.read.parquet(out).collect())


def test_first_seen_dedup_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: first arrival emits, later arrivals fold
    into per-key state — including across a checkpointed restart (the
    streaming analogue of the engine's seen-set)."""
    log, ck, out = (str(tmp_path / d) for d in ("urls", "ck", "out"))
    _urls(spark, log, [
        (1, "http://a.test/1", T0),
        (2, "http://b.test/2", T0 + datetime.timedelta(seconds=5)),
        (2, "http://b.test/2?later", T0 + datetime.timedelta(seconds=9)),
    ])
    out1 = _run_dedup(spark, log, ck, out)
    assert out1 == [(1, "http://a.test/1"), (2, "http://b.test/2")]  # first ts wins

    # restart from the checkpoint: only the never-seen key emits
    _urls(spark, log, [
        (2, "http://b.test/2?again", T0 + datetime.timedelta(minutes=1)),
        (3, "http://c.test/3", T0 + datetime.timedelta(minutes=1)),
    ])
    out2 = _run_dedup(spark, log, ck, out)
    assert sorted(set(out2) - set(out1)) == [(3, "http://c.test/3")]
    assert len(out2) == 3  # key 2's re-arrival emitted nothing


def test_first_seen_dedup_ttl_reopens_key(spark, tmp_path):
    """Recrawl window in EVENT time: once the watermark passes a key's
    last arrival + ttl, its state is evicted and the next arrival emits
    again — P4's scoped dup window as a stream. Event-time timers keep
    this fully deterministic (no wall-clock sleeps)."""
    log, ck, out = (str(tmp_path / d) for d in ("urls_t", "ck_t", "out_t"))
    ttl = 5.0  # minutes of EVENT time
    _urls(spark, log, [(7, "http://r.test/7", T0)])
    out1 = _run_dedup(spark, log, ck, out, ttl_minutes=ttl)
    assert out1 == [(7, "http://r.test/7")]

    # inside the window: re-arrival at +2 min dedupes (and extends last-seen)
    _urls(spark, log, [(7, "http://r.test/7?dup", T0 + datetime.timedelta(minutes=2))])
    out2 = _run_dedup(spark, log, ck, out, ttl_minutes=ttl)
    assert len(out2) == 1

    # another key at +30 min pushes the watermark past 2+5 min → key 7
    # times out and is evicted in this run
    _urls(spark, log, [(8, "http://r.test/8", T0 + datetime.timedelta(minutes=30))])
    _run_dedup(spark, log, ck, out, ttl_minutes=ttl)

    # key 7 re-arrives after eviction: emits again
    _urls(spark, log, [(7, "http://r.test/7?recrawl", T0 + datetime.timedelta(minutes=31))])
    out4 = _run_dedup(spark, log, ck, out, ttl_minutes=ttl)
    assert (7, "http://r.test/7?recrawl") in out4
    assert len(out4) == 3


# ---------------------------------------------------------------- sessions


EVENT_SCHEMA = "ts timestamp, user_id long, value double"


def _ev(minute, user, value=1.0):
    return (T0 + datetime.timedelta(minutes=minute), user, value)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, schema=EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _read_events_stream(spark, path):
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 10)
        .parquet(path)
    )


def test_sessionized_stats_gap_semantics(spark, tmp_path):
    """user 1: events at 0/10/55 min (gap 45 > 30 → two sessions);
    user 2: one event. Session end = last event + gap."""
    from web_scraper_spark.streaming.metrics import sessionized_stats

    log = str(tmp_path / "ev")
    _write_events(
        spark, log, [_ev(0, 1, 2.0), _ev(10, 1, 3.0), _ev(55, 1, 5.0), _ev(7, 2)]
    )
    out = run_available_now(
        sessionized_stats(_read_events_stream(spark, log)),
        "sess_t1",
        str(tmp_path / "ck"),
    ).collect()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["sum_value"])
        for r in out
    }
    m = datetime.timedelta(minutes=1)
    assert got == {
        (1, T0, T0 + 40 * m, 2, 5.0),
        (1, T0 + 55 * m, T0 + 85 * m, 1, 5.0),
        (2, T0 + 7 * m, T0 + 37 * m, 1, 1.0),
    }


def test_sessionized_stats_restart_merges_new_files(spark, tmp_path):
    """A later file inside an open session window merges into the same
    session across a checkpointed restart (complete-mode recompute)."""
    from web_scraper_spark.streaming.metrics import sessionized_stats

    log = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    _write_events(spark, log, [_ev(0, 1), _ev(10, 1)])
    out1 = run_available_now(
        sessionized_stats(_read_events_stream(spark, log)), "sess_t2a", ck
    ).collect()
    assert [(r["n_events"]) for r in out1] == [2]
    _write_events(spark, log, [_ev(20, 1), _ev(90, 1)])
    out2 = run_available_now(
        sessionized_stats(_read_events_stream(spark, log)), "sess_t2b", ck
    ).collect()
    got = sorted((r["n_events"], r["session_start"]) for r in out2)
    m = datetime.timedelta(minutes=1)
    assert got == [(1, T0 + 90 * m), (3, T0)]


def test_sessionized_stats_matches_batch_twin_on_events_table(spark):
    """Session segmentation (count + membership) agrees with the batch
    q_sessionize on the sf0.001 events table wherever no gap sits exactly
    on the 30-min boundary (none do in the fixture)."""
    from web_scraper_spark import analytics
    from web_scraper_spark.streaming.metrics import sessionized_stats

    import tempfile

    sf = "/root/testdata/sf0.001"
    ev = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select(F.col("ts").cast("timestamp").alias("ts"), "user_id", "value")
    )
    with tempfile.TemporaryDirectory() as td:
        path = td + "/ev"
        ev.write.parquet(path)
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1000)
            .parquet(path)
        )
        out = run_available_now(
            sessionized_stats(stream), "sess_t3", td + "/ck"
        )
        stream_sessions = {
            (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 4))
            for r in out.collect()
        }
    batch = analytics.q_sessionize(spark, sf)
    batch_sessions = {
        (
            r["user_id"],
            r["session_start"],
            r["n_events"],
            round(r["sum_value"], 4),
        )
        for r in batch.collect()
    }
    assert stream_sessions == batch_sessions


# ---------------------------------------------------------------------
# incremental CMS maintenance (streaming/sketches.py)
# ---------------------------------------------------------------------


def _grid(df):
    return {(r["row_j"], r["bucket"]): r["c"] for r in df.collect()}


def _doc_halves(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(a)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(b)
    return docs, a, b


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """Merge-by-addition, cashed in: draining the corpus through the
    foreachBatch sink file-by-file yields EXACTLY the counter grid the
    one-shot batch sketch computes over everything."""
    from web_scraper_spark.streaming.sketches import (
        cms_partial_sketch,
        cms_state_df,
        run_cms_available_now,
    )

    docs, a, b = _doc_halves(spark, tmp_path)
    src = str(tmp_path / "src")
    spark.read.parquet(a).write.mode("append").parquet(src)
    spark.read.parquet(b).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    run_cms_available_now(stream, state, str(tmp_path / "ck"))
    assert _grid(cms_state_df(spark, state)) == _grid(cms_partial_sketch(docs))


def test_streaming_cms_restart_picks_up_only_new_files(spark, tmp_path):
    """Checkpoint + batch-id fence across TWO availableNow runs: the
    second run folds only the late file — no double count of the first."""
    from web_scraper_spark.streaming.sketches import (
        cms_partial_sketch,
        cms_state_df,
        run_cms_available_now,
    )

    docs, a, b = _doc_halves(spark, tmp_path)
    src = str(tmp_path / "src")
    spark.read.parquet(a).write.mode("append").parquet(src)
    state, ck = str(tmp_path / "state"), str(tmp_path / "ck")

    def _stream():
        return spark.readStream.schema("doc_id long, text string").parquet(src)

    run_cms_available_now(_stream(), state, ck)
    spark.read.parquet(b).write.mode("append").parquet(src)
    run_cms_available_now(_stream(), state, ck)
    assert _grid(cms_state_df(spark, state)) == _grid(cms_partial_sketch(docs))


def test_streaming_cms_replayed_batch_is_skipped(spark, tmp_path):
    """The at-least-once sink contract: re-invoking the sink fn with an
    already-applied batch_id must not change the grid, and a point
    estimate stays ≥ the true count (CMS one-sided error survives the
    streaming path)."""
    from web_scraper_spark.streaming.sketches import (
        cms_estimate,
        cms_foreach_batch,
        cms_state_df,
    )

    docs, _, _ = _doc_halves(spark, tmp_path)
    state = str(tmp_path / "state")
    fn = cms_foreach_batch(state)
    fn(docs, 0)
    before = _grid(cms_state_df(spark, state))
    fn(docs, 0)  # crash-replay of the same batch
    assert _grid(cms_state_df(spark, state)) == before

    tok = docs.select(F.explode(F.split("text", " ")).alias("t")).filter(
        F.col("t") != ""
    )
    top = tok.groupBy("t").count().orderBy(F.desc("count")).first()
    assert cms_estimate(state, top["t"]) >= top["count"]


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """Max-merge, cashed in: draining events file-by-file leaves exactly
    the registers the one-shot partial computes over everything, and the
    driver-side estimate matches the m=16 sketch's accuracy envelope."""
    from web_scraper_spark.streaming.sketches import (
        hll_estimate,
        hll_partial_registers,
        read_hll_state,
        run_hll_available_now,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id"
    )
    src = str(tmp_path / "src")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_id long, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    run_hll_available_now(stream, state, str(tmp_path / "ck"), "user_id")

    batch_regs = {
        r["bucket"]: r["m_reg"] for r in hll_partial_registers(ev, "user_id").collect()
    }
    _, regs = read_hll_state(state)
    streamed = {b: m for b, m in enumerate(regs) if m > 0}
    assert streamed == batch_regs

    exact = ev.select("user_id").distinct().count()
    assert abs(hll_estimate(state) - exact) / exact < 0.6  # m=16 envelope
