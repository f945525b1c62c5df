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
