"""Streaming crawl metrics: watermarked event-time windows over a growing
log directory (SURVEY.md §2.9; replaces the reference's polled stats dicts
— main_scraper.py:934-963 — with push-based continuous aggregation).

The source is a parquet directory the crawl (or any producer) appends to;
Structured Streaming picks up new files per micro-batch. Watermarks bound
state for late data; `availableNow` runs the same query as a catch-up
batch (used by tests and by resumable metric backfills).

Scale notes: windowed counts shuffle on (window, key) — bounded keys ⇒
bounded state; the watermark evicts expired windows so state does not grow
with stream length. maxFilesPerTrigger caps per-batch work on backlog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of the streamed fetch/event log (a superset of the engine's
#: per-batch stats, one row per fetched item)
FETCH_LOG_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("bytes", T.LongType(), True),
        T.StructField("error_class", T.StringType(), True),
    ]
)


def read_fetch_log_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 100
) -> DataFrame:
    return (
        spark.readStream.schema(FETCH_LOG_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_host_stats(
    stream: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host tumbling-window fetch stats (A2/A3 as a stream): counts,
    success rate, byte volume. Watermark bounds state; late rows beyond it
    are dropped exactly like the reference's last-writer-wins stats."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("host"))
        .agg(
            F.count("*").alias("n"),
            F.count_if(F.col("ok")).alias("n_ok"),
            F.coalesce(F.sum("bytes"), F.lit(0)).alias("bytes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n",
            "n_ok",
            "bytes",
        )
    )


def windowed_error_breakdown(
    stream: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Failure breakdown by error class per window (A5 as a stream)."""
    return (
        stream.filter(~F.col("ok"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), F.col("error_class"))
        .count()
        .select(
            F.col("win.start").alias("window_start"),
            "error_class",
            F.col("count").alias("n"),
        )
    )


def sessionized_stats(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap sessionization as a stream via the built-in ``session_window``:
    events within ``gap`` of each other merge into one session per user;
    the watermark closes sessions and bounds state. The streaming twin of
    ``analytics.q_sessionize`` (same 30-min gap); two deliberate semantic
    differences: ``session_end`` here is last-event + gap (the window's
    close, Spark's definition) where the batch twin reports max event ts,
    and an event separated by EXACTLY the gap starts a new session here
    but extends the session there (>= vs > on the boundary).

    Scale: state = currently-open sessions only (closed ones emit and
    drop at the watermark); a skewed user bounds one partition's state,
    never the plan. Needs an instant-typed ts (cast TIMESTAMP_NTZ before
    calling — watermarks track real time)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap))
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(result: DataFrame, query_name: str, checkpoint_dir: str) -> DataFrame:
    """Run a streaming aggregation over everything currently in the source
    (Trigger.AvailableNow), block until done, return the materialized
    result from the in-memory sink. Complete mode: windowed aggregations
    emit their current totals."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(query_name)
