"""The crawl engine: schedule → dedup → robots → fetch → validate → commit,
as resumable micro-batches over snapshot tables.

This is the Spark restatement of the reference's three entry points
(SURVEY.md §3): the page loop of main_scraper.py:547-614, the
parse→manifest→download split of new/main_scraper.py, and the
progress.json resume of main_scraper.py:219-355 — with the at-most-once bug
fixed (reference marks items done before bytes verify, main.py:310-327;
here `seen` commits only with validated payload rows).

Determinism: the engine has a *logical clock* — batch_id-indexed seconds —
so politeness backoff (`next_attempt_ts`) and retry scheduling replay
identically across runs and parallelism levels. Real deployments swap the
logical clock for wall time; nothing else changes.

Per-batch dataflow::

    frontier snapshot ──eligible──▶ take_batch (window-ranked micro-batch)
        ▶ dedup (bloom pre-filter + exact anti-join vs seen)
        ▶ robots broadcast-join filter
        ▶ schedule: global seq assignment (crawl-order trace)
        ▶ join payload store ▶ assign waves ▶ salted repartition
        ▶ mapInPandas fetch + decode + phash validate
        ▶ commits: payload+seen (append), failures (append-log upsert),
                   schedule trace (append), metrics (append),
                   frontier (bucket merge on touched priorities)
        ▶ checkpoint (atomic multi-table snapshot pin)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.errors import backoff_seconds, classify_error, should_retry
from ..operators.dedup import dedup_against_seen
from ..operators.frontier import eligible, rank_frontier, seed_frontier_from_site, take_batch
from ..operators.politeness import assign_waves, salted_repartition
from ..sources.snapshots import CheckpointLog, SnapshotTable
from ..sources.store import fetch_and_validate, join_payload_store

LOGICAL_EPOCH = "2026-01-01 00:00:00"
TICK_SECONDS = 60  # logical seconds advanced per micro-batch
N_FRONTIER_BUCKETS = 64  # frontier partitioning: bucket = pmod(priority, 64)


def _bucket(col: F.Column) -> F.Column:
    return F.pmod(col, F.lit(N_FRONTIER_BUCKETS)).cast("int")


class CrawlEngine:
    def __init__(
        self,
        root: str,
        batch_size: int = 240,
        per_host_parallelism: int = 3,
        use_bloom: bool = True,
        n_partitions: int = 32,
        verify_phash: bool = True,
    ):
        self.root = root
        self.batch_size = batch_size
        self.per_host_parallelism = per_host_parallelism
        self.use_bloom = use_bloom
        self.n_partitions = n_partitions
        self.verify_phash = verify_phash
        os.makedirs(root, exist_ok=True)
        self.frontier = SnapshotTable(root, "frontier")
        self.seen = SnapshotTable(root, "seen")
        self.failures = SnapshotTable(root, "failures")
        self.payload_out = SnapshotTable(root, "payload_out")
        self.schedule_log = SnapshotTable(root, "schedule_log")
        self.metrics = SnapshotTable(root, "metrics")
        self.robots = SnapshotTable(root, "robots")
        self.checkpoints = CheckpointLog(root)

    # ------------------------------------------------------------- init

    def init(self, site_graph: DataFrame, robots: DataFrame | None = None) -> None:
        frontier = seed_frontier_from_site(site_graph).withColumn(
            "bucket", _bucket(F.col("priority"))
        )
        fv = self.frontier.commit_overwrite_bucketed(frontier, "bucket")
        rv = self.robots.commit_overwrite(robots) if robots is not None else 0
        self.checkpoints.commit(
            0,
            {
                "versions": {
                    "frontier": fv,
                    "seen": 0,
                    "failures": 0,
                    "payload_out": 0,
                    "schedule_log": 0,
                    "metrics": 0,
                    "robots": rv,
                },
                "next_seq": 1,
                "logical_s": 0.0,
            },
        )

    # ---------------------------------------------------------- helpers

    def _logical_ts(self, logical_s: float) -> F.Column:
        return F.to_timestamp(F.lit(LOGICAL_EPOCH)) + F.make_dt_interval(secs=F.lit(logical_s))

    def _robots_filter(self, batch: DataFrame, robots: DataFrame | None) -> tuple[DataFrame, DataFrame]:
        """(allowed_with_delay, blocked). Robots ships as a broadcast join —
        the cache-as-broadcast-table of the north rule. URL allowed iff its
        path matches no disallow prefix for its host."""
        if robots is None:
            return batch.withColumn("crawl_delay_ms", F.lit(0)), batch.limit(0)
        from ..functions.urlnorm import url_path

        joined = batch.join(F.broadcast(robots), "host", "left")
        path = url_path(F.col("url"))
        blocked_expr = F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array()),
            lambda p: path.startswith(p),
        )
        joined = joined.withColumn("__blocked", blocked_expr).withColumn(
            "crawl_delay_ms", F.coalesce(F.col("crawl_delay_ms"), F.lit(0))
        )
        allowed = joined.filter(~F.col("__blocked")).drop("__blocked", "disallow_prefixes")
        blocked = joined.filter(F.col("__blocked")).drop(
            "__blocked", "disallow_prefixes", "crawl_delay_ms"
        )
        return allowed, blocked

    # ------------------------------------------------------------ batch

    def run_batch(self, spark: SparkSession) -> dict | None:
        """Run one micro-batch. Returns the batch's metric dict, or None
        when the crawl is complete."""
        ck = self.checkpoints.latest()
        assert ck is not None, "call init() first"
        v = ck["versions"]
        batch_id = ck["batch_id"] + 1
        logical_s = float(ck["logical_s"]) + TICK_SECONDS
        next_seq = int(ck["next_seq"])

        frontier = self.frontier.read(spark, v["frontier"])
        seen = self.seen.read(spark, v["seen"])
        robots = self.robots.read(spark, v["robots"])
        now = self._logical_ts(logical_s)

        elig = eligible(frontier, logical_now=now)
        batch = take_batch(elig, self.batch_size).drop("seq")
        batch = batch.localCheckpoint(eager=True)  # pin: frontier re-reads below must not recompute
        n_scheduled_raw = batch.count()
        if n_scheduled_raw == 0:
            # nothing eligible now — if retryable failures exist in the
            # future, jump the logical clock to the earliest retry time.
            pending_later = frontier.filter(F.col("status") == "failed")
            nxt = pending_later.agg(F.min("next_attempt_ts").alias("t")).collect()[0]["t"]
            if nxt is None:
                return None
            self.checkpoints.commit(
                batch_id,
                {
                    "versions": v,
                    "next_seq": next_seq,
                    "logical_s": self._ts_to_logical(nxt),
                },
            )
            return {"batch_id": batch_id, "scheduled": 0, "clock_jump": True}

        # -- dedup (bloom + exact anti-join) --------------------------------
        if seen is not None:
            seen_keys = seen.select("url_hash")
            deduped = dedup_against_seen(
                batch, seen_keys, use_bloom=self.use_bloom, seen_count=seen.count()
            )
        else:
            deduped = batch
        # in-batch dup guard (reference P1 dedupes within a page)
        deduped = deduped.dropDuplicates(["url_hash"])

        # -- robots ---------------------------------------------------------
        allowed, blocked = self._robots_filter(deduped, robots)
        allowed = allowed.localCheckpoint(eager=True)
        blocked = blocked.localCheckpoint(eager=True)

        # -- global crawl-order seq (the reproducible trace) ----------------
        scheduled = rank_frontier(allowed).withColumn("seq", F.col("seq") + F.lit(next_seq - 1))
        scheduled = scheduled.localCheckpoint(eager=True)
        n_scheduled = scheduled.count()

        # -- fetch + validate ------------------------------------------------
        payload = self._payload_store(spark)
        fault_bc = self._fault_bc(spark)
        withp = join_payload_store(scheduled, payload)
        waved = assign_waves(withp, self.per_host_parallelism)
        placed = salted_repartition(waved, self.n_partitions)
        results = fetch_and_validate(placed, fault_bc, self.verify_phash).localCheckpoint(eager=True)

        ok = results.filter(F.col("ok"))
        bad = results.filter(~F.col("ok"))

        # -- commits ----------------------------------------------------------
        seq_of = scheduled.select("url_hash", "seq")
        new_payload = ok.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        pv = self.payload_out.commit_append(new_payload) if ok.limit(1).count() else v["payload_out"]

        new_seen = ok.join(seq_of, "url_hash").select(
            "url_hash", "image_id", F.col("seq").alias("committed_seq")
        )
        sv = self.seen.commit_append(new_seen) if ok.limit(1).count() else v["seen"]

        failed_rows = (
            bad.withColumn("error_class", classify_error("error_msg"))
            .withColumn("attempts_new", F.col("attempts") + 1)
            .withColumn("retry", should_retry("error_class", "attempts_new"))
            .localCheckpoint(eager=True)
        )
        new_failures = failed_rows.select(
            "url_hash",
            "url",
            "image_id",
            "error_class",
            F.col("attempts_new").alias("attempts"),
            (~F.col("retry")).alias("permanent"),
            F.lit(next_seq + n_scheduled).alias("last_attempt_seq"),
        )
        fv2 = self.failures.commit_append(new_failures) if bad.limit(1).count() else v["failures"]

        trace = scheduled.select(
            "seq", "url", "url_hash", "image_id", F.lit(batch_id).alias("batch_id")
        )
        tv = self.schedule_log.commit_append(trace)

        # -- frontier bucket merge --------------------------------------------
        done_updates = ok.join(seq_of.select("url_hash"), "url_hash").select(
            "url", "url_hash", F.lit(None).cast("string").alias("host"),  # host refilled below
            "image_id", "priority", "position",
            F.lit("done").alias("status"), F.col("attempts"),
            F.lit(None).cast("string").alias("error_class"),
            F.lit(None).cast("timestamp").alias("next_attempt_ts"),
        )
        fail_updates = failed_rows.select(
            "url", "url_hash", F.lit(None).cast("string").alias("host"),
            "image_id", "priority", "position",
            F.when(F.col("retry"), "failed").otherwise("permanent").alias("status"),
            F.col("attempts_new").alias("attempts"),
            "error_class",
            F.when(
                F.col("retry"),
                now + F.make_dt_interval(secs=backoff_seconds("error_class", "attempts_new")),
            ).otherwise(F.lit(None).cast("timestamp")).alias("next_attempt_ts"),
        )
        blocked_updates = blocked.select(
            "url", "url_hash", F.lit(None).cast("string").alias("host"),
            "image_id", "priority", "position",
            F.lit("robots_blocked").alias("status"), F.col("attempts"),
            F.lit("robots").alias("error_class"),
            F.lit(None).cast("timestamp").alias("next_attempt_ts"),
        )
        # deduped-away rows (already seen): mark done-by-dedup so they leave
        # the pending set (reference P2 skip)
        skipped = batch.join(deduped.select("url_hash"), "url_hash", "left_anti").select(
            "url", "url_hash", F.lit(None).cast("string").alias("host"),
            "image_id", "priority", "position",
            F.lit("skipped_seen").alias("status"), F.col("attempts"),
            F.lit(None).cast("string").alias("error_class"),
            F.lit(None).cast("timestamp").alias("next_attempt_ts"),
        )
        updates = done_updates.unionByName(fail_updates).unionByName(blocked_updates).unionByName(skipped)
        # refill host from the frontier row (dropped above to keep one select shape)
        updates = updates.drop("host").join(
            frontier.select("url_hash", "host").dropDuplicates(["url_hash"]), "url_hash", "left"
        ).select(*[f.name for f in schemas.FRONTIER_SCHEMA.fields])

        updates = updates.withColumn("bucket", _bucket(F.col("priority")))
        touched = [r["bucket"] for r in updates.select("bucket").distinct().collect()]
        old_buckets = frontier.withColumn("bucket", _bucket(F.col("priority"))).filter(
            F.col("bucket").isin(touched)
        )
        merged_buckets = old_buckets.join(
            updates.select("url_hash").distinct(), "url_hash", "left_anti"
        ).unionByName(updates)
        nfv = self.frontier.commit_merge_buckets(merged_buckets, "bucket", touched)

        stats = {
            "batch_id": batch_id,
            "scheduled": n_scheduled,
            "dedup_skipped": n_scheduled_raw - deduped.count(),
            "robots_blocked": blocked.count(),
            "fetched_ok": ok.count(),
            "failed": bad.count(),
            "bytes": ok.agg(F.sum(F.length("bytes"))).collect()[0][0] or 0,
        }
        mrows = [
            (batch_id, k, float(val)) for k, val in stats.items() if k != "batch_id"
        ]
        mv = self.metrics.commit_append(
            spark.createDataFrame(mrows, schema=schemas.METRICS_SCHEMA)
        )

        self.checkpoints.commit(
            batch_id,
            {
                "versions": {
                    "frontier": nfv,
                    "seen": sv,
                    "failures": fv2,
                    "payload_out": pv,
                    "schedule_log": tv,
                    "metrics": mv,
                    "robots": v["robots"],
                },
                "next_seq": next_seq + n_scheduled,
                "logical_s": logical_s,
            },
        )
        return stats

    def run(self, spark: SparkSession, max_batches: int = 1000) -> list[dict]:
        out = []
        for _ in range(max_batches):
            s = self.run_batch(spark)
            if s is None:
                break
            out.append(s)
        return out

    # -------------------------------------------------------- store hooks

    _payload_path: str | None = None
    _fault_plan: dict | None = None

    def attach_store(self, payload_path: str, fault_plan: dict[str, tuple[str, int]] | None = None) -> None:
        """Point the engine at the synthetic origin: a parquet payload table
        and an optional fault plan {image_id: (mode, fail_count)}."""
        self._payload_path = payload_path
        self._fault_plan = fault_plan or {}

    def _payload_store(self, spark: SparkSession) -> DataFrame:
        assert self._payload_path, "attach_store() first"
        return spark.read.parquet(self._payload_path)

    def _fault_bc(self, spark: SparkSession):
        return spark.sparkContext.broadcast(self._fault_plan or {})

    @staticmethod
    def _ts_to_logical(ts) -> float:
        import datetime

        epoch = datetime.datetime.fromisoformat(LOGICAL_EPOCH).replace(
            tzinfo=datetime.timezone.utc
        )
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        return (ts - epoch).total_seconds()

    # ---------------------------------------------------------- queries

    def crawl_order(self, spark: SparkSession) -> DataFrame | None:
        """(seq, url) — the engine's scheduled fetch order (the trace the
        oracle compares)."""
        df = self.schedule_log.read(spark)
        return None if df is None else df.select("seq", "url", "image_id").orderBy("seq")

    def seen_set(self, spark: SparkSession) -> DataFrame | None:
        return self.seen.read(spark)

    def failure_state(self, spark: SparkSession) -> DataFrame | None:
        """Latest failure record per url (merge-on-read upsert log)."""
        return self.failures.read_upsert_log(spark, key="url_hash", order_col="last_attempt_seq")
