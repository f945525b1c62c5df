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

Per-batch dataflow (designed for a bounded number of Spark jobs per batch —
fixed job overhead is what murders micro-batch engines, at any scale)::

    frontier snapshot ──eligible──▶ take_batch        [job: cutoff agg]
        ▶ annotate lazily: in-batch dup rank, seen flag (bloom + exact
          join), robots broadcast flag, global seq — ONE localCheckpoint
                                                      [job: pin batch]
        ▶ one stats pass: per-host counts → totals, hot hosts (salting),
          touched frontier buckets                    [job: groupBy collect]
        ▶ join payload store (broadcast the bounded batch; the 100 TB
          payload table is never shuffled) ▶ assign politeness waves
          ▶ salted repartition ▶ mapInPandas fetch + decode + phash
                                                      [job: pin results]
        ▶ result stats                                [job: agg]
        ▶ commits: payload+seen (append), failures (append-log), schedule
          trace (append), frontier (bucket merge)     [4-5 write jobs]
        ▶ checkpoint (atomic multi-table snapshot pin; per-batch metrics
          ride in the checkpoint JSON — no extra write job)

~9 logical steps per micro-batch; the Spark UI counts ~38 job launches for
them (measured, stable across 10^3 batches — scripts/soak.py asserts it
stays flat): each broadcast join materializes its build side as its own
job (~18, all bounded batch-sized builds), AQE splits every driver
aggregate into map+result jobs, and commits are one write job per table.
All fixed per-batch overhead, independent of frontier size — at production
batch sizes the jobs are minutes of parallel work and the launches are
noise, which is the property that matters. Every per-row operation is a
column expression or an Arrow-batched pandas UDF; nothing iterates rows on
the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..functions.errors import backoff_seconds, classify_error, should_retry
from ..operators.dedup import mark_seen
from ..operators.frontier import (
    eligible,
    order_cols,
    contributing_buckets,
    priority_offsets,
    rank_slice,
    seed_frontier_from_site,
)
from ..operators.politeness import assign_waves, salted_repartition
from ..sources.iceberg import IcebergSnapshotTable
from ..sources.snapshots import CheckpointLog, SnapshotTable

#: both SnapshotTable-contract implementations — every "is this engine
#: attribute a state table" check must accept BOTH, or maintenance /
#: time-travel silently skips Iceberg-backed tables (the r5 iceberg soak
#: caught exactly that: vacuum_state skipping every table let the
#: metadata tree grow monotonically)
STATE_TABLE_TYPES = (SnapshotTable, IcebergSnapshotTable)
from ..sources.store import (
    fetch_and_validate,
    fetch_and_validate_http,
    join_payload_store,
)

LOGICAL_EPOCH = "2026-01-01 00:00:00"
TICK_SECONDS = 60  # logical seconds advanced per micro-batch
N_FRONTIER_BUCKETS = 64  # frontier partitioning: bucket = pmod(priority, 64)
HOT_HOST_SHARE = 0.10  # batch share above which a host gets salted


def _pin_active_session(spark: SparkSession) -> None:
    """Re-assert the JVM thread-local active session before each batch.

    ``SparkPlan.session`` is captured from ``getActiveSession`` at plan
    construction; a long-running driver (scripts/soak.py died at batch
    ~520 of a 1000-batch run) can hit a window where a planner thread
    sees no active session and builds nodes with ``session = null``,
    which then NPEs at the next action's ``resetMetrics``
    (``Cannot invoke SparkSession.sparkContext() ... session() is
    null``). One py4j call per batch; harmless when already set."""
    try:
        cls = getattr(spark._jvm, "org.apache.spark.sql.classic.SparkSession")
        cls.setActiveSession(spark._jsparkSession)
    except Exception:  # non-classic backends (connect) manage their own
        pass


def _persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of currently persisted RDDs (includes localCheckpoint blocks)."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    ids = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def _release_new_persistent_rdds(spark: SparkSession, before: set[int]) -> None:
    """Unpersist every RDD that became persistent after ``before`` was
    snapshotted (non-blocking). See CrawlEngine.run_batch for why explicit
    release beats waiting on the ContextCleaner."""
    it = spark.sparkContext._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() not in before:
            t._2().unpersist(False)


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
        bloom_min_seen: int = 20_000,
        bloom_capacity: int | None = None,
        bloom_shards_n: int = 32,
        bloom_partition_aligned: bool | None = None,
        max_storage_bytes: int | None = None,
        fetch_timeout_s: float = 600.0,
        seen_filter: str = "bloom",
        filter_fold_groups: int = 64,
        table_format: str = "parquet",
    ):
        self.root = root
        self.batch_size = batch_size
        self.per_host_parallelism = per_host_parallelism
        self.use_bloom = use_bloom
        self.n_partitions = n_partitions
        self.verify_phash = verify_phash
        self.bloom_min_seen = bloom_min_seen
        self.bloom_capacity = bloom_capacity
        self.bloom_shards_n = bloom_shards_n
        # None (default) = AUTO: broadcast probe for filters under
        # BLOOM_BROADCAST_MAX_BYTES (256 MB), partition-aligned cogroup
        # probe above — a 10^9+-key filter must never serialize through a
        # driver collect + broadcast per batch (the r4 phase probe measured
        # that serial slice directly). AUTO is resolved ONCE per engine
        # (_resolve_probe_aligned — geometry is fixed at init, so the
        # size-based choice never changes until regrow_filter) and run_batch
        # passes mark_seen the resolved bool: no per-batch geometry-lookup
        # job in the hot loop. Explicit True/False still forces a strategy
        # (tests pin both).
        self.bloom_partition_aligned = bloom_partition_aligned
        self._probe_aligned_cache: bool | None = None
        # "bloom" (append-only, 1% FPR default) or "cuckoo" (deletable,
        # ~0.012% FPR — operators/cuckoo.py). Same sharding/probe contract.
        if seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
        self.seen_filter = seen_filter
        # P9 storage gate (reference main_scraper.py:103-156): the crawl
        # stops admitting batches once cumulative validated payload bytes
        # reach the budget. Tracked in the checkpoint — no extra job.
        self.max_storage_bytes = max_storage_bytes
        # ST6 stall/timeout bound for the live fetch path (reference
        # idm_downloader.py:236-301: kill transfers stalled past the
        # window; video_processor.py:437: 600 s/item). The synthetic store
        # cannot stall; sources/store.http_fetch_rows consumes this.
        self.fetch_timeout_s = fetch_timeout_s
        # Filter maintenance is journaled: each batch APPENDS its newly-seen
        # keys to ``bloom_delta`` (O(new keys) write I/O) instead of
        # rewriting all bitset shards (O(m) — at 10^10-key sizing that was
        # ~12 GB re-serialized per micro-batch). Deltas fold into the base
        # bitsets lazily on read and durably once the journal reaches
        # ``filter_fold_groups`` file groups (and at compact_state cadence),
        # amortizing the O(m) rewrite over that many batches.
        self.filter_fold_groups = filter_fold_groups
        os.makedirs(root, exist_ok=True)
        # state tables go through the SnapshotTable contract; the backend
        # is selectable ("parquet" = manifest-over-parquet, "iceberg" =
        # Iceberg v2 metadata tree — sources/iceberg.py). The engine only
        # ever talks to the shared interface, so the two backends are
        # interchangeable (conformance: tests/test_iceberg_backend.py).
        from ..sources.iceberg import make_table

        self.table_format = table_format
        self._make_table = lambda name: make_table(root, name, table_format)
        self.frontier = self._make_table("frontier")
        self.seen = self._make_table("seen")
        self.failures = self._make_table("failures")
        self.payload_out = self._make_table("payload_out")
        self.schedule_log = self._make_table("schedule_log")
        self.robots = self._make_table("robots")
        self.bloom = self._make_table("bloom")
        self.bloom_delta = self._make_table("bloom_delta")
        self.checkpoints = CheckpointLog(root)

    # ------------------------------------------------------------- init

    def init(
        self,
        site_graph: DataFrame,
        robots: DataFrame | None = None,
        seen_seed: DataFrame | None = None,
    ) -> None:
        """Seed a new crawl. ``seen_seed``: (url_hash, image_id) rows
        imported from a prior crawl's seen table (``engine.seen_set``) —
        cross-crawl warm start, the reference's load-historic-IDs-at-startup
        (new/duplicate_detection.py:102-165). Imported rows commit with
        committed_seq=0 (pre-crawl) and fold into the seen filter at init,
        so this crawl marks them skipped_seen instead of refetching."""
        frontier = seed_frontier_from_site(site_graph).withColumn(
            "bucket", _bucket(F.col("priority"))
        )
        fv = self.frontier.commit_overwrite_bucketed(frontier, "bucket", origin="init")
        rv = self.robots.commit_overwrite(robots, origin="init") if robots is not None else 0
        sv, seed_count, bv = self._init_seen_filter(
            site_graph.sparkSession, site_graph.count(), seen_seed
        )
        self.checkpoints.commit(
            0,
            {
                "versions": {
                    "frontier": fv,
                    "seen": sv,
                    "failures": 0,
                    "payload_out": 0,
                    "schedule_log": 0,
                    "robots": rv,
                    "bloom": bv,
                    "bloom_delta": 0,
                },
                "next_seq": 1,
                "logical_s": 0.0,
                "seen_count": seed_count,
            },
        )

    def _init_seen_filter(
        self, spark: SparkSession, cap_base: int, seen_seed: DataFrame | None
    ) -> tuple[int, int, int]:
        """Shared init step for all plans (base + discovery): commit any
        imported seen rows and build the seen filter — bloom OR cuckoo per
        ``seen_filter`` — at its fixed init geometry, sized for
        ``cap_base`` expected URLs plus the import, with the imported keys
        folded in before the first commit. Returns (seen_version,
        seed_count, filter_version). One implementation on purpose: the
        two plans' init paths previously each carried a copy and drifted
        (the discovery copy ignored the cuckoo branch)."""
        sv, seed_count, seed_rows = 0, 0, None
        if seen_seed is not None:
            seed_rows = seen_seed.select("url_hash", "image_id").withColumn(
                "committed_seq", F.lit(0).cast("long")
            )
            seed_count = seed_rows.count()
            sv = self.seen.commit_overwrite(seed_rows, origin="init:seen_seed")
        bv = 0
        if self.use_bloom:
            # the incrementally-maintained seen-set filter (north rule):
            # geometry fixed at init. Never rebuilt — per-batch cost is
            # O(newly seen), not O(seen).
            cap = self.bloom_capacity or max((cap_base + seed_count) * 2, 10_000)
            if self.seen_filter == "cuckoo":
                from ..operators.cuckoo import empty_cuckoo_shards
                from ..operators.cuckoo import update_cuckoo_shards as _upd

                filt = empty_cuckoo_shards(spark, self.bloom_shards_n, cap)
            else:
                from ..operators.dedup import empty_bloom_shards
                from ..operators.dedup import update_bloom_shards as _upd

                filt = empty_bloom_shards(spark, self.bloom_shards_n, cap)
            if seed_rows is not None:
                filt = _upd(
                    filt, seed_rows.select("url_hash"), n_shards=self.bloom_shards_n
                )
            bv = self.bloom.commit_overwrite(filt, origin="init")
        return sv, seed_count, bv

    def _filter_upd(self):
        """The incremental insert op for the configured filter kind."""
        if self.seen_filter == "cuckoo":
            from ..operators.cuckoo import update_cuckoo_shards

            return update_cuckoo_shards
        from ..operators.dedup import update_bloom_shards

        return update_bloom_shards

    def _read_filter(self, spark: SparkSession, v: dict) -> DataFrame | None:
        """The seen filter as of checkpoint versions ``v``: base bitset
        shards with any outstanding journal keys folded in lazily (the fold
        runs executor-side per shard when the probe evaluates — the filter
        is never rebuilt from the seen log here). Read I/O is O(m) for the
        base + O(outstanding delta keys); write I/O per batch was the
        journal append, O(new keys)."""
        if not self.use_bloom:
            return None
        base = self.bloom.read(spark, int(v.get("bloom", 0)))
        if base is None:
            return None
        keys = self.bloom_delta.read(spark, int(v.get("bloom_delta", 0)))
        if keys is None:
            return base
        return self._filter_upd()(base, keys, n_shards=self.bloom_shards_n)

    def _resolve_probe_aligned(self, bloom_shards: DataFrame | None) -> bool | None:
        """Resolve the AUTO probe strategy ONCE per engine lifetime.

        The filter geometry is fixed at init, so the size-based
        broadcast-vs-aligned choice cannot change between batches; paying a
        geometry-lookup Spark job (``.first()`` through the lazy journal
        fold) on every run_batch would put a serial driver round-trip back
        into the hot loop. Resolution is cached on the engine and
        invalidated only by ``regrow_filter`` (the one op that changes
        geometry). Explicit ``bloom_partition_aligned`` bools bypass the
        lookup entirely."""
        if self.bloom_partition_aligned is not None:
            return self.bloom_partition_aligned
        if bloom_shards is None:
            return None
        if self._probe_aligned_cache is None:
            if self.seen_filter == "cuckoo":
                from ..operators.cuckoo import CUCKOO_BROADCAST_MAX_BYTES, SLOTS

                geom = bloom_shards.select("m_buckets").first()
                total = (
                    0
                    if geom is None
                    else int(geom["m_buckets"]) * SLOTS * 2 * self.bloom_shards_n
                )
                self._probe_aligned_cache = total > CUCKOO_BROADCAST_MAX_BYTES
            else:
                from ..operators.dedup import BLOOM_BROADCAST_MAX_BYTES

                geom = bloom_shards.select("m_bits").first()
                total = (
                    0
                    if geom is None
                    else int(geom["m_bits"]) // 8 * self.bloom_shards_n
                )
                self._probe_aligned_cache = total > BLOOM_BROADCAST_MAX_BYTES
        return self._probe_aligned_cache

    def _fold_filter(self, spark: SparkSession, v: dict, origin: str) -> dict | None:
        """Durably fold the delta journal into the base bitsets and truncate
        the journal — the amortized O(m) rewrite the per-batch path avoids.
        Mutates ``v`` in place with the new versions; the caller commits
        them in its checkpoint (base and journal flip together — a key is
        never in both, which matters for cuckoo where re-inserting a folded
        key would store a second copy)."""
        dv = int(v.get("bloom_delta", 0))
        keys = self.bloom_delta.read(spark, dv)
        if keys is None:
            return None
        base = self.bloom.read(spark, int(v.get("bloom", 0)))
        if base is None:
            return None
        folded = self._filter_upd()(base, keys, n_shards=self.bloom_shards_n)
        v["bloom"] = self.bloom.commit_overwrite(folded, origin=origin)
        v["bloom_delta"] = self.bloom_delta.truncate()
        return {"bloom": v["bloom"], "bloom_delta": v["bloom_delta"]}

    # ---------------------------------------------------------- helpers

    @staticmethod
    def _carry_state(ck: dict) -> dict:
        """State keys owned by subclasses/extensions (e.g. the discovery
        plan's site config) survive base-engine checkpoint writes."""
        reserved = {"batch_id", "versions", "next_seq", "logical_s", "seen_count", "stats"}
        return {k: val for k, val in ck.items() if k not in reserved}

    def _logical_ts(self, logical_s: float) -> F.Column:
        return F.to_timestamp(F.lit(LOGICAL_EPOCH)) + F.make_dt_interval(secs=F.lit(logical_s))

    def _annotate_robots(self, batch: DataFrame, robots: DataFrame | None) -> DataFrame:
        """Add ``blocked`` + ``crawl_delay_ms`` via a broadcast join against
        the robots cache — the cache-as-broadcast-table of the north rule.
        URL blocked iff its path matches a disallow prefix for its host."""
        if robots is None:
            return batch.withColumn("blocked", F.lit(False)).withColumn(
                "crawl_delay_ms", F.lit(0)
            )
        from ..functions.urlnorm import url_path

        joined = batch.join(F.broadcast(robots), "host", "left")
        path = url_path(F.col("url"))
        blocked_expr = F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array()),
            lambda p: path.startswith(p),
        )
        return (
            joined.withColumn("blocked", blocked_expr)
            .withColumn("crawl_delay_ms", F.coalesce(F.col("crawl_delay_ms"), F.lit(0)))
            .drop("disallow_prefixes")
        )

    # ------------------------------------------------------------ batch

    def run_batch(self, spark: SparkSession) -> dict | None:
        """Run one micro-batch. Returns the batch's metric dict, or None
        when the crawl is complete.

        Wraps the batch in explicit checkpoint-block release:
        ``localCheckpoint`` pins its partitions in the block manager until
        the driver's ContextCleaner happens to GC the RDD handle — on a
        large driver heap that lags minutes-to-never, so per-batch blocks
        accumulate without bound (scripts/soak.py measured a ~16 GB heap
        and +0.3 s/100-batches p50 creep by batch 800 of a toy crawl).
        The engine is the single writer while a batch runs, so every
        persistent RDD that APPEARS during the batch is the batch's own
        checkpoint — safe to unpersist once the commits are durable.
        Pre-existing persisted RDDs (a user's cached analytics tables) are
        untouched."""
        _pin_active_session(spark)
        before = _persistent_rdd_ids(spark)
        try:
            return self._run_batch(spark)
        finally:
            _release_new_persistent_rdds(spark, before)

    def _run_batch(self, spark: SparkSession) -> dict | None:
        ck = self.checkpoints.latest()
        assert ck is not None, "call init() first"
        v = ck["versions"]
        batch_id = ck["batch_id"] + 1
        logical_s = float(ck["logical_s"]) + TICK_SECONDS
        next_seq = int(ck["next_seq"])
        seen_count = int(ck.get("seen_count", 0))
        bytes_total = int(ck.get("payload_bytes_total", 0))

        # -- P9 storage gate: stop admitting batches past the byte budget --
        if self.max_storage_bytes is not None and bytes_total >= self.max_storage_bytes:
            return None

        seen = self.seen.read(spark, v["seen"])
        robots = self.robots.read(spark, v["robots"])
        bloom_shards = self._read_filter(spark, v)
        now = self._logical_ts(logical_s)

        # -- take the micro-batch (window-ranked priority queue) ------------
        # Phase 1 (cutoff): an aggregate over eligibility METADATA only —
        # three columns reach the parquet scan, everything else is pruned.
        frontier_full = self.frontier.read(spark, v["frontier"])
        if frontier_full is None:
            # never-seeded OR still-empty (a discovery plan whose only
            # remaining work is a backing-off listing page): the clock-jump
            # path decides — _next_retry_ts is subclass-aware, so a pending
            # listing retry jumps the clock instead of ending the crawl
            return self._clock_jump_or_done(
                spark, ck, v, batch_id, next_seq, seen_count
            )
        frontier_meta = frontier_full.select("priority", "status", "next_attempt_ts")
        # Phase 1 (cutoff): DISTRIBUTED offset table (priority_offsets) —
        # driver work is O(priority ranges), never O(contributing
        # priorities); at a 10^6-contributing-priority production batch
        # the old list form's collect + Python cumulate + createDataFrame
        # was a serial multi-second slice of every batch.
        offsets = priority_offsets(
            eligible(frontier_meta, logical_now=now), self.batch_size
        )
        if offsets is None:
            # nothing eligible now — if retryable failures exist in the
            # future, jump the logical clock to the earliest retry time.
            return self._clock_jump_or_done(
                spark, ck, v, batch_id, next_seq, seen_count
            )
        # Phase 2 (rank): manifest-level partition pruning — read ONLY the
        # frontier buckets that hold contributing priorities. Scan volume
        # is O(batch priority buckets), not O(frontier); the bucket list
        # is a ≤N_FRONTIER_BUCKETS-row collect off the checkpointed
        # offsets, not a frontier pass.
        need_buckets = contributing_buckets(offsets, N_FRONTIER_BUCKETS)
        pruned = self.frontier.read_buckets(spark, need_buckets, v["frontier"])
        batch = rank_slice(
            eligible(pruned, logical_now=now), offsets, self.batch_size
        ).drop("seq")

        # -- annotate lazily, pin once --------------------------------------
        # in-batch duplicate guard (reference P1 dedupes within a page)
        wdup = Window.partitionBy("url_hash").orderBy(*order_cols())
        batch = batch.withColumn("__dup", F.row_number().over(wdup) > 1)
        seen_keys = seen.select("url_hash") if seen is not None else None
        batch = mark_seen(
            batch,
            seen_keys,
            use_bloom=self.use_bloom,
            seen_count=seen_count,
            bloom_min_seen=self.bloom_min_seen,
            bloom_shards=bloom_shards,
            n_shards=self.bloom_shards_n,
            bloom_partition_aligned=self._resolve_probe_aligned(bloom_shards),
            filter_kind=self.seen_filter,
        )
        batch = batch.withColumn("is_seen", F.col("is_seen") | F.col("__dup")).drop("__dup")
        batch = self._annotate_robots(batch, robots)
        sched = (~F.col("is_seen")) & (~F.col("blocked"))
        # global crawl-order seq: running count of scheduled rows in crawl
        # order. A single-reducer window, but over ≤ batch_size rows — the
        # price of exact reference-order reproduction, bounded by design.
        wseq = Window.orderBy(*order_cols()).rowsBetween(Window.unboundedPreceding, 0)
        batch = batch.withColumn(
            "seq",
            F.when(sched, F.sum(sched.cast("long")).over(wseq) + F.lit(next_seq - 1)).cast(
                "long"
            ),
        )
        batch = batch.localCheckpoint(eager=True)

        # -- ONE stats pass: totals, hot hosts, touched buckets, id range ---
        host_rows = (
            batch.groupBy("host")
            .agg(
                F.count("*").alias("n"),
                F.count_if(F.col("is_seen")).alias("n_seen"),
                F.count_if(~F.col("is_seen") & F.col("blocked")).alias("n_blocked"),
                F.count_if(sched).alias("n_sched"),
                F.count_if(F.col("status") == "pending").alias("n_was_pending"),
                F.collect_set(_bucket(F.col("priority"))).alias("buckets"),
                F.min(F.when(sched, F.col("image_id"))).alias("min_id"),
                F.max(F.when(sched, F.col("image_id"))).alias("max_id"),
            )
            .collect()
        )
        n_sched = sum(r["n_sched"] for r in host_rows)
        n_skipped = sum(r["n_seen"] for r in host_rows)
        n_blocked = sum(r["n_blocked"] for r in host_rows)
        n_was_pending = sum(r["n_was_pending"] for r in host_rows)
        hot_hosts = [r["host"] for r in host_rows if r["n_sched"] > HOT_HOST_SHARE * max(n_sched, 1)]
        touched = sorted({b for r in host_rows for b in r["buckets"]})
        sched_ids = [r["min_id"] for r in host_rows if r["min_id"] is not None] + [
            r["max_id"] for r in host_rows if r["max_id"] is not None
        ]
        id_range = (min(sched_ids), max(sched_ids)) if sched_ids else None

        # -- fetch + validate ------------------------------------------------
        scheduled = batch.filter(sched)
        results = None
        n_ok = n_bad = 0
        total_bytes = 0
        if n_sched > 0:
            # waves first (bounded batch, pinned) — then the origin;
            # assign_waves runs a small counts aggregate, which must scan
            # the checkpointed batch, not the origin-join lineage
            waved = assign_waves(scheduled, self.per_host_parallelism)
            if self._origin_kind == "http":
                # LIVE origin: no payload table exists — each salted
                # partition GETs its own rows (reference
                # file_downloader.py:206-282 as the production path)
                placed = salted_repartition(
                    waved, self.n_partitions, hot_hosts=hot_hosts
                )
                results = fetch_and_validate_http(
                    placed,
                    timeout_s=self.fetch_timeout_s,
                    max_body_bytes=self._max_body_bytes,
                ).localCheckpoint(eager=True)
            else:
                payload = self._payload_store(spark)
                fault_bc = self._fault_bc(spark)
                withp = join_payload_store(waved, payload, id_range=id_range)
                placed = salted_repartition(
                    withp, self.n_partitions, hot_hosts=hot_hosts
                )
                results = fetch_and_validate(
                    placed, fault_bc, self.verify_phash
                ).localCheckpoint(eager=True)
            # scheduled rows with no origin payload row = 404s (synthesized
            # here so the payload join stays a broadcast inner join)
            missing = scheduled.join(
                F.broadcast(results.select("url_hash")), "url_hash", "left_anti"
            ).select(
                "url",
                "url_hash",
                "host",
                "image_id",
                "priority",
                "position",
                "attempts",
                "seq",
                F.lit(False).alias("ok"),
                F.lit("HTTP 404 not found").alias("error_msg"),
                F.lit(None).cast("binary").alias("bytes"),
                F.lit(None).cast("int").alias("w"),
                F.lit(None).cast("int").alias("h"),
                F.lit(None).cast("string").alias("fmt"),
                F.lit(None).cast("string").alias("caption"),
                F.lit(None).cast("long").alias("phash"),
                F.lit(None).cast("int").alias("fetch_wave"),
            )
            results = results.unionByName(missing)
            rstats = results.agg(
                F.count("*").alias("n"),
                F.count_if(F.col("ok")).alias("n_ok"),
                F.coalesce(F.sum(F.length("bytes")), F.lit(0)).alias("bytes"),
            ).collect()[0]
            n_ok, total_bytes = int(rstats["n_ok"]), int(rstats["bytes"])
            n_bad = int(rstats["n"]) - n_ok

        # -- commits ----------------------------------------------------------
        ok = results.filter(F.col("ok")) if results is not None else None
        pv, sv, fv2 = v["payload_out"], v["seen"], v["failures"]
        bv, dv = v.get("bloom", 0), v.get("bloom_delta", 0)
        if n_ok > 0:
            new_payload = ok.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
            pv = self.payload_out.commit_append(
                new_payload, base_version=v["payload_out"], origin=f"batch:{batch_id}"
            )
            new_seen = ok.select("url_hash", "image_id", F.col("seq").alias("committed_seq"))
            sv = self.seen.commit_append(
                new_seen, base_version=v["seen"], origin=f"batch:{batch_id}"
            )
            if bloom_shards is not None:
                # incremental maintenance, O(new keys) in WRITE I/O too:
                # journal the newly-seen keys (never rewrite the bitsets
                # here); reads fold the journal lazily. Once the journal
                # reaches filter_fold_groups file groups, fold durably —
                # the O(m) bitset rewrite amortizes over that many batches.
                dv = self.bloom_delta.commit_append(
                    new_seen.select("url_hash"),
                    base_version=dv,
                    origin=f"batch:{batch_id}",
                )
                if len(self.bloom_delta.lineage(dv)) >= self.filter_fold_groups:
                    vv = {"bloom": bv, "bloom_delta": dv}
                    self._fold_filter(spark, vv, origin=f"fold:{batch_id}")
                    bv, dv = vv["bloom"], vv["bloom_delta"]

        failed_rows = None
        if n_bad > 0:
            failed_rows = (
                results.filter(~F.col("ok"))
                .withColumn("error_class", classify_error("error_msg"))
                .withColumn("attempts_new", F.col("attempts") + 1)
                .withColumn("retry", should_retry("error_class", "attempts_new"))
            )
            new_failures = failed_rows.select(
                "url_hash",
                "url",
                "image_id",
                "error_class",
                F.col("attempts_new").alias("attempts"),
                (~F.col("retry")).alias("permanent"),
                F.lit(next_seq + n_sched).alias("last_attempt_seq"),
            )
            fv2 = self.failures.commit_append(
                new_failures, base_version=v["failures"], origin=f"batch:{batch_id}"
            )

        tv = v["schedule_log"]
        if n_sched > 0:
            trace = scheduled.select(
                "seq", "url", "url_hash", "image_id", F.lit(batch_id).alias("batch_id")
            )
            tv = self.schedule_log.commit_append(
            trace, base_version=v["schedule_log"], origin=f"batch:{batch_id}"
        )

        # -- frontier bucket merge --------------------------------------------
        null_str = F.lit(None).cast("string")
        null_ts = F.lit(None).cast("timestamp")
        parts = []
        if n_ok > 0:
            parts.append(
                ok.select(
                    "url", "url_hash", "host", "image_id", "priority", "position",
                    F.lit("done").alias("status"), F.col("attempts"),
                    null_str.alias("error_class"), null_ts.alias("next_attempt_ts"),
                )
            )
        if n_bad > 0:
            parts.append(
                failed_rows.select(
                    "url", "url_hash", "host", "image_id", "priority", "position",
                    F.when(F.col("retry"), "failed").otherwise("permanent").alias("status"),
                    F.col("attempts_new").alias("attempts"),
                    F.col("error_class"),
                    F.when(
                        F.col("retry"),
                        now
                        + F.make_dt_interval(
                            secs=backoff_seconds("error_class", "attempts_new")
                        ),
                    ).otherwise(null_ts).alias("next_attempt_ts"),
                )
            )
        if n_blocked > 0:
            parts.append(
                batch.filter(~F.col("is_seen") & F.col("blocked")).select(
                    "url", "url_hash", "host", "image_id", "priority", "position",
                    F.lit("robots_blocked").alias("status"), F.col("attempts"),
                    F.lit("robots").alias("error_class"), null_ts.alias("next_attempt_ts"),
                )
            )
        if n_skipped > 0:
            # already-seen rows leave the pending set (reference P2 skip)
            parts.append(
                batch.filter(F.col("is_seen")).select(
                    "url", "url_hash", "host", "image_id", "priority", "position",
                    F.lit("skipped_seen").alias("status"), F.col("attempts"),
                    null_str.alias("error_class"), null_ts.alias("next_attempt_ts"),
                )
            )
        updates = parts[0]
        for p in parts[1:]:
            updates = updates.unionByName(p)
        updates = updates.withColumn("bucket", _bucket(F.col("priority")))
        # touched ⊆ need_buckets (batch priorities come from `contributing`),
        # so the merge reads the already-pruned slice — never the full table
        old_buckets = pruned.withColumn("bucket", _bucket(F.col("priority"))).filter(
            F.col("bucket").isin(touched)
        )
        merged_buckets = old_buckets.join(
            F.broadcast(updates.select("url_hash").distinct()), "url_hash", "left_anti"
        ).unionByName(updates)
        nfv = self.frontier.commit_merge_buckets(
            merged_buckets, "bucket", touched, base_version=v["frontier"],
            origin=f"batch:{batch_id}",
        )

        stats = {
            "batch_id": batch_id,
            "scheduled": n_sched,
            "dedup_skipped": n_skipped,
            "robots_blocked": n_blocked,
            "fetched_ok": n_ok,
            "failed": n_bad,
            "bytes": total_bytes,
        }
        state = {
            **self._carry_state(ck),
            "versions": {
                **v,  # preserve versions of tables this engine doesn't touch
                "frontier": nfv,
                "seen": sv,
                "failures": fv2,
                "payload_out": pv,
                "schedule_log": tv,
                "robots": v["robots"],
                "bloom": bv,
                "bloom_delta": dv,
            },
            "next_seq": next_seq + n_sched,
            "logical_s": logical_s,
            "seen_count": seen_count + n_ok,
            "payload_bytes_total": bytes_total + total_bytes,
            "stats": stats,
        }
        if "pending_detail" in ck:
            # discovery plan's counter: batch rows that WERE pending left
            # that state this batch (failed/retry rows were not pending)
            state["pending_detail"] = int(ck["pending_detail"]) - n_was_pending
        self.checkpoints.commit(batch_id, state)
        return stats

    def _next_retry_ts(self, spark: SparkSession, v: dict):
        """Earliest future moment any retryable work becomes eligible (None
        when the crawl is genuinely done). Subclasses with extra retryable
        state — the discovery plan's listing pages — override and min() in
        their own tables' retry times."""
        frontier = self.frontier.read(spark, v["frontier"])
        if frontier is None:
            return None
        return (
            frontier.filter(F.col("status") == "failed")
            .agg(F.min("next_attempt_ts").alias("t"))
            .collect()[0]["t"]
        )

    def _clock_jump_or_done(
        self, spark: SparkSession, ck: dict, v: dict, batch_id: int,
        next_seq: int, seen_count: int,
    ) -> dict | None:
        """No eligible rows: crawl is complete (None) unless retryable
        failures exist in the future — then jump the logical clock to the
        earliest retry time. Rare path: the full-frontier scan here runs
        only on empty batches, never per scheduled batch."""
        nxt = self._next_retry_ts(spark, v)
        if nxt is None:
            return None
        self.checkpoints.commit(
            batch_id,
            {
                **self._carry_state(ck),
                "versions": v,
                "next_seq": next_seq,
                "logical_s": self._ts_to_logical(nxt),
                "seen_count": seen_count,
            },
        )
        return {"batch_id": batch_id, "scheduled": 0, "clock_jump": True}

    def run(
        self,
        spark: SparkSession,
        max_batches: int = 1000,
        transient_retries: int = 2,
    ) -> list[dict]:
        """Run micro-batches to completion (or ``max_batches``).

        A multi-day crawl driver WILL see transient faults (an executor
        OOM, a planner hiccup, a blip in the storage layer). The batch is
        the engine's unit of recovery: every batch re-reads the last
        checkpoint and partial commits are orphaned by base_version
        protection, so a failed batch is simply re-run — the same
        semantics as killing the driver and resuming, without the restart.
        ``transient_retries`` bounds consecutive re-runs of ONE batch
        (a deterministic failure should surface, not loop); 0 disables."""
        out = []
        for _ in range(max_batches):
            attempts = 0
            while True:
                try:
                    s = self.run_batch(spark)
                    break
                except Exception:
                    attempts += 1
                    if attempts > transient_retries:
                        raise
            if s is None:
                break
            out.append(s)
        return out

    # --------------------------------------------------------- maintenance

    #: append-log tables that grow one file group per micro-batch and are
    #: the compaction targets; frontier/robots/bloom rewrite whole
    #: groups/buckets per commit and never fragment
    _APPEND_LOGS = ("seen", "failures", "payload_out", "schedule_log")

    def compact_state(
        self, spark: SparkSession, target_partitions: int | None = None
    ) -> dict[str, int]:
        """Compact the append-log state tables and checkpoint the compacted
        versions (Iceberg ``rewrite_data_files`` as an engine maintenance
        pass). After 10^4 micro-batches each log is 10^4 file groups; reads
        (resume, seen rebuild, audits) union all of them — this folds each
        log back to one group. Row-preserving, so the crawl trace, seen set
        and failure merge-on-read are byte-identical afterwards (asserted in
        tests/test_maintenance.py). Run quiesced, between run() calls, like
        any commit — the checkpoint it writes is what makes the compacted
        versions visible to the next batch/resume (without it, later appends
        would stack on the pre-compaction version and the work would be
        orphaned). Mirrors the reference's folder-tree rescan/cleanup duty
        (new/progress_handler.py:147-178) at the table layer."""
        ck = self.checkpoints.latest()
        if ck is None:
            raise RuntimeError("compact_state: no checkpoint — init() first")
        v = dict(ck["versions"])
        out = {}
        for name in self._APPEND_LOGS:
            nv = getattr(self, name).compact(
                spark, base_version=int(v.get(name, 0)),
                target_partitions=target_partitions,
            )
            out[name] = v[name] = nv
        # the filter delta journal folds (not compacts) — outstanding key
        # groups merge into the base bitsets and the journal truncates, so
        # post-compaction filter reads are a single O(m) base read again
        if self.use_bloom:
            folded = self._fold_filter(spark, v, origin="fold:compact")
            if folded is not None:
                out.update(folded)
        state = {
            **self._carry_state(ck),
            "versions": v,
            "next_seq": ck["next_seq"],
            "logical_s": ck["logical_s"],
            "seen_count": ck["seen_count"],
        }
        # deliberately NOT carrying ck["stats"]: metrics() emits one row
        # set per checkpoint that has stats, so re-carrying the previous
        # batch's counters would double-count that batch
        self.checkpoints.commit(int(ck["batch_id"]) + 1, state)
        return out

    def requeue(self, spark: SparkSession, url_hashes: DataFrame) -> dict:
        """Recrawl: re-open previously crawled URLs (recrawl window /
        retraction — the operation the deletable cuckoo seen-set exists
        for). For each key in ``url_hashes.url_hash``:

          * its seen rows are removed (anti-join rewrite of the seen log —
            a compaction-sized maintenance op, O(seen));
          * its stored payload rows are retracted (anti-join rewrite of
            payload_out on the removed rows' image_ids) — a retraction
            must not leave the retracted bytes live, and without it a
            recrawl would append a second payload row per image_id;
          * its key leaves the seen filter: cuckoo deletes in place
            (operators/cuckoo.delete_cuckoo_shards); Bloom cannot delete,
            so the filter is rebuilt at its existing fixed geometry from
            the remaining seen keys (O(seen), documented trade of the
            non-deletable filter);
          * its frontier row flips back to pending with attempts reset,
            via a per-bucket merge touching only the affected priority
            buckets;
          * a maintenance checkpoint commits the new versions (without it
            the next batch would resume pre-requeue state).

        Run quiesced, between run() calls, like compact_state. The requeue
        set is broadcast — it is batch-sized by assumption (a recrawl
        window's expiry slice), not corpus-sized."""
        ck = self.checkpoints.latest()
        if ck is None:
            raise RuntimeError("requeue: no checkpoint — init() first")
        v = dict(ck["versions"])
        keys = url_hashes.select("url_hash").distinct().localCheckpoint(eager=True)

        seen = self.seen.read(spark, int(v["seen"]))
        n_removed, seen_keys = 0, None
        if seen is not None:
            # only keys ACTUALLY in the seen set may touch the filter: a
            # cuckoo delete of a never-inserted key can evict a colliding
            # seen key's fingerprint → false negative → duplicate fetch
            removed_rows = seen.join(F.broadcast(keys), "url_hash", "semi")
            seen_keys = (
                removed_rows.select("url_hash").distinct().localCheckpoint(eager=True)
            )
            n_removed = seen_keys.count()
            remaining = seen.join(F.broadcast(keys), "url_hash", "left_anti")
            v["seen"] = self.seen.commit_overwrite(remaining, origin="requeue")
            if n_removed > 0:
                # retract the requeued rows' stored payloads in the same
                # maintenance commit — the seen log maps url_hash →
                # image_id, and payload rows only exist for seen rows.
                # O(payload) rewrite, same class as the O(seen) rewrite
                # above; requeue is a quiesced maintenance op by contract.
                payload = self.payload_out.read(spark, int(v["payload_out"]))
                if payload is not None:
                    removed_ids = removed_rows.select("image_id").distinct()
                    kept = payload.join(
                        F.broadcast(removed_ids), "image_id", "left_anti"
                    )
                    v["payload_out"] = self.payload_out.commit_overwrite(
                        kept, origin="requeue"
                    )

        filter_mode = "none"
        if self.use_bloom and n_removed > 0:
            # the folded view (base + outstanding journal keys): deletes and
            # rebuilds must see every inserted key, so the journal folds
            # here and truncates in the same checkpoint
            shards = self._read_filter(spark, v)
            if self.seen_filter == "cuckoo":
                from ..operators.cuckoo import delete_cuckoo_shards

                new_shards = delete_cuckoo_shards(
                    shards, seen_keys, n_shards=self.bloom_shards_n
                )
                filter_mode = "cuckoo-delete"
            else:
                from ..operators.dedup import BLOOM_SHARD_SCHEMA, update_bloom_shards

                g = shards.select("m_bits", "k").first()
                zero = bytes(int(g["m_bits"]) // 8)
                empty = spark.createDataFrame(
                    [
                        (s, int(g["m_bits"]), int(g["k"]), zero)
                        for s in range(self.bloom_shards_n)
                    ],
                    schema=BLOOM_SHARD_SCHEMA,
                )
                rebuilt_from = self.seen.read(spark, int(v["seen"]))
                new_shards = (
                    update_bloom_shards(
                        empty,
                        rebuilt_from.select("url_hash"),
                        n_shards=self.bloom_shards_n,
                    )
                    if rebuilt_from is not None
                    else empty
                )
                filter_mode = "bloom-rebuild"
            v["bloom"] = self.bloom.commit_overwrite(new_shards, origin="requeue")
            v["bloom_delta"] = self.bloom_delta.truncate()

        frontier = self.frontier.read(spark, int(v["frontier"]))
        n_requeued = n_new_pending = 0
        if frontier is not None:
            affected = frontier.join(F.broadcast(keys), "url_hash", "inner")
            # rows entering pending that weren't: the discovery plan's
            # pending_detail counter must grow by exactly this many
            n_new_pending = affected.filter(F.col("status") != "pending").count()
            null_str = F.lit(None).cast("string")
            null_ts = F.lit(None).cast("timestamp")
            updates = affected.select(
                "url", "url_hash", "host", "image_id", "priority", "position",
                F.lit("pending").alias("status"), F.lit(0).alias("attempts"),
                null_str.alias("error_class"), null_ts.alias("next_attempt_ts"),
            ).withColumn("bucket", _bucket(F.col("priority"))).localCheckpoint(eager=True)
            n_requeued = updates.count()
            if n_requeued > 0:
                touched = [
                    r["bucket"] for r in updates.select("bucket").distinct().collect()
                ]
                old = (
                    self.frontier.read_buckets(spark, touched, int(v["frontier"]))
                    .withColumn("bucket", _bucket(F.col("priority")))
                    .join(F.broadcast(keys), "url_hash", "left_anti")
                )
                v["frontier"] = self.frontier.commit_merge_buckets(
                    old.unionByName(updates), "bucket", touched,
                    base_version=int(v["frontier"]), origin="requeue",
                )

        state = {
            **self._carry_state(ck),
            "versions": v,
            "next_seq": ck["next_seq"],
            "logical_s": ck["logical_s"],
            "seen_count": int(ck["seen_count"]) - n_removed,
        }
        # no ck["stats"] carry (metrics() would double-count that batch)
        if "pending_detail" in ck:
            state["pending_detail"] = int(ck["pending_detail"]) + n_new_pending
        self.checkpoints.commit(int(ck["batch_id"]) + 1, state)
        return {
            "requeued": n_requeued,
            "seen_removed": n_removed,
            "filter": filter_mode,
        }

    def add_seeds(
        self,
        spark: SparkSession,
        site_graph: DataFrame,
        extra_state: dict | None = None,
    ) -> dict:
        """Mid-crawl seed injection: append NEW frontier rows from an
        incremental site-graph delta — the continuous-crawl operation the
        reference performs implicitly by re-running discovery on every
        service restart (scraper_service.py:105-143 restarts re-scan the
        listing; here new listing/seed batches arrive WHILE the crawl
        runs, e.g. from a sitemap refresh or the streaming bridge in
        streaming/seeds.py).

        Semantics:

          * the delta is canonicalized/hashed through the same
            ``seed_frontier_from_site`` path as ``init`` (priority = page,
            so injected pages slot into the global priority order);
          * in-delta duplicates collapse (reference P1 in-page dedupe) and
            rows whose url_hash ALREADY exists in the frontier — any
            status — are dropped (idempotent under replay; a URL the crawl
            already finished is not re-opened: that is ``requeue``'s job);
          * already-SEEN urls (warm-start imports) are NOT filtered here —
            the batch path marks them skipped_seen exactly like init-time
            seeds (reference P2 semantics preserved);
          * appended rows bucket-merge into the frontier (O(touched
            buckets) write, manifest reuse for the rest) and the discovery
            plan's ``pending_detail`` counter grows by the rows added;
          * ``extra_state`` entries land in the SAME maintenance
            checkpoint — the streaming bridge stores its batch-id fence
            there, making ingest exactly-once under foreachBatch replay.

        Quiesced single-writer contract like requeue: call between
        ``run()`` calls, never concurrently with a batch. Filter capacity
        note: injected URLs insert into the seen filter when fetched, so
        size ``bloom_capacity`` at init for the expected TOTAL (or
        ``regrow_filter`` when ``seen_count`` nears capacity)."""
        from ..operators.frontier import order_cols, seed_frontier_from_site

        ck = self.checkpoints.latest()
        if ck is None:
            raise RuntimeError("add_seeds: no checkpoint — init() first")
        v = dict(ck["versions"])
        # deterministic in-delta survivor: same window dup-guard as the
        # batch path's P1 dedupe (run_batch) — dropDuplicates would keep
        # an ARBITRARY row, making the surviving priority/position (and
        # hence the crawl trace) nondeterministic across runs when a
        # delta carries one URL on two pages/positions
        wdup = Window.partitionBy("url_hash").orderBy(*order_cols())
        fresh = (
            seed_frontier_from_site(site_graph)
            .withColumn("__rn", F.row_number().over(wdup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("bucket", _bucket(F.col("priority")))
        )
        existing = self.frontier.read(spark, int(v["frontier"]))
        if existing is not None:
            fresh = fresh.join(
                existing.select("url_hash"), "url_hash", "left_anti"
            )
        fresh = fresh.localCheckpoint(eager=True)
        n_added = fresh.count()
        if n_added > 0:
            touched = [
                r["bucket"] for r in fresh.select("bucket").distinct().collect()
            ]
            old = self.frontier.read_buckets(spark, touched, int(v["frontier"]))
            merged = fresh if old is None else (
                old.withColumn("bucket", _bucket(F.col("priority"))).unionByName(fresh)
            )
            v["frontier"] = self.frontier.commit_merge_buckets(
                merged, "bucket", touched,
                base_version=int(v["frontier"]), origin="add_seeds",
            )
        state = {
            **self._carry_state(ck),
            **(extra_state or {}),
            "versions": v,
            "next_seq": ck["next_seq"],
            "logical_s": ck["logical_s"],
            "seen_count": ck["seen_count"],
        }
        if "pending_detail" in ck:
            state["pending_detail"] = int(ck["pending_detail"]) + n_added
        self.checkpoints.commit(int(ck["batch_id"]) + 1, state)
        return {"added": n_added}

    def recrawl_stale(
        self,
        spark: SparkSession,
        older_than_seq: int | None = None,
        before_batch: int | None = None,
    ) -> dict:
        """Staleness-driven recrawl: requeue every fetched URL whose
        payload was committed at or below a sequence horizon (reference
        behavior: the scraper re-scans existing pages on every run and
        re-downloads anything missing/changed — main.py re-crawl loop;
        here the horizon expresses "content older than X is stale").

        The seen log's ``committed_seq`` is the engine's logical clock
        (global crawl order), so age is expressed in it directly:

          * ``older_than_seq`` — explicit horizon; or
          * ``before_batch`` — everything fetched before checkpoint
            ``before_batch`` began, i.e. ``next_seq`` of checkpoint
            ``before_batch - 1`` (time-travel derived, so the horizon is
            exactly the trace prefix boundary ``crawl_order_at`` exposes).

        Thin by design: horizon selection composes with :meth:`requeue`,
        which owns the invariants (filter delete/rebuild, payload
        retraction, bucket-merged frontier flip, maintenance checkpoint).
        Same quiesced single-writer contract as requeue."""
        if (older_than_seq is None) == (before_batch is None):
            raise ValueError(
                "recrawl_stale: pass exactly one of older_than_seq / before_batch"
            )
        if before_batch is not None:
            ck = self.checkpoint_at(int(before_batch) - 1)
            if ck is None:
                raise KeyError(
                    f"recrawl_stale: no checkpoint for batch_id={int(before_batch) - 1}"
                )
            older_than_seq = int(ck["next_seq"]) - 1
        seen = self.seen_set(spark)
        if seen is None:
            return {"requeued": 0, "seen_removed": 0, "filter": "none"}
        stale = seen.filter(F.col("committed_seq") <= int(older_than_seq)).select(
            "url_hash"
        )
        return self.requeue(spark, stale)

    def refresh_robots(self, spark: SparkSession, robots: DataFrame) -> dict:
        """Swap the robots rules table mid-crawl and re-gate the unfetched
        frontier (a multi-day crawl outlives its robots.txt snapshot; the
        reference re-reads robots implicitly on every restart — here it is
        an explicit quiesced maintenance op, like requeue).

        Effects, all in ONE maintenance checkpoint:

          * the robots table is overwritten (future batches pace with the
            new ``crawl_delay_ms`` automatically — the batch path re-joins
            robots every batch);
          * ``robots_blocked`` rows whose URL the new rules ALLOW flip back
            to pending (attempts preserved — they were gated, not failed);
          * pending/failed rows the new rules DISALLOW flip to
            ``robots_blocked`` (their retry state is superseded: a
            disallowed URL must not be fetched however many retries it had
            left);
          * fetched rows (done / skipped_seen) and permanent tombstones are
            untouched — rules govern future fetches, not history.

        Frontier writes are per-bucket merges of only the affected priority
        buckets (same machinery as requeue). The discovery plan's
        ``pending_detail`` counter moves by unblocked − (pending→blocked).
        Listing pages are NOT re-gated: the discovery plan treats listing
        scans as site structure, gating only detail fetches (discover.py).
        Quiesced single-writer contract, like all maintenance ops."""
        ck = self.checkpoints.latest()
        if ck is None:
            raise RuntimeError("refresh_robots: no checkpoint — init() first")
        v = dict(ck["versions"])
        v["robots"] = self.robots.commit_overwrite(robots, origin="refresh_robots")

        n_unblocked = n_blocked_pending = n_blocked_failed = 0
        frontier = self.frontier.read(spark, int(v["frontier"]))
        if frontier is not None:
            cand = frontier.filter(
                F.col("status").isin("pending", "failed", "robots_blocked")
            )
            ann = self._annotate_robots(cand, robots)
            null_str = F.lit(None).cast("string")
            null_ts = F.lit(None).cast("timestamp")
            changed = ann.filter(
                ((F.col("status") == "robots_blocked") & ~F.col("blocked"))
                | (F.col("status").isin("pending", "failed") & F.col("blocked"))
            )
            updates_all = changed.select(
                "url", "url_hash", "host", "image_id", "priority", "position",
                F.when(F.col("blocked"), "robots_blocked")
                .otherwise("pending")
                .alias("status"),
                "attempts",
                F.when(F.col("blocked"), "robots").otherwise(null_str).alias("error_class"),
                null_ts.alias("next_attempt_ts"),
                F.col("status").alias("old_status"),
            ).withColumn("bucket", _bucket(F.col("priority"))).localCheckpoint(eager=True)
            counts = {
                r["old_status"]: r["count"]
                for r in updates_all.groupBy("old_status").count().collect()
            }
            n_unblocked = int(counts.get("robots_blocked", 0))
            n_blocked_pending = int(counts.get("pending", 0))
            n_blocked_failed = int(counts.get("failed", 0))
            if n_unblocked + n_blocked_pending + n_blocked_failed > 0:
                updates = updates_all.drop("old_status")
                touched = [
                    r["bucket"] for r in updates.select("bucket").distinct().collect()
                ]
                keys = updates.select("url_hash")
                old = (
                    self.frontier.read_buckets(spark, touched, int(v["frontier"]))
                    .withColumn("bucket", _bucket(F.col("priority")))
                    .join(F.broadcast(keys), "url_hash", "left_anti")
                )
                v["frontier"] = self.frontier.commit_merge_buckets(
                    old.unionByName(updates), "bucket", touched,
                    base_version=int(v["frontier"]), origin="refresh_robots",
                )

        state = {
            **self._carry_state(ck),
            "versions": v,
            "next_seq": ck["next_seq"],
            "logical_s": ck["logical_s"],
            "seen_count": ck["seen_count"],
        }
        if "pending_detail" in ck:
            state["pending_detail"] = (
                int(ck["pending_detail"]) + n_unblocked - n_blocked_pending
            )
        self.checkpoints.commit(int(ck["batch_id"]) + 1, state)
        return {
            "unblocked": n_unblocked,
            "blocked_pending": n_blocked_pending,
            "blocked_failed": n_blocked_failed,
        }

    def regrow_filter(
        self, spark: SparkSession, capacity: int | None = None, growth: float = 4.0
    ) -> dict:
        """Rebuild the seen filter at a LARGER fixed geometry — the escape
        hatch for a crawl that outgrows its init capacity estimate. The
        geometry-fixed-at-init contract means a Bloom filter past its sizing
        degrades in FPR (more duplicate-fetch work, never wrong results)
        while the cuckoo filter's insert path eventually RAISES by contract
        (operators/cuckoo.py MAX_KICKS) — this op is what to run before
        either bites.

        Quiesced, single-writer, like compact_state: reads the seen log
        (the authoritative key set) at the checkpointed version, builds a
        fresh filter sized for ``capacity`` keys (default: ``growth`` ×
        current seen_count, floor 10k), commits it as the new base, and
        truncates the delta journal in the same checkpoint — an O(seen)
        maintenance pass, amortized over the crawl that follows.

        Reference parity: the reference has no analogue (its seen set is an
        unbounded Python set, new/duplicate_detection.py:102-165); this is
        the price of the bounded-memory filter and is listed as such in
        SURVEY.md §2.11."""
        ck = self.checkpoints.latest()
        if ck is None:
            raise RuntimeError("regrow_filter: no checkpoint — init() first")
        if not self.use_bloom:
            raise RuntimeError("regrow_filter: engine runs with use_bloom=False")
        v = dict(ck["versions"])
        seen_count = int(ck.get("seen_count", 0))
        cap = capacity if capacity is not None else max(int(seen_count * growth), 10_000)
        if self.seen_filter == "cuckoo":
            from ..operators.cuckoo import empty_cuckoo_shards
            from ..operators.cuckoo import update_cuckoo_shards as _upd

            fresh = empty_cuckoo_shards(spark, self.bloom_shards_n, cap)
            old_geom = new_geom = "m_buckets"
        else:
            from ..operators.dedup import empty_bloom_shards
            from ..operators.dedup import update_bloom_shards as _upd

            fresh = empty_bloom_shards(spark, self.bloom_shards_n, cap)
            old_geom = new_geom = "m_bits"
        old = self.bloom.read(spark, int(v.get("bloom", 0)))
        old_size = 0 if old is None else int(old.select(old_geom).first()[0])
        seen = self.seen.read(spark, int(v["seen"]))
        rebuilt = (
            _upd(fresh, seen.select("url_hash"), n_shards=self.bloom_shards_n)
            if seen is not None
            else fresh
        )
        v["bloom"] = self.bloom.commit_overwrite(rebuilt, origin="regrow")
        v["bloom_delta"] = self.bloom_delta.truncate()
        # geometry changed — the cached AUTO probe strategy must re-resolve
        self._probe_aligned_cache = None
        state = {
            **self._carry_state(ck),
            "versions": v,
            "next_seq": ck["next_seq"],
            "logical_s": ck["logical_s"],
            "seen_count": ck["seen_count"],
        }
        # no ck["stats"] carry (metrics() would double-count that batch)
        self.checkpoints.commit(int(ck["batch_id"]) + 1, state)
        new_size = int(rebuilt.select(new_geom).first()[0])
        return {
            "capacity": cap,
            "keys": seen_count,
            f"old_{old_geom}": old_size,
            f"new_{new_geom}": new_size,
        }

    def vacuum_state(self, keep_checkpoints: int = 1) -> dict[str, dict]:
        """Expire table snapshots no retained checkpoint references and
        collect unreferenced/orphaned data groups (Iceberg
        ``expire_snapshots`` + ``remove_orphan_files``). The horizon per
        table is the minimum version across the last ``keep_checkpoints``
        checkpoints, so every resume point that is kept stays fully
        readable; pass a larger ``keep_checkpoints`` to retain deeper
        time travel. Metadata + file ops only — no Spark jobs. Run
        quiesced, from the single writer."""
        cks = self.checkpoints.all()
        if not cks:
            return {}
        kept = cks[-max(1, keep_checkpoints):]
        out = {}
        # derive the table set from the checkpoint itself (same mechanism
        # as state_at) so subclass tables — e.g. the discovery plan's
        # listing — are vacuumed too, not just the base engine's list
        for name in kept[-1]["versions"]:
            table = getattr(self, name, None)
            if not isinstance(table, STATE_TABLE_TYPES):
                continue
            horizon = min(int(ck["versions"].get(name, 0)) for ck in kept)
            out[name] = table.vacuum(horizon)
        return out

    # -------------------------------------------------------- store hooks

    _payload_path: str | None = None
    _fault_plan: dict | None = None
    #: "store" (synthetic payload table) | "http" (live fetch of each url)
    _origin_kind: str = "store"
    _max_body_bytes: int | None = None

    def attach_store(self, payload_path: str, fault_plan: dict[str, tuple[str, int]] | None = None) -> None:
        """Point the engine at the synthetic origin: a parquet payload table
        and an optional fault plan {image_id: (mode, fail_count)}."""
        self._origin_kind = "store"
        self._payload_path = payload_path
        self._fault_plan = fault_plan or {}
        # re-attach invalidates the cached schema (a different table may
        # have different columns — reading it under the stale schema would
        # silently null them) and the cached fault broadcast
        self._payload_schema = None
        self._drop_fault_bc()

    def attach_http_origin(self, max_body_bytes: int | None = None) -> None:
        """Point the engine at a LIVE HTTP origin: every scheduled frontier
        url is fetched over the network by its salted partition
        (sources/store.fetch_and_validate_http) instead of joined against a
        payload table — the reference's production download path
        (file_downloader.py:206-282). ``fetch_timeout_s`` bounds each
        transfer (ST6); ``max_body_bytes`` aborts oversized bodies (the
        storage guard). Everything downstream — validation, retry/backoff,
        seen/payload commits, the trace — is identical to the synthetic
        origin, which is what tests/test_live_origin_e2e.py asserts."""
        self._origin_kind = "http"
        self._max_body_bytes = max_body_bytes

    _payload_schema = None

    def _payload_store(self, spark: SparkSession) -> DataFrame:
        assert self._payload_path, "attach_store() first"
        # schema cached after the first read — the payload table is read
        # every batch and re-inferring footers is a job launch per batch
        if self._payload_schema is not None:
            return spark.read.schema(self._payload_schema).parquet(self._payload_path)
        df = spark.read.parquet(self._payload_path)
        self._payload_schema = df.schema
        return df

    _fault_bc_cache = None  # (broadcast, SparkContext) — one per attach

    def _fault_bc(self, spark: SparkSession):
        """Broadcast of the fault plan, created ONCE per attach_store and
        reused every batch. A fresh broadcast per batch is an O(batches)
        driver+executor block leak serviced only by the lagging
        ContextCleaner — the same leak class run_batch's explicit RDD
        release exists for. Re-broadcast only if the context changed
        (a test stopped and restarted the session)."""
        cached = self._fault_bc_cache
        if cached is not None and cached[1] is spark.sparkContext:
            return cached[0]
        self._drop_fault_bc()
        bc = spark.sparkContext.broadcast(self._fault_plan or {})
        self._fault_bc_cache = (bc, spark.sparkContext)
        return bc

    def _drop_fault_bc(self) -> None:
        cached = getattr(self, "_fault_bc_cache", None)
        if cached is not None:
            try:
                cached[0].destroy(blocking=False)
            except Exception:  # context already stopped
                pass
        self._fault_bc_cache = None

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

    # ------------------------------------------------------- time travel

    def checkpoint_at(self, batch_id: int) -> dict | None:
        """The checkpoint committed for ``batch_id`` (None if never
        committed — or expired by vacuum_state)."""
        for ck in self.checkpoints.all():
            if int(ck["batch_id"]) == batch_id:
                return ck
        return None

    def state_at(self, spark: SparkSession, batch_id: int) -> dict[str, DataFrame | None]:
        """Time travel: every state table exactly as the crawl saw it
        after batch ``batch_id`` committed — {table: DataFrame|None} at
        the versions that checkpoint recorded (Iceberg's
        ``VERSION AS OF``, resolved through the engine's own multi-table
        checkpoint so the tables are mutually consistent, not just
        individually versioned). Metadata-cheap: ordinary snapshot reads
        at pinned versions. Works for any checkpoint ``vacuum_state`` has
        not expired; expired versions raise on read."""
        ck = self.checkpoint_at(batch_id)
        if ck is None:
            raise KeyError(f"no checkpoint for batch_id={batch_id}")
        out: dict[str, DataFrame | None] = {}
        for name, ver in ck["versions"].items():
            table = getattr(self, name, None)
            if isinstance(table, STATE_TABLE_TYPES):
                out[name] = table.read(spark, int(ver))
        return out

    def crawl_order_at(self, spark: SparkSession, batch_id: int) -> DataFrame | None:
        """The scheduled-fetch trace as of a past checkpoint — a prefix of
        the final ``crawl_order`` by construction (append-only log +
        monotone seq)."""
        df = self.state_at(spark, batch_id).get("schedule_log")
        return None if df is None else df.select("seq", "url", "image_id").orderBy("seq")

    def failure_state(self, spark: SparkSession) -> DataFrame | None:
        """Latest failure record per url (merge-on-read upsert log)."""
        return self.failures.read_upsert_log(spark, key="url_hash", order_col="last_attempt_seq")

    def lineage(self, spark: SparkSession) -> DataFrame:
        """Per-partition lineage from snapshot metadata (north star / ST8):
        one row per live file group per state table — (table, version,
        path, bucket, origin) where origin names the init/batch commit
        that wrote the file group (re-referenced groups keep their
        creator's tag, Iceberg-manifest style). Metadata-only — reads
        manifests, never data files, so it is O(file groups) at any data
        scale.

        The table set derives from the latest checkpoint's versions keys
        (the same mechanism as state_at/vacuum_state), so subclass tables —
        the discovery plan's listing, the filter delta journal — produce
        lineage rows too, at the checkpointed (mutually consistent)
        versions."""
        ck = self.checkpoints.latest()
        if ck is None:
            raise RuntimeError("lineage: no checkpoint — init() first")
        rows = []
        for name, ver in sorted(ck["versions"].items()):
            t = getattr(self, name, None)
            if isinstance(t, STATE_TABLE_TYPES):
                rows.extend(t.lineage(int(ver)))
        return spark.createDataFrame(
            [
                (r["table"], r["version"], r["path"], r["bucket"], r["origin"])
                for r in rows
            ],
            "table string, version int, path string, bucket int, origin string",
        )

    def changes_between(
        self,
        spark: SparkSession,
        table: str,
        from_batch: int,
        to_batch: int | None = None,
    ) -> DataFrame | None:
        """CDC feed for downstream incremental consumers (a training
        pipeline tailing payload_out, a metrics job tailing schedule_log):
        the rows appended to ``table`` between the checkpoint of
        ``from_batch`` (exclusive) and ``to_batch`` (inclusive; default
        the latest checkpoint). Checkpoint versions bound the diff, so
        the delta is the same mutually-consistent cut the engine
        committed — never a mid-batch orphan. Metadata-only group diff
        (SnapshotTable.read_changes): reads O(delta) file groups.

        Raises ValueError across a maintenance rewrite (compact/requeue)
        — the consumer restarts its cursor from a full read, Iceberg
        changelog-scan style."""
        ck_from = self.checkpoints.get(from_batch)
        ck_to = (
            self.checkpoints.latest() if to_batch is None else self.checkpoints.get(to_batch)
        )
        if ck_from is None or ck_to is None:
            raise RuntimeError("changes_between: no checkpoint for the given batch id")
        t = getattr(self, table, None)
        if (
            not isinstance(t, STATE_TABLE_TYPES)
            or table not in ck_from["versions"]
            or table not in ck_to["versions"]
        ):
            raise ValueError(f"changes_between: {table!r} is not a checkpointed state table")
        return t.read_changes(
            spark, int(ck_from["versions"][table]), int(ck_to["versions"][table])
        )

    def audit_payload(
        self,
        spark: SparkSession,
        payload_df: DataFrame | None = None,
        seen_df: DataFrame | None = None,
    ) -> DataFrame | None:
        """Folder-tree rescan / audit (S15, reference main_scraper.py's
        rescan of downloaded folders vs progress.json): reconcile the seen
        log against payload_out AND re-validate every stored payload
        (decode + dimension + phash recheck in one Arrow-batched pass).

        Returns one row per image_id with category:
          ok                — seen, stored, decodes, phash matches
          seen_no_payload   — marked seen but no stored payload (the
                              reference's mark-done-before-verify bug would
                              show up here; this engine's commit order makes
                              it structurally impossible)
          payload_not_seen  — stored payload the seen log doesn't know
          invalid_payload   — stored bytes fail decode/phash revalidation
        Scale: full-outer on pre-aggregated ids + one map-only decode pass;
        no full-table collect anywhere."""
        from collections.abc import Iterator

        import pandas as pd
        from pyspark.sql import types as T

        from ..functions.imaging import decode_validate_batch

        seen = seen_df if seen_df is not None else self.seen.read(spark)
        payload = payload_df if payload_df is not None else self.payload_out.read(spark)
        if seen is None and payload is None:
            return None
        empty_ids = None
        if seen is None or payload is None:
            empty_ids = spark.createDataFrame([], "image_id string")

        val_schema = T.StructType(
            [
                T.StructField("image_id", T.StringType()),
                T.StructField("revalid_ok", T.BooleanType()),
            ]
        )

        def _revalidate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for p in it:
                if p.empty:
                    continue
                blob_s = pd.Series(
                    [None if b is None else bytes(b) for b in p["bytes"]], dtype=object
                )
                val = decode_validate_batch(
                    blob_s, p["fmt"].reset_index(drop=True),
                    p["phash"].reset_index(drop=True),
                )
                ok = (
                    val["ok"].to_numpy()
                    & (val["w"].to_numpy() == p["w"].to_numpy())
                    & (val["h"].to_numpy() == p["h"].to_numpy())
                )
                yield pd.DataFrame(
                    {"image_id": p["image_id"].to_numpy(), "revalid_ok": ok}
                )

        stored = (
            empty_ids.withColumn("revalid_ok", F.lit(None).cast("boolean"))
            if payload is None
            else payload.select("image_id", "bytes", "fmt", "phash", "w", "h").mapInPandas(
                _revalidate, schema=val_schema
            )
        )
        seen_ids = (
            empty_ids
            if seen is None
            else seen.select("image_id").distinct()
        )
        joined = seen_ids.withColumn("in_seen", F.lit(True)).join(
            stored.withColumn("in_payload", F.lit(True)), "image_id", "full_outer"
        )
        category = (
            F.when(F.col("in_seen").isNull(), "payload_not_seen")
            .when(F.col("in_payload").isNull(), "seen_no_payload")
            .when(~F.col("revalid_ok"), "invalid_payload")
            .otherwise("ok")
        )
        return joined.select(
            "image_id",
            F.coalesce("in_seen", F.lit(False)).alias("in_seen"),
            F.coalesce("in_payload", F.lit(False)).alias("in_payload"),
            "revalid_ok",
            category.alias("category"),
        )

    def metrics(self, spark: SparkSession) -> DataFrame | None:
        """Per-batch counters as a DataFrame (SURVEY §2.4 A1-A7). Metrics
        ride in the checkpoint JSONs (driver-side scalars — no per-batch
        write job); this materializes them on demand."""
        rows = []
        for ck in self.checkpoints.all():
            st = ck.get("stats")
            if not st:
                continue
            for k, val in st.items():
                if k == "batch_id":
                    continue
                rows.append((int(st["batch_id"]), k, float(val)))
        if not rows:
            return None
        return spark.createDataFrame(rows, schema=schemas.METRICS_SCHEMA)
