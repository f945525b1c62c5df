"""Snapshot maintenance: compact (small-file merge) + vacuum (snapshot
expiry / orphan collection) — the Iceberg rewrite_data_files /
expire_snapshots / remove_orphan_files equivalents on SnapshotTable, and
the engine-level passes that keep crawl semantics byte-identical across a
mid-crawl maintenance run.
"""

from __future__ import annotations

import os

import pytest

from web_scraper_spark.sources.snapshots import SnapshotTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


# ------------------------------------------------------------- compact


def test_compact_append_log_preserves_rows(spark, tmp_root):
    t = SnapshotTable(tmp_root, "log")
    for i in range(4):
        t.commit_append(_df(spark, i * 10, i * 10 + 10))
    before = sorted(r["k"] for r in t.read(spark).collect())
    assert len(t._manifest(t.latest_version())["entries"]) == 4
    v = t.compact(spark)
    assert v == t.latest_version()
    assert len(t._manifest(v)["entries"]) == 1
    after = sorted(r["k"] for r in t.read(spark).collect())
    assert after == before == list(range(40))
    # appends continue on top of the compacted group
    t.commit_append(_df(spark, 100, 105))
    assert t.read(spark).count() == 45
    assert len(t._manifest(t.latest_version())["entries"]) == 2


def test_compact_single_group_is_noop(spark, tmp_root):
    t = SnapshotTable(tmp_root, "log")
    v = t.commit_append(_df(spark, 0, 5))
    assert t.compact(spark) == v
    assert t.latest_version() == v


def test_compact_rejects_bucketed(spark, tmp_root):
    t = SnapshotTable(tmp_root, "bk")
    df = spark.range(0, 20).selectExpr("id AS k", "CAST(id % 4 AS INT) AS b")
    t.commit_overwrite_bucketed(df, "b")
    with pytest.raises(ValueError):
        t.compact(spark)


# -------------------------------------------------------------- vacuum


def test_vacuum_keeps_rereferenced_groups(spark, tmp_root):
    # append log: every manifest re-references all prior groups, so
    # expiring old versions must delete NO data
    t = SnapshotTable(tmp_root, "log")
    for i in range(3):
        t.commit_append(_df(spark, i * 10, i * 10 + 10))
    stats = t.vacuum(t.latest_version())
    assert stats == {"dropped_versions": 2, "removed_groups": 0}
    assert t.read(spark).count() == 30
    # expired versions are gone (time travel below horizon)
    with pytest.raises(FileNotFoundError):
        t.read(spark, version=1)


def test_vacuum_removes_dereferenced_and_orphan_groups(spark, tmp_root):
    t = SnapshotTable(tmp_root, "st")
    t.commit_overwrite(_df(spark, 0, 10))
    t.commit_overwrite(_df(spark, 50, 60))  # v1's group now unreferenced
    os.makedirs(os.path.join(t.root, "data", "deadbeefcafe"))  # crash orphan
    stats = t.vacuum(t.latest_version())
    assert stats["dropped_versions"] == 1
    assert stats["removed_groups"] == 2  # v1's group + the orphan dir
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(50, 60))


def test_vacuum_bucketed_drops_only_replaced_buckets(spark, tmp_root):
    t = SnapshotTable(tmp_root, "fr")
    df = spark.range(0, 40).selectExpr("id AS k", "CAST(id % 4 AS INT) AS b")
    t.commit_overwrite_bucketed(df, "b")
    # replace bucket 0 twice: two superseded bucket-0 groups accumulate
    for lo in (100, 200):
        nb = spark.range(lo, lo + 5).selectExpr("id AS k", "CAST(0 AS INT) AS b")
        t.commit_merge_buckets(nb, "b", [0])
    stats = t.vacuum(t.latest_version())
    assert stats["dropped_versions"] == 2
    assert stats["removed_groups"] == 2  # the two stale bucket-0 groups
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == sorted(list(range(200, 205)) + [k for k in range(40) if k % 4 != 0])
    assert sorted(r["k"] for r in t.read_buckets(spark, [0]).collect()) == list(
        range(200, 205)
    )


def test_vacuum_keep_horizon_preserves_time_travel(spark, tmp_root):
    t = SnapshotTable(tmp_root, "st")
    for i in range(4):
        t.commit_overwrite(_df(spark, i, i + 1))
    t.vacuum(3)  # keep v3 and v4
    assert [r["k"] for r in t.read(spark, version=3).collect()] == [2]
    assert [r["k"] for r in t.read(spark, version=4).collect()] == [3]
    with pytest.raises(FileNotFoundError):
        t.read(spark, version=2)


def test_vacuum_with_lower_horizon_after_deeper_vacuum(spark, tmp_root):
    """A second vacuum with a LOWER horizon (deeper keep_checkpoints after
    an earlier shallow vacuum) must tolerate already-expired manifests."""
    t = SnapshotTable(tmp_root, "st")
    for i in range(5):
        t.commit_overwrite(_df(spark, i, i + 1))
    t.vacuum(4)          # expire v1-v3
    stats = t.vacuum(2)  # lower horizon: v2/v3 already gone — no crash
    assert stats["dropped_versions"] == 0
    assert [r["k"] for r in t.read(spark).collect()] == [4]


def test_warm_start_from_prior_crawl_seen_set(spark, tmp_path):
    """Cross-crawl warm start (reference loads historic seen IDs at
    startup): a fresh crawl seeded with a completed crawl's seen set
    schedules nothing it already has — trace empty, every crawlable row
    skipped_seen, seen set unchanged."""
    from pyspark.sql import functions as F

    from tests.test_crawl_e2e import BATCH, _fixture, _run_engine
    from web_scraper_spark.plans.crawl import CrawlEngine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    a = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "a")
    a_seen = a.seen_set(spark)
    n_seen = a_seen.count()
    assert n_seen > 0

    b = CrawlEngine(os.path.join(tmp_root, "b"), batch_size=BATCH, n_partitions=8)
    b.attach_store(ppath, faults)
    b.init(site, robots_df, seen_seed=a_seen.select("url_hash", "image_id"))
    stats = b.run(spark, max_batches=100)

    assert sum(s["fetched_ok"] for s in stats) == 0
    assert sum(s["dedup_skipped"] for s in stats) == n_seen
    order = b.crawl_order(spark)
    assert order is None or order.count() == 0
    fr = b.frontier.read(spark)
    assert fr.filter(F.col("status") == "skipped_seen").count() == n_seen
    assert b.seen_set(spark).count() == n_seen  # nothing new appended


def test_warm_start_discovery_skips_imported_urls(spark, tmp_path):
    """Discovery warm start: URLs discovered by listing extraction that
    are already in the imported seen set go skipped_seen, not fetched."""
    from pyspark.sql import functions as F

    from tests.test_discovery import BATCH, N_PAGES, VPP, _fixture
    from web_scraper_spark.plans.discover import DiscoveringCrawlEngine

    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)

    a = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "a"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    a.attach_store(ppath, faults)
    a.init_discovery(spark, N_PAGES, VPP, robots)
    a.run(spark, max_batches=200)
    a_seen = a.seen_set(spark)
    n_seen = a_seen.count()

    b = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "b"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    b.attach_store(ppath, faults)
    b.init_discovery(
        spark, N_PAGES, VPP, robots, seen_seed=a_seen.select("url_hash", "image_id")
    )
    stats = b.run(spark, max_batches=200)

    # discovery-only batches emit their own stat keys — default to 0
    assert sum(s.get("fetched_ok", 0) for s in stats) == 0
    assert sum(s.get("dedup_skipped", 0) for s in stats) == n_seen
    fr = b.frontier.read(spark)
    assert fr.filter(F.col("status") == "skipped_seen").count() == n_seen
    assert b.seen_set(spark).count() == n_seen


@pytest.mark.parametrize("seen_filter", ["bloom", "cuckoo"])
def test_requeue_recrawls_exactly_the_reopened_urls(spark, tmp_path, seen_filter):
    """Recrawl window: requeue removes the keys from the seen log and the
    seen filter (cuckoo deletes in place; bloom rebuilds at fixed
    geometry), flips the frontier rows to pending, and the next run
    refetches exactly those URLs."""
    from pyspark.sql import functions as F

    from tests.test_crawl_e2e import BATCH, _fixture, _run_engine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = _run_engine(
        spark, tmp_root, site, robots_df, ppath, faults, "rq", seen_filter=seen_filter
    )
    seen0 = eng.seen_set(spark)
    n0 = seen0.count()
    trace0 = eng.crawl_order(spark).count()

    reopen = seen0.orderBy("url_hash").limit(10).select("url_hash")
    # mix in never-seen keys: they must not touch the filter (a cuckoo
    # delete of a never-inserted key can evict a colliding fingerprint)
    bogus = spark.createDataFrame([(111,), (222,), (333,)], "url_hash long")
    stats = eng.requeue(spark, reopen.unionByName(bogus))
    assert stats["seen_removed"] == 10
    assert stats["requeued"] == 10
    assert stats["filter"] == (
        "cuckoo-delete" if seen_filter == "cuckoo" else "bloom-rebuild"
    )
    assert eng.seen_set(spark).count() == n0 - 10
    # payload retraction: the requeued rows' stored bytes left the payload
    # log in the same maintenance commit — a retraction must not keep the
    # retracted payload live
    assert eng.payload_out.read(spark).count() == n0 - 10
    fr = eng.frontier.read(spark)
    assert fr.filter(F.col("status") == "pending").count() == 10

    runs = eng.run(spark, max_batches=50)
    assert sum(s.get("fetched_ok", 0) for s in runs) == 10
    assert eng.seen_set(spark).count() == n0
    # the refetched URLs are exactly the reopened ones, appended after
    # the original trace
    new_trace = eng.crawl_order(spark)
    assert new_trace.count() == trace0 + 10
    refetched = {
        r["url_hash"]
        for r in eng.seen_set(spark)
        .join(reopen, "url_hash", "semi")
        .select("url_hash")
        .collect()
    }
    assert refetched == {r["url_hash"] for r in reopen.collect()}
    # recrawl appended fresh payload rows — exactly one row per image_id,
    # never a duplicate for downstream payload readers
    payload = eng.payload_out.read(spark)
    assert payload.count() == n0
    assert payload.groupBy("image_id").count().filter(F.col("count") > 1).count() == 0


# ------------------------------------------------- engine-level passes


def test_midcrawl_maintenance_preserves_trace(spark, tmp_path):
    """Run 2 batches → compact_state + vacuum_state → resume with a fresh
    engine object. Final trace + seen set must equal an uninterrupted
    run's (maintenance is invisible to crawl semantics)."""
    from tests.test_crawl_e2e import BATCH, _fixture, _run_engine
    from web_scraper_spark.plans.crawl import CrawlEngine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root)
    full = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "full")

    part = CrawlEngine(os.path.join(tmp_root, "m"), batch_size=BATCH, n_partitions=8)
    part.attach_store(ppath, faults)
    part.init(site, robots_df)
    part.run_batch(spark)
    part.run_batch(spark)
    compacted = part.compact_state(spark)
    # compaction also folds the filter delta journal into the base bitsets
    # (and truncates the journal), so the bloom tables report versions too
    assert set(compacted) == {
        "seen", "failures", "payload_out", "schedule_log", "bloom", "bloom_delta",
    }
    # the maintenance checkpoint must not re-carry stats: metrics() keys
    # rows on batch_id and would double-count the last batch
    m = part.metrics(spark)
    ids = [r["batch_id"] for r in m.select("batch_id").distinct().collect()]
    per_batch = m.groupBy("batch_id", "metric").count().filter("count > 1").count()
    assert per_batch == 0 and len(ids) == 2
    removed = part.vacuum_state(keep_checkpoints=1)
    # per-batch bloom overwrites leave expired full-bitset copies behind;
    # vacuum must reclaim at least those
    assert sum(s["removed_groups"] for s in removed.values()) > 0

    resumed = CrawlEngine(os.path.join(tmp_root, "m"), batch_size=BATCH, n_partitions=8)
    resumed.attach_store(ppath, faults)
    resumed.run(spark, max_batches=100)

    a = [tuple(r) for r in full.crawl_order(spark).collect()]
    b = [tuple(r) for r in resumed.crawl_order(spark).collect()]
    assert a == b
    sa = {tuple(r) for r in full.seen_set(spark).collect()}
    sb = {tuple(r) for r in resumed.seen_set(spark).collect()}
    assert sa == sb


def test_time_travel_state_at_checkpoint(spark, tmp_path):
    """state_at/crawl_order_at pin all tables to one checkpoint's
    versions: the past trace is a strict prefix of the final one, and the
    past seen set is the subset the crawl had committed by then."""
    from tests.test_crawl_e2e import BATCH, _fixture, _run_engine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "tt")

    final = [tuple(r) for r in eng.crawl_order(spark).collect()]
    past = [tuple(r) for r in eng.crawl_order_at(spark, 2).collect()]
    assert 0 < len(past) < len(final)
    assert final[: len(past)] == past

    seen_past = {r["url_hash"] for r in eng.state_at(spark, 2)["seen"].collect()}
    seen_final = {r["url_hash"] for r in eng.seen_set(spark).collect()}
    assert seen_past < seen_final
    # trace rows at ck2 correspond 1:1 to what was scheduled by then
    assert max(r[0] for r in past) == len(past)

    import pytest

    with pytest.raises(KeyError):
        eng.state_at(spark, 10_000)


def test_midcrawl_maintenance_preserves_discovery_state(spark, tmp_path):
    """Same invariant for the discovery plan, whose checkpoint carries
    extension keys (pending_detail, listing version) that compact_state's
    maintenance checkpoint must pass through untouched."""
    from tests.test_discovery import BATCH, N_PAGES, VPP, _fixture
    from web_scraper_spark.plans.discover import DiscoveringCrawlEngine

    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)

    full = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "full"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    full.attach_store(ppath, faults)
    full.init_discovery(spark, N_PAGES, VPP, robots)
    full.run(spark, max_batches=200)

    part = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "m"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    part.attach_store(ppath, faults)
    part.init_discovery(spark, N_PAGES, VPP, robots)
    part.run_batch(spark)
    part.run_batch(spark)
    part.compact_state(spark)
    part.vacuum_state(keep_checkpoints=1)

    resumed = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "m"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    resumed.attach_store(ppath, faults)
    resumed.run(spark, max_batches=200)

    assert [tuple(r) for r in resumed.crawl_order(spark).collect()] == [
        tuple(r) for r in full.crawl_order(spark).collect()
    ]


def test_discovery_with_cuckoo_filter_progresses(spark, tmp_path):
    """Regression: init_discovery built bloom-schema shards regardless of
    seen_filter, so the cuckoo engine crashed on its first probe."""
    from tests.test_discovery import BATCH, N_PAGES, VPP, _fixture
    from web_scraper_spark.plans.discover import DiscoveringCrawlEngine

    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)
    eng = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "ck"), batch_size=BATCH, n_partitions=8,
        lookahead=1, seen_filter="cuckoo",
    )
    eng.attach_store(ppath, faults)
    eng.init_discovery(spark, N_PAGES, VPP, robots)
    stats = [eng.run_batch(spark) for _ in range(3)]
    assert sum(s.get("fetched_ok", 0) for s in stats if s) > 0
    assert eng.seen_set(spark).count() > 0


def test_requeue_on_discovery_plan_keeps_pending_counter(spark, tmp_path):
    """Regression: requeue flips rows back to pending; the discovery
    plan's pending_detail counter must grow by exactly those rows or it
    goes permanently negative when they are consumed again."""
    from tests.test_discovery import BATCH, N_PAGES, VPP, _fixture
    from web_scraper_spark.plans.discover import DiscoveringCrawlEngine

    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)
    eng = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "rq"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    eng.attach_store(ppath, faults)
    eng.init_discovery(spark, N_PAGES, VPP, robots)
    eng.run(spark, max_batches=200)
    assert int(eng.checkpoints.latest()["pending_detail"]) == 0

    reopen = eng.seen_set(spark).orderBy("url_hash").limit(5).select("url_hash")
    stats = eng.requeue(spark, reopen)
    assert stats["requeued"] == 5
    assert int(eng.checkpoints.latest()["pending_detail"]) == 5

    runs = eng.run(spark, max_batches=50)
    assert sum(s.get("fetched_ok", 0) for s in runs) == 5
    assert int(eng.checkpoints.latest()["pending_detail"]) == 0


def test_recrawl_stale_requeues_the_trace_prefix(spark, tmp_path):
    """Staleness-driven recrawl: before_batch=k requeues exactly the seen
    rows committed before batch k began (the crawl_order_at(k-1) prefix's
    fetched rows), composing with requeue's invariants, and a rerun
    restores the full seen set."""
    from pyspark.sql import functions as F

    from tests.test_crawl_e2e import _fixture, _run_engine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "stale")
    seen0 = eng.seen_set(spark)
    n0 = seen0.count()
    trace0 = eng.crawl_order(spark).count()

    before_batch = 3
    horizon = int(eng.checkpoint_at(before_batch - 1)["next_seq"]) - 1
    expected = seen0.filter(F.col("committed_seq") <= horizon).count()
    assert 0 < expected < n0  # the horizon cuts strictly inside the crawl

    stats = eng.recrawl_stale(spark, before_batch=before_batch)
    assert stats["seen_removed"] == expected
    assert stats["requeued"] == expected
    assert eng.seen_set(spark).count() == n0 - expected

    runs = eng.run(spark, max_batches=50)
    assert sum(s.get("fetched_ok", 0) for s in runs) == expected
    assert eng.seen_set(spark).count() == n0
    assert eng.crawl_order(spark).count() == trace0 + expected


def test_recrawl_stale_horizon_forms(spark, tmp_path):
    """older_than_seq is the explicit horizon form; exactly one of the two
    horizon arguments must be given."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from tests.test_crawl_e2e import _fixture, _run_engine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "hz")
    seen0 = eng.seen_set(spark)
    n0 = seen0.count()
    with _pytest.raises(ValueError):
        eng.recrawl_stale(spark)
    with _pytest.raises(ValueError):
        eng.recrawl_stale(spark, older_than_seq=1, before_batch=2)
    expected = seen0.filter(F.col("committed_seq") <= 5).count()
    stats = eng.recrawl_stale(spark, older_than_seq=5)
    assert stats["seen_removed"] == expected
    assert eng.seen_set(spark).count() == n0 - expected


# ----------------------------------------------------------- CDC reads


def test_read_changes_append_delta(spark, tmp_root):
    """read_changes returns exactly the rows of the groups appended in
    (from, to] — the manifest-diff incremental scan."""
    t = SnapshotTable(tmp_root, "log")
    v1 = t.commit_append(_df(spark, 0, 10))
    v2 = t.commit_append(_df(spark, 10, 15))
    v3 = t.commit_append(_df(spark, 15, 18))
    got = sorted(r["k"] for r in t.read_changes(spark, v1, v3).collect())
    assert got == list(range(10, 18))
    assert sorted(r["k"] for r in t.read_changes(spark, v2, v3).collect()) == [15, 16, 17]
    assert t.read_changes(spark, v3, v3) is None
    # from version 0 (empty table) the delta is the full log
    assert t.read_changes(spark, 0, v3).count() == 18


def test_read_changes_rejects_rewrite(spark, tmp_root):
    """Across a compaction the path diff is not an append stream — the
    cursor must be restarted, so read_changes refuses."""
    t = SnapshotTable(tmp_root, "log")
    v1 = t.commit_append(_df(spark, 0, 10))
    t.commit_append(_df(spark, 10, 15))
    v3 = t.compact(spark)
    with pytest.raises(ValueError, match="non-append"):
        t.read_changes(spark, v1, v3)
    # but a post-compaction cursor works again
    v4 = t.commit_append(_df(spark, 15, 20))
    assert sorted(r["k"] for r in t.read_changes(spark, v3, v4).collect()) == list(
        range(15, 20)
    )


def test_engine_changes_between_checkpoints(spark, tmp_path):
    """Engine-level CDC: the per-table delta between two checkpoints is
    exactly the batch's committed rows (checkpoint-consistent cut), and a
    maintenance rewrite in between makes the feed refuse."""
    from tests.test_crawl_e2e import BATCH, _fixture
    from web_scraper_spark.plans.crawl import CrawlEngine

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = CrawlEngine(os.path.join(tmp_root, "cdc"), batch_size=BATCH, n_partitions=8)
    eng.attach_store(ppath, faults)
    eng.init(site, robots_df)
    eng.run_batch(spark)
    eng.run_batch(spark)
    eng.run_batch(spark)
    cks = eng.checkpoints.all()
    b0, b1, b2 = (ck["batch_id"] for ck in cks[-3:])

    for table in ("seen", "payload_out", "schedule_log"):
        t = getattr(eng, table)
        v_from = int(eng.checkpoints.get(b1)["versions"][table])
        v_to = int(eng.checkpoints.get(b2)["versions"][table])
        full_from = t.read(spark, v_from)
        full_to = t.read(spark, v_to)
        n_from = 0 if full_from is None else full_from.count()
        delta = eng.changes_between(spark, table, b1, b2)
        n_delta = 0 if delta is None else delta.count()
        assert n_delta == full_to.count() - n_from, table
        if delta is not None:
            cols = delta.columns
            a = {tuple(r) for r in delta.collect()}
            b = {tuple(r) for r in full_to.select(cols).collect()} - (
                {tuple(r) for r in full_from.select(cols).collect()}
                if full_from is not None
                else set()
            )
            assert a == b, table

    # spanning two batches accumulates both deltas
    d01 = eng.changes_between(spark, "seen", b0)
    d12 = eng.changes_between(spark, "seen", b1, b2)
    d02 = eng.changes_between(spark, "seen", b0, b2)
    assert d02.count() == (d01.count() if d01 is not None else 0)
    assert d02.count() >= (d12.count() if d12 is not None else 0)

    # unknown checkpoint / non-table name
    with pytest.raises(RuntimeError):
        eng.changes_between(spark, "seen", 10_000)
    with pytest.raises(ValueError):
        eng.changes_between(spark, "not_a_table", b1)

    # maintenance rewrite between the cursors → refuse
    eng.compact_state(spark)
    last = eng.checkpoints.latest()["batch_id"]
    with pytest.raises(ValueError, match="non-append"):
        eng.changes_between(spark, "seen", b1, last)
