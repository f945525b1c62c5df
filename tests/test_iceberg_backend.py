"""SnapshotTable-contract conformance, parametrized over BOTH backends
(manifest-over-parquet and the Iceberg v2 metadata tree), plus the
Iceberg-specific structural invariants (manifest reuse, snapshot lineage,
prune-before-list) and an engine e2e on table_format="iceberg" asserting
trace equality with the parquet backend.

This is the r3 verdict item 4: the engine's commit protocol demonstrably
maps onto Iceberg's snapshot/manifest model — same contract, two
implementations, one test suite."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.sources.iceberg import IcebergSnapshotTable, make_table
from web_scraper_spark.sources.snapshots import SnapshotTable

BACKENDS = ["parquet", "iceberg"]


@pytest.fixture(params=BACKENDS)
def table(request, tmp_path):
    return make_table(str(tmp_path), "t", request.param)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _brows(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, bucket int")


def _collect(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


# ------------------------------------------------------------ conformance


def test_empty_table_reads_none(spark, table):
    assert table.latest_version() == 0
    assert table.read(spark) is None


def test_append_and_time_travel(spark, table):
    v1 = table.commit_overwrite(_df(spark, [(1, "a")]))
    v2 = table.commit_append(_df(spark, [(2, "b")]))
    assert (v1, v2) == (1, 2)
    assert _collect(table.read(spark)) == [(1, "a"), (2, "b")]
    assert _collect(table.read(spark, version=v1)) == [(1, "a")]


def test_append_on_base_version_protects_orphans(spark, table):
    """Crash-orphan protection: appending on a CHECKPOINTED base must not
    resurrect a later uncheckpointed commit's rows."""
    v1 = table.commit_overwrite(_df(spark, [(1, "a")]))
    table.commit_append(_df(spark, [(9, "orphan")]))  # never checkpointed
    v3 = table.commit_append(_df(spark, [(2, "b")]), base_version=v1)
    assert _collect(table.read(spark, version=v3)) == [(1, "a"), (2, "b")]


def test_bucketed_merge_replaces_only_named_buckets(spark, table):
    table.commit_overwrite_bucketed(
        _brows(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 2)]), "bucket"
    )
    v2 = table.commit_merge_buckets(
        _brows(spark, [(20, "B", 1)]), "bucket", [1]
    )
    assert _collect(table.read(spark, version=v2)) == [(1, "a"), (3, "c"), (20, "B")]


def test_merge_requires_bucketed_snapshot(spark, table):
    table.commit_overwrite(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="bucketed"):
        table.commit_merge_buckets(_brows(spark, [(2, "b", 0)]), "bucket", [0])


def test_read_buckets_prunes(spark, table):
    table.commit_overwrite_bucketed(
        _brows(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 2)]), "bucket"
    )
    assert _collect(table.read_buckets(spark, [0, 2])) == [(1, "a"), (3, "c")]
    assert table.read_buckets(spark, [7]) is None


def test_truncate_then_reads_none_and_append_restarts(spark, table):
    table.commit_overwrite(_df(spark, [(1, "a")]))
    table.truncate()
    assert table.read(spark) is None
    table.commit_append(_df(spark, [(2, "b")]))
    assert _collect(table.read(spark)) == [(2, "b")]


def test_compact_preserves_rows_and_breaks_cdc(spark, table):
    v1 = table.commit_overwrite(_df(spark, [(1, "a")]))
    table.commit_append(_df(spark, [(2, "b")]))
    v3 = table.commit_append(_df(spark, [(3, "c")]))
    vc = table.compact(spark)
    assert vc > v3
    assert _collect(table.read(spark)) == [(1, "a"), (2, "b"), (3, "c")]
    # CDC across an append-only span still works ...
    assert _collect(table.read_changes(spark, v1, v3)) == [(2, "b"), (3, "c")]
    # ... and refuses across the rewrite
    with pytest.raises(ValueError, match="non-append"):
        table.read_changes(spark, v3, vc)


def test_compact_noop_on_single_group(spark, table):
    v1 = table.commit_overwrite(_df(spark, [(1, "a")]))
    assert table.compact(spark) == v1


def test_read_changes_empty_delta_is_none(spark, table):
    v1 = table.commit_overwrite(_df(spark, [(1, "a")]))
    assert table.read_changes(spark, v1, v1) is None


def test_vacuum_reachability(spark, table):
    v1 = table.commit_overwrite(_df(spark, [(1, "a")]))
    v2 = table.commit_append(_df(spark, [(2, "b")]))
    v3 = table.commit_append(_df(spark, [(3, "c")]))
    out = table.vacuum(keep_from_version=v2)
    assert out["dropped_versions"] == 1
    # v1's file group is still referenced by v2/v3 (reuse) — nothing lost
    assert _collect(table.read(spark, version=v2)) == [(1, "a"), (2, "b")]
    assert _collect(table.read(spark, version=v3)) == [(1, "a"), (2, "b"), (3, "c")]


def test_vacuum_collects_overwritten_groups(spark, table):
    table.commit_overwrite(_df(spark, [(1, "old")]))
    v2 = table.commit_overwrite(_df(spark, [(2, "new")]))
    out = table.vacuum(keep_from_version=v2)
    assert out["removed_groups"] >= 1
    assert _collect(table.read(spark)) == [(2, "new")]


def test_lineage_tracks_origin_and_reuse(spark, table):
    table.commit_overwrite(_df(spark, [(1, "a")]), origin="seed")
    v2 = table.commit_append(_df(spark, [(2, "b")]), origin="batch_1")
    rows = table.lineage(v2)
    assert {r["origin"] for r in rows} == {"seed", "batch_1"}
    assert all(r["table"] == "t" and r["version"] == v2 for r in rows)


def test_upsert_log_latest_wins(spark, table):
    sch = "k int, v string, seq int"
    table.commit_overwrite(spark.createDataFrame([(1, "old", 1), (2, "x", 1)], sch))
    table.commit_append(spark.createDataFrame([(1, "new", 2)], sch))
    out = table.read_upsert_log(spark, "k", "seq")
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [(1, "new"), (2, "x")]


def test_schema_stable_across_backends(spark, tmp_path):
    dfs = []
    for b in BACKENDS:
        t = make_table(str(tmp_path), f"t_{b}", b)
        t.commit_overwrite_bucketed(_brows(spark, [(1, "a", 0), (2, "b", 1)]), "bucket")
        dfs.append(t.read(spark))
    assert dfs[0].schema == dfs[1].schema  # bucket dir-encoded in both


# ----------------------------------------------- Iceberg-specific structure


@pytest.fixture
def ice(tmp_path):
    return IcebergSnapshotTable(str(tmp_path), "t")


def _meta(ice, v):
    with open(os.path.join(ice._meta_dir, f"v{v}.metadata.json")) as f:
        return json.load(f)


def test_metadata_tree_shape(spark, ice):
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    meta = _meta(ice, 1)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] is not None
    assert len(meta["snapshots"]) == 1
    snap = meta["snapshots"][0]
    assert snap["parent-snapshot-id"] is None
    assert snap["sequence-number"] == 1
    assert os.path.exists(os.path.join(ice._meta_dir, snap["manifest-list"]))
    assert os.path.exists(os.path.join(ice._meta_dir, "version-hint.text"))


def test_snapshot_lineage_parent_ids(spark, ice):
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    ice.commit_append(_df(spark, [(2, "b")]))
    meta = _meta(ice, 2)
    s1, s2 = meta["snapshots"]
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    assert s2["summary"]["operation"] == "append"


def test_append_reuses_previous_manifest_verbatim(spark, ice):
    """THE Iceberg property: an append's manifest list contains the prior
    snapshot's manifest file paths unchanged + exactly one new manifest."""
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    ml1 = ice._manifest_list(ice._current_snapshot(1))
    ice.commit_append(_df(spark, [(2, "b")]))
    ml2 = ice._manifest_list(ice._current_snapshot(2))
    paths1 = [m["manifest_path"] for m in ml1]
    paths2 = [m["manifest_path"] for m in ml2]
    assert paths2[: len(paths1)] == paths1
    assert len(paths2) == len(paths1) + 1


def test_merge_buckets_reuses_untouched_bucket_manifests(spark, ice):
    ice.commit_overwrite_bucketed(
        _brows(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 2)]), "bucket"
    )
    ml1 = {m["bucket"]: m["manifest_path"] for m in ice._manifest_list(ice._current_snapshot(1))}
    ice.commit_merge_buckets(_brows(spark, [(20, "B", 1)]), "bucket", [1])
    ml2 = {m["bucket"]: m["manifest_path"] for m in ice._manifest_list(ice._current_snapshot(2))}
    assert ml2[0] == ml1[0] and ml2[2] == ml1[2]  # untouched: same file
    assert ml2[1] != ml1[1]  # replaced bucket: new manifest


def test_read_buckets_prunes_before_listing_manifests(spark, ice, monkeypatch):
    """Partition summaries must prune at the manifest-LIST level: reading
    bucket 0 never opens bucket 1/2's manifest files."""
    ice.commit_overwrite_bucketed(
        _brows(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 2)]), "bucket"
    )
    opened = []
    orig = IcebergSnapshotTable._manifest

    def spy(self, rel_path):
        opened.append(rel_path)
        return orig(self, rel_path)

    monkeypatch.setattr(IcebergSnapshotTable, "_manifest", spy)
    ice.read_buckets(spark, [0])
    ml = {m["bucket"]: m["manifest_path"] for m in ice._manifest_list(ice._current_snapshot(1))}
    assert opened == [ml[0]]


def test_concurrent_commit_cas_rejected(spark, ice, monkeypatch):
    """The exclusive metadata create is the HadoopTables commit CAS: two
    writers that derived the SAME next version race on it, and the loser
    must get FileExistsError — never silently overwrite the winner."""
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    # loser's view of the version probe is frozen pre-race
    monkeypatch.setattr(ice, "_max_metadata_version", lambda: 1)
    winner = IcebergSnapshotTable(os.path.dirname(ice.root), "t")
    winner.commit_append(_df(spark, [(2, "b")]))  # lands v2, flips the hint
    with pytest.raises(FileExistsError):
        ice.commit_append(_df(spark, [(3, "c")]))
    # the winner's commit is intact (no silent clobber)
    assert {r["k"] for r in winner.read(spark).collect()} == {1, 2}


def test_exclusive_create_is_atomic_cas(tmp_path):
    """_atomic_json(exclusive=True) is a kernel-level CAS (os.link), not a
    check-then-rename: the loser raises and the winner's bytes survive."""
    from web_scraper_spark.sources.iceberg import _atomic_json

    p = str(tmp_path / "v2.metadata.json")
    _atomic_json(p, {"who": "winner"}, exclusive=True)
    with pytest.raises(FileExistsError):
        _atomic_json(p, {"who": "loser"}, exclusive=True)
    with open(p) as f:
        assert json.load(f) == {"who": "winner"}
    # no tmp litter from either attempt
    assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []


def test_crash_window_orphan_does_not_wedge_commits(spark, ice):
    """Crash between the exclusive v{N} create and the version-hint flip:
    v{N} exists on disk but the hint still says N-1. The retried commit
    (the engine's crash-resume path re-runs the batch from the checkpoint)
    must skip PAST the orphan — deriving the next version from the files
    on disk like HadoopTables — instead of recomputing v=N and wedging on
    the CAS forever."""
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    # simulate the crash window: orphan v2 written, hint never flipped
    with open(os.path.join(ice._meta_dir, "v2.metadata.json"), "w") as f:
        json.dump({"snapshots": [], "current-snapshot-id": None}, f)
    assert ice.latest_version() == 1
    v = ice.commit_append(_df(spark, [(2, "b")]))
    assert v == 3 and ice.latest_version() == 3
    assert {r["k"] for r in ice.read(spark).collect()} == {1, 2}
    # the successful retry reclaimed the orphan (it was provably
    # unreferenced: the crashed commit died before any checkpoint write)
    assert not os.path.exists(os.path.join(ice._meta_dir, "v2.metadata.json"))
    # and the table keeps committing normally afterwards
    assert ice.commit_append(_df(spark, [(3, "c")])) == 4
    assert {r["k"] for r in ice.read(spark).collect()} == {1, 2, 3}


def test_vacuum_reclaims_crash_orphan_metadata(spark, ice):
    """vacuum run BEFORE any retried commit also sweeps the above-hint
    orphan (the retried-commit path reclaims it itself — see the
    crash-window test)."""
    ice.commit_overwrite(_df(spark, [(1, "a")]))
    with open(os.path.join(ice._meta_dir, "v2.metadata.json"), "w") as f:
        json.dump({"snapshots": [], "current-snapshot-id": None}, f)
    ice.vacuum(keep_from_version=1)
    names = set(os.listdir(ice._meta_dir))
    assert "v2.metadata.json" not in names
    assert "v1.metadata.json" in names
    assert {r["k"] for r in ice.read(spark).collect()} == {1}
    # the swept orphan does not block the next commit either
    assert ice.commit_append(_df(spark, [(2, "b")])) == 2


def test_data_files_referenced_individually(spark, ice):
    ice.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]).repartition(2))
    ml = ice._manifest_list(ice._current_snapshot(1))
    man = ice._manifest(ml[0]["manifest_path"])
    files = [e["data_file"]["file_path"] for e in man["entries"]]
    assert len(files) == 2
    assert all(p.endswith(".parquet") and os.path.exists(p) for p in files)
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in man["entries"])


# ----------------------------------------------------- engine on iceberg


def test_engine_e2e_trace_equal_across_backends(spark, tmp_path):
    """The whole crawl engine on table_format='iceberg': identical crawl
    trace, seen set, and terminal statuses as the parquet backend over
    the same fixture + fault plan — the interface really is the contract."""
    import os as _os

    from web_scraper_spark import datagen, schemas
    from web_scraper_spark.plans.crawl import CrawlEngine

    root = str(tmp_path)
    n_pages, vpp = 4, 24
    site = datagen.site_graph_df(spark, n_pages, vpp)
    robots = datagen.robots_df(spark)
    ppath = _os.path.join(root, "payload")
    spark.createDataFrame(
        datagen.gen_payload_pdf(n_pages * vpp), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)
    fpdf = datagen.gen_fault_plan_pdf(n_pages * vpp, fail_rate=0.15)
    faults = {r.image_id: (r.fail_mode, int(r.fail_count)) for r in fpdf.itertuples()}

    traces = {}
    for fmt in BACKENDS:
        eng = CrawlEngine(
            _os.path.join(root, fmt), batch_size=40, n_partitions=8,
            table_format=fmt,
        )
        eng.attach_store(ppath, faults)
        eng.init(site, robots)
        eng.run(spark, max_batches=60)
        log = eng.schedule_log.read(spark).select("seq", "url", "image_id")
        traces[fmt] = sorted(tuple(r) for r in log.collect())
        statuses = {
            r["status"]: r["n"]
            for r in eng.frontier.read(spark).groupBy("status")
            .agg(F.count("*").alias("n")).collect()
        }
        seen = sorted(r["url_hash"] for r in eng.seen_set(spark).collect())
        traces[fmt + "_state"] = (statuses, seen)
    assert traces["parquet"] == traces["iceberg"]
    assert traces["parquet_state"] == traces["iceberg_state"]


def test_engine_maintenance_reclaims_iceberg_metadata(spark, tmp_path):
    """vacuum_state/state_at must treat Iceberg-backed tables as state
    tables (regression: an isinstance(SnapshotTable) guard skipped them,
    so the r5 soak saw the metadata tree grow monotonically — vacuum
    returned {} and reclaimed nothing)."""
    import os as _os

    from web_scraper_spark import datagen, schemas
    from web_scraper_spark.plans.crawl import CrawlEngine

    root = str(tmp_path)
    n_pages, vpp = 3, 24
    ppath = _os.path.join(root, "payload")
    spark.createDataFrame(
        datagen.gen_payload_pdf(n_pages * vpp), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)
    eng = CrawlEngine(
        _os.path.join(root, "state"), batch_size=24, n_partitions=4,
        table_format="iceberg",
    )
    eng.attach_store(ppath, {})
    eng.init(datagen.site_graph_df(spark, n_pages, vpp), datagen.robots_df(spark))
    eng.run(spark, max_batches=6)

    def meta_count(t):
        return len(_os.listdir(t._meta_dir))

    before = meta_count(eng.frontier)
    eng.compact_state(spark)
    out = eng.vacuum_state(keep_checkpoints=1)
    # every checkpointed iceberg table was vacuumed (not silently skipped)
    assert "frontier" in out and "seen" in out, out
    after = meta_count(eng.frontier)
    assert after < before, (before, after)
    # time travel still resolves through the iceberg backend
    ck = eng.checkpoints.latest()
    state = eng.state_at(spark, int(ck["batch_id"]))
    assert state["frontier"] is not None
    assert state["frontier"].count() > 0
