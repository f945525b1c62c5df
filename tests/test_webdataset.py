"""WebDataset tar-shard sink/source (sources/webdataset.py): shard files
must be capacity-bounded, byte-deterministic, agree with the oracle-gated
shard plan (pack_shards ≡ q_image_shard_pack), and round-trip every
payload row bit-for-bit."""

from __future__ import annotations

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from web_scraper_spark import datagen, schemas
from web_scraper_spark.functions.multimodal import SHARD_CAPACITY_BYTES, pack_shards
from web_scraper_spark.sources.webdataset import read_webdataset, write_webdataset

N = 120


@pytest.fixture(scope="module")
def payload(spark):
    return spark.createDataFrame(
        datagen.gen_varied_payload_pdf(N), schema=schemas.PAYLOAD_SCHEMA
    ).cache()


@pytest.fixture(scope="module")
def written(spark, payload, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wds"))
    res = write_webdataset(payload, out).collect()
    return out, res


def test_every_row_lands_in_exactly_one_shard(written, payload):
    out, res = written
    assert sum(r["n_items"] for r in res) == N
    assert len({(r["bucket"], r["shard_id"]) for r in res}) == len(res)
    for r in res:
        assert os.path.exists(r["path"])


def test_shards_respect_capacity_with_one_item_slack(written):
    """A shard's payload exceeds capacity only by its last item (the cut
    rule is exclusive-offset based, so one item may straddle)."""
    out, res = written
    for r in res:
        with tarfile.open(r["path"]) as tar:
            sizes = [
                m.size for m in tar.getmembers() if not m.name.endswith(".json")
            ]
        assert sum(sizes) == r["payload_bytes"]
        if len(sizes) > 1:
            assert sum(sizes[:-1]) < SHARD_CAPACITY_BYTES


def test_shard_assignment_matches_gated_plan(spark, payload, written):
    out, res = written
    plan = {
        r["image_id"]: (r["bucket"], r["shard_id"])
        for r in pack_shards(payload).collect()
    }
    back = read_webdataset(spark, out)
    got = {
        r["image_id"]: os.path.basename(r["shard_path"])
        for r in back.select("image_id", "shard_path").collect()
    }
    assert len(got) == N
    for img, (bucket, sid) in plan.items():
        assert got[img] == f"{bucket}-{sid:05d}.tar"


def test_roundtrip_bit_for_bit(spark, payload, written):
    out, _ = written
    back = read_webdataset(spark, out).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
    )
    orig = payload.select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    a = {r["image_id"]: r for r in orig.collect()}
    b = {r["image_id"]: r for r in back.collect()}
    assert set(a) == set(b)
    for k in a:
        assert bytes(a[k]["bytes"]) == bytes(b[k]["bytes"])
        for c in ("w", "h", "fmt", "caption", "phash"):
            assert a[k][c] == b[k][c], (k, c)


def test_incremental_export_from_cdc(spark, tmp_path):
    """Incremental training-data delivery from a live crawl: each CDC
    delta of payload_out (engine.changes_between) exports as its own
    shard GENERATION — earlier generations' tars are never rewritten,
    the union of generations equals the payload table, and re-exporting
    a generation is byte-identical (content-addressable deliveries)."""
    import hashlib

    from web_scraper_spark import datagen, schemas
    from web_scraper_spark.plans.crawl import CrawlEngine

    root = str(tmp_path)
    site = datagen.site_graph_df(spark, 3, 24)
    robots = datagen.robots_df(spark)
    ppath = os.path.join(root, "origin")
    spark.createDataFrame(
        datagen.gen_payload_pdf(3 * 24), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)
    eng = CrawlEngine(os.path.join(root, "state"), batch_size=30, n_partitions=4)
    eng.attach_store(ppath)
    eng.init(site, robots)
    eng.run(spark, max_batches=50)
    last = int(eng.checkpoints.latest()["batch_id"])
    mid = 1
    out = os.path.join(root, "wds")
    os.makedirs(out)
    d0 = eng.changes_between(spark, "payload_out", 0, mid)
    d1 = eng.changes_between(spark, "payload_out", mid, last)
    assert d0 is not None and d1 is not None
    r0 = write_webdataset(d0, out, prefix="gen0").collect()
    sha_before = {r["path"]: r["tar_sha256"] for r in r0}
    write_webdataset(d1, out, prefix="gen1").collect()
    # union of generations == the payload table, no overlap
    back = read_webdataset(spark, out)
    ids = [r["image_id"] for r in back.select("image_id").collect()]
    assert len(ids) == len(set(ids))
    expect = {r["image_id"] for r in eng.payload_out.read(spark).collect()}
    assert set(ids) == expect
    # gen0 files untouched by the gen1 export, and re-export is identical
    for p, h in sha_before.items():
        with open(p, "rb") as f:
            assert hashlib.sha256(f.read()).hexdigest() == h
    again = os.path.join(root, "wds_again")
    os.makedirs(again)
    r0b = write_webdataset(d0, again, prefix="gen0").collect()
    assert {os.path.basename(r["path"]): r["tar_sha256"] for r in r0b} == {
        os.path.basename(p): h for p, h in sha_before.items()
    }


def test_rewrite_is_byte_deterministic(spark, payload, written, tmp_path):
    """Same payload → same sha256 per shard: content-addressable shards,
    so a re-export after crash-resume is a no-op diff."""
    out, res = written
    res2 = write_webdataset(payload, str(tmp_path)).collect()
    h1 = {(r["bucket"], r["shard_id"]): r["tar_sha256"] for r in res}
    h2 = {(r["bucket"], r["shard_id"]): r["tar_sha256"] for r in res2}
    assert h1 == h2
