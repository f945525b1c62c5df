"""Per-phase timing of the schedule leg at two pinned core counts — the
diagnostic companion to scaling_bench.py (r3 used the same method to
find the serial priority-offset collect; r4 uses it to attribute the
idle-host efficiency gap).

Phases timed separately per rep (same leg structure as
bench.frontier_throughput):

  rank     take_batch (cutoff + rank + slice) + localCheckpoint
  probe    bloom_probe (driver collect + broadcast of the shard bitsets
           unless --aligned) + fresh-filter + localCheckpoint
  waves    assign_waves + salt + noop sink
  update   update_bloom_shards over the batch's new keys + noop sink

Usage: python scripts/schedule_phase_probe.py [--rows 64000000]
       [--aligned]  (use the partition-aligned probe: no driver
                     collect/broadcast of the filter — the engine's
                     bloom_partition_aligned=True path for 10^9+-key
                     filters)
Child: --child <cpus> <rows> <aligned:0|1>
Emits one JSON line with per-phase seconds at local[4] and local[16].
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, rows: int, aligned: bool) -> None:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bench import force
    from web_scraper_spark import datagen
    from web_scraper_spark.operators.dedup import (
        bloom_probe,
        empty_bloom_shards,
        update_bloom_shards,
    )
    from web_scraper_spark.operators.frontier import seed_frontier_from_site, take_batch
    from web_scraper_spark.operators.politeness import assign_waves
    from web_scraper_spark.session import get_spark

    spark = get_spark(
        app_name=f"wss-phase-{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        # tmpfs shuffle dirs, same rationale as scaling_bench.py: the one
        # shared ~460 MB/s virtio disk under both legs measures the disk,
        # not the engine; a real 4N-node cluster has 4N local disks
        extra_conf={"spark.local.dir": f"/dev/shm/wss-phase-{cpus}"},
    )
    batch_size = rows // 8
    tmp = tempfile.mkdtemp(prefix="wss_phase_")
    try:
        site = datagen.big_site_graph_df(spark, n_pages=rows // 24, videos_per_page=24)
        seed_frontier_from_site(site).write.parquet(f"{tmp}/frontier")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        frontier = spark.read.parquet(f"{tmp}/frontier")
        seen = frontier.select("url_hash").filter(
            F.pmod(F.col("url_hash"), F.lit(3)) == 0
        )
        shards = update_bloom_shards(
            empty_bloom_shards(spark, 32, capacity=rows), seen, n_shards=32
        ).cache()
        shards.count()

        phases = {"rank": [], "probe": [], "waves": [], "update": []}
        for rep in range(3):
            t0 = time.time()
            batch = take_batch(frontier, batch_size).drop("seq").localCheckpoint(eager=True)
            phases["rank"].append(time.time() - t0)

            t0 = time.time()
            probed = bloom_probe(
                batch, shards, n_shards=32, partition_aligned=aligned
            )
            fresh = (
                probed.filter(~F.col("maybe_seen"))
                .drop("maybe_seen")
                .localCheckpoint(eager=True)
            )
            phases["probe"].append(time.time() - t0)

            t0 = time.time()
            waved = assign_waves(fresh, per_host_parallelism=3)
            force(waved.withColumn("salt", F.pmod(F.col("fetch_wave"), F.lit(8))))
            phases["waves"].append(time.time() - t0)

            t0 = time.time()
            force(update_bloom_shards(shards, fresh.select("url_hash"), n_shards=32))
            phases["update"].append(time.time() - t0)
        out = {k: round(min(v), 2) for k, v in phases.items()}
        out["total_best_sum"] = round(sum(out.values()), 2)
        print("CHILD_RESULT " + json.dumps({"cpus": cpus, **out}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), int(sys.argv[i + 2]), sys.argv[i + 3] == "1")
        return
    rows = 64_000_000
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    aligned = "1" if "--aligned" in sys.argv else "0"
    results = {}
    for cpus in (4, 16):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--child", str(cpus), str(rows), aligned,
        ]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
        env = dict(os.environ, PYTHONPATH=REPO)
        res = subprocess.run(cmd, capture_output=True, text=True, env=env, check=True)
        for line in res.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                results[f"local[{cpus}]"] = json.loads(line[len("CHILD_RESULT "):])
    print(json.dumps({"rows": rows, "aligned": aligned == "1", **results}))


if __name__ == "__main__":
    main()
