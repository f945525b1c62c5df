"""Measured skew evidence for the salted politeness repartition.

North rule: "per-host politeness budget enforced through salted
repartitioning on host-hash to defeat domain skew". The unit tests pin the
SEMANTICS (wave pacing, bounded per-host parallelism); this bench pins the
PERFORMANCE claim: on a pathologically skewed frontier batch (one host
owning half the rows — a crawl of one giant image CDN plus a long tail),
partitioning by bare host pins the hot host's entire share on ONE task
while the other cores idle, and the wave-derived salt spreads it across
the executor fleet without breaking per-wave pacing (salt = f(fetch_wave),
so each wave still lands whole).

Method: synthesize a batch (default 2M rows: 50% one hot host, 3×4% warm
hosts below the salting threshold, the rest uniform over 2,000 cold
hosts), assign waves ONCE, then
time an identical per-row fetch-stage workload (vectorized sha256 over the
url bytes, ~10 µs/row — a stand-in for header-parse/validate CPU) over

  * naive:  repartition(n, host)              (what a non-salted plan does)
  * salted: salted_repartition(n, n_salts=8)  (the engine's path)

3 alternating reps, min per variant (shared-host noise policy, see
BENCH.md). Also reports the max-partition row share each strategy
produced (the straggler's size). Emits ONE JSON line for BENCH.md.

Run: python scripts/skew_bench.py [--rows 2000000] [--cores 16]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_rows = 2_000_000
    cores = 16
    if "--rows" in sys.argv:
        n_rows = int(sys.argv[sys.argv.index("--rows") + 1])
    if "--cores" in sys.argv:
        cores = int(sys.argv[sys.argv.index("--cores") + 1])
    n_partitions = 2 * cores

    from pyspark.sql import functions as F

    from web_scraper_spark.operators.politeness import (
        assign_waves,
        salted_repartition,
    )
    from web_scraper_spark.session import get_spark

    spark = get_spark(
        app_name="wss-skew-bench",
        master=f"local[{cores}]",
        shuffle_partitions=n_partitions,
        extra_conf={"spark.driver.memory": "16g"},
    )

    # --- fixture: 50% hot / 3×4% warm / 38% over 2000 cold hosts --------
    # warm hosts sit BELOW hot_threshold on purpose: only the hot host is
    # salted, so the measured delta isolates the salt (the warm hosts show
    # the threshold behavior — unsalted, each stays whole in one task)
    u = F.pmod(F.xxhash64(F.col("id")), F.lit(10_000))  # deterministic "random"
    host = (
        F.when(u < 5_000, F.lit("hot.example"))
        .when(u < 6_200, F.concat(F.lit("warm"), F.pmod(u, F.lit(3)).cast("string")))
        .otherwise(F.concat(F.lit("cold"), F.pmod(u, F.lit(2_000)).cast("string")))
    )
    batch = (
        spark.range(n_rows)
        .select(
            host.alias("host"),
            F.concat(F.lit("https://x/"), F.col("id").cast("string")).alias("url"),
            F.xxhash64(F.col("id")).alias("url_hash"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(5)).cast("int").alias("priority"),
            F.col("id").cast("int").alias("position"),
        )
    )
    # waves are computed BEFORE either placement (identical input work);
    # materialize so neither variant re-pays the window
    waved = assign_waves(batch).persist()
    waved.count()

    def fetch_stage(df):
        """Per-row CPU proportional to row count — the property a straggler
        amplifies. Vectorized pandas (like the real decode path), ~10 µs/row."""

        def work(it):
            import hashlib

            import pandas as pd

            for pdf in it:
                acc = 0
                for s in pdf["url"]:
                    h = s.encode()
                    for _ in range(6):
                        h = hashlib.sha256(h).digest()
                    acc += h[0]
                yield pd.DataFrame({"acc": [acc], "n": [len(pdf)]})

        return df.mapInPandas(work, "acc long, n long")

    def run(df) -> float:
        t0 = time.time()
        df.agg(F.sum("n")).collect()
        return time.time() - t0

    def max_share(df) -> float:
        sizes = (
            df.groupBy(F.spark_partition_id().alias("p"))
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )
        return round(sizes / n_rows, 4)

    # warm-up (JIT/codegen) once on a slice, untimed
    run(fetch_stage(waved.limit(50_000)))

    if "--sweep" in sys.argv:
        # r3 verdict item 8: the n_salts × partitions sweep the operator
        # docstring promises — spread (straggler share, wall time) vs
        # politeness cost (worst-case aggregate in-flight for the hot
        # host = per_host_parallelism × n_salts, analytic). n_salts=1 IS
        # the naive-by-host placement; the hot host holds 50% of rows, so
        # its straggler share floors at 0.5/min(n_salts, partitions).
        rows = []
        for n_parts in (16, 32, 64):
            for n_salts in (1, 2, 4, 8, 16, 32):
                df = salted_repartition(
                    waved, n_parts, n_salts=n_salts, hot_threshold=0.10
                )
                t = min(run(fetch_stage(df)) for _ in range(2))
                rows.append(
                    {
                        "partitions": n_parts,
                        "n_salts": n_salts,
                        "wall_s": round(t, 2),
                        "max_partition_share": max_share(df),
                        "hot_host_inflight_x": n_salts,  # × per_host_parallelism
                    }
                )
                print(f"# {rows[-1]}", file=sys.stderr)
        print(json.dumps({
            "bench": "politeness_salt_sweep",
            "rows": n_rows,
            "hot_share": 0.5,
            "cores": cores,
            "sweep": rows,
        }))
        return

    naive = waved.repartition(n_partitions, F.col("host"))
    salted = salted_repartition(waved, n_partitions, n_salts=8, hot_threshold=0.10)

    naive_t, salted_t = [], []
    for _ in range(3):
        naive_t.append(run(fetch_stage(naive)))
        salted_t.append(run(fetch_stage(salted)))

    out = {
        "bench": "politeness_skew",
        "rows": n_rows,
        "hot_share": 0.5,
        "cores": cores,
        "n_partitions": n_partitions,
        "n_salts": 8,
        "naive_wall_s": round(min(naive_t), 2),
        "salted_wall_s": round(min(salted_t), 2),
        "speedup": round(min(naive_t) / min(salted_t), 2),
        "naive_max_partition_share": max_share(naive),
        "salted_max_partition_share": max_share(salted),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
