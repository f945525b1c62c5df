"""SparkSession factory.

Local-mode defaults are tuned for the sandbox (single JVM, local[N]); the
same settings are correct on a real cluster except driver memory, which a
cluster submit overrides. AQE stays on everywhere — it handles skew-join
splitting and post-shuffle coalescing at 100 TB scale where static
`spark.sql.shuffle.partitions` guesses are always wrong.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning — coalesce small shuffle partitions, split
    # skewed ones (the hot-host skew case of SURVEY.md §4 benefits directly).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas UDF / toPandas traffic (the fetch + decode stages
    # are Arrow-batched; per-row Python is banned per BASELINE.json input_hint).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    # At 100 TB these two govern scan parallelism; 128 MB splits are the
    # sweet spot for parquet on object storage.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.ui.enabled": "false",
    # ST6 stall detection: bound how long a hung fetch/executor can wedge
    # the job (the reference kills transfers stalled past a window,
    # idm_downloader.py:236-301, and caps per-item work at 600 s,
    # video_processor.py:437).
    "spark.network.timeout": "600s",
    "spark.executor.heartbeatInterval": "60s",
    # Reclaim dropped checkpoint/shuffle blocks promptly: the ContextCleaner
    # only acts after a driver GC collects the RDD handle, and a mostly-idle
    # 48g heap can go a long time between full GCs (the engine also releases
    # its own batch checkpoints explicitly — plans/crawl.py run_batch).
    "spark.cleaner.periodicGC.interval": "5min",
}

#: cluster-only stall handling: speculative re-launch of straggler tasks
#: (the Spark answer to the reference's per-download watchdog). Applied only
#: off local mode — a single-executor local JVM has nowhere to re-launch.
_CLUSTER_DEFAULTS = {
    "spark.speculation": "true",
    "spark.speculation.multiplier": "4",
    "spark.speculation.quantile": "0.9",
}


def get_spark(
    app_name: str = "web_scraper_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) so
    the bench harness can run the identical job at two parallelism levels.
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster leave it unset and let AQE coalesce.
    """
    submitted = _submitted_conf()
    if master is None and submitted is not None and submitted.contains("spark.master"):
        # Under spark-submit the master arrives as a JVM system property;
        # respect it instead of forcing the sandbox default (otherwise
        # `spark-submit --master yarn` would silently run local).
        master = submitted.get("spark.master")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_cores = _parse_local_cores(master)
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else max(n_cores, 8)
    )
    if master.startswith("local"):
        conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    else:
        conf.update(_CLUSTER_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    # Anything the submit set (--conf / spark-defaults) beats these library
    # defaults; only the caller's explicit arguments beat the submit.
    explicit = set(extra_conf or ())
    if shuffle_partitions is not None:
        explicit.add("spark.sql.shuffle.partitions")
    for k, v in conf.items():
        if submitted is not None and k not in explicit and submitted.contains(k):
            continue
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _submitted_conf():
    """The conf a surrounding ``spark-submit`` provided, or None.

    Under spark-submit the driver JVM already exists (PythonRunner exports
    PYSPARK_GATEWAY_PORT) and carries ``--master`` / ``--conf`` as system
    properties — but a plain ``SparkConf()`` constructed BEFORE the Python
    side attaches to that gateway is an empty Python-side dict and sees
    none of it. Attach first, then read."""
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        return None
    from pyspark import SparkConf
    from pyspark.context import SparkContext

    SparkContext._ensure_initialized()  # attach the submit-owned gateway
    return SparkConf()


def _parse_local_cores(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return 8
    return 32
