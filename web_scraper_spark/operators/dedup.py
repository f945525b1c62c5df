"""URL-seen dedup: partitioned Bloom filter pre-filter + exact anti-join.

Reference parity (SURVEY.md §2.2 P2/P4, §2.3 J1): the reference checks a
Python set/list of downloaded ids at three redundant layers
(main.py:259-268, main_scraper.py:670-676, video_processor.py:56-59,
file_downloader.py:218-233) and in its `new/` generation truncates the check
to the first 100 ids for memory (new/duplicate_detection.py:102-165).
Here the seen-set is exact at any scale:

  1. **Bloom pre-filter** (fast path): a partitioned bitset over
     ``url_hash`` — vectorized numpy per Arrow batch, zero per-row Python.
     Definite-negatives skip the join entirely; only "maybe seen" rows reach
     the shuffle.
  2. **Exact anti-join** (correct path): ``left_anti`` on ``url_hash`` —
     no false negatives ever, bloom false-positives resolved here.

Scale notes (10^10-row frontier): the bitset is sized at build time from the
seen-set cardinality (~1.2 GB per 10^9 keys at 1% FPR). Up to a few hundred
MB it ships as a broadcast (one copy per executor, probed map-side with no
shuffle). Beyond that, `partition_aligned=True` keeps each bitset shard
executor-resident: frontier and bloom shards are co-partitioned by
``pmod(url_hash, n_shards)`` so the probe is a zipped per-partition pass and
never materializes the full filter anywhere.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_anti_join_seen(frontier: DataFrame, seen: DataFrame, key: str = "url_hash") -> DataFrame:
    """frontier ⟕̸ seen — the ground-truth dedup (SURVEY §2.3 J1)."""
    return frontier.join(seen.select(key).distinct(), key, "left_anti")


# ----------------------------------------------------------------- bloom

_M31 = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 increment


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives the second hash from url_hash."""
    z = h + _M31
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bloom_positions(hashes: np.ndarray, k: int, m_bits: int) -> Iterator[np.ndarray]:
    """k probe positions per key via double hashing h1 + i*h2 (mod m).

    h is mixed BEFORE deriving h1: shards are selected by ``h mod
    n_shards``, so within a shard the raw low bits are constant — and when
    m_bits shares a factor with n_shards, ``h mod m_bits`` would collapse
    to 1/n_shards of the positions (measured 8× worse FPR). splitmix64
    decorrelates the in-shard position from the shard selector."""
    h = hashes.view(np.uint64) if hashes.dtype == np.int64 else hashes.astype(np.uint64)
    hm = _mix(h)
    h1 = hm % np.uint64(m_bits)
    h2 = (_mix(hm) % np.uint64(m_bits - 1)) + np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for target FPR; m rounded up to a byte multiple."""
    n_keys = max(n_keys, 1)
    m = max(int(-n_keys * math.log(fpr) / (math.log(2) ** 2)), 64)
    m = (m + 7) // 8 * 8
    k = max(int(round(m / n_keys * math.log(2))), 1)
    return m, min(k, 16)


BLOOM_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("m_bits", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)


def empty_bloom_shards(
    spark, n_shards: int = 32, capacity: int = 1_000_000, fpr: float = 0.01
):
    """An all-zero sharded filter sized for ``capacity`` total keys.
    The (m_bits, k) geometry is FIXED at creation — incremental updates
    (update_bloom_shards) must never resize, or old bits become garbage."""
    per_shard = max(capacity // max(n_shards, 1), 1)
    m_bits, k = bloom_params(per_shard, fpr)
    zero = bytes(m_bits // 8)
    rows = [(s, m_bits, k, zero) for s in range(n_shards)]
    return spark.createDataFrame(rows, schema=BLOOM_SHARD_SCHEMA)


def update_bloom_shards(
    shards: DataFrame,
    new_keys: DataFrame,
    key: str = "url_hash",
    n_shards: int = 32,
) -> DataFrame:
    """OR the new keys into the existing shards (the north rule's
    "partitioned Bloom filter MAINTAINED via vectorized Arrow UDFs"):
    build partial shards from the new keys with the existing geometry,
    union with the current shards, and OR-merge per shard id. Steady-state
    cost is O(new keys) — the filter is never rebuilt from the full
    seen-set."""
    first = shards.select("m_bits", "k").first()
    m_bits, k = int(first["m_bits"]), int(first["k"])

    def _build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitsets: dict[int, np.ndarray] = {}
        for pdf in pdf_iter:
            hashes = pdf[key].to_numpy(np.int64)
            sh = pdf["__shard"].to_numpy()
            for s in np.unique(sh):
                bools = bitsets.setdefault(int(s), np.zeros(m_bits, bool))
                for pos in _bloom_positions(hashes[sh == s], k, m_bits):
                    bools[pos] = True
        yield pd.DataFrame(
            {
                "shard": list(bitsets.keys()),
                "m_bits": [m_bits] * len(bitsets),
                "k": [k] * len(bitsets),
                "bits": [
                    np.packbits(b, bitorder="little").tobytes() for b in bitsets.values()
                ],
            }
        )

    partials = (
        new_keys.select(
            F.col(key), F.pmod(F.col(key), F.lit(n_shards)).cast("int").alias("__shard")
        )
        .repartition(n_shards, "__shard")
        .mapInPandas(_build, schema=BLOOM_SHARD_SCHEMA)
    )

    def _merge(keypdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, np.uint8)
        for b in keypdf["bits"]:
            acc |= np.frombuffer(b, np.uint8)
        return pd.DataFrame(
            {
                "shard": [int(keypdf["shard"].iloc[0])],
                "m_bits": [m_bits],
                "k": [k],
                "bits": [acc.tobytes()],
            }
        )

    return shards.unionByName(partials).groupBy("shard").applyInPandas(
        _merge, schema=BLOOM_SHARD_SCHEMA
    )


def build_bloom_shards(
    seen: DataFrame,
    key: str = "url_hash",
    n_shards: int = 32,
    fpr: float = 0.01,
    n_keys_hint: int | None = None,
) -> DataFrame:
    """Build a sharded Bloom filter over ``seen[key]`` as a DataFrame of
    (shard, m_bits, k, bits). Each shard covers keys with
    ``pmod(key, n_shards) == shard``; insertion is a grouped Arrow batch op
    (SURVEY §2.10 UDF #2) — numpy bit-ops, no per-row Python.
    """
    n_keys = n_keys_hint if n_keys_hint is not None else seen.count()
    per_shard = max(n_keys // max(n_shards, 1), 1)
    m_bits, k = bloom_params(per_shard, fpr)

    def _build(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one task may receive several shards; accumulate per shard id.
        # Insertion path: boolean scatter + packbits — orders of magnitude
        # faster than np.bitwise_or.at (unbuffered scatter) and collision-
        # safe because boolean assignment is idempotent.
        bitsets: dict[int, np.ndarray] = {}
        for pdf in pdf_iter:
            hashes = pdf[key].to_numpy(np.int64)
            shards = pdf["__shard"].to_numpy()
            for s in np.unique(shards):
                bools = bitsets.setdefault(int(s), np.zeros(m_bits, bool))
                hs = hashes[shards == s]
                for pos in _bloom_positions(hs, k, m_bits):
                    bools[pos] = True
        yield pd.DataFrame(
            {
                "shard": list(bitsets.keys()),
                "m_bits": [m_bits] * len(bitsets),
                "k": [k] * len(bitsets),
                "bits": [
                    np.packbits(b, bitorder="little").tobytes()
                    for b in bitsets.values()
                ],
            }
        )

    sharded = seen.select(
        F.col(key), F.pmod(F.col(key), F.lit(n_shards)).cast("int").alias("__shard")
    ).repartition(n_shards, "__shard")
    partials = sharded.mapInPandas(_build, schema=BLOOM_SHARD_SCHEMA)

    # Shards produced by different tasks for the same id are OR-merged.
    def _merge(keypdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(m_bits // 8, np.uint8)
        for b in keypdf["bits"]:
            acc |= np.frombuffer(b, np.uint8)
        return pd.DataFrame(
            {
                "shard": [int(keypdf["shard"].iloc[0])],
                "m_bits": [m_bits],
                "k": [k],
                "bits": [acc.tobytes()],
            }
        )

    return partials.groupBy("shard").applyInPandas(_merge, schema=BLOOM_SHARD_SCHEMA)


#: above this total filter size the broadcast probe stops being sane (driver
#: collects every shard, each executor holds a full copy); the probe switches
#: to the partition-aligned path automatically.
BLOOM_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def _probe_hashes(
    hashes: np.ndarray, bits: np.ndarray, m_bits: int, k: int
) -> np.ndarray:
    """Vectorized membership test of ``hashes`` against one shard bitset."""
    hit = np.ones(hashes.size, bool)
    for pos in _bloom_positions(hashes, k, m_bits):
        hit &= (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1
    return hit


def bloom_probe(
    frontier: DataFrame,
    bloom_shards: DataFrame,
    key: str = "url_hash",
    n_shards: int = 32,
    out_col: str = "maybe_seen",
    partition_aligned: bool | None = None,
) -> DataFrame:
    """Add ``out_col``: True if the bloom *may* contain the key (never a
    false negative). Two physical strategies, same result:

    * **broadcast** (small filters): bitsets collect to the driver once and
      ship as one broadcast; the probe is a SCALAR pandas UDF over the key
      column alone — only 8 bytes/row cross the Arrow boundary each way,
      while every other column stays JVM-side (a mapInPandas variant that
      round-tripped whole rows measured ~10× more serde volume).
    * **partition-aligned** (big filters): frontier rows and bitset shards
      are co-grouped by ``pmod(key, n_shards)`` and probed per shard group
      (cogroup + applyInPandas). No driver collect, no full-filter copy
      anywhere — each task holds exactly one shard (m_bits/8 bytes), so a
      1.2 GB/10^9-key filter at 10^10 seen keys probes with 12 GB spread
      over n_shards tasks instead of 12 GB on the driver + every executor.
      Costs one shuffle of the probed rows (all columns ride through
      Arrow), which is why small filters stay on the broadcast path.

    ``partition_aligned=None`` picks automatically from the filter's total
    size (threshold BLOOM_BROADCAST_MAX_BYTES)."""
    if partition_aligned is None:
        geom = bloom_shards.select("m_bits").first()
        total_bytes = 0 if geom is None else int(geom["m_bits"]) // 8 * n_shards
        partition_aligned = total_bytes > BLOOM_BROADCAST_MAX_BYTES
    if partition_aligned:
        return _bloom_probe_aligned(frontier, bloom_shards, key, n_shards, out_col)
    return _bloom_probe_broadcast(frontier, bloom_shards, key, n_shards, out_col)


def _bloom_probe_broadcast(
    frontier: DataFrame,
    bloom_shards: DataFrame,
    key: str,
    n_shards: int,
    out_col: str,
) -> DataFrame:
    spark = frontier.sparkSession
    shards_local = {
        int(r["shard"]): (np.frombuffer(r["bits"], np.uint8), int(r["m_bits"]), int(r["k"]))
        for r in bloom_shards.collect()
    }
    bc = spark.sparkContext.broadcast(shards_local)

    def _probe(s):
        shards = bc.value
        hashes = s.to_numpy(np.int64)
        shard_ids = np.mod(np.mod(hashes, n_shards) + n_shards, n_shards)
        maybe = np.zeros(len(hashes), bool)
        for sid in np.unique(shard_ids):
            entry = shards.get(int(sid))
            mask = shard_ids == sid
            if entry is None:
                continue  # empty shard → definitely not seen
            bits, m_bits, k = entry
            maybe[mask] = _probe_hashes(hashes[mask], bits, m_bits, k)
        return pd.Series(maybe)

    probe_udf = F.pandas_udf(_probe, T.BooleanType())
    return frontier.withColumn(out_col, probe_udf(F.col(key)))


def _bloom_probe_aligned(
    frontier: DataFrame,
    bloom_shards: DataFrame,
    key: str,
    n_shards: int,
    out_col: str,
) -> DataFrame:
    """Executor-resident probe: cogroup frontier rows with their bitset
    shard on ``pmod(key, n_shards)``. The filter is never materialized
    whole — not on the driver, not per executor."""
    out_schema = T.StructType(
        list(frontier.schema.fields) + [T.StructField(out_col, T.BooleanType())]
    )
    cols = frontier.columns
    left = frontier.withColumn(
        "__shard", F.pmod(F.col(key), F.lit(n_shards)).cast("int")
    )
    right = bloom_shards.select(
        F.col("shard").alias("__shard"), "m_bits", "k", "bits"
    )

    def _probe_group(rows: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if rows.empty:
            return pd.DataFrame(columns=list(rows.columns) + [out_col]).drop(
                columns="__shard"
            )
        if shard.empty:
            maybe = np.zeros(len(rows), bool)  # empty shard → definitely new
        else:
            m_bits, k = int(shard["m_bits"].iloc[0]), int(shard["k"].iloc[0])
            bits = np.frombuffer(shard["bits"].iloc[0], np.uint8)
            maybe = _probe_hashes(rows[key].to_numpy(np.int64), bits, m_bits, k)
        out = rows.drop(columns="__shard").copy()
        out[out_col] = maybe
        return out

    return (
        left.groupBy("__shard")
        .cogroup(right.groupBy("__shard"))
        .applyInPandas(_probe_group, schema=out_schema)
        .select(*cols, out_col)
    )


def mark_seen(
    batch: DataFrame,
    seen_keys: DataFrame | None,
    key: str = "url_hash",
    use_bloom: bool = True,
    n_shards: int = 32,
    fpr: float = 0.01,
    seen_count: int | None = None,
    bloom_min_seen: int = 20_000,
    out_col: str = "is_seen",
    bloom_shards: DataFrame | None = None,
    bloom_partition_aligned: bool | None = False,
    filter_kind: str = "bloom",
) -> DataFrame:
    """Flag variant of the dedup operator: adds ``out_col`` instead of
    filtering, so one downstream checkpoint can serve both the kept and the
    skipped rows (the skipped ones still need a frontier status update).

    With ``bloom_shards`` (the incrementally-maintained filter, see
    update_bloom_shards) the probe always runs — steady-state cost is one
    broadcast + a vectorized scan. Without it, a filter is built on the
    fly once the seen-set is big enough to beat the plain broadcast-hash
    anti-join (``bloom_min_seen``); below that the exact join is already
    one broadcast away and the build would cost more jobs than it saves.

    ``bloom_partition_aligned``: False (default) = broadcast probe, True =
    executor-resident cogroup probe, None = size-based auto (costs one tiny
    geometry-lookup job — hot-loop callers should resolve once and pass an
    explicit bool; CrawlEngine resolves AUTO once per engine via
    ``_resolve_probe_aligned`` and hands this function the cached result).

    ``filter_kind``: "bloom" (default) or "cuckoo" — with "cuckoo",
    ``bloom_shards`` carries cuckoo shards (operators/cuckoo.py) and the
    probe/build route there. Same no-false-negative contract either way;
    cuckoo adds delete support at a tighter FPR.
    """
    if seen_keys is None:
        return batch.withColumn(out_col, F.lit(False))
    seen_marked = seen_keys.select(key).distinct().withColumn("__hit", F.lit(True))
    n = seen_count if seen_count is not None else None
    if bloom_shards is not None or (
        use_bloom and (n is None or n >= bloom_min_seen)
    ):
        if filter_kind == "cuckoo":
            from .cuckoo import build_cuckoo_shards, cuckoo_probe

            shards = (
                bloom_shards
                if bloom_shards is not None
                else build_cuckoo_shards(seen_keys, key, n_shards, n_keys_hint=seen_count)
            )
            probed = cuckoo_probe(
                batch, shards, key, n_shards, partition_aligned=bloom_partition_aligned
            )
        else:
            shards = (
                bloom_shards
                if bloom_shards is not None
                else build_bloom_shards(seen_keys, key, n_shards, fpr, n_keys_hint=seen_count)
            )
            probed = bloom_probe(
                batch, shards, key, n_shards, partition_aligned=bloom_partition_aligned
            )
        definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen").withColumn(
            out_col, F.lit(False)
        )
        maybe = (
            probed.filter(F.col("maybe_seen"))
            .drop("maybe_seen")
            .join(seen_marked, key, "left")
            .withColumn(out_col, F.coalesce(F.col("__hit"), F.lit(False)))
            .drop("__hit")
        )
        return definite_new.unionByName(maybe)
    return (
        batch.join(seen_marked, key, "left")
        .withColumn(out_col, F.coalesce(F.col("__hit"), F.lit(False)))
        .drop("__hit")
    )


def dedup_against_seen(
    frontier: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    use_bloom: bool = True,
    n_shards: int = 32,
    fpr: float = 0.01,
    seen_count: int | None = None,
    bloom_partition_aligned: bool | None = None,
) -> DataFrame:
    """The full dedup operator: bloom pre-filter (definite-negatives bypass
    the shuffle) + exact anti-join on the survivors. Equivalent to
    ``exact_anti_join_seen`` but at 10^10×10^9 scale only the ~1%
    false-positive slice of unseen rows pays join cost."""
    if not use_bloom:
        return exact_anti_join_seen(frontier, seen, key)
    shards = build_bloom_shards(seen, key, n_shards, fpr, n_keys_hint=seen_count)
    probed = bloom_probe(
        frontier, shards, key, n_shards, partition_aligned=bloom_partition_aligned
    )
    definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    resolved = exact_anti_join_seen(maybe, seen, key)
    return definite_new.unionByName(resolved)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    n_shards: int = 32,
    fpr: float = 0.01,
) -> DataFrame:
    """Runtime bloom-filter join reduction — the hand-rollable form of the
    runtime-filter rewrite (Spark's spark.sql.optimizer.runtime.bloomFilter,
    Iceberg/Trino dynamic filtering), built from the engine's own sharded
    filter: build a bloom over the SMALL side's join keys, probe the BIG
    side and drop definite non-matches BEFORE the join shuffle, then finish
    with the exact equi-join. The bloom admits false positives but never
    false negatives, and every false positive dies in the final join — so
    the result is EXACTLY inner-join semantics while the shuffle moves
    ~(matches + fpr·|big|) rows instead of all of big. At 100 TB this is
    the difference between shuffling the whole fact table and shuffling the
    ~1% of it that joins a filtered dimension.

    The dedup-operator dual: ``dedup_against_seen`` keeps the bloom's
    definite-negatives (anti-join), this keeps the maybe-positives
    (semi-join reduction); both resolve the fuzzy slice exactly.

    Keys must be integral — build/probe reuse the seen-set filter's
    splitmix64 mixing (dedup.py:48), so raw sequential ids shard and probe
    uniformly without pre-hashing."""
    skey = small_key or big_key
    keys = small.select(F.col(skey).cast("long").alias(big_key))
    shards = build_bloom_shards(keys, key=big_key, n_shards=n_shards, fpr=fpr)
    probed = bloom_probe(big, shards, key=big_key, n_shards=n_shards)
    pre = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    if skey == big_key:
        return pre.join(small, on=big_key)
    return pre.join(small, on=pre[big_key] == small[skey])
