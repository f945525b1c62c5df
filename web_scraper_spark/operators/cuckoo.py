"""Partitioned cuckoo-filter seen-set — the deletable alternative to the
sharded Bloom filter (operators/dedup.py).

The north rule names "a partitioned Bloom/cuckoo-filter URL-seen set";
the Bloom variant is append-only, which is exactly right for a seen-log —
but a crawl that RE-schedules URLs (recrawl windows, un-fail on success
reversals per SURVEY §2.7 SO3, retracting a poisoned site) needs delete
support, which a Bloom filter fundamentally cannot give. A cuckoo filter
[Fan et al., CoNEXT'14] stores 16-bit fingerprints in a 4-slot bucket
table; membership, insert AND delete are all O(1), and at 16-bit
fingerprints the false-positive rate is ~2·SLOTS/2^16 ≈ 0.012% — two
orders of magnitude tighter than the Bloom default 1%.

Same distribution contract as the Bloom shards:

  * sharded by ``pmod(url_hash, n_shards)`` — geometry fixed at init;
  * maintenance is incremental (cogroup existing shard ⟷ new keys,
    insert inside one Arrow batch task — O(new keys), never a rebuild);
  * probe is vectorized numpy over the 8-byte key column only, with the
    same broadcast / partition-aligned duality as ``bloom_probe``.

No false negatives, ever: inserts that cannot place a fingerprint after
the eviction budget raise instead of dropping the key (callers size
``capacity`` with headroom; at the default 84% max load the failure
probability is negligible). Deletes are only issued for keys known to be
present (the seen-log is the source of truth), which is the standard
cuckoo-filter safety precondition.

Reference parity: same role as the reference's downloaded-ids set
(main.py:259-268, new/duplicate_detection.py:102-165) — see
operators/dedup.py for the full mapping.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _mix

SLOTS = 4  # fingerprints per bucket (b=4 → max stable load ~0.95)
MAX_LOAD = 0.84  # sizing headroom: capacity / (m_buckets·SLOTS) at init
MAX_KICKS = 500  # eviction budget before declaring the shard over-full
_FP_MULT = np.uint64(0x5BD1E995)  # alt-index mixer (murmur2 magic)

CUCKOO_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("m_buckets", T.LongType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)


def _next_pow2(n: int) -> int:
    return 1 << max(int(n - 1).bit_length(), 0)


def cuckoo_params(n_keys: int) -> int:
    """m_buckets (power of two — the alt-index XOR trick requires it) for
    ``n_keys`` at ≤ MAX_LOAD occupancy."""
    n_keys = max(n_keys, 1)
    return max(_next_pow2(int(np.ceil(n_keys / (SLOTS * MAX_LOAD)))), 2)


def _table_of(bits: bytes, m_buckets: int) -> np.ndarray:
    return np.frombuffer(bits, np.uint16).reshape(m_buckets, SLOTS).copy()


def _fp_index(h: np.ndarray, m_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint, primary bucket) per key. Fingerprint comes from the
    high 16 bits of the mixed hash, the bucket from the low bits — disjoint
    bit ranges, so fp and index are independent even for small tables."""
    hh = h.view(np.uint64) if h.dtype == np.int64 else h.astype(np.uint64)
    hm = _mix(hh)
    f = (hm >> np.uint64(48)).astype(np.uint16)
    f = np.where(f == 0, np.uint16(1), f)  # 0 means "empty slot"
    i = (hm & np.uint64(m_buckets - 1)).astype(np.int64)
    return f, i


def _alt(i: np.ndarray, f: np.ndarray, m_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: i XOR hash(fp). Self-inverse, so the
    probe never needs to know which of the two buckets holds the key."""
    return (
        (i.astype(np.uint64) ^ (f.astype(np.uint64) * _FP_MULT))
        & np.uint64(m_buckets - 1)
    ).astype(np.int64)


def _contains(table: np.ndarray, f: np.ndarray, i: np.ndarray) -> np.ndarray:
    i2 = _alt(i, f, table.shape[0])
    fcol = f[:, None]
    return (table[i] == fcol).any(axis=1) | (table[i2] == fcol).any(axis=1)


def _insert_into(table: np.ndarray, h: np.ndarray) -> None:
    """Insert all keys of ``h`` into ``table`` in place. Duplicate hashes
    WITHIN the batch collapse (np.unique — same 64-bit url_hash IS the same
    key everywhere in this engine), but a key whose (fingerprint, bucket
    pair) is already occupied by a DIFFERENT key still stores its own copy.
    That duplicate-copy rule is the standard Fan et al. §4 precondition for
    delete support: if two distinct keys collide on (fp, bucket-pair) and
    shared one stored copy, deleting one key would strip the other's only
    copy — a false negative, which this module promises never to produce.
    Copies per (fp, bucket-pair) stay bounded because the engine inserts
    each key exactly once (keys enter the seen log once; ``requeue``
    deletes before any re-insert) and cross-key collisions are ~2·SLOTS/2^16
    per pair.

    Mostly-vectorized: each round elects one candidate per distinct bucket
    (no write conflicts), scatters the electees into free slots in one
    fancy-indexed write, and flips full-bucket losers to their alternate
    bucket. Keys that find BOTH buckets full fall out to the classic
    per-key eviction walk — a vanishing fraction below MAX_LOAD."""
    m = table.shape[0]
    h = np.unique(h.view(np.uint64) if h.dtype == np.int64 else h.astype(np.uint64))
    if h.size == 0:
        return
    pf, pi = _fp_index(h, m)
    tried_alt = np.zeros(pf.size, bool)
    evict_f: list[int] = []
    evict_i: list[int] = []
    while pf.size:
        order = np.argsort(pi, kind="stable")
        ii = pi[order]
        head = np.ones(ii.size, bool)
        head[1:] = ii[1:] != ii[:-1]
        heads = order[head]  # one electee per distinct bucket
        rows = table[pi[heads]]
        free = rows == 0
        has_free = free.any(axis=1)
        placed = heads[has_free]
        table[pi[placed], free.argmax(axis=1)[has_free]] = pf[placed]
        # full-bucket electees: flip to alt once, then hand to eviction
        losers = heads[~has_free]
        to_evict = losers[tried_alt[losers]]
        evict_f.extend(pf[to_evict].tolist())
        evict_i.extend(pi[to_evict].tolist())
        flip = losers[~tried_alt[losers]]
        pi[flip] = _alt(pi[flip], pf[flip], m)
        tried_alt[flip] = True
        keep = np.ones(pf.size, bool)
        keep[placed] = False
        keep[to_evict] = False
        pf, pi, tried_alt = pf[keep], pi[keep], tried_alt[keep]
    for f0, i0 in zip(evict_f, evict_i):
        _evict_insert(table, np.uint16(f0), int(i0))


def _evict_insert(table: np.ndarray, f: np.uint16, i: int) -> None:
    m = table.shape[0]
    for kick in range(MAX_KICKS):
        row = table[i]
        empty = np.flatnonzero(row == 0)
        if empty.size:
            table[i, empty[0]] = f
            return
        s = kick % SLOTS  # deterministic victim rotation
        f, table[i, s] = table[i, s], f
        i = int(_alt(np.asarray([i]), np.asarray([f], np.uint16), m)[0])
    raise ValueError(
        f"cuckoo shard over capacity: eviction budget ({MAX_KICKS}) exhausted"
        " — size `capacity` with headroom (MAX_LOAD=0.84)"
    )


def _delete_from(table: np.ndarray, h: np.ndarray) -> None:
    """Remove one fingerprint copy per unique key. Safe only for keys that
    were inserted (standard cuckoo precondition — the caller's seen-log is
    authoritative); deleting an absent key is a silent no-op. Because
    ``_insert_into`` stores one copy per distinct key even under
    (fp, bucket-pair) collisions, removing ONE copy here never strips a
    colliding key's membership."""
    m = table.shape[0]
    h = np.unique(h.view(np.uint64) if h.dtype == np.int64 else h.astype(np.uint64))
    f, i1 = _fp_index(h, m)
    i2 = _alt(i1, f, m)
    for k in range(h.size):  # deletes are rare (recrawl/retract); scalar is fine
        for b in (int(i1[k]), int(i2[k])):
            hit = np.flatnonzero(table[b] == f[k])
            if hit.size:
                table[b, hit[0]] = 0
                break


def empty_cuckoo_shards(spark, n_shards: int = 32, capacity: int = 1_000_000):
    """All-empty sharded filter sized for ``capacity`` total keys. Geometry
    (m_buckets) is FIXED at creation, exactly like the Bloom shards —
    incremental updates must never resize."""
    m_buckets = cuckoo_params(max(capacity // max(n_shards, 1), 1))
    zero = bytes(m_buckets * SLOTS * 2)
    rows = [(s, m_buckets, zero) for s in range(n_shards)]
    return spark.createDataFrame(rows, schema=CUCKOO_SHARD_SCHEMA)


def _apply_keys(
    shards: DataFrame,
    keys: DataFrame,
    key: str,
    n_shards: int,
    op,  # _insert_into | _delete_from
) -> DataFrame:
    """Cogroup each shard row with its slice of ``keys`` and apply ``op``
    inside one Arrow task — the table is mutated executor-side; nothing
    ever lands on the driver. O(keys) per call, never a rebuild."""
    first = shards.select("m_buckets").first()
    m_buckets = int(first["m_buckets"])

    left = shards.select(F.col("shard").alias("__shard"), "m_buckets", "bits")
    right = keys.select(
        F.col(key).alias("__key"),
        F.pmod(F.col(key), F.lit(n_shards)).cast("int").alias("__shard"),
    )

    def _upd(shard_pdf: pd.DataFrame, keys_pdf: pd.DataFrame) -> pd.DataFrame:
        if shard_pdf.empty:  # keys for a shard id that doesn't exist: bug upstream
            raise ValueError("cuckoo update: keys routed to a missing shard")
        table = _table_of(shard_pdf["bits"].iloc[0], m_buckets)
        if not keys_pdf.empty:
            op(table, keys_pdf["__key"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "shard": [int(shard_pdf["__shard"].iloc[0])],
                "m_buckets": [m_buckets],
                "bits": [table.tobytes()],
            }
        )

    return (
        left.groupBy("__shard")
        .cogroup(right.groupBy("__shard"))
        .applyInPandas(_upd, schema=CUCKOO_SHARD_SCHEMA)
    )


def update_cuckoo_shards(
    shards: DataFrame, new_keys: DataFrame, key: str = "url_hash", n_shards: int = 32
) -> DataFrame:
    """Insert ``new_keys[key]`` into the sharded filter (incremental
    maintenance, mirror of update_bloom_shards)."""
    return _apply_keys(shards, new_keys, key, n_shards, _insert_into)


def delete_cuckoo_shards(
    shards: DataFrame, del_keys: DataFrame, key: str = "url_hash", n_shards: int = 32
) -> DataFrame:
    """Remove ``del_keys[key]`` — the operation a Bloom filter cannot do.
    Used when URLs re-enter the frontier (recrawl window, retraction)."""
    return _apply_keys(shards, del_keys, key, n_shards, _delete_from)


def build_cuckoo_shards(
    seen: DataFrame,
    key: str = "url_hash",
    n_shards: int = 32,
    n_keys_hint: int | None = None,
    headroom: float = 2.0,
) -> DataFrame:
    """One-shot build from an existing seen-set (empty + insert)."""
    n_keys = n_keys_hint if n_keys_hint is not None else seen.count()
    shards = empty_cuckoo_shards(
        seen.sparkSession, n_shards, capacity=max(int(n_keys * headroom), n_shards)
    )
    return update_cuckoo_shards(shards, seen, key, n_shards)


# ----------------------------------------------------------------- probe

#: same broadcast-sanity bound as the Bloom probe
CUCKOO_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def cuckoo_probe(
    frontier: DataFrame,
    cuckoo_shards: DataFrame,
    key: str = "url_hash",
    n_shards: int = 32,
    out_col: str = "maybe_seen",
    partition_aligned: bool | None = None,
) -> DataFrame:
    """Add ``out_col``: True if the filter *may* contain the key (no false
    negatives; FPR ≈ 2·SLOTS/2^16). Broadcast vs partition-aligned strategy
    selection is identical to ``bloom_probe`` — see that docstring for the
    scale rationale."""
    if partition_aligned is None:
        geom = cuckoo_shards.select("m_buckets").first()
        total = 0 if geom is None else int(geom["m_buckets"]) * SLOTS * 2 * n_shards
        partition_aligned = total > CUCKOO_BROADCAST_MAX_BYTES
    if partition_aligned:
        return _probe_aligned(frontier, cuckoo_shards, key, n_shards, out_col)
    return _probe_broadcast(frontier, cuckoo_shards, key, n_shards, out_col)


def _probe_broadcast(
    frontier: DataFrame, shards: DataFrame, key: str, n_shards: int, out_col: str
) -> DataFrame:
    spark = frontier.sparkSession
    local = {
        int(r["shard"]): (_table_of(r["bits"], int(r["m_buckets"])), int(r["m_buckets"]))
        for r in shards.collect()
    }
    bc = spark.sparkContext.broadcast(local)

    def _probe(s: pd.Series) -> pd.Series:
        tabs = bc.value
        hashes = s.to_numpy(np.int64)
        sid = np.mod(np.mod(hashes, n_shards) + n_shards, n_shards)
        maybe = np.zeros(hashes.size, bool)
        for sh in np.unique(sid):
            entry = tabs.get(int(sh))
            if entry is None:
                continue
            table, m = entry
            mask = sid == sh
            f, i = _fp_index(hashes[mask], m)
            maybe[mask] = _contains(table, f, i)
        return pd.Series(maybe)

    probe_udf = F.pandas_udf(_probe, T.BooleanType())
    return frontier.withColumn(out_col, probe_udf(F.col(key)))


def _probe_aligned(
    frontier: DataFrame, shards: DataFrame, key: str, n_shards: int, out_col: str
) -> DataFrame:
    out_schema = T.StructType(
        list(frontier.schema.fields) + [T.StructField(out_col, T.BooleanType())]
    )
    cols = frontier.columns
    left = frontier.withColumn(
        "__shard", F.pmod(F.col(key), F.lit(n_shards)).cast("int")
    )
    right = shards.select(F.col("shard").alias("__shard"), "m_buckets", "bits")

    def _probe_group(rows: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
        if rows.empty:
            return pd.DataFrame(columns=list(rows.columns) + [out_col]).drop(
                columns="__shard"
            )
        if shard.empty:
            maybe = np.zeros(len(rows), bool)
        else:
            m = int(shard["m_buckets"].iloc[0])
            table = _table_of(shard["bits"].iloc[0], m)
            hashes = rows[key].to_numpy(np.int64)
            f, i = _fp_index(hashes, m)
            maybe = _contains(table, f, i)
        out = rows.drop(columns="__shard").copy()
        out[out_col] = maybe
        return out

    return (
        left.groupBy("__shard")
        .cogroup(right.groupBy("__shard"))
        .applyInPandas(_probe_group, schema=out_schema)
        .select(*cols, out_col)
    )
