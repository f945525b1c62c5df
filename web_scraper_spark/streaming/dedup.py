"""Stateful streaming URL dedup: first-seen-wins across micro-batches via
``applyInPandasWithState`` (the custom-stateful-operator escape hatch the
built-in ``dropDuplicates`` cannot match here, because we also need
duplicate counting and recrawl-window expiry).

This is the streaming restatement of the engine's seen-set (operators/
dedup.py): the reference checks a downloaded-ids set before every fetch
(main.py:259-268, new/duplicate_detection.py:102-165); batch mode answers
it with bloom/cuckoo + exact anti-join; a continuously-arriving discovered-
URL stream answers it with per-key state:

  * state key = ``url_hash`` — per-key state is a constant-size tuple
    (first_seen epoch-ms, dup count), so the state store (HDFS/RocksDB-
    backed on a cluster) scales to billions of keys without any executor
    holding a full filter — the streaming analogue of the partition-aligned
    probe;
  * first arrival of a key emits the row (append mode); every later
    arrival folds into the state's dup counter and emits nothing;
  * optional ``ttl_minutes`` arms an EVENT-TIME timeout per key: once the
    watermark passes last-seen + ttl, the key's state is dropped and the
    URL becomes eligible again — the scoped dup window (SURVEY §2.2 P4) /
    recrawl semantics, which an append-only filter cannot express (see
    operators/cuckoo.py for the batch-side deletable variant). Event-time
    timers (not processing-time) deliberately: they are deterministic,
    replay identically from a checkpoint, and terminate under
    Trigger.AvailableNow — processing-time timers spin empty micro-batches
    forever under availableNow (measured: 80+ empty batches and climbing).

Exactly-once: state lives in the streaming checkpoint; a restart replays
from the last commit, so first-seen decisions survive crashes (asserted in
tests/test_streaming.py with a two-run availableNow sequence).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: per-key state: (first_seen_ms, last_seen_ms, n_dupes)
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_seen_ms", T.LongType()),
        T.StructField("last_seen_ms", T.LongType()),
        T.StructField("n_dupes", T.LongType()),
    ]
)

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("first_seen_ms", T.LongType()),
    ]
)


def first_seen_dedup(
    urls: DataFrame,
    ttl_minutes: float | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Emit each ``url_hash`` once — its first arrival — across all
    micro-batches of a streaming DataFrame with columns
    (url_hash long, url string, ts timestamp).

    ``ttl_minutes``: recrawl window in EVENT time — once the stream's
    watermark passes a key's last arrival + ttl, its state is evicted and
    the next arrival emits again. None = remember forever (state grows
    with distinct keys; on a cluster back the state store with RocksDB).
    ``watermark_delay`` bounds how out-of-order ``ts`` may be."""
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    ttl_ms = None if ttl_minutes is None else max(int(ttl_minutes * 60_000), 1)

    def _dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # recrawl window elapsed — forget the key
            return
        rows = [pdf for pdf in pdfs if not pdf.empty]
        if not rows:
            return
        pdf = pd.concat(rows, ignore_index=True)
        n = len(pdf)
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        last_ms = int(ts_ms.max())
        if state.exists:
            first_ms, prev_last, dupes = state.get
            last_ms = max(last_ms, int(prev_last))
            state.update((int(first_ms), last_ms, int(dupes) + n))
            emit = None
        else:
            first = pdf.iloc[int(ts_ms.argmin())]
            first_ms = int(ts_ms.min())
            state.update((first_ms, last_ms, n - 1))
            emit = pd.DataFrame(
                {
                    "url_hash": [int(key[0])],
                    "url": [first["url"]],
                    "first_seen_ms": [first_ms],
                }
            )
        if ttl_ms is not None:
            # event-time timer: fire when the watermark passes last+ttl
            # (must stay ahead of the current watermark or Spark rejects it)
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        if emit is not None:
            yield emit

    src = urls if ttl_minutes is None else urls.withWatermark("ts", watermark_delay)
    return src.groupBy("url_hash").applyInPandasWithState(
        _dedup,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
