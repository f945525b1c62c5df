"""The fetch stage: batched payload fetch + validation inside ``mapInPandas``
(SURVEY.md §2.1 S2/S7, §2.10 UDF #3/#5).

Reference parity: requests stream download with chunking, temp file and
atomic replace (file_downloader.py:331-528) plus magic-byte/min-size
verification (file_downloader.py:590-676). In Spark the fetch is a
partition-local Arrow-batched pass:

  * rows arrive pre-partitioned by (host, salt) and pre-ranked into
    politeness waves (operators/politeness.py);
  * the task walks waves in order, inserting the host's ``crawl_delay_ms``
    between waves — in the sandbox these are *logical ticks* recorded per
    row (deterministic, testable); against a live site the same loop calls
    ``time.sleep`` and a requests.Session (see ``http_fetch_rows``, the
    clearly-marked live-network stub);
  * payload bytes come from the synthetic store (the payload table joined
    onto the batch — the sandbox's "origin server");
  * deterministic fault injection (FIXTURES.md §6) fails rows by mode:
    network/rate_limit/permanent/temporary drop the body with a
    characteristic error message (classified downstream by
    functions/errors.classify_error); ``validation`` truncates the body so
    the *validator* — not the injector — detects it;
  * surviving bodies are decoded + phash-verified via
    functions/imaging.decode_validate_batch (PSNR path exercised by the
    lossy stub codec).

Atomicity: the reference's .part-file dance is unnecessary — results only
become visible via the snapshot commit (sources/snapshots.py), the Iceberg
answer to atomic downloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.broadcast import Broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import FETCH_RESULT_SCHEMA
from ..functions.imaging import decode_validate_batch

#: error messages per injected fault mode → classified by classify_error into
#: exactly the reference's five classes (video_processor.py:194-235)
FAULT_MESSAGES = {
    "network": "connection timeout while fetching payload",
    "rate_limit": "HTTP 429 too many requests",
    "permanent": "HTTP 404 not found",
    "temporary": "temporary upstream glitch",
}


def join_payload_store(batch: DataFrame, payload: DataFrame) -> DataFrame:
    """Attach origin bytes to the batch — the sandbox 'HTTP GET'.

    Scale shape: the payload table is the 100 TB side and the micro-batch is
    bounded, so the join broadcasts the batch and never shuffles the payload.
    An outer join can't broadcast its preserved side, so this is an INNER
    join — batch rows with no payload row simply produce no result row, and
    the engine synthesizes their 404s afterwards via a bounded anti-join of
    scheduled-minus-fetched (plans/crawl.py), keeping the at-scale plan:
    one pruned payload scan probed by a broadcast hash table.
    """
    p = payload.select(
        F.col("image_id"),
        F.col("bytes").alias("origin_bytes"),
        F.col("fmt").alias("origin_fmt"),
        F.col("caption").alias("origin_caption"),
        F.col("phash").alias("origin_phash"),
    )
    return p.join(F.broadcast(batch), "image_id", "inner").select(
        *batch.columns, "origin_bytes", "origin_fmt", "origin_caption", "origin_phash"
    )


def fetch_and_validate(
    batch_with_payload: DataFrame,
    fault_plan_bc: Broadcast | None = None,
    verify_phash: bool = True,
) -> DataFrame:
    """Run the fetch+validate pass. Input must carry: url, url_hash,
    image_id, priority, position, attempts, seq, host, fetch_wave,
    host_rank, crawl_delay_ms (nullable), origin_* columns. Output:
    FETCH_RESULT rows (host and seq ride through so commits never join
    back to the frontier)."""

    def _fetch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        faults = fault_plan_bc.value if fault_plan_bc is not None else {}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            # politeness: walk waves in order; logical tick accounting.
            pdf = pdf.sort_values(["fetch_wave", "host", "host_rank"], kind="mergesort")
            n = len(pdf)
            blobs, fmts, errors = [], [], [None] * n
            for i in range(n):
                row = pdf.iloc[i]
                body = row["origin_bytes"]
                fmt = row["origin_fmt"]
                fault = faults.get(row["image_id"])
                if fault is not None:
                    mode, fail_count = fault
                    active = fail_count == -1 or int(row["attempts"]) < fail_count
                    if active:
                        if mode == "validation" and body is not None:
                            body = bytes(body)[: max(len(body) // 2, 10)]
                        else:
                            body, errors[i] = None, FAULT_MESSAGES[mode]
                if body is None and errors[i] is None:
                    errors[i] = "HTTP 404 not found"  # no payload row at origin
                blobs.append(None if body is None else bytes(body))
                fmts.append(fmt)
            blob_s = pd.Series(blobs, dtype=object)
            fmt_s = pd.Series(fmts, dtype=object)
            exp_ph = pd.Series(list(pdf["origin_phash"]), dtype=object) if verify_phash else None
            val = decode_validate_batch(blob_s, fmt_s, exp_ph)
            fetched = pd.Series([e is None for e in errors])
            ok = fetched & val["ok"].to_numpy()
            err = [
                errors[i] if errors[i] is not None else (None if ok.iloc[i] else val["error"].iloc[i])
                for i in range(n)
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "url_hash": pdf["url_hash"].to_numpy(),
                    "host": pdf["host"].to_numpy(),
                    "image_id": pdf["image_id"].to_numpy(),
                    "priority": pdf["priority"].to_numpy(),
                    "position": pdf["position"].to_numpy(),
                    "attempts": pdf["attempts"].to_numpy(),
                    "seq": pdf["seq"].to_numpy(),
                    "ok": ok.to_numpy(),
                    "error_msg": pd.Series(err, dtype=object),
                    "bytes": pd.Series([blobs[i] if ok.iloc[i] else None for i in range(n)], dtype=object),
                    "w": val["w"].to_numpy(),
                    "h": val["h"].to_numpy(),
                    "fmt": fmt_s,
                    "caption": pdf["origin_caption"].to_numpy(),
                    "phash": val["phash"].to_numpy(),
                    "fetch_wave": pdf["fetch_wave"].to_numpy(),
                }
            )

    return batch_with_payload.mapInPandas(_fetch, schema=FETCH_RESULT_SCHEMA)


def http_fetch_rows(pdf: pd.DataFrame, timeout_s: float = 30.0) -> pd.DataFrame:
    """LIVE-NETWORK PATH (stub in this sandbox — no outbound crawl targets).

    Same shape as the synthetic fetch: one requests.Session per partition
    (connection pooling amortized per Arrow batch, the Spark analog of
    file_downloader.py:345-358), real ``time.sleep(crawl_delay_ms/1000)``
    between waves, chunked streaming reads. Kept import-gated and untested
    here; swap it into fetch_and_validate's body for a real crawl.
    """
    raise NotImplementedError(
        "live HTTP fetch is stubbed in the sandbox; use the synthetic store "
        "(join_payload_store + fetch_and_validate)"
    )
