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


def join_payload_store(
    batch: DataFrame,
    payload: DataFrame,
    id_range: tuple[str, str] | None = None,
) -> DataFrame:
    """Attach origin bytes to the batch — the sandbox 'HTTP GET'.

    Scale shape: the payload table is the 100 TB side and the micro-batch is
    bounded, so the join broadcasts the batch and never shuffles the payload.
    An outer join can't broadcast its preserved side, so this is an INNER
    join — batch rows with no payload row simply produce no result row, and
    the engine synthesizes their 404s afterwards via a bounded anti-join of
    scheduled-minus-fetched (plans/crawl.py), keeping the at-scale plan:
    one pruned payload scan probed by a broadcast hash table.

    ``id_range=(lo, hi)``: the batch's min/max image_id, pushed into the
    payload scan as a BETWEEN predicate. Parquet min/max row-group stats
    (and, with the payload table written sorted/bucketed by image_id,
    file-level pruning) then bound the scan to the batch's id range instead
    of the full table — without it every micro-batch reads all of 100 TB.
    The engine computes the range in its existing per-batch stats pass, so
    this costs no extra job.
    """
    if id_range is not None:
        lo, hi = id_range
        payload = payload.filter(F.col("image_id").between(lo, hi))
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
        import numpy as np

        faults = fault_plan_bc.value if fault_plan_bc is not None else {}
        mode_map = {k: v[0] for k, v in faults.items()}
        count_map = {k: v[1] for k, v in faults.items()}
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            # politeness: waves stay in order (a live fetch sleeps
            # crawl_delay_ms at each wave boundary; the sandbox store
            # accounts logical ticks instead — same ordering either way)
            pdf = pdf.sort_values(["fetch_wave", "host", "host_rank"], kind="mergesort")
            n = len(pdf)
            # fault-plan application, vectorized: dict-map the modes and
            # fail budgets, boolean masks for drop/truncate (the old
            # .iloc[i] row walk was the one per-row Python loop left in
            # the hot path)
            ids = pdf["image_id"]
            modes = ids.map(mode_map)
            counts = pd.to_numeric(ids.map(count_map), errors="coerce").to_numpy(
                dtype=float, na_value=np.nan
            )
            attempts = pdf["attempts"].to_numpy(dtype=float)
            active = modes.notna().to_numpy() & (
                (counts == -1.0) | (attempts < counts)
            )
            blob_s = pd.Series(
                [None if b is None else bytes(b) for b in pdf["origin_bytes"]],
                dtype=object,
            ).reset_index(drop=True)
            has_body = blob_s.notna().to_numpy()
            truncate = active & (modes == "validation").to_numpy() & has_body
            drop = active & ~truncate
            errors = np.full(n, None, dtype=object)
            errors[drop] = [
                FAULT_MESSAGES.get(m, "payload validation fault") for m in modes[drop]
            ]
            blob_s[drop] = None
            blob_s[truncate] = [
                b[: max(len(b) // 2, 10)] for b in blob_s[truncate]
            ]
            # no payload row at origin (and not already failed) -> 404
            missing = ~drop & ~has_body
            errors[missing] = "HTTP 404 not found"
            fmt_s = pd.Series(list(pdf["origin_fmt"]), dtype=object)
            exp_ph = pd.Series(list(pdf["origin_phash"]), dtype=object) if verify_phash else None
            val = decode_validate_batch(blob_s, fmt_s, exp_ph)
            # fetch error wins; else decode error; else None — mask
            # selects on object arrays, no per-row walk
            fetched = pd.isna(errors)
            ok = fetched & val["ok"].to_numpy()
            err = np.where(fetched, np.where(ok, None, val["error"].to_numpy(dtype=object)), errors)
            blob_np = blob_s.to_numpy(dtype=object)
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
                    "ok": ok,
                    "error_msg": pd.Series(err, dtype=object),
                    "bytes": pd.Series(np.where(ok, blob_np, None), dtype=object),
                    "w": val["w"].to_numpy(),
                    "h": val["h"].to_numpy(),
                    "fmt": fmt_s,
                    "caption": pdf["origin_caption"].to_numpy(),
                    "phash": val["phash"].to_numpy(),
                    "fetch_wave": pdf["fetch_wave"].to_numpy(),
                }
            )

    return batch_with_payload.mapInPandas(_fetch, schema=FETCH_RESULT_SCHEMA)


def fetch_and_validate_http(
    batch: DataFrame,
    timeout_s: float = 30.0,
    chunk_bytes: int = 64 * 1024,
    max_body_bytes: int | None = None,
) -> DataFrame:
    """LIVE-origin fetch+validate — the pluggable alternative to the
    synthetic-store ``fetch_and_validate`` (reference
    file_downloader.py:206-282, the production download path). Same input
    contract MINUS the origin_* columns: there is no payload-table join
    because the row's ``url`` IS the origin. Each Arrow batch walks its
    politeness waves through ``http_fetch_rows`` (pooled session, chunked
    streaming, real inter-wave sleeps, ST6 stall timeout), then runs the
    SAME decode/validate pass as the synthetic path. Format comes from the
    magic-byte sniff and no expected phash is supplied — a live origin
    doesn't advertise one; decode failure / truncation still classifies as
    a validation error exactly like the synthetic injector's.

    Output: FETCH_RESULT rows (caption is null — live origins serve bytes,
    captions come from the parse stage). 100 TB shape: the batch is already
    salted/partitioned by (host, salt); each task fetches only its slice,
    nothing is collected, and the payload table never exists.
    """

    def _fetch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.imaging import sniff_format

        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(
                ["fetch_wave", "host", "host_rank"], kind="mergesort"
            ).reset_index(drop=True)
            fetched_rows = http_fetch_rows(
                pdf[["url", "fetch_wave", "crawl_delay_ms"]],
                timeout_s=timeout_s,
                chunk_bytes=chunk_bytes,
                max_body_bytes=max_body_bytes,
            )
            blob_s = fetched_rows["body"]
            errors = fetched_rows["error"].to_numpy(dtype=object)
            fmt_s = pd.Series(
                [None if b is None else sniff_format(bytes(b)) for b in blob_s],
                dtype=object,
            )
            val = decode_validate_batch(blob_s, fmt_s, None)
            fetched = pd.isna(errors)
            ok = fetched & val["ok"].to_numpy()
            err = np.where(
                fetched,
                np.where(ok, None, val["error"].to_numpy(dtype=object)),
                errors,
            )
            blob_np = blob_s.to_numpy(dtype=object)
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
                    "ok": ok,
                    "error_msg": pd.Series(err, dtype=object),
                    "bytes": pd.Series(np.where(ok, blob_np, None), dtype=object),
                    "w": val["w"].to_numpy(),
                    "h": val["h"].to_numpy(),
                    "fmt": fmt_s,
                    "caption": pd.Series([None] * len(pdf), dtype=object),
                    "phash": val["phash"].to_numpy(),
                    "fetch_wave": pdf["fetch_wave"].to_numpy(),
                }
            )

    return batch.mapInPandas(_fetch, schema=FETCH_RESULT_SCHEMA)


def head_content_length(
    batch: DataFrame,
    payload: DataFrame,
    out_col: str = "expected_bytes",
    id_range: tuple[str, str] | None = None,
) -> DataFrame:
    """HEAD content-length probe (S8, reference file_downloader.py:187-200):
    annotate the batch with the origin's advertised byte size WITHOUT
    transferring bodies. In the sandbox the 'HEAD request' is a
    metadata-only scan of the payload table — ``length(bytes)`` is answered
    from parquet column statistics/pages, never the full blob join. Null
    where the origin has no payload row (a HEAD 404).

    Feeds the reference's pre-download checks: min-size skip (P7) and
    storage-budget admission (P9) can gate on ``expected_bytes`` before any
    GET is issued.

    Join shape: the batch is the preserved side (rows with no origin row
    must survive with a null), so the probe side can't be broadcast-hinted
    outright; pass ``id_range`` so the pruned size scan is bounded and AQE
    converts it to the broadcast side at runtime."""
    if id_range is not None:
        lo, hi = id_range
        payload = payload.filter(F.col("image_id").between(lo, hi))
    sizes = payload.select("image_id", F.length("bytes").alias(out_col))
    return batch.join(sizes, "image_id", "left").select(*batch.columns, out_col)


def http_fetch_rows(
    pdf: pd.DataFrame,
    timeout_s: float = 30.0,
    chunk_bytes: int = 64 * 1024,
    max_body_bytes: int | None = None,
    resume_from: dict[str, bytes] | None = None,
    sleep=None,
) -> pd.DataFrame:
    """LIVE-NETWORK fetch for one Arrow batch (the real-crawl drop-in for
    the synthetic-store body of ``fetch_and_validate``; no crawl targets
    exist in this sandbox, so tests drive it against a localhost server).

    Reference parity (file_downloader.py:331-528):
      * one ``requests.Session`` per batch — connection pooling amortized
        across the partition's rows (requests keeps per-host pools);
      * chunked streaming reads (``iter_content``), never ``.content`` on
        an unbounded body; ``max_body_bytes`` aborts oversized transfers
        (the reference's storage guard);
      * Range resume: rows whose url appears in ``resume_from`` re-request
        with ``Range: bytes=N-`` and get the prior partial prepended
        (HTTP 206), falling back to a full re-read when the origin ignores
        the header (HTTP 200);
      * politeness: rows are walked in ``fetch_wave`` order with a real
        ``sleep(max crawl_delay_ms of the wave / 1000)`` between waves —
        wave boundaries were computed globally per host upstream
        (operators/politeness.assign_waves), so the aggregate per-host
        request rate stays bounded even though this partition only sees
        its salted slice;
      * per-row timeout (ST6): ``timeout_s`` applies to connect AND each
        chunk read — a stalled transfer raises instead of wedging the
        task, mirroring idm_downloader.py:236-301's stall kill.

    Input columns: url, fetch_wave (int), crawl_delay_ms (nullable int).
    Returns a DataFrame aligned to the input order with: url, status_code
    (nullable int), body (bytes|None), error (str|None).
    """
    try:
        import requests
    except ImportError as e:  # pragma: no cover - requests ships in container
        raise NotImplementedError("live HTTP fetch needs the requests package") from e
    import time as _time

    sleep = sleep if sleep is not None else _time.sleep
    resume_from = resume_from or {}
    order = pdf.sort_values("fetch_wave", kind="mergesort")
    out: dict[int, tuple] = {}
    prev_wave = None
    with requests.Session() as session:
        for idx, row in zip(order.index, order.itertuples()):
            wave = int(row.fetch_wave)
            if prev_wave is not None and wave != prev_wave:
                delays = order.loc[order["fetch_wave"] == prev_wave, "crawl_delay_ms"]
                delay_ms = float(pd.to_numeric(delays, errors="coerce").max() or 0)
                if delay_ms > 0:
                    sleep(delay_ms / 1000.0)
            prev_wave = wave
            url = row.url
            partial = resume_from.get(url, b"")
            headers = {"Range": f"bytes={len(partial)}-"} if partial else {}
            try:
                with session.get(
                    url, headers=headers, stream=True, timeout=timeout_s
                ) as resp:
                    status = resp.status_code
                    if status >= 400:
                        out[idx] = (status, None, f"HTTP {status}")
                        continue
                    chunks = [partial] if (partial and status == 206) else []
                    size = len(chunks[0]) if chunks else 0
                    aborted = False
                    for chunk in resp.iter_content(chunk_size=chunk_bytes):
                        chunks.append(chunk)
                        size += len(chunk)
                        if max_body_bytes is not None and size > max_body_bytes:
                            out[idx] = (status, None, "body exceeds max_body_bytes")
                            aborted = True
                            break
                    if not aborted:
                        out[idx] = (status, b"".join(chunks), None)
            except requests.RequestException as e:
                out[idx] = (None, None, f"{type(e).__name__}: {e}")
    rows = [out[i] for i in pdf.index]
    return pd.DataFrame(
        {
            "url": pdf["url"].to_numpy(),
            "status_code": pd.array(
                [r[0] for r in rows], dtype="Int64"
            ),
            "body": pd.Series([r[1] for r in rows], dtype=object, index=pdf.index),
            "error": pd.Series([r[2] for r in rows], dtype=object, index=pdf.index),
        },
        index=pdf.index,
    )
