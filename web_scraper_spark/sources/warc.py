"""WARC-lite source: read crawl archives (the Common-Crawl/wget/heritrix
interchange format) into the payload table shape.

A 100 TB image crawl rarely starts from a live origin — it starts from
WARC files some upstream fetcher already wrote. This module parses
WARC/1.0 ``response`` records (header block + HTTP response + payload)
into rows, Spark-side via the ``binaryFile`` source + mapInPandas:

  * **One task per WARC file.** WARC is not block-splittable (records are
    back-to-back with no sync markers; gzip WARCs are member-per-record
    but the member index still needs a scan), so the parallelism unit is
    the file — exactly how Common Crawl ships it (~1 GB/file, 10^5 files
    per crawl: far more files than executors, so the cluster stays full
    without intra-file splits).
  * **Bounded memory.** Payloads stream out of one file's bytes; a row per
    record, binary column for the body. maxPartitionBytes does not apply
    (binaryFile gives whole files); peak per-task memory is one WARC file
    — the same bound any WARC consumer has.
  * **Malformed records quarantine, never kill the task** (same contract
    as ingest.py): a record that fails to parse yields an error row with
    the byte offset, so one truncated record in 10^10 costs one row, not
    one job.

The writer exists for fixtures and tests (deterministic output, stable
ordering); gzip input is supported via the stdlib's multi-member gzip
decode. Compression level and member layout follow the WARC 1.0 habit of
one gzip member per record when writing ``compress=True``.

Reference parity: the reference fetches live and never archives
(file_downloader.py); WARC input is the from-scratch engine's upgrade to
replayable crawl inputs. Record fields map 1:1 onto the payload schema
via ``payload_from_warc``.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"

WARC_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def write_warc_record(
    url: str,
    payload: bytes,
    content_type: str,
    status: int = 200,
    warc_date: str = "2026-01-01T00:00:00Z",
    warc_type: str = "response",
) -> bytes:
    """One WARC/1.0 record (header block + HTTP/1.1 response + payload),
    deterministic byte-for-byte for fixtures."""
    http = (
        f"HTTP/1.1 {status} OK".encode()
        + CRLF
        + f"Content-Type: {content_type}".encode()
        + CRLF
        + f"Content-Length: {len(payload)}".encode()
        + CRLF
        + CRLF
        + payload
    )
    headers = (
        b"WARC/1.0" + CRLF
        + f"WARC-Type: {warc_type}".encode() + CRLF
        + f"WARC-Target-URI: {url}".encode() + CRLF
        + f"WARC-Date: {warc_date}".encode() + CRLF
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + f"Content-Length: {len(http)}".encode() + CRLF
        + CRLF
    )
    return headers + http + CRLF + CRLF


def write_warc(records: list[dict], compress: bool = False) -> bytes:
    """records (url, payload, content_type, [status]) → WARC file bytes;
    ``compress=True`` emits one gzip member per record (the standard
    .warc.gz layout)."""
    out = b""
    for r in records:
        blob = write_warc_record(
            r["url"],
            r["payload"],
            r["content_type"],
            r.get("status", 200),
            r.get("warc_date", "2026-01-01T00:00:00Z"),
        )
        out += gzip.compress(blob, 6, mtime=0) if compress else blob
    return out


def _parse_header_block(data: bytes, pos: int) -> tuple[dict, int]:
    """Parse a CRLF-terminated header block starting at pos → (headers,
    end_pos just past the blank line)."""
    end = data.index(CRLF + CRLF, pos)
    headers = {}
    for line in data[pos:end].split(CRLF)[1:]:  # [0] is the version line
        k, _, v = line.partition(b":")
        headers[k.strip().decode().lower()] = v.strip().decode()
    return headers, end + 4


def parse_warc(data: bytes, warc_file: str = "") -> list[dict]:
    """WARC bytes (plain or gzip) → record dicts (WARC_RECORDS_SCHEMA
    fields). Malformed records yield one error row and parsing stops (a
    corrupt length header means the record boundary is lost — the honest
    failure is 'rest of file quarantined', never silent skips)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # multi-member: decodes all members
    rows: list[dict] = []
    pos, idx = 0, 0
    while pos < len(data):
        # skip inter-record CRLFs
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= len(data):
            break
        row = {
            "warc_file": warc_file,
            "record_idx": idx,
            "warc_type": None,
            "url": None,
            "warc_date": None,
            "http_status": None,
            "content_type": None,
            "payload": None,
            "error": None,
        }
        try:
            if data[pos : pos + 5] != b"WARC/":
                raise ValueError(f"no WARC magic at offset {pos}")
            headers, body_pos = _parse_header_block(data, pos)
            length = int(headers["content-length"])
            body = data[body_pos : body_pos + length]
            if len(body) != length:
                raise ValueError(f"truncated record at offset {pos}")
            row["warc_type"] = headers.get("warc-type")
            row["url"] = headers.get("warc-target-uri")
            row["warc_date"] = headers.get("warc-date")
            if headers.get("content-type", "").startswith("application/http"):
                http_headers, payload_off = _parse_header_block(body, 0)
                status_line = body[: body.index(CRLF)].split(b" ")
                row["http_status"] = int(status_line[1])
                row["content_type"] = http_headers.get("content-type")
                row["payload"] = body[payload_off:]
            else:
                row["payload"] = body
            rows.append(row)
            pos, idx = body_pos + length, idx + 1
        except Exception as e:
            row["error"] = f"warc parse: {e}"
            rows.append(row)
            break
    return rows


def records_from_files(files: DataFrame) -> DataFrame:
    """(path, content) rows → one row per WARC record: the record
    explosion stage, an Arrow-batched mapInPandas shared by read_warc and
    any caller that already holds file bytes."""

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc(bytes(content), path_))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in WARC_RECORDS_SCHEMA.fields],
                dtype=object,
            ).astype({"record_idx": "Int32", "http_status": "Int32"})

    return files.select("path", "content").mapInPandas(
        _work, schema=WARC_RECORDS_SCHEMA
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .warc / .warc.gz files → one row per record
    (WARC_RECORDS_SCHEMA). binaryFile scan (one task per file — see module
    docstring) feeding records_from_files."""
    return records_from_files(spark.read.format("binaryFile").load(path))


def payload_from_warc(records: DataFrame) -> DataFrame:
    """Project WARC response records onto the engine's payload-table shape
    (image_id from the URL tail, bytes, fmt from the content type) — the
    bridge from an archived crawl to every operator in this repo. Keeps
    only HTTP-200 image responses; w/h/phash are left to the decode pass
    (q_image_decode_stats / image_features), which is where they come from
    for live fetches too."""
    fmt = F.regexp_extract(F.col("content_type"), r"image/(\w+)", 1)
    return (
        records.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("content_type").startswith("image/")
        )
        .select(
            F.regexp_extract(F.col("url"), r"([0-9]{8})(?:\.\w+)?$", 1).alias(
                "image_id"
            ),
            F.col("payload").alias("bytes"),
            fmt.alias("fmt"),
        )
    )
