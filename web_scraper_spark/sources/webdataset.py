"""WebDataset tar-shard sink + source for image/caption payloads.

The de-facto interchange format for large-scale image training data is
the WebDataset convention: plain tar archives whose members group by key
(``<key>.jpg`` + ``<key>.json`` per sample), streamed sequentially by the
training loader. This module materializes the engine's payload table into
that layout and reads it back:

  * ``write_webdataset`` — distributed sink: shard assignment via
    functions/multimodal.pack_shards (aspect-bucketed, capacity-cut,
    deterministic image_id order), then ONE task per partition writes its
    shards' tars. Rows repartition on (bucket, shard_id), so every shard
    is wholly owned by one task — no cross-task append, no coordination.
    Tars are BYTE-DETERMINISTIC (USTAR format, zeroed mtime/uid/gid,
    members in image_id order): the same payload always produces the same
    sha256 per shard, so shard files are content-addressable and a
    re-export after crash-resume is a no-op diff.
  * ``read_webdataset`` — source: ``binaryFile`` scan of the tars (one
    row per shard; Spark parallelizes across files exactly like the
    training loader does) + an Arrow-batched parse back to payload rows.

The reference's closest behavior is the per-video folder sink
(video_processor.py:306-319: one dir per item, metadata.json beside the
media file); WebDataset is that layout made sequential-read-friendly —
10^4 items per open() instead of 3 files per item, which is the
difference between a training loader at disk bandwidth and one at
filesystem-metadata latency at 100 TB.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.multimodal import SHARD_CAPACITY_BYTES, pack_shards

WRITE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.StringType()),
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("path", T.StringType()),
        T.StructField("n_items", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("tar_sha256", T.StringType()),
    ]
)

READ_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("shard_path", T.StringType()),
    ]
)


def _tar_add(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name)
    info.size = len(data)
    info.mtime = 0  # determinism: no wall-clock in the archive
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(data))


def write_webdataset(
    payload: DataFrame,
    out_dir: str,
    capacity: int = SHARD_CAPACITY_BYTES,
    prefix: str = "",
) -> DataFrame:
    """Materialize the payload table as WebDataset tar shards under
    ``out_dir`` (``[<prefix>-]<bucket>-<shard_id:05d>.tar``). Returns one
    result row per shard written (path, item count, payload bytes, tar
    sha256). ``prefix`` namespaces a shard GENERATION: an incremental
    export writes each CDC delta as its own generation (see
    tests/test_webdataset.py::test_incremental_export_from_cdc), so
    earlier generations' tars are never rewritten — append-only delivery
    a training loader can tail.

    Plan: pack_shards assigns (bucket, shard_id); a single join brings the
    assignment back to the payload rows (broadcast — the assignment is
    (id, bucket, off) only, tiny next to the blobs); repartition on the
    shard key co-locates each shard's rows in exactly one task, which
    sorts its slice by image_id and streams members into the tar. Payload
    blobs cross the wire once — the shuffle IS the write plan."""
    os.makedirs(out_dir, exist_ok=True)
    assign = pack_shards(payload, capacity=capacity).select(
        "image_id", "bucket", "shard_id"
    )
    rows = payload.join(F.broadcast(assign), "image_id")
    n_shards = assign.select("bucket", "shard_id").distinct().count()

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if len(pdf) == 0:
            return
        out = []
        stem = f"{prefix}-" if prefix else ""
        for (bucket, shard_id), grp in pdf.groupby(["bucket", "shard_id"]):
            grp = grp.sort_values("image_id")
            path = os.path.join(out_dir, f"{stem}{bucket}-{int(shard_id):05d}.tar")
            buf = io.BytesIO()
            with tarfile.open(
                fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
            ) as tar:
                for r in grp.itertuples():
                    meta = {
                        "w": int(r.w),
                        "h": int(r.h),
                        "fmt": r.fmt,
                        "caption": r.caption,
                        "phash": int(r.phash),
                    }
                    _tar_add(tar, f"{r.image_id}.{r.fmt}", bytes(r.bytes))
                    _tar_add(
                        tar,
                        f"{r.image_id}.json",
                        json.dumps(meta, sort_keys=True).encode(),
                    )
            data = buf.getvalue()
            tmp = path + ".inprogress"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)  # atomic publish, crash leaves no torn tar
            out.append(
                (
                    bucket,
                    int(shard_id),
                    path,
                    int(len(grp)),
                    int(grp["bytes"].map(len).sum()),
                    hashlib.sha256(data).hexdigest(),
                )
            )
        yield pd.DataFrame(
            out,
            columns=[
                "bucket", "shard_id", "path", "n_items", "payload_bytes",
                "tar_sha256",
            ],
        )

    return (
        rows.repartition(max(n_shards, 1), "bucket", "shard_id")
        .mapInPandas(_write, schema=WRITE_RESULT_SCHEMA)
    )


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset tar shards back into payload rows. ``binaryFile``
    gives one row per tar (Spark schedules shards across executors, the
    same unit of parallelism the training loader uses); the parse UDF
    walks each archive sequentially and re-pairs ``<key>.<fmt>`` with
    ``<key>.json``."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                with tarfile.open(fileobj=io.BytesIO(bytes(r.content))) as tar:
                    blobs: dict[str, tuple[str, bytes]] = {}
                    metas: dict[str, dict] = {}
                    for m in tar.getmembers():
                        stem, ext = m.name.rsplit(".", 1)
                        data = tar.extractfile(m).read()
                        if ext == "json":
                            metas[stem] = json.loads(data)
                        else:
                            blobs[stem] = (ext, data)
                    for stem in sorted(blobs):
                        ext, data = blobs[stem]
                        meta = metas[stem]
                        out.append(
                            (
                                stem, data, meta["w"], meta["h"], meta["fmt"],
                                meta["caption"], meta["phash"], r.path,
                            )
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                    "shard_path",
                ],
            )

    return files.mapInPandas(_parse, schema=READ_SCHEMA)
