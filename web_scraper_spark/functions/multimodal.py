"""Multimodal payload operators: images/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched UDFs
(BASELINE.json input_hint: "no per-row Python" at the Spark layer —
everything here is batch-shaped for mapInPandas).

Real in this container (numpy-only): image decode — a real baseline
JPEG codec (jpeg.py) + a full-filter-set PNG codec (imaging.py) —
mean-pool resize, per-channel feature extraction, phash; WAV/PCM16
audio decode + features (audio.py — a real RIFF codec); video frame
sampling + scene cuts over a REAL MP4/ISO-BMFF container with
motion-JPEG samples (mp4.py + video.py; the legacy FVID stub stays
decodable). STUBBED (raising with swap-in instructions): exotic image
variants via PIL when absent (progressive JPEG, WebP), compressed
audio (mp3/aac → soundfile), temporal video codecs (h264 → pyav) —
undecodable rows classify soft (ok=False / error row), never crash the
task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imaging import decode_image, encode_image, phash64, typed_frame

# ------------------------------------------------------------------ image


def resize_mean_pool(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic block-mean resize (downscale) — pure numpy. For
    upscale or fractional ratios a real deployment swaps in PIL/cv2; the
    mean-pool keeps phash semantics stable for the sizes datagen emits."""
    h, w, c = img.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(int)
    xs = (np.arange(out_w + 1) * w // out_w).astype(int)
    out = np.empty((out_h, out_w, c), np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = img[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean(
                axis=(0, 1)
            )
    return np.clip(out, 0, 255).astype(np.uint8)


#: Aspect-ratio buckets for training-shard assignment: (name, p, q) with
#: target ratio w:h = p:q. Assignment = argmin over buckets of
#: |ln(w/h) − ln(p/q)|, evaluated EXACTLY via integer cross-multiplication
#: (f_i = max(w·q_i, h·p_i) / min(w·q_i, h·p_i); f_i ≤ f_j ⟺
#: a_i·b_j ≤ a_j·b_i) — no float log on either the Spark or the oracle
#: side, so engine libm differences can never flip a bucket.
ASPECT_BUCKETS = (
    ("square", 1, 1),
    ("landscape_4_3", 4, 3),
    ("landscape_16_9", 16, 9),
    ("portrait_3_4", 3, 4),
    ("portrait_9_16", 9, 16),
)

def aspect_bucket_col(w, h):
    """Column expression assigning (w, h) to its ASPECT_BUCKETS name —
    argmin |ln(w/h) − ln(p/q)| via the exact integer cross-multiplication
    in the constant's docstring, ties → first bucket in declaration order.
    Pure JVM arithmetic (20 long comparisons), whole-stage-codegen-able."""
    a = [F.greatest(w * q, h * p).cast("long") for _, p, q in ASPECT_BUCKETS]
    b = [F.least(w * q, h * p).cast("long") for _, p, q in ASPECT_BUCKETS]
    bucket = None
    for i, (name, _, _) in enumerate(ASPECT_BUCKETS):
        cond = None
        for j in range(len(ASPECT_BUCKETS)):
            if j == i:
                continue
            c = a[i] * b[j] <= a[j] * b[i]
            cond = c if cond is None else cond & c
        bucket = F.when(cond, name) if bucket is None else bucket.when(cond, name)
    return bucket


#: Target shard payload for training-shard packing (WebDataset-style):
#: sandbox-sized so the 120-image fixture fills several shards per aspect
#: bucket; a production corpus uses ~100 MB–1 GB here.
SHARD_CAPACITY_BYTES = 65536

def pack_shards(
    payload: DataFrame,
    capacity: int = SHARD_CAPACITY_BYTES,
    block: int = 16,
) -> DataFrame:
    """Training-shard assignment (the WebDataset shard writer's planning
    step): within each aspect bucket, lay images out in deterministic
    image_id order and cut a new shard every ``capacity`` payload bytes —
    shard_id = floor(exclusive running byte offset / capacity).

    Two-level offset decomposition instead of one window per bucket (the
    same trick rank_frontier_scalable uses for the crawl-order seq):
    block = image_id range, a groupBy computes per-(bucket, block) byte
    sums (one tiny row per block), the driver cumulates exclusive base
    offsets per bucket in block order and broadcasts them back, and the
    intra-block running sum is a window partitioned by (bucket, block) —
    parallelism = #blocks, serial work O(block_size). Size ``block`` so
    #blocks ≈ sqrt(n); nest another level for 10^9+ images.

    Returns (image_id, bucket, nbytes, bucket_off, shard_id). Consumed by
    analytics.q_image_shard_pack (oracle: driver-side cumsum from datagen
    params proves the decomposition ≡ the per-bucket spec) and
    sources/webdataset.write_webdataset (the materializing sink)."""
    from pyspark.sql import Window

    df = payload.select(
        "image_id",
        aspect_bucket_col(F.col("w"), F.col("h")).alias("bucket"),
        F.length("bytes").cast("int").alias("nbytes"),
        (F.col("image_id").cast("long") / F.lit(block)).cast("long").alias("__blk"),
    )
    lvl1 = (
        df.groupBy("bucket", "__blk")
        .agg(F.sum("nbytes").alias("__blk_bytes"))
        .collect()
    )
    base, run = [], {}
    for r in sorted(lvl1, key=lambda r: (r["bucket"], r["__blk"])):
        base.append((r["bucket"], r["__blk"], run.get(r["bucket"], 0)))
        run[r["bucket"]] = run.get(r["bucket"], 0) + r["__blk_bytes"]
    offsets = payload.sparkSession.createDataFrame(
        pd.DataFrame(base, columns=["bucket", "__blk", "__base"])
    )
    w = (
        Window.partitionBy("bucket", "__blk")
        .orderBy("image_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.join(F.broadcast(offsets), ["bucket", "__blk"])
        .withColumn(
            "bucket_off",
            (F.col("__base") + F.coalesce(F.sum("nbytes").over(w), F.lit(0))).cast(
                "long"
            ),
        )
        .withColumn(
            "shard_id",
            F.floor(F.col("bucket_off") / F.lit(capacity)).cast("int"),
        )
        .select("image_id", "bucket", "nbytes", "bucket_off", "shard_id")
    )


#: Image quality-gate thresholds (the image twin of the Gopher/C4-style
#: text gate): flags evaluate on the ROUNDED (4 dp) brightness/contrast
#: the decode pass emits, so the oracle compares identical values.
IMG_GATE_MIN_PIXELS = 2048
IMG_GATE_MIN_BRIGHTNESS = 40.0
IMG_GATE_MIN_CONTRAST = 35.0

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("contrast", T.DoubleType()),
        T.StructField("phash", T.LongType()),
        T.StructField("thumb_phash", T.LongType()),
    ]
)


def image_features(payload: DataFrame, thumb: tuple[int, int] = (16, 12)) -> DataFrame:
    """Decode → brightness/contrast → phash of full image AND of a
    mean-pool thumbnail, one mapInPandas pass over (image_id, bytes, fmt).

    Scale: pure map stage — no shuffle; binary columns stream through
    Arrow in bounded batches (spark.sql.execution.arrow.maxRecordsPerBatch
    controls peak memory per task)."""

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tw, th = thumb
        for pdf in it:
            rows = []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    img = decode_image(bytes(blob), fmt)
                    gray = img.astype(np.float64).mean(axis=2)
                    rows.append(
                        {
                            "image_id": iid,
                            "ok": True,
                            "w": img.shape[1],
                            "h": img.shape[0],
                            "brightness": round(float(gray.mean()), 4),
                            "contrast": round(float(gray.std()), 4),
                            "phash": phash64(img),
                            "thumb_phash": phash64(resize_mean_pool(img, tw, th)),
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "image_id": iid,
                            "ok": False,
                            "w": None,
                            "h": None,
                            "brightness": None,
                            "contrast": None,
                            "phash": None,
                            "thumb_phash": None,
                        }
                    )
            # typed_frame: a mixed ok/error batch must not let pandas
            # float64-infer the int64 phash columns (53-bit rounding)
            yield typed_frame(
                rows,
                {
                    "ok": "boolean",
                    "w": "Int32",
                    "h": "Int32",
                    "brightness": "Float64",
                    "contrast": "Float64",
                    "phash": "Int64",
                    "thumb_phash": "Int64",
                },
            )

    return payload.select("image_id", "bytes", "fmt").mapInPandas(
        _work, schema=IMAGE_FEATURES_SCHEMA
    )


def reencode_thumbnails(payload: DataFrame, out_w: int = 16, out_h: int = 12) -> DataFrame:
    """Thumbnail sink: decode → mean-pool resize → re-encode PNG, returned
    as a new binary column (the reference's thumbnail download S7/S11
    becomes a derived column, not a side file)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("thumb_bytes", T.BinaryType()),
            T.StructField("thumb_w", T.IntegerType()),
            T.StructField("thumb_h", T.IntegerType()),
        ]
    )

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                try:
                    img = resize_mean_pool(decode_image(bytes(blob), fmt), out_w, out_h)
                    rows.append(
                        {
                            "image_id": iid,
                            "thumb_bytes": encode_image(img, "png"),
                            "thumb_w": out_w,
                            "thumb_h": out_h,
                        }
                    )
                except Exception:
                    rows.append(
                        {"image_id": iid, "thumb_bytes": None, "thumb_w": None, "thumb_h": None}
                    )
            yield pd.DataFrame(rows)

    return payload.select("image_id", "bytes", "fmt").mapInPandas(_work, schema=schema)


# ---------------------------------------------------------- audio / video
#
# The codecs live in audio.py (REAL RIFF/WAV PCM16) and video.py (FVID —
# deterministic fake container, clearly-marked stub); compressed formats
# (mp3/h264) raise NotImplementedError inside the batch bodies with the
# soundfile/pyav swap-in notes. The Spark-side plumbing below is real and
# gate-tested either way.

from .audio import decode_audio_features_batch  # noqa: E402
from .video import sample_video_frames_batch  # noqa: E402

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("silent", T.BooleanType()),
        T.StructField("clipped", T.BooleanType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("error", T.StringType()),
    ]
)


def audio_features(payload: DataFrame) -> DataFrame:
    """Decode → duration/rms/peak/silence/clipping/fingerprint, one
    mapInPandas pass over (media_id, bytes, fmt) — the audio twin of
    image_features. Pure map stage: no shuffle, Arrow-batched binary."""

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield decode_audio_features_batch(pdf["media_id"], pdf["bytes"], pdf["fmt"])

    return payload.select("media_id", "bytes", "fmt").mapInPandas(
        _work, schema=AUDIO_FEATURES_SCHEMA
    )


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("phash", T.LongType()),
        T.StructField("brightness", T.DoubleType()),
        T.StructField("is_cut", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)


def video_frames(payload: DataFrame, every_n: int = 4) -> DataFrame:
    """Sample every_n-th frame per clip → one row per sampled frame with
    phash/brightness/scene-cut flags (VIDEO_FRAMES_SCHEMA). Map-side
    explode: no shuffle; output rows per task bounded by
    clip_frames/every_n × arrow batch size."""

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield sample_video_frames_batch(pdf["media_id"], pdf["bytes"], every_n)

    return payload.select("media_id", "bytes").mapInPandas(
        _work, schema=VIDEO_FRAMES_SCHEMA
    )


VIDEO_CONTAINER_SCHEMA = (
    "media_id string, container_bytes int, codec string, n_frames int, "
    "fps int, w int, h int, sample_bytes int, overhead_bytes int, "
    "error string"
)


def video_container_stats(payload: DataFrame) -> DataFrame:
    """Demux-level container audit — one row per clip from the MP4
    metadata tree alone (functions/mp4.parse_mp4): codec fourcc, frame
    count, fps, dimensions, total sample payload bytes, and container
    overhead (box structure + tables). NO sample is decoded — this is
    the O(metadata) pass a crawl runs to validate/inventory a video
    corpus before paying for frame extraction (reference
    file_validator.py:185-220 checks the same boxes, but only as magic
    bytes). Map-only; undecodable blobs fail soft to an error row."""
    from . import mp4 as _mp4

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                try:
                    data = bytes(data)
                    m = _mp4.parse_mp4(data)
                    sample_bytes = sum(s for _, s in m["samples"])
                    rows.append(
                        {
                            "media_id": mid,
                            "container_bytes": len(data),
                            "codec": m["codec"],
                            "n_frames": m["n_frames"],
                            "fps": m["fps"],
                            "w": m["w"],
                            "h": m["h"],
                            "sample_bytes": sample_bytes,
                            "overhead_bytes": len(data) - sample_bytes,
                            "error": None,
                        }
                    )
                except Exception as e:
                    rows.append(
                        {
                            "media_id": mid,
                            "container_bytes": len(bytes(data)) if data is not None else 0,
                            "codec": None, "n_frames": None, "fps": None,
                            "w": None, "h": None, "sample_bytes": None,
                            "overhead_bytes": None,
                            "error": f"validation: {e}",
                        }
                    )
            from .imaging import typed_frame

            yield typed_frame(
                rows,
                {
                    "container_bytes": "Int32", "n_frames": "Int32",
                    "fps": "Int32", "w": "Int32", "h": "Int32",
                    "sample_bytes": "Int32", "overhead_bytes": "Int32",
                },
            )

    return payload.select("media_id", "bytes").mapInPandas(
        _work, schema=VIDEO_CONTAINER_SCHEMA
    )


AUDIO_CONTAINER_SCHEMA = (
    "media_id string, container_bytes int, n_frames int, sample_rate int, "
    "duration_s double, id3_bytes int, frame_bytes int, "
    "bitrate_min_kbps int, bitrate_max_kbps int, mode string, error string"
)


def audio_container_stats(payload: DataFrame) -> DataFrame:
    """mp3 frame-header audit — one row per clip from the frame-header
    walk alone (functions/audio.mp3_container_stats): frame count,
    duration, byte split, bitrate range, CBR/VBR. NO audio is decoded —
    the O(n_frames·header) inventory pass a crawl runs over a compressed
    audio corpus it cannot (or need not) decode; the audio analog of
    video_container_stats. Map-only; unparseable blobs fail soft to an
    error row."""
    from . import audio as _audio

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                try:
                    data = bytes(data)
                    s = _audio.mp3_container_stats(data)
                    rows.append(
                        {"media_id": mid, "container_bytes": len(data), **s,
                         "error": None}
                    )
                except Exception as e:
                    rows.append(
                        {
                            "media_id": mid,
                            "container_bytes": len(bytes(data)) if data is not None else 0,
                            "n_frames": None, "sample_rate": None,
                            "duration_s": None, "id3_bytes": None,
                            "frame_bytes": None, "bitrate_min_kbps": None,
                            "bitrate_max_kbps": None, "mode": None,
                            "error": f"validation: {e}",
                        }
                    )
            from .imaging import typed_frame

            yield typed_frame(
                rows,
                {
                    "container_bytes": "Int32", "n_frames": "Int32",
                    "sample_rate": "Int32", "duration_s": "Float64",
                    "id3_bytes": "Int32", "frame_bytes": "Int32",
                    "bitrate_min_kbps": "Int32", "bitrate_max_kbps": "Int32",
                },
            )

    return payload.select("media_id", "bytes").mapInPandas(
        _work, schema=AUDIO_CONTAINER_SCHEMA
    )


IMAGE_CONTAINER_SCHEMA = (
    "media_id string, container_bytes int, fmt string, variant string, "
    "w int, h int, n_frames int, error string"
)


def image_container_stats(payload: DataFrame) -> DataFrame:
    """WEBP/GIF header audit — one row per blob from the container
    structure alone (functions/imaging.parse_webp_header /
    parse_gif_header): variant (vp8/vp8l/vp8x or gif87a/gif89a),
    dimensions, GIF frame count. These are the accepted-image formats
    (reference file_downloader.py:633-637 signatures) the numpy codecs
    cannot decode — the audit inventories and validates them at
    O(header) without any pixel work; ``codec="pil"`` remains the decode
    path on a real cluster. Map-only; malformed blobs fail soft."""
    from .imaging import parse_gif_header, parse_webp_header, sniff_format

    def _work(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                try:
                    data = bytes(data)
                    fmt = sniff_format(data)
                    if fmt == "webp":
                        p = parse_webp_header(data)
                        row = {
                            "fmt": "webp", "variant": p["variant"],
                            "w": p["w"], "h": p["h"], "n_frames": 1,
                        }
                    elif fmt == "gif":
                        p = parse_gif_header(data)
                        row = {
                            "fmt": "gif", "variant": p["version"].lower(),
                            "w": p["w"], "h": p["h"],
                            "n_frames": p["n_frames"],
                        }
                    else:
                        raise ValueError(f"not a webp/gif container ({fmt})")
                    rows.append(
                        {"media_id": mid, "container_bytes": len(data), **row,
                         "error": None}
                    )
                except Exception as e:
                    rows.append(
                        {
                            "media_id": mid,
                            "container_bytes": len(bytes(data)) if data is not None else 0,
                            "fmt": None, "variant": None, "w": None,
                            "h": None, "n_frames": None,
                            "error": f"validation: {e}",
                        }
                    )
            from .imaging import typed_frame

            yield typed_frame(
                rows,
                {
                    "container_bytes": "Int32", "w": "Int32", "h": "Int32",
                    "n_frames": "Int32",
                },
            )

    return payload.select("media_id", "bytes").mapInPandas(
        _work, schema=IMAGE_CONTAINER_SCHEMA
    )
