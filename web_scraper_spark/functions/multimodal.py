"""Multimodal payload operators: images/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched UDFs
(BASELINE.json input_hint: "no per-row Python" at the Spark layer —
everything here is batch-shaped for mapInPandas).

Real in this container (numpy-only): image decode (via the PNG codec /
lossy stub in imaging.py), mean-pool resize, per-channel feature
extraction, phash. STUBBED (import-gated, the libs are not installed):
real JPEG/WebP decode, audio decode, video frame sampling — each raises
NotImplementedError with the swap-in instructions; their Spark-side
plumbing (schemas, batch shape, partitioning) is real and tested with the
deterministic fake codec.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .imaging import decode_image, encode_image, phash64

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
            yield pd.DataFrame(rows)

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


# ------------------------------------------------- audio / video (STUBS)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio_batch(blobs: pd.Series, fmts: pd.Series) -> pd.DataFrame:
    """STUB — audio decode needs soundfile/librosa (not in container).
    Swap in: soundfile.read per blob inside this batch function; the
    Spark-side plumbing (mapInPandas over binary column →
    AUDIO_FEATURES_SCHEMA) is already correct."""
    raise NotImplementedError(
        "audio decode stubbed: install soundfile and replace decode_audio_batch body"
    )


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def sample_video_frames_batch(
    blobs: pd.Series, every_n: int = 30
) -> pd.DataFrame:
    """STUB — video frame sampling needs pyav/cv2 (not in container).
    Swap in: av.open(BytesIO(blob)) → decode every_n-th frame → encode_png;
    output explodes to one row per sampled frame (VIDEO_FRAMES_SCHEMA)."""
    raise NotImplementedError(
        "video frame sampling stubbed: install pyav and replace this body"
    )
