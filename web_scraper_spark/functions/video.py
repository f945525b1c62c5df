"""Video container + frame sampling (SURVEY.md §2.8 F18 / §2.10 — the
video leg of the multimodal plumbing; reference mp4 validation
file_validator.py:185-220, file_downloader.py:622-676).

Container status: the LIVE path is real MP4 (ISO BMFF) with motion-JPEG
samples — functions/mp4.py writes/parses actual ftyp/mdat/moov box
structure and per-sample byte ranges through stsc/stco/stsz, and each
frame is real baseline JFIF (functions/jpeg.py). Frame sampling SEEKS:
only the requested samples' byte ranges are decoded. Temporal codecs
(h264/vp9 inter-frame prediction) still need pyav/cv2 on a real cluster;
MJPEG is the honest no-external-codec point between "fake container"
and "full temporal codec". The legacy FVID stub container (magic +
header + zlib raw RGB) remains decodable for r1-r3 blobs; its zlib
stream forces a full inflate per clip — exactly the cost the real
container's sample index removes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from . import mp4 as _mp4
from .imaging import hamming64, phash64, typed_frame

FVID_SIG = b"FVID"
#: phash hamming distance between consecutive sampled frames at or above
#: which a scene cut is declared (same 64-bit hash family as image dedup)
SCENE_CUT_HAMMING = 16


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    """(n, h, w, 3) uint8 frames → real MP4/MJPEG bytes (functions/mp4.py)."""
    return _mp4.encode_mp4_mjpeg(frames, fps)


def encode_video_fvid(frames: np.ndarray, fps: int) -> bytes:
    """Legacy FVID stub container (r1-r3 fixtures; kept decodable)."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return (
        FVID_SIG
        + struct.pack(">IIIH", n, w, h, fps)
        + zlib.compress(frames.tobytes(), 6)
    )


def video_meta(data: bytes) -> tuple[int, int, int, int]:
    """Metadata parse → (n_frames, w, h, fps). Real MP4: box walk, no
    sample decode. FVID: fixed header."""
    if data[:4] == FVID_SIG:
        n, w, h, fps = struct.unpack(">IIIH", data[4:18])
        return n, w, h, fps
    if len(data) >= 12 and data[4:8] == b"ftyp":
        m = _mp4.parse_mp4(data)
        return m["n_frames"], m["w"], m["h"], m["fps"]
    raise NotImplementedError(
        "unrecognized video container (not MP4/ftyp or FVID); temporal "
        "codecs need pyav/cv2 on a real cluster"
    )


def decode_frames(data: bytes, idxs: list[int]) -> list[np.ndarray]:
    """Decode ONLY the requested frame indices. MP4/MJPEG: per-sample
    byte-range seek through the stsc/stco/stsz map — untouched frames
    are never read. FVID: one inflate, sampled frames materialized."""
    if data[:4] != FVID_SIG:
        m = _mp4.parse_mp4(data)
        out = []
        for i in idxs:
            if not 0 <= i < m["n_frames"]:
                raise IndexError(f"frame {i} of {m['n_frames']}")
            off, size = m["samples"][i]
            out.append(_mp4.decode_sample(data, off, size))
        return out
    n, w, h, _ = video_meta(data)
    raw = zlib.decompress(data[18:])
    fsz = w * h * 3
    out = []
    for i in idxs:
        if not 0 <= i < n:
            raise IndexError(f"frame {i} of {n}")
        out.append(
            np.frombuffer(raw[i * fsz : (i + 1) * fsz], np.uint8).reshape(h, w, 3)
        )
    return out


def sample_idxs(n_frames: int, every_n: int) -> list[int]:
    """Deterministic sampling grid: every_n-th frame from 0 (always
    includes frame 0; shared by the UDF and the ground truth)."""
    return list(range(0, n_frames, every_n))


def video_frame_rows(data: bytes, every_n: int) -> list[dict]:
    """One clip → sampled-frame feature rows (shared by the Spark batch
    UDF and the driver-side ground truth). is_cut = phash hamming vs the
    PREVIOUS SAMPLED frame >= SCENE_CUT_HAMMING (frame 0 is never a cut)."""
    n, w, h, fps = video_meta(data)
    idxs = sample_idxs(n, every_n)
    rows, prev = [], None
    for i, img in zip(idxs, decode_frames(data, idxs)):
        ph = phash64(img)
        gray = img.astype(np.float64).mean(axis=2)
        rows.append(
            {
                "frame_idx": i,
                "phash": ph,
                "brightness": round(float(gray.mean()), 4),
                "is_cut": prev is not None
                and hamming64(ph, prev) >= SCENE_CUT_HAMMING,
            }
        )
        prev = ph
    return rows


def sample_video_frames_batch(
    ids: pd.Series, blobs: pd.Series, every_n: int = 4
) -> pd.DataFrame:
    """Batch frame sampling (pandas-UDF body): explodes each clip to one
    row per sampled frame with phash/brightness/scene-cut columns plus
    per-clip metadata. Undecodable blobs (real mp4 etc.) fail soft to a
    single error row so a mixed corpus never kills the task."""
    rows = []
    for iid, data in zip(ids, blobs):
        try:
            data = bytes(data)
            n, w, h, fps = video_meta(data)
            for r in video_frame_rows(data, every_n):
                rows.append(
                    {
                        "media_id": iid,
                        "n_frames": n,
                        "fps": fps,
                        **r,
                        "error": None,
                    }
                )
        except Exception as e:
            rows.append(
                {
                    "media_id": iid,
                    "n_frames": None,
                    "fps": None,
                    "frame_idx": None,
                    "phash": None,
                    "brightness": None,
                    "is_cut": None,
                    "error": f"validation: {e}",
                }
            )
    return typed_frame(
        rows,
        {
            "n_frames": "Int32",
            "fps": "Int32",
            "frame_idx": "Int32",
            "phash": "Int64",
            "brightness": "Float64",
            "is_cut": "boolean",
        },
    )
