"""Video container + frame sampling (SURVEY.md §2.8 F18 / §2.10 — the
video leg of the multimodal plumbing; reference mp4 validation
file_validator.py:185-220, file_downloader.py:622-676).

Codec status (mirrors imaging.py's fake-JPEG contract): real video codecs
(h264/vp9) need pyav/cv2, absent here, so the container is FVID — a
DETERMINISTIC FAKE (clearly-marked stub): magic + (n_frames, w, h, fps)
header + zlib-compressed concatenated raw RGB frames. It exists so the
frame-sampling plumbing — header parse, bounded decode of only the
sampled frames, per-frame phash, scene-cut detection — is real and
testable. On a real cluster replace encode_video/decode_frames with
av.open(BytesIO(blob)) and the rest of the pipeline is unchanged.

Frame-sample efficiency note: zlib forces decompressing the whole stream,
but only the SAMPLED frames are materialized as arrays/phashes — with a
real container (keyframe index) the seek skips the undecoded frames too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from .imaging import hamming64, phash64, typed_frame

FVID_SIG = b"FVID"
#: phash hamming distance between consecutive sampled frames at or above
#: which a scene cut is declared (same 64-bit hash family as image dedup)
SCENE_CUT_HAMMING = 16


def encode_video(frames: np.ndarray, fps: int) -> bytes:
    """(n, h, w, 3) uint8 frames → FVID bytes (STUB container — see
    module docstring)."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return (
        FVID_SIG
        + struct.pack(">IIIH", n, w, h, fps)
        + zlib.compress(frames.tobytes(), 6)
    )


def video_meta(data: bytes) -> tuple[int, int, int, int]:
    """Header-only parse → (n_frames, w, h, fps). O(1) — no frame decode."""
    if data[:4] != FVID_SIG:
        raise NotImplementedError(
            "real video decode needs pyav/cv2 (not in container); "
            "only the FVID stub container is readable here"
        )
    n, w, h, fps = struct.unpack(">IIIH", data[4:18])
    return n, w, h, fps


def decode_frames(data: bytes, idxs: list[int]) -> list[np.ndarray]:
    """Decode ONLY the requested frame indices (bounded memory: one
    decompressed stream slice per call, sampled frames materialized)."""
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
