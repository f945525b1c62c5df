"""Audio codec + features (SURVEY.md §2.8 F18 generalized to audio payload
columns; the audio leg of the multimodal plumbing in multimodal.py).

Reference parity: the reference validates downloaded media by magic bytes
and size before accepting it (file_validator.py:185-220,
file_downloader.py:590-676); this module gives the audio column the same
treatment the image column gets from imaging.py.

Codec status (mirrors imaging.py's contract):

  * ``wav`` — a REAL minimal RIFF/WAV codec (pure struct + numpy): PCM
    16-bit mono. Losslessly round-trips; emitted files are valid WAV
    readable by any standard player. Decoding WAVs from *other* encoders
    is supported for canonical PCM16-mono fmt/data layouts; anything else
    (multi-channel, float PCM, extension chunks) raises
    NotImplementedError — the clearly-marked stub boundary.
  * compressed formats (mp3/aac/ogg) — NOT decodable here (soundfile /
    librosa are not in the container); sniffing recognizes them so the
    validation path classifies rather than crashes, and decode raises
    NotImplementedError with the swap-in note.

All numeric features are computed on samples normalized to [-1, 1]
(int16 / 32767) and rounded to 4 dp, so the driver-side ground truth
(groundtruth.py) compares identical values.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .imaging import typed_frame

WAV_SIG = b"RIFF"
MP3_SIG_A, MP3_SIG_B = b"ID3", b"\xff\xfb"
OGG_SIG = b"OggS"
MIN_AUDIO_BYTES = 64

#: below this normalized RMS a clip is silence (flat-line / dead mic)
SILENCE_RMS = 1e-3
#: at or above this |sample| fraction of full-scale a clip counts as clipped
CLIP_PEAK = 0.999


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → canonical RIFF/WAV (PCM16, one data chunk)."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, sr, byte-rate, block-align, 16-bit
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 mono samples). PCM16-mono only;
    other layouts raise NotImplementedError (stub boundary — swap in
    soundfile on a real cluster)."""
    if data[:4] != WAV_SIG or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            codec, n_ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if codec != 1 or n_ch != 1 or bits != 16:
                raise NotImplementedError(
                    "stub decoder: only PCM16 mono WAV (install soundfile)"
                )
        elif tag == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, samples


def sniff_audio_format(data: bytes | None) -> str | None:
    """Magic-bytes detection for the validation path (reference
    file_validator.py:185-220 applied to the audio column)."""
    if not data or len(data) < 12:
        return None
    if data[:4] == WAV_SIG and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == MP3_SIG_A or data[:2] == MP3_SIG_B:
        return "mp3"
    if data[:4] == OGG_SIG:
        return "ogg"
    return None


def decode_audio(data: bytes, fmt: str) -> tuple[int, np.ndarray]:
    """Dispatch like imaging.decode_image: wav is real, compressed formats
    raise with the swap-in note."""
    if fmt == "wav":
        return decode_wav(data)
    raise NotImplementedError(
        f"audio fmt {fmt!r} needs soundfile/librosa (not in container); "
        "the wav path and all Spark-side plumbing are real"
    )


def ahash64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint, same family as imaging.phash64: mean
    |amplitude| over 64 equal time windows → above-median bitmap. Trims
    the remainder so windows are equal-sized; deterministic pure numpy."""
    n = len(samples)
    wlen = max(n // 64, 1)
    x = np.abs(samples[: wlen * 64].astype(np.float64)).reshape(64, wlen).mean(axis=1)
    bits = x > np.median(x)
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return int(np.int64(np.uint64(val)))


def audio_feature_row(data: bytes, fmt: str) -> dict:
    """One clip → features dict (shared by the Spark batch UDF and the
    driver-side ground truth; rounding pinned here so both sides agree)."""
    sr, samples = decode_audio(data, fmt)
    x = samples.astype(np.float64) / 32767.0
    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
    peak = float(np.max(np.abs(x))) if len(x) else 0.0
    return {
        "sample_rate": sr,
        "n_samples": len(samples),
        "duration_s": round(len(samples) / sr, 4),
        "rms": round(rms, 4),
        "peak": round(peak, 4),
        "silent": rms < SILENCE_RMS,
        "clipped": peak >= CLIP_PEAK,
        "ahash": ahash64(samples),
    }


def decode_audio_features_batch(
    ids: pd.Series, blobs: pd.Series, fmts: pd.Series
) -> pd.DataFrame:
    """Batch decode + features (pandas-UDF body; the audio twin of
    imaging.decode_validate_batch). Per-clip loop, never per-sample — the
    codec call dominates. Returns ok/error alongside the feature columns;
    sniff-vs-declared-format mismatch and undecodable blobs fail soft."""
    rows = []
    for iid, data, fmt in zip(ids, blobs, fmts):
        row: dict = {
            "media_id": iid,
            "ok": False,
            "sample_rate": None,
            "n_samples": None,
            "duration_s": None,
            "rms": None,
            "peak": None,
            "silent": None,
            "clipped": None,
            "ahash": None,
            "error": None,
        }
        try:
            data = bytes(data)
            if len(data) < MIN_AUDIO_BYTES:
                raise ValueError("payload too small")
            sniffed = sniff_audio_format(data)
            if sniffed != fmt:
                raise ValueError(f"magic bytes say {sniffed}, expected {fmt}")
            row.update(audio_feature_row(data, fmt))
            row["ok"] = True
        except Exception as e:
            row["error"] = f"validation: {e}"
        rows.append(row)
    return typed_frame(
        rows,
        {
            "ok": "boolean",
            "sample_rate": "Int32",
            "n_samples": "Int64",
            "duration_s": "Float64",
            "rms": "Float64",
            "peak": "Float64",
            "silent": "boolean",
            "clipped": "boolean",
            "ahash": "Int64",
        },
    )
