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


# ------------------------------------------------------ mp3 container
# Frame-header walk WITHOUT decode — the audio analog of
# mp4.parse_mp4 / q_video_container_stats: a crawl inventories and
# validates an mp3 corpus from its frame headers alone (bitrate,
# sample rate, frame count, CBR/VBR), at O(n_frames) header reads and
# zero DCT/synthesis work. MPEG-1 Layer III only (the dominant wild
# format); other versions/layers raise and the batch op fails them soft.

#: MPEG-1 Layer III bitrate table, kbps, by 4-bit header index (1..14)
MP3_BITRATES = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
#: MPEG-1 sample-rate table by 2-bit header index
MP3_SAMPLE_RATES = (44100, 48000, 32000, None)
#: samples per MPEG-1 Layer III frame
MP3_SAMPLES_PER_FRAME = 1152


def encode_mp3_frames(
    frame_specs: list[tuple[int, int, int]], id3_size: int = 0, seed: int = 0
) -> bytes:
    """Deterministic mp3 CONTAINER: valid MPEG-1 Layer III frame headers
    over filler payload bytes (+ optional ID3v2 tag). The audit path
    never decodes audio, so fixture frames carry no real MDCT data —
    exactly like the MP4 fixture carries MJPEG, the *container* is real:
    every header field and frame length obeys the spec and any mp3
    frame-walker agrees on the structure.

    ``frame_specs``: (bitrate_idx, samplerate_idx, padding) per frame."""
    out = bytearray()
    if id3_size:
        # ID3v2 header: "ID3", version 2.3.0, no flags, syncsafe size
        sz = id3_size
        out += b"ID3" + bytes([3, 0, 0]) + bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out += bytes((7 * i + seed) % 251 for i in range(id3_size))
    for fi, (bi, si, pad) in enumerate(frame_specs):
        br, sr = MP3_BITRATES[bi], MP3_SAMPLE_RATES[si]
        hdr = 0xFFFB_0000  # sync + MPEG1 + Layer III + no CRC
        hdr |= (bi << 12) | (si << 10) | (pad << 9)
        hdr |= 3 << 6  # mono
        flen = 144_000 * br // sr + pad
        frame = bytearray(struct.pack(">I", hdr))
        body = bytes((3 * i + fi + seed) % 254 for i in range(flen - 4))
        # keep filler clear of 0xFF so no spurious sync words appear
        frame += body
        out += frame
    return bytes(out)


def mp3_container_stats(data: bytes) -> dict:
    """Walk the frame headers of an MPEG-1 Layer III stream: skip any
    ID3v2 tag, then parse each 4-byte header and hop frame lengths.
    Returns frame count, duration, byte split, bitrate stats and
    CBR/VBR classification — no audio decoded."""
    pos = 0
    id3_bytes = 0
    if data[:3] == b"ID3":
        sz = (
            ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14)
            | ((data[8] & 0x7F) << 7) | (data[9] & 0x7F)
        )
        id3_bytes = 10 + sz
        pos = id3_bytes
    n_frames = 0
    frame_bytes = 0
    bitrates = []
    sr0 = None
    while pos + 4 <= len(data):
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (b1 >> 3) & 3
        layer = (b1 >> 1) & 3
        if version != 3 or layer != 1:
            raise NotImplementedError(
                "only MPEG-1 Layer III frame walks are supported"
            )
        bi = (b2 >> 4) & 15
        si = (b2 >> 2) & 3
        pad = (b2 >> 1) & 1
        br, sr = MP3_BITRATES[bi], MP3_SAMPLE_RATES[si]
        if br is None or sr is None:
            raise ValueError(f"invalid bitrate/samplerate index at byte {pos}")
        if sr0 is None:
            sr0 = sr
        elif sr != sr0:
            raise ValueError("sample rate changes mid-stream")
        flen = 144_000 * br // sr + pad
        if pos + flen > len(data):
            raise ValueError("truncated final frame")
        bitrates.append(br)
        frame_bytes += flen
        n_frames += 1
        pos += flen
    if n_frames == 0:
        raise ValueError("no mp3 frames")
    return {
        "n_frames": n_frames,
        "sample_rate": sr0,
        "duration_s": round(n_frames * MP3_SAMPLES_PER_FRAME / sr0, 4),
        "id3_bytes": id3_bytes,
        "frame_bytes": frame_bytes,
        "bitrate_min_kbps": min(bitrates),
        "bitrate_max_kbps": max(bitrates),
        "mode": "cbr" if len(set(bitrates)) == 1 else "vbr",
    }
