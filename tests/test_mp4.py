"""Real MP4 (ISO BMFF) container tests (functions/mp4.py — no Spark).

The reference validates downloads by ftyp/mdat/moov box signatures
(file_validator.py:185-220); this suite proves the video payload now IS
that format: real box structure, demuxer-grade sample resolution, and
motion-JPEG frames through the real baseline JPEG codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from web_scraper_spark.datagen import video_frames_for
from web_scraper_spark.functions import mp4
from web_scraper_spark.functions.imaging import psnr, sniff_format
from web_scraper_spark.functions.video import (
    decode_frames,
    encode_video,
    encode_video_fvid,
    video_meta,
)


@pytest.fixture(scope="module")
def clip():
    frames = video_frames_for(1)  # 16 frames, 32×24, includes no cut
    return frames, mp4.encode_mp4_mjpeg(frames, fps=8)


def test_box_structure_is_real_bmff(clip):
    frames, blob = clip
    assert blob[4:8] == b"ftyp"
    assert sniff_format(blob) == "mp4"  # the reference's validation sniff
    for tag in (b"mdat", b"moov", b"mvhd", b"trak", b"tkhd", b"stbl",
                b"stsd", b"stts", b"stsz", b"stco", b"stsc", b"jpeg"):
        assert tag in blob, f"missing box {tag}"


def test_parse_recovers_metadata(clip):
    frames, blob = clip
    m = mp4.parse_mp4(blob)
    n, h, w = frames.shape[:3]
    assert (m["n_frames"], m["w"], m["h"], m["fps"]) == (n, w, h, 8)
    assert m["codec"] == "jpeg"
    assert len(m["samples"]) == n


def test_samples_are_independent_jfif_streams(clip):
    """Every sample byte range is a standalone real JPEG — a frame seek
    decodes only its own range."""
    frames, blob = clip
    m = mp4.parse_mp4(blob)
    for i, (off, size) in enumerate(m["samples"]):
        assert blob[off : off + 3] == b"\xff\xd8\xff"
        assert blob[off + size - 2 : off + size] == b"\xff\xd9"
        assert psnr(frames[i], mp4.decode_sample(blob, off, size)) >= 40.0


def test_video_meta_and_decode_frames_dispatch_mp4(clip):
    frames, blob = clip
    n, w, h, fps = video_meta(blob)
    assert (n, w, h, fps) == (len(frames), 32, 24, 8)
    sampled = decode_frames(blob, [0, 4, 8])
    for idx, img in zip([0, 4, 8], sampled):
        assert psnr(frames[idx], img) >= 40.0
    with pytest.raises(IndexError):
        decode_frames(blob, [len(frames)])


def test_encode_video_emits_mp4_and_fvid_still_decodes():
    frames = video_frames_for(2)
    live = encode_video(frames, 8)
    assert live[4:8] == b"ftyp"
    legacy = encode_video_fvid(frames, 8)
    assert legacy[:4] == b"FVID"
    n, w, h, fps = video_meta(legacy)
    assert (n, w, h, fps) == (len(frames), 32, 24, 8)
    np.testing.assert_array_equal(decode_frames(legacy, [3])[0], frames[3])


def test_deterministic_bytes():
    frames = video_frames_for(3)
    assert mp4.encode_mp4_mjpeg(frames, 8) == mp4.encode_mp4_mjpeg(frames, 8)


def test_truncated_and_invalid_raise():
    frames = video_frames_for(4)
    blob = mp4.encode_mp4_mjpeg(frames, 8)
    with pytest.raises(ValueError):
        mp4.parse_mp4(blob[: len(blob) // 3])  # mdat cut, moov gone
    with pytest.raises(ValueError):
        mp4.parse_mp4(b"\x00" * 64)


def test_fragmented_stream_hits_honest_boundary():
    # minimal ftyp + moof shell — the explicit NotImplementedError path
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    moof = struct.pack(">I", 8) + b"moof"
    with pytest.raises(NotImplementedError):
        mp4.parse_mp4(ftyp + moof)


def test_multi_chunk_stsc_resolution():
    """A demuxer must honor stsc run-lengths: rewrite the single-chunk
    table as 2 chunks (3 + rest samples) with matching stco offsets and
    confirm sample ranges still resolve to the same byte spans."""
    frames = video_frames_for(5)
    blob = bytearray(mp4.encode_mp4_mjpeg(frames, 8))
    m = mp4.parse_mp4(bytes(blob))
    n = m["n_frames"]
    sizes = [s for _, s in m["samples"]]
    first_off = m["samples"][0][0]
    second_off = first_off + sum(sizes[:3])
    # patch stsc: two runs (chunk 1: 3 samples, chunk 2: n-3)
    stsc_old = struct.pack(">I", 28) + b"stsc" + b"\x00" * 4 + struct.pack(
        ">IIII", 1, 1, n, 1
    )
    stsc_new = struct.pack(">I", 40) + b"stsc" + b"\x00" * 4 + struct.pack(
        ">IIIIIII", 2, 1, 3, 1, 2, n - 3, 1
    )
    # patch stco: two chunk offsets
    stco_old = struct.pack(">I", 20) + b"stco" + b"\x00" * 4 + struct.pack(
        ">II", 1, first_off
    )
    stco_new = struct.pack(">I", 24) + b"stco" + b"\x00" * 4 + struct.pack(
        ">III", 2, first_off, second_off
    )
    patched = bytes(blob).replace(stsc_old, stsc_new).replace(stco_old, stco_new)
    assert patched != bytes(blob), "patch did not apply"
    # fix enclosing container sizes: walking from stbl up, each grew by 16
    # — simpler: reparse leniently by rebuilding via full re-encode check
    # (the walker reads sizes, so enclosing boxes must be patched too)
    grown = 16  # (40-28) + (24-20)
    for tag in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        idx = patched.find(tag)
        old = struct.unpack(">I", patched[idx - 4 : idx])[0]
        patched = (
            patched[: idx - 4]
            + struct.pack(">I", old + grown)
            + patched[idx:]
        )
    m2 = mp4.parse_mp4(patched)
    assert m2["samples"] == m["samples"]
