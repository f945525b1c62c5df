"""Container audits without decode: mp3 frame-header walk (functions/
audio.py) and WEBP/GIF header parse (functions/imaging.py) — the
O(header) inventory passes mirroring mp4.parse_mp4, over the
accepted-media formats the numpy codecs cannot decode (reference
file_downloader.py:633-637 signatures)."""

from __future__ import annotations

import pytest

from web_scraper_spark import datagen
from web_scraper_spark.functions.audio import (
    MP3_SAMPLES_PER_FRAME,
    encode_mp3_frames,
    mp3_container_stats,
)
from web_scraper_spark.functions.imaging import (
    encode_gif_container,
    encode_webp_container,
    parse_gif_header,
    parse_webp_header,
    sniff_format,
)

# ----------------------------------------------------------------- mp3


def test_mp3_cbr_walk():
    s = mp3_container_stats(encode_mp3_frames([(9, 0, 0)] * 12))
    assert s["n_frames"] == 12 and s["mode"] == "cbr"
    assert s["bitrate_min_kbps"] == s["bitrate_max_kbps"] == 128
    assert s["sample_rate"] == 44100 and s["id3_bytes"] == 0
    assert s["duration_s"] == round(12 * MP3_SAMPLES_PER_FRAME / 44100, 4)


def test_mp3_vbr_with_id3_and_padding():
    specs = [(1 + f, 1, f & 1) for f in range(14)]  # idx 1..14 → 32..320 kbps
    s = mp3_container_stats(encode_mp3_frames(specs, id3_size=100, seed=2))
    assert s["mode"] == "vbr" and s["n_frames"] == 14
    assert s["id3_bytes"] == 110  # 10-byte header + payload
    assert (s["bitrate_min_kbps"], s["bitrate_max_kbps"]) == (32, 320)


def test_mp3_truncated_and_desync_raise():
    blob = encode_mp3_frames([(5, 0, 0)] * 4)
    with pytest.raises(ValueError):
        mp3_container_stats(blob[:-3])
    with pytest.raises(ValueError):
        mp3_container_stats(b"\x00\x01" + blob)
    with pytest.raises(NotImplementedError):  # MPEG-2 version bits
        bad = bytearray(blob)
        bad[1] = 0xF3
        mp3_container_stats(bytes(bad))


def test_mp3_frame_lengths_obey_spec():
    """144000·kbps/sr + padding — any independent walker agrees."""
    blob = encode_mp3_frames([(9, 0, 1), (9, 0, 0)])
    assert len(blob) == (144_000 * 128 // 44100 + 1) + (144_000 * 128 // 44100)


# ------------------------------------------------------------ webp/gif


@pytest.mark.parametrize("variant", ["vp8", "vp8l", "vp8x"])
def test_webp_variants_roundtrip(variant):
    b = encode_webp_container(320, 214, variant, seed=3)
    assert sniff_format(b) == "webp"
    p = parse_webp_header(b)
    assert (p["variant"], p["w"], p["h"]) == (variant, 320, 214)


def test_webp_truncated_and_garbage_raise():
    b = encode_webp_container(64, 40, "vp8")
    with pytest.raises(ValueError):
        parse_webp_header(b[: len(b) // 2])
    with pytest.raises(ValueError):
        parse_webp_header(b"RIFF\x04\x00\x00\x00WAVE" + bytes(20))


def test_gif_multiframe_and_versions():
    g = encode_gif_container(64, 40, n_frames=3)
    assert sniff_format(g) == "gif"
    p = parse_gif_header(g)
    assert (p["version"], p["w"], p["h"], p["n_frames"]) == ("GIF89a", 64, 40, 3)
    p87 = parse_gif_header(encode_gif_container(17, 9, version=b"GIF87a"))
    assert (p87["version"], p87["n_frames"]) == ("GIF87a", 1)


def test_gif_truncated_raises():
    g = encode_gif_container(64, 40, n_frames=2)
    with pytest.raises(ValueError):
        parse_gif_header(g[: len(g) - 2])  # trailer cut off


def test_fixture_populations_deterministic():
    """The gate fixtures regenerate bit-identically (VALUES-oracle
    precondition) and contain every variant + the planted soft-fail rows."""
    a1, a2 = datagen.gen_mp3_payload_pdf(30), datagen.gen_mp3_payload_pdf(30)
    assert list(a1["bytes"]) == list(a2["bytes"])
    w1 = datagen.gen_web_image_payload_pdf(30)
    w2 = datagen.gen_web_image_payload_pdf(30)
    assert list(w1["bytes"]) == list(w2["bytes"])
    variants = set()
    bad = 0
    for blob in w1["bytes"]:
        try:
            fmt = sniff_format(bytes(blob))
            p = parse_webp_header(bytes(blob)) if fmt == "webp" else parse_gif_header(bytes(blob))
            variants.add(p.get("variant") or p["version"])
        except ValueError:
            bad += 1
    assert {"vp8", "vp8l", "vp8x", "GIF87a", "GIF89a"} <= variants
    assert bad >= 1  # planted truncations exercise the soft-fail path
    n_bad_mp3 = 0
    for blob in a1["bytes"]:
        try:
            mp3_container_stats(bytes(blob))
        except ValueError:
            n_bad_mp3 += 1
    assert n_bad_mp3 >= 1
