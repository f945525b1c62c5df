"""Deterministic synthetic fixtures (FIXTURES.md schemas, seed=42).

Generates the payload (image+caption) table, the site graph (listing pages →
detail URLs), seed lists, robots rules, and fault plans — all
seed-parameterized, no external data. Image pixels are smooth sinusoid
fields (compress well under zlib, give non-trivial phashes); captions follow
the reference's title+tags shape (9.json golden sample).

Host distribution is deliberately skewed: ``hot.example.test`` holds ~50% of
URLs (FIXTURES.md §2) to exercise the salted-repartition politeness path.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .functions.imaging import encode_image, phash64
from . import schemas

DEFAULT_SEED = 42
HOT_HOST = "hot.example.test"
N_COLD_HOSTS = 9

_WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper krill "
    "lumen mesa nectar onyx prism quartz reef sable tundra umber vortex "
    "willow xenon yarrow zephyr"
).split()


def _stable_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def image_id_for(i: int) -> str:
    return f"{i:08d}"


def host_for(i: int, seed: int = DEFAULT_SEED) -> str:
    """~50% of items on one hot host, rest uniform over 9 cold hosts."""
    h = _stable_u64(f"host:{seed}:{i}")
    if h % 2 == 0:
        return HOT_HOST
    return f"cold{h % N_COLD_HOSTS}.example.test"


def detail_url_for(i: int, seed: int = DEFAULT_SEED) -> str:
    """Detail URL with canonicalization noise: a deterministic subset carries
    fragments/query strings/uppercase hosts that canonicalize_url must strip
    (exercises F6/F7)."""
    iid = _stable_u64(f"url:{seed}:{i}")
    slug = _WORDS[iid % len(_WORDS)]
    base = f"https://{host_for(i, seed)}/video/{image_id_for(i)}/{slug}/"
    noise = iid % 5
    if noise == 0:
        return base + "?utm_source=feed"
    if noise == 1:
        return base + "#player"
    if noise == 2:
        return base.replace("https://", "https://").replace(
            host_for(i, seed), host_for(i, seed).upper()
        )
    return base


def caption_for(i: int, seed: int = DEFAULT_SEED) -> str:
    """title + tags joined (mirrors reference 9.json title/tags fields)."""
    u = _stable_u64(f"cap:{seed}:{i}")
    title = " ".join(
        _WORDS[(u >> (7 * k)) % len(_WORDS)] for k in range(3 + u % 3)
    ).capitalize()
    tags = sorted({_WORDS[(u >> (5 * k + 3)) % len(_WORDS)] for k in range(4)})
    return f"{title} | tags: {', '.join(tags)}"


def make_image(i: int, w: int, h: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic RGB8 sinusoid field — smooth (zlib-friendly) but
    id-dependent enough that phashes differ across items."""
    u = _stable_u64(f"img:{seed}:{i}")
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.zeros((h, w, 3), np.float64)
    for c in range(3):
        fx = 1 + (u >> (8 * c)) % 5
        fy = 1 + (u >> (8 * c + 4)) % 5
        phase = ((u >> (8 * c + 8)) % 628) / 100.0
        img[:, :, c] = 127.5 + 110 * np.sin(
            2 * math.pi * (fx * xs / w + fy * ys / h) + phase
        )
    return np.clip(img, 0, 255).astype(np.uint8)


def dims_for(i: int, seed: int = DEFAULT_SEED, small: bool = True) -> tuple[int, int]:
    """(w, h). ``small=True`` (default, sandbox) keeps payload bytes tiny;
    small=False uses the FIXTURES.md production dims {320,640,1280}×{240,480,720}."""
    u = _stable_u64(f"dim:{seed}:{i}")
    if small:
        return ((32, 24), (64, 48), (96, 72))[u % 3]
    return ((320, 240), (640, 480), (1280, 720))[u % 3]


def fmt_for(i: int, seed: int = DEFAULT_SEED) -> str:
    return "png" if _stable_u64(f"fmt:{seed}:{i}") % 2 == 0 else "jpeg"


# ---------------------------------------------------------------- tables


def gen_payload_pdf(
    n: int, seed: int = DEFAULT_SEED, small: bool = True, with_bytes: bool = True
) -> pd.DataFrame:
    rows = []
    for i in range(n):
        w, h = dims_for(i, seed, small)
        fmt = fmt_for(i, seed)
        if with_bytes:
            img = make_image(i, w, h, seed)
            blob = encode_image(img, fmt)
            # phash is of the DECODED image — for the lossy stub that is the
            # quantized pixels, matching what the engine recomputes.
            from .functions.imaging import decode_image

            ph = phash64(decode_image(blob, fmt))
        else:
            blob, ph = None, 0
        rows.append(
            {
                "image_id": image_id_for(i),
                "bytes": blob,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption_for(i, seed),
                "phash": ph,
            }
        )
    return pd.DataFrame(rows)


def perturb_image(img: np.ndarray, i: int, patch: int = 6, amp: int = 2) -> np.ndarray:
    """Deterministic near-duplicate variant: +amp on one patch×patch block
    at a seeded position. Tuned (patch=6, amp=2) so the codec-roundtripped
    phash hamming distance to the original stays ≤ 3 for every fixture
    image — inside the 4×16-band pigeonhole recall guarantee the banded
    pair join relies on (measured max 3 over the 120-image fixture; 8×8
    at +3 leaks to 9)."""
    rng = np.random.default_rng(1000 + i)
    h, w = img.shape[:2]
    y = int(rng.integers(0, max(h - patch, 1)))
    x = int(rng.integers(0, max(w - patch, 1)))
    v = img.astype(np.int16).copy()
    v[y : y + patch, x : x + patch, :] += amp
    return np.clip(v, 0, 255).astype(np.uint8)


#: (w, h) cycle for the varied-payload fixture: exact matches for each of
#: the five aspect buckets (square, 4:3, 16:9, 3:4, 9:16), two in-between
#: ratios (8:5 and 5:8 — nearest bucket is 16:9 / 9:16 by log distance),
#: and one deliberately tiny frame (32×24) for the min-pixel gate.
VARIED_DIMS = (
    (64, 64),
    (64, 48),
    (96, 54),
    (48, 64),
    (36, 64),
    (80, 50),
    (50, 80),
    (32, 24),
)


def gen_varied_payload_pdf(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Payload with deliberately varied aspect ratios (VARIED_DIMS cycle)
    and a planted dark subset (``i % 5 == 0`` → pixel values ``// 4``, so
    brightness ≈ 31 and contrast collapses) — the fixture population for
    the aspect-ratio bucketing and image-quality-gate queries and their
    driver-side ground truths. Same schema as gen_payload_pdf."""
    from .functions.imaging import decode_image

    rows = []
    for i in range(n):
        w, h = VARIED_DIMS[i % len(VARIED_DIMS)]
        fmt = fmt_for(i, seed)
        img = make_image(i, w, h, seed)
        if i % 5 == 0:
            img = (img // 4).astype(np.uint8)
        blob = encode_image(img, fmt)
        rows.append(
            {
                "image_id": image_id_for(i),
                "bytes": blob,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption_for(i, seed),
                "phash": phash64(decode_image(blob, fmt)),
            }
        )
    return pd.DataFrame(rows)


#: audio fixture parameters (seconds per clip cycles; 8 kHz mono PCM16)
AUDIO_SR = 8000
AUDIO_DURS = (0.5, 0.8, 1.2, 1.6)


def media_id_for(i: int) -> str:
    return f"m{i:07d}"


def audio_samples_for(i: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic int16 mono clip: two-sine mix with id-dependent
    frequencies/amplitude. Planted populations: every 7th clip is SILENT
    (zeros), every 5th is amplified past full-scale (CLIPPED after the
    int16 clamp). Non-planted clips peak at ≤0.99 — below the clip flag's
    0.999 threshold by construction."""
    u = _stable_u64(f"aud:{seed}:{i}")
    n = int(AUDIO_DURS[i % len(AUDIO_DURS)] * AUDIO_SR)
    if i % 7 == 0:
        return np.zeros(n, np.int16)
    t = np.arange(n, dtype=np.float64) / AUDIO_SR
    f1, f2 = 100 + u % 900, 150 + (u >> 16) % 1500
    a = 0.35 + ((u >> 32) % 40) / 100.0  # 0.35..0.74 → peak ≤ 0.99
    phase = ((u >> 48) % 628) / 100.0
    x = a * np.sin(2 * math.pi * f1 * t) + 0.25 * np.sin(2 * math.pi * f2 * t + phase)
    if i % 5 == 0:
        x = x * 2.2  # drive past full-scale → clamped → clipped flag
    return np.clip(np.round(x * 32767), -32767, 32767).astype(np.int16)


def gen_audio_payload_pdf(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Audio payload table (media_id, bytes, fmt, caption): WAV clips from
    audio_samples_for, except every 11th row is an UNDECODABLE mp3 blob
    (ID3 magic + filler) — the mixed-corpus population for the soft-fail
    path (ok=False, features null)."""
    from .functions.audio import encode_wav

    rows = []
    for i in range(n):
        if i % 11 == 0:
            blob, fmt = b"ID3" + bytes(200), "mp3"
        else:
            blob, fmt = encode_wav(audio_samples_for(i, seed), AUDIO_SR), "wav"
        rows.append(
            {
                "media_id": media_id_for(i),
                "bytes": blob,
                "fmt": fmt,
                "caption": caption_for(i, seed),
            }
        )
    return pd.DataFrame(rows)


def mp3_frame_specs_for(i: int, seed: int = DEFAULT_SEED) -> list[tuple[int, int, int]]:
    """Deterministic (bitrate_idx, samplerate_idx, padding) frame specs
    for clip ``i``: every 3rd clip is VBR (bitrate cycles per frame),
    the rest CBR; padding alternates; the sample rate is constant per
    clip (spec requirement the audit enforces)."""
    u = _stable_u64(f"mp3:{seed}:{i}")
    n_frames = 8 + u % 17
    si = u % 3
    if i % 3 == 0:  # VBR: bitrate index walks a seeded cycle
        return [
            (1 + (u >> (f % 23)) % 14, si, (u >> f) & 1) for f in range(n_frames)
        ]
    bi = 1 + (u >> 7) % 14
    return [(bi, si, f & 1) for f in range(n_frames)]


def gen_mp3_payload_pdf(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """mp3 container fixture (media_id, bytes, fmt, caption): valid
    MPEG-1 Layer III frame-header chains (functions/audio.
    encode_mp3_frames — headers and frame lengths fully conformant,
    payload filler; the audit never decodes audio). Every 4th clip
    carries an ID3v2 tag; every 13th is TRUNCATED mid-frame — the
    soft-fail row for the audit's error path."""
    from .functions.audio import encode_mp3_frames

    rows = []
    for i in range(n):
        id3 = 48 + (i % 5) * 16 if i % 4 == 0 else 0
        blob = encode_mp3_frames(mp3_frame_specs_for(i, seed), id3_size=id3, seed=i)
        if i % 13 == 5:
            blob = blob[: len(blob) - 7]
        rows.append(
            {
                "media_id": media_id_for(i),
                "bytes": blob,
                "fmt": "mp3",
                "caption": caption_for(i, seed),
            }
        )
    return pd.DataFrame(rows)


#: web-image container fixture dims cycle (w, h)
WEBIMG_DIMS = ((320, 214), (64, 40), (1280, 720), (17, 9))


def gen_web_image_payload_pdf(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """WEBP/GIF container fixture (media_id, bytes, fmt, caption): the
    two accepted-image formats the numpy codecs cannot decode (reference
    file_downloader.py:633-637 signatures). Containers are structurally
    conformant (imaging.encode_webp_container / encode_gif_container);
    variants cycle vp8 → vp8l → vp8x → gif89a(multi-frame) → gif87a;
    every 11th blob is truncated for the soft-fail path."""
    from .functions.imaging import encode_gif_container, encode_webp_container

    rows = []
    for i in range(n):
        u = _stable_u64(f"webimg:{seed}:{i}")
        w, h = WEBIMG_DIMS[u % len(WEBIMG_DIMS)]
        kind = i % 5
        if kind < 3:
            variant = ("vp8", "vp8l", "vp8x")[kind]
            blob = encode_webp_container(
                w, h, variant, payload_len=120 + u % 200, seed=i
            )
            fmt = "webp"
        else:
            version = b"GIF89a" if kind == 3 else b"GIF87a"
            blob = encode_gif_container(
                w, h,
                n_frames=1 + u % 4 if kind == 3 else 1,
                payload_len=40 + u % 90, seed=i, version=version,
            )
            fmt = "gif"
        if i % 11 == 7:
            blob = blob[: max(14, len(blob) * 2 // 3)]
        rows.append(
            {
                "media_id": media_id_for(i),
                "bytes": blob,
                "fmt": fmt,
                "caption": caption_for(i, seed),
            }
        )
    return pd.DataFrame(rows)


#: video fixture parameters: frame-count cycle, 32×24 RGB, 8 fps
VIDEO_NFRAMES = (12, 16, 24)
VIDEO_W, VIDEO_H, VIDEO_FPS = 32, 24, 8


def video_frames_for(i: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic (n, h, w, 3) uint8 clip: a sinusoid base image with a
    per-frame brightness ramp (+3/frame — phash-stable: the median shifts
    with the pixels). Every 3rd clip has a SCENE CUT at n//2: the second
    half ramps over a different base image (phash jumps ≫ the 16-bit
    hamming threshold)."""
    n = VIDEO_NFRAMES[i % len(VIDEO_NFRAMES)]
    base = make_image(i, VIDEO_W, VIDEO_H, seed).astype(np.int16)
    alt = make_image(i + 100_000, VIDEO_W, VIDEO_H, seed).astype(np.int16)
    cut_at = n // 2 if i % 3 == 0 else None
    frames = np.empty((n, VIDEO_H, VIDEO_W, 3), np.uint8)
    for f in range(n):
        src = alt if (cut_at is not None and f >= cut_at) else base
        frames[f] = np.clip(src + 3 * f, 0, 255).astype(np.uint8)
    return frames


def gen_video_payload_pdf(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Video payload table (media_id, bytes, caption): real MP4/MJPEG
    clips (functions/mp4.py) from video_frames_for."""
    from .functions.video import encode_video

    rows = []
    for i in range(n):
        rows.append(
            {
                "media_id": media_id_for(i),
                "bytes": encode_video(video_frames_for(i, seed), VIDEO_FPS),
                "caption": caption_for(i, seed),
            }
        )
    return pd.DataFrame(rows)


#: WARC fixture shape: 24 image records + 3 html pages + 2 planted 404s,
#: split across one plain .warc and one .warc.gz
N_WARC_IMAGES, N_WARC_HTML, N_WARC_404 = 24, 3, 2


def warc_records_for(seed: int = DEFAULT_SEED) -> list[dict]:
    """The WARC fixture's record list — the GENERATION PARAMETERS the
    ground truth reads directly, which write_warc encodes and the Spark
    reader must parse back out. Image payloads are the standard datagen
    blobs so the bridge (payload_from_warc → decode) can be checked
    against the payload table's phashes."""
    from .functions.imaging import encode_image

    recs = []
    for i in range(N_WARC_IMAGES):
        w, h = dims_for(i, seed)
        fmt = fmt_for(i, seed)
        recs.append(
            {
                "url": f"https://img.example.test/items/{image_id_for(i)}.{fmt}",
                "payload": encode_image(make_image(i, w, h, seed), fmt),
                "content_type": f"image/{fmt}",
                "status": 200,
            }
        )
    for k in range(N_WARC_HTML):
        recs.append(
            {
                "url": f"https://img.example.test/page/{k + 1}",
                "payload": f"<html><title>page {k + 1}</title></html>".encode(),
                "content_type": "text/html",
                "status": 200,
            }
        )
    for k in range(N_WARC_404):
        recs.append(
            {
                "url": f"https://img.example.test/items/gone{k}.png",
                "payload": b"not found",
                "content_type": "text/html",
                "status": 404,
            }
        )
    return recs


def gen_warc_files(seed: int = DEFAULT_SEED) -> dict[str, bytes]:
    """{filename: bytes} — records split half/half across a plain .warc
    and a gzip .warc.gz (both layouts must parse identically)."""
    from .sources.warc import write_warc

    recs = warc_records_for(seed)
    half = len(recs) // 2
    return {
        "crawl-000.warc": write_warc(recs[:half], compress=False),
        "crawl-001.warc.gz": write_warc(recs[half:], compress=True),
    }


def gen_neardup_payload_pdf(
    n: int, seed: int = DEFAULT_SEED, small: bool = True
) -> pd.DataFrame:
    """Payload of n originals + one perturbed near-dup variant per original
    (image_id suffix ``v``) — the planted population for the perceptual-
    hash near-dup pair query and its ground-truth oracle."""
    from .functions.imaging import decode_image

    rows = []
    for i in range(n):
        w, h = dims_for(i, seed, small)
        fmt = fmt_for(i, seed)
        img = make_image(i, w, h, seed)
        for suffix, im in (("", img), ("v", perturb_image(img, i))):
            blob = encode_image(im, fmt)
            rows.append(
                {
                    "image_id": image_id_for(i) + suffix,
                    "bytes": blob,
                    "w": w,
                    "h": h,
                    "fmt": fmt,
                    "caption": caption_for(i, seed),
                    "phash": phash64(decode_image(blob, fmt)),
                }
            )
    return pd.DataFrame(rows)


def gen_site_graph_pdf(
    n_pages: int, videos_per_page: int = 24, seed: int = DEFAULT_SEED
) -> pd.DataFrame:
    """Listing structure: page p (1..n_pages) lists items in positional order.
    Item index = (p-1)*vpp + pos. ~24 items/page matches the reference's
    observed listing density (new/parsing_results_*.json)."""
    rows = []
    for p in range(1, n_pages + 1):
        for pos in range(videos_per_page):
            i = (p - 1) * videos_per_page + pos
            rows.append(
                {
                    "page": p,
                    "position": pos,
                    "url": detail_url_for(i, seed),
                    "image_id": image_id_for(i),
                    "host": host_for(i, seed),
                }
            )
    return pd.DataFrame(rows)


def gen_robots_pdf(seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Per-host robots rules; cold3 disallows /video/ entirely and the hot
    host disallows one word-slug prefix, so some URLs MUST be excluded
    (FIXTURES.md §4)."""
    hosts = [HOT_HOST] + [f"cold{k}.example.test" for k in range(N_COLD_HOSTS)]
    rows = []
    for hname in hosts:
        u = _stable_u64(f"robots:{seed}:{hname}")
        if hname == "cold3.example.test":
            dis = ["/video/"]
        elif hname == HOT_HOST:
            dis = [f"/video/{image_id_for(0)}"]  # block one known item
        else:
            dis = ["/admin/", "/private/"]
        rows.append(
            {
                "host": hname,
                "disallow_prefixes": dis,
                "crawl_delay_ms": int(100 + (u % 5) * 100),
            }
        )
    return pd.DataFrame(rows)


def gen_fault_plan_pdf(
    n: int, seed: int = DEFAULT_SEED, fail_rate: float = 0.1
) -> pd.DataFrame:
    """Deterministic failure injection (FIXTURES.md §6). fail_count = number
    of attempts that fail before success; -1 = always fail (tombstone path,
    reference new/scrape_orchestrator.py:332-345 semantics)."""
    modes = ["network", "rate_limit", "permanent", "validation", "temporary"]
    rows = []
    for i in range(n):
        u = _stable_u64(f"fault:{seed}:{i}")
        if (u % 1000) / 1000.0 >= fail_rate:
            continue
        mode = modes[u % len(modes)]
        fail_count = -1 if mode == "permanent" or u % 7 == 0 else 1 + u % 3
        rows.append(
            {"image_id": image_id_for(i), "fail_mode": mode, "fail_count": int(fail_count)}
        )
    return pd.DataFrame(rows)


# ------------------------------------------------------ synthetic HTML
# Deterministic listing/detail pages mirroring the reference's extraction
# contracts (html/downloads.txt, html/tags.txt; JSON-LD per
# new/video_data_parser.py:150-176) so the parse operators (functions/
# extraction.py) run against realistic markup with known ground truth.


def listing_html_for(page: int, n_pages: int, videos_per_page: int = 24, seed: int = DEFAULT_SEED) -> str:
    items = []
    for pos in range(videos_per_page):
        i = (page - 1) * videos_per_page + pos
        items.append(f'<div class="item"><a href="{detail_url_for(i, seed)}">v{i}</a></div>')
    nav = f'<a href="https://{HOT_HOST}/latest-updates/{n_pages}/">Last</a>'
    return f"<html><body>{''.join(items)}<div class='pagination'>{nav}</div></body></html>"


def detail_html_for(i: int, seed: int = DEFAULT_SEED) -> str:
    import json as _json

    u = _stable_u64(f"detail:{seed}:{i}")
    caption = caption_for(i, seed)
    title = caption.split(" | ")[0]
    tags = caption.split("tags: ")[1].split(", ")
    mins, secs = 1 + u % 20, u % 60
    views = (u % 900_000) + 100
    ld = _json.dumps(
        {
            "@type": "VideoObject",
            "name": title,
            "description": f"desc {i}",
            "duration": f"PT{mins}M{secs}S",
            "uploadDate": f"202{u % 5}-0{1 + u % 9}-1{u % 9}",
            "contentUrl": f"https://cdn.example.test/file/{image_id_for(i)}.mp4",
            "thumbnailUrl": f"https://cdn.example.test/thumb/{image_id_for(i)}.jpg",
        }
    )
    tag_html = "".join(f'<a class="tag_item" href="#">{t}</a>' for t in tags)
    variants = "".join(
        f'<a class="download_link" href="https://cdn.example.test/dl/{image_id_for(i)}_{q}.mp4">MP4 {q}</a>'
        for q in ("2160p", "1080p", "720p", "480p")
    )
    player = (
        "var playerConfig = {file: '"
        f"https://cdn.example.test/file/{image_id_for(i)}.mp4"
        "', poster: '"
        f"https://cdn.example.test/thumb/{image_id_for(i)}.jpg"
        f"', quality: {1080 if u % 2 else 720},"
        " };"
    )
    return (
        "<html><head>"
        f"<title>{title}</title>"
        f'<meta property="og:title" content="{title}"/>'
        f'<script type="application/ld+json">{ld}</script>'
        f"<script>{player}</script>"
        "</head><body>"
        f'<span class="uploader"><a href="#">user{u % 50}</a></span>'
        f'<span class="views">{views:,}</span>'
        f"{tag_html}<div class='downloads'>{variants}</div>"
        f'<video><source src="https://cdn.example.test/file/{image_id_for(i)}.mp4"></video>'
        "</body></html>"
    )


def gen_listing_pages_pdf(n_pages: int, videos_per_page: int = 24, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "page": range(1, n_pages + 1),
            "html": [
                listing_html_for(p, n_pages, videos_per_page, seed)
                for p in range(1, n_pages + 1)
            ],
        }
    )


def gen_detail_pages_pdf(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "image_id": [image_id_for(i) for i in range(n)],
            "html": [detail_html_for(i, seed) for i in range(n)],
        }
    )


# ------------------------------------------------------- Spark DataFrames


def payload_df(spark: SparkSession, n: int, seed: int = DEFAULT_SEED, small: bool = True) -> DataFrame:
    return spark.createDataFrame(gen_payload_pdf(n, seed, small), schema=schemas.PAYLOAD_SCHEMA)


def site_graph_df(
    spark: SparkSession, n_pages: int, videos_per_page: int = 24, seed: int = DEFAULT_SEED
) -> DataFrame:
    return spark.createDataFrame(
        gen_site_graph_pdf(n_pages, videos_per_page, seed), schema=schemas.SITE_GRAPH_SCHEMA
    )


def robots_df(spark: SparkSession, seed: int = DEFAULT_SEED) -> DataFrame:
    return spark.createDataFrame(gen_robots_pdf(seed), schema=schemas.ROBOTS_SCHEMA)


def fault_plan_df(
    spark: SparkSession, n: int, seed: int = DEFAULT_SEED, fail_rate: float = 0.1
) -> DataFrame:
    pdf = gen_fault_plan_pdf(n, seed, fail_rate)
    if pdf.empty:
        return spark.createDataFrame([], schema=schemas.FAULT_PLAN_SCHEMA)
    return spark.createDataFrame(pdf, schema=schemas.FAULT_PLAN_SCHEMA)


def big_site_graph_df(
    spark: SparkSession, n_pages: int, videos_per_page: int = 24, seed: int = DEFAULT_SEED
) -> DataFrame:
    """Distributed generator for bench-scale frontiers (≥10^5 rows): built
    from spark.range so generation itself is parallel and never collects to
    the driver — this is the path that scales the frontier row count
    independently of payload bytes (FIXTURES.md 'bench' profile).

    URL/host shape matches detail_url_for/host_for closely enough for
    scheduling benchmarks (hash-based hot-host skew ≈50%), but uses JVM-side
    xxhash64 instead of blake2b so the generator is pure column expressions.
    """
    from pyspark.sql import functions as F

    n = n_pages * videos_per_page
    df = spark.range(0, n).withColumnRenamed("id", "i")
    hot = (F.xxhash64(F.concat(F.lit(f"host:{seed}:"), F.col("i"))) % 2) == 0
    coldk = F.pmod(F.xxhash64(F.concat(F.lit(f"host:{seed}:"), F.col("i"))), F.lit(N_COLD_HOSTS))
    host = F.when(hot, F.lit(HOT_HOST)).otherwise(
        F.concat(F.lit("cold"), coldk.cast("string"), F.lit(".example.test"))
    )
    iid = F.lpad(F.col("i").cast("string"), 8, "0")
    return df.select(
        (F.floor(F.col("i") / videos_per_page) + 1).cast("int").alias("page"),
        F.pmod(F.col("i"), F.lit(videos_per_page)).cast("int").alias("position"),
        F.concat(F.lit("https://"), host, F.lit("/video/"), iid, F.lit("/x/")).alias("url"),
        iid.alias("image_id"),
        host.alias("host"),
    )
