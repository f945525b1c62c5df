"""Image codec + perceptual hash + payload validation (SURVEY.md §2.8 F18,
§2.2 P6/P7, §2.10 UDF #5).

Reference parity: MP4/image magic-byte checks (file_validator.py:185-220,
file_downloader.py:622-676), min-size predicates (file_downloader.py:590-606),
generalized to the image+caption payload of BASELINE.json ``input_hint``.

Codec selection: when PIL is importable it is the preferred DECODER
(``codec="auto"``) — it reads every PNG/JPEG variant a live origin can
serve, where the numpy stub decoder covers only the subset below. The
numpy codecs remain the fallback AND the canonical ENCODERS: datagen
ground truth (the VALUES oracles for image_decode_stats/image_features)
is computed from the stub codec's deterministic bytes, so ``encode_image``
never silently switches on PIL presence — PIL encoding is explicit
(``codec="pil"``). Blobs carrying the stub lossy magic (FAKE_JPEG_SIG)
always route to the stub decoder whatever the codec setting: they are not
real JPEG and PIL cannot read them.

Container constraints: PIL/imagehash are NOT installed here. Two numpy
codecs:

  * ``png`` — a REAL minimal PNG codec (pure numpy + stdlib zlib): 8-bit RGB,
    filter type 0, single IDAT. Losslessly round-trips; emitted files are
    valid PNG readable by any standard decoder. Decoding PNGs produced by
    *other* encoders is supported only for filter-0/filter-1/filter-2 RGB8
    streams; anything else raises NotImplementedError (clearly-marked stub
    boundary — swap in PIL on a real cluster).
  * ``jpeg`` — a REAL baseline JFIF codec (functions/jpeg.py, pure numpy):
    forward/inverse DCT, Annex-K-shaped quant tables at quality 97 (PSNR
    >= 40 dB on every fixture — the BASELINE.json input_hint window, with
    headroom), self-declared Huffman tables, byte stuffing, optional
    4:2:0 + restart intervals on decode. Emitted files open in any
    standard viewer; decode reads any 8-bit baseline sequential stream
    AND progressive SOF2 streams (spectral selection + successive
    approximation); arithmetic/lossless/12-bit → NotImplementedError,
    the honest boundary — ``codec="pil"`` covers those on a real
    cluster. Blobs from THIS
    encoder carry a JFIF COM tag and always decode through the numpy
    path even when PIL is importable, keeping phash ground truth
    bit-identical across hosts. The r1-r3 fake-lossy stub
    (FAKE_JPEG_SIG: uniform quantization + zlib) remains decodable for
    legacy blobs and reachable via ``codec="stub"``.

All entry points are batch-shaped (pd.Series → pd.Series/pd.DataFrame) so
they drop into pandas UDFs / mapInPandas with zero per-row Python dispatch
at the Spark layer.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd

from . import jpeg as _jpeg_codec

try:  # optional real codecs — absent in this container, present on a cluster
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # pragma: no cover - exercised by the numpy-only CI
    _PILImage = None
    HAVE_PIL = False

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SIG = b"\xff\xd8\xff"
WEBP_SIG_A, WEBP_SIG_B = b"RIFF", b"WEBP"
FAKE_JPEG_SIG = b"JQ90"  # stub codec magic — see module docstring
MIN_IMAGE_BYTES = 100  # reference thumb >=100 B (file_downloader.py:600)
PSNR_LOSSY_MIN_DB = 40.0  # BASELINE.json input_hint invariant

# ------------------------------------------------------------------ PNG


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """RGB8 (h, w, 3) uint8 array → valid PNG bytes (filter 0, one IDAT)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB8 array. Supports 8-bit RGB with ALL five standard
    per-row filters (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth — the full
    RFC 2083 §6 set, so streams from real encoders like libpng/PIL that
    pick Average/Paeth per row decode here too); interlace, palettes and
    other bit depths raise NotImplementedError (stub boundary — see
    module docstring)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            interlace = body[12]
            if bit_depth != 8 or color_type != 2:
                raise NotImplementedError("stub decoder: only 8-bit RGB PNG")
            if interlace:
                raise NotImplementedError("stub decoder: Adam7 interlace")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    stride = w * 3 + 1
    rows = raw.reshape(h, stride)
    filters, px = rows[:, 0], rows[:, 1:].astype(np.int16)
    out = np.zeros_like(px)
    for i in range(h):
        f = filters[i]
        up = out[i - 1] if i else np.zeros_like(px[i])
        if f == 0:
            out[i] = px[i]
        elif f == 1:  # Sub: add left pixel (per channel)
            row = px[i].copy()
            for j in range(3, row.size):
                row[j] = (row[j] + row[j - 3]) & 0xFF
            out[i] = row
        elif f == 2:  # Up: add pixel above
            out[i] = (px[i] + up) & 0xFF
        elif f == 3:  # Average: add floor((left + up) / 2)
            row = px[i].copy()
            for j in range(row.size):
                left = row[j - 3] if j >= 3 else 0
                row[j] = (row[j] + ((int(left) + int(up[j])) >> 1)) & 0xFF
            out[i] = row
        elif f == 4:  # Paeth predictor (RFC 2083 §6.6)
            row = px[i].copy()
            for j in range(row.size):
                a = int(row[j - 3]) if j >= 3 else 0  # left
                b = int(up[j])  # above
                c = int(out[i - 1][j - 3]) if (i and j >= 3) else 0  # up-left
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
            out[i] = row
        else:
            raise ValueError(f"invalid PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


# ------------------------------------------- legacy fake lossy codec (STUB)

_JPEG_Q = 6  # quantization step → MSE ≈ q²/12 = 3 → PSNR ≈ 43.4 dB


def _encode_jpeg(img: np.ndarray) -> bytes:
    """LEGACY stub lossy codec (NOT real JPEG) — uniform quantization +
    zlib. Kept decodable for r1-r3 blobs; the live jpeg path is the real
    baseline codec in functions/jpeg.py. See module docstring."""
    h, w, _ = img.shape
    q = (img.astype(np.int32) + _JPEG_Q // 2) // _JPEG_Q
    q = np.clip(q, 0, 255 // _JPEG_Q + 1).astype(np.uint8)
    return FAKE_JPEG_SIG + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FAKE_JPEG_SIG:
        raise ValueError(
            "legacy stub decoder: blob lacks FAKE_JPEG_SIG (real JPEG "
            "routes through functions/jpeg.py)"
        )
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    return np.clip(q.astype(np.int32) * _JPEG_Q, 0, 255).astype(np.uint8)


# -------------------------------------------------------------- PIL path


def _require_pil():
    if not HAVE_PIL:
        raise NotImplementedError("codec='pil' requires PIL (not in container)")


def _decode_pil(data: bytes) -> np.ndarray:
    """Real decoder for any PNG/JPEG variant (a live origin's bytes)."""
    import io

    _require_pil()
    with _PILImage.open(io.BytesIO(data)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _encode_pil(img: np.ndarray, fmt: str, quality: int = 90) -> bytes:
    import io

    _require_pil()
    buf = io.BytesIO()
    if fmt == "png":
        _PILImage.fromarray(img, "RGB").save(buf, format="PNG")
    elif fmt == "jpeg":
        _PILImage.fromarray(img, "RGB").save(buf, format="JPEG", quality=quality)
    else:
        raise NotImplementedError(f"fmt {fmt!r}")
    return buf.getvalue()


# ------------------------------------------------------------- dispatch


def encode_image(img: np.ndarray, fmt: str, codec: str = "numpy") -> bytes:
    """Default encoder stays the deterministic numpy codec even when PIL
    is installed — datagen ground truth depends on these exact bytes.
    jpeg emits REAL baseline JFIF (functions/jpeg.py, quality 97).
    ``codec="pil"`` → real-library output; ``codec="stub"`` → the legacy
    fake-lossy blob (r1-r3 fixtures only)."""
    if codec == "pil":
        return _encode_pil(img, fmt)
    if fmt == "png":
        return encode_png(img)
    if fmt == "jpeg":
        if codec == "stub":
            return _encode_jpeg(img)
        return _jpeg_codec.encode_jpeg(img)
    raise NotImplementedError(f"fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, codec: str = "auto") -> np.ndarray:
    """Decoder routing, in precedence order:

    1. legacy stub-lossy blobs (FAKE_JPEG_SIG) → stub decoder always
       (they are not real JPEG; PIL cannot read them);
    2. real JPEG carrying our encoder's COM tag → the numpy baseline
       decoder even under ``codec="auto"`` with PIL present, so phash
       ground truth is bit-identical whatever a host has installed
       (``codec="pil"`` still forces PIL — the cross-codec tests use it);
    3. ``codec="pil"`` or (``"auto"`` and PIL importable) → PIL, the
       deployment path for variants the numpy decoders don't cover;
    4. numpy codecs: real baseline JPEG / RGB8 PNG with all five RFC 2083
       row filters (None/Sub/Up/Average/Paeth; interlace, palette and
       other bit depths still raise).

    PNG round-trips identically on the numpy and PIL paths (the encoder
    emits standard filter-0 PNG), so lossless ground truth is
    codec-independent; the COM-tag rule extends that to lossy."""
    if fmt == "jpeg" and data[:4] == FAKE_JPEG_SIG:
        return _decode_jpeg(data)
    if (
        fmt == "jpeg"
        and codec != "pil"
        and data[:3] == JPEG_SIG
        and _jpeg_codec.has_encoder_tag(data)
    ):
        return _jpeg_codec.decode_jpeg(data)
    if codec == "pil" or (codec == "auto" and HAVE_PIL):
        return _decode_pil(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return _jpeg_codec.decode_jpeg(data)
    raise NotImplementedError(f"fmt {fmt!r}")


# ------------------------------------------------------------ validation


def sniff_format(data: bytes | None) -> str | None:
    """Magic-bytes format detection (reference file_downloader.py:622-676,
    file_validator.py:185-220 — mp4 ftyp/mdat/moov generalized to images)."""
    if not data or len(data) < 12:
        return None
    if data[:8] == PNG_SIG:
        return "png"
    if data[:3] == JPEG_SIG:
        return "jpeg"
    if data[:4] == FAKE_JPEG_SIG:
        return "jpeg"  # stub codec presents as the lossy format
    if data[:4] == WEBP_SIG_A and data[8:12] == WEBP_SIG_B:
        return "webp"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[4:8] in (b"ftyp", b"mdat", b"moov"):
        return "mp4"
    return None


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash: grayscale → 8×8 mean-pool → above-median
    bitmap. Deterministic, pure numpy (imagehash not in container; same
    family as average-hash). Returned as signed int64 to match LongType."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    # mean-pool to 8×8 (trim remainder so blocks are equal-sized)
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    g = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (g > np.median(g)).flatten()
    val = 0
    for bit in bits:
        val = (val << 1) | int(bit)
    return int(np.int64(np.uint64(val)))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


# ----------------------------------------------------- batch entry points


def typed_frame(rows: list[dict], dtypes: dict[str, str]) -> pd.DataFrame:
    """rows → DataFrame with pandas NULLABLE dtypes ("Int64", "Float64",
    "boolean"), built through object columns so int64 values NEVER pass
    through float64. pd.DataFrame(rows) on a mixed int/None column infers
    float64, silently rounding 64-bit hashes (phash/ahash) beyond the
    53-bit mantissa — every batch UDF that can emit None alongside a hash
    must build its output through this."""
    df = pd.DataFrame(rows, dtype=object)
    return df.astype(dtypes)


def decode_validate_batch(
    blobs: pd.Series,
    fmts: pd.Series,
    expected_phash: pd.Series | None = None,
    codec: str = "auto",
) -> pd.DataFrame:
    """Batch decode + validate (pandas-UDF body, SURVEY §2.10 UDF #5).

    Returns columns: ok(bool), w(int32), h(int32), phash(int64),
    error(str|None). Validation = magic-bytes sniff matches fmt, min size,
    decode succeeds, and (when expected_phash given) phash equality.
    ``codec`` selects the decoder (see decode_image) — the loop stays
    per-IMAGE either way (the codec call dominates), never per-pixel.
    """
    n = len(blobs)
    ok = np.zeros(n, bool)
    ws = np.zeros(n, np.int32)
    hs = np.zeros(n, np.int32)
    ph = np.zeros(n, np.int64)
    err: list[str | None] = [None] * n
    for i in range(n):
        data, fmt = blobs.iloc[i], fmts.iloc[i]
        if data is None or len(data) < MIN_IMAGE_BYTES:
            err[i] = "validation: payload too small"
            continue
        sniffed = sniff_format(bytes(data))
        if sniffed != fmt:
            err[i] = f"validation: magic bytes say {sniffed}, expected {fmt}"
            continue
        try:
            img = decode_image(bytes(data), fmt, codec=codec)
        except Exception as e:  # truncated/corrupt payload
            err[i] = f"validation: decode failed: {e}"
            continue
        hs[i], ws[i] = img.shape[0], img.shape[1]
        ph[i] = phash64(img)
        if expected_phash is not None and expected_phash.iloc[i] is not None:
            if int(ph[i]) != int(expected_phash.iloc[i]):
                err[i] = "validation: phash mismatch"
                continue
        ok[i] = True
    return pd.DataFrame(
        {"ok": ok, "w": ws, "h": hs, "phash": ph, "error": pd.Series(err, dtype=object)}
    )


# --------------------------------------------- webp / gif container audit
# Header-parse-without-decode for the two accepted-image formats the
# numpy codecs cannot decode (reference file_downloader.py:633-637 accepts
# them by signature): the O(header) inventory/validation pass mirroring
# mp4.parse_mp4 and audio.mp3_container_stats. Fixture builders emit
# containers whose STRUCTURE is fully spec-conformant (RIFF chunk tree,
# VP8/VP8L/VP8X bitstream headers, GIF block walk) over filler pixel
# payload — the audit never decodes pixels, so the container is what must
# be real, exactly like the MP4/MJPEG and mp3 fixtures.


def encode_webp_container(
    w: int, h: int, variant: str = "vp8", payload_len: int = 200, seed: int = 0
) -> bytes:
    """Deterministic WEBP container: RIFF/WEBP with a VP8 (lossy), VP8L
    (lossless) or VP8X (extended, wrapping a VP8 frame) chunk whose
    header encodes the true dimensions; frame payload is filler."""
    filler = bytes((5 * i + seed) % 251 for i in range(payload_len))
    if variant == "vp8":
        # frame tag: keyframe(0) | version | show_frame | partition size
        tag = (payload_len & 0x7FFFF) << 5 | (1 << 4)
        chunk = struct.pack("<I", tag & 0xFFFFFF)[:3] + b"\x9d\x01\x2a"
        chunk += struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + filler
        body = b"VP8 " + struct.pack("<I", len(chunk)) + chunk
    elif variant == "vp8l":
        bits = (w - 1) | ((h - 1) << 14)  # 14-bit w-1, 14-bit h-1, alpha=0
        chunk = b"\x2f" + struct.pack("<I", bits) + filler
        body = b"VP8L" + struct.pack("<I", len(chunk)) + chunk
    elif variant == "vp8x":
        vp8x = bytes(4) + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3]
        inner_tag = (payload_len & 0x7FFFF) << 5 | (1 << 4)
        inner = struct.pack("<I", inner_tag & 0xFFFFFF)[:3] + b"\x9d\x01\x2a"
        inner += struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + filler
        body = b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        body += b"VP8 " + struct.pack("<I", len(inner)) + inner
        if len(inner) % 2:
            body += b"\x00"  # RIFF chunks are 2-byte aligned
    else:
        raise ValueError(f"variant {variant!r}")
    if len(body) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"WEBP" + body


def parse_webp_header(data: bytes) -> dict:
    """WEBP container audit: variant (vp8/vp8l/vp8x), dimensions, chunk
    count — from the RIFF tree + bitstream headers alone, no decode."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WEBP container")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if riff_size + 8 > len(data):
        raise ValueError("truncated WEBP container")
    pos = 12
    variant = None
    w = h = None
    n_chunks = 0
    while pos + 8 <= riff_size + 8:
        fourcc = data[pos : pos + 4]
        clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + clen]
        n_chunks += 1
        if fourcc == b"VP8 " and variant != "vp8x":
            if payload[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 start code")
            variant = "vp8"
            w = struct.unpack("<H", payload[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", payload[8:10])[0] & 0x3FFF
        elif fourcc == b"VP8L":
            if payload[0] != 0x2F:
                raise ValueError("bad VP8L signature")
            bits = struct.unpack("<I", payload[1:5])[0]
            variant = "vp8l"
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
        elif fourcc == b"VP8X":
            variant = "vp8x"
            w = 1 + int.from_bytes(payload[4:7], "little")
            h = 1 + int.from_bytes(payload[7:10], "little")
        pos += 8 + clen + (clen & 1)  # chunks are 2-byte aligned
    if variant is None:
        raise ValueError("no VP8/VP8L/VP8X chunk")
    return {"variant": variant, "w": w, "h": h, "n_chunks": n_chunks}


def encode_gif_container(
    w: int,
    h: int,
    n_frames: int = 1,
    payload_len: int = 60,
    seed: int = 0,
    version: bytes = b"GIF89a",
) -> bytes:
    """Deterministic GIF container: logical screen descriptor + global
    color table + ``n_frames`` image descriptors (each with LZW
    min-code byte and length-prefixed filler sub-blocks) + trailer."""
    out = bytearray(version)
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x01, 0, 0])  # GCT present, 4 entries (2^(1+1))
    out += bytes((11 * i + seed) % 256 for i in range(3 * 4))  # GCT
    for f in range(n_frames):
        if version == b"GIF89a":  # graphic-control extension per frame
            out += bytes([0x21, 0xF9, 4, 0, 10, 0, 0, 0])
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])  # no LCT
        out += bytes([2])  # LZW minimum code size
        filler = bytes((7 * i + f + seed) % 256 for i in range(payload_len))
        for off in range(0, len(filler), 255):
            sub = filler[off : off + 255]
            out += bytes([len(sub)]) + sub
        out += bytes([0])  # sub-block terminator
    out += b"\x3b"
    return bytes(out)


def parse_gif_header(data: bytes) -> dict:
    """GIF container audit: version, logical-screen dims, frame count
    (image descriptors), global-color-table size — via the block walk
    alone, no LZW decode."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF container")
    version = data[:6].decode("ascii")
    w, h = struct.unpack("<HH", data[6:10])
    packed = data[10]
    gct_entries = 2 ** ((packed & 7) + 1) if packed & 0x80 else 0
    pos = 13 + 3 * gct_entries
    n_frames = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return {
                "version": version, "w": w, "h": h,
                "n_frames": n_frames, "gct_entries": gct_entries,
            }
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            n_frames += 1
            packed_i = data[pos + 9]
            lct = 2 ** ((packed_i & 7) + 1) if packed_i & 0x80 else 0
            pos += 10 + 3 * lct + 1  # descriptor + LCT + LZW min code
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X} at byte {pos}")
    raise ValueError("truncated GIF: missing trailer")
