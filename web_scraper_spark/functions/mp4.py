"""Real MP4 (ISO BMFF) container codec — motion-JPEG samples, pure numpy.

Upgrades the video leg from the FVID stub container to the actual format
the reference downloads and validates (file_validator.py:185-220 checks
ftyp/mdat/moov signatures; file_downloader.py:622-676 sniffs the same
boxes): a from-scratch ISO/IEC 14496-12 box writer/parser with the frame
payloads encoded by the real baseline JPEG codec (functions/jpeg.py) —
i.e. motion-JPEG, the 'jpeg' sample-entry fourcc.

Writer (``encode_mp4_mjpeg``): ftyp → mdat (concatenated JFIF frames) →
moov(mvhd, trak(tkhd, mdia(mdhd, hdlr'vide', minf(vmhd, dinf(dref),
stbl(stsd('jpeg' VisualSampleEntry), stts, stsc, stsz, stco))))).
mdat precedes moov so chunk offsets are known when stco is written; the
sample tables are the real thing — stts carries the frame duration at
``timescale = fps``, stsz the per-frame byte sizes, stsc/stco map
samples to byte ranges in mdat. Deterministic: same frames → same bytes.

Parser (``parse_mp4``): generic box walk (nested containers by name, 64
-bit largesize supported) → (w, h, fps, n_frames, per-sample
(offset, size)) resolved through stsc/stco/stsz exactly as a real
demuxer does — so FRAME SAMPLING SEEKS: decoding frame k touches only
its byte range, never the rest of the stream (the FVID stub had to
inflate the whole zlib stream; this is the "real container keyframe
index" its docstring promised). Non-video or fragmented streams raise
NotImplementedError (honest boundary — pyav on a real cluster).
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpeg as _jpeg

_TIMESCALE_NOTE = "timescale == fps, sample delta == 1"


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


def encode_mp4_mjpeg(frames: np.ndarray, fps: int, quality: int = 97) -> bytes:
    """(n, h, w, 3) uint8 frames → MP4/MJPEG bytes. See module docstring."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    samples = [_jpeg.encode_jpeg(frames[i], quality=quality) for i in range(n)]
    sizes = [len(s) for s in samples]
    payload = b"".join(samples)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", payload)
    # chunk 0's first byte sits right after the mdat header, which begins
    # right after ftyp
    chunk_offset = len(ftyp) + 8
    duration = n  # n samples × delta 1 at timescale == fps

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, duration)  # ctime, mtime, timescale, duration
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)  # ctime, mtime, track 1, rsvd, dur
        + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed-point dims
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data-reference-index
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name (pascal string, zeroed)
        + struct.pack(">Hh", 24, -1),  # depth, color-table-id
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------- parsing


def _walk(data: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to end
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("truncated MP4 box")
        yield tag, body, pos + size
        pos += size


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """Resolve a nested box path; returns (body_start, body_end) or None."""
    tag, *rest = path
    for t, b, e in _walk(data, start, end):
        if t == tag:
            if not rest:
                return b, e
            return _find(data, b, e, rest)
    return None


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {w, h, fps, n_frames, codec, samples: [(off, size)]}.
    Samples resolved through stsc/stco/stsz like a real demuxer."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp)")
    stbl = _find(data, 0, len(data), [b"moov", b"trak", b"mdia", b"minf", b"stbl"])
    if stbl is None:
        if _find(data, 0, len(data), [b"moof"]) is not None:
            raise NotImplementedError("fragmented MP4 (moof) — use pyav")
        raise ValueError("truncated MP4: no sample table")
    sb, se = stbl
    boxes = {t: (b, e) for t, b, e in _walk(data, sb, se)}
    for need in (b"stsd", b"stts", b"stsz", b"stco", b"stsc"):
        if need not in boxes:
            raise ValueError(f"MP4 missing {need.decode()} box")

    # stsd → codec fourcc + dims
    b, e = boxes[b"stsd"]
    entry = next(_walk(data, b + 8, e))
    codec = entry[0].decode("ascii", "replace")
    ew = struct.unpack(">H", data[entry[1] + 24 : entry[1] + 26])[0]
    eh = struct.unpack(">H", data[entry[1] + 26 : entry[1] + 28])[0]

    # mdhd → timescale; stts delta → fps = timescale / delta
    mdhd = _find(data, 0, len(data), [b"moov", b"trak", b"mdia", b"mdhd"])
    version = data[mdhd[0]]
    ts_off = mdhd[0] + (20 if version == 1 else 12)
    (timescale,) = struct.unpack(">I", data[ts_off : ts_off + 4])
    b, e = boxes[b"stts"]
    (n_stts,) = struct.unpack(">I", data[b + 4 : b + 8])
    delta = struct.unpack(">I", data[b + 12 : b + 16])[0] if n_stts else 1
    fps = timescale // max(delta, 1)

    # stsz → sizes
    b, e = boxes[b"stsz"]
    uniform, count = struct.unpack(">II", data[b + 4 : b + 12])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(f">{count}I", data[b + 12 : b + 12 + 4 * count]))

    # stco → chunk offsets
    b, e = boxes[b"stco"]
    (n_chunks,) = struct.unpack(">I", data[b + 4 : b + 8])
    chunk_offs = list(struct.unpack(f">{n_chunks}I", data[b + 8 : b + 8 + 4 * n_chunks]))

    # stsc → samples per chunk (run-length table over chunk ranges)
    b, e = boxes[b"stsc"]
    (n_stsc,) = struct.unpack(">I", data[b + 4 : b + 8])
    stsc_rows = [
        struct.unpack(">III", data[b + 8 + 12 * i : b + 20 + 12 * i])
        for i in range(n_stsc)
    ]
    spc = []  # samples-per-chunk, expanded per chunk
    for i, (first, per, _desc) in enumerate(stsc_rows):
        last = stsc_rows[i + 1][0] - 1 if i + 1 < n_stsc else n_chunks
        spc.extend([per] * (last - first + 1))

    samples: list[tuple[int, int]] = []
    si = 0
    for ci, coff in enumerate(chunk_offs):
        off = coff
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= count:
                break
            samples.append((off, sizes[si]))
            off += sizes[si]
            si += 1
    if si != count:
        raise ValueError(f"MP4 sample map resolved {si} of {count} samples")
    if samples and samples[-1][0] + samples[-1][1] > len(data):
        raise ValueError("truncated MP4: samples extend past EOF")
    return {
        "w": ew, "h": eh, "fps": fps, "n_frames": count,
        "codec": codec, "samples": samples,
    }


def decode_sample(data: bytes, off: int, size: int) -> np.ndarray:
    """One MJPEG sample → RGB8 frame (the real JPEG decoder; O(sample))."""
    return _jpeg.decode_jpeg(data[off : off + size])
