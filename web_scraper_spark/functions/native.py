"""On-demand C kernel build + ctypes load for the JPEG entropy decoder.

The per-symbol Huffman chain is the one part of the codec that cannot be
vectorized (each symbol's bit length depends on decoding the previous
one), so it is the throughput floor of the numpy codec. Where the host
has a system C compiler — standard on cluster images — we compile the
~100-line kernel (`_jpeg_kernel.c`) once per machine and call it via
ctypes; hosts without a compiler transparently fall back to the pure
Python loop in functions/jpeg.py (tests pin the two paths equal).

Build artifacts live next to the source under ``_native/`` keyed by the
source hash, so editing the .c file rebuilds and stale .so files are
never loaded. The build is protected by an atomic-rename publish (the
compile writes to a unique tmp name, then os.replace), so concurrent
Spark python workers on one host race benignly. Everything here is
stdlib-only; nothing is downloaded.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import uuid

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "_jpeg_kernel.c")

_loaded: tuple | None = None  # (sentinel, fn|None) — build attempted once


def _build(src: str, out: str) -> bool:
    for cc in ("cc", "gcc", "clang"):
        tmp = out + f".{uuid.uuid4().hex}.tmp"
        try:
            r = subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp, src],
                capture_output=True,
                timeout=120,
            )
        except (OSError, subprocess.TimeoutExpired):
            continue
        if r.returncode == 0 and os.path.exists(tmp):
            os.replace(tmp, out)  # atomic publish
            return True
        if os.path.exists(tmp):
            os.remove(tmp)
    return False


def jpeg_decode_kernel():
    """The ctypes ``decode_scan_segment`` function, or None when no C
    compiler is available (callers fall back to the Python loop)."""
    global _loaded
    if _loaded is not None:
        return _loaded[1]
    fn = None
    try:
        with open(_SRC, "rb") as f:
            src_bytes = f.read()
        tag = hashlib.sha256(src_bytes).hexdigest()[:16]
        build_dir = os.path.join(_DIR, "_native")
        os.makedirs(build_dir, exist_ok=True)
        so = os.path.join(build_dir, f"jpeg_kernel_{tag}.so")
        if os.path.exists(so) or _build(_SRC, so):
            lib = ctypes.CDLL(so)
            f_ = lib.decode_scan_segment
            u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            i16 = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
            i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
            f_.argtypes = [
                u8, ctypes.c_int64,          # data, nbits
                u8, i16,                      # dc_len, dc_sym
                u8, i16,                      # ac_len, ac_sym
                i32, i32, i64,                # slot_tab, slot_comp, slot_dst
                ctypes.c_int64,               # n_slots
                i32,                          # coef_out
            ]
            f_.restype = ctypes.c_int
            fn = f_
    except Exception:
        fn = None  # any build/load surprise → Python fallback
    _loaded = (True, fn)
    return fn
