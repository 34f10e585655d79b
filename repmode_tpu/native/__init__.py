"""ctypes loader for the native host-ops library (builds on first use).

Graceful degradation: if g++ or the build is unavailable, `lib()` returns
None and callers fall back to the numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_SRC = os.path.join(os.path.dirname(__file__), "patchops.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "libpatchops.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library; returns its path or None."""
    if os.path.exists(_OUT) and not force:
        if not force and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
            return _OUT
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", _SRC, "-o", _OUT,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _OUT
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        try:
            cdll = ctypes.CDLL(path)
        except OSError:
            return None
        cdll.crop_flip_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),  # signals
            ctypes.POINTER(ctypes.c_void_p),  # targets
            ctypes.POINTER(ctypes.c_int64),   # shapes
            ctypes.POINTER(ctypes.c_int64),   # starts
            ctypes.POINTER(ctypes.c_uint8),   # flips
            ctypes.c_void_p,                  # out_signal
            ctypes.c_void_p,                  # out_target
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
        ]
        cdll.crop_flip_batch.restype = None
        cdll.lzw_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        cdll.lzw_decode.restype = ctypes.c_int64
        _lib = cdll
        return _lib


def crop_flip_batch(volumes, starts, flips, patch_size, nthreads=0):
    """Assemble (signal, target) patch batches natively.

    volumes: list of (signal_f32_c_contig, target_f32_c_contig_or_None).
    starts: (n,3) int64; flips: (n,3) uint8; patch_size: (pd,ph,pw).
    Returns (signal_batch, target_batch) float32 or None if lib unavailable.
    """
    import numpy as np

    l = lib()
    if l is None:
        return None
    n = len(volumes)
    pd, ph, pw = (int(p) for p in patch_size)
    sig_ptrs = (ctypes.c_void_p * n)()
    tgt_ptrs = (ctypes.c_void_p * n)()
    shapes = np.empty((n, 3), np.int64)
    for i, (s, t) in enumerate(volumes):
        assert s.dtype == np.float32 and s.flags.c_contiguous
        sig_ptrs[i] = s.ctypes.data
        tgt_ptrs[i] = t.ctypes.data if t is not None else None
        shapes[i] = s.shape
    starts = np.ascontiguousarray(starts, np.int64)
    flips = np.ascontiguousarray(flips, np.uint8)
    out_s = np.empty((n, pd, ph, pw), np.float32)
    out_t = np.empty((n, pd, ph, pw), np.float32)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    l.crop_flip_batch(
        sig_ptrs, tgt_ptrs,
        shapes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_s.ctypes.data, out_t.ctypes.data,
        n, pd, ph, pw, nthreads,
    )
    return out_s, out_t


def lzw_decode(data: bytes, expected_size: int):
    """Decode TIFF-variant LZW; returns bytes or None if lib unavailable."""
    import numpy as np

    l = lib()
    if l is None:
        return None
    out = np.empty(expected_size, np.uint8)
    n = l.lzw_decode(data, len(data), out.ctypes.data, expected_size)
    if n < 0:
        raise ValueError("malformed LZW stream")
    return out[:n].tobytes()
