"""ctypes bridge to the native C++ data path (native/figbird_native.cpp).

Auto-builds the shared library on first use when a compiler is available;
callers fall back to the numpy implementations when it is not.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libfigbird_native.so"
_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.fb_count_fastq.restype = ctypes.c_int64
    lib.fb_count_fastq.argtypes = [ctypes.c_char_p]
    lib.fb_scan_fastq.restype = ctypes.c_int64
    lib.fb_scan_fastq.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.fb_parse_fastq.restype = ctypes.c_int64
    lib.fb_parse_fastq.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.fb_build_kmer_table.restype = ctypes.c_int64
    lib.fb_build_kmer_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.fb_revcomp_batch.restype = None
    lib.fb_revcomp_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
    _lib = lib
    return _lib


def native_read_fastq(path: str, max_len: int | None = None):
    """Fast path for io.fastq.read_fastq; returns ReadBatch or None."""
    lib = get_lib()
    if lib is None:
        return None
    from .fastq import ReadBatch

    p = str(path).encode()
    ml = ctypes.c_int32(0)
    n = lib.fb_scan_fastq(p, ctypes.byref(ml))
    if n < 0:
        return None
    if max_len is None:
        max_len = max(int(ml.value), 1)
    seq = np.full((n, max_len), 4, np.int8)
    lens = np.zeros(n, np.int32)
    qual = np.zeros((n, max_len), np.uint8)
    got = lib.fb_parse_fastq(p, n, max_len,
                             seq.ctypes.data, lens.ctypes.data, qual.ctypes.data)
    if got < 0:
        return None
    return ReadBatch(seq[:got], lens[:got], qual[:got])


def native_kmer_table(flat: np.ndarray, k: int):
    """Fast path for align.index build; returns (codes, pos) int32 or None."""
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat, np.int8)
    m = lib.fb_build_kmer_table(flat.ctypes.data, len(flat), k, None, None)
    codes = np.zeros(m, np.int32)
    pos = np.zeros(m, np.int32)
    got = lib.fb_build_kmer_table(flat.ctypes.data, len(flat), k,
                                  codes.ctypes.data, pos.ctypes.data)
    if got != m:
        return None
    return codes, pos
