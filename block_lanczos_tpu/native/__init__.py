"""ctypes loader for the native host-side helper library.

Builds lazily with the system C compiler on first use; all callers have pure
NumPy fallbacks, so a missing toolchain only costs performance.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "blanczos_native.c")
_SO = os.path.join(_DIR, "libblanczos_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # Compile to a temp file in the same directory, then os.rename over the
    # target: atomic on POSIX, so a concurrent process can never CDLL a
    # partially written .so (mirrors checkpoint._atomic_write).
    tmp = f"{_SO}.build.{os.getpid()}.tmp"
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                os.rename(tmp, _SO)
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    return False


def get_lib():
    """Return the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.xoshiro_fill_mod.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64]
        lib.xoshiro_fill_mod.restype = None
        lib.xoshiro_fill_mod64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64]
        lib.xoshiro_fill_mod64.restype = None
        lib.parse_triplets_mod.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64]
        lib.parse_triplets_mod.restype = ctypes.c_int64
        lib.coo_to_csr.argtypes = [
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint32)]
        lib.coo_to_csr.restype = None
        lib.format_u64_lines.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_char_p]
        lib.format_u64_lines.restype = ctypes.c_int64
        lib.parse_triplets_mod64.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64]
        lib.parse_triplets_mod64.restype = ctypes.c_int64
        _lib = lib
        return _lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def xoshiro_fill_mod(state: np.ndarray, prime: int, count: int):
    """Native xoshiro256+ fill; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, np.uint32)
    lib.xoshiro_fill_mod(_ptr(state, ctypes.c_uint64), prime,
                         _ptr(out, ctypes.c_uint32), count)
    return out


def format_u64_lines(vals: np.ndarray):
    """Format uint64 values one-per-line; returns bytes or None."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, np.uint64)
    out = ctypes.create_string_buffer(len(vals) * 21)
    n = lib.format_u64_lines(_ptr(vals, ctypes.c_uint64), len(vals), out)
    return out.raw[:n]


def xoshiro_fill_mod64(state: np.ndarray, prime: int, count: int):
    """Native wide-prime fill; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, np.uint64)
    lib.xoshiro_fill_mod64(_ptr(state, ctypes.c_uint64), prime,
                           _ptr(out, ctypes.c_uint64), count)
    return out


def parse_triplets_mod(buf: bytes, nnz: int, prime: int):
    lib = get_lib()
    if lib is None:
        return None
    mi = np.empty(nnz, np.int32)
    mj = np.empty(nnz, np.int32)
    mx = np.empty(nnz, np.uint32)
    got = lib.parse_triplets_mod(buf, len(buf), nnz,
                                 _ptr(mi, ctypes.c_int32),
                                 _ptr(mj, ctypes.c_int32),
                                 _ptr(mx, ctypes.c_uint32), prime)
    if got != nnz:
        raise ValueError(f"parse error: expected {nnz} triplets, got {got}")
    return mi, mj, mx


def parse_triplets_mod64(buf: bytes, nnz: int, prime: int):
    """Wide-prime triplet parser (uint64 residues); None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    mi = np.empty(nnz, np.int32)
    mj = np.empty(nnz, np.int32)
    mx = np.empty(nnz, np.uint64)
    got = lib.parse_triplets_mod64(buf, len(buf), nnz,
                                   _ptr(mi, ctypes.c_int32),
                                   _ptr(mj, ctypes.c_int32),
                                   _ptr(mx, ctypes.c_uint64), prime)
    if got != nnz:
        raise ValueError(f"parse error: expected {nnz} triplets, got {got}")
    return mi, mj, mx


def coo_to_csr(nrows: int, mi, mj, mx):
    lib = get_lib()
    if lib is None:
        return None
    nnz = len(mi)
    mi = np.ascontiguousarray(mi, np.int32)
    mj = np.ascontiguousarray(mj, np.int32)
    mx = np.ascontiguousarray(mx, np.uint32)
    rowptr = np.empty(nrows + 1, np.int64)
    cols = np.empty(nnz, np.int32)
    vals = np.empty(nnz, np.uint32)
    lib.coo_to_csr(nnz, nrows, _ptr(mi, ctypes.c_int32),
                   _ptr(mj, ctypes.c_int32), _ptr(mx, ctypes.c_uint32),
                   _ptr(rowptr, ctypes.c_int64), _ptr(cols, ctypes.c_int32),
                   _ptr(vals, ctypes.c_uint32))
    return rowptr, cols, vals
