"""Native (C++) entropy coder binding.

Builds `libkvz_tpu_entropy.so` on demand with g++ and exposes
`encode_intra_grid` via ctypes. The tables header is generated from the
validated Python tables at build time (single source of truth).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libkvz_tpu_entropy.so")
_SRC = os.path.join(_DIR, "entropy.cc")
_HDR = os.path.join(_DIR, "tables.h")

_lib = None


def _build() -> None:
    from .gen_tables import generate
    generate(_HDR)
    subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-o", _SO, _SRC], check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            or not os.path.exists(_HDR)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.kvz_tpu_encode_intra_grid.restype = ctypes.c_int64
    lib.kvz_tpu_encode_intra_grid.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def encode_intra_grid(modes: np.ndarray, levels_y: np.ndarray,
                      levels_cb: np.ndarray, levels_cr: np.ndarray,
                      qp: int, wpp: bool,
                      sdh: bool = False) -> tuple[bytes, list[int]]:
    """Encode slice data for the 16x16 grid. Returns (bytes, entry_sizes)."""
    lib = get_lib()
    rows, cols = modes.shape
    modes = np.ascontiguousarray(modes, dtype=np.int32)
    ly = np.ascontiguousarray(levels_y, dtype=np.int32)
    lcb = np.ascontiguousarray(levels_cb, dtype=np.int32)
    lcr = np.ascontiguousarray(levels_cr, dtype=np.int32)
    cap = 1 << 24
    out = np.empty(cap, dtype=np.uint8)
    entries = np.zeros(rows, dtype=np.int64)
    p = ctypes.POINTER(ctypes.c_int32)
    n = lib.kvz_tpu_encode_intra_grid(
        modes.ctypes.data_as(p), ly.ctypes.data_as(p),
        lcb.ctypes.data_as(p), lcr.ctypes.data_as(p),
        rows, cols, qp, 1 if wpp else 0, 1 if sdh else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        entries.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        raise RuntimeError("entropy buffer overflow")
    sizes = entries.tolist() if wpp else [int(n)]
    return bytes(out[:n]), [int(s) for s in sizes]
