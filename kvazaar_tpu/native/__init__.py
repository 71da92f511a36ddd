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
    _GEN = os.path.join(_DIR, "gen_tables.py")
    if (not os.path.exists(_SO) or not os.path.exists(_HDR)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            or os.path.getmtime(_SO) < os.path.getmtime(_GEN)):
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
    p32 = ctypes.POINTER(ctypes.c_int32)
    lib.kvz_tpu_sparse_unpack.restype = None
    lib.kvz_tpu_sparse_unpack.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int64, p32]
    lib.kvz_tpu_encode_md_slice.restype = ctypes.c_int64
    lib.kvz_tpu_encode_md_slice.argtypes = [
        p32, p32, p32, p32, p32, p32,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, p32, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    lib.kvz_tpu_encode_md_slice_pb.restype = ctypes.c_int64
    lib.kvz_tpu_encode_md_slice_pb.argtypes = [
        ctypes.POINTER(KvzPbParams)]
    _lib = lib
    return lib


_p32 = ctypes.POINTER(ctypes.c_int32)
_p64 = ctypes.POINTER(ctypes.c_int64)
_pu8 = ctypes.POINTER(ctypes.c_uint8)


class KvzPbParams(ctypes.Structure):
    """Mirror of KvzPbParams in entropy.cc (field order matters)."""
    _fields_ = (
        [(n, ctypes.c_int32) for n in
         ("h", "w", "qp", "init_type", "wpp", "sdh", "slice_type",
          "sao_cmax", "max_merge", "n_ref0", "n_ref1", "n_union",
          "n_act0", "n_act1", "tmvp_enabled", "collocated_from_l0",
          "no_backward")]
        + [("poc", ctypes.c_int64), ("col_poc", ctypes.c_int64)]
        + [(n, _p32) for n in ("size8", "mode8", "ly", "lcb", "lcr",
                               "sao")]
        + [("inter8", _pu8)]
        + [(n, _p32) for n in ("mv8", "ref8", "dir8", "mv8b", "ref8b")]
        + [(n, _p64) for n in ("ref_pocs0", "ref_pocs1", "union_pocs")]
        + [("col_mv", _p32), ("col_refpoc", _p64)]
        + [("out_mv4", _p32), ("out_refpoc4", _p64)]
        + [("out", _pu8), ("out_cap", ctypes.c_int64),
           ("entry_sizes", _p64)]
    )


# test hook: force the pure-Python writer path even when the native
# library builds (used to assert bit-identical native/Python streams)
_FORCE_OFF = False


def available() -> bool:
    if _FORCE_OFF:
        return False
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


def encode_md_slice_pb(decisions: dict, sh, ref_entries, poc: int,
                       wpp: bool, sdh: bool = False,
                       ref_entries_l1=(), union_pocs=None,
                       sao_packed=None, sao_cmax: int = 7,
                       max_merge: int = 5):
    """Encode quadtree P/B slice data in C++ (the
    engine/md_inter_writer.py hot path). Returns
    (bytes, entry_sizes, mv4 [r4,c4,2,2], refpoc4 [r4,c4,2]) — the
    motion field is what api.py snapshots for TMVP."""
    lib = get_lib()
    h, w = decisions["levels_y"].shape
    r4, c4 = h >> 2, w >> 2
    p = KvzPbParams()
    keep = []  # keep numpy owners alive until the call returns

    def arr(a, dt):
        a = np.ascontiguousarray(a, dtype=dt)
        keep.append(a)
        return a

    def p32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    def pu8(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    is_b = sh.slice_type == 0
    p.h, p.w, p.qp = h, w, sh.qp
    p.init_type = 2 - sh.slice_type
    p.wpp = 1 if wpp else 0
    p.sdh = 1 if sdh else 0
    p.slice_type = sh.slice_type
    p.sao_cmax = sao_cmax
    p.max_merge = max_merge
    p.size8 = p32(arr(decisions["size_map8"], np.int32))
    p.mode8 = p32(arr(decisions["mode_map8"], np.int32))
    p.ly = p32(arr(decisions["levels_y"], np.int32))
    p.lcb = p32(arr(decisions["levels_cb"], np.int32))
    p.lcr = p32(arr(decisions["levels_cr"], np.int32))
    if sao_packed is not None:
        p.sao = p32(arr(sao_packed, np.int32))
    p.inter8 = pu8(arr(decisions["inter8"], np.uint8))
    p.mv8 = p32(arr(decisions["mv8"], np.int32))
    p.ref8 = p32(arr(decisions["ref8"], np.int32))
    if "dir8" in decisions:
        p.dir8 = p32(arr(decisions["dir8"], np.int32))
        p.mv8b = p32(arr(decisions["mv8b"], np.int32))
        p.ref8b = p32(arr(decisions["ref8b"], np.int32))
    pocs0 = [e["poc"] for e in ref_entries]
    pocs1 = [e["poc"] for e in ref_entries_l1]
    p.n_ref0, p.n_ref1 = len(pocs0), len(pocs1)
    up = list(union_pocs) if union_pocs is not None else list(pocs0)
    p.n_union = len(up)
    p.ref_pocs0 = p64(arr(pocs0 or [0], np.int64))
    p.ref_pocs1 = p64(arr(pocs1 or [0], np.int64))
    p.union_pocs = p64(arr(up or [0], np.int64))
    p.n_act0 = sh.num_ref_idx_l0_active_minus1 + 1
    p.n_act1 = sh.num_ref_idx_l1_active_minus1 + 1
    p.poc = poc
    # collocated picture, exactly as PSliceWriter.__init__ derives it
    all_entries = list(ref_entries) + list(ref_entries_l1)
    p.no_backward = 1 if all(e["poc"] <= poc for e in all_entries) else 0
    p.tmvp_enabled = 1 if (sh.temporal_mvp_enabled and ref_entries) else 0
    p.collocated_from_l0 = 1 if sh.collocated_from_l0 else 0
    if p.tmvp_enabled:
        col_l = (ref_entries
                 if sh.collocated_from_l0 or not ref_entries_l1
                 else ref_entries_l1)
        col = col_l[min(sh.collocated_ref_idx, len(col_l) - 1)]
        p.col_poc = col["poc"]
        p.col_mv = p32(arr(col["mv"], np.int32))
        p.col_refpoc = p64(arr(col["ref_poc"], np.int64))
    out_mv4 = np.zeros((r4, c4, 2, 2), np.int32)
    out_refpoc4 = np.zeros((r4, c4, 2), np.int64)
    p.out_mv4 = p32(out_mv4)
    p.out_refpoc4 = p64(out_refpoc4)
    cap = max(1 << 22, h * w * 4)
    out = np.empty(cap, dtype=np.uint8)
    entries = np.zeros(max(1, h >> 6), dtype=np.int64)
    p.out = pu8(out)
    p.out_cap = cap
    p.entry_sizes = p64(entries)
    n = lib.kvz_tpu_encode_md_slice_pb(ctypes.byref(p))
    if n < 0:
        raise RuntimeError("entropy buffer overflow")
    sizes = entries.tolist() if wpp else [int(n)]
    return bytes(out[:n]), [int(s) for s in sizes], out_mv4, out_refpoc4


def sparse_unpack(mask_u8: np.ndarray, vals: np.ndarray,
                  shape: tuple) -> np.ndarray:
    """Rebuild an int32 level plane from the device sparse pack (C++)."""
    lib = get_lib()
    n = int(np.prod(shape))
    out = np.empty(n, np.int32)
    mask_u8 = np.ascontiguousarray(mask_u8, np.uint8)
    vals = np.ascontiguousarray(vals, np.int16)
    lib.kvz_tpu_sparse_unpack(
        mask_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out.reshape(shape)


def pack_sao(d: dict) -> "np.ndarray | None":
    """Pack per-CTB SAO decision tensors into the [R, C, 19] int32 layout
    the native writer's SaoRec expects (see entropy.cc)."""
    if "sao_y_typ" not in d:
        return None
    rows, cols = np.asarray(d["sao_y_typ"]).shape
    rec = np.zeros((rows, cols, 19), np.int32)
    rec[:, :, 0] = d["sao_y_typ"]
    rec[:, :, 1] = d["sao_y_cls"]
    rec[:, :, 2] = d["sao_y_pos"]
    rec[:, :, 3:7] = np.moveaxis(np.asarray(d["sao_y_offs"]), 0, -1)
    rec[:, :, 7] = d["sao_c_typ"]
    rec[:, :, 8] = d["sao_c_cls"]
    rec[:, :, 9] = d["sao_c_pos_cb"]
    rec[:, :, 10:14] = np.moveaxis(np.asarray(d["sao_c_offs_cb"]), 0, -1)
    rec[:, :, 14] = d["sao_c_pos_cr"]
    rec[:, :, 15:19] = np.moveaxis(np.asarray(d["sao_c_offs_cr"]), 0, -1)
    return rec


def encode_md_slice(size8: np.ndarray, mode8: np.ndarray,
                    levels_y: np.ndarray, levels_cb: np.ndarray,
                    levels_cr: np.ndarray, qp: int, wpp: bool,
                    sdh: bool = False, sao_packed=None,
                    bit_depth: int = 8,
                    mode4=None) -> tuple[bytes, list[int]]:
    """Encode quadtree (CTB-64) intra slice data.
    Returns (bytes, entry_sizes)."""
    lib = get_lib()
    h, w = levels_y.shape
    size8 = np.ascontiguousarray(size8, dtype=np.int32)
    mode8 = np.ascontiguousarray(mode8, dtype=np.int32)
    ly = np.ascontiguousarray(levels_y, dtype=np.int32)
    lcb = np.ascontiguousarray(levels_cb, dtype=np.int32)
    lcr = np.ascontiguousarray(levels_cr, dtype=np.int32)
    cap = max(1 << 22, ly.size * 4)
    out = np.empty(cap, dtype=np.uint8)
    entries = np.zeros(h >> 6, dtype=np.int64)
    p = ctypes.POINTER(ctypes.c_int32)
    sao_ptr = None
    if sao_packed is not None:
        sao_packed = np.ascontiguousarray(sao_packed, dtype=np.int32)
        sao_ptr = sao_packed.ctypes.data_as(p)
    cmax = (1 << (min(bit_depth, 10) - 5)) - 1
    mode4_ptr = None
    if mode4 is not None:
        mode4 = np.ascontiguousarray(mode4, dtype=np.int32)
        mode4_ptr = mode4.ctypes.data_as(p)
    n = lib.kvz_tpu_encode_md_slice(
        size8.ctypes.data_as(p), mode8.ctypes.data_as(p), mode4_ptr,
        ly.ctypes.data_as(p), lcb.ctypes.data_as(p), lcr.ctypes.data_as(p),
        h, w, qp, 1 if wpp else 0, 1 if sdh else 0,
        sao_ptr, cmax,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        entries.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if n < 0:
        raise RuntimeError("entropy buffer overflow")
    sizes = entries.tolist() if wpp else [int(n)]
    return bytes(out[:n]), [int(s) for s in sizes]
