"""HEVC deblocking filter (spec 8.7.2), NumPy reference.

Whole-picture formulation: the vertical-edge pass runs over every 8-aligned
column edge (segments are independent — adjacent edges are 8 apart and the
filter reach is 4), then the horizontal pass runs on the vertically-filtered
picture. Intra prediction uses unfiltered reconstruction, so the filter is
applied once per frame after reconstruction — this replaces the reference's
LCU-lagged scheme (kvazaar src/filter.c, DEBLOCK_DELAY_PX) with a batched
full-frame pass that produces identical output.

This module is the scalar oracle; the JAX version (deblock_jax) must match
it bit-exactly. All-intra: boundary strength is 2 on every CU/TU edge.
"""
from __future__ import annotations

import numpy as np

# spec tables (8.7.2.5.3)
BETA_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
     26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
     58, 60, 62, 64], dtype=np.int32)
TC_TABLE = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3,
     3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
     18, 20, 22, 24], dtype=np.int32)


def _clip3(lo, hi, v):
    return np.minimum(np.maximum(v, lo), hi)


def _filter_luma_edge_cols(rec: np.ndarray, x: int, ys: np.ndarray,
                           beta: int, tc: int, bit_depth: int) -> None:
    """Filter the vertical luma edge at column x for the 4-row segments
    starting at rows `ys` (all with the same beta/tc)."""
    if tc == 0 or len(ys) == 0:
        return
    # p side: columns x-4..x-1 ; q side: x..x+3
    seg = np.arange(4)
    rows = ys[:, None] + seg[None, :]  # [S, 4]
    p = rec[rows[:, :, None], x - 1 - np.arange(4)[None, None, :]]  # [S,4,4]
    q = rec[rows[:, :, None], x + np.arange(4)[None, None, :]]
    p0, p1, p2, p3 = (p[:, :, i].astype(np.int64) for i in range(4))
    q0, q1, q2, q3 = (q[:, :, i].astype(np.int64) for i in range(4))

    dp0 = np.abs(p2[:, 0] - 2 * p1[:, 0] + p0[:, 0])
    dp3 = np.abs(p2[:, 3] - 2 * p1[:, 3] + p0[:, 3])
    dq0 = np.abs(q2[:, 0] - 2 * q1[:, 0] + q0[:, 0])
    dq3 = np.abs(q2[:, 3] - 2 * q1[:, 3] + q0[:, 3])
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    dp = dp0 + dp3
    dq = dq0 + dq3
    d = dpq0 + dpq3
    filter_on = d < beta  # [S]

    # strong/weak decision per segment (lines 0 and 3)
    def strong_line(i):
        return ((2 * (np.abs(p2[:, i] - 2 * p1[:, i] + p0[:, i])
                      + np.abs(q2[:, i] - 2 * q1[:, i] + q0[:, i]))
                 < (beta >> 2))
                & ((np.abs(p3[:, i] - p0[:, i])
                    + np.abs(q0[:, i] - q3[:, i])) < (beta >> 3))
                & (np.abs(p0[:, i] - q0[:, i]) < ((tc * 5 + 1) >> 1)))
    strong = strong_line(0) & strong_line(3) & filter_on

    max_val = (1 << bit_depth) - 1
    # strong filter
    sp0 = _clip3(p0 - 2 * tc, p0 + 2 * tc,
                 (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = _clip3(p1 - 2 * tc, p1 + 2 * tc, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = _clip3(p2 - 2 * tc, p2 + 2 * tc,
                 (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = _clip3(q0 - 2 * tc, q0 + 2 * tc,
                 (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3)
    sq1 = _clip3(q1 - 2 * tc, q1 + 2 * tc, (q2 + q1 + q0 + p0 + 2) >> 2)
    sq2 = _clip3(q2 - 2 * tc, q2 + 2 * tc,
                 (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3)

    # weak filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = (np.abs(delta) < tc * 10) & filter_on[:, None] & ~strong[:, None]
    delta = _clip3(-tc, tc, delta)
    wp0 = _clip3(0, max_val, p0 + delta)
    wq0 = _clip3(0, max_val, q0 - delta)
    side_p = (dp < ((beta + (beta >> 1)) >> 3))[:, None]
    side_q = (dq < ((beta + (beta >> 1)) >> 3))[:, None]
    dp1 = _clip3(-(tc >> 1), tc >> 1,
                 (((p2 + p0 + 1) >> 1) - p1 + delta) >> 1)
    wp1 = _clip3(0, max_val, p1 + dp1)
    dq1 = _clip3(-(tc >> 1), tc >> 1,
                 (((q2 + q0 + 1) >> 1) - q1 - delta) >> 1)
    wq1 = _clip3(0, max_val, q1 + dq1)

    sm = strong[:, None]
    out_p0 = np.where(sm, sp0, np.where(weak_on, wp0, p0))
    out_p1 = np.where(sm, sp1, np.where(weak_on & side_p, wp1, p1))
    out_p2 = np.where(sm, sp2, p2)
    out_q0 = np.where(sm, sq0, np.where(weak_on, wq0, q0))
    out_q1 = np.where(sm, sq1, np.where(weak_on & side_q, wq1, q1))
    out_q2 = np.where(sm, sq2, q2)

    rec[rows, x - 1] = np.clip(out_p0, 0, max_val)
    rec[rows, x - 2] = np.clip(out_p1, 0, max_val)
    rec[rows, x - 3] = np.clip(out_p2, 0, max_val)
    rec[rows, x] = np.clip(out_q0, 0, max_val)
    rec[rows, x + 1] = np.clip(out_q1, 0, max_val)
    rec[rows, x + 2] = np.clip(out_q2, 0, max_val)


def _filter_chroma_edge_cols(rec: np.ndarray, x: int, ys: np.ndarray,
                             tc: int, bit_depth: int) -> None:
    if tc == 0 or len(ys) == 0:
        return
    seg = np.arange(4)
    rows = ys[:, None] + seg[None, :]
    p0 = rec[rows, x - 1].astype(np.int64)
    p1 = rec[rows, x - 2].astype(np.int64)
    q0 = rec[rows, x].astype(np.int64)
    q1 = rec[rows, x + 1].astype(np.int64)
    delta = _clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
    max_val = (1 << bit_depth) - 1
    rec[rows, x - 1] = np.clip(p0 + delta, 0, max_val)
    rec[rows, x] = np.clip(q0 - delta, 0, max_val)


def deblock_plane(rec: np.ndarray, edges_ver: np.ndarray,
                  edges_hor: np.ndarray, qp: int, beta_off: int, tc_off: int,
                  is_chroma: bool, chroma_qp_val: int | None = None,
                  bit_depth: int = 8) -> np.ndarray:
    """Deblock one plane in place (returns it).

    edges_ver: bool [H/4, W/8] — vertical edges (luma grid: per 8-aligned
      column, per 4-row segment). For chroma the plane grid is [H_c/4, W_c/8]
      with edges at 8-aligned chroma columns.
    edges_hor: bool [H/8, W/4] analogous for horizontal edges.
    """
    rec = rec.astype(np.int32, copy=False)
    h, w = rec.shape
    q = chroma_qp_val if is_chroma else qp
    bs = 2  # all-intra
    if is_chroma:
        tc_idx = int(np.clip(q + 2 * (bs - 1) + (tc_off << 1), 0, 53))
        tc = int(TC_TABLE[tc_idx]) << (bit_depth - 8)
        for xe in range(1, w // 8):
            x = xe * 8
            ys = np.nonzero(edges_ver[:, xe])[0] * 4
            _filter_chroma_edge_cols(rec, x, ys, tc, bit_depth)
        rec_t = np.ascontiguousarray(rec.T)
        for ye in range(1, h // 8):
            y = ye * 8
            xs = np.nonzero(edges_hor[ye, :])[0] * 4
            _filter_chroma_edge_cols(rec_t, y, xs, tc, bit_depth)
        rec[:] = rec_t.T
        return rec
    beta_idx = int(np.clip(qp + (beta_off << 1), 0, 51))
    beta = int(BETA_TABLE[beta_idx]) << (bit_depth - 8)
    tc_idx = int(np.clip(qp + 2 * (bs - 1) + (tc_off << 1), 0, 53))
    tc = int(TC_TABLE[tc_idx]) << (bit_depth - 8)
    for xe in range(1, w // 8):
        x = xe * 8
        ys = np.nonzero(edges_ver[:, xe])[0] * 4
        _filter_luma_edge_cols(rec, x, ys, beta, tc, bit_depth)
    rec_t = np.ascontiguousarray(rec.T)
    for ye in range(1, h // 8):
        y = ye * 8
        xs = np.nonzero(edges_hor[ye, :])[0] * 4
        _filter_luma_edge_cols(rec_t, y, xs, beta, tc, bit_depth)
    rec[:] = rec_t.T
    return rec
