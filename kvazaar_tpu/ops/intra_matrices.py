"""Constant matrices that express HEVC intra prediction as one matmul.

For a block of size N, build G[mode] of shape (N*N, 2*(4N+2)) with integer
weights such that

    pred[mode].flat = (G[mode] @ refs + 16) >> 5        (planar/angular)

where refs = concat(unfiltered, filtered) reference vector, each half laid
out as [left top->bottom (2N), corner, top left->right (2N), pad].
Every angular mode is a 2-tap interpolation with a single final shift, and
planar is a 4-tap weighted sum with shift log2(N)+1 — both fold exactly
into integer weight matrices with a common >>5 by pre-scaling. DC and the
mode 10/26/DC edge filters have nested integer shifts and are handled
separately (they are cheap elementwise ops).

This is the TPU-native replacement for kvazaar's per-mode angular kernels
(src/strategies/avx2/intra-avx2.c): one MXU matmul evaluates all 33 angular
modes + planar for every PU of a frame in a single launch.

Reference parity: prediction math per spec 8.4.4.2.4/8.4.4.2.6, identical
to ops/reference.py (tests assert exact equality).
"""
from __future__ import annotations

import numpy as np

from ..tables import intra_pred_angle, intra_inv_angle

# ref vector layout (one half):
#   [0 .. 2N-1]   : left, top -> bottom
#   [2N]          : corner
#   [2N+1 .. 4N]  : top, left -> right
#   [4N+1]        : zero pad (weights referencing it are 0)


def ref_vec_len(n: int) -> int:
    return 4 * n + 2


def _ref_index_left(n: int, i: int) -> int:
    return i


def _ref_index_corner(n: int) -> int:
    return 2 * n


def _ref_index_top(n: int, i: int) -> int:
    return 2 * n + 1 + i


def filter_flags(n: int, strong_ok: bool = False) -> np.ndarray:
    """Which of modes 0..34 use [1 2 1]-filtered refs for luma size n
    (spec 8.4.4.2.3). DC (1) never; 4x4 never."""
    flags = np.zeros(35, dtype=bool)
    if n == 4:
        return flags
    thresh = {8: 7, 16: 1, 32: 0}.get(n, 8)
    for mode in range(35):
        if mode == 1:
            continue
        if mode == 0:
            flags[mode] = True
            continue
        dist = min(abs(mode - 26), abs(mode - 10))
        flags[mode] = dist > thresh
    return flags


def build_pred_matrices(n: int, chroma: bool = False) -> np.ndarray:
    """G of shape (35, N*N, 2*(4N+2)) int32. Mode 1 (DC) row is zero —
    computed separately. The >>5 convention: planar weights are pre-scaled
    by 32 >> (log2n+1) so that (w@refs + 16) >> 5 reproduces
    (sum + N) >> (log2n+1) exactly (both exact since the scale factor is a
    power of two >= 1 for n <= 16; for n == 32 the planar shift is 6 > 5,
    so we scale the OTHER way: see below)."""
    log2n = int(np.log2(n))
    rlen = ref_vec_len(n)
    g = np.zeros((35, n * n, 2 * rlen), dtype=np.int64)
    use_filt = np.zeros(35, dtype=bool) if chroma else filter_flags(n)

    def base(mode):
        return rlen if use_filt[mode] else 0

    # ---- planar (mode 0) ----
    # pred = ((n-1-x)*L[y] + (x+1)*T[n] + (n-1-y)*T[x] + (y+1)*L[n] + n)
    #        >> (log2n + 1)
    b = base(0)
    planar_shift = log2n + 1
    if planar_shift <= 5:
        # (v + n) >> planar_shift == (s*v + 16) >> 5 with
        # s = 2^(5 - planar_shift), since s*n = 2^(4) = 16 exactly.
        s = 1 << (5 - planar_shift)
        for y in range(n):
            for x in range(n):
                row = y * n + x
                g[0, row, b + _ref_index_left(n, y)] += s * (n - 1 - x)
                g[0, row, b + _ref_index_top(n, n)] += s * (x + 1)
                g[0, row, b + _ref_index_top(n, x)] += s * (n - 1 - y)
                g[0, row, b + _ref_index_left(n, n)] += s * (y + 1)
    # n == 32 (planar_shift 6): not foldable into the >>5 convention;
    # the pipeline uses a dedicated planar path for 32x32.

    # ---- angular modes 2..34 ----
    for mode in range(2, 35):
        angle = intra_pred_angle(mode)
        b = base(mode)
        if mode >= 18:
            # vertical-ish; main ref from top, extension from left
            def main_idx(k):  # ref[n + k] in reference.py terms
                if k >= 1:
                    return _ref_index_top(n, k - 1)
                if k == 0:
                    return _ref_index_corner(n)
                inv = intra_inv_angle(mode)
                j = (((-k) * inv + 128) >> 8) - 1
                return _ref_index_left(n, j)
            for y in range(n):
                idx = ((y + 1) * angle) >> 5
                fact = ((y + 1) * angle) & 31
                for x in range(n):
                    row = y * n + x
                    k0 = x + idx + 1
                    if k0 > 2 * n:
                        k0 = 2 * n
                    k1 = min(k0 + 1, 2 * n)
                    g[mode, row, b + main_idx(k0)] += 32 - fact
                    g[mode, row, b + main_idx(k1)] += fact
        else:
            # horizontal-ish; main ref from left, extension from top
            def main_idx(k):
                if k >= 1:
                    return _ref_index_left(n, k - 1)
                if k == 0:
                    return _ref_index_corner(n)
                inv = intra_inv_angle(mode)
                j = (((-k) * inv + 128) >> 8) - 1
                return _ref_index_top(n, j)
            for x in range(n):
                idx = ((x + 1) * angle) >> 5
                fact = ((x + 1) * angle) & 31
                for y in range(n):
                    row = y * n + x
                    k0 = y + idx + 1
                    if k0 > 2 * n:
                        k0 = 2 * n
                    k1 = min(k0 + 1, 2 * n)
                    g[mode, row, b + main_idx(k0)] += 32 - fact
                    g[mode, row, b + main_idx(k1)] += fact
    return g.astype(np.int32)


def build_filter_matrix(n: int) -> np.ndarray:
    """F of shape (4N+2, 4N+2): filtered = (F @ refs + 2) >> 2 (the [1 2 1]
    smoothing, spec 8.4.4.2.3). Endpoints left[2N-1] / top[2N-1] are copied
    (weight 4)."""
    rlen = ref_vec_len(n)
    f = np.zeros((rlen, rlen), dtype=np.int32)
    li = [_ref_index_left(n, i) for i in range(2 * n)]
    ti = [_ref_index_top(n, i) for i in range(2 * n)]
    c = _ref_index_corner(n)
    # corner' = (left[0] + 2*corner + top[0] + 2) >> 2
    f[c, li[0]] = 1
    f[c, c] = 2
    f[c, ti[0]] = 1
    for i in range(2 * n):
        if i == 2 * n - 1:
            f[li[i], li[i]] = 4
            f[ti[i], ti[i]] = 4
            continue
        prev_l = c if i == 0 else li[i - 1]
        f[li[i], prev_l] = 1
        f[li[i], li[i]] = 2
        f[li[i], li[i + 1]] = 1
        prev_t = c if i == 0 else ti[i - 1]
        f[ti[i], prev_t] = 1
        f[ti[i], ti[i]] = 2
        f[ti[i], ti[i + 1]] = 1
    f[rlen - 1, rlen - 1] = 4  # pad slot
    return f
