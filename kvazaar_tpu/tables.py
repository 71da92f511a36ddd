"""HEVC normative constant tables (ITU-T H.265).

These are the standard tables from the HEVC specification — CABAC LPS ranges
and state transitions (spec 9.3.4.3), context initialization values (spec
Tables 9-5..9-32), integer transform bases (spec 8.6.4), quantization scales
(spec 8.6.3), intra angle tables (spec 8.4.4.2.6) and coefficient scan orders
(spec 6.5.3).

Reference parity: kvazaar keeps its copies in src/tables.c, src/cabac.c and
src/context.c; ours are written from the specification and validated by
decoding reference bitstreams (tests/test_decoder_oracle.py).
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# CABAC engine tables (spec 9.3.4.3.2)
# ---------------------------------------------------------------------------

# rangeTabLPS[pState][ (ivlCurrRange >> 6) & 3 ]
LPS_TABLE = np.array([
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9],
    [2, 2, 2, 2],
], dtype=np.int32)

# transIdxLPS[pState] — next state after coding an LPS
TRANS_LPS = np.array([
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
], dtype=np.int32)

# transIdxMPS[pState] — next state after coding an MPS
TRANS_MPS = np.array(
    [min(i + 1, 62) for i in range(63)] + [63], dtype=np.int32)

# Number of leading zero bits of (LPS range >> 3): renormalization shift count.
RENORM_TABLE = np.array([
    6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
], dtype=np.int32)

# Fractional-bit cost of coding the (MPS?) bin in a given state, in 1/32768
# bit units (HM's entropy-bits table, used for RD cost estimation).
# ENTROPY_BITS[state ^ bin_matches_mps] gives the cost.
# Computed analytically: bits(state, isMPS) = -log2(P(state, isMPS)), with the
# standard HEVC state probabilities p_lps(s) = 0.5 * alpha**s,
# alpha = (0.01875/0.5)**(1/63).
_alpha = (0.01875 / 0.5) ** (1.0 / 63.0)
_p_lps = 0.5 * _alpha ** np.arange(64)
ENTROPY_BITS = np.empty(128, dtype=np.int32)
ENTROPY_BITS[0::2] = np.round(-np.log2(1.0 - _p_lps) * 32768).astype(np.int32)
ENTROPY_BITS[1::2] = np.round(-np.log2(_p_lps) * 32768).astype(np.int32)
ENTROPY_BITS_EP = 32768  # one bit


def context_init_state(init_value: int, qp: int) -> tuple[int, int]:
    """Derive (pState, valMps) from an 8-bit init value (spec 9.3.2.2)."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(max(1, ((slope * min(max(0, qp), 51)) >> 4) + offset), 126)
    if pre <= 63:
        return 63 - pre, 0
    return pre - 64, 1


# ---------------------------------------------------------------------------
# Context model initialization values (spec tables 9-5..9-32).
#
# Layout: each entry maps a context family name to a (3, N) table indexed by
# initType (0 for I slices; 1/2 for P/B per cabac_init_flag) then context idx.
# ---------------------------------------------------------------------------

CNU = 154  # "context not used" placeholder

CONTEXT_INIT = {
    # initType rows: [I, P, B]
    "sao_merge_flag": [[153], [153], [153]],
    "sao_type_idx": [[200], [185], [160]],
    "split_cu_flag": [[139, 141, 157], [107, 139, 126], [107, 139, 126]],
    "cu_transquant_bypass_flag": [[154], [154], [154]],
    "cu_skip_flag": [[CNU, CNU, CNU], [197, 185, 201], [197, 185, 201]],
    "pred_mode_flag": [[CNU], [149], [134]],
    "part_mode": [[184, CNU, CNU, CNU], [154, 139, 154, 154],
                  [154, 139, 154, 154]],
    "prev_intra_luma_pred_flag": [[184], [154], [183]],
    "intra_chroma_pred_mode": [[63], [152], [152]],
    "rqt_root_cbf": [[CNU], [79], [79]],
    "merge_flag": [[CNU], [110], [154]],
    "merge_idx": [[CNU], [122], [137]],
    "inter_pred_idc": [[CNU] * 5, [95, 79, 63, 31, 31], [95, 79, 63, 31, 31]],
    "ref_idx": [[CNU, CNU], [153, 153], [153, 153]],
    "mvd": [[CNU, CNU], [140, 198], [169, 198]],
    "mvp_flag": [[CNU], [168], [168]],
    "split_transform_flag": [[153, 138, 138], [124, 138, 94], [224, 167, 122]],
    # cbf_luma: 2 contexts (trafo depth == 0 / > 0)
    "cbf_luma": [[111, 141], [153, 111], [153, 111]],
    # cbf_cb/cr: 4+1 contexts (trafo depth)
    "cbf_chroma": [[94, 138, 182, 154, 154], [149, 107, 167, 154, 154],
                   [149, 92, 167, 154, 154]],
    "cu_qp_delta_abs": [[154, 154, 154], [154, 154, 154], [154, 154, 154]],
    "chroma_qp_offset_flag": [[154], [154], [154]],
    "chroma_qp_offset_idx": [[154], [154], [154]],
    # last_sig_coeff_{x,y}_prefix: 18 contexts each (15 luma + 3 chroma used;
    # stored as 15 luma then 3 chroma)
    "last_sig_x": [
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63],
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94,
         108, 123, 108],
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
         79, 108, 123, 93]],
    "last_sig_y": [
        [110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111,
         79, 108, 123, 63],
        [125, 110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94,
         108, 123, 108],
        [125, 110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111,
         79, 108, 123, 93]],
    # coded_sub_block_flag: 2 luma + 2 chroma
    "coded_sub_block_flag": [[91, 171, 134, 141], [121, 140, 61, 154],
                             [121, 140, 61, 154]],
    # sig_coeff_flag: 27 luma + 15 chroma = 42
    "sig_coeff_flag": [
        [111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141, 179, 153,
         125, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140,
         139, 182, 182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111],
        [155, 154, 139, 153, 139, 123, 123, 63, 153, 166, 183, 140, 136, 153,
         154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
         153, 123, 123, 107, 121, 107, 121, 167, 151, 183, 140, 151, 183, 140],
        [170, 154, 139, 153, 139, 123, 123, 63, 124, 166, 183, 140, 136, 153,
         154, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 170,
         153, 138, 138, 122, 121, 122, 121, 167, 151, 183, 140, 151, 183,
         140]],
    # coeff_abs_level_greater1_flag: 16 luma + 8 chroma
    "coeff_abs_level_greater1_flag": [
        [140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107,
         122, 152, 140, 179, 166, 182, 140, 227, 122, 197],
        [154, 196, 196, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 137, 169, 194, 166, 167, 154, 167, 137, 182],
        [154, 196, 167, 167, 154, 152, 167, 182, 182, 134, 149, 136, 153, 121,
         136, 122, 169, 208, 166, 167, 154, 152, 167, 182]],
    # coeff_abs_level_greater2_flag: 4 luma + 2 chroma
    "coeff_abs_level_greater2_flag": [
        [138, 153, 136, 167, 152, 152], [107, 167, 91, 122, 107, 167],
        [107, 167, 91, 107, 107, 167]],
    "transform_skip_flag": [[139, 139], [139, 139], [139, 139]],
    "end_of_slice_segment_flag": None,  # terminate bin, no context
}

# ---------------------------------------------------------------------------
# Coefficient scan orders (spec 6.5.3) — generated.
# ---------------------------------------------------------------------------

SCAN_DIAG, SCAN_HOR, SCAN_VER = 0, 1, 2


def _diag_scan(size: int) -> np.ndarray:
    """Up-right diagonal scan positions (x, y) for a size x size block."""
    pos = []
    x = y = 0
    while len(pos) < size * size:
        while y >= 0:
            if x < size and y < size:
                pos.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
        if y >= size:
            x = y - (size - 1)
            y = size - 1
    return np.array(pos, dtype=np.int32)


def _hor_scan(size: int) -> np.ndarray:
    return np.array([(x, y) for y in range(size) for x in range(size)],
                    dtype=np.int32)


def _ver_scan(size: int) -> np.ndarray:
    return np.array([(x, y) for x in range(size) for y in range(size)],
                    dtype=np.int32)


def scanpos_map(n: int) -> np.ndarray:
    """[n, n] map (indexed [y, x]) of each coefficient's position in the
    diagonal scan — used by the search-time rate features (scan span)."""
    xy = scan_order(SCAN_DIAG, int(np.log2(n)))
    m = np.empty((n, n), np.int32)
    m[xy[:, 1], xy[:, 0]] = np.arange(n * n, dtype=np.int32)
    return m


def scan_order(scan_idx: int, log2_size: int) -> np.ndarray:
    """Scan as (N*N, 2) array of (x, y), scanning order for coefficients.

    For blocks larger than 4x4 the scan is hierarchical: the same scan
    pattern orders 4x4 sub-blocks, and orders coefficients inside each
    sub-block.
    """
    size = 1 << log2_size
    if scan_idx == SCAN_HOR:
        base = _hor_scan
    elif scan_idx == SCAN_VER:
        base = _ver_scan
    else:
        base = _diag_scan
    if log2_size <= 2:
        return base(size)
    nsb = size >> 2
    sub = base(nsb)
    inner = base(4)
    out = np.empty((size * size, 2), dtype=np.int32)
    i = 0
    for sx, sy in sub:
        out[i:i + 16, 0] = sx * 4 + inner[:, 0]
        out[i:i + 16, 1] = sy * 4 + inner[:, 1]
        i += 16
    return out


_SCAN_CACHE: dict[tuple[int, int], np.ndarray] = {}


def get_scan(scan_idx: int, log2_size: int) -> np.ndarray:
    key = (scan_idx, log2_size)
    if key not in _SCAN_CACHE:
        _SCAN_CACHE[key] = scan_order(scan_idx, log2_size)
    return _SCAN_CACHE[key]


_CG_SCAN_CACHE: dict[tuple[int, int], np.ndarray] = {}


def get_cg_scan(scan_idx: int, log2_size: int) -> np.ndarray:
    """Plain (non-hierarchical) scan of the 4x4 coefficient-group grid."""
    if log2_size <= 2:
        return np.zeros((1, 2), dtype=np.int32)
    key = (scan_idx, log2_size)
    if key not in _CG_SCAN_CACHE:
        nsb = 1 << (log2_size - 2)
        base = {SCAN_HOR: _hor_scan, SCAN_VER: _ver_scan}.get(
            scan_idx, _diag_scan)
        _CG_SCAN_CACHE[key] = base(nsb)
    return _CG_SCAN_CACHE[key]


# sig_coeff_flag context map for 4x4 TUs (spec 9.3.4.2.5)
SIG_CTX_MAP_4X4 = np.array(
    [0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8], dtype=np.int32)


def intra_mode_scan_idx(pred_mode: int, log2_size: int, is_chroma: bool) -> int:
    """Mode-dependent coefficient scan for intra blocks (spec 7.4.9.11)."""
    if log2_size == 2 or (log2_size == 3 and not is_chroma):
        if 6 <= pred_mode <= 14:
            return SCAN_VER
        if 22 <= pred_mode <= 30:
            return SCAN_HOR
    return SCAN_DIAG


# ---------------------------------------------------------------------------
# Integer transforms (spec 8.6.4)
# ---------------------------------------------------------------------------

DCT4 = np.array([
    [64, 64, 64, 64],
    [83, 36, -36, -83],
    [64, -64, -64, 64],
    [36, -83, 83, -36]], dtype=np.int32)

DST4 = np.array([
    [29, 55, 74, 84],
    [74, 74, 0, -74],
    [84, -29, -74, 55],
    [55, -84, 74, -29]], dtype=np.int32)

DCT8 = np.array([
    [64, 64, 64, 64, 64, 64, 64, 64],
    [89, 75, 50, 18, -18, -50, -75, -89],
    [83, 36, -36, -83, -83, -36, 36, 83],
    [75, -18, -89, -50, 50, 89, 18, -75],
    [64, -64, -64, 64, 64, -64, -64, 64],
    [50, -89, 18, 75, -75, -18, 89, -50],
    [36, -83, 83, -36, -36, 83, -83, 36],
    [18, -50, 75, -89, 89, -75, 50, -18]], dtype=np.int32)


def _expand_dct(half: np.ndarray) -> np.ndarray:
    """Build 2N-point HEVC DCT from the N-point one (even rows) plus the
    normative odd basis."""
    n = half.shape[0] * 2
    out = np.zeros((n, n), dtype=np.int32)
    # Even rows: c2N[2i][j] = cN[i][j] for j < N, mirrored for j >= N
    # (cos((2(2N-1-j)+1)*2i*pi/(4N)) = cos(2*pi*i - (2j+1)*i*pi/(2N)))
    for i in range(n // 2):
        out[2 * i, :n // 2] = half[i]
        out[2 * i, n // 2:] = half[i][::-1]
    # Odd rows: integer cos approximations, odd-antisymmetric
    odd16 = [90, 87, 80, 70, 57, 43, 25, 9]
    odd32 = [90, 90, 88, 85, 82, 78, 73, 67, 61, 54, 46, 38, 31, 22, 13, 4]
    first = odd16 if n == 16 else odd32
    # Row 1 of the n-point matrix is `first`, then odd rows are generated by
    # the cosine recurrence: row (2k+1), col j = sign*first[perm]
    for k in range(n // 2):
        i = 2 * k + 1
        for j in range(n // 2):
            arg = ((2 * j + 1) * i) % (4 * n)
            # cos(arg*pi/(2n)) with arg odd; magnitude index m: arg -> m where
            # first[m] ~ 64*sqrt2*cos((2m+1)pi/(2n))
            a = arg
            sign = 1
            if a >= 2 * n:
                a = 4 * n - a
            if a > n:
                a = 2 * n - a
                sign = -1
            m = (a - 1) // 2
            out[i, j] = sign * first[m]
        out[i, n // 2:] = -out[i, :n // 2][::-1]
    return out


DCT16 = _expand_dct(DCT8)
DCT32 = _expand_dct(DCT16)

DCT_MATRICES = {4: DCT4, 8: DCT8, 16: DCT16, 32: DCT32}

# ---------------------------------------------------------------------------
# Quantization (spec 8.6.3; forward scales per HM)
# ---------------------------------------------------------------------------

QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16384, 14564],
                        dtype=np.int64)
INV_QUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], dtype=np.int64)

# Chroma QP mapping (spec Table 8-10), 4:2:0
CHROMA_QP_TABLE = np.array(
    list(range(30)) + [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37]
    + [38] * 14, dtype=np.int32)


def chroma_qp(qp_y: int, offset: int = 0) -> int:
    q = min(max(qp_y + offset, 0), 57)
    if q < 30:
        return q
    if q > 43:
        return q - 6
    return int(CHROMA_QP_TABLE[q])


# ---------------------------------------------------------------------------
# Intra prediction angles (spec 8.4.4.2.6)
# ---------------------------------------------------------------------------

# intraPredAngle for modes 2..34
INTRA_PRED_ANGLE = np.array([
    32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26, -32,
    -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32],
    dtype=np.int32)

# invAngle for modes 11..25 (negative angles), indexed by |angle|
INV_ANGLE = {2: 4096, 5: 1638, 9: 910, 13: 630, 17: 482, 21: 390, 26: 315,
             32: 256}


def intra_pred_angle(mode: int) -> int:
    return int(INTRA_PRED_ANGLE[mode - 2])


def intra_inv_angle(mode: int) -> int:
    return INV_ANGLE[abs(intra_pred_angle(mode))]
