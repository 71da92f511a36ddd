"""Reference (NumPy) intra frame encoder.

This is the sample-exact backbone of the framework: a sequential encoder
that mirrors the validation decoder structure, producing conformant
all-intra HEVC slices. The TPU path (kvazaar_tpu/models/) computes the same
decisions/coefficients batched on device and must match this bit-exactly;
tests assert parity.

Reference parity: kvazaar src/search.c (kvz_search_lcu), search_intra.c
(kvz_search_cu_intra), intra.c, transform.c (kvz_quantize_lcu_residual),
encode_coding_tree.c (kvz_encode_coding_tree). Design differs: no work_tree
copy-up/down; decisions are made per CU in z-order with a functional state.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..cabac import CabacEncoder, ContextSet
from ..hevc.params import PPS, SPS, SliceHeader
from ..ops import reference as ops
from ..syntax.residual import encode_residual
from ..tables import chroma_qp, intra_mode_scan_idx

INTRA = 1


def mode_bits_estimate(mode: int, mpm: list[int]) -> int:
    """Approximate signaling bits for an intra mode (EP-bin count)."""
    if mode == mpm[0]:
        return 2
    if mode in mpm[1:]:
        return 3
    return 6


@dataclass
class FrameMaps:
    """Per-4x4 luma-block state shared by search and syntax writing."""
    width: int
    height: int
    qp: int
    depth: np.ndarray = field(init=False)
    intra_mode: np.ndarray = field(init=False)
    coded: np.ndarray = field(init=False)
    decoded: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        mw, mh = self.width // 4, self.height // 4
        self.depth = np.zeros((mh, mw), dtype=np.int8)
        self.intra_mode = np.full((mh, mw), 1, dtype=np.int8)
        self.coded = np.zeros((mh, mw), dtype=bool)
        self.decoded = np.zeros((mh, mw), dtype=bool)


class IntraFrameEncoder:
    """Encodes one all-intra frame; emits slice data bins via CABAC."""

    def __init__(self, sps: SPS, pps: PPS, sh: SliceHeader,
                 src_y: np.ndarray, src_cb: np.ndarray,
                 src_cr: np.ndarray, cfg=None, decisions=None) -> None:
        self.sps = sps
        self.pps = pps
        self.sh = sh
        self.cfg = cfg
        # device-computed decisions (kvazaar_tpu/models/intra_pipeline.py):
        # dict with modes[R,C], levels_{y,cb,cr}[B,..], rec_{y,cb,cr}; when
        # present, this class only writes syntax (no sample math on host)
        self.decisions = decisions
        ctb = sps.ctb_size
        w = sps.width_in_ctbs * ctb
        h = sps.height_in_ctbs * ctb
        # pad source by edge replication to CTB multiples
        self.src_y = _pad_edge(src_y, h, w)
        self.src_cb = _pad_edge(src_cb, h // 2, w // 2)
        self.src_cr = _pad_edge(src_cr, h // 2, w // 2)
        self.rec_y = np.zeros((h, w), dtype=np.int32)
        self.rec_cb = np.zeros((h // 2, w // 2), dtype=np.int32)
        self.rec_cr = np.zeros((h // 2, w // 2), dtype=np.int32)
        # actual TU-edge maps for in-loop deblocking (intra: BS 2 on every
        # CU/TU edge; TU edges cover CU edges since TU <= CU)
        self.edges_ver = np.zeros((h // 4, w // 8), dtype=bool)
        self.edges_hor = np.zeros((h // 8, w // 4), dtype=bool)
        self.maps = FrameMaps(w, h, sh.qp)
        qp = sh.qp
        self.lambda_ = 0.57 * 2.0 ** ((qp - 12) / 3.0)
        self.sqrt_lambda = self.lambda_ ** 0.5
        self.cab: CabacEncoder | None = None
        self.bit_depth = sps.bit_depth_luma
        self.max_val = (1 << self.bit_depth) - 1

    # -- availability / neighbor helpers (mirror decoder) --------------------

    def _avail(self, x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= self.sps.width or y >= self.sps.height:
            return False
        return bool(self.maps.decoded[y >> 2, x >> 2])

    def _coded_at(self, x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= self.sps.width or y >= self.sps.height:
            return False
        return bool(self.maps.coded[y >> 2, x >> 2])

    def _neighbor_mode(self, x: int, y: int, cur_y: int,
                       is_above: bool) -> int:
        if not self._coded_at(x, y):
            return 1
        if is_above and (y >> self.sps.ctb_log2) != \
                (cur_y >> self.sps.ctb_log2):
            return 1
        return int(self.maps.intra_mode[y >> 2, x >> 2])

    def mpm_list(self, x0: int, y0: int) -> list[int]:
        a = self._neighbor_mode(x0 - 1, y0, y0, False)
        b = self._neighbor_mode(x0, y0 - 1, y0, True)
        if a == b:
            if a < 2:
                return [0, 1, 26]
            return [a, 2 + ((a + 29) % 32), 2 + ((a - 2 + 1) % 32)]
        lst = [a, b]
        if a != 0 and b != 0:
            lst.append(0)
        elif a + b < 2:
            lst.append(26)
        else:
            lst.append(1)
        return lst

    # -- reference construction ----------------------------------------------

    def _build_refs(self, plane: np.ndarray, x: int, y: int, size: int,
                    c_idx: int) -> tuple[np.ndarray, np.ndarray, int]:
        scale = 2 if c_idx else 1
        n2 = 2 * size
        ph, pw = plane.shape
        left = np.zeros(n2, dtype=np.int32)
        top = np.zeros(n2, dtype=np.int32)
        avail_l = np.zeros(n2, dtype=bool)
        avail_t = np.zeros(n2, dtype=bool)
        for i in range(n2):
            yy = y + i
            if x > 0 and yy < ph:
                avail_l[i] = self._avail((x - 1) * scale, yy * scale)
                if avail_l[i]:
                    left[i] = plane[yy, x - 1]
        for i in range(n2):
            xx = x + i
            if y > 0 and xx < pw:
                avail_t[i] = self._avail(xx * scale, (y - 1) * scale)
                if avail_t[i]:
                    top[i] = plane[y - 1, xx]
        avail_c = x > 0 and y > 0 and self._avail((x - 1) * scale,
                                                  (y - 1) * scale)
        corner = int(plane[y - 1, x - 1]) if avail_c else 0
        return ops.intra_ref_substitution(left, top, corner, avail_l,
                                          avail_t, avail_c, self.bit_depth)

    def _predict(self, x: int, y: int, size: int, c_idx: int,
                 mode: int) -> np.ndarray:
        plane = (self.rec_y, self.rec_cb, self.rec_cr)[c_idx]
        scale = 2 if c_idx else 1
        px, py = x // scale, y // scale
        left, top, corner = self._build_refs(plane, px, py, size, c_idx)
        if c_idx == 0:
            left, top, corner = ops.intra_filter_refs(
                left, top, corner, size, mode,
                bool(self.sps.strong_intra_smoothing), self.bit_depth)
        return ops.intra_predict(left, top, corner, size, mode, c_idx > 0,
                                 self.bit_depth)

    # -- search ----------------------------------------------------------------

    def search_mode(self, x0: int, y0: int, size: int) -> int:
        """Pick the luma intra mode for a PU via SATD + mode-bit cost."""
        if self.decisions is not None:
            return int(self.decisions["modes"][y0 // size, x0 // size])
        src = self.src_y[y0:y0 + size, x0:x0 + size].astype(np.int32)
        mpm = self.mpm_list(x0, y0)
        best_mode, best_cost = 0, None
        for mode in range(35):
            pred = self._predict(x0, y0, size, 0, mode)
            cost = ops.satd(src, pred) + \
                self.sqrt_lambda * mode_bits_estimate(mode, mpm)
            if best_cost is None or cost < best_cost:
                best_cost, best_mode = cost, mode
        return best_mode

    # -- transform/recon --------------------------------------------------------

    def code_tu(self, x: int, y: int, size: int, c_idx: int,
                mode: int) -> tuple[np.ndarray | None, np.ndarray]:
        """Predict+transform one TU. Returns (coeff levels or None, recon)."""
        if self.decisions is not None:
            d = self.decisions
            cols = d["modes"].shape[1]
            lsz = size * (2 if c_idx else 1)  # luma block size of this TU
            b = (y // lsz) * cols + (x // lsz)
            levels = d[("levels_y", "levels_cb", "levels_cr")[c_idx]][b]
            scale = 2 if c_idx else 1
            plane = d[("rec_y", "rec_cb", "rec_cr")[c_idx]]
            px, py = x // scale, y // scale
            rec = plane[py:py + size, px:px + size]
            return (levels if levels.any() else None), rec
        plane_src = (self.src_y, self.src_cb, self.src_cr)[c_idx]
        scale = 2 if c_idx else 1
        px, py = x // scale, y // scale
        pred = self._predict(x, y, size, c_idx, mode)
        src = plane_src[py:py + size, px:px + size].astype(np.int32)
        resi = src - pred
        is_dst = (c_idx == 0 and size == 4)
        coeffs = ops.forward_transform(resi, is_dst, self.bit_depth)
        qp = self.sh.qp
        if c_idx:
            qp = chroma_qp(qp, self.pps.cb_qp_offset if c_idx == 1
                           else self.pps.cr_qp_offset)
        levels = ops.quantize(coeffs, qp, True, self.bit_depth)
        if self.pps.sign_data_hiding_enabled:
            levels = _sdh_fix(levels, mode, c_idx, size)
        if not levels.any():
            rec = np.clip(pred, 0, self.max_val)
            return None, rec
        deq = ops.dequantize(levels, qp, self.bit_depth)
        r2 = ops.inverse_transform(deq, is_dst, self.bit_depth)
        rec = np.clip(pred + r2, 0, self.max_val)
        return levels, rec

    def _store_rec(self, x: int, y: int, c_idx: int,
                   rec: np.ndarray) -> None:
        plane = (self.rec_y, self.rec_cb, self.rec_cr)[c_idx]
        scale = 2 if c_idx else 1
        px, py = x // scale, y // scale
        size = rec.shape[0]
        plane[py:py + size, px:px + size] = rec
        if c_idx == 0:
            self.maps.decoded[y >> 2:(y + size) >> 2,
                              x >> 2:(x + size) >> 2] = True

    # -- syntax writing -----------------------------------------------------------

    def encode_ctu(self, ctu_x: int, ctu_y: int) -> None:
        x0 = ctu_x * self.sps.ctb_size
        y0 = ctu_y * self.sps.ctb_size
        if getattr(self, "sao_w", None) is not None:
            self.sao_w.write(self.cab, ctu_y, ctu_x, ctu_x > 0, ctu_y > 0)
        self.coding_quadtree(x0, y0, self.sps.ctb_log2, 0)

    def _cu_depth_for(self, x0: int, y0: int, log2_size: int,
                      depth: int) -> bool:
        """Split decision. v0: split down to the configured CU size."""
        target = getattr(self.cfg, "cu_log2", 4) if self.cfg else 4
        return log2_size > max(target, self.sps.log2_min_cb_size)

    def coding_quadtree(self, x0: int, y0: int, log2_size: int,
                        depth: int) -> None:
        sps = self.sps
        size = 1 << log2_size
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        if inside and log2_size > sps.log2_min_cb_size:
            split = self._cu_depth_for(x0, y0, log2_size, depth)
            ctx_off = 0
            if self._coded_at(x0 - 1, y0) and \
                    self.maps.depth[y0 >> 2, (x0 - 1) >> 2] > depth:
                ctx_off += 1
            if self._coded_at(x0, y0 - 1) and \
                    self.maps.depth[(y0 - 1) >> 2, x0 >> 2] > depth:
                ctx_off += 1
            self.cab.encode_bin(ContextSet.idx("split_cu_flag", ctx_off),
                                1 if split else 0)
        else:
            split = log2_size > sps.log2_min_cb_size
        if split:
            half = size >> 1
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                if x0 + dx < sps.width and y0 + dy < sps.height:
                    self.coding_quadtree(x0 + dx, y0 + dy, log2_size - 1,
                                         depth + 1)
            return
        self.maps.depth[y0 >> 2:(y0 + size) >> 2,
                        x0 >> 2:(x0 + size) >> 2] = depth
        self.coding_unit(x0, y0, log2_size)

    def coding_unit(self, x0: int, y0: int, log2_size: int) -> None:
        size = 1 << log2_size
        cab = self.cab
        # v0: always 2Nx2N
        part_nxn = False
        if log2_size == self.sps.log2_min_cb_size:
            cab.encode_bin(ContextSet.idx("part_mode", 0), 1)
        mode = self.search_mode(x0, y0, size)
        mpm = self.mpm_list(x0, y0)
        if mode in mpm:
            cab.encode_bin(ContextSet.idx("prev_intra_luma_pred_flag", 0), 1)
            idx = mpm.index(mode)
            if idx == 0:
                cab.encode_bin_ep(0)
            else:
                cab.encode_bin_ep(1)
                cab.encode_bin_ep(idx - 1)
        else:
            cab.encode_bin(ContextSet.idx("prev_intra_luma_pred_flag", 0), 0)
            rem = mode
            for cand in sorted(mpm, reverse=True):
                if rem > cand:
                    rem -= 1
            cab.encode_bins_ep(rem, 5)
        self.maps.intra_mode[y0 >> 2:(y0 + size) >> 2,
                             x0 >> 2:(x0 + size) >> 2] = mode
        self.maps.coded[y0 >> 2:(y0 + size) >> 2,
                        x0 >> 2:(x0 + size) >> 2] = True
        # chroma: derived mode
        chroma_mode = mode
        cab.encode_bin(ContextSet.idx("intra_chroma_pred_mode", 0), 0)
        self.transform_tree(x0, y0, log2_size, 0, mode, chroma_mode)

    def transform_tree(self, x0: int, y0: int, log2_size: int, depth: int,
                       mode: int, chroma_mode: int,
                       parent_cbf_cb: int = 1, parent_cbf_cr: int = 1,
                       blk_idx: int = 0, x_base: int = 0,
                       y_base: int = 0) -> None:
        sps = self.sps
        cab = self.cab
        max_tb = sps.log2_min_tb_size + sps.log2_diff_max_min_tb_size
        force_split = log2_size > max_tb
        # v0: TU == CU (no RQT search); only forced splits
        if force_split:
            # split_transform_flag is inferred (log2 > max_tb): no bin
            half = 1 << (log2_size - 1)
            # chroma cbfs of the parent level
            # (coded at each level while log2 > 2)
            cbf_cb, cbf_cr = self._chroma_cbfs_probe(x0, y0, log2_size,
                                                     chroma_mode)
            if depth == 0 or parent_cbf_cb:
                cab.encode_bin(ContextSet.idx("cbf_chroma", depth), cbf_cb)
            if depth == 0 or parent_cbf_cr:
                cab.encode_bin(ContextSet.idx("cbf_chroma", depth), cbf_cr)
            for i, (dx, dy) in enumerate(((0, 0), (half, 0), (0, half),
                                          (half, half))):
                self.transform_tree(x0 + dx, y0 + dy, log2_size - 1,
                                    depth + 1, mode, chroma_mode,
                                    cbf_cb, cbf_cr, i, x0, y0)
            return
        if sps.log2_min_tb_size < log2_size <= max_tb and \
                depth < sps.max_transform_hierarchy_depth_intra:
            # we never split voluntarily in v0
            cab.encode_bin(
                ContextSet.idx("split_transform_flag", 5 - log2_size), 0)
        self.transform_unit(x0, y0, log2_size, depth, mode, chroma_mode,
                            parent_cbf_cb, parent_cbf_cr)

    def _chroma_cbfs_probe(self, x0: int, y0: int, log2_size: int,
                           chroma_mode: int) -> tuple[int, int]:
        """For forced-split parents we must code chroma cbf before the
        children are processed. With TU==CU and chroma at half size, the
        chroma TUs live at the child level, so probe whether any child
        chroma TU has coefficients. Chroma recon order still happens at
        the leaves, so this probe must not mutate state; we conservatively
        code cbf=1 and let leaf-level cbfs refine (spec allows cbf_cb=1 at
        parent with all-zero children at the leaf level)."""
        return 1, 1

    def transform_unit(self, x0: int, y0: int, log2_size: int, depth: int,
                       mode: int, chroma_mode: int, parent_cbf_cb: int,
                       parent_cbf_cr: int) -> None:
        size = 1 << log2_size
        cab = self.cab
        sdh = bool(self.pps.sign_data_hiding_enabled)
        if x0 > 0:
            self.edges_ver[y0 >> 2:(y0 + size) >> 2, x0 >> 3] = True
        if y0 > 0:
            self.edges_hor[y0 >> 3, x0 >> 2:(x0 + size) >> 2] = True
        # chroma TUs at this leaf (log2 > 2 always in v0 since CU >= 16)
        c_log2 = log2_size - 1
        levels_cb, rec_cb = self.code_tu(x0, y0, size >> 1, 1, chroma_mode)
        levels_cr, rec_cr = self.code_tu(x0, y0, size >> 1, 2, chroma_mode)
        cbf_cb = 1 if levels_cb is not None else 0
        cbf_cr = 1 if levels_cr is not None else 0
        if log2_size > 2:
            if depth == 0 or parent_cbf_cb:
                cab.encode_bin(ContextSet.idx("cbf_chroma", depth), cbf_cb)
            if depth == 0 or parent_cbf_cr:
                cab.encode_bin(ContextSet.idx("cbf_chroma", depth), cbf_cr)
        # luma
        levels_y, rec_y = self.code_tu(x0, y0, size, 0, mode)
        cbf_luma = 1 if levels_y is not None else 0
        cab.encode_bin(ContextSet.idx("cbf_luma", 1 if depth == 0 else 0),
                       cbf_luma)
        if cbf_luma:
            scan = intra_mode_scan_idx(mode, log2_size, False)
            encode_residual(cab, levels_y, log2_size, 0, scan, sdh)
        self._store_rec(x0, y0, 0, rec_y)
        if cbf_cb:
            scan = intra_mode_scan_idx(chroma_mode, c_log2, True)
            encode_residual(cab, levels_cb, c_log2, 1, scan, sdh)
        self._store_rec(x0, y0, 1, rec_cb)
        if cbf_cr:
            scan = intra_mode_scan_idx(chroma_mode, c_log2, True)
            encode_residual(cab, levels_cr, c_log2, 2, scan, sdh)
        self._store_rec(x0, y0, 2, rec_cr)


def _pad_edge(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = plane.shape
    if ph == h and pw == w:
        return plane.astype(np.int32)
    out = np.empty((h, w), dtype=np.int32)
    out[:ph, :pw] = plane
    out[:ph, pw:] = plane[:, -1:]
    out[ph:, :] = out[ph - 1:ph, :]
    return out


def _sdh_fix(levels: np.ndarray, mode: int, c_idx: int,
             size: int) -> np.ndarray:
    """Adjust levels so sign-data-hiding parity matches the hidden sign."""
    from ..tables import get_scan
    import math
    log2_size = int(math.log2(size))
    scan_idx = intra_mode_scan_idx(mode, log2_size, c_idx > 0)
    scan = get_scan(scan_idx, log2_size)
    flat = levels[scan[:, 1], scan[:, 0]].copy()
    for cg in range((size * size) // 16):
        seg = flat[cg * 16:(cg + 1) * 16]
        nz = np.nonzero(seg)[0]
        if len(nz) == 0 or nz[-1] - nz[0] <= 3:
            continue
        total = int(np.abs(seg).sum())
        sign = 1 if seg[nz[0]] < 0 else 0
        if (total & 1) != sign:
            p = nz[-1]
            if abs(seg[p]) > 1:
                seg[p] -= np.sign(seg[p])
            else:
                seg[p] += np.sign(seg[p])
        flat[cg * 16:(cg + 1) * 16] = seg
    out = np.zeros_like(levels)
    out[scan[:, 1], scan[:, 0]] = flat
    return out
