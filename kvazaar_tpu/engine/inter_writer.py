"""P-slice syntax writer for the fixed 16x16 grid.

Consumes device-computed decisions (per-block inter/intra flag, integer MV,
intra mode, quantized levels, reconstruction) and emits the CABAC slice
data. Candidate derivation (merge/AMVP) reuses the validation decoder's
implementation on a shared frame-state, which guarantees encoder/decoder
symmetry by construction: whatever the writer signals, the decoder derives
the identical motion.

Reference parity: kvazaar src/encode_coding_tree.c (inter PU syntax at
:311, MVD at :1062) and src/search_inter.c's merge handling — here the
decision between skip/merge/AMVP is made at write time from the final MV.
"""
from __future__ import annotations

import numpy as np

from ..cabac import CabacEncoder, ContextSet
from ..decoder.decoder import INTER, INTRA, SliceDecoder, _FrameState
from ..syntax.residual import encode_residual
from ..tables import intra_mode_scan_idx

N = 16
NO_REF = SliceDecoder.NO_REF


class PSliceWriter:
    """Writes one P or B slice over the 16x16 CTU grid.

    For B slices (sh.slice_type == 0) the device decisions carry a single
    MV per block plus an index into the union reference stack
    (`union_pocs`, L0-first); the writer maps each union index back to its
    list (past POCs live in L0, future in L1) and emits inter_pred_idc /
    per-list ref_idx / MVD / mvp accordingly."""

    def __init__(self, sps, pps, sh, decisions, ref_entries, poc,
                 ref_entries_l1=(), union_pocs=None) -> None:
        if isinstance(ref_entries, dict):  # single-reference callers
            ref_entries = [ref_entries]
        self.sps = sps
        self.pps = pps
        self.sh = sh
        self.d = decisions
        self.fs = _FrameState(sps, pps, sh)
        helper = SliceDecoder(self.fs, None)
        helper.poc = poc
        helper.ref_list = list(ref_entries)
        helper.ref_list1 = list(ref_entries_l1)
        # TMVP: collocated picture exactly as the decoder derives it
        # (decoder.py make_sd) — entries must carry the motion field
        # ("mv"/"ref_poc" maps) the encoder snapshots after each frame
        helper.no_backward = all(
            e["poc"] <= poc for e in helper.ref_list + helper.ref_list1)
        if sh.temporal_mvp_enabled and helper.ref_list:
            col_l = (helper.ref_list
                     if sh.collocated_from_l0 or not helper.ref_list1
                     else helper.ref_list1)
            helper.col_pic = col_l[min(sh.collocated_ref_idx,
                                       len(col_l) - 1)]
        else:
            helper.col_pic = None
        self.helper = helper
        self.ref_pocs = [e["poc"] for e in ref_entries]
        self.ref_pocs_l1 = [e["poc"] for e in ref_entries_l1]
        self.union_pocs = (list(union_pocs) if union_pocs is not None
                           else list(self.ref_pocs))
        self.is_b = sh.slice_type == 0
        self.n_ref = len(self.ref_pocs)
        self.cab: CabacEncoder | None = None
        self.cols = (decisions["modes"].shape[1]
                     if "modes" in decisions else None)

    # -- helpers ---------------------------------------------------------------

    def _motion_of(self, r: int, c: int):
        """Returns (motion, ridx2): the decoder-shaped motion tuple and
        the per-list ref indices (-1 for an unused list). Decisions carry
        either a single MV + union ref index (P / uni-only B) or per-list
        slots + inter_dir (bi-capable B)."""
        mv = np.zeros((2, 2), np.int32)
        if "inter_dir" in self.d:
            idir = int(self.d["inter_dir"][r, c])
            flags = (idir != 2, idir != 1)
            pocs = [NO_REF, NO_REF]
            ridx2 = [-1, -1]
            lists = (self.ref_pocs, self.ref_pocs_l1)
            for lx in (0, 1):
                if not flags[lx]:
                    continue
                ridx2[lx] = min(int(self.d["ref2"][r, c, lx]),
                                len(lists[lx]) - 1)
                pocs[lx] = lists[lx][ridx2[lx]]
                mv[lx] = self.d["mv2"][r, c, lx]
            return ((flags, mv, tuple(pocs)), ridx2)
        k = 0
        if "ref_idx" in self.d:
            k = min(int(self.d["ref_idx"][r, c]), len(self.union_pocs) - 1)
        poc = self.union_pocs[k]
        if poc in self.ref_pocs:
            lx, ridx = 0, self.ref_pocs.index(poc)
        else:
            lx, ridx = 1, self.ref_pocs_l1.index(poc)
        mv[lx] = self.d["mv"][r, c]  # already qpel
        pocs = (poc, NO_REF) if lx == 0 else (NO_REF, poc)
        ridx2 = [ridx, -1] if lx == 0 else [-1, ridx]
        return (((lx == 0, lx == 1), mv, pocs), ridx2)

    def _block_levels(self, r, c):
        b = r * self.cols + c
        ly = self.d["levels_y"][b]
        lcb = self.d["levels_cb"][b]
        lcr = self.d["levels_cr"][b]
        return ly, lcb, lcr

    # -- writing ---------------------------------------------------------------

    def write_ctu(self, r: int, c: int) -> None:
        cab = self.cab
        x0, y0 = c * N, r * N
        if getattr(self, "sao_w", None) is not None:
            self.sao_w.write(cab, r, c, c > 0, r > 0)
        # split_cu_flag = 0 (16 > min CB 8)
        ctx_off = 0
        h = self.helper
        if h._coded(x0 - 1, y0) and self.fs.depth[y0 >> 2, (x0 - 1) >> 2] > 0:
            ctx_off += 1
        if h._coded(x0, y0 - 1) and self.fs.depth[(y0 - 1) >> 2, x0 >> 2] > 0:
            ctx_off += 1
        cab.encode_bin(ContextSet.idx("split_cu_flag", ctx_off), 0)
        if self.d["is_inter"][r, c]:
            self._write_inter_cu(r, c, x0, y0)
        else:
            self._write_intra_cu(r, c, x0, y0)

    def _skip_ctx(self, x0, y0):
        ctx = 0
        h = self.helper
        if h._coded(x0 - 1, y0) and self.fs.skip[y0 >> 2, (x0 - 1) >> 2]:
            ctx += 1
        if h._coded(x0, y0 - 1) and self.fs.skip[(y0 - 1) >> 2, x0 >> 2]:
            ctx += 1
        return ctx

    def _write_merge_idx(self, idx: int, max_merge: int) -> None:
        cab = self.cab
        if max_merge <= 1:
            return
        cab.encode_bin(ContextSet.idx("merge_idx", 0), 1 if idx > 0 else 0)
        if idx > 0:
            for i in range(1, idx):
                cab.encode_bin_ep(1)
            if idx < max_merge - 1:
                cab.encode_bin_ep(0)

    def _write_mvd(self, mvd: np.ndarray) -> None:
        cab = self.cab
        g0 = [1 if v != 0 else 0 for v in mvd]
        g1 = [1 if abs(int(v)) > 1 else 0 for v in mvd]
        cab.encode_bin(ContextSet.idx("mvd", 0), g0[0])
        cab.encode_bin(ContextSet.idx("mvd", 0), g0[1])
        if g0[0]:
            cab.encode_bin(ContextSet.idx("mvd", 1), g1[0])
        if g0[1]:
            cab.encode_bin(ContextSet.idx("mvd", 1), g1[1])
        crypto = cab.crypto_res
        if crypto is not None:
            from ..extras import crypto as _cr
        for v, has0, has1 in zip(mvd, g0, g1):
            if not has0:
                continue
            a = abs(int(v))
            if has1:
                # abs_mvd_minus2 as 1st-order exp-golomb, bypass
                val = a - 2
                q = 0
                while val >= ((1 << q) << 1):
                    val -= (1 << q) << 1
                    cab.encode_bin_ep(1)
                    q += 1
                cab.encode_bin_ep(0)
                if crypto is not None and \
                        crypto[1] & _cr.CRYPTO_MVS:
                    # scramble the EG1 suffix = the codeword's low half
                    # (ref src/cabac.c:576-583)
                    val = _cr.encrypt_ep_suffix(crypto[0], val, q + 1)
                cab.encode_bins_ep(val, q + 1)
            sign = 1 if v < 0 else 0
            if crypto is not None and crypto[1] & _cr.CRYPTO_MV_SIGNS:
                # ref src/encode_coding_tree.c:1091-1107
                sign = _cr.xor_bits(crypto[0], sign, 1)
            cab.encode_bin_ep(sign)

    def _write_ref_idx(self, ridx: int, n_act: int) -> None:
        """Mirror of decoder.py _decode_ref_idx binarization."""
        cab = self.cab
        if n_act <= 1:
            return
        cab.encode_bin(ContextSet.idx("ref_idx", 0), 1 if ridx > 0 else 0)
        if ridx > 0 and n_act > 2:
            cab.encode_bin(ContextSet.idx("ref_idx", 1),
                           1 if ridx > 1 else 0)
            if ridx > 1:
                for _ in range(ridx - 2):
                    cab.encode_bin_ep(1)
                if ridx < n_act - 1:
                    cab.encode_bin_ep(0)

    def _write_inter_cu(self, r, c, x0, y0) -> None:
        cab = self.cab
        h = self.helper
        motion, ridx2 = self._motion_of(r, c)
        ly, lcb, lcr = self._block_levels(r, c)
        cbf_y = 1 if ly.any() else 0
        cbf_cb = 1 if lcb.any() else 0
        cbf_cr = 1 if lcr.any() else 0
        has_resi = cbf_y or cbf_cb or cbf_cr
        max_merge = 5 - self.sh.five_minus_max_num_merge_cand
        cands = h.merge_candidates(x0, y0, N, N, max_merge)
        merge_idx = None
        for k, cand in enumerate(cands):
            if SliceDecoder._same_motion(cand, motion):
                merge_idx = k
                break
        skip_ctx = self._skip_ctx(x0, y0)
        if merge_idx is not None and not has_resi:
            cab.encode_bin(ContextSet.idx("cu_skip_flag", skip_ctx), 1)
            self._write_merge_idx(merge_idx, max_merge)
            h._mark_inter(x0, y0, N, N, motion, True)
            return
        cab.encode_bin(ContextSet.idx("cu_skip_flag", skip_ctx), 0)
        cab.encode_bin(ContextSet.idx("pred_mode_flag", 0), 0)
        cab.encode_bin(ContextSet.idx("part_mode", 0), 1)  # 2Nx2N
        if merge_idx is not None:
            cab.encode_bin(ContextSet.idx("merge_flag", 0), 1)
            self._write_merge_idx(merge_idx, max_merge)
        else:
            cab.encode_bin(ContextSet.idx("merge_flag", 0), 0)
            flags = motion[0]
            if self.is_b:
                # inter_pred_idc for a 16x16 PU (never the "small" form):
                # first bin (ctx = CU depth, 0 here) selects BI, second
                # (ctx 4) selects the list
                bi = flags[0] and flags[1]
                cab.encode_bin(ContextSet.idx("inter_pred_idc", 0),
                               1 if bi else 0)
                if not bi:
                    cab.encode_bin(ContextSet.idx("inter_pred_idc", 4),
                                   1 if flags[1] else 0)
            for lx in (0, 1):
                if not flags[lx]:
                    continue
                ridx = ridx2[lx]
                n_act = (self.sh.num_ref_idx_l0_active_minus1 + 1
                         if lx == 0
                         else self.sh.num_ref_idx_l1_active_minus1 + 1)
                self._write_ref_idx(ridx, n_act)
                ref_poc = (self.ref_pocs[ridx] if lx == 0
                           else self.ref_pocs_l1[ridx])
                mvps = h.amvp_candidates(x0, y0, N, N, lx, ref_poc)
                mv = motion[1][lx]
                costs = [abs(int(mv[0] - m[0])) + abs(int(mv[1] - m[1]))
                         for m in mvps]
                flag = 1 if costs[1] < costs[0] else 0
                mvd = (mv - mvps[flag]).astype(np.int32)
                self._write_mvd(mvd)
                cab.encode_bin(ContextSet.idx("mvp_flag", 0), flag)
        h._mark_inter(x0, y0, N, N, motion, False)
        if merge_idx is None:
            cab.encode_bin(ContextSet.idx("rqt_root_cbf", 0),
                           1 if has_resi else 0)
        if not has_resi:
            return
        # transform tree: TU == CU, no split flag
        cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cb)
        cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cr)
        if cbf_cb or cbf_cr:
            cab.encode_bin(ContextSet.idx("cbf_luma", 1), cbf_y)
        sdh = bool(self.pps.sign_data_hiding_enabled)
        if cbf_y:
            encode_residual(cab, ly, 4, 0, 0, sdh)
        if cbf_cb:
            encode_residual(cab, lcb, 3, 1, 0, sdh)
        if cbf_cr:
            encode_residual(cab, lcr, 3, 2, 0, sdh)

    def _write_intra_cu(self, r, c, x0, y0) -> None:
        cab = self.cab
        h = self.helper
        fs = self.fs
        cab.encode_bin(ContextSet.idx("cu_skip_flag",
                                      self._skip_ctx(x0, y0)), 0)
        cab.encode_bin(ContextSet.idx("pred_mode_flag", 0), 1)
        # 16x16 intra, 2Nx2N implicit (log2 != min_cb)
        mode = int(self.d["modes"][r, c])
        mpm = h.mpm_list(x0, y0)
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
        cab.encode_bin(ContextSet.idx("intra_chroma_pred_mode", 0), 0)
        sl = (slice(y0 >> 2, (y0 + N) >> 2), slice(x0 >> 2, (x0 + N) >> 2))
        fs.intra_mode[sl] = mode
        fs.pred_mode[sl] = INTRA
        fs.coded[sl] = True
        fs.decoded[sl] = True
        fs.ref_poc[sl[0], sl[1], :] = NO_REF
        fs.skip[sl] = False
        ly, lcb, lcr = self._block_levels(r, c)
        cbf_y = 1 if ly.any() else 0
        cbf_cb = 1 if lcb.any() else 0
        cbf_cr = 1 if lcr.any() else 0
        cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cb)
        cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cr)
        cab.encode_bin(ContextSet.idx("cbf_luma", 1), cbf_y)
        sdh = bool(self.pps.sign_data_hiding_enabled)
        if cbf_y:
            encode_residual(cab, ly, 4, 0,
                            intra_mode_scan_idx(mode, 4, False), sdh)
        if cbf_cb:
            encode_residual(cab, lcb, 3, 1,
                            intra_mode_scan_idx(mode, 3, True), sdh)
        if cbf_cr:
            encode_residual(cab, lcr, 3, 2,
                            intra_mode_scan_idx(mode, 3, True), sdh)
