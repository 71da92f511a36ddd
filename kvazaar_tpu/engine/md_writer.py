"""Quadtree (multi-depth) intra slice syntax writer.

Consumes the device decisions of models/intra_md.py — a per-8x8-cell size
map (8/16/32), a leaf mode map, and coefficient-level planes laid out at
pixel positions — and emits the coding-tree syntax. No sample math
happens here; reconstruction already happened in-graph.

Reference parity: kvazaar src/encode_coding_tree.c (kvz_encode_coding_tree
:745 split flags / intra mode coding :467 / TU tree :193) specialised to
TU == CU (max_transform_hierarchy_depth_intra = 0) and 2Nx2N intra PUs.
"""
from __future__ import annotations

import numpy as np

from ..cabac import CabacEncoder, ContextSet
from ..syntax.residual import encode_residual
from ..tables import intra_mode_scan_idx


class MdIntraWriter:
    """Writes one I-slice CTB at a time from multi-depth decisions."""

    def __init__(self, sps, pps, sh, decisions) -> None:
        self.sps = sps
        self.pps = pps
        self.sh = sh
        self.d = decisions
        self.size8 = np.asarray(decisions["size_map8"], np.int32)
        self.mode8 = np.asarray(decisions["mode_map8"], np.int32)
        # per-4x4 PU modes (NxN cells); absent on paths without NxN
        m4 = decisions.get("mode_map4")
        self.mode4d = (np.asarray(m4, np.int32) if m4 is not None
                       else np.repeat(np.repeat(self.mode8, 2, 0), 2, 1))
        self.lvl = [np.asarray(decisions["levels_y"]),
                    np.asarray(decisions["levels_cb"]),
                    np.asarray(decisions["levels_cr"])]
        w, h = sps.width, sps.height
        self.depth = np.zeros((h // 4, w // 4), dtype=np.int8)
        self.mode4 = np.full((h // 4, w // 4), 1, dtype=np.int8)
        self.coded = np.zeros((h // 4, w // 4), dtype=bool)
        self.cab: CabacEncoder | None = None
        self.sao_w = None
        self.sdh = bool(pps.sign_data_hiding_enabled)
        # --transform-skip: per-8-cell skip decisions from the device
        # ([r8, c8, 6]: 4 NxN luma sub-TU bits in z order + cb + cr)
        self.tse = bool(pps.transform_skip_enabled)
        _ts = decisions.get("ts8") if hasattr(decisions, "get") else None
        self.ts8 = np.asarray(_ts, np.int8) if _ts is not None else None
        # tiles: availability never crosses tile boundaries (spec 6.4.1)
        self.tile_ctb = None   # [ctbs_y, ctbs_x] tile ids
        self.tile4 = None      # per-4x4 tile ids
        self.cur_tile = 0
        # delta QP (QG == CTB: diff_cu_qp_delta_depth is always 0 here,
        # so qPY_A/B fall outside the CTB and qPY_PRED == qPY_PREV)
        self.dqp = bool(pps.cu_qp_delta_enabled)
        self.qp_ctb = (np.asarray(decisions["qp_ctb"], np.int32)
                       if self.dqp else None)
        self.qp_prev = sh.qp
        self.qg_qp = sh.qp
        self.qg_pred = sh.qp
        self.qg_coded = True

    def _crypt_mode(self, mode: int) -> int:
        """Selective encryption of the luma intra mode (reference
        encode_coding_tree.c:423-467 intra_mode_encryption); identity
        when crypto is off. The returned mode is what is *signalled*
        (and propagated to MPM derivation); reconstruction uses the
        true mode."""
        crypto = getattr(self.cab, "crypto_res", None)
        if crypto is None:
            return mode
        from ..extras import crypto as _cr
        if not crypto[1] & _cr.CRYPTO_INTRA_MODE:
            return mode
        return _cr.encrypt_intra_mode(crypto[0], mode)

    def _ts_flag(self, x0: int, y0: int, bit: int) -> bool:
        """Device transform_skip decision for the 8-cell at (x0, y0):
        bit 0-3 = NxN luma sub-TU (z order), 4 = cb, 5 = cr."""
        if self.ts8 is None:
            return False
        return bool(self.ts8[y0 >> 3, x0 >> 3, bit])

    def reset_qp_chain(self) -> None:
        """qPY_PREV reset at slice / tile / WPP-row starts."""
        self.qp_prev = self.sh.qp

    # -- neighbor helpers ----------------------------------------------------

    def _coded_at(self, x: int, y: int) -> bool:
        if x < 0 or y < 0 or x >= self.sps.width or y >= self.sps.height:
            return False
        if self.tile4 is not None and \
                self.tile4[y >> 2, x >> 2] != self.cur_tile:
            return False
        return bool(self.coded[y >> 2, x >> 2])

    def _neighbor_mode(self, x: int, y: int, cur_y: int,
                       is_above: bool) -> int:
        if not self._coded_at(x, y):
            return 1
        if is_above and (y >> self.sps.ctb_log2) != \
                (cur_y >> self.sps.ctb_log2):
            return 1
        return int(self.mode4[y >> 2, x >> 2])

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

    # -- tree ------------------------------------------------------------------

    def write_ctu(self, ctu_y: int, ctu_x: int) -> None:
        x0 = ctu_x * self.sps.ctb_size
        y0 = ctu_y * self.sps.ctb_size
        left_ok, up_ok = ctu_x > 0, ctu_y > 0
        if self.tile_ctb is not None:
            tid = self.tile_ctb[ctu_y, ctu_x]
            self.cur_tile = int(tid)
            left_ok = left_ok and self.tile_ctb[ctu_y, ctu_x - 1] == tid
            up_ok = up_ok and self.tile_ctb[ctu_y - 1, ctu_x] == tid
        if self.sao_w is not None:
            self.sao_w.write(self.cab, ctu_y, ctu_x, left_ok, up_ok)
        if self.dqp:
            self.qg_pred = self.qp_prev
            self.qg_qp = int(self.qp_ctb[ctu_y, ctu_x])
            self.qg_coded = False
            # the device final-QP chain guarantees qg_qp == qg_pred when
            # the CTB codes no coefficients, so advancing unconditionally
            # mirrors the decoder's qPY_PREV
            self.qp_prev = self.qg_qp
        self.coding_quadtree(x0, y0, self.sps.ctb_log2, 0)

    def _write_qp_delta(self) -> None:
        cab = self.cab
        v = self.qg_qp - self.qg_pred
        a = abs(v)
        prefix = min(a, 5)
        cab.encode_bin(ContextSet.idx("cu_qp_delta_abs", 0),
                       1 if prefix > 0 else 0)
        for i in range(1, prefix):
            cab.encode_bin(ContextSet.idx("cu_qp_delta_abs", 1), 1)
        if 0 < prefix < 5:
            cab.encode_bin(ContextSet.idx("cu_qp_delta_abs", 1), 0)
        if prefix == 5:                      # EG0 suffix: N = a - 5
            rem = a - 5
            k = (rem + 1).bit_length() - 1
            suffix = rem - ((1 << k) - 1)
            for _ in range(k):
                cab.encode_bin_ep(1)
            cab.encode_bin_ep(0)
            for i in range(k - 1, -1, -1):
                cab.encode_bin_ep((suffix >> i) & 1)
        if a:
            cab.encode_bin_ep(1 if v < 0 else 0)
        self.qg_coded = True

    # api intra loop compatibility (encode_ctu takes (x, y))
    def encode_ctu(self, ctu_x: int, ctu_y: int) -> None:
        self.write_ctu(ctu_y, ctu_x)

    def coding_quadtree(self, x0: int, y0: int, log2_size: int,
                        depth: int) -> None:
        sps = self.sps
        size = 1 << log2_size
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        # size code 4 = NxN-partitioned 8x8 CU (a leaf at size 8)
        leaf_size = max(int(self.size8[y0 >> 3, x0 >> 3]), 8)
        if inside and log2_size > sps.log2_min_cb_size:
            split = size > leaf_size
            ctx_off = 0
            if self._coded_at(x0 - 1, y0) and \
                    self.depth[y0 >> 2, (x0 - 1) >> 2] > depth:
                ctx_off += 1
            if self._coded_at(x0, y0 - 1) and \
                    self.depth[(y0 - 1) >> 2, x0 >> 2] > depth:
                ctx_off += 1
            self.cab.encode_bin(ContextSet.idx("split_cu_flag", ctx_off),
                                1 if split else 0)
        else:
            split = (not inside and log2_size > sps.log2_min_cb_size) or \
                (inside and size > leaf_size)
        if split:
            half = size >> 1
            for dx, dy in ((0, 0), (half, 0), (0, half), (half, half)):
                if x0 + dx < sps.width and y0 + dy < sps.height:
                    self.coding_quadtree(x0 + dx, y0 + dy, log2_size - 1,
                                         depth + 1)
            return
        self.depth[y0 >> 2:(y0 + size) >> 2,
                   x0 >> 2:(x0 + size) >> 2] = depth
        self.coding_unit(x0, y0, log2_size)

    def coding_unit(self, x0: int, y0: int, log2_size: int) -> None:
        size = 1 << log2_size
        cab = self.cab
        if self.pps.transquant_bypass_enabled:
            # all-lossless encode: every CU bypasses transform+quant
            cab.encode_bin(
                ContextSet.idx("cu_transquant_bypass_flag", 0), 1)
        nxn = (log2_size == 3
               and int(self.size8[y0 >> 3, x0 >> 3]) == 4)
        if log2_size == self.sps.log2_min_cb_size:
            cab.encode_bin(ContextSet.idx("part_mode", 0),
                           0 if nxn else 1)
        if nxn:
            self._coding_unit_nxn(x0, y0)
            return
        true_mode = int(self.mode8[y0 >> 3, x0 >> 3])
        mode = self._crypt_mode(true_mode)
        mpm = self.mpm_list(x0, y0)
        if mode in mpm:
            cab.encode_bin(ContextSet.idx("prev_intra_luma_pred_flag", 0),
                           1)
            idx = mpm.index(mode)
            if idx == 0:
                cab.encode_bin_ep(0)
            else:
                cab.encode_bin_ep(1)
                cab.encode_bin_ep(idx - 1)
        else:
            cab.encode_bin(ContextSet.idx("prev_intra_luma_pred_flag", 0),
                           0)
            rem = mode
            for cand in sorted(mpm, reverse=True):
                if rem > cand:
                    rem -= 1
            cab.encode_bins_ep(rem, 5)
        # the (possibly encrypted) mode feeds later MPM derivations so
        # writer and decoder stay in sync (ref encode_coding_tree.c:560)
        self.mode4[y0 >> 2:(y0 + size) >> 2,
                   x0 >> 2:(x0 + size) >> 2] = mode
        self.coded[y0 >> 2:(y0 + size) >> 2,
                   x0 >> 2:(x0 + size) >> 2] = True
        cab.encode_bin(ContextSet.idx("intra_chroma_pred_mode", 0), 0)
        self.transform_unit(x0, y0, log2_size, true_mode)

    def _coding_unit_nxn(self, x0: int, y0: int) -> None:
        """NxN intra CU: four 4x4 PUs with independent modes, forced TU
        split into four 4x4 DST TUs (IntraSplitFlag, spec 7.3.8.5,
        7.3.8.8). All prev_intra_luma_pred_flags precede the mpm_idx /
        rem_intra payloads; MPM lists update progressively so PU i sees
        PU <i modes, mirroring decoder parse order."""
        cab = self.cab
        offs = ((0, 0), (4, 0), (0, 4), (4, 4))        # (dx, dy) z order
        modes, flags, payloads = [], [], []
        for dx, dy in offs:
            x, y = x0 + dx, y0 + dy
            true_mode = int(self.mode4d[y >> 2, x >> 2])
            mode = self._crypt_mode(true_mode)
            mpm = self.mpm_list(x, y)
            if mode in mpm:
                flags.append(1)
                payloads.append(("mpm", mpm.index(mode)))
            else:
                rem = mode
                for cand in sorted(mpm, reverse=True):
                    if rem > cand:
                        rem -= 1
                flags.append(0)
                payloads.append(("rem", rem))
            self.mode4[y >> 2, x >> 2] = mode
            self.coded[y >> 2, x >> 2] = True
            modes.append(true_mode)
        for f in flags:
            cab.encode_bin(
                ContextSet.idx("prev_intra_luma_pred_flag", 0), f)
        for kind, v in payloads:
            if kind == "mpm":
                if v == 0:
                    cab.encode_bin_ep(0)
                else:
                    cab.encode_bin_ep(1)
                    cab.encode_bin_ep(v - 1)
            else:
                cab.encode_bins_ep(v, 5)
        cab.encode_bin(ContextSet.idx("intra_chroma_pred_mode", 0), 0)
        # transform tree (depth 0 forced split): chroma cbfs at the 8x8
        # level, then four 4x4 luma TUs; the CU's single 4x4 chroma TU
        # rides the last child (blkIdx 3, spec 7.3.8.10)
        cy0, cx0 = y0 >> 1, x0 >> 1
        cbf_cb = 1 if self.lvl[1][cy0:cy0 + 4, cx0:cx0 + 4].any() else 0
        cbf_cr = 1 if self.lvl[2][cy0:cy0 + 4, cx0:cx0 + 4].any() else 0
        cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cb)
        cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cr)
        for i, (dx, dy) in enumerate(offs):
            x, y = x0 + dx, y0 + dy
            lv_y = self.lvl[0][y:y + 4, x:x + 4]
            cbf_y = 1 if lv_y.any() else 0
            cab.encode_bin(ContextSet.idx("cbf_luma", 0), cbf_y)
            # 4x4 TUs use the PARENT's chroma cbfs in the delta-QP
            # condition for all four children (spec 7.3.8.10)
            if self.dqp and not self.qg_coded and \
                    (cbf_y or cbf_cb or cbf_cr):
                self._write_qp_delta()
            if cbf_y:
                scan = intra_mode_scan_idx(modes[i], 2, False)
                encode_residual(cab, lv_y, 2, 0, scan, self.sdh,
                                transform_skip=self._ts_flag(x0, y0, i),
                                transform_skip_enabled=self.tse)
            if i == 3:
                # chroma scan follows the chroma (DM = PU0) mode
                if cbf_cb:
                    scan = intra_mode_scan_idx(modes[0], 2, True)
                    encode_residual(cab, self.lvl[1][cy0:cy0 + 4,
                                                     cx0:cx0 + 4],
                                    2, 1, scan, self.sdh,
                                    transform_skip=self._ts_flag(
                                        x0, y0, 4),
                                    transform_skip_enabled=self.tse)
                if cbf_cr:
                    scan = intra_mode_scan_idx(modes[0], 2, True)
                    encode_residual(cab, self.lvl[2][cy0:cy0 + 4,
                                                     cx0:cx0 + 4],
                                    2, 2, scan, self.sdh,
                                    transform_skip=self._ts_flag(
                                        x0, y0, 5),
                                    transform_skip_enabled=self.tse)

    def transform_unit(self, x0: int, y0: int, log2_size: int,
                       mode: int) -> None:
        if log2_size == 6:
            # 64x64 CU: forced TU split (log2 > MaxTbLog2SizeY, spec
            # 7.3.8.8) — chroma cbfs at trafoDepth 0, then four 32x32
            # TUs in z order, each signalling its chroma cbf only when
            # the parent's is set
            cab = self.cab
            csize = 32
            cy0, cx0 = y0 >> 1, x0 >> 1
            cbf_cb = 1 if self.lvl[1][cy0:cy0 + csize,
                                      cx0:cx0 + csize].any() else 0
            cbf_cr = 1 if self.lvl[2][cy0:cy0 + csize,
                                      cx0:cx0 + csize].any() else 0
            cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cb)
            cab.encode_bin(ContextSet.idx("cbf_chroma", 0), cbf_cr)
            for dx, dy in ((0, 0), (32, 0), (0, 32), (32, 32)):
                self._tu_leaf(x0 + dx, y0 + dy, 5, mode, 1,
                              cbf_cb, cbf_cr)
            return
        self._tu_leaf(x0, y0, log2_size, mode, 0, 1, 1)

    def _tu_leaf(self, x0: int, y0: int, log2_size: int, mode: int,
                 trafo_depth: int, parent_cb: int, parent_cr: int) \
            -> None:
        size = 1 << log2_size
        cab = self.cab
        c_log2 = log2_size - 1
        csize = size >> 1
        cy0, cx0 = y0 >> 1, x0 >> 1
        lv_cb = self.lvl[1][cy0:cy0 + csize, cx0:cx0 + csize]
        lv_cr = self.lvl[2][cy0:cy0 + csize, cx0:cx0 + csize]
        lv_y = self.lvl[0][y0:y0 + size, x0:x0 + size]
        cbf_cb = (1 if lv_cb.any() else 0) if parent_cb else 0
        cbf_cr = (1 if lv_cr.any() else 0) if parent_cr else 0
        cbf_y = 1 if lv_y.any() else 0
        # chroma cbf ctx = trafoDepth; luma ctx 1 iff trafoDepth 0
        if parent_cb:
            cab.encode_bin(ContextSet.idx("cbf_chroma", trafo_depth),
                           cbf_cb)
        if parent_cr:
            cab.encode_bin(ContextSet.idx("cbf_chroma", trafo_depth),
                           cbf_cr)
        cab.encode_bin(
            ContextSet.idx("cbf_luma", 1 if trafo_depth == 0 else 0),
            cbf_y)
        if self.dqp and not self.qg_coded and (cbf_y or cbf_cb or cbf_cr):
            self._write_qp_delta()
        if cbf_y:
            scan = intra_mode_scan_idx(mode, log2_size, False)
            encode_residual(cab, lv_y, log2_size, 0, scan, self.sdh)
        if cbf_cb:
            scan = intra_mode_scan_idx(mode, c_log2, True)
            encode_residual(cab, lv_cb, c_log2, 1, scan, self.sdh,
                            transform_skip=self._ts_flag(x0, y0, 4),
                            transform_skip_enabled=self.tse)
        if cbf_cr:
            scan = intra_mode_scan_idx(mode, c_log2, True)
            encode_residual(cab, lv_cr, c_log2, 2, scan, self.sdh,
                            transform_skip=self._ts_flag(x0, y0, 5),
                            transform_skip_enabled=self.tse)
