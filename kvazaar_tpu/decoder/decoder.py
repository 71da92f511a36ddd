"""Validation HEVC decoder (intra profile subset).

Decodes Annex-B HEVC streams produced by this framework and by the reference
encoder, reconstructs pictures exactly, and verifies decoded-picture-hash
SEIs. This is the project's conformance oracle complement (the other half is
ffmpeg via OpenCV): if this decoder — written independently from the spec —
reconstructs reference-encoder streams hash-exactly, the shared tables and
sample ops are proven; the encoder is then validated against both.

Reference parity: this subsumes what kvazaar relies on HM's TAppDecoder for
in tests/util.sh:19-55.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bitstream import (BitReader, NAL_PPS, NAL_PREFIX_SEI, NAL_SPS,
                         NAL_SUFFIX_SEI, NAL_VPS, ebsp_to_rbsp, split_annexb)
from ..cabac import CabacDecoder, ContextSet
from ..hevc.headers import parse_pps, parse_slice_header, parse_sps
from ..hevc.params import PPS, SPS, SliceHeader
from ..hevc.sei import (SEI_DECODED_PICTURE_HASH, parse_hash_sei,
                        parse_sei_messages, plane_checksum, plane_md5)
from ..ops import reference as ops
from ..syntax.residual import decode_residual
from ..tables import chroma_qp, intra_mode_scan_idx

INTRA = 1
INTER = 0


@dataclass
class DecodedFrame:
    poc: int
    planes: list[np.ndarray]  # Y, Cb, Cr (cropped to conformance window)
    full_planes: list[np.ndarray] | None = None  # pre-crop (hash domain)
    hash_ok: bool | None = None


@dataclass
class _FrameState:
    sps: SPS
    pps: PPS
    sh: SliceHeader
    y: np.ndarray = field(init=False)
    cb: np.ndarray = field(init=False)
    cr: np.ndarray = field(init=False)
    # per-4x4-luma-block maps
    depth: np.ndarray = field(init=False)
    intra_mode: np.ndarray = field(init=False)
    pred_mode: np.ndarray = field(init=False)
    decoded: np.ndarray = field(init=False)
    coded: np.ndarray = field(init=False)  # z-scan parse precedence
    qp_map: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        sps = self.sps
        ctb = sps.ctb_size
        w = sps.width_in_ctbs * ctb
        h = sps.height_in_ctbs * ctb
        self.y = np.zeros((h, w), dtype=np.int32)
        self.cb = np.zeros((h // 2, w // 2), dtype=np.int32)
        self.cr = np.zeros((h // 2, w // 2), dtype=np.int32)
        mw, mh = w // 4, h // 4
        self.depth = np.zeros((mh, mw), dtype=np.int8)
        self.intra_mode = np.full((mh, mw), 1, dtype=np.int8)
        self.pred_mode = np.full((mh, mw), INTRA, dtype=np.int8)
        self.decoded = np.zeros((mh, mw), dtype=bool)
        self.coded = np.zeros((mh, mw), dtype=bool)
        self.qp_map = np.full((mh, mw), self.sh.qp, dtype=np.int8)
        # deblocking edge maps (8-aligned TU/CU edges; spec 8.7.2)
        self.edges_ver = np.zeros((h // 4, w // 8), dtype=bool)
        self.edges_hor = np.zeros((h // 8, w // 4), dtype=bool)
        self.c_edges_ver = np.zeros((h // 8, w // 16), dtype=bool)
        self.c_edges_hor = np.zeros((h // 16, w // 8), dtype=bool)


class SliceDecoder:
    """Decodes one independent slice segment's CTUs."""

    def __init__(self, fs: _FrameState, cab: CabacDecoder) -> None:
        self.fs = fs
        self.cab = cab
        self.sps = fs.sps
        self.pps = fs.pps
        self.sh = fs.sh

    # -- helpers -------------------------------------------------------------

    def _avail(self, x: int, y: int) -> bool:
        """Sample availability at luma position (x, y) (spec 6.4.1)."""
        if x < 0 or y < 0 or x >= self.sps.width or y >= self.sps.height:
            return False
        return bool(self.fs.decoded[y >> 2, x >> 2])

    def _coded(self, x: int, y: int) -> bool:
        """z-scan parse-order availability (spec 6.4.1)."""
        if x < 0 or y < 0 or x >= self.sps.width or y >= self.sps.height:
            return False
        return bool(self.fs.coded[y >> 2, x >> 2])

    def _neighbor_intra_mode(self, x: int, y: int, cur_ctu_y: int,
                             is_above: bool) -> int:
        """candIntraPredMode from a neighbour PU (spec 8.4.2)."""
        if not self._coded(x, y):
            return 1  # DC
        if self.fs.pred_mode[y >> 2, x >> 2] != INTRA:
            return 1
        if is_above and (y >> self.sps.ctb_log2) != \
                (cur_ctu_y >> self.sps.ctb_log2):
            return 1
        return int(self.fs.intra_mode[y >> 2, x >> 2])

    def mpm_list(self, x0: int, y0: int) -> list[int]:
        a = self._neighbor_intra_mode(x0 - 1, y0, y0, False)
        b = self._neighbor_intra_mode(x0, y0 - 1, y0, True)
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

    # -- intra reconstruction -------------------------------------------------

    def _build_refs(self, plane: np.ndarray, x: int, y: int, size: int,
                    c_idx: int) -> tuple[np.ndarray, np.ndarray, int]:
        """Gather and substitute reference samples for a TU at (x, y) in
        plane coords (chroma coords for c_idx>0)."""
        scale = 2 if c_idx else 1
        n2 = 2 * size
        left = np.zeros(n2, dtype=np.int32)
        top = np.zeros(n2, dtype=np.int32)
        avail_l = np.zeros(n2, dtype=bool)
        avail_t = np.zeros(n2, dtype=bool)
        ph, pw = plane.shape
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
        return ops.intra_ref_substitution(
            left, top, corner, avail_l, avail_t, avail_c,
            self.sps.bit_depth_luma)

    def _intra_recon_tu(self, x: int, y: int, log2_size: int, c_idx: int,
                        mode: int, coeffs: np.ndarray | None) -> None:
        size = 1 << log2_size
        fs = self.fs
        plane = (fs.y, fs.cb, fs.cr)[c_idx]
        scale = 2 if c_idx else 1
        px, py = x // scale, y // scale
        left, top, corner = self._build_refs(plane, px, py, size, c_idx)
        if c_idx == 0:
            left, top, corner = ops.intra_filter_refs(
                left, top, corner, size, mode,
                bool(self.sps.strong_intra_smoothing),
                self.sps.bit_depth_luma)
        pred = ops.intra_predict(left, top, corner, size, mode, c_idx > 0,
                                 self.sps.bit_depth_luma)
        if coeffs is not None:
            qp = int(fs.qp_map[y >> 2, x >> 2])
            if c_idx:
                qp = chroma_qp(qp, self.pps.cb_qp_offset if c_idx == 1
                               else self.pps.cr_qp_offset)
            deq = ops.dequantize(coeffs, qp, self.sps.bit_depth_luma)
            is_dst = (c_idx == 0 and log2_size == 2)
            resi = ops.inverse_transform(deq, is_dst,
                                         self.sps.bit_depth_luma)
            pred = pred + resi
        max_val = (1 << self.sps.bit_depth_luma) - 1
        plane[py:py + size, px:px + size] = np.clip(pred, 0, max_val)
        if c_idx == 0:
            fs.decoded[y >> 2:(y + size) >> 2, x >> 2:(x + size) >> 2] = True
            if x > 0 and x % 8 == 0:
                fs.edges_ver[y >> 2:(y + size) >> 2, x >> 3] = True
            if y > 0 and y % 8 == 0:
                fs.edges_hor[y >> 3, x >> 2:(x + size) >> 2] = True
        elif c_idx == 1:
            if px > 0 and px % 8 == 0:
                fs.c_edges_ver[py >> 2:(py + size) >> 2, px >> 3] = True
            if py > 0 and py % 8 == 0:
                fs.c_edges_hor[py >> 3, px >> 2:(px + size) >> 2] = True

    # -- syntax ---------------------------------------------------------------

    def decode_ctu(self, ctu_x: int, ctu_y: int) -> None:
        sps = self.sps
        x0 = ctu_x * sps.ctb_size
        y0 = ctu_y * sps.ctb_size
        if self.sh.sao_luma or self.sh.sao_chroma:
            raise NotImplementedError("SAO decode")
        self.coding_quadtree(x0, y0, sps.ctb_log2, 0)

    def coding_quadtree(self, x0: int, y0: int, log2_size: int,
                        depth: int) -> None:
        sps = self.sps
        size = 1 << log2_size
        inside = (x0 + size <= sps.width) and (y0 + size <= sps.height)
        if inside and log2_size > sps.log2_min_cb_size:
            ctx_off = 0
            if self._coded(x0 - 1, y0) and \
                    self.fs.depth[y0 >> 2, (x0 - 1) >> 2] > depth:
                ctx_off += 1
            if self._coded(x0, y0 - 1) and \
                    self.fs.depth[(y0 - 1) >> 2, x0 >> 2] > depth:
                ctx_off += 1
            split = self.cab.decode_bin(
                ContextSet.idx("split_cu_flag", ctx_off))
        else:
            split = 1 if (log2_size > sps.log2_min_cb_size) else 0
        if split:
            half = size >> 1
            for (dx, dy) in ((0, 0), (half, 0), (0, half), (half, half)):
                if x0 + dx < sps.width and y0 + dy < sps.height:
                    self.coding_quadtree(x0 + dx, y0 + dy, log2_size - 1,
                                         depth + 1)
            return
        self.fs.depth[y0 >> 2:(y0 + size) >> 2,
                      x0 >> 2:(x0 + size) >> 2] = depth
        self.coding_unit(x0, y0, log2_size)

    def coding_unit(self, x0: int, y0: int, log2_size: int) -> None:
        sps = self.sps
        pps = self.pps
        if pps.transquant_bypass_enabled:
            raise NotImplementedError("transquant bypass")
        if not self.sh.is_intra:
            raise NotImplementedError("inter slices")
        size = 1 << log2_size
        part_nxn = False
        if log2_size == sps.log2_min_cb_size:
            part_nxn = not self.cab.decode_bin(ContextSet.idx("part_mode", 0))
        n_pu = 4 if part_nxn else 1
        pu_size = size >> 1 if part_nxn else size
        # luma intra modes
        prev_flags = [self.cab.decode_bin(
            ContextSet.idx("prev_intra_luma_pred_flag", 0))
            for _ in range(n_pu)]
        modes = []
        offs = [(0, 0)] if not part_nxn else [(0, 0), (pu_size, 0),
                                              (0, pu_size),
                                              (pu_size, pu_size)]
        for i in range(n_pu):
            px, py = x0 + offs[i][0], y0 + offs[i][1]
            mpm = self.mpm_list(px, py)
            if prev_flags[i]:
                idx = 0
                if self.cab.decode_bin_ep():
                    idx = 1 + self.cab.decode_bin_ep()
                mode = mpm[idx]
            else:
                rem = self.cab.decode_bins_ep(5)
                for cand in sorted(mpm):
                    if rem >= cand:
                        rem += 1
                mode = rem
            modes.append(mode)
            # record the mode before the next PU's MPM derivation
            self.fs.intra_mode[py >> 2:(py + pu_size) >> 2,
                               px >> 2:(px + pu_size) >> 2] = mode
            self.fs.coded[py >> 2:(py + pu_size) >> 2,
                          px >> 2:(px + pu_size) >> 2] = True
        # chroma mode
        if self.cab.decode_bin(ContextSet.idx("intra_chroma_pred_mode", 0)):
            idx = self.cab.decode_bins_ep(2)
            cand = [0, 26, 10, 1]
            if modes[0] in cand:
                cand[cand.index(modes[0])] = 34
            chroma_mode = cand[idx]
        else:
            chroma_mode = modes[0]
        self.fs.pred_mode[y0 >> 2:(y0 + size) >> 2,
                          x0 >> 2:(x0 + size) >> 2] = INTRA
        self.transform_tree(x0, y0, x0, y0, log2_size, 0, 0,
                            modes, chroma_mode, part_nxn,
                            parent_cbf_cb=1, parent_cbf_cr=1)

    def transform_tree(self, x0: int, y0: int, x_base: int, y_base: int,
                       log2_size: int, depth: int, blk_idx: int,
                       modes: list[int], chroma_mode: int, intra_split: bool,
                       parent_cbf_cb: int, parent_cbf_cr: int) -> None:
        sps = self.sps
        cab = self.cab
        max_depth = sps.max_transform_hierarchy_depth_intra + \
            (1 if intra_split else 0)
        max_tb = sps.log2_min_tb_size + sps.log2_diff_max_min_tb_size
        if log2_size <= max_tb and log2_size > sps.log2_min_tb_size and \
                depth < max_depth and not (intra_split and depth == 0):
            split = cab.decode_bin(
                ContextSet.idx("split_transform_flag", 5 - log2_size))
        else:
            split = 1 if (log2_size > max_tb or
                          (intra_split and depth == 0)) else 0
        cbf_cb, cbf_cr = parent_cbf_cb, parent_cbf_cr
        if log2_size > 2:
            if depth == 0 or parent_cbf_cb:
                cbf_cb = cab.decode_bin(
                    ContextSet.idx("cbf_chroma", depth))
            else:
                cbf_cb = 0
            if depth == 0 or parent_cbf_cr:
                cbf_cr = cab.decode_bin(
                    ContextSet.idx("cbf_chroma", depth))
            else:
                cbf_cr = 0
        if split:
            half = 1 << (log2_size - 1)
            for i, (dx, dy) in enumerate(((0, 0), (half, 0), (0, half),
                                          (half, half))):
                self.transform_tree(x0 + dx, y0 + dy, x0, y0,
                                    log2_size - 1, depth + 1, i, modes,
                                    chroma_mode, intra_split, cbf_cb, cbf_cr)
            return
        # leaf: cbf_luma
        cbf_luma = cab.decode_bin(
            ContextSet.idx("cbf_luma", 1 if depth == 0 else 0))
        self.transform_unit(x0, y0, x_base, y_base, log2_size, depth,
                            blk_idx, modes, chroma_mode, intra_split,
                            cbf_luma, cbf_cb, cbf_cr)

    def _luma_mode_at(self, x: int, y: int, x_cu: int, y_cu: int,
                      modes: list[int], intra_split: bool,
                      cu_log2: int) -> int:
        if not intra_split:
            return modes[0]
        half = 1 << (cu_log2 - 1)
        idx = (1 if (x - x_cu) >= half else 0) + \
            (2 if (y - y_cu) >= half else 0)
        return modes[idx]

    def transform_unit(self, x0: int, y0: int, x_base: int, y_base: int,
                       log2_size: int, depth: int, blk_idx: int,
                       modes: list[int], chroma_mode: int, intra_split: bool,
                       cbf_luma: int, cbf_cb: int, cbf_cr: int) -> None:
        pps = self.pps
        # luma mode: for NxN CUs each 4x4 TU is one PU (blk_idx selects it)
        mode = modes[blk_idx] if (intra_split and depth > 0) else modes[0]
        coeffs = None
        if cbf_luma:
            scan = intra_mode_scan_idx(mode, log2_size, False)
            coeffs, _ = decode_residual(
                self.cab, log2_size, 0, scan,
                bool(pps.sign_data_hiding_enabled),
                bool(pps.transform_skip_enabled))
        self._intra_recon_tu(x0, y0, log2_size, 0, mode, coeffs)
        # chroma (4:2:0): at log2==2, only after the 4th luma TU
        if log2_size > 2:
            c_log2 = log2_size - 1
            cx, cy = x0, y0
        elif blk_idx == 3:
            c_log2 = 2
            cx, cy = x_base, y_base
        else:
            return
        for c_idx, cbf in ((1, cbf_cb), (2, cbf_cr)):
            ccoef = None
            if cbf:
                scan = intra_mode_scan_idx(chroma_mode, c_log2, True)
                ccoef, _ = decode_residual(
                    self.cab, c_log2, c_idx, scan,
                    bool(pps.sign_data_hiding_enabled),
                    bool(pps.transform_skip_enabled))
            self._intra_recon_tu(cx, cy, c_log2, c_idx, chroma_mode, ccoef)


class HEVCDecoder:
    """Annex-B stream decoder for the intra subset."""

    def __init__(self) -> None:
        self.sps: SPS | None = None
        self.pps_map: dict[int, PPS] = {}
        self.frames: list[DecodedFrame] = []
        self._pending_frame: DecodedFrame | None = None

    def decode(self, stream: bytes) -> list[DecodedFrame]:
        for nal_type, _tid, ebsp in split_annexb(stream):
            rbsp = ebsp_to_rbsp(ebsp)
            if nal_type == NAL_VPS:
                continue
            if nal_type == NAL_SPS:
                self.sps = parse_sps(rbsp)
            elif nal_type == NAL_PPS:
                pps = parse_pps(rbsp)
                self.pps_map[pps.pps_id] = pps
            elif nal_type == NAL_PREFIX_SEI:
                continue
            elif nal_type == NAL_SUFFIX_SEI:
                self._check_hash(rbsp)
            elif nal_type < 32:
                self._decode_slice(ebsp, nal_type)
        return self.frames

    def _decode_slice(self, ebsp: bytes, nal_type: int) -> None:
        from ..bitstream import ebsp_to_rbsp_ex
        rbsp, rbsp_pos = ebsp_to_rbsp_ex(ebsp)
        br = BitReader(rbsp)
        sh, pps = parse_slice_header(br, self.sps, self.pps_map, nal_type)
        if pps.tiles_enabled:
            raise NotImplementedError("tiles decode")
        fs = _FrameState(self.sps, pps, sh)
        wpp = bool(pps.entropy_coding_sync_enabled)
        sps = self.sps
        n_ctu_x = sps.width_in_ctbs
        n_ctu_y = sps.height_in_ctbs
        init_type = 0 if sh.is_intra else (2 - sh.slice_type)
        data = rbsp[br.byte_pos:]
        if wpp:
            # entry point offsets are in EBSP bytes (incl. emulation
            # prevention); convert boundaries to RBSP positions
            start_e = rbsp_pos.index(br.byte_pos)
            bounds_e = [start_e]
            for off in sh.entry_point_offsets:
                bounds_e.append(bounds_e[-1] + off)
            bounds_r = [rbsp_pos[min(b, len(ebsp))] for b in bounds_e]
            bounds_r.append(len(rbsp))
            row_data = [rbsp[bounds_r[i]:bounds_r[i + 1]]
                        for i in range(len(bounds_r) - 1)]
        else:
            row_data = None
        ctx = ContextSet(init_type, sh.qp)
        cab = CabacDecoder(BitReader(data if not wpp else row_data[0]), ctx)
        saved_ctx: ContextSet | None = None
        for ctu_y in range(n_ctu_y):
            if wpp and ctu_y > 0:
                ctx = (saved_ctx.copy() if saved_ctx is not None
                       else ContextSet(init_type, sh.qp))
                cab = CabacDecoder(BitReader(row_data[ctu_y]), ctx)
            sd = SliceDecoder(fs, cab)
            for ctu_x in range(n_ctu_x):
                sd.decode_ctu(ctu_x, ctu_y)
                if wpp and ctu_x == 1:
                    saved_ctx = ctx.copy()
                last = (ctu_y == n_ctu_y - 1 and ctu_x == n_ctu_x - 1)
                end = cab.decode_bin_trm()
                if wpp and ctu_x == n_ctu_x - 1 and not last:
                    break
                if end and not last:
                    raise ValueError("unexpected end_of_slice")
        if not pps.deblocking_filter_disabled and not \
                sh.deblocking_filter_disabled:
            from ..ops.deblock import deblock_plane
            from ..tables import chroma_qp as _cqp
            boff = sh.beta_offset_div2 or pps.beta_offset_div2
            toff = sh.tc_offset_div2 or pps.tc_offset_div2
            deblock_plane(fs.y, fs.edges_ver, fs.edges_hor, sh.qp,
                          boff, toff, False,
                          bit_depth=self.sps.bit_depth_luma)
            deblock_plane(fs.cb, fs.c_edges_ver, fs.c_edges_hor, sh.qp,
                          boff, toff, True,
                          _cqp(sh.qp, pps.cb_qp_offset),
                          bit_depth=self.sps.bit_depth_luma)
            deblock_plane(fs.cr, fs.c_edges_ver, fs.c_edges_hor, sh.qp,
                          boff, toff, True,
                          _cqp(sh.qp, pps.cr_qp_offset),
                          bit_depth=self.sps.bit_depth_luma)
        # crop to conformance window
        cl, cr_, ct, cb_ = self.sps.conf_win
        w, h = sps.width, sps.height
        y = fs.y[:h, :w]
        cbp = fs.cb[:h // 2, :w // 2]
        crp = fs.cr[:h // 2, :w // 2]
        full = [y.astype(np.uint16), cbp.astype(np.uint16),
                crp.astype(np.uint16)]
        if any(self.sps.conf_win):
            y = y[ct * 2:h - cb_ * 2, cl * 2:w - cr_ * 2]
            cbp = cbp[ct:h // 2 - cb_, cl:w // 2 - cr_]
            crp = crp[ct:h // 2 - cb_, cl:w // 2 - cr_]
        frame = DecodedFrame(poc=sh.pic_order_cnt_lsb,
                             planes=[y.astype(np.uint16),
                                     cbp.astype(np.uint16),
                                     crp.astype(np.uint16)],
                             full_planes=full)
        self.frames.append(frame)
        self._pending_frame = frame

    def _check_hash(self, rbsp: bytes) -> None:
        for ptype, payload in parse_sei_messages(rbsp):
            if ptype != SEI_DECODED_PICTURE_HASH or not self._pending_frame:
                continue
            hash_type, hashes = parse_hash_sei(payload)
            frame = self._pending_frame
            ok = True
            for plane, expect in zip(frame.full_planes, hashes):
                if hash_type == 2:
                    got = plane_checksum(plane, self.sps.bit_depth_luma).to_bytes(4, "big")
                elif hash_type == 0:
                    got = plane_md5(plane, self.sps.bit_depth_luma)
                else:
                    continue
                ok = ok and (got == expect)
            frame.hash_ok = ok
