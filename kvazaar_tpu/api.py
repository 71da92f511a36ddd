"""Public encoder API.

Reference parity: kvazaar src/kvazaar.h kvz_api (config_*, picture_*,
encoder_open/headers/encode) and src/kvazaar.c. Shape: an `Encoder` object
fed frames one at a time, returning encoded byte chunks — the same
1-in/N-out contract, without the vtable indirection.
"""
from __future__ import annotations

import numpy as np

from .bitstream import (BitWriter, NAL_IDR_N_LP, NAL_IDR_W_RADL, NAL_PPS,
                        NAL_SPS, NAL_SUFFIX_SEI, NAL_TRAIL_N, NAL_TRAIL_R,
                        NAL_VPS, nal_unit)
from .cabac import CabacEncoder, ContextSet
from .cfg import Config
from .engine.frame_encoder import IntraFrameEncoder
from .hevc.headers import write_pps, write_slice_header, write_sps, write_vps
from .hevc.params import PPS, SPS, SliceHeader
from .hevc.sei import HASH_CHECKSUM, HASH_MD5, write_hash_sei


def build_sps(cfg: Config) -> SPS:
    import math
    sps = SPS()
    sps.width = cfg.width
    sps.height = cfg.height
    sps.bit_depth_luma = sps.bit_depth_chroma = cfg.input_bitdepth
    if cfg.input_bitdepth > 8:
        sps.ptl.general_profile_idc = 2      # Main 10
    ctb_log2 = int(math.log2(cfg.ctu_size))
    min_cb_log2 = int(math.log2(cfg.min_cu_size))
    sps.log2_min_cb_size = min_cb_log2
    sps.log2_diff_max_min_cb_size = ctb_log2 - min_cb_log2
    sps.log2_min_tb_size = 2
    sps.log2_diff_max_min_tb_size = min(cfg.max_tb_log2, ctb_log2) - 2
    sps.max_transform_hierarchy_depth_intra = cfg.tr_depth_intra
    sps.max_transform_hierarchy_depth_inter = 0
    sps.sao_enabled = 0 if cfg.sao_type == "off" else 1
    sps.scaling_list_enabled = 0 if cfg.scaling_list == "off" else 1
    sps.amp_enabled = 1 if cfg.amp_enable else 0
    sps.strong_intra_smoothing = 1 if cfg.strong_intra_smoothing else 0
    # TMVP on for inter coding (ref src/encoder.c enables it except
    # with tiles, src/cfg.c:922 — cross-tile collocated reads)
    sps.temporal_mvp_enabled = (1 if cfg.intra_period != 1
                                and tuple(cfg.tiles) == (1, 1) else 0)
    if cfg.gop_len > 1:
        # dyadic pyramid: up to 4 retained refs + current picture
        sps.max_dec_pic_buffering_minus1 = 4
        sps.max_num_reorder_pics = cfg.gop_len - 1
    else:
        sps.max_dec_pic_buffering_minus1 = max(1, cfg.ref_frames)
        sps.max_num_reorder_pics = 0
    sps.vui_timing = (cfg.framerate_denom, cfg.framerate_num)
    # level: explicit (--level, stored as level*10 like kvazaar's 40
    # for 4.0) or auto-selected from resolution/rate (spec A.4)
    from .hevc.levels import select_level
    if cfg.level:
        sps.ptl.general_level_idc = cfg.level * 3
    else:
        fps = cfg.framerate_num / max(cfg.framerate_denom, 1)
        sps.ptl.general_level_idc, sps.ptl.general_tier_flag = \
            select_level(cfg.width, cfg.height, fps, cfg.target_bitrate)
    return sps


def build_pps(cfg: Config) -> PPS:
    pps = PPS()
    pps.init_qp = cfg.qp
    pps.sign_data_hiding_enabled = 1 if cfg.signhide_enable else 0
    pps.transform_skip_enabled = 1 if cfg.trskip_enable else 0
    pps.transquant_bypass_enabled = 1 if cfg.lossless else 0
    pps.entropy_coding_sync_enabled = 1 if cfg.wpp else 0
    pps.deblocking_filter_control_present = 1
    pps.deblocking_filter_disabled = 0 if cfg.deblock_enable else 1
    pps.beta_offset_div2 = cfg.deblock_beta
    pps.tc_offset_div2 = cfg.deblock_tc
    pps.loop_filter_across_slices = 1
    if cfg.slices != "none":
        # one slice segment per tile / WPP row; segments after the first
        # are dependent (spec 7.4.7.1; ref encoder_state-bitstream.c:915)
        pps.dependent_slice_segments_enabled = 1
    return pps


_PIPELINE_CACHE: dict = {}


def _cached_pipeline(cls, *args, **kw):
    """Share compiled device pipelines across Encoder instances.

    The jitted programs live on the pipeline object; without this, a
    fresh Encoder with an identical configuration re-traces every
    device program (minutes of host work at 1080p). The traced code is
    qp-independent (qp flows in through the runtime ``consts``), so the
    per-frame qp never enters the key — ``submit(..., qp=)`` resolves
    it. Unhashable arguments (device lists, scaling-list objects) fall
    back to a private instance."""
    try:
        # args = (height, width, qp, ...): drop the qp (index 2) so one
        # compiled pipeline serves a whole QP ladder (BD-rate sweeps)
        key = (cls.__qualname__, args[:2] + args[3:],
               tuple(sorted(kw.items())))
        hash(key)
    except TypeError:
        return cls(*args, **kw)
    pipe = _PIPELINE_CACHE.get(key)
    if pipe is None:
        pipe = _PIPELINE_CACHE[key] = cls(*args, **kw)
    return pipe


class Encoder:
    """All-intra HEVC encoder (inter stages land on this same interface)."""

    def __init__(self, cfg: Config) -> None:
        cfg.validate()
        # options that would change the bitstream but aren't implemented
        # raise here (the cfg.py module contract); performance-only hints
        # (threads/owf) are accepted no-ops like any host scheduler knob
        if cfg.slices not in ("none", "tiles", "wpp"):
            raise ValueError("--slices must be tiles or wpp")
        if cfg.slices == "wpp" and not cfg.wpp:
            raise ValueError("--slices wpp requires --wpp")
        if cfg.slices == "tiles" and tuple(cfg.tiles) == (1, 1):
            raise ValueError("--slices tiles requires a tile grid")
        if cfg.lossless:
            # transquant bypass: loop filters never touch bypass samples
            # and SDH/RDOQ have nothing to optimize
            cfg.deblock_enable = False
            cfg.sao_type = "off"
            cfg.signhide_enable = False
            cfg.rdoq_enable = False
        self.cfg = cfg
        # selective encryption (extras/crypto.py, ref extras/crypto.cpp)
        from .extras.crypto import parse_crypto_spec
        self.crypto_features = parse_crypto_spec(cfg.crypto)
        self.crypto_key = None
        if cfg.crypto_key:
            self.crypto_key = bytes(
                int(t) & 0xff for t in cfg.crypto_key.split(","))
            if len(self.crypto_key) != 16:
                raise ValueError("--key needs 16 comma-separated bytes")
        # device (JAX) compute paths: multi-depth quadtree at CTB 64
        # (all-intra) or the fixed 16x16 grid (intra+inter)
        dev_ok = getattr(cfg, "device", True)
        # inter coding rides the 16-grid pipeline, so CTB 64 is always
        # all-intra in this round -> the quadtree path covers it entirely
        self.use_md = dev_ok and cfg.ctu_size == 64
        if cfg.input_bitdepth > 8 and not self.use_md:
            raise NotImplementedError(
                "10-bit requires the quadtree device path (ctu-size 64) "
                "in this round")
        if cfg.trskip_enable and not self.use_md:
            raise NotImplementedError(
                "--transform-skip requires the quadtree device path "
                "(ctu-size 64)")
        if cfg.trskip_enable and tuple(cfg.tiles) != (1, 1):
            raise NotImplementedError(
                "--transform-skip with tiles is not wired up yet")
        self.use_device = (dev_ok and cfg.ctu_size == 16) or self.use_md
        if self.crypto_features:
            from .extras.crypto import CRYPTO_INTRA_MODE
            if (self.crypto_features & CRYPTO_INTRA_MODE
                    and not self.use_md):
                raise NotImplementedError(
                    "crypto intra_pred_modes requires the quadtree "
                    "path (ctu-size 64)")
        align = 64 if self.use_md else 16 if self.use_device else 8
        self.pad_w = (-cfg.width) % align
        self.pad_h = (-cfg.height) % align
        self.sps = build_sps(cfg)
        self.sps.width = cfg.width + self.pad_w
        self.sps.height = cfg.height + self.pad_h
        if self.pad_w or self.pad_h:
            self.sps.conf_win = (0, self.pad_w // 2, 0, self.pad_h // 2)
        # field coding (kvazaar_field_encoding_adapter,
        # src/kvazaar.c:311-392): each field is a picture of half height
        self.field_mode = cfg.source_scan_type in ("tff", "bff")
        if self.field_mode:
            self.sps.field_seq_flag = 1
            self.sps.ptl.general_interlaced_source_flag = 1
            self.sps.ptl.general_progressive_source_flag = 0
            self.sps.ptl.general_frame_only_constraint_flag = 0
        self.pps = build_pps(cfg)
        # tiles: independent rectangles, loop filter not crossing
        # boundaries (mirrors the reference: PPS writes
        # loop_filter_across_tiles_enabled_flag=0,
        # src/encoder_state-bitstream.c:545, and WPP is disabled when
        # tiles are on, src/cfg.c:927)
        self.tile_grid = None
        if tuple(cfg.tiles) != (1, 1):
            if not self.use_md:
                # use_md implies all-intra this round, which keeps tiles
                # free of cross-tile TMVP hazards (the reference likewise
                # disables TMVP with tiles, src/cfg.c:922)
                raise NotImplementedError(
                    "tiles require the quadtree device path "
                    "(ctu-size 64) in this round")
            if cfg.wpp:
                import sys
                print("Disabling WPP because tiles were enabled.",
                      file=sys.stderr)
                cfg.wpp = False
                self.pps.entropy_coding_sync_enabled = 0
            from .hevc.tiles import TileGrid
            cols, rows = cfg.tiles
            self.tile_grid = TileGrid.make(
                self.sps.width_in_ctbs, self.sps.height_in_ctbs,
                cols, rows)
            self.pps.tiles_enabled = 1
            self.pps.num_tile_columns = cols
            self.pps.num_tile_rows = rows
            self.pps.uniform_spacing = 1
            self.pps.loop_filter_across_tiles = 0
        # adaptive QP (VAQ / ROI): per-CTB delta QP, QG == CTB (the
        # reference likewise uses max_qp_delta_depth 0,
        # src/encoderstate.c:1531)
        # LCU-level rate control rides the same delta-QP machinery
        self.lcu_rc = cfg.target_bitrate > 0 and self.use_md
        self.dqp_enabled = bool(cfg.vaq or cfg.roi_file) or self.lcu_rc
        self._roi = None
        if self.dqp_enabled:
            if not self.use_md:
                raise NotImplementedError(
                    "vaq/roi require the quadtree device path "
                    "(ctu-size 64) in this round")
            self.pps.cu_qp_delta_enabled = 1
            self.pps.diff_cu_qp_delta_depth = 0
            if cfg.roi_file:
                with open(cfg.roi_file) as f:
                    vals = f.read().split()
                rw, rh = int(vals[0]), int(vals[1])
                arr = np.asarray(vals[2:2 + rw * rh],
                                 np.int32).reshape(rh, rw)
                self._roi = (rw, rh, arr)
        self.frame_num = 0
        self.poc = 0
        self._pipeline = None
        self._inter_pipeline = None
        # inter on the quadtree path: P and B at CTB 64 (mixed CU sizes)
        # vaq/roi ride the all-intra quadtree delta-QP machinery; with
        # them set the encoder codes all-intra at ctu 64 (as round 1)
        self.inter_md = (dev_ok and cfg.ctu_size == 64
                         and cfg.intra_period != 1
                         and tuple(cfg.tiles) == (1, 1)
                         and not cfg.lossless
                         and not (cfg.vaq or cfg.roi_file)
                         and cfg.input_bitdepth == 8
                         and cfg.scaling_list == "off")
        if self.inter_md:
            # LCU-level RC delta-QP stays off on the inter quadtree path
            # this round; frame-level RC still applies
            self.lcu_rc = False
            self.dqp_enabled = False
            self.pps.cu_qp_delta_enabled = 0
        if (cfg.smp_enable or cfg.amp_enable) and not self.inter_md \
                and cfg.intra_period != 1:
            raise NotImplementedError(
                "SMP/AMP requires the quadtree inter path (ctu-size 64)")
        self.inter_enabled = ((self.use_device and not self.use_md
                               and cfg.intra_period != 1)
                              or self.inter_md)
        self.gop_enabled = (cfg.gop_len > 1 and self.inter_enabled
                            and not cfg.gop_lowdelay)
        if cfg.gop_len > 1 and not self.inter_enabled:
            raise NotImplementedError(
                "B-pyramid GOPs require the device pipeline "
                "(ctu-size 16 or 64) in this round")
        if self.use_device:
            if self.inter_md:
                from .models.inter_md import MdInterPipeline
                self.n_refs = max(1, min(cfg.ref_frames, 4))
                self._inter_pipeline = _cached_pipeline(
                    MdInterPipeline,
                    self.sps.height, self.sps.width, cfg.qp,
                    n_refs=self.n_refs,
                    # B everywhere inter runs: B pyramids AND low-delay
                    # generalized-B (both lists past; bi-averaging two
                    # hypotheses is a large gain on noisy content —
                    # the reference's lp GOPs are B slices too,
                    # src/cfg.c:1433). The jit is lazy: configs that
                    # never submit a B frame never trace it.
                    b_slices=cfg.intra_period != 1,
                    pu_depth_inter=tuple(cfg.pu_depth_inter),
                    deblock=cfg.deblock_enable,
                    deblock_beta=cfg.deblock_beta,
                    deblock_tc=cfg.deblock_tc, sao=cfg.sao_type,
                    sign_hiding=cfg.signhide_enable,
                    rdoq=cfg.rdoq_enable,
                    pu_depth=tuple(cfg.pu_depth_intra),
                    rd=cfg.rd, subme=cfg.subme, bipred=cfg.bipred,
                    smp=cfg.smp_enable or cfg.amp_enable,
                    amp=cfg.amp_enable,
                    fast_coeff_table=cfg.fast_coeff_table,
                    trskip=cfg.trskip_enable)
                self._pipeline = self._inter_pipeline
            elif self.inter_enabled:
                from .models.inter_pipeline import InterPipeline
                self.n_refs = max(1, min(cfg.ref_frames, 4))
                if self.gop_enabled:
                    # union L0+L1 stack: up to 2 past + 2 future
                    self.n_refs = 4
                self._inter_pipeline = _cached_pipeline(
                    InterPipeline,
                    self.sps.height, self.sps.width, cfg.qp, self.n_refs,
                    deblock=cfg.deblock_enable,
                    deblock_beta=cfg.deblock_beta,
                    deblock_tc=cfg.deblock_tc, sao=cfg.sao_type,
                    sign_hiding=cfg.signhide_enable,
                    rdoq=cfg.rdoq_enable)
                self._pipeline = self._inter_pipeline
            else:
                pipe_kw = dict(
                    deblock=cfg.deblock_enable,
                    deblock_beta=cfg.deblock_beta,
                    deblock_tc=cfg.deblock_tc, sao=cfg.sao_type,
                    sign_hiding=cfg.signhide_enable,
                    rdoq=cfg.rdoq_enable)
                if self.use_md:
                    pipe_kw.update(delta_qp=self.dqp_enabled,
                                   wpp=bool(cfg.wpp),
                                   bit_depth=cfg.input_bitdepth,
                                   pu_depth=tuple(cfg.pu_depth_intra),
                                   rd=cfg.rd,
                                   fast_coeff_table=cfg.fast_coeff_table,
                                   trskip=cfg.trskip_enable)
                    if cfg.scaling_list != "off":
                        from .hevc.scaling import (ScalingLists,
                                                   load_cqmfile)
                        if cfg.cqmfile:
                            sl = load_cqmfile(cfg.cqmfile)
                            self.sps.scaling_lists = sl
                        else:
                            sl = ScalingLists()
                        pipe_kw.update(scaling=sl)
                    if cfg.lossless:
                        pipe_kw.update(lossless=True, deblock=False,
                                       sao="off", sign_hiding=False,
                                       rdoq=False)
                elif cfg.lossless:
                    raise NotImplementedError(
                        "lossless requires the quadtree device path "
                        "(ctu-size 64) in this round")
                elif cfg.scaling_list != "off":
                    raise NotImplementedError(
                        "scaling lists require the quadtree device "
                        "path (ctu-size 64) in this round")
                if self.tile_grid is not None:
                    # multi-device: route uniform tile grids through one
                    # shard_mapped program over the mesh (tiles are
                    # independent, so the stream is byte-identical to the
                    # sequential per-tile path)
                    self._pipeline = None
                    if not self.dqp_enabled and cfg.mesh_tiles != "off":
                        import jax
                        from .parallel.mesh import (MeshTiledIntraPipeline,
                                                    grid_is_uniform,
                                                    mesh_shape_for)
                        devs = jax.devices()
                        g = self.tile_grid
                        if (grid_is_uniform(g) and g.n_tiles > 1
                                and mesh_shape_for(g, len(devs))
                                is not None):
                            self._pipeline = MeshTiledIntraPipeline(
                                devs, self.sps.height, self.sps.width,
                                cfg.qp, g, ctb=64, **pipe_kw)
                    if self._pipeline is None:
                        from .parallel.tiled import TiledIntraPipeline
                        self._pipeline = TiledIntraPipeline(
                            self.sps.height, self.sps.width, cfg.qp,
                            self.tile_grid, ctb=64, **pipe_kw)
                else:
                    if self.use_md:
                        from .models.intra_md import \
                            MdIntraPipeline as Pipe
                    else:
                        from .models.intra_pipeline import \
                            IntraPipeline as Pipe
                    self._pipeline = _cached_pipeline(
                        Pipe, self.sps.height, self.sps.width, cfg.qp,
                        **pipe_kw)
        if cfg.sao_type != "off" and not self.use_device:
            raise NotImplementedError(
                "SAO requires the device pipeline (ctu-size 16) "
                "in this round")
        self._lp = None
        if cfg.gop_lowdelay and self.inter_enabled:
            from .engine.gop import lp_gop_table
            self._lp = lp_gop_table(cfg.gop_len, *cfg.gop_lp,
                                    max(1, cfg.ref_frames))
        # DPB: newest-first reconstructed reference pictures (device- or
        # host-resident), trimmed to n_refs
        self._dpb: list[dict] = []
        # TMVP collocated motion fields, snapshotted per coded reference
        # frame ({"poc", "mv" [H/4,W/4,2,2], "ref_poc" [H/4,W/4,2]});
        # mirrors the decoder's retained ref-entry motion (src/inter.c
        # :836-920 temporal candidates)
        self._motion_fields: dict[int, dict] = {}
        if self.gop_enabled:
            from .engine.gop import GopScheduler
            self._sched = GopScheduler(cfg.gop_len, cfg.intra_period,
                                       base_qp=cfg.qp)
            self._gop_buf: list[tuple] = []   # display-order pending frames
            self._idr_disp = 0                # display index of POC 0
            self._gop_lo = 0                  # POC of last coded anchor
            self._next_disp = 0
        self._rc = None
        # rc_algorithm no-rc means constant QP even with a bitrate set
        # (kvazaar: RC selection strictly by rc_algorithm)
        if cfg.target_bitrate > 0 and cfg.rc_algorithm != "no-rc":
            from .engine.rate_control import OBARateControl, RateControl
            if cfg.rc_algorithm == "oba" and not self.use_md:
                import sys
                print("OBA rate control needs the quadtree path "
                      "(ctu-size 64); falling back to lambda RC.",
                      file=sys.stderr)
                cfg.rc_algorithm = "lambda"
            # without inter coding every frame is an IDR, so the RC must
            # treat the stream as all-intra (no IDR bit boost)
            rc_cls = (OBARateControl if cfg.rc_algorithm == "oba"
                      else RateControl)
            self._rc = rc_cls(self.sps.width, self.sps.height,
                              cfg.target_bitrate,
                              cfg.framerate_num / cfg.framerate_denom,
                              1 if not self.inter_enabled
                              else cfg.intra_period,
                              intra_bits=cfg.intra_bits,
                              gop_len=max(cfg.gop_len, 1),
                              rdo=cfg.rd)

    def _deblock_recon(self, rec, decisions=None, is_idr=True,
                       qp=None, ref_pocs=(), edges=None):
        """Apply the in-loop deblocking filter to the reconstruction.
        Intra frames: BS=2 on every TU-grid edge. P frames: boundary
        strengths computed from the device decisions (spec 8.7.2.4)."""
        from .ops.deblock import compute_bs, deblock_frame
        from .tables import chroma_qp
        cfg = self.cfg
        w, h = self.sps.width, self.sps.height
        if qp is None:
            qp = cfg.qp
        if edges is not None:
            # actual TU-edge maps recorded while coding (cropped to the
            # picture in case the host encoder padded to CTB multiples)
            ev = edges[0][:h // 4, :w // 8].copy()
            eh = edges[1][:h // 8, :w // 4].copy()
        else:
            tu_l = 16 if self.use_device else min(1 << cfg.cu_log2, 32)
            ev, eh = _grid_edges(h, w, tu_l)
        if not is_idr and decisions is not None:
            rep = 16 // 4
            is_intra4 = np.kron(~decisions["is_inter"],
                                np.ones((rep, rep), bool))
            nz_blocks = decisions["levels_y"].any(axis=(1, 2)).reshape(
                decisions["is_inter"].shape)
            nonzero4 = np.kron(nz_blocks, np.ones((rep, rep), bool))
            mh, mw = h // 4, w // 4
            mv4 = np.zeros((mh, mw, 2, 2), np.int32)
            mv4[:, :, 0, 0] = np.kron(decisions["mv"][:, :, 0],
                                      np.ones((rep, rep), np.int32))
            mv4[:, :, 0, 1] = np.kron(decisions["mv"][:, :, 1],
                                      np.ones((rep, rep), np.int32))
            no_ref = -(1 << 30)
            ref_poc4 = np.full((mh, mw, 2), no_ref, np.int64)
            pocs = np.asarray(ref_pocs, np.int64)
            blk_poc = pocs[np.clip(decisions.get(
                "ref_idx", np.zeros_like(decisions["is_inter"], np.int32)),
                0, len(pocs) - 1)]
            poc4 = np.kron(blk_poc, np.ones((rep, rep), np.int64))
            ref_poc4[:, :, 0] = np.where(~is_intra4, poc4, no_ref)
            ev = compute_bs(ev, True, is_intra4, nonzero4, mv4, ref_poc4,
                            no_ref)
            eh = compute_bs(eh, False, is_intra4, nonzero4, mv4, ref_poc4,
                            no_ref)
        y, cb, cr = deblock_frame(
            np.asarray(rec[0]).astype(np.int32),
            np.asarray(rec[1]).astype(np.int32),
            np.asarray(rec[2]).astype(np.int32),
            ev, eh, qp, chroma_qp(qp, self.pps.cb_qp_offset),
            chroma_qp(qp, self.pps.cr_qp_offset),
            cfg.deblock_beta, cfg.deblock_tc)
        return [y.astype(np.uint16), cb.astype(np.uint16),
                cr.astype(np.uint16)]

    def _push_ref(self, entry: dict, keep: set | None = None) -> None:
        self._dpb.insert(0, entry)
        if keep is None:
            del self._dpb[getattr(self, "n_refs", 1):]
        else:
            kept = set(keep) | {entry["poc"]}
            self._dpb = [e for e in self._dpb if e["poc"] in kept]

    # -- headers ---------------------------------------------------------------

    def headers(self) -> bytes:
        out = nal_unit(write_vps(self.sps), NAL_VPS)
        out += nal_unit(write_sps(self.sps), NAL_SPS)
        out += nal_unit(write_pps(self.pps), NAL_PPS)
        return out

    # -- frames ----------------------------------------------------------------

    def _qp_map_for(self, y, cb, cr, base_qp: int,
                    is_idr: bool = True) -> np.ndarray:
        """Per-CTB QP from LCU-level rate control, VAQ variance offsets
        and/or the ROI map (kvazaar src/encoderstate.c:1444-1526,
        rate_control.c:1082)."""
        cfg = self.cfg
        rc = self.sps.height // 64
        cc = self.sps.width // 64
        if self.lcu_rc and self._rc is not None:
            qp = self._rc.lcu_qp_map((rc, cc), base_qp, is_idr,
                                     y_plane=y).astype(np.float64)
        else:
            qp = np.full((rc, cc), base_qp, np.float64)
        if self._roi is not None:
            rw, rh, arr = self._roi
            rx = np.arange(cc) * rw // cc
            ry = np.arange(rc) * rh // rc
            qp += arr[ry[:, None], rx[None, :]]
        if cfg.vaq:
            d = cfg.vaq * 0.1
            yf = np.asarray(y, np.float64)
            cbf_ = np.asarray(cb, np.float64)
            crf = np.asarray(cr, np.float64)
            fvar = yf.var() + cbf_.var() + crf.var()

            def blkvar(p, n):
                return p.reshape(rc, n, cc, n).var(axis=(1, 3))

            lvar = blkvar(yf, 64) + blkvar(cbf_, 32) + blkvar(crf, 32)
            with np.errstate(divide="ignore"):
                aq = d * (np.log(lvar) - np.log(fvar))
            off = np.sign(aq) * np.floor(np.abs(aq) + 0.5)  # C round()
            # half the spec delta range, as the reference clips
            # (rate_control.c:1163-1166)
            qp += np.clip(np.nan_to_num(off, nan=0.0, neginf=-13.0),
                          -13, 12)
        return np.clip(qp, 0, 51).astype(np.int32)

    def submit_frames(self, frames) -> list[dict]:
        """Batched all-intra submission: B independent frames in ONE
        jitted device program (frame-level parallelism the TPU way —
        the wavefront loop's small per-wave batches become B x wider).
        Constant-QP 16-grid path only; everything else uses
        submit_frame."""
        cfg = self.cfg
        padded = []
        for (y, cb, cr) in frames:
            if self.pad_w or self.pad_h:
                y = np.pad(y, ((0, self.pad_h), (0, self.pad_w)),
                           mode="edge")
                cb = np.pad(cb, ((0, self.pad_h // 2),
                                 (0, self.pad_w // 2)), mode="edge")
                cr = np.pad(cr, ((0, self.pad_h // 2),
                                 (0, self.pad_w // 2)), mode="edge")
            padded.append((y, cb, cr))
        devs = self._pipeline.submit_many([p[0] for p in padded],
                                          [p[1] for p in padded],
                                          [p[2] for p in padded],
                                          qp=self.cfg.qp)
        metas = []
        for (y, cb, cr), dev in zip(padded, devs):
            metas.append({"is_idr": True, "poc": 0, "qp": cfg.qp,
                          "frame_num": self.frame_num, "y": y, "cb": cb,
                          "cr": cr, "slice_type": 2, "is_ref": True,
                          "l0": [], "l1": [], "union": [], "keep": None,
                          "ref_pocs": [], "dev": dev,
                          "pushed_ref": False, "dpb_pocs": []})
            self.frame_num += 1
        return metas

    def submit_frame(self, y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray) -> dict:
        """Dispatch a frame's device work (async); returns a pending token
        for finalize_frame. OWF analog: the next frame's device compute
        overlaps this frame's host entropy coding. Low-delay path (no B
        pyramid; see push_frame for GOP coding)."""
        cfg = self.cfg
        # intra_period semantics follow kvazaar (src/cfg.c): 1 = all
        # intra, 0 = only the first frame intra, N = IDR every N frames.
        is_idr = (cfg.intra_period == 1 or
                  (cfg.intra_period > 1 and
                   self.frame_num % cfg.intra_period == 0)
                  or not self._dpb or not self.inter_enabled)
        if is_idr:
            self.poc = 0
            self._dpb.clear()
        from .engine.gop import FrameSpec
        lp = getattr(self, "_lp", None)
        if lp is not None and not is_idr:
            # low-delay GOP structure (--gop lp-gGdDtT): layered QP,
            # nearest-lower-layer + keyframe references, selective
            # retention (ref src/cfg.c:1433)
            g = cfg.gop_len
            pos = ((self.poc - 1) % g) + 1
            ent = lp[pos - 1]
            dpb_pocs = [e["poc"] for e in self._dpb]
            l0 = []
            for delta in ent["ref_neg"]:
                p = self.poc - delta
                if p >= 0 and p in dpb_pocs and p not in l0:
                    l0.append(p)
            if not l0 and dpb_pocs:
                l0 = dpb_pocs[:1]
            keys = sorted((p for p in dpb_pocs if p % g == 0),
                          reverse=True)[:cfg.ref_frames]
            keep = set(keys) | set(l0) | set(dpb_pocs[:1])
            use_b = (self.inter_md and cfg.bipred
                     and getattr(self._inter_pipeline, "b_slices",
                                 False))
            l0 = l0[:max(1, cfg.ref_frames)]
            spec = FrameSpec(disp_idx=self.frame_num, poc=self.poc,
                             is_idr=False, is_ref=bool(ent["is_ref"]),
                             slice_type=0 if use_b else 1,
                             layer=ent["layer"],
                             qp_offset=ent["qp_offset"],
                             l0=l0, l1=list(l0) if use_b else [],
                             keep=keep)
        else:
            from .engine.gop import intra_qp_offset
            use_b = (not is_idr and self.inter_md and cfg.bipred
                     and getattr(self._inter_pipeline, "b_slices",
                                 False))
            l0 = [] if is_idr else [e["poc"] for e in self._dpb]
            spec = FrameSpec(
                disp_idx=self.frame_num, poc=self.poc,
                is_idr=is_idr, is_ref=True,
                slice_type=2 if is_idr else (0 if use_b else 1),
                qp_offset=(intra_qp_offset(cfg.gop_len)
                           if is_idr and lp is not None else 0),
                l0=l0, l1=list(l0) if use_b else [],
                keep=None)
        self.frame_num += 1
        self.poc += 1
        return self._submit_spec(spec, y, cb, cr)

    def _submit_spec(self, spec, y, cb, cr) -> dict:
        cfg = self.cfg
        if self.pad_w or self.pad_h:
            y = np.pad(y, ((0, self.pad_h), (0, self.pad_w)), mode="edge")
            cb = np.pad(cb, ((0, self.pad_h // 2), (0, self.pad_w // 2)),
                        mode="edge")
            cr = np.pad(cr, ((0, self.pad_h // 2), (0, self.pad_w // 2)),
                        mode="edge")
        qp = (self._rc.frame_qp(spec.is_idr, y_plane=y,
                                layer=getattr(spec, "layer", 0))
              if self._rc else cfg.qp) + spec.qp_offset
        union = list(spec.l0) + [p for p in spec.l1 if p not in spec.l0]
        meta = {"is_idr": spec.is_idr, "poc": spec.poc, "qp": qp,
                "frame_num": spec.disp_idx, "y": y, "cb": cb, "cr": cr,
                "slice_type": spec.slice_type, "is_ref": spec.is_ref,
                "l0": list(spec.l0), "l1": list(spec.l1), "union": union,
                "keep": spec.keep, "ref_pocs": union, "dev": None,
                "layer": getattr(spec, "layer", 0),
                "nal": getattr(spec, "nal", "")}
        if spec.slice_type == 0:
            by_poc = {e["poc"]: e for e in self._dpb}
            r0 = [by_poc[p] for p in spec.l0]
            r1 = [by_poc[p] for p in spec.l1]
            meta["dev"] = self._inter_pipeline.submit_inter_b(
                y, cb, cr,
                ([e["y"] for e in r0], [e["cb"] for e in r0],
                 [e["cr"] for e in r0]),
                ([e["y"] for e in r1], [e["cb"] for e in r1],
                 [e["cr"] for e in r1]),
                spec.l0, spec.l1, qp=qp)
        elif spec.slice_type == 1:
            by_poc = {e["poc"]: e for e in self._dpb}
            refs = [by_poc[p] for p in union]
            if self.inter_md:
                meta["dev"] = self._inter_pipeline.submit_inter(
                    y, cb, cr, [e["y"] for e in refs],
                    [e["cb"] for e in refs],
                    [e["cr"] for e in refs],
                    ref_pocs=union, qp=qp)
            else:
                meta["dev"] = self._inter_pipeline.submit_inter(
                    y, cb, cr, [e["y"] for e in refs],
                    [e["cb"] for e in refs],
                    [e["cr"] for e in refs], qp=qp)
        elif self._pipeline is not None:
            if self.dqp_enabled:
                meta["dev"] = self._pipeline.submit(
                    y, cb, cr, qp=qp,
                    qp_map=self._qp_map_for(y, cb, cr, qp, spec.is_idr))
            else:
                meta["dev"] = self._pipeline.submit(y, cb, cr, qp=qp)
        if self.inter_enabled and meta["dev"] is not None and spec.is_ref:
            self._push_ref({"poc": spec.poc, "y": meta["dev"]["rec_y"],
                            "cb": meta["dev"]["rec_cb"],
                            "cr": meta["dev"]["rec_cr"]}, spec.keep)
            meta["pushed_ref"] = True
        else:
            meta["pushed_ref"] = False
        # the RPS may only name already-decoded pictures: the retained DPB
        # (post-trim) plus this frame's own references
        meta["dpb_pocs"] = [e["poc"] for e in self._dpb]
        return meta

    # -- GOP (B pyramid) feed ----------------------------------------------------

    def push_frame(self, y: np.ndarray, cb: np.ndarray,
                   cr: np.ndarray) -> list[tuple[bytes, dict]]:
        """Feed one display-order frame; returns zero or more coded frames
        in coding order (the kvazaar input_frame_buffer reorder analog).
        Without a B GOP this encodes immediately."""
        if not self.gop_enabled:
            return [self.encode_frame(y, cb, cr)]
        cfg = self.cfg
        d = self._next_disp
        self._next_disp += 1
        if d == 0 or (not cfg.open_gop and cfg.intra_period > 0
                      and d - self._idr_disp == cfg.intra_period):
            # closed GOP: the buffer is empty here (period % gop == 0);
            # with --open-gop the period boundary becomes a CRA anchor
            # inside plan_span instead of an IDR reset
            spec = self._sched.plan_idr(d)
            self._idr_disp = d
            self._gop_lo = 0
            self._dpb.clear()
            return [self.finalize_frame(self._submit_spec(spec, y, cb, cr))]
        self._gop_buf.append((y, cb, cr))
        if len(self._gop_buf) == cfg.gop_len:
            return self._encode_span()
        return []

    def flush(self) -> list[tuple[bytes, dict]]:
        """Encode any buffered tail as a run of power-of-two pyramids
        (7 leftover frames -> spans of 4+2+1). One big span would put
        the tail anchor a full tail-length away from its reference —
        beyond the motion-search range and a worse predictor (the
        reference's GOP table structures tails the same way)."""
        if not self.gop_enabled or not self._gop_buf:
            return []
        out: list[tuple[bytes, dict]] = []
        while self._gop_buf:
            k = 1
            while k * 2 <= len(self._gop_buf):
                k *= 2
            rest = self._gop_buf[k:]
            self._gop_buf = self._gop_buf[:k]
            out.extend(self._encode_span())
            self._gop_buf = rest
        return out

    def _encode_span(self) -> list[tuple[bytes, dict]]:
        cfg = self.cfg
        lo = self._gop_lo
        hi = lo + len(self._gop_buf)
        intra_anchor = (cfg.open_gop and cfg.intra_period > 0
                        and hi % cfg.intra_period == 0)
        specs = self._sched.plan_span(self._idr_disp, lo, hi,
                                      intra_anchor=intra_anchor)
        frames = {lo + 1 + i: f for i, f in enumerate(self._gop_buf)}
        self._gop_buf = []
        self._gop_lo = hi
        # submit the whole span first (device work for every frame is
        # queued async, B frames consume the anchor's device-resident
        # recon), then run host entropy coding in coding order
        metas = [self._submit_spec(s, *frames[s.poc]) for s in specs]
        return [self.finalize_frame(m) for m in metas]

    def encode_frame(self, y: np.ndarray, cb: np.ndarray,
                     cr: np.ndarray) -> tuple[bytes, dict]:
        """Encode one frame; returns (annexb bytes, info dict)."""
        return self.finalize_frame(self.submit_frame(y, cb, cr))

    def finalize_frame(self, meta: dict) -> tuple[bytes, dict]:
        cfg = self.cfg
        is_idr = meta["is_idr"]
        slice_type = meta.get("slice_type", 2 if is_idr else 1)
        y, cb, cr = meta["y"], meta["cb"], meta["cr"]
        from .bitstream import NAL_CRA_NUT, NAL_RASL_N, NAL_RASL_R
        nal_kind = meta.get("nal", "")
        if is_idr:
            nal_type = NAL_IDR_W_RADL
        elif nal_kind == "CRA":
            nal_type = NAL_CRA_NUT
        elif nal_kind == "RASL":
            nal_type = (NAL_RASL_R if meta.get("is_ref", True)
                        else NAL_RASL_N)
        else:
            nal_type = (NAL_TRAIL_R if meta.get("is_ref", True)
                        else NAL_TRAIL_N)
        sh = SliceHeader()
        sh.pps_id = 0
        sh.slice_type = slice_type
        sh.qp = meta["qp"]
        sh.first_slice_in_pic = 1
        if self.sps.sao_enabled:
            sh.sao_luma = 1
            sh.sao_chroma = 1
        l0 = meta.get("l0", meta.get("ref_pocs", []))
        l1 = meta.get("l1", [])
        if not is_idr:
            from .hevc.params import ShortTermRPS
            poc = meta["poc"]
            sh.pic_order_cnt_lsb = poc & \
                ((1 << self.sps.log2_max_poc_lsb) - 1)
            # RPS: everything that must stay in the DPB (this frame's refs
            # + already-coded pictures later frames need); used flags mark
            # the actives
            rps_set = set(meta.get("dpb_pocs",
                                   meta.get("keep") or ())) \
                | set(l0) | set(l1)
            rps_set.discard(poc)
            past = sorted((p for p in rps_set if p < poc), reverse=True)
            fut = sorted(p for p in rps_set if p > poc)
            sh.short_term_rps = ShortTermRPS(
                delta_pocs_s0=[p - poc for p in past],
                used_s0=[1 if p in l0 else 0 for p in past],
                delta_pocs_s1=[p - poc for p in fut],
                used_s1=[1 if p in l1 else 0 for p in fut])
            sh.short_term_rps_sps_flag = 0
            if (len(l0) != self.pps.num_ref_idx_l0_default_minus1 + 1
                    or (slice_type == 0 and len(l1) !=
                        self.pps.num_ref_idx_l1_default_minus1 + 1)):
                sh.num_ref_idx_active_override = 1
                sh.num_ref_idx_l0_active_minus1 = len(l0) - 1
                if slice_type == 0:
                    sh.num_ref_idx_l1_active_minus1 = len(l1) - 1

        decisions = None
        writer = None
        if slice_type != 2:
            decisions = self._inter_pipeline.materialize(meta["dev"])
            if "size_map8" in decisions:
                from .engine.md_inter_writer import MdPSliceWriter as PW
            else:
                from .engine.inter_writer import PSliceWriter as PW
            # TMVP (src/inter.c:836-920): entries carry the collocated
            # motion field snapshotted after each coded frame; the slice
            # enables TMVP only when every referenced picture has one
            # (so writer candidate derivation == decoder derivation)
            re0 = [dict(self._motion_fields.get(p, {}), poc=p)
                   for p in l0]
            re1 = [dict(self._motion_fields.get(p, {}), poc=p)
                   for p in l1]
            sh.temporal_mvp_enabled = (
                1 if self.sps.temporal_mvp_enabled
                and re0 and all("mv" in e for e in re0 + re1) else 0)
            writer = PW(
                self.sps, self.pps, sh, decisions,
                re0, meta["poc"], ref_entries_l1=re1,
                union_pocs=meta.get("union", l0))
        elif self._pipeline is not None:
            decisions = self._pipeline.materialize(meta["dev"])
        self._last_decisions = decisions  # introspection/tests
        sao_w = None
        if self.sps.sao_enabled and decisions is not None:
            from .engine.sao_writer import SaoWriter
            sao_w = SaoWriter(decisions, bool(sh.sao_luma),
                              bool(sh.sao_chroma),
                              bit_depth=self.sps.bit_depth_luma)
        if writer is None and self.use_md and decisions is not None:
            from .engine.md_writer import MdIntraWriter
            writer = MdIntraWriter(self.sps, self.pps, sh, decisions)
            if self.tile_grid is not None:
                writer.tile_ctb = self.tile_grid.tile_id_ctb
                writer.tile4 = self.tile_grid.tile4_map(self.sps.ctb_size)
        if writer is not None:
            writer.sao_w = sao_w
        n_ctu_x = self.sps.width_in_ctbs
        n_ctu_y = self.sps.height_in_ctbs

        # selective encryption: one keystream per picture, consumed by
        # its substreams in write order (ref crypto_hdl per state)
        crypto_res = None
        if self.crypto_features:
            from .extras.crypto import CryptoHandle
            crypto_res = (CryptoHandle(self.crypto_key),
                          self.crypto_features)

        wpp = bool(self.pps.entropy_coding_sync_enabled)
        substreams: list[bytes] = []
        saved_ctx: ContextSet | None = None
        native_done = False
        lcu_bits = (np.zeros((n_ctu_y, n_ctu_x), np.int64)
                    if self.lcu_rc and writer is not None else None)

        def timed_write(cab, ctu_y, ctu_x):
            if lcu_bits is None:
                writer.write_ctu(ctu_y, ctu_x)
                return
            b0 = cab.bit_count
            writer.write_ctu(ctu_y, ctu_x)
            lcu_bits[ctu_y, ctu_x] = cab.bit_count - b0
        # native (C++) quadtree slice writer: the flagship hot path.
        # Falls back to the Python writer for tiles / delta-QP / lossless
        # (and when the toolchain is unavailable).
        native_motion = None
        seg_mode = cfg.slices != "none"   # one slice segment/substream
        if (writer is not None and self.use_md and slice_type != 2
                and decisions is not None and "size_map8" in decisions
                and "part8" not in decisions
                and self.tile_grid is None and not self.dqp_enabled
                and not cfg.lossless and lcu_bits is None and not seg_mode
                and crypto_res is None and not cfg.trskip_enable
                and (sao_w is not None or not self.sps.sao_enabled)):
            # P/B quadtree slices in C++ (VERDICT r3 #2: the inter host
            # entropy bottleneck) — bit-identical to MdPSliceWriter,
            # validated by tests/test_native_pb.py
            from . import native
            if native.available():
                re0 = writer.helper.ref_list
                re1 = writer.helper.ref_list1
                data, sizes, mv4, refpoc4 = native.encode_md_slice_pb(
                    decisions, sh, re0, meta["poc"], wpp,
                    sdh=bool(self.pps.sign_data_hiding_enabled),
                    ref_entries_l1=re1,
                    union_pocs=meta.get("union", l0),
                    sao_packed=(native.pack_sao(decisions)
                                if self.sps.sao_enabled else None),
                    sao_cmax=(1 << (min(self.sps.bit_depth_luma, 10)
                                    - 5)) - 1,
                    max_merge=5 - sh.five_minus_max_num_merge_cand)
                off = 0
                for s in sizes:
                    substreams.append(data[off:off + s])
                    off += s
                native_done = True
                native_motion = (mv4, refpoc4)
                writer = None
        if (writer is not None and self.use_md and slice_type == 2
                and self.tile_grid is None and not self.dqp_enabled
                and not cfg.lossless and lcu_bits is None and not seg_mode
                and crypto_res is None and not cfg.trskip_enable
                and (sao_w is not None or not self.sps.sao_enabled)):
            from . import native
            if native.available():
                data, sizes = native.encode_md_slice(
                    decisions["size_map8"], decisions["mode_map8"],
                    decisions["levels_y"], decisions["levels_cb"],
                    decisions["levels_cr"], sh.qp, wpp,
                    sdh=bool(self.pps.sign_data_hiding_enabled),
                    sao_packed=(native.pack_sao(decisions)
                                if self.sps.sao_enabled else None),
                    bit_depth=self.sps.bit_depth_luma,
                    mode4=decisions.get("mode_map4"))
                off = 0
                for s in sizes:
                    substreams.append(data[off:off + s])
                    off += s
                native_done = True
                writer = None
        if writer is not None:
            if self.tile_grid is not None:
                # tile-scan CTU order, one substream + fresh contexts per
                # tile, end_of_subset terminator between tiles
                grid = self.tile_grid
                last_xy = (grid.col_bd[-1] - 1, grid.row_bd[-1] - 1)
                bw = cab = None
                cur = -1
                for ctu_x, ctu_y, tid, last_in_tile in grid.scan():
                    if tid != cur:
                        cur = tid
                        bw = BitWriter()
                        cab = CabacEncoder(
                            bw, ContextSet(2 - slice_type, sh.qp))
                        cab.crypto_res = crypto_res
                        writer.cab = cab
                        if hasattr(writer, "reset_qp_chain"):
                            writer.reset_qp_chain()
                    timed_write(cab, ctu_y, ctu_x)
                    last = last_in_tile and (ctu_x, ctu_y) == last_xy
                    # --slices tiles: end_of_slice_segment_flag = 1 at
                    # every tile end instead of the end_of_subset bit
                    cab.encode_bin_trm(
                        1 if last or (seg_mode and last_in_tile) else 0)
                    if last_in_tile:
                        if not last and not seg_mode:
                            cab.encode_bin_trm(1)  # end_of_subset
                        cab.finish()
                        bw.byte_align_one()
                        substreams.append(bw.get_bytes())
            elif not wpp:
                bw = BitWriter()
                cab = CabacEncoder(bw, ContextSet(2 - slice_type, sh.qp))
                cab.crypto_res = crypto_res
                writer.cab = cab
                for ctu_y in range(n_ctu_y):
                    for ctu_x in range(n_ctu_x):
                        timed_write(cab, ctu_y, ctu_x)
                        last = (ctu_y == n_ctu_y - 1
                                and ctu_x == n_ctu_x - 1)
                        cab.encode_bin_trm(1 if last else 0)
                cab.finish()
                bw.byte_align_one()
                substreams.append(bw.get_bytes())
            else:
                for ctu_y in range(n_ctu_y):
                    ctx = (saved_ctx.copy() if saved_ctx is not None
                           else ContextSet(2 - slice_type, sh.qp))
                    bw = BitWriter()
                    cab = CabacEncoder(bw, ctx)
                    cab.crypto_res = crypto_res
                    writer.cab = cab
                    if hasattr(writer, "reset_qp_chain"):
                        writer.reset_qp_chain()
                    for ctu_x in range(n_ctu_x):
                        timed_write(cab, ctu_y, ctu_x)
                        if ctu_x == 1 and n_ctu_x > 1:
                            saved_ctx = ctx.copy()
                        last = (ctu_y == n_ctu_y - 1
                                and ctu_x == n_ctu_x - 1)
                        row_end = ctu_x == n_ctu_x - 1
                        cab.encode_bin_trm(
                            1 if last or (seg_mode and row_end) else 0)
                        if row_end and not last and not seg_mode:
                            cab.encode_bin_trm(1)
                    cab.finish()
                    bw.byte_align_one()
                    substreams.append(bw.get_bytes())
            native_done = True  # slice data done
        elif decisions is not None and not native_done:
            from . import native
            if native.available() and sao_w is None and not seg_mode \
                    and crypto_res is None and not cfg.trskip_enable:
                data, sizes = native.encode_intra_grid(
                    decisions["modes"], decisions["levels_y"],
                    decisions["levels_cb"], decisions["levels_cr"],
                    sh.qp, wpp,
                    sdh=bool(self.pps.sign_data_hiding_enabled))
                off = 0
                for s in sizes:
                    substreams.append(data[off:off + s])
                    off += s
                native_done = True
        enc = None
        if not native_done:
            enc = IntraFrameEncoder(self.sps, self.pps, sh, y, cb, cr, cfg,
                                    decisions=decisions)
            enc.sao_w = sao_w
        if native_done:
            pass
        elif not wpp:
            bw = BitWriter()
            cab = CabacEncoder(bw, ContextSet(0, sh.qp))
            cab.crypto_res = crypto_res
            enc.cab = cab
            for ctu_y in range(n_ctu_y):
                for ctu_x in range(n_ctu_x):
                    enc.encode_ctu(ctu_x, ctu_y)
                    last = (ctu_y == n_ctu_y - 1 and ctu_x == n_ctu_x - 1)
                    cab.encode_bin_trm(1 if last else 0)
            cab.finish()
            bw.byte_align_one()
            substreams.append(bw.get_bytes())
        else:
            for ctu_y in range(n_ctu_y):
                ctx = (saved_ctx.copy() if saved_ctx is not None
                       else ContextSet(0, sh.qp))
                bw = BitWriter()
                cab = CabacEncoder(bw, ctx)
                cab.crypto_res = crypto_res
                enc.cab = cab
                for ctu_x in range(n_ctu_x):
                    enc.encode_ctu(ctu_x, ctu_y)
                    if ctu_x == 1 and n_ctu_x > 1:
                        saved_ctx = ctx.copy()
                    last = (ctu_y == n_ctu_y - 1 and ctu_x == n_ctu_x - 1)
                    row_end = ctu_x == n_ctu_x - 1
                    cab.encode_bin_trm(
                        1 if last or (seg_mode and row_end) else 0)
                    if row_end and not last and not seg_mode:
                        cab.encode_bin_trm(1)  # end_of_subset_one_bit
                cab.finish()
                bw.byte_align_one()
                substreams.append(bw.get_bytes())

        # snapshot this frame's motion field for future TMVP (decoder
        # retains the same data from what it decodes, so writer-side
        # candidate derivation stays symmetric)
        if self.inter_enabled and meta.get("is_ref", True) \
                and self.sps.temporal_mvp_enabled:
            if meta["is_idr"]:
                self._motion_fields.clear()
            if native_motion is not None:
                self._motion_fields[meta["poc"]] = {
                    "poc": meta["poc"], "mv": native_motion[0],
                    "ref_poc": native_motion[1]}
            elif writer is not None and hasattr(writer, "fs"):
                self._motion_fields[meta["poc"]] = {
                    "poc": meta["poc"], "mv": writer.fs.mv,
                    "ref_poc": writer.fs.ref_poc}
            else:
                # intra reference frame: all-NO_REF collocated field
                mh = self.sps.height_in_ctbs * self.sps.ctb_size // 4
                mw = self.sps.width_in_ctbs * self.sps.ctb_size // 4
                self._motion_fields[meta["poc"]] = {
                    "poc": meta["poc"],
                    "mv": np.zeros((mh, mw, 2, 2), np.int32),
                    "ref_poc": np.full((mh, mw, 2), -(1 << 30),
                                       np.int64)}
            keep_mf = set(meta.get("dpb_pocs", [])) | {meta["poc"]}
            for p in list(self._motion_fields):
                if p not in keep_mf:
                    del self._motion_fields[p]

        # entry point offsets count post-emulation (EBSP) bytes; substreams
        # end with a non-zero byte, so per-substream emulation equals
        # whole-slice emulation
        from .bitstream import rbsp_to_ebsp
        slice_nals = None
        if cfg.slices != "none" and len(substreams) > 1:
            # --slices tiles|wpp: one slice segment NAL per substream,
            # the first independent and the rest dependent
            # (spec 7.4.7.1; ref encoder_state-bitstream.c:915-960)
            import copy as _copy
            if cfg.slices == "tiles" and self.tile_grid is not None:
                g = self.tile_grid
                addrs = [g.row_bd[t // (len(g.col_bd) - 1)]
                         * self.sps.width_in_ctbs
                         + g.col_bd[t % (len(g.col_bd) - 1)]
                         for t in range(len(substreams))]
            else:
                addrs = [r * self.sps.width_in_ctbs
                         for r in range(len(substreams))]
            slice_nals = []
            for i, sdata in enumerate(substreams):
                shi = _copy.copy(sh)
                shi.first_slice_in_pic = 1 if i == 0 else 0
                shi.dependent_slice_segment = 0 if i == 0 else 1
                shi.segment_address = addrs[i]
                shi.entry_point_offsets = []
                w = BitWriter()
                write_slice_header(shi, self.sps, self.pps, nal_type, w)
                slice_nals.append(w.get_bytes() + sdata)
        else:
            sh.entry_point_offsets = [len(rbsp_to_ebsp(s))
                                      for s in substreams[:-1]]
            shw = BitWriter()
            write_slice_header(sh, self.sps, self.pps, nal_type, shw)
            slice_rbsp = shw.get_bytes() + b"".join(substreams)

        out = b""
        if cfg.aud_enable:
            # access unit delimiter (ref encoder_state-bitstream.c:58)
            from .bitstream import NAL_AUD
            aud = BitWriter()
            aud.u(2 if slice_type == 0 else 1 if slice_type == 1 else 0, 3)
            aud.byte_align_one()
            out += nal_unit(aud.get_bytes(), NAL_AUD)
        # parameter sets at stream start and every vps_period*intra_period
        # frames (ref encoder.c:594-597, encoderstate.h:367-370)
        vp = cfg.vps_period * cfg.intra_period
        if meta["frame_num"] == 0 or (vp > 0
                                      and meta["frame_num"] % vp == 0):
            out += self.headers()
        if self.field_mode:
            from .bitstream import NAL_PREFIX_SEI
            from .hevc.sei import write_pic_timing_sei
            top_first = self.cfg.source_scan_type == "tff"
            is_top = (meta["frame_num"] % 2 == 0) == top_first
            out += nal_unit(write_pic_timing_sei(1 if is_top else 2),
                            NAL_PREFIX_SEI)
        if slice_nals is not None:
            for s in slice_nals:
                out += nal_unit(s, nal_type)
        else:
            out += nal_unit(slice_rbsp, nal_type)

        # decoded picture hash SEI covers the full (pre-crop) picture
        w, h = self.sps.width, self.sps.height
        if decisions is not None:
            rec = [decisions["rec_y"].astype(np.uint16),
                   decisions["rec_cb"].astype(np.uint16),
                   decisions["rec_cr"].astype(np.uint16)]
        else:
            rec = [enc.rec_y[:h, :w].astype(np.uint16),
                   enc.rec_cb[:h // 2, :w // 2].astype(np.uint16),
                   enc.rec_cr[:h // 2, :w // 2].astype(np.uint16)]
        # device frames are fully in-loop-filtered in-graph (deblock + SAO
        # run before hash/SSE), so their hash/sse outputs stay valid
        device_final = meta["dev"] is not None and self.use_device
        if cfg.deblock_enable and not device_final:
            rec = [np.asarray(p) for p in rec]
            rec = self._deblock_recon(
                rec, decisions, is_idr, meta["qp"],
                meta.get("ref_pocs", ()),
                edges=(None if enc is None
                       else (enc.edges_ver, enc.edges_hor)))
        if self.inter_enabled and not meta.get("pushed_ref", False) \
                and meta.get("is_ref", True):
            self._push_ref({"poc": meta["poc"],
                            "y": rec[0], "cb": rec[1], "cr": rec[2]},
                           meta.get("keep"))
        if cfg.hash != "none":
            htype = HASH_CHECKSUM if cfg.hash == "checksum" else HASH_MD5
            if (htype == HASH_CHECKSUM and device_final
                    and decisions is not None and "hash" in decisions):
                sei = write_hash_sei([], htype,
                                     self.sps.bit_depth_luma,
                                     checksums=decisions["hash"])
            else:
                sei = write_hash_sei([np.asarray(p) for p in rec], htype,
                                     self.sps.bit_depth_luma)
            out += nal_unit(sei, NAL_SUFFIX_SEI)

        crop = [rec[0][:cfg.height, :cfg.width],
                rec[1][:cfg.height // 2, :cfg.width // 2],
                rec[2][:cfg.height // 2, :cfg.width // 2]]
        if decisions is not None and "sse" in decisions and device_final:
            npix = [self.sps.width * self.sps.height,
                    self.sps.width * self.sps.height // 4,
                    self.sps.width * self.sps.height // 4]
            mv = float((1 << self.sps.bit_depth_luma) - 1)
            psnr = [99.0 if s_ == 0 else
                    10.0 * np.log10(mv ** 2 * n_ / s_)
                    for s_, n_ in zip(decisions["sse"], npix)]
        else:
            psnr = _psnr((y[:cfg.height, :cfg.width],
                          cb[:cfg.height // 2, :cfg.width // 2],
                          cr[:cfg.height // 2, :cfg.width // 2]),
                         [np.asarray(p) for p in crop],
                         self.sps.bit_depth_luma)
        if self._rc is not None:
            self._rc.update(len(out) * 8, is_idr,
                            layer=meta.get("layer", 0))
            if lcu_bits is not None:
                self._rc.update_lcu(lcu_bits)
                if hasattr(self._rc, "update_oba"):
                    self._rc.update_oba(lcu_bits, (y, cb, cr), rec,
                                        layer=meta.get("layer", 0))
        info = {
            "poc": meta["poc"],
            "bytes": len(out),
            "qp": meta["qp"],
            "recon": rec,
            "recon_out": crop,
            "psnr": psnr,
        }
        if cfg.stats_file_prefix:
            # per-frame RC/observability dump, one line per frame
            # (ref src/rate_control.c:98-106 --stats-file-prefix)
            lam = 0.57 * 2.0 ** ((meta["qp"] - 12) / 3.0)
            with open(cfg.stats_file_prefix + "frames.txt", "a") as f:
                f.write(f"{meta['poc']} {meta['qp']} {lam:.4f} "
                        f"{len(out) * 8} {psnr[0]:.4f} {psnr[1]:.4f} "
                        f"{psnr[2]:.4f}\n")
        return out, info


def _grid_edges(h: int, w: int, tu: int):
    """Static deblocking edge maps for a uniform TU grid (luma size tu)."""
    ev = np.zeros((h // 4, w // 8), dtype=bool)
    eh = np.zeros((h // 8, w // 4), dtype=bool)
    for x8 in range(1, w // 8):
        if (x8 * 8) % tu == 0:
            ev[:, x8] = True
    for y8 in range(1, h // 8):
        if (y8 * 8) % tu == 0:
            eh[y8, :] = True
    return ev, eh


def _psnr(src_planes, rec_planes, bit_depth: int = 8) -> list[float]:
    out = []
    mv = float((1 << bit_depth) - 1)
    for s, r in zip(src_planes, rec_planes):
        mse = np.mean((s.astype(np.float64) - r.astype(np.float64)) ** 2)
        out.append(99.0 if mse == 0 else 10.0 * np.log10(mv ** 2 / mse))
    return out


def encode_sequence(cfg: Config, frames,
                    encoder: "Encoder | None" = None) -> tuple[bytes,
                                                               list[dict]]:
    """Encode an iterable of (y, cb, cr) frames to an Annex-B stream,
    overlapping device compute of frame N+1 with host entropy coding of
    frame N (the OWF analog) whenever the reference picture stays on
    device. Pass `encoder` to reuse an already-warm Encoder (its jitted
    pipelines are per-instance)."""
    if cfg.source_scan_type in ("tff", "bff") and \
            not getattr(cfg, "_fields_split", False):
        # field-coding adapter (kvazaar src/kvazaar.c:311-392): each
        # frame becomes two half-height field pictures
        import copy
        fcfg = copy.copy(cfg)
        fcfg.height = cfg.height // 2
        fcfg._fields_split = True
        tff = cfg.source_scan_type == "tff"
        fields = []
        for (y, cb, cr) in frames:
            a = (y[0::2], cb[0::2], cr[0::2])
            b = (y[1::2], cb[1::2], cr[1::2])
            fields.extend((a, b) if tff else (b, a))
        return encode_sequence(fcfg, fields, encoder=encoder)
    enc = encoder if encoder is not None else Encoder(cfg)
    out = b""
    infos = []
    if getattr(enc, "gop_enabled", False):
        for (y, cb, cr) in frames:
            for chunk, info in enc.push_frame(y, cb, cr):
                out += chunk
                infos.append(info)
        for chunk, info in enc.flush():
            out += chunk
            infos.append(info)
        return out, infos
    overlap = enc.use_device
    if (overlap and cfg.frame_batch > 1
            and not getattr(enc, "inter_enabled", False)
            and getattr(enc, "_rc", None) is None
            and not getattr(enc, "dqp_enabled", False)
            and hasattr(enc._pipeline, "submit_many")):
        # frame-batched all-intra (opt-in --frame-batch): submit groups
        # of B frames as one device program, entropy-code the previous
        # group meanwhile. On current hardware the async per-frame
        # pipeline usually wins (vmapped wavefront gathers cost more
        # than the loop latency saved), so this is off by default.
        frames = list(frames)
        B = cfg.frame_batch
        prev: list = []
        for i in range(0, len(frames), B):
            metas = enc.submit_frames(frames[i:i + B])
            for m in prev:
                chunk, info = enc.finalize_frame(m)
                out += chunk
                infos.append(info)
            prev = metas
        for m in prev:
            chunk, info = enc.finalize_frame(m)
            out += chunk
            infos.append(info)
        return out, infos
    pending = None
    for (y, cb, cr) in frames:
        if not overlap:
            chunk, info = enc.encode_frame(y, cb, cr)
            out += chunk
            infos.append(info)
            continue
        meta = enc.submit_frame(y, cb, cr)
        if pending is not None:
            chunk, info = enc.finalize_frame(pending)
            out += chunk
            infos.append(info)
        pending = meta
    if pending is not None:
        chunk, info = enc.finalize_frame(pending)
        out += chunk
        infos.append(info)
    return out, infos
