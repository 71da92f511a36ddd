"""Multi-depth (quadtree) all-intra pipeline: CTB 64, CU/TU leaves 8/16/32.

One jitted program per frame size does all three stages on device:

1. `search`: for every aligned block of every size, evaluate all 35 intra
   modes (constant-matrix matmuls + Hadamard SATD on the MXU, clamped
   source refs), then compute a true RD leaf cost (exact integer T/Q/IT
   distortion + context-free CABAC-bin rate model) for the best mode.
2. `partition DP`: bottom-up quadtree merge (8->16->32) minimising
   D + lambda*R with split-flag/mode-bit costs, producing a per-8x8-cell
   size map and a leaf mode map.
3. `self-scheduled wavefront recon`: a while_loop fires, each wave, every
   TU whose reference samples (left / corner / top / below-left /
   top-right, with z-order availability) are already reconstructed. The
   ready test is a handful of masked window reductions over the written
   mask; ready TUs are compacted with static-size nonzero and processed
   batched per size class. Slot overflow just delays a TU one wave, so
   the schedule is correct for any partition without host involvement.

This replaces kvazaar's threadqueue job graph (src/threadqueue.c) and
recursive search_cu (src/search.c:646): the dependency graph *is* the
device program; scheduling is data-driven inside the jit.

Availability/z-order note: a neighbouring sample is available iff its
leaf precedes this TU's leaf in coding (z-/Morton) order. Below-left and
top-right availability are prefix-shaped (Morton order is monotone along
a column/row), so per-TU counts n_bl/n_tr describe them exactly
(spec 6.4.1, 8.4.4.2.2).

Reconstruction and coefficient levels are bit-exact vs the spec; the
decoded-picture-hash SEI is the gate (tests decode every stream).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.intra_matrices import (build_filter_matrix, build_pred_matrices,
                                  ref_vec_len)
from ..tables import DCT_MATRICES, DST4, chroma_qp
from .intra_pipeline import IntraPipeline, _hadamard


def _morton(rows: int, cols: int) -> np.ndarray:
    """Coding-order key per 8x8 cell: CTB raster index, then Morton
    (z-order) within the CTB. Plain whole-grid Morton would be wrong for
    non-square CTB grids (it would order CTB(1,1) before CTB(0,2))."""
    r = np.arange(rows, dtype=np.int64)[:, None]
    c = np.arange(cols, dtype=np.int64)[None, :]

    def spread(v):
        v = v & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    ctbs_per_row = (cols + 7) // 8
    ctb_idx = (r >> 3) * ctbs_per_row + (c >> 3)
    inner = 2 * spread(r & 7) + spread(c & 7)
    return (ctb_idx * 64 + inner).astype(np.int32)


class MdIntraPipeline(IntraPipeline):
    """Quadtree all-intra encoder compute path for one frame size."""

    SIZES = (8, 16, 32)
    CTB = 64
    # DP bit costs are fractional-bit CABAC costs at the slice's context
    # init states (engine/bit_cost.py — the reference's
    # kvz_f_entropy_bits analog, src/cabac.h:130), carried in the consts
    # vector `dpc` with this layout:
    DPC_SPLIT0, DPC_SPLIT1 = 0, 1            # split_cu_flag
    DPC_CBF_Y0, DPC_CBF_Y1 = 2, 3            # cbf_luma, trafo depth 0
    DPC_CBF_Y0_D1, DPC_CBF_Y1_D1 = 4, 5      # cbf_luma, trafo depth > 0
    DPC_CBF_C0, DPC_CBF_C1 = 6, 7            # cbf_cb/cr, depth 0
    DPC_CBF_C0_D1, DPC_CBF_C1_D1 = 8, 9      # cbf_cb/cr, depth 1
    DPC_CHROMA_DM = 10                       # intra_chroma_pred_mode (DM)
    DPC_PART_2NX2N, DPC_PART_NXN = 11, 12    # part_mode at min CB
    INIT_TYPE = 0                            # I-slice contexts
    # legacy constants kept for the fixed-grid base pipeline
    MODE_BITS = 4.0
    SPLIT_BITS = 1.0
    TU_BITS = 8.0
    # Leaf sweeps predict from SOURCE neighbours (the batched design has
    # no recon refs at search time), which flatters small blocks: the
    # real wavefront recon predicts from QUANTIZED neighbours, and the
    # resulting prediction degradation concentrates at block borders,
    # i.e. scales ~ 1/n per pixel with the local quantization noise.
    # Model it as dist *= (1 + K/n) in the DP leaf costs (the leaf's own
    # per-pixel distortion is the proxy for its neighbours' recon
    # noise). Without this the DP overselects 8x8/NxN at high QP and
    # loses both rate AND PSNR vs the reference (sines clip, QP37:
    # 1987 B / 39.3 dB vs depth-1-2-forced 1431 B / 40.2 dB).
    REF_NOISE_K = 4.0

    def __init__(self, height: int, width: int, qp: int,
                 deblock: bool = False, deblock_beta: int = 0,
                 deblock_tc: int = 0, sao: str = "off",
                 sign_hiding: bool = False, rdoq: bool = False,
                 delta_qp: bool = False, wpp: bool = False,
                 scaling=None, lossless: bool = False,
                 bit_depth: int = 8,
                 pu_depth: tuple[int, int] = (1, 3),
                 rd: int = 0, fast_coeff_table: str = "",
                 trskip: bool = False) -> None:
        assert height % self.CTB == 0 and width % self.CTB == 0
        self.bd = bit_depth
        self.maxv = (1 << bit_depth) - 1
        # --transform-skip: per-4x4-TU RD competition of the shifted
        # (non-transformed) residual vs the DST/DCT path (reference
        # transform.c:163-196 + search_intra.c:94-152)
        self.trskip = bool(trskip) and not lossless
        # allowed leaf sizes from the depth range (0=64, 1=32, 2=16,
        # 3=8, 4=NxN, kvazaar's --pu-depth-intra scale, ref cfg.c:1017);
        # at least one size must remain. A 64 leaf is one CU whose TU
        # tree is forced-split once (spec 7.3.8.8) into four 32x32 TUs.
        # Depth 4 = NxN partitioning of an 8x8 CU: four 4x4 PUs with
        # independent modes and four 4x4 DST TUs (IntraSplitFlag).
        lo, hi = max(pu_depth[0], 0), min(pu_depth[1], 4)
        if lo > hi:
            lo = hi = min(max(pu_depth[0], 0), 4)
        self.allow = {64: lo <= 0, 32: lo <= 1 <= hi, 16: lo <= 2 <= hi,
                      8: hi >= 3, 4: hi >= 4}
        # lo == 4 forces every 8x8 CU to NxN (no 2Nx2N at depth 3)
        self.force_nxn = lo >= 4
        if not any(self.allow.values()):
            self.allow[16] = True
        # TPU f32 matmuls default to bf16 inputs — exact for 8-bit
        # samples (<= 2^9 fits the bf16 mantissa) but NOT for 10-bit;
        # the normative prediction matmuls then need full f32
        self._prec = (jax.lax.Precision.HIGHEST if bit_depth > 8
                      else None)
        # rd ladder: number of best-SATD modes that get a full RD cost
        # per leaf (the reference's --rd widens its RDO candidate list
        # the same way, src/cfg.c preset table / search_intra_rdo)
        self.rd_cands = max(1, min(int(rd), 3) + 1)
        # learned fast coefficient-cost weights (reference
        # src/fast_coeff_cost.c analog; trained offline by
        # tools/rdcost_weights.py). Keyed by log2 TU size then QP; empty
        # dict (missing module) falls back to the analytic estimate.
        # The per-QP weight values ride the consts dict ("fcw") so rate
        # control can change QP without retracing.
        try:
            from ..engine.fast_cost_weights import FAST_COST_WEIGHTS
            self.fast_cost = dict(FAST_COST_WEIGHTS)
        except ImportError:
            self.fast_cost = {}
        if fast_coeff_table:
            # --fast-coeff-table FILE: JSON {log2size: {qp: [8 floats]}}
            # (the reference loads its binary table the same way,
            # src/encoder.c:286-299)
            import json
            with open(fast_coeff_table) as f:
                raw = json.load(f)
            self.fast_cost = {
                int(k): {int(q): [float(x) for x in w]
                         for q, w in v.items()}
                for k, v in raw.items()}
        # lossless (transquant bypass): residual passes through
        # untouched; SDH/RDOQ are meaningless and forced off
        self.lossless = lossless
        if lossless:
            sign_hiding = rdoq = False
        self.sign_hiding = sign_hiding
        self.rdoq = rdoq
        # scaling lists: per-position quant tables + dequant matrices
        # (intra ids: luma 0, chroma 1 — default cb/cr lists are equal)
        self.use_scaling = scaling is not None
        if scaling is not None:
            for n in (4, 8, 16, 32):
                setattr(self, f"qt{n}",
                        jnp.asarray(scaling.quant_table(n, 0)))
                setattr(self, f"dm{n}",
                        jnp.asarray(scaling.matrix(n, 0), jnp.int32))
            for n in (4, 8, 16):
                setattr(self, f"qt{n}c",
                        jnp.asarray(scaling.quant_table(n, 1)))
                setattr(self, f"dm{n}c",
                        jnp.asarray(scaling.matrix(n, 1), jnp.int32))
        # delta_qp: per-CTB QP maps (VAQ/ROI/LCU rate control); wpp only
        # affects the final-QP chain (qPY_PREV resets per CTB row)
        self.delta_qp = delta_qp
        self.wpp = wpp
        self.h, self.w, self.qp = height, width, qp
        self.deblock = deblock
        self.deblock_beta = deblock_beta
        self.deblock_tc = deblock_tc
        self.sao = sao if sao != "off" else None
        self.r8, self.c8 = height // 8, width // 8

        # constant matrices per size (luma + chroma halves); weights fit
        # int8 (max 32), stored narrow to quarter the per-wave gather
        # traffic — matmuls run in f32 (exact: products < 2^21 << 2^24)
        self.g8l = jnp.asarray(build_pred_matrices(8), jnp.int8)
        self.g16l = jnp.asarray(build_pred_matrices(16), jnp.int8)
        self.g32l = jnp.asarray(build_pred_matrices(32), jnp.int8)
        self.f8 = jnp.asarray(build_filter_matrix(8), jnp.int8)
        self.f16l = jnp.asarray(build_filter_matrix(16), jnp.int8)
        self.f32 = jnp.asarray(build_filter_matrix(32), jnp.int8)
        self.g4c = jnp.asarray(build_pred_matrices(4, chroma=True),
                               jnp.int8)
        self.g8cc = jnp.asarray(build_pred_matrices(8, chroma=True),
                                jnp.int8)
        self.g16c = jnp.asarray(build_pred_matrices(16, chroma=True),
                                jnp.int8)
        # 4x4 luma (NxN PUs): no [1 2 1] smoothing at n=4 (spec
        # 8.4.4.2.3), DST-VII transform for intra luma 4x4 (spec 8.6.4)
        self.g4l = jnp.asarray(build_pred_matrices(4), jnp.int8)
        self.f4 = jnp.asarray(build_filter_matrix(4), jnp.int8)
        self.dst4 = jnp.asarray(DST4)
        self.t4 = jnp.asarray(DCT_MATRICES[4])
        self.t8 = jnp.asarray(DCT_MATRICES[8])
        self.t16 = jnp.asarray(DCT_MATRICES[16])
        self.t32 = jnp.asarray(DCT_MATRICES[32])
        self.h8 = jnp.asarray(_hadamard(8))
        self.m8 = jnp.asarray(_morton(self.r8, self.c8))

        # in-CG coefficient orders for the three scans (diag/hor/ver) —
        # sign-data hiding must follow the mode-dependent scan of 8x8
        # luma / 4x4 chroma TUs (spec 7.4.9.11)
        from ..tables import SCAN_DIAG, SCAN_HOR, SCAN_VER, scan_order
        ords = np.zeros((3, 16), np.int32)
        invs = np.zeros((3, 16), np.int32)
        for si in (SCAN_DIAG, SCAN_HOR, SCAN_VER):
            xy = scan_order(si, 2)
            o = np.asarray([y * 4 + x for x, y in xy], np.int32)
            ords[si] = o
            invs[si][o] = np.arange(16)
        self.sdh_ord = jnp.asarray(ords)
        self.sdh_inv = jnp.asarray(invs)

        def _mask(hh, ww):
            yy, xx = np.mgrid[0:hh, 0:ww]
            return jnp.asarray(((xx & 255) ^ (yy & 255) ^ (xx >> 8)
                                ^ (yy >> 8)).astype(np.uint32))
        self.hash_mask_y = _mask(height, width)
        self.hash_mask_c = _mask(height // 2, width // 2)

        self.qp_c = chroma_qp(qp)
        self.qp2 = jnp.asarray([qp, self.qp_c], jnp.int32)
        # lambda rides the consts dict like qp so rate control never
        # retraces (f32 scalar)
        self.lam2 = jnp.asarray(
            [0.57 * 2.0 ** ((qp - 12) / 3.0)], jnp.float32)
        # fractional-bit DP costs + per-mode signalling costs (ride the
        # consts dict so per-frame QP changes never retrace)
        self.dpc = jnp.asarray(self._dpc_vec(qp), jnp.float32)
        from ..engine.bit_cost import mode_cost_vec
        self.mode_cost = jnp.asarray(mode_cost_vec(qp, self.INIT_TYPE),
                                     jnp.float32)
        # diagonal-scan position maps for the rate features (scan span)
        from ..tables import scanpos_map
        for n in (4, 8, 16, 32):
            setattr(self, f"spos{n}", jnp.asarray(scanpos_map(n)))
        # learned fast-cost weights at this QP, [4 sizes, 8 features]
        self.fcw = jnp.asarray(self._fcw_matrix(qp), jnp.float32)
        if self.trskip:
            self.tsp = jnp.asarray(self._tsp_vec(qp), jnp.float32)
        # RDOQ ctx-init price pack (sig/csbf/g1/g2 + last-pos vectors)
        for k, v in self._rdoq_consts(qp).items():
            setattr(self, k, v)
        if delta_qp:
            rc, cc = height // self.CTB, width // self.CTB
            self.qpmap_y = jnp.full((rc, cc), qp, jnp.int32)
            self.qpmap_c = jnp.full((rc, cc), self.qp_c, jnp.int32)
            self.lammap = jnp.full(
                (rc, cc), 0.57 * 2.0 ** ((qp - 12) / 3.0), jnp.float32)

        self.consts = {k: getattr(self, k) for k in self.const_keys()}
        self._full = jax.jit(self._with_consts(self._full_impl))
        # frame-batched variant (all-intra frames are independent): one
        # vmapped program amortizes the wavefront loop's per-wave
        # dispatch overhead over B frames — the TPU analog of kvazaar's
        # OWF frame parallelism (src/kvazaar.c:110-141)
        self._full_b = jax.jit(jax.vmap(self._with_consts(self._full_impl),
                                        in_axes=(None, 0, 0, 0)))

    CONST_KEYS = ("g8l", "g16l", "g32l", "f8", "f16l", "f32", "g4c",
                  "g8cc", "g16c", "g4l", "f4", "dst4", "t4", "t8",
                  "t16", "t32", "h8", "m8",
                  "sdh_ord", "sdh_inv", "hash_mask_y", "hash_mask_c",
                  "qp2", "lam2", "dpc", "mode_cost", "fcw",
                  "spos4", "spos8", "spos16", "spos32",
                  "sigp", "csbfp", "g1p", "g2p",
                  "lastp2", "lastp3", "lastp4", "lastp5",
                  "lastc2", "lastc3", "lastc4")

    def _rdoq_consts(self, qp: int) -> dict:
        """Per-QP ctx-init fractional-bit prices for the batched RDOQ
        (ride the consts dict so rate control never retraces)."""
        from ..engine.bit_cost import rdoq_prices
        p = rdoq_prices(qp, self.INIT_TYPE)
        out = {"sigp": jnp.asarray(p["sig"]),
               "csbfp": jnp.asarray(p["csbf"]),
               "g1p": jnp.asarray(p["g1"]),
               "g2p": jnp.asarray(p["g2"])}
        for log2s in (2, 3, 4, 5):
            out[f"lastp{log2s}"] = jnp.asarray(p["last"][(log2s, False)])
            if log2s <= 4:
                out[f"lastc{log2s}"] = jnp.asarray(p["last"][(log2s, True)])
        return out

    def _fcw_matrix(self, qp: int) -> list[list[float]]:
        """Learned fast-cost weights for this QP, rows indexed by
        log2(TU size) - 2; all-zero row = no model for that size (the
        analytic fallback in _rate_tu is used instead; the row's
        presence/absence is static so code paths never change with QP)."""
        rows = []
        for log2s in (2, 3, 4, 5):
            per_qp = self.fast_cost.get(log2s)
            if not per_qp:
                rows.append([0.0] * 8)
                continue
            nearest = min(per_qp, key=lambda q: abs(q - qp))
            rows.append([float(x) for x in per_qp[nearest]])
        return rows

    def _dpc_vec(self, qp: int) -> list[float]:
        from ..engine.bit_cost import intra_dp_costs
        c = intra_dp_costs(qp, self.INIT_TYPE)
        return [c["split0"], c["split1"], c["cbf_y0"], c["cbf_y1"],
                c["cbf_y0_d1"], c["cbf_y1_d1"], c["cbf_c0"], c["cbf_c1"],
                c["cbf_c0_d1"], c["cbf_c1_d1"], c["chroma_dm"],
                c["part_2nx2n"], c["part_nxn"]]

    def _tsp_vec(self, qp: int) -> list[float]:
        """transform_skip_flag fractional-bit prices at ctx init:
        [luma0, luma1, chroma0, chroma1]."""
        from ..engine.bit_cost import ctx_bits
        ly = ctx_bits("transform_skip_flag", self.INIT_TYPE, qp, 0)
        lc = ctx_bits("transform_skip_flag", self.INIT_TYPE, qp, 1)
        return [ly[0], ly[1], lc[0], lc[1]]

    def const_keys(self):
        keys = self.CONST_KEYS + (("qpmap_y", "qpmap_c", "lammap")
                                  if self.delta_qp else ())
        if self.trskip:
            keys = keys + ("tsp",)
        if self.use_scaling:
            keys = keys + ("qt4", "qt8", "qt16", "qt32", "dm4", "dm8",
                           "dm16", "dm32",
                           "qt4c", "qt8c", "qt16c", "dm4c", "dm8c",
                           "dm16c")
        return keys

    def _mats_for(self, n: int, is_luma: bool):
        if not self.use_scaling:
            return None
        sfx = "" if is_luma else "c"
        return (getattr(self, f"qt{n}{sfx}"),
                getattr(self, f"dm{n}{sfx}"))

    def _consts_for(self, qp: int | None):
        if qp is None or qp == self.qp:
            return self.consts
        consts = dict(self.consts)
        consts["qp2"] = jnp.asarray([qp, chroma_qp(qp)], jnp.int32)
        consts["lam2"] = jnp.asarray(
            [0.57 * 2.0 ** ((qp - 12) / 3.0)], jnp.float32)
        consts["dpc"] = jnp.asarray(self._dpc_vec(qp), jnp.float32)
        from ..engine.bit_cost import mode_cost_vec
        consts["mode_cost"] = jnp.asarray(
            mode_cost_vec(qp, self.INIT_TYPE), jnp.float32)
        consts["fcw"] = jnp.asarray(self._fcw_matrix(qp), jnp.float32)
        if self.trskip:
            consts["tsp"] = jnp.asarray(self._tsp_vec(qp), jnp.float32)
        consts.update(self._rdoq_consts(qp))
        if self.delta_qp:
            rc, cc = self.h // self.CTB, self.w // self.CTB
            consts["qpmap_y"] = jnp.full((rc, cc), qp, jnp.int32)
            consts["qpmap_c"] = jnp.full((rc, cc), chroma_qp(qp),
                                         jnp.int32)
            consts["lammap"] = jnp.full(
                (rc, cc), 0.57 * 2.0 ** ((qp - 12) / 3.0), jnp.float32)
        return consts

    # ------------------------------------------------------------------
    # helpers (size-parametric)
    # ------------------------------------------------------------------

    def _satd_tiles(self, diff: jax.Array) -> jax.Array:
        """SATD over trailing [.., h, w] (any multiples of 8, incl. the
        rectangular SMP PUs) via 8x8 Hadamard tiles (f32 matmuls on the
        MXU; exact — magnitudes stay far below 2^24)."""
        mh = diff.shape[-2] // 8
        m = diff.shape[-1] // 8
        d = diff.astype(jnp.float32).reshape(*diff.shape[:-2], mh, 8, m, 8)
        d = jnp.moveaxis(d, -2, -3)
        h8f = self.h8.astype(jnp.float32)
        t = jnp.einsum("ij,...jk,kl->...il", h8f, d, h8f)
        s = jnp.floor((jnp.abs(t).sum(axis=(-1, -2)) + 2.0) / 4.0)
        return s.sum(axis=(-1, -2)).astype(jnp.int32)

    def _planar(self, refs: jax.Array, n: int) -> jax.Array:
        """Planar prediction from (already filtered) refs; any n."""
        log2n = int(np.log2(n))
        left = refs[..., :n + 1]        # L[0..n]
        top = refs[..., 2 * n + 1:3 * n + 2]  # T[0..n]
        x = jnp.arange(n)
        y = jnp.arange(n)
        ln = left[..., n][..., None, None]
        tn = top[..., n][..., None, None]
        ly = left[..., :n][..., :, None]
        tx = top[..., :n][..., None, :]
        p = ((n - 1 - x)[None, None, :] * ly + (x + 1)[None, None, :] * tn
             + (n - 1 - y)[None, :, None] * tx + (y + 1)[None, :, None] * ln
             + n)
        return (p >> (log2n + 1)).reshape(*refs.shape[:-1], n * n)

    def _filt_refs(self, refs: jax.Array, f: jax.Array) -> jax.Array:
        """[1 2 1]-filtered refs, exact in f32: (refs @ F + 2) >> 2."""
        prod = jnp.matmul(refs.astype(jnp.float32),
                          f.T.astype(jnp.float32),
                          precision=self._prec)
        return jnp.floor((prod + 2.0) / 4.0).astype(jnp.int32)

    def _preds_full(self, refs: jax.Array, g: jax.Array, f: jax.Array,
                    n: int, is_luma: bool) -> jax.Array:
        """All-35-mode predictions [B, 35, n*n] with all special cases."""
        filt = self._filt_refs(refs, f) if is_luma else refs
        both = jnp.concatenate([refs, filt], axis=1).astype(jnp.float32)
        gm = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
        preds = jnp.floor((both @ gm.T + 16.0) / 32.0).astype(jnp.int32) \
            .reshape(-1, 35, n * n)
        if n < 32 and is_luma:
            preds = self._fix_1026(preds, refs, n)
        preds = preds.at[:, 1, :].set(self._dc_pred(refs, n, is_luma))
        if is_luma and n == 32:
            preds = preds.at[:, 0, :].set(self._planar(filt, n))
        return preds

    def _pred_one(self, refs: jax.Array, modes: jax.Array, g: jax.Array,
                  f: jax.Array, n: int, is_luma: bool) -> jax.Array:
        """Per-block single-mode prediction [L, n*n] (recon path)."""
        filt = self._filt_refs(refs, f) if is_luma else refs
        both = jnp.concatenate([refs, filt], axis=1).astype(jnp.float32)
        gsel = jnp.take(g, modes, axis=0).astype(jnp.float32)
        pred = jnp.floor((jnp.einsum("lpr,lr->lp", gsel, both,
                                     precision=self._prec)
                          + 16.0) / 32.0).astype(jnp.int32)
        pred = jnp.where((modes == 1)[:, None],
                         self._dc_pred(refs, n, is_luma), pred)
        if is_luma and n == 32:
            pred = jnp.where((modes == 0)[:, None], self._planar(filt, n),
                             pred)
        if is_luma and n < 32:
            left = refs[:, :n]
            top = refs[:, 2 * n + 1:3 * n + 1]
            corner = refs[:, 2 * n]
            p = pred.reshape(-1, n, n)
            col = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1),
                           0, self.maxv)
            row = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1),
                           0, self.maxv)
            ii = jnp.arange(n)
            m26 = (modes == 26)[:, None, None] & (ii == 0)[None, None, :]
            m10 = (modes == 10)[:, None, None] & (ii == 0)[None, :, None]
            p = jnp.where(m26, col[:, :, None], p)
            p = jnp.where(m10, row[:, None, :], p)
            pred = p.reshape(-1, n * n)
        return pred

    def _src_refs(self, src: jax.Array, n: int) -> jax.Array:
        """Clamped source refs for every aligned n-block [B, rlen]."""
        h, w = src.shape
        rows, cols = h // n, w // n
        bid = jnp.arange(rows * cols)
        y0 = (bid // cols) * n
        x0 = (bid % cols) * n
        iy = jnp.clip(y0[:, None] + jnp.arange(2 * n)[None, :], 0, h - 1)
        ix = jnp.clip(x0[:, None] - 1, 0, w - 1)
        left = src[iy, jnp.broadcast_to(ix, iy.shape)]
        ty = jnp.clip(y0[:, None] - 1, 0, h - 1)
        tx = jnp.clip(x0[:, None] + jnp.arange(2 * n)[None, :], 0, w - 1)
        top = src[jnp.broadcast_to(ty, tx.shape), tx]
        corner = src[jnp.clip(y0 - 1, 0, h - 1), jnp.clip(x0 - 1, 0, w - 1)]
        pad = jnp.zeros((rows * cols, 1), jnp.int32)
        return jnp.concatenate([left, corner[:, None], top, pad], axis=1)

    def _blocks(self, plane: jax.Array, n: int) -> jax.Array:
        rows, cols = plane.shape[0] // n, plane.shape[1] // n
        return jnp.moveaxis(plane.reshape(rows, n, cols, n), 1, 2).reshape(
            rows * cols, n, n)

    @staticmethod
    def _rate_bins(levels: jax.Array) -> jax.Array:
        """Context-free CABAC-bin rate estimate per block [L, n, n] -> [L]
        (same model as the RDOQ level rates)."""
        al = jnp.abs(levels).astype(jnp.float32)
        r3 = 5.0 + 2.0 * jnp.floor(jnp.log2(jnp.maximum(al - 1.0, 1.0)))
        r = jnp.where(al == 0, 0.0,
                      jnp.where(al == 1, 3.0,
                                jnp.where(al == 2, 4.0, r3)))
        return r.sum(axis=(-1, -2))

    def _tu_features(self, levels: jax.Array, n: int):
        """Batched rate features per TU [L, n, n] -> dict of [L] f32.
        Mirrors tools/rdcost_weights.py tu_features exactly (the trainer
        regresses exact CABAC bits on these)."""
        al = jnp.abs(levels).astype(jnp.float32)
        nz = al > 0
        f1 = nz.sum(axis=(-1, -2), dtype=jnp.float32)
        f2 = (al >= 2.0).sum(axis=(-1, -2), dtype=jnp.float32)
        f3 = jnp.minimum(al, 3.0).sum(axis=(-1, -2))
        f4 = jnp.log2(jnp.maximum(al - 2.0, 1.0)).sum(axis=(-1, -2))
        # scan span: position of the last significant coefficient in the
        # diagonal scan + 1 (prices the sig flags of in-span zeros that
        # a count-only model cannot see)
        spos = getattr(self, f"spos{n}").astype(jnp.float32)
        f5 = jnp.max(jnp.where(nz, spos, -1.0), axis=(-1, -2)) + 1.0
        # coded 4x4 coefficient groups (csbf flags)
        g = n // 4
        L = levels.shape[0]
        cgnz = nz.reshape(L, g, 4, g, 4).any(axis=(2, 4))
        f6 = cgnz.sum(axis=(-1, -2), dtype=jnp.float32)
        # last-position prefix length proxy (bounding box logs)
        ii = jnp.arange(n, dtype=jnp.float32)
        lastx = jnp.max(jnp.where(nz.any(-2), ii, -1.0), axis=-1)
        lasty = jnp.max(jnp.where(nz.any(-1), ii, -1.0), axis=-1)
        f7 = jnp.floor(jnp.log2(lastx + 2.0)) + \
            jnp.floor(jnp.log2(lasty + 2.0))
        return f1, f2, f3, f4, f5, f6, f7

    def _rate_tu(self, levels: jax.Array, n: int) -> jax.Array:
        """Coefficient rate of a coded TU (excl. cbf): the learned fast
        coefficient-cost model (linear in batched |level| features,
        trained by tools/rdcost_weights.py on exact CABAC bits — the
        reference's src/fast_coeff_cost.c analog), falling back to an
        analytic estimate (per-level bins + last-pos + in-span sig
        flags + csbf) when no weights exist for this size."""
        f1, f2, f3, f4, f5, f6, f7 = self._tu_features(levels, n)
        log2s = n.bit_length() - 1
        if not self.fast_cost.get(log2s):   # static: model availability
            r = (self._rate_bins(levels) + 0.6 * (f5 - f1)
                 + f6 + f7 + 2.0)
            return r * (f1 > 0)
        w = self.fcw[log2s - 2]             # per-QP values ride consts
        r = (w[0] + w[1] * f1 + w[2] * f2 + w[3] * f3 + w[4] * f4
             + w[5] * f5 + w[6] * f6 + w[7] * f7)
        return jnp.maximum(r, 1.0) * (f1 > 0)

    def _tu_rate_y(self, levels: jax.Array, n: int,
                   depth1: bool = False) -> jax.Array:
        """Luma TU rate incl. the cbf_luma flag (fractional bits)."""
        cbf = jnp.any(levels != 0, axis=(-1, -2))
        i0 = self.DPC_CBF_Y0_D1 if depth1 else self.DPC_CBF_Y0
        i1 = self.DPC_CBF_Y1_D1 if depth1 else self.DPC_CBF_Y1
        return jnp.where(cbf, self.dpc[i1] + self._rate_tu(levels, n),
                         self.dpc[i0])

    def _tu_rate_c(self, levels: jax.Array, n: int,
                   depth1: bool = False) -> jax.Array:
        """Chroma TU rate incl. the cbf_cb/cr flag (fractional bits)."""
        cbf = jnp.any(levels != 0, axis=(-1, -2))
        i0 = self.DPC_CBF_C0_D1 if depth1 else self.DPC_CBF_C0
        i1 = self.DPC_CBF_C1_D1 if depth1 else self.DPC_CBF_C1
        return jnp.where(cbf, self.dpc[i1] + self._rate_tu(levels, n),
                         self.dpc[i0])

    # scan-aware sign-data-hiding: when the TU's coefficient scan is
    # mode-dependent (8x8 luma, 4x4 chroma), the parity fix must walk the
    # same scan the writer/decoder use. _fire_class sets _sdh_scan_sel
    # (per-slot scan index) around the _transform_quant call.
    _sdh_scan_sel = None

    def _sdh_fix(self, levels, n, err, qbits):
        sel = self._sdh_scan_sel
        if sel is None:
            return super()._sdh_fix(levels, n, err, qbits)
        ordm = jnp.take(self.sdh_ord, sel, axis=0)[:, None, :]  # [L,1,16]
        invm = jnp.take(self.sdh_inv, sel, axis=0)[:, None, :]
        L = levels.shape[0]
        g = n // 4
        big = jnp.int32(1 << 30)
        qbits = jnp.asarray(qbits)
        if qbits.ndim:                       # per-block QP: [L,1,1]->[L,1]
            qbits = qbits.reshape(L, 1)

        def reorder(x, om):
            x = x.reshape(L, g, 4, g, 4)
            x = jnp.moveaxis(x, 2, 3).reshape(L, g * g, 16)
            return jnp.take_along_axis(x, jnp.broadcast_to(
                om, (L, g * g, 16)), axis=2)

        s = reorder(levels, ordm)
        e = reorder(err, ordm)
        nz = s != 0
        any_nz = nz.any(-1)
        first = jnp.argmax(nz, axis=-1)
        last = 15 - jnp.argmax(nz[..., ::-1], axis=-1)
        total = jnp.abs(s).sum(-1)
        sfirst = jnp.take_along_axis(s, first[..., None], -1)[..., 0]
        need = (any_nz & ((last - first) >= 4)
                & ((total & 1) != (sfirst < 0)))
        e_up = jnp.where(nz, e, -big)
        pos_up = jnp.argmax(e_up, axis=-1)
        cost_up = (1 << qbits) - 2 * jnp.take_along_axis(
            e_up, pos_up[..., None], -1)[..., 0]
        ok_dn = jnp.abs(s) >= 2
        e_dn = jnp.where(ok_dn, e, big)
        pos_dn = jnp.argmin(e_dn, axis=-1)
        cost_dn = (1 << qbits) + 2 * jnp.take_along_axis(
            e_dn, pos_dn[..., None], -1)[..., 0]
        use_dn = ok_dn.any(-1) & (cost_dn < cost_up)
        pos = jnp.where(use_dn, pos_dn, pos_up)
        step = jnp.where(use_dn, -1, 1)
        selv = jnp.take_along_axis(s, pos[..., None], -1)[..., 0]
        bump = jnp.where(need, jnp.sign(selv) * step, 0)
        onehot = jax.nn.one_hot(pos, 16, dtype=levels.dtype)
        s = s + onehot * bump[..., None]
        out = jnp.take_along_axis(s, jnp.broadcast_to(
            invm, (L, g * g, 16)), axis=2)
        out = out.reshape(L, g, g, 4, 4)
        return jnp.moveaxis(out, 2, 3).reshape(L, n, n)

    # ------------------------------------------------------------------
    # stage 1+2: mode search and partition DP
    # ------------------------------------------------------------------

    def _ctb_vec(self, m: jax.Array, n: int) -> jax.Array:
        """Per-aligned-n-block vector of a per-CTB map value [B]."""
        rows, cols = self.h // n, self.w // n
        k = self.CTB // n
        r = jnp.arange(rows) // k
        c = jnp.arange(cols) // k
        return m[r[:, None], c[None, :]].reshape(-1)

    def _qp_lam_for(self, n: int):
        """(qp_y, qp_c, lam) per aligned n-block — scalars without
        delta-QP, [B] vectors with."""
        if not self.delta_qp:
            return self.qp2[0], self.qp2[1], self.lam2[0]
        return (self._ctb_vec(self.qpmap_y, n),
                self._ctb_vec(self.qpmap_c, n),
                self._ctb_vec(self.lammap, n))

    def _leaf_rd(self, src_y, src_cb, src_cr, n, g, f, gc, t, tc, lam):
        """Best mode + RD cost for every aligned n-block.
        Returns (modes [B], cost [B] f32)."""
        qp_y, qp_c, lam_n = self._qp_lam_for(n)
        if self.delta_qp:
            lam = lam_n
        refs = self._src_refs(src_y, n)
        preds = self._preds_full(refs, g, f, n, True)
        blocks = self._blocks(src_y, n)
        satd = self._satd_tiles(blocks[:, None] -
                                preds.reshape(-1, 35, n, n))
        k = self.rd_cands
        if k == 1:
            modes = jnp.argmin(satd, axis=1).astype(jnp.int32)
        else:
            # rd ladder: RD-cost the K best-SATD modes and keep the
            # cheapest (reference: --rd widens the RDO candidate set,
            # src/search_intra.c search_intra_rdo / cfg.c rdo levels)
            _, cand = jax.lax.top_k(-satd, k)          # [B, k]
            B = blocks.shape[0]
            predk = jnp.take_along_axis(
                preds.reshape(B, 35, n, n), cand[:, :, None, None],
                axis=1)                                 # [B, k, n, n]
            resik = (blocks[:, None] - predk).reshape(B * k, n, n)
            qpk = jnp.repeat(qp_y, k) if self.delta_qp else qp_y
            lvk, rk2 = self._transform_quant_plain(
                resik, t, qpk, n, mats=self._mats_for(n, True))
            dk = ((resik - rk2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
            rtk = self._tu_rate_y(lvk, n) + \
                self.mode_cost[cand.reshape(-1)]
            lamk = jnp.repeat(lam, k) if self.delta_qp else lam
            # same metric as the final leaf cost below (incl. the
            # source-reference noise factor) so the ladder's argmin and
            # the DP's cost agree on the winner
            ck = (dk * (1 + self.REF_NOISE_K / n)
                  + lamk * rtk).reshape(B, k)
            sel = jnp.argmin(ck, axis=1)                # [B]
            modes = jnp.take_along_axis(cand, sel[:, None],
                                        axis=1)[:, 0].astype(jnp.int32)
        pred = jnp.take_along_axis(
            preds, modes[:, None, None], axis=1)[:, 0].reshape(-1, n, n)
        resi = blocks - pred
        levels, r2 = self._transform_quant_plain(
            resi, t, qp_y, n, mats=self._mats_for(n, True))
        dist = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        rate = self._tu_rate_y(levels, n)
        # chroma (derived mode) at n/2
        nc = n // 2
        ccost = jnp.zeros_like(dist)
        for plane in (src_cb, src_cr):
            crefs = self._src_refs(plane, nc)
            cpred = self._pred_one(crefs, modes, gc, gc, nc, False)
            cblocks = self._blocks(plane, nc)
            cresi = cblocks - cpred.reshape(-1, nc, nc)
            clev, cr2 = self._transform_quant_plain(
                cresi, tc, qp_c, nc, mats=self._mats_for(nc, False))
            cdist = ((cresi - cr2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
            crate = self._tu_rate_c(clev, nc)
            ccost = ccost + cdist * (1 + self.REF_NOISE_K / nc) \
                + lam * crate
        cost = dist * (1 + self.REF_NOISE_K / n) \
            + lam * (rate + self.mode_cost[modes]
                     + self.dpc[self.DPC_CHROMA_DM]) + ccost
        return modes, cost

    def _leaf_rd64(self, src_y, src_cb, src_cr, lam):
        """64x64 intra CU leaf cost: one shared luma mode, four 32x32
        TUs (the TU tree is forced-split once at log2 6, spec 7.3.8.8)
        plus per-TU 16x16 chroma, all costed with source references
        like the other leaf sweeps. Returns (modes [B64], cost [B64]).
        Reference: kvazaar codes depth-0 intra CUs (src/search.c:646,
        src/cu.h depth 0)."""
        qp_y, qp_c, lam64 = self._qp_lam_for(64)
        if self.delta_qp:
            lam = lam64                                  # [B64]
        n = 32
        r64, c64 = self.h // 64, self.w // 64

        def to_children(v64):
            return jnp.repeat(jnp.repeat(v64.reshape(r64, c64), 2, 0),
                              2, 1).reshape(-1)

        refs = self._src_refs(src_y, n)
        preds = self._preds_full(refs, self.g32l, self.f32, n, True)
        blocks = self._blocks(src_y, n)
        satd = self._satd_tiles(blocks[:, None]
                                - preds.reshape(-1, 35, n, n))  # [B32,35]
        satd4 = satd.reshape(r64, 2, c64, 2, 35).sum(axis=(1, 3))
        m64 = jnp.argmin(satd4.reshape(-1, 35), axis=1) \
            .astype(jnp.int32)                           # [B64]
        mch = to_children(m64)                           # [B32]
        pred = jnp.take_along_axis(
            preds, mch[:, None, None], axis=1)[:, 0].reshape(-1, n, n)
        resi = blocks - pred
        qy = to_children(qp_y) if self.delta_qp else qp_y
        qc = to_children(qp_c) if self.delta_qp else qp_c
        lam_ch = to_children(lam) if self.delta_qp else lam
        levels, r2 = self._transform_quant_plain(
            resi, self.t32, qy, n, mats=self._mats_for(n, True))
        dist = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        rate = self._tu_rate_y(levels, 32, depth1=True)
        child = dist * (1 + self.REF_NOISE_K / n) + lam_ch * rate
        for plane in (src_cb, src_cr):
            crefs = self._src_refs(plane, 16)
            cpred = self._pred_one(crefs, mch, self.g16c, self.g16c,
                                   16, False)
            cblocks = self._blocks(plane, 16)
            cresi = cblocks - cpred.reshape(-1, 16, 16)
            clev, cr2 = self._transform_quant_plain(
                cresi, self.t16, qc, 16, mats=self._mats_for(16, False))
            cdist = ((cresi - cr2).astype(jnp.float32) ** 2) \
                .sum(axis=(1, 2))
            crate = self._tu_rate_c(clev, 16, depth1=True)
            child = child + cdist * (1 + self.REF_NOISE_K / 16) \
                + lam_ch * crate
        cost64 = child.reshape(r64, 2, c64, 2).sum(axis=(1, 3)) \
            .reshape(-1) + lam * (self.mode_cost[m64]
                                  + self.dpc[self.DPC_CHROMA_DM])
        return m64, cost64

    def _satd4(self, diff: jax.Array) -> jax.Array:
        """SATD over trailing [.., 4, 4] via the 4x4 Hadamard (exact f32
        matmuls; kvazaar satd_4x4 analog with /2 normalisation)."""
        h4 = jnp.asarray([[1, 1, 1, 1], [1, -1, 1, -1],
                          [1, 1, -1, -1], [1, -1, -1, 1]], jnp.float32)
        d = diff.astype(jnp.float32)
        t = jnp.einsum("ij,...jk,kl->...il", h4, d, h4)
        return jnp.floor((jnp.abs(t).sum(axis=(-1, -2)) + 1.0) / 2.0) \
            .astype(jnp.int32)

    def _leaf_rd4(self, src_y, src_cb, src_cr, lam):
        """NxN cost per 8x8 CU: four 4x4 luma PUs with independent modes
        (DST-VII TUs) + one 4x4 chroma TU riding PU0's mode. Source-ref
        mode sweep like the other leaf sizes. Returns (modes4 [B4] —
        per-4x4 best mode, cost [B8] — per-8x8-cell NxN RD cost).
        Reference: kvazaar searches depth-4 intra (SIZE_NxN) when
        --pu-depth-intra reaches 4 (src/search.c:807, cfg.c:628)."""
        qp_y, qp_c, lam8 = self._qp_lam_for(8)
        if self.delta_qp:
            lam = lam8                                   # [B8]
        r4n, c4n = self.h // 4, self.w // 4
        refs = self._src_refs(src_y, 4)
        preds = self._preds_full(refs, self.g4l, self.f4, 4, True)
        blocks = self._blocks(src_y, 4)
        satd = self._satd4(blocks[:, None]
                           - preds.reshape(-1, 35, 4, 4))   # [B4, 35]
        m4 = jnp.argmin(satd, axis=1).astype(jnp.int32)
        pred = jnp.take_along_axis(
            preds, m4[:, None, None], axis=1)[:, 0].reshape(-1, 4, 4)
        resi = blocks - pred
        if self.delta_qp:
            qy = self._ctb_vec(self.qpmap_y, 4)
            lam4 = self._ctb_vec(self.lammap, 4)
        else:
            qy, lam4 = qp_y, lam
        levels, r2 = self._transform_quant_plain(
            resi, self.dst4, qy, 4, mats=self._mats_for(4, True))
        dist = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        # NxN implies trafo depth 1 TUs (IntraSplitFlag, spec 7.3.8.8)
        rate = self._tu_rate_y(levels, 4, depth1=True)
        child = (dist * (1 + self.REF_NOISE_K / 4)
                 + lam4 * (rate + self.mode_cost[m4])) \
            .reshape(r4n // 2, 2, c4n // 2, 2).sum(axis=(1, 3)) \
            .reshape(-1)                                  # [B8]
        # chroma 4x4 TU, derived (DM) from PU0's luma mode
        m0 = m4.reshape(r4n, c4n)[::2, ::2].reshape(-1)   # [B8]
        cost = child + lam * self.dpc[self.DPC_CHROMA_DM]
        for plane in (src_cb, src_cr):
            crefs = self._src_refs(plane, 4)
            cpred = self._pred_one(crefs, m0, self.g4c, self.g4c, 4,
                                   False)
            cblocks = self._blocks(plane, 4)
            cresi = cblocks - cpred.reshape(-1, 4, 4)
            clev, cr2 = self._transform_quant_plain(
                cresi, self.t4, qp_c, 4, mats=self._mats_for(4, False))
            cdist = ((cresi - cr2).astype(jnp.float32) ** 2) \
                .sum(axis=(1, 2))
            crate = self._tu_rate_c(clev, 4)
            cost = cost + cdist * (1 + self.REF_NOISE_K / 4) \
                + lam * crate
        return m4, cost

    def _transform_quant(self, resi, t, qp, n, mats=None, is_luma=True):
        if self.lossless:
            return resi, resi
        return super()._transform_quant(resi, t, qp, n, mats=mats,
                                        is_luma=is_luma)

    def _tq_4x4_rd(self, resi, t, qp, lam, mats=None, is_luma=True):
        """4x4 T/Q with the transform-skip RD competition (reference
        search_intra.c:94-152 heuristic made exact: both paths are
        quantized and priced). Returns (levels, recon_resi,
        use_skip [L] bool); identity competition when trskip is off."""
        levels, r2 = self._transform_quant(resi, t, qp, 4, mats=mats,
                                           is_luma=is_luma)
        if not self.trskip:
            return levels, r2, jnp.zeros((resi.shape[0],), bool)
        lv_s, r2_s = self._transform_quant_skip(resi, qp, 4, mats=mats,
                                                is_luma=is_luma)
        rf = resi.astype(jnp.float32)
        d_t = ((rf - r2) ** 2).sum(axis=(1, 2))
        d_s = ((rf - r2_s) ** 2).sum(axis=(1, 2))
        p0, p1 = (self.tsp[0], self.tsp[1]) if is_luma \
            else (self.tsp[2], self.tsp[3])
        c_t = d_t + lam * (self._rate_tu(levels, 4) + p0)
        c_s = d_s + lam * (self._rate_tu(lv_s, 4) + p1)
        # a zero-cbf TU never codes the flag: never force skip there
        use = (c_s < c_t) & jnp.any(lv_s != 0, axis=(1, 2))
        u3 = use[:, None, None]
        return (jnp.where(u3, lv_s, levels),
                jnp.where(u3, r2_s, r2), use)

    def _transform_quant_plain(self, resi, t, qp, n, mats=None):
        """T/Q/IT with plain deadzone quant (search-time costing — the
        recon stage applies RDOQ/SDH per config)."""
        saved = (self.rdoq, self.sign_hiding)
        self.rdoq = self.sign_hiding = False
        try:
            return self._transform_quant(resi, t, qp, n, mats=mats)
        finally:
            self.rdoq, self.sign_hiding = saved

    # ------------------------------------------------------------------
    # RDOQ v2: ctx-priced batched rate-distortion-optimal quantization
    # ------------------------------------------------------------------

    _RDOQ_SCAN_CACHE: dict = {}

    @classmethod
    def _rdoq_scan(cls, log2n: int):
        """(perm, inv_perm) static diagonal-scan permutations: perm[p] =
        flat (y*n+x) index of scan position p."""
        if log2n not in cls._RDOQ_SCAN_CACHE:
            from ..tables import SCAN_DIAG, get_scan
            n = 1 << log2n
            scan = get_scan(SCAN_DIAG, log2n)
            perm = (scan[:, 1] * n + scan[:, 0]).astype(np.int32)
            invp = np.empty(n * n, np.int32)
            invp[perm] = np.arange(n * n, dtype=np.int32)
            cls._RDOQ_SCAN_CACHE[log2n] = (perm, invp)
        return cls._RDOQ_SCAN_CACHE[log2n]

    def _rdoq_levels(self, co, scale, qbits, qp, log2n, offset,
                     is_luma=True):
        """Batched HM-style RDOQ (replaces the context-free base model):

        1. per-coefficient level choice among {0, l-1, l} priced with
           sig_coeff_flag / greater1 / greater2 / golomb fractional-bit
           costs at context init states, with the significance contexts
           derived (spec 9.3.4.2.5) from a provisional coded-sub-block
           map — the batched analog of kvz_get_ic_rate/get_coded_level
           (ref src/rdo.c:346-462);
        2. an exact last-significant-position walk over the diagonal
           scan (cumulative-sum formulation of the reference's :463-517
           reverse walk): every candidate last position is priced with
           its last_sig_x/y bits, in-span costs before it and pure
           distortion after it, including the all-zero (cbf=0) option;
        3. a coded-sub-block zeroing pass (the CG loop of kvz_rdoq,
           :661) dropping groups whose coded cost exceeds their
           distortion-only cost + csbf savings.

        All decisions stay conformant (levels are just levels); the SDH
        parity fix runs after as before."""
        n = 1 << log2n
        L = co.shape[0]
        bd = getattr(self, "bd", 8)
        absco = jnp.abs(co)
        scale_i = jnp.asarray(scale, jnp.int32)
        lf = ((absco * scale_i + (1 << (qbits - 1))) >> qbits) \
            .astype(jnp.int32)
        lam = 0.57 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 3.0)
        lamb = jnp.asarray(self.RDOQ_LAMBDA_SCALE * lam, jnp.float32)
        # pixel-SSE currency: scaled-domain err^2 / (scale^2 * 4^shift)
        scale_f = scale_i.astype(jnp.float32)
        inv = 1.0 / (scale_f * scale_f * (4.0 ** (15 - bd - log2n)))

        def D(l):
            e = (absco * scale_i - (l << qbits)).astype(jnp.float32)
            return e * e * inv

        xx = jnp.arange(n)[None, :]
        yy = jnp.arange(n)[:, None]
        # --- significance-flag prices per position -------------------
        if log2n == 2:
            from ..tables import SIG_CTX_MAP_4X4
            sigc = jnp.asarray(SIG_CTX_MAP_4X4, jnp.int32).reshape(4, 4)
            if not is_luma:
                sigc = sigc + 27
        else:
            cgf = (lf != 0).reshape(L, n // 4, 4, n // 4, 4) \
                .any(axis=(2, 4))
            right = jnp.pad(cgf[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
            below = jnp.pad(cgf[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
            prev = right.astype(jnp.int32) + 2 * below.astype(jnp.int32)
            prev = jnp.repeat(jnp.repeat(prev, 4, 1), 4, 2)  # [L, n, n]
            xp = xx & 3
            yp = yy & 3
            s0 = jnp.where(xp + yp == 0, 2, jnp.where(xp + yp < 3, 1, 0))
            s1 = jnp.where(yp == 0, 2, jnp.where(yp == 1, 1, 0))
            s2 = jnp.where(xp == 0, 2, jnp.where(xp == 1, 1, 0))
            sigc = jnp.where(prev == 0, s0 + jnp.zeros_like(prev),
                             jnp.where(prev == 1, s1,
                                       jnp.where(prev == 2, s2, 2)))
            if is_luma:
                sigc = sigc + jnp.where((xx >> 2) + (yy >> 2) > 0, 3, 0)
                sigc = sigc + (9 if log2n == 3 else 21)
            else:
                sigc = sigc + (9 if log2n == 3 else 12)
            sigc = jnp.where((xx == 0) & (yy == 0), 0, sigc)
            if not is_luma:
                sigc = sigc + 27
        s0b = self.sigp[sigc, 0]
        s1b = self.sigp[sigc, 1]
        # --- level prices (greater1/greater2 at in-CG start ctx) -----
        cg0 = (xx < 4) & (yy < 4)
        rowmap = (jnp.where(cg0, 0, 1) if is_luma
                  else jnp.full((n, n), 2, jnp.int32))
        g1b = jnp.take(self.g1p, rowmap, axis=0)       # [n, n, 2]
        g2b = jnp.take(self.g2p, rowmap, axis=0)

        def lvl_bits(l):
            lf32 = l.astype(jnp.float32)
            rem = jnp.maximum(lf32 - 3.0, 0.0)
            gol = jnp.where(rem < 3.0, rem + 1.0,
                            4.0 + 2.0 * jnp.floor(
                                jnp.log2(jnp.maximum(rem, 1.0))))
            b3 = g1b[..., 1] + g2b[..., 1] + 1.0 + gol
            return jnp.where(l == 0, 0.0,
                             jnp.where(l == 1, g1b[..., 0] + 1.0,
                                       jnp.where(l == 2, g1b[..., 1]
                                                 + g2b[..., 0] + 1.0, b3)))

        big = jnp.float32(1e30)
        l1 = jnp.maximum(lf - 1, 0)
        c0 = D(0) + lamb * s0b
        c1v = jnp.where(l1 > 0,
                        D(l1) + lamb * (s1b + lvl_bits(l1)), big)
        c2v = jnp.where(lf > 0,
                        D(lf) + lamb * (s1b + lvl_bits(lf)), big)
        A = jnp.minimum(c0, jnp.minimum(c1v, c2v))     # best in-span
        lin = jnp.where((c1v <= c2v) & (c1v <= c0), l1,
                        jnp.where(c2v <= c0, lf, 0))
        ANZ = jnp.minimum(c1v, c2v)                    # best nonzero
        lnz = jnp.where(c1v <= c2v, l1, lf)
        B = D(0)                                       # beyond last pos
        # --- last-position walk over the diagonal scan ----------------
        perm, invp = self._rdoq_scan(log2n)
        lam2 = lamb.reshape(-1, 1) if lamb.ndim == 3 else lamb

        def g(x):
            x = jnp.broadcast_to(x, (L, n, n))
            return x.reshape(L, n * n)[:, perm]

        As, ANZs, Bs = g(A), g(ANZ), g(B)
        lins, lnzs = g(lin), g(lnz)
        prefA = jnp.cumsum(As, axis=1) - As            # exclusive
        sufB = (jnp.cumsum(Bs[:, ::-1], axis=1)[:, ::-1] - Bs)
        lastv = getattr(self,
                        f"last{'p' if is_luma else 'c'}{log2n}")
        tot = prefA + ANZs + lam2 * lastv[None, :] + sufB
        tot = jnp.where(g(lf > 0), tot, big)
        p_star = jnp.argmin(tot, axis=1)               # [L]
        tot_min = jnp.take_along_axis(tot, p_star[:, None], 1)[:, 0]
        all_zero = Bs.sum(axis=1) <= tot_min
        j = jnp.arange(n * n)[None, :]
        ps = p_star[:, None]
        lev_s = jnp.where(j < ps, lins, jnp.where(j == ps, lnzs, 0))
        lev_s = jnp.where(all_zero[:, None], 0, lev_s)
        # --- coded-sub-block zeroing pass ------------------------------
        ncg = (n * n) >> 4
        if ncg > 1:
            cost_keep = jnp.where(j < ps, As,
                                  jnp.where(j == ps, ANZs, Bs))
            keep_cg = cost_keep.reshape(L, ncg, 16).sum(2)
            zero_cg = Bs.reshape(L, ncg, 16).sum(2)
            ci = 1 + (0 if is_luma else 2)   # neighbour-coded csbf ctx
            csbf0 = self.csbfp[ci, 0]
            csbf1 = self.csbfp[ci, 1]
            gidx = jnp.arange(ncg)[None, :]
            cg_of_p = (p_star >> 4)[:, None]
            zmask = (zero_cg + lam2 * csbf0 < keep_cg + lam2 * csbf1) \
                & (gidx != 0) & (gidx != cg_of_p)
            lev_s = jnp.where(jnp.repeat(zmask, 16, axis=1), 0, lev_s)
        lev = lev_s[:, invp].reshape(L, n, n)
        return (jnp.sign(co) * lev).astype(jnp.int32)

    def _partition(self, src_y, src_cb, src_cr, lam):
        """Returns (size_map8 [R8,C8] in {4,8,16,32,64} — 4 marks an
        NxN-partitioned 8x8 CU — mode_map8 [R8,C8], and mode_map4
        [R4,C4] with per-4x4 PU modes)."""
        m8, c8c = self._leaf_rd(src_y, src_cb, src_cr, 8, self.g8l,
                                self.f8, self.g4c, self.t8, self.t4, lam)
        # NxN-vs-2Nx2N competition at the 8x8 CU level; the part_mode
        # bin is coded either way at min CB size but its two values cost
        # different fractional bits
        c8c = c8c + lam * self.dpc[self.DPC_PART_2NX2N]
        nxn8 = m4 = None
        if self.allow[4]:
            m4, cnxn = self._leaf_rd4(src_y, src_cb, src_cr, lam)
            cn = (cnxn + lam * self.dpc[self.DPC_PART_NXN]) \
                .reshape(self.r8, self.c8)
            c2n = c8c.reshape(self.r8, self.c8)
            if self.force_nxn:
                nxn8 = jnp.ones_like(cn, bool)
            else:
                nxn8 = cn < c2n
            c8c = jnp.where(nxn8, cn, c2n).reshape(-1)
        m16, c16c = self._leaf_rd(src_y, src_cb, src_cr, 16, self.g16l,
                                  self.f16l, self.g8cc, self.t16, self.t8,
                                  lam)
        m32, c32c = self._leaf_rd(src_y, src_cb, src_cr, 32, self.g32l,
                                  self.f32, self.g16c, self.t32, self.t16,
                                  lam)
        r16, c16n = self.h // 16, self.w // 16
        r32, c32n = self.h // 32, self.w // 32
        if self.delta_qp:
            lam16 = self._ctb_vec(self.lammap, 16).reshape(r16, c16n)
            lam32 = self._ctb_vec(self.lammap, 32).reshape(r32, c32n)
        else:
            lam16 = lam32 = lam

        def sum4(c, rows, cols):
            return c.reshape(rows, 2, cols, 2).sum(axis=(1, 3))

        sp0 = self.dpc[self.DPC_SPLIT0]
        sp1 = self.dpc[self.DPC_SPLIT1]
        c8m = c8c.reshape(self.r8, self.c8)
        # the four 8x8 children are at max depth: no split_cu_flag there
        sum8 = sum4(c8m, r16, c16n)
        leaf16 = c16c.reshape(r16, c16n)
        split16 = sum8 + lam16 * sp1 < leaf16 + lam16 * sp0
        # --pu-depth-intra constraints: force/forbid splits statically
        if not self.allow[8]:
            split16 = jnp.zeros_like(split16)
        if not self.allow[16]:
            split16 = jnp.ones_like(split16)
        best16 = jnp.where(split16, sum8 + lam16 * sp1,
                           leaf16 + lam16 * sp0)
        sum16 = sum4(best16, r32, c32n)
        leaf32 = c32c.reshape(r32, c32n)
        split32 = sum16 + lam32 * sp1 < leaf32 + lam32 * sp0
        if not self.allow[32]:
            split32 = jnp.ones_like(split32)
        elif not (self.allow[16] or self.allow[8]):
            split32 = jnp.zeros_like(split32)
        split64 = None
        if self.allow[64]:
            m64, c64c = self._leaf_rd64(src_y, src_cb, src_cr, lam)
            r64, c64n = self.h // 64, self.w // 64
            lam64 = (self._ctb_vec(self.lammap, 64).reshape(r64, c64n)
                     if self.delta_qp else lam)
            best32 = jnp.where(split32, sum16 + lam32 * sp1,
                               leaf32 + lam32 * sp0)
            sum32 = sum4(best32, r64, c64n)
            split64 = sum32 + lam64 * sp1 < \
                c64c.reshape(r64, c64n) + lam64 * sp0
            if not (self.allow[32] or self.allow[16] or self.allow[8]):
                split64 = jnp.zeros_like(split64)
        # expand decisions to the 8-grid
        e32 = jnp.repeat(jnp.repeat(split32, 2, 0), 2, 1)  # [r16, c16]
        sz16 = jnp.where(~e32, 32, jnp.where(split16, 8, 16))
        size_map8 = jnp.repeat(jnp.repeat(sz16, 2, 0), 2, 1) \
            .astype(jnp.int32)
        mode16_8 = jnp.repeat(jnp.repeat(m16.reshape(r16, c16n), 2, 0),
                              2, 1)
        mode32_8 = jnp.repeat(jnp.repeat(m32.reshape(r32, c32n), 4, 0),
                              4, 1)
        mode_map8 = jnp.where(size_map8 == 8, m8.reshape(self.r8, self.c8),
                              jnp.where(size_map8 == 16, mode16_8,
                                        mode32_8)).astype(jnp.int32)
        if split64 is not None:
            is64 = ~jnp.repeat(jnp.repeat(split64, 8, 0), 8, 1)
            mode64_8 = jnp.repeat(jnp.repeat(m64.reshape(r64, c64n),
                                             8, 0), 8, 1)
            size_map8 = jnp.where(is64, 64, size_map8).astype(jnp.int32)
            mode_map8 = jnp.where(is64, mode64_8, mode_map8) \
                .astype(jnp.int32)
        if nxn8 is not None:
            r4n, c4n = self.h // 4, self.w // 4
            isn = (size_map8 == 8) & nxn8
            m4m = m4.reshape(r4n, c4n)
            # mode_map8 for an NxN cell = PU0's mode (chroma DM source)
            size_map8 = jnp.where(isn, 4, size_map8).astype(jnp.int32)
            mode_map8 = jnp.where(isn, m4m[::2, ::2], mode_map8) \
                .astype(jnp.int32)
            isn4 = jnp.repeat(jnp.repeat(isn, 2, 0), 2, 1)
            mode_map4 = jnp.where(
                isn4, m4m,
                jnp.repeat(jnp.repeat(mode_map8, 2, 0), 2, 1)) \
                .astype(jnp.int32)
        else:
            mode_map4 = jnp.repeat(jnp.repeat(mode_map8, 2, 0), 2, 1)
        return size_map8, mode_map8, mode_map4

    # ------------------------------------------------------------------
    # stage 3: self-scheduled wavefront reconstruction
    # ------------------------------------------------------------------

    def _leaf_z(self, size_map8):
        """Morton code of each cell's leaf (coding-order key per cell)."""
        r = jnp.arange(self.r8)[:, None]
        c = jnp.arange(self.c8)[None, :]
        k = size_map8 >> 3  # 1, 2, 4
        lr = r & ~(k - 1)
        lc = c & ~(k - 1)
        return self.m8[lr, lc]

    def _class_deps(self, size_map8, leafz, written, s):
        """Per class-grid-position ready mask + static avail descriptors.
        Returns (ready [Rs, Cs], n_bl [Rs, Cs], n_tr [Rs, Cs]).

        All window reductions are expressed as reshape views
        [Rs+1, k, Cs+1, k] of the zero/big-padded cell maps — reshapes
        are free on TPU, unlike strided slices."""
        st = self._class_static(size_map8, leafz, s)
        ready = self._class_ready(written, st, s)
        return ready, st["n_bl"], st["n_tr"]

    def _class_static(self, size_map8, leafz, s, mode_map8=None):
        """Frame-constant per-class scheduling data (hoisted out of the
        wave loop): leaf mask + z-order availability masks/counts, plus
        mode-dependent dependency masks — a TU only waits for neighbour
        samples its prediction mode actually reads (spec 8.4.4.2.6:
        vertical-family modes 27..34 never touch the left column,
        horizontal-family 2..9 never touch the top row), which shortens
        the wavefront's critical path on directional content."""
        k = s // 8
        rs, cs = self.r8 // k, self.c8 // k
        big = jnp.int32(1 << 30)
        zt = self.m8[::k, ::k]
        z4 = jnp.pad(leafz, ((0, k), (0, k)), constant_values=big) \
            .reshape(rs + 1, k, cs + 1, k)
        # below-left blocks (r+1, j, c-1, k-1); top-right (r-1, k-1, c+1, j)
        av_bl = z4[1:, :, :cs - 1, k - 1] < zt[:, None, 1:]  # [rs,k,cs-1]
        av_tr = z4[:rs - 1, k - 1, 1:, :] < zt[1:, :, None]  # [rs-1,cs,k]
        st = {
            "leaf": size_map8[::k, ::k] == s,
            "av_bl": av_bl,
            "av_tr": av_tr,
            "n_bl": jnp.pad(av_bl.sum(1), ((0, 0), (1, 0))),
            "n_tr": jnp.pad(av_tr.sum(-1), ((1, 0), (0, 0))),
        }
        if mode_map8 is not None:
            m = mode_map8[::k, ::k]
            row0 = (jnp.arange(rs) == 0)[:, None]
            col0 = (jnp.arange(cs) == 0)[None, :]
            needs = self._mode_needs(s)
            nl, nt, nbl, ntr = (jnp.asarray(a) for a in needs)
            # frame-edge substitution re-couples: row 0 fills top from
            # the left column, column 0 fills left from the top row
            st["need_l"] = nl[m] | row0
            st["need_t"] = nt[m] | col0
            st["need_bl"] = nbl[m]
            st["need_tr"] = ntr[m]
        return st

    def _mode_needs(self, s):
        """Per-mode reference dependency masks [35] for luma size s,
        derived EXACTLY from the prediction matrices: a mode waits for a
        neighbour region iff some weight (raw, or raw reaching through
        the [1 2 1] smoothing filter — e.g. filtered left[n-1] reads
        left[n], the first below-left sample) touches that region. The
        chroma TU rides the same mode at half size with no filtering, so
        the luma masks dominate."""
        cache = getattr(self, "_mode_needs_cache", None)
        if cache is None:
            cache = self._mode_needs_cache = {}
        if s in cache:
            return cache[s]
        from ..ops.intra_matrices import (build_filter_matrix,
                                          build_pred_matrices,
                                          ref_vec_len)
        need = np.zeros((4, 35), bool)   # l, t, bl, tr
        for n_, is_luma in ((s, True), (s // 2, False)):
            g = np.abs(np.asarray(
                build_pred_matrices(n_, chroma=not is_luma),
                np.float64))
            f = np.abs(np.asarray(build_filter_matrix(n_), np.float64))
            rlen = ref_vec_len(n_)
            dep = g[:, :, :rlen].sum(1) + g[:, :, rlen:].sum(1) @ f
            reg = {
                0: np.arange(0, n_),                       # left main
                1: np.arange(2 * n_ + 1, 3 * n_ + 1),      # top main
                2: np.arange(n_, 2 * n_),                  # below-left
                3: np.arange(3 * n_ + 1, 4 * n_ + 1),      # top-right
            }
            for i in range(4):
                need[i] |= dep[:, reg[i]].sum(axis=1) > 0
        # cases outside the matrices: DC (separate path: both mains,
        # plus the n<32 edge filter), planar at 32 (separate path: both
        # mains + first bl/tr samples), 10/26 edge fixes at n<32
        need[0, 1] = need[1, 1] = True                     # DC
        need[:, 0] = True                                  # planar
        if s < 32:
            need[1, 10] = True                             # mode 10 row0
            need[0, 26] = True                             # mode 26 col0
        # cache NUMPY (converting to device constants here would leak
        # tracers across jit traces)
        cache[s] = need
        return need

    def _class_ready(self, written, st, s):
        # All neighbour-window reductions are strided slices of the cell
        # map plus leading/trailing-dim reshapes; the previous
        # pad-then-reshape view ([r8+k, c8+k] -> [rs+1, k, cs+1, k])
        # lowered to serialized gather fusions that dominated the wave
        # body (profiled at ~100 us/wave at 1080p).
        k = s // 8
        rs, cs = self.r8 // k, self.c8 // k
        notdone = ~written[::k, ::k]
        unwr = (~written).astype(jnp.int32)
        col_last = unwr[:, k - 1::k]                      # [r8, cs]
        row_last = unwr[k - 1::k, :]                      # [rs, c8]
        # left main: unwritten count in cell column (c-1, last col)
        lm_full = col_last.reshape(rs, k, cs).sum(1)      # [rs, cs]
        lm = jnp.pad(lm_full, ((0, 0), (1, 0)))[:, :cs]
        # corner: cell (r-1, c-1) last pixel row+col
        cor_cells = col_last[k - 1::k, :]                 # [rs, cs]
        cor = jnp.pad(cor_cells, ((1, 0), (1, 0)))[:rs, :cs]
        # top main: unwritten count in cell row (r-1, last row)
        tm_full = row_last.reshape(rs, cs, k).sum(-1)     # [rs, cs]
        tm = jnp.pad(tm_full, ((1, 0), (0, 0)))[:rs, :]
        # below-left: rows (r+1)*k+j of column (c-1, last col)
        blv = jnp.pad(col_last, ((0, k), (0, 0)))[k:] \
            .reshape(rs, k, cs)
        bl_dep = jnp.pad((st["av_bl"] & (blv[:, :, :cs - 1] > 0))
                         .sum(1), ((0, 0), (1, 0)))
        # top-right: cols (c+1)*k+m of row (r, last row)
        trv = jnp.pad(row_last, ((0, 0), (0, k)))[:, k:] \
            .reshape(rs, cs, k)
        tr_dep = jnp.pad((st["av_tr"] & (trv[:rs - 1] > 0))
                         .sum(-1), ((1, 0), (0, 0)))
        ok_l = (lm == 0) if "need_l" not in st else \
            ((lm == 0) | ~st["need_l"])
        ok_t = (tm == 0) if "need_t" not in st else \
            ((tm == 0) | ~st["need_t"])
        ok_bl = (bl_dep == 0) if "need_bl" not in st else \
            ((bl_dep == 0) | ~st["need_bl"])
        ok_tr = (tr_dep == 0) if "need_tr" not in st else \
            ((tr_dep == 0) | ~st["need_tr"])
        return st["leaf"] & notdone & ok_l & (cor == 0) & \
            ok_t & ok_bl & ok_tr

    # ------------------------------------------------------------------
    # one-hot batched gathers/scatters
    #
    # The wave body's data movement is expressed as one-hot einsum
    # selections over band-reshaped views of the planes instead of
    # per-slot dynamic slices: XLA TPU lowers vmapped dynamic_slice /
    # scatter to a SEQUENTIAL per-index loop (profiled at ~3 ms/wave at
    # 1080p), while one-hot contractions run fully parallel on the MXU.
    # Exactness: a one-hot row selects a single term, and all selected
    # values stay far below 2^24, so f32 contraction is exact.
    # ------------------------------------------------------------------

    @staticmethod
    def _oh(idx, size, valid=None):
        """One-hot [L, size] f32 of idx (clipped); invalid rows zero."""
        m = jnp.arange(size)[None, :] == jnp.clip(idx, 0, size - 1)[:, None]
        if valid is not None:
            m = m & valid[:, None]
        return m.astype(jnp.float32)

    @staticmethod
    def _sel2(oh, table):
        """oh [L, C] x table [L, C] -> [L] (int32)."""
        return jnp.einsum("lc,lc->l", oh, table.astype(jnp.float32)) \
            .astype(jnp.int32)

    @staticmethod
    def _sel4(oh, table):
        """oh [L, C] x table [L, C, a, b] -> [L, a, b] (int32)."""
        return jnp.einsum("lc,lcab->lab", oh,
                          table.astype(jnp.float32)).astype(jnp.int32)

    @staticmethod
    def _pick(vals, idx):
        """Per-row single-element pick [L, W] -> [L] via one-hot sum."""
        oh = (jnp.arange(vals.shape[1])[None, :]
              == jnp.clip(idx, 0, vals.shape[1] - 1)[:, None]) \
            .astype(vals.dtype)
        return (vals * oh).sum(axis=1)

    def _substitute(self, left_raw, top_raw, corner_raw, n, has_left,
                    has_top, n_bl, n_tr, cell_px):
        """Reference substitution (spec 8.4.4.2.2), identical to the
        decoder rules. Raw inputs [L, 2n], [L, 2n], [L]."""
        idx = jnp.arange(2 * n)[None, :]
        fill = jnp.where(has_top, top_raw[:, 0], 1 << (self.bd - 1))
        bl_px = n_bl * cell_px
        last_left = jnp.where(n_bl > 0, n + bl_px - 1, n - 1)
        lval = self._pick(left_raw, last_left)
        left = jnp.where(idx < n + bl_px[:, None], left_raw,
                         lval[:, None])
        left = jnp.where(has_left[:, None], left, fill[:, None])
        has_corner = has_left & has_top
        corner = jnp.where(has_corner, corner_raw,
                           jnp.where(has_left, left[:, 0], fill))
        tr_px = n_tr * cell_px
        last_top = jnp.where(n_tr > 0, n + tr_px - 1, n - 1)
        tval = self._pick(top_raw, last_top)
        top = jnp.where(idx < n + tr_px[:, None], top_raw, tval[:, None])
        top = jnp.where(has_top[:, None], top, corner[:, None])
        pad = jnp.zeros((left.shape[0], 1), jnp.int32)
        return jnp.concatenate([left, corner[:, None], top, pad], axis=1)

    def _raw_refs_from_stores(self, R, C, n, rs, cs, c_star, valid,
                              has_left, k8):
        """Raw (pre-substitution) refs for all slots of one class:
        (left_raw [L, 2n], top_raw [L, 2n], corner_raw [L]), read from
        the row store R [rows8, w'] (bottom pixel row of every written
        8-cell row) and the TRANSPOSED column store C [cols8, h'] (last
        pixel column of every written 8-cell column). All reads are
        static-index takes or small one-hot contractions; per-slot
        dynamic windows never touch a full-resolution plane (XLA TPU
        serializes those). k8 = cells per class step in the store grid."""
        f32 = jnp.float32
        # top rows: store row (r*k8 - 1), static indices (r=0 -> dup 0,
        # masked by has_top)
        tidx = np.maximum(np.arange(rs) * k8 - 1, 0)
        Rv = jnp.take(R, jnp.asarray(tidx), axis=0)     # [rs, wpix]
        Rv_cells = Rv.reshape(rs, cs, n).astype(f32)
        oh0 = self._oh(c_star, cs, valid)
        oh1 = self._oh(c_star + 1, cs, valid)
        top_raw = jnp.concatenate([
            jnp.einsum("lc,lcn->ln", oh0, Rv_cells),
            jnp.einsum("lc,lcn->ln", oh1, Rv_cells)], axis=1) \
            .astype(jnp.int32)
        # corner: element n-1 of cell (c_star-1) in the same rows
        ohm = self._oh(c_star - 1, cs, has_left)
        corner_raw = jnp.einsum("lc,lc->l", ohm,
                                Rv_cells[:, :, n - 1]).astype(jnp.int32)
        # left columns: store row (c_star*k8 - 1) of the transposed
        # column store, selected by one-hot (dynamic row), then the
        # static diagonal window rows y0..y0+2n
        ohc = self._oh(c_star * k8 - 1, C.shape[0], has_left)
        sel = jnp.einsum("lc,ch->lh", ohc, C.astype(f32))  # [rs, hpix]
        selp = jnp.concatenate(
            [sel, jnp.zeros((rs, n), f32)], axis=1).reshape(rs, rs + 1, n)
        dg = np.zeros((rs, 2, rs + 1), np.float32)
        dg[np.arange(rs), 0, np.arange(rs)] = 1.0
        dg[np.arange(rs), 1, np.arange(rs) + 1] = 1.0
        left_raw = jnp.einsum("rkc,rcn->rkn", jnp.asarray(dg), selp) \
            .reshape(rs, 2 * n).astype(jnp.int32)
        return left_raw, top_raw, corner_raw

    def _refs_from_stores(self, R, C, n, rs, cs, c_star, valid, has_left,
                          has_top, n_bl, n_tr, cell_px, k8):
        """Normative (substituted) refs for all slots of one class."""
        left_raw, top_raw, corner_raw = self._raw_refs_from_stores(
            R, C, n, rs, cs, c_star, valid, has_left, k8)
        return self._substitute(left_raw, top_raw, corner_raw, n,
                                has_left, has_top, n_bl, n_tr, cell_px)

    def _store_updates(self, R, C, rec, c_star, valid, rs, cs, n, k8):
        """Write a fired block's bottom rows / right columns into the
        row/column stores (the only recon state the wavefront reads)."""
        cell = n // k8
        # R: rows r*k8+j (static), columns at cell c_star (dynamic)
        rb = rec[:, cell - 1::cell, :]               # [rs, k8, n]
        Rv = R.reshape(rs, k8, cs, n)
        ohf = self._oh(c_star, cs, valid)
        placed = jnp.einsum("lc,lkn->lkcn", ohf, rb.astype(jnp.float32))
        keep = (1.0 - ohf)[:, None, :, None]
        R = (placed + Rv.astype(jnp.float32) * keep) \
            .astype(R.dtype).reshape(R.shape)
        # C (transposed): rows c_star*k8+m (dynamic), cols y0..y0+n
        # (static per slot)
        cb = jnp.moveaxis(rec[:, :, cell - 1::cell], 2, 1)  # [rs, k8, n]
        oh8 = jnp.concatenate(
            [self._oh(c_star * k8 + m, C.shape[0], valid)[:, None, :]
             for m in range(k8)], axis=1)            # [rs, k8, c8]
        Cv = C.reshape(C.shape[0], rs, n)
        placed_c = jnp.einsum("lmc,lmn->cln", oh8,
                              cb.astype(jnp.float32))
        mask_c = jnp.einsum("lmc->cl", oh8)[:, :, None]
        C = (placed_c + Cv.astype(jnp.float32) * (1.0 - mask_c)) \
            .astype(C.dtype).reshape(C.shape)
        return R, C

    def _class_pre(self, src_y, src_cb, src_cr, mode_map8, s):
        """Loop-invariant per-class tables: flat blocked sources (for
        row-takes) and per-position mode/QP tables [rs, cs]."""
        k = s // 8
        rs, cs = self.r8 // k, self.c8 // k

        def blk(plane, n):
            return jnp.moveaxis(
                plane.reshape(rs, n, cs, n), 1, 2).reshape(rs * cs, n, n)

        pre = {"by": blk(src_y, s), "bcb": blk(src_cb, s // 2),
               "bcr": blk(src_cr, s // 2),
               "modes": mode_map8[::k, ::k]}
        if self.delta_qp:
            rr = (jnp.arange(rs) * s) // self.CTB
            cc = (jnp.arange(cs) * s) // self.CTB
            pre["qpy"] = self.qpmap_y[rr[:, None], cc[None, :]]
            pre["qpc"] = self.qpmap_c[rr[:, None], cc[None, :]]
        return pre

    def _nxn_apply(self, Rl, Cl, rs, cs, c_star, valid, has_left,
                   has_top, nbl, ntr, modes4, qp_y, src8):
        """Sequential z-order reconstruction of the four 4x4 DST luma
        TUs of NxN cells, batched over slots. Each sub-TU does its own
        reference substitution (spec 8.4.4.2.2) with availability
        derived from z order: internal neighbours come from the just-
        reconstructed sub-blocks, external ones from the cell's raw
        stores refs. Returns (rec8 [L, 8, 8], lvl8 [L, 8, 8])."""
        lraw, traw, craw = self._raw_refs_from_stores(
            Rl, Cl, 8, rs, cs, c_star, valid, has_left, 1)
        L = lraw.shape[0]
        true_ = jnp.ones((L,), bool)
        one = jnp.ones((L,), jnp.int32)
        zero = jnp.zeros((L,), jnp.int32)
        z4 = jnp.zeros((L, 4), jnp.int32)
        mats4 = self._mats_for(4, True)
        lam_ts = 0.57 * 2.0 ** ((jnp.asarray(qp_y, jnp.float32) - 12.0)
                                / 3.0) if self.trskip else None
        recs, lvls, tss = [], [], []
        # (dy, dx, per-sub ref construction) in z order
        for i, (dy, dx) in enumerate(((0, 0), (0, 4), (4, 0), (4, 4))):
            mode = modes4[:, i]
            if i == 0:
                lr, tr_, cr = lraw[:, 0:8], traw[:, 0:8], craw
                hl, ht = has_left, has_top
                nb = has_left.astype(jnp.int32)
                nt = has_top.astype(jnp.int32)
            elif i == 1:
                lr = jnp.concatenate([recs[0][:, :, 3], z4], axis=1)
                tr_, cr = traw[:, 4:12], traw[:, 3]
                hl, ht = true_, has_top
                nb, nt = zero, jnp.minimum(ntr, 1)
            elif i == 2:
                lr, cr = lraw[:, 4:12], lraw[:, 3]
                tr_ = jnp.concatenate([recs[0][:, 3, :],
                                       recs[1][:, 3, :]], axis=1)
                hl, ht = has_left, true_
                nb, nt = jnp.minimum(nbl, 1), one
            else:
                lr = jnp.concatenate([recs[2][:, :, 3], z4], axis=1)
                tr_ = jnp.concatenate([recs[1][:, 3, :], z4], axis=1)
                cr = recs[0][:, 3, 3]
                hl, ht = true_, true_
                nb, nt = zero, zero
            refs = self._substitute(lr, tr_, cr, 4, hl, ht, nb, nt, 4)
            pred = self._pred_one(refs, mode, self.g4l, self.f4, 4,
                                  True).reshape(L, 4, 4)
            resi = src8[:, dy:dy + 4, dx:dx + 4] - pred
            # 4x4 luma: mode-dependent coefficient scan (spec 7.4.9.11)
            self._sdh_scan_sel = jnp.where(
                (mode >= 6) & (mode <= 14), 2,
                jnp.where((mode >= 22) & (mode <= 30), 1, 0))
            try:
                if self.trskip:
                    levels, r2, ts = self._tq_4x4_rd(
                        resi, self.dst4, qp_y, lam_ts, mats=mats4,
                        is_luma=True)
                else:
                    levels, r2 = self._transform_quant(
                        resi, self.dst4, qp_y, 4, mats=mats4)
                    ts = None
            finally:
                self._sdh_scan_sel = None
            cbf = jnp.any(levels != 0, axis=(1, 2))
            recs.append(jnp.clip(
                pred + jnp.where(cbf[:, None, None], r2, 0),
                0, self.maxv))
            lvls.append(jnp.where(cbf[:, None, None], levels, 0))
            tss.append(ts)

        def asm(parts):
            top = jnp.concatenate([parts[0], parts[1]], axis=2)
            bot = jnp.concatenate([parts[2], parts[3]], axis=2)
            return jnp.concatenate([top, bot], axis=1)
        return (asm(recs), asm(lvls),
                jnp.stack(tss, axis=1) if self.trskip else None)

    def _class_apply(self, stores, s, c_star, valid, st, pre):
        """Reconstruct the fired TUs of size s (slot r fires column
        c_star[r]): returns (updated stores, luma blocks [rs, 2, s, s],
        chroma blocks [rs, 4, s/2, s/2]) for the wave log."""
        k = s // 8
        rs, cs = self.r8 // k, self.c8 // k
        Rl, Cl, Rc, Cc = stores
        oh = self._oh(c_star, cs, valid)
        has_left = valid & (c_star > 0)
        has_top = valid & (jnp.arange(rs) > 0)
        nbl = self._sel2(oh, st["n_bl"])
        ntr = self._sel2(oh, st["n_tr"])
        modes = self._sel2(oh, pre["modes"])
        if self.delta_qp:
            qp_y = self._sel2(oh, pre["qpy"])
            qp_c = self._sel2(oh, pre["qpc"])
        else:
            qp_y, qp_c = self.qp2[0], self.qp2[1]
        g, f, gc, t, tc = {
            8: (self.g8l, self.f8, self.g4c, self.t8, self.t4),
            16: (self.g16l, self.f16l, self.g8cc, self.t16, self.t8),
            32: (self.g32l, self.f32, self.g16c, self.t32, self.t16),
        }[s]
        bidx = jnp.arange(rs) * cs + jnp.clip(c_star, 0, cs - 1)
        # lambda for the trskip RD competition (luma-QP derived, like
        # the reference's state->lambda)
        lam_ts = 0.57 * 2.0 ** ((jnp.asarray(qp_y, jnp.float32) - 12.0)
                                / 3.0) if self.trskip else None

        def plane(R, C, blocks_flat, n, cell_px, qp, tm, is_luma):
            refs = self._refs_from_stores(R, C, n, rs, cs, c_star, valid,
                                          has_left, has_top, nbl, ntr,
                                          cell_px, k)
            pred = self._pred_one(refs, modes, g if is_luma else gc,
                                  f if is_luma else gc, n, is_luma)
            pred = pred.reshape(-1, n, n)
            srcb = jnp.take(blocks_flat, bidx, axis=0)
            resi = srcb - pred
            # None (not a traced zeros array) when trskip is off, so the
            # trskip-off jaxpr — and its compile-cache key — is unchanged
            ts = (jnp.zeros((pred.shape[0],), bool) if self.trskip
                  else None)
            if (is_luma and n == 8) or (not is_luma and n == 4):
                # mode-dependent coefficient scan (spec 7.4.9.11)
                self._sdh_scan_sel = jnp.where(
                    (modes >= 6) & (modes <= 14), 2,
                    jnp.where((modes >= 22) & (modes <= 30), 1, 0))
            try:
                if self.trskip and n == 4 and not is_luma:
                    levels, r2, ts = self._tq_4x4_rd(
                        resi, tm, qp, lam_ts,
                        mats=self._mats_for(n, is_luma), is_luma=False)
                else:
                    levels, r2 = self._transform_quant(
                        resi, tm, qp, n, mats=self._mats_for(n, is_luma),
                        is_luma=is_luma)
            finally:
                self._sdh_scan_sel = None
            cbf = jnp.any(levels != 0, axis=(1, 2))
            rec_blk = jnp.clip(
                pred + jnp.where(cbf[:, None, None], r2, 0), 0, self.maxv)
            lvl_blk = jnp.where(cbf[:, None, None], levels, 0)
            return rec_blk, lvl_blk, ts

        rb, lb, _ = plane(Rl, Cl, pre["by"], s, 8, qp_y, t, True)
        ts_nxn = None
        if s == 8 and "nxn" in pre:
            # NxN cells: replace the 2Nx2N recon with the four-4x4-TU
            # sequential recon (chroma below is untouched — its DM mode
            # is PU0's, which mode_map8 already carries for NxN cells)
            nxnf = self._sel2(oh, pre["nxn"].astype(jnp.int32)) > 0
            m4sel = jnp.einsum(
                "lc,lcm->lm", oh, pre["modes4"].astype(jnp.float32)) \
                .astype(jnp.int32)
            srcb8 = jnp.take(pre["by"], bidx, axis=0)
            rb_n, lb_n, ts_n = self._nxn_apply(
                Rl, Cl, rs, cs, c_star, valid, has_left, has_top,
                nbl, ntr, m4sel, qp_y, srcb8)
            sel3 = nxnf[:, None, None]
            rb = jnp.where(sel3, rb_n, rb)
            lb = jnp.where(sel3, lb_n, lb)
            if self.trskip:
                ts_nxn = ts_n & nxnf[:, None]
        Rl, Cl = self._store_updates(Rl, Cl, rb, c_star, valid, rs, cs,
                                     s, k)
        sc = s // 2
        rbc, lbc, tscb = plane(Rc[0], Cc[0], pre["bcb"], sc, 4, qp_c, tc,
                               False)
        rbr, lbr, tscr = plane(Rc[1], Cc[1], pre["bcr"], sc, 4, qp_c, tc,
                               False)
        R0, C0 = self._store_updates(Rc[0], Cc[0], rbc, c_star, valid,
                                     rs, cs, sc, k)
        R1, C1 = self._store_updates(Rc[1], Cc[1], rbr, c_star, valid,
                                     rs, cs, sc, k)
        Rc = jnp.stack([R0, R1])
        Cc = jnp.stack([C0, C1])
        yblocks = jnp.stack([rb, lb], axis=1).astype(jnp.int16)
        cblocks = jnp.stack([rbc, rbr, lbc, lbr], axis=1) \
            .astype(jnp.int16)
        tsb = None
        if self.trskip and s == 8:
            # [L, 6]: 4 NxN luma sub-TU skip bits (z order) + cb + cr
            if ts_nxn is None:
                ts_nxn = jnp.zeros((rb.shape[0], 4), bool)
            tsb = jnp.concatenate(
                [ts_nxn, tscb[:, None], tscr[:, None]],
                axis=1).astype(jnp.int8)
        return (Rl, Cl, Rc, Cc), yblocks, cblocks, tsb

    def _assemble_class(self, logy, logc, wv, s):
        """Post-loop: gather each class position's logged blocks into
        full planes. Returns (rec_y, lvl_y [h, w], rec_cb, rec_cr,
        lvl_cb, lvl_cr at half res)."""
        k = s // 8
        rs, cs = self.r8 // k, self.c8 // k
        sc = s // 2
        slot = wv * rs + jnp.arange(rs)[:, None]        # [rs, cs]
        ly = jnp.take(logy.reshape(-1, 2 * s * s), slot.reshape(-1),
                      axis=0).reshape(rs, cs, 2, s, s)
        lc = jnp.take(logc.reshape(-1, 4 * sc * sc), slot.reshape(-1),
                      axis=0).reshape(rs, cs, 4, sc, sc)

        def to_plane(b, n):
            # [rs, cs, n, n] -> [h', w']
            return jnp.moveaxis(b, 2, 1).reshape(rs * n, cs * n)
        return (to_plane(ly[:, :, 0], s), to_plane(ly[:, :, 1], s),
                to_plane(lc[:, :, 0], sc), to_plane(lc[:, :, 1], sc),
                to_plane(lc[:, :, 2], sc), to_plane(lc[:, :, 3], sc))

    def _recon_md(self, src_y, src_cb, src_cr, size_map8, mode_map8,
                  init_state=None, exclude8=None, mode_map4=None):
        """Self-scheduled recon. The wavefront loop carries only the
        row/column reference stores, the written mask, per-class fire
        wave maps and per-wave block logs; the full planes are assembled
        ONCE after the loop (keeping full-resolution buffers out of the
        loop was worth ~4x: TPU scatters and region merges dominated).

        init_state: optional pre-seeded (luma, chroma, written8) planes
        (the inter path batch-reconstructs its leaves first); exclude8:
        cells whose leaves the wavefront must NOT fire (inter cells).
        Returns (luma [2, Hp, Wp], chroma [4, Hc, Wc], written) in the
        same +1-offset layout as before."""
        # a 64x64 intra CU reconstructs exactly as four 32x32 TUs
        # sharing one mode (prediction/recon happen per TU with z-order
        # availability, spec 8.4.4.2.2), so the wavefront sees it as
        # four 32-leaves; only the syntax writer needs the distinction.
        # NxN cells (code 4) schedule as 8-leaves whose apply step runs
        # the sequential four-4x4-TU recon instead.
        nxn8 = None
        if mode_map4 is not None and self.allow[4]:
            nxn8 = size_map8 == 4
        size_map8 = jnp.clip(size_map8, 8, 32)
        h, w = self.h, self.w
        zseed = (src_y[0, 0] * 0).astype(jnp.int32)
        if init_state is None:
            luma0 = jnp.zeros((2, 1 + h + 64, 1 + w + 64),
                              jnp.int32) + zseed
            chroma0 = jnp.zeros((4, 1 + h // 2 + 32, 1 + w // 2 + 32),
                                jnp.int32) + zseed
            written = jnp.zeros((self.r8, self.c8), bool)
        else:
            luma0, chroma0, written = init_state
        # seed the stores from the pre-written planes (inter leaves):
        # bottom pixel row / last pixel column of every 8-cell
        ry0 = luma0[0, 1:1 + h, 1:1 + w]
        Rl = ry0[7::8, :]                               # [r8, w]
        Cl = ry0[:, 7::8].T                             # [c8, h]
        rc0 = chroma0[0:2, 1:1 + h // 2, 1:1 + w // 2]
        Rc = rc0[:, 3::4, :]                            # [2, r8, w/2]
        Cc = jnp.moveaxis(rc0[:, :, 3::4], 2, 1)        # [2, c8, h/2]
        leafz = self._leaf_z(size_map8)
        statics = {}
        pres = {}
        for s in self.SIZES:
            st = self._class_static(size_map8, leafz, s, mode_map8)
            if exclude8 is not None:
                k = s // 8
                st = dict(st)
                st["leaf"] = st["leaf"] & ~exclude8[::k, ::k]
            if s == 8 and nxn8 is not None:
                # NxN cells wait for every neighbour region their four
                # sub-modes might read (conservative, always correct)
                st = dict(st)
                for kk in ("need_l", "need_t", "need_bl", "need_tr"):
                    st[kk] = st[kk] | nxn8
            statics[s] = st
            pres[s] = self._class_pre(src_y, src_cb, src_cr, mode_map8, s)
            if s == 8 and nxn8 is not None:
                pres[s]["nxn"] = nxn8
                m4 = mode_map4
                pres[s]["modes4"] = jnp.stack(
                    [m4[0::2, 0::2], m4[0::2, 1::2],
                     m4[1::2, 0::2], m4[1::2, 1::2]], axis=-1)
        cap = 3 * self.r8 + 2 * self.c8 + 64   # >= any observed chain
        logs = {}
        wvs = {}
        for s in self.SIZES:
            k = s // 8
            rs = self.r8 // k
            cs = self.c8 // k
            logs[s] = (jnp.zeros((cap, rs, 2, s, s), jnp.int16),
                       jnp.zeros((cap, rs, 4, s // 2, s // 2),
                                 jnp.int16))
            if self.trskip and s == 8:
                # per-wave transform_skip bits: 4 NxN luma + cb + cr
                logs[s] = logs[s] + (jnp.zeros((cap, rs, 6), jnp.int8),)
            wvs[s] = jnp.zeros((rs, cs), jnp.int32)

        def cond(state):
            wave, written, stores, logs, wvs = state
            return (~jnp.all(written)) & (wave < cap)

        def body(state):
            wave, written, stores, logs, wvs = state
            new_written = written
            new_logs = {}
            new_wvs = {}
            for s in self.SIZES:
                k = s // 8
                rs, cs = self.r8 // k, self.c8 // k
                ready = self._class_ready(written, statics[s], s)
                # fire the leftmost ready TU of every class row: the
                # left-main dependency chains rows, so this is the
                # natural frontier width
                c_star = jnp.argmin(
                    jnp.where(ready, jnp.arange(cs)[None, :], cs),
                    axis=1).astype(jnp.int32)
                row_has = ready.any(axis=1)
                fired_mask = ready & \
                    (jnp.arange(cs)[None, :] == c_star[:, None])
                # broadcast+reshape, NOT jnp.repeat (gather on TPU)
                up = jnp.broadcast_to(
                    fired_mask[:, None, :, None],
                    (rs, k, cs, k)).reshape(self.r8, self.c8)
                new_written = new_written | up
                slogs = logs[s]

                # skip the whole class when no row is ready this wave
                # (TPU lax.cond executes one branch): waves typically
                # fire one or two of the size classes, so this trims
                # the loop body's serial op chain substantially
                def fire(args, s=s, c_star=c_star, row_has=row_has,
                         fired_mask=fired_mask, wave=wave):
                    stores_, slogs_, wv_ = args
                    stores_, yb, cb, tsb = self._class_apply(
                        stores_, s, c_star, row_has, statics[s], pres[s])
                    out = (jax.lax.dynamic_update_slice(
                               slogs_[0], yb[None], (wave, 0, 0, 0, 0)),
                           jax.lax.dynamic_update_slice(
                               slogs_[1], cb[None], (wave, 0, 0, 0, 0)))
                    if tsb is not None:
                        out = out + (jax.lax.dynamic_update_slice(
                            slogs_[2], tsb[None], (wave, 0, 0)),)
                    wv_ = jnp.where(fired_mask, wave, wv_)
                    return stores_, out, wv_

                stores, slogs, wv = jax.lax.cond(
                    row_has.any(), fire, lambda a: a,
                    (stores, slogs, wvs[s]))
                new_logs[s] = slogs
                new_wvs[s] = wv
            return (wave + 1, new_written, stores, new_logs, new_wvs)

        state = (jnp.int32(0), written, (Rl, Cl, Rc, Cc), logs, wvs)
        waves, written, stores, logs, wvs = jax.lax.while_loop(
            cond, body, state)
        self._last_waves = waves   # scheduling diagnostic (device scalar)

        # assembly: per class gather the logged blocks, select by the
        # size map (and skip pre-written inter cells)
        ry = luma0[0, 1:1 + h, 1:1 + w]
        ly_ = luma0[1, 1:1 + h, 1:1 + w]
        rcb = chroma0[0, 1:1 + h // 2, 1:1 + w // 2]
        rcr = chroma0[1, 1:1 + h // 2, 1:1 + w // 2]
        lcb_ = chroma0[2, 1:1 + h // 2, 1:1 + w // 2]
        lcr_ = chroma0[3, 1:1 + h // 2, 1:1 + w // 2]
        ts_maps = None
        for s in self.SIZES:
            k = s // 8
            sel = jnp.repeat(jnp.repeat(
                statics[s]["leaf"], k, 0), k, 1)
            selp = jnp.repeat(jnp.repeat(sel, 8, 0), 8, 1)
            selc = jnp.repeat(jnp.repeat(sel, 4, 0), 4, 1)
            a = self._assemble_class(logs[s][0], logs[s][1], wvs[s], s)
            ry = jnp.where(selp, a[0], ry)
            ly_ = jnp.where(selp, a[1], ly_)
            rcb = jnp.where(selc, a[2], rcb)
            rcr = jnp.where(selc, a[3], rcr)
            lcb_ = jnp.where(selc, a[4], lcb_)
            lcr_ = jnp.where(selc, a[5], lcr_)
            if self.trskip and s == 8:
                # gather the per-8-cell transform_skip bits by fire wave
                slot = wvs[s] * (self.r8) + jnp.arange(self.r8)[:, None]
                ts8 = jnp.take(logs[s][2].reshape(-1, 6),
                               slot.reshape(-1),
                               axis=0).reshape(self.r8, self.c8, 6)
                ts8 = ts8 * sel[:, :, None].astype(jnp.int8)
                ts_maps = ts8
        luma = jnp.zeros_like(luma0)
        luma = luma.at[:, 1:1 + h, 1:1 + w].set(jnp.stack([ry, ly_]))
        chroma = jnp.zeros_like(chroma0)
        chroma = chroma.at[:, 1:1 + h // 2, 1:1 + w // 2].set(
            jnp.stack([rcb, rcr, lcb_, lcr_]))
        return luma, chroma, written, ts_maps

    # ------------------------------------------------------------------
    # full frame
    # ------------------------------------------------------------------

    def _final_qp(self, lvl_y, lvl_cb, lvl_cr) -> jax.Array:
        """Final per-CTB QP (spec 8.6.1 via the qPY_PREV chain): a CTB
        with no coded coefficients never codes its delta, so its QP is
        the running predecessor QP (slice QP at frame/row start)."""
        rc, cc = self.h // self.CTB, self.w // self.CTB
        n, nc2 = self.CTB, self.CTB // 2
        cbf = ((lvl_y.reshape(rc, n, cc, n) != 0).any(axis=(1, 3))
               | (lvl_cb.reshape(rc, nc2, cc, nc2) != 0).any(axis=(1, 3))
               | (lvl_cr.reshape(rc, nc2, cc, nc2) != 0).any(axis=(1, 3)))
        qs = self.qp2[0]
        if self.wpp:
            pos = jnp.where(cbf, jnp.arange(cc)[None, :], -1)
            last = jax.lax.cummax(pos, axis=1)
            return jnp.where(last >= 0,
                             jnp.take_along_axis(
                                 self.qpmap_y, jnp.maximum(last, 0),
                                 axis=1), qs).astype(jnp.int32)
        flat_cbf = cbf.reshape(-1)
        pos = jnp.where(flat_cbf, jnp.arange(rc * cc), -1)
        last = jax.lax.cummax(pos)
        fq = jnp.where(last >= 0,
                       self.qpmap_y.reshape(-1)[jnp.maximum(last, 0)], qs)
        return fq.reshape(rc, cc).astype(jnp.int32)

    def _edge_maps(self, size_map8):
        """Deblocking BS=2 maps on the TU grid from the partition. A 64
        CU's internal 32-TU edges are TU boundaries (filtered like
        split CUs), so the 64 entries reduce to 32; an NxN cell's
        internal 4x4 TU edges are off the 8-sample deblocking grid
        (spec 8.7.2), so code 4 behaves as 8."""
        h, w = self.h, self.w
        k = jnp.clip(size_map8, 8, 32) >> 3
        c = jnp.arange(self.c8)[None, :]
        r = jnp.arange(self.r8)[:, None]
        ver8 = ((c & (k - 1)) == 0) & (c > 0)   # [R8, C8]
        hor8 = ((r & (k - 1)) == 0) & (r > 0)
        bs_ver = jnp.repeat(ver8, 2, axis=0).astype(jnp.int32) * 2
        bs_hor = jnp.repeat(hor8, 2, axis=1).astype(jnp.int32) * 2
        return bs_ver, bs_hor  # [H/4, W/8], [H/8, W/4]

    def _full_impl(self, src_y_u8, src_cb_u8, src_cr_u8):
        src_y = src_y_u8.astype(jnp.int32)
        src_cb = src_cb_u8.astype(jnp.int32)
        src_cr = src_cr_u8.astype(jnp.int32)
        lam = self.lam2[0]
        size_map8, mode_map8, mode_map4 = self._partition(
            src_y, src_cb, src_cr, lam)
        state = self._recon_md(src_y, src_cb, src_cr, size_map8,
                               mode_map8, mode_map4=mode_map4)
        luma, chroma, _, ts_maps = state
        h, w = self.h, self.w
        ry = luma[0, 1:1 + h, 1:1 + w]
        rcb = chroma[0, 1:1 + h // 2, 1:1 + w // 2]
        rcr = chroma[1, 1:1 + h // 2, 1:1 + w // 2]
        lvl_y = luma[1, 1:1 + h, 1:1 + w]
        lvl_cb = chroma[2, 1:1 + h // 2, 1:1 + w // 2]
        lvl_cr = chroma[3, 1:1 + h // 2, 1:1 + w // 2]
        fq = None
        if self.delta_qp:
            fq = self._final_qp(lvl_y, lvl_cb, lvl_cr)
        if self.deblock:
            from ..ops.deblock_jax import deblock_frame_jax
            bs_ver, bs_hor = self._edge_maps(size_map8)
            if self.delta_qp:
                qp4 = jnp.repeat(jnp.repeat(fq, self.CTB // 4, 0),
                                 self.CTB // 4, 1)
                ry, rcb, rcr = deblock_frame_jax(
                    ry, rcb, rcr, bs_ver, bs_hor, self.qp2[0],
                    self.qp2[1], self.qp2[1], self.deblock_beta,
                    self.deblock_tc, bit_depth=self.bd, qp4=qp4)
            else:
                ry, rcb, rcr = deblock_frame_jax(
                    ry, rcb, rcr, bs_ver, bs_hor, self.qp2[0],
                    self.qp2[1], self.qp2[1], self.deblock_beta,
                    self.deblock_tc, bit_depth=self.bd)
        sao_out = {}
        if self.sao:
            from ..ops.sao_jax import sao_chroma, sao_luma
            lamf = self.lam2[0]
            ab = self.sao in ("full", "band")
            ae = self.sao in ("full", "edge")
            ry, py = sao_luma(src_y, ry, self.CTB, lamf, ab, ae,
                              bit_depth=self.bd)
            rcb, rcr, pc = sao_chroma(src_cb, src_cr, rcb, rcr,
                                      self.CTB // 2, lamf, ab, ae,
                                      bit_depth=self.bd)
            for kk, v in py.items():
                sao_out["sao_y_" + kk] = v.astype(jnp.int8)
            for kk, v in pc.items():
                sao_out["sao_c_" + kk] = v.astype(jnp.int8)

        def cksum(plane, mask):
            p32 = plane.astype(jnp.uint32)
            tot = jnp.sum((p32 & 0xFF) ^ mask, dtype=jnp.uint32)
            if self.bd > 8:
                tot = tot + jnp.sum((p32 >> 8) ^ mask, dtype=jnp.uint32)
            return tot

        def sse(a, b):
            d = a - b
            return jnp.sum(d * d, dtype=jnp.int64)

        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16
        out = {
            "rec_y": ry.astype(pix_t),
            "rec_cb": rcb.astype(pix_t),
            "rec_cr": rcr.astype(pix_t),
            "size_map8": size_map8.astype(jnp.int8),
            "mode_map8": mode_map8.astype(jnp.int8),
            "mode_map4": mode_map4.astype(jnp.int8),
            "levels16_y": lvl_y.astype(jnp.int16),
            "levels16_cb": lvl_cb.astype(jnp.int16),
            "levels16_cr": lvl_cr.astype(jnp.int16),
            "hash": jnp.stack([cksum(ry, self.hash_mask_y),
                               cksum(rcb, self.hash_mask_c),
                               cksum(rcr, self.hash_mask_c)]),
            "sse": jnp.stack([sse(ry, src_y), sse(rcb, src_cb),
                              sse(rcr, src_cr)]),
            "n_waves": self._last_waves,
            **sao_out,
        }
        if fq is not None:
            out["qp_ctb"] = fq.astype(jnp.int8)
        if ts_maps is not None:
            # transform_skip decisions per 8-cell: [r8, c8, 6] =
            # 4 NxN luma sub-TU bits (z order) + cb + cr
            out["ts8"] = ts_maps.astype(jnp.int8)
        ovf = jnp.bool_(False)
        for name, lv in (("y", lvl_y), ("cb", lvl_cb), ("cr", lvl_cr)):
            mask_u8, vals, o = self._sparse_pack(lv)
            out["lmask_" + name] = mask_u8
            out["lvals_" + name] = vals
            ovf = ovf | o
        out["lvl_ovf"] = ovf
        return self._pack_host_outputs(out)

    # everything the host needs per frame rides ONE uint8 buffer: the
    # tunnel D2H path costs ~30 ms latency per array (profiled: 18
    # arrays = 531 ms/frame), so per-array pulls dominate the host side
    HOST_PACK_EXCLUDE = ("rec_y", "rec_cb", "rec_cr", "levels16_y",
                         "levels16_cb", "levels16_cr")

    def _pack_host_outputs(self, out):
        if not getattr(self, "_host_pack", True):
            return out
        spec = []
        chunks = []
        off = 0
        for k in sorted(out.keys()):
            if k in self.HOST_PACK_EXCLUDE:
                continue
            v = out.pop(k)
            if v.ndim == 0:
                v = v.reshape(1)
            if v.dtype == jnp.bool_:
                v = v.astype(jnp.uint8)
            shape = v.shape
            dt = np.dtype(v.dtype.name)
            if dt.itemsize == 1:
                b = jax.lax.bitcast_convert_type(
                    v.reshape(-1), jnp.uint8).reshape(-1)
            else:
                b = jax.lax.bitcast_convert_type(
                    v.reshape(-1), jnp.uint8).reshape(-1)
            spec.append((k, dt.str, shape, off, int(b.shape[0])))
            chunks.append(b)
            off += int(b.shape[0])
        # one pipeline carries several programs (intra + inter) with
        # different output sets; key the layout by total length
        if not hasattr(self, "_host_specs"):
            self._host_specs = {}
        self._host_specs[off] = spec
        out["hostbuf"] = jnp.concatenate(chunks)
        return out

    def _unpack_host(self, out) -> dict:
        buf = np.asarray(out["hostbuf"])
        res = {}
        for (k, dt, shape, off, nb) in self._host_specs[buf.shape[0]]:
            res[k] = np.frombuffer(buf[off:off + nb].tobytes(),
                                   dt).reshape(shape)
        return res

    # ------------------------------------------------------------------
    # host interface
    # ------------------------------------------------------------------

    def submit(self, src_y, src_cb, src_cr, qp: int | None = None,
               consts_extra: dict | None = None, qp_map=None):
        consts = self._consts_for(qp)
        if qp_map is not None:
            assert self.delta_qp
            qm = np.asarray(qp_map, np.int32)
            consts = dict(consts)
            consts["qpmap_y"] = jnp.asarray(qm)
            consts["qpmap_c"] = jnp.asarray(
                np.vectorize(chroma_qp)(qm).astype(np.int32))
            consts["lammap"] = jnp.asarray(
                0.57 * 2.0 ** ((qm - 12) / 3.0), jnp.float32)
        if consts_extra:
            consts = {**consts, **consts_extra}
        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16
        out = self._full(consts,
                         jnp.asarray(src_y, pix_t),
                         jnp.asarray(src_cb, pix_t),
                         jnp.asarray(src_cr, pix_t))
        for k, v in out.items():
            if k == "hostbuf" or k.startswith(("lmask_", "lvals_")):
                try:
                    v.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
        return out

    def submit_many(self, ys, cbs, crs, qp: int | None = None) -> list:
        """Batched dispatch of B independent frames through one vmapped
        device program; returns per-frame output dicts (lazy slices)."""
        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16
        out = self._full_b(self._consts_for(qp),
                           jnp.asarray(np.stack(ys), pix_t),
                           jnp.asarray(np.stack(cbs), pix_t),
                           jnp.asarray(np.stack(crs), pix_t))
        per = [{k: v[i] for k, v in out.items()} for i in range(len(ys))]
        for p in per:
            for k, v in p.items():
                if k == "hostbuf":
                    try:
                        v.copy_to_host_async()
                    except (AttributeError, RuntimeError):
                        pass
        return per

    def materialize(self, out):
        if "hostbuf" in out:
            res = self._unpack_host(out)
            res["rec_y"] = out["rec_y"]
            res["rec_cb"] = out["rec_cb"]
            res["rec_cr"] = out["rec_cr"]
        else:
            res = {k: (np.asarray(v)
                       if k in ("hash", "sse", "size_map8", "mode_map8",
                                "mode_map4", "qp_ctb")
                       or k.startswith("sao_") else v)
                   for k, v in out.items()}
        if bool(np.asarray(res["lvl_ovf"])):
            for p in ("y", "cb", "cr"):
                res["levels_" + p] = np.asarray(out["levels16_" + p])
        else:
            from .intra_pipeline import _sparse_unpack
            for p in ("y", "cb", "cr"):
                res["levels_" + p] = _sparse_unpack(
                    np.asarray(res["lmask_" + p]),
                    np.asarray(res["lvals_" + p]),
                    out["levels16_" + p].shape)
        for p in ("y", "cb", "cr"):
            res.pop("levels16_" + p, None)
            res.pop("lmask_" + p, None)
            res.pop("lvals_" + p, None)
        res.pop("lvl_ovf", None)
        return res
