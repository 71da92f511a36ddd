"""Quadtree (multi-depth) inter pipeline: P slices on CTB 64.

Extends the multi-depth intra pipeline with motion-compensated leaves at
every CU size (8/16/32):

1. `hierarchical ME`: one exhaustive coarse sweep at 1/4 resolution over
   a +-16 coarse window (= +-64 full-res pels, kvazaar's effective TZ/
   hexbs range, src/search_inter.c:487-973) produces a dense 16x16-block
   motion field per reference; each aligned block of every size refines
   the field's candidates +-3 integer pels, then half- and quarter-pel
   (the search_frac analog, src/search_inter.c:974-1160) — all batched
   matmul/gather sweeps, no sequential pattern steps.
2. `decision`: per size, inter cost (exact T/Q distortion + rate bins +
   MVD bits) competes with the intra leaf cost; the same bottom-up DP as
   the intra partition then picks the quadtree.
3. `reconstruction`: inter leaves have no intra-neighbour dependency, so
   the whole inter set reconstructs in ONE batch before the wavefront;
   the self-scheduled wavefront then runs over intra leaves only, with
   inter cells pre-marked written.
4. deblocking boundary strengths (spec 8.7.2.4: intra -> 2; cbf / ref /
   |mv|>=1pel differences -> 1) are derived in-graph from the decision
   maps; SAO runs on the filtered frame as in the intra path.

Reference parity: kvazaar searches inter at every CU size with AMVP/
merge (src/search.c:646-758, src/search_inter.c:2202); here sizes are
searched as three dense batched sweeps and merge/skip are resolved at
write time from the final MV field (engine/md_inter_writer.py).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.mc import CHROMA_FILTERS, LUMA_FILTERS
from .intra_md import MdIntraPipeline

NO_REF_POC = -(1 << 30)


class MdInterPipeline(MdIntraPipeline):
    """P-slice quadtree encoder compute path for one frame size."""

    COARSE = 4          # downsample factor of the wide sweep
    COARSE_RANGE = 24   # coarse integer range (=> +-96 full-res)
    REFINE = 3          # full-res integer refine window around the field
    SUBPEL_PAD = 4 + 3      # refine window + 8-tap reach
    INIT_TYPE = 1           # P-slice context init for the DP bit costs
    # inter signalling prices (engine/bit_cost.py inter_dp_costs — the
    # kvz_calc_mvd_cost_cabac / skip-merge pricing analog, ref
    # src/rdo.c:997) appended to the intra dpc consts vector:
    DPC_SKIP = 13            # cu_skip=1 + merge_idx (merge hit, cbf 0)
    DPC_MERGE = 14           # explicit merge with residual
    DPC_AMVP = 15            # AMVP base (excl. ref/mvd/rqt)
    DPC_RQT0, DPC_RQT1 = 16, 17
    DPC_REF0, DPC_REF_STEP = 18, 19
    DPC_MVD_G0_0, DPC_MVD_G0_1 = 20, 21
    DPC_MVD_G1_0, DPC_MVD_G1_1 = 22, 23
    DPC_IDC_UNI, DPC_IDC_BI = 24, 25
    DPC_INTRA_PM = 26        # cu_skip=0 + pred_mode=intra (P/B slices)
    DPC_PART0_0 = 27         # part_mode bin 0 = not-2Nx2N
    DPC_PART1_0, DPC_PART1_1 = 28, 29
    DPC_PART3_0, DPC_PART3_1 = 30, 31
    DPC_PU_EXTRA = 32        # 2nd PU merge_flag=0 + mvp_flag

    def __init__(self, height: int, width: int, qp: int,
                 n_refs: int = 1, b_slices: bool = False,
                 pu_depth_inter: tuple[int, int] = (0, 3),
                 subme: int = 4, bipred: bool = True,
                 smp: bool = False, amp: bool = False, **kw) -> None:
        super().__init__(height, width, qp, **kw)
        self.n_refs = max(1, n_refs)
        # --subme 0..4: fractional refinement depth (half, then quarter;
        # ref src/search_inter.c:974 filter steps); --bipred gates the
        # exact bi-prediction candidate in B slices (cfg.c:1092)
        self.subme = max(0, min(int(subme), 4))
        self.bipred = bool(bipred)
        # --smp/--amp: rectangular PU partitions 2NxN/Nx2N (+ the four
        # asymmetric modes at 32) searched per CU and competed in the DP
        # (ref kvz_search_cu_smp, src/search_inter.c:2311). Off keeps the
        # traced graphs identical to the non-SMP build.
        self.smp = bool(smp)
        self.amp = bool(amp)
        # inter CU sizes from --pu-depth-inter (0=64 .. 3=8); sizes
        # outside the range fall back to the intra candidate
        lo, hi = pu_depth_inter
        self.allow_inter = {64: lo <= 0, 32: lo <= 1 <= hi,
                            16: lo <= 2 <= hi, 8: hi >= 3}
        # merge-aware search: align block MVs with neighbour/zero merge
        # candidates when RD-better (the batched analog of the
        # reference's merge-candidate RD loop, src/search_inter.c
        # kvz_search_cu_inter) — the dominant BD-rate lever on P/B
        # slices (without it nearly every CU pays AMVP+MVD bits)
        self.merge_search = True
        self._full_inter = jax.jit(self._with_consts(self._inter_full_impl))
        self.b_slices = b_slices
        if b_slices:
            # fixed per-list stack depth (pad by repeating) so B frames
            # of any pyramid layer share one compiled program
            self.n_refs_b = min(2, max(1, n_refs))
            self._full_inter_b = jax.jit(
                self._with_consts(self._inter_full_b_impl))

    # ------------------------------------------------------------------
    # size-generic motion compensation (exact qpel / eighth-pel)
    # ------------------------------------------------------------------

    def _mc_luma(self, ypad, mv, y0, x0, n, pad, nh=None):
        """Quarter-pel luma MC: ypad [H+2p, W+2p], per-block qpel mv and
        block origins y0/x0 [L]. Returns [L, nh, n] (nh defaults n;
        rectangular blocks serve the SMP PU shapes)."""
        nh = n if nh is None else nh
        ix = mv[:, 0] >> 2
        iy = mv[:, 1] >> 2
        fx = mv[:, 0] & 3
        fy = mv[:, 1] & 3
        wy = (y0 + iy + pad - 3)[:, None] + jnp.arange(nh + 7)[None, :]
        wx = (x0 + ix + pad - 3)[:, None] + jnp.arange(n + 7)[None, :]
        wy = jnp.clip(wy, 0, ypad.shape[-2] - 1)
        wx = jnp.clip(wx, 0, ypad.shape[-1] - 1)
        win = ypad[wy[:, :, None], wx[:, None, :]]  # [L, nh+7, n+7]
        fmat = jnp.asarray(LUMA_FILTERS)
        cx = jnp.take(fmat, fx, axis=0)
        cy = jnp.take(fmat, fy, axis=0)
        h14 = sum(cx[:, k, None, None] * win[:, :, k:k + n]
                  for k in range(8))
        v = sum(cy[:, k, None, None] * h14[:, k:k + nh, :]
                for k in range(8)) >> 6
        return jnp.clip((v + 32) >> 6, 0, self.maxv)

    def _mc_chroma(self, cpad, mv, cy0, cx0, nc, cpadw):
        """Eighth-pel chroma MC (mv in luma qpel units)."""
        ix = mv[:, 0] >> 3
        iy = mv[:, 1] >> 3
        fx = mv[:, 0] & 7
        fy = mv[:, 1] & 7
        wy = (cy0 + iy + cpadw - 1)[:, None] + jnp.arange(nc + 3)[None, :]
        wx = (cx0 + ix + cpadw - 1)[:, None] + jnp.arange(nc + 3)[None, :]
        wy = jnp.clip(wy, 0, cpad.shape[-2] - 1)
        wx = jnp.clip(wx, 0, cpad.shape[-1] - 1)
        win = cpad[wy[:, :, None], wx[:, None, :]]
        fmat = jnp.asarray(CHROMA_FILTERS)
        cxf = jnp.take(fmat, fx, axis=0)
        cyf = jnp.take(fmat, fy, axis=0)
        h14 = sum(cxf[:, k, None, None] * win[:, :, k:k + nc]
                  for k in range(4))
        v = sum(cyf[:, k, None, None] * h14[:, k:k + nc, :]
                for k in range(4)) >> 6
        return jnp.clip((v + 32) >> 6, 0, self.maxv)

    # ------------------------------------------------------------------
    # hierarchical motion estimation
    # ------------------------------------------------------------------

    def _coarse_field(self, src_y, ref_y):
        """Dense 16x16-block integer motion field via an exhaustive
        sweep at 1/4 resolution: returns mv16 [r16, c16, 2] full-res
        integer pels in [-64, 64].

        TPU form: shift-and-boxsum — each displacement is a STATIC
        slice of the padded reference plane (no gathers; the original
        per-block window gather ran ~100M elem/s on TPU and dominated
        the whole P-frame search). Tie-breaking matches the original
        (first minimum in (dy, dx) scan order)."""
        C, R = self.COARSE, self.COARSE_RANGE
        h, w = self.h // C, self.w // C
        sc = src_y.reshape(h, C, w, C).sum(axis=(1, 3))
        rc = ref_y.reshape(h, C, w, C).sum(axis=(1, 3))
        n = 16 // C                       # coarse block = 4x4
        rows, cols = h // n, w // n
        rpad = jnp.pad(rc, R, mode="edge")
        ndx = 2 * R + 1

        def row_scan(carry, dy):
            best_sad, best_code = carry
            strip = jax.lax.dynamic_slice_in_dim(rpad, dy, h, axis=0)
            # all dx displacements of this dy as one stacked tensor
            cands = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(strip, dx, w, axis=1)
                 for dx in range(ndx)])              # [ndx, h, w]
            d = jnp.abs(cands - sc[None])
            sads = d.reshape(ndx, rows, n, cols, n) \
                .sum(axis=(2, 4))                    # [ndx, rows, cols]
            dx_best = jnp.argmin(sads, axis=0).astype(jnp.int32)
            sad_best = jnp.min(sads, axis=0)
            better = sad_best < best_sad
            code = dy * 64 + dx_best
            best_code = jnp.where(better, code, best_code)
            best_sad = jnp.where(better, sad_best, best_sad)
            return (best_sad, best_code), None

        init = (jnp.full((rows, cols), 1 << 30, jnp.int32),
                jnp.zeros((rows, cols), jnp.int32))
        (_, best_code), _ = jax.lax.scan(row_scan, init,
                                         jnp.arange(ndx))
        mv = jnp.stack([(best_code % 64) - R, (best_code // 64) - R],
                       axis=-1)
        return mv * C

    def _field_for(self, mv16, n):
        """Candidate integer MV per aligned n-block from the 16-field."""
        r16, c16 = mv16.shape[:2]
        if n == 16:
            return mv16.reshape(-1, 2)
        if n == 8:
            return jnp.repeat(jnp.repeat(mv16, 2, 0), 2, 1).reshape(-1, 2)
        # n >= 32: four spread samples of the covered field as candidates
        s2 = n // 16
        h = s2 // 2
        cands = jnp.stack(
            [mv16[::s2, ::s2], mv16[::s2, h::s2],
             mv16[h::s2, ::s2], mv16[h::s2, h::s2]],
            axis=2).reshape(-1, 4, 2)
        return cands

    def _rd_zero_tu(self, resi, levels, r2, lam, n, is_luma,
                    depth1=False):
        """RD choice between coding the quantized residual and zeroing
        the whole TU (cbf = 0). The reference makes this comparison in
        its CU cost accounting (src/search.c:425
        cu_rd_cost_tr_split_accurate competes the zero-cbf path; inter
        search also early-skips, search_inter.c:436) — without it, P/B
        frames spend bits coding the reference picture's quantization
        noise. Returns (levels, recon_residual) with losing TUs zeroed."""
        dist_c = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        dist_z = (resi.astype(jnp.float32) ** 2).sum(axis=(1, 2))
        if is_luma:
            rate = self._tu_rate_y(levels, n, depth1=depth1)
            zr = self.dpc[self.DPC_CBF_Y0_D1 if depth1
                          else self.DPC_CBF_Y0]
        else:
            rate = self._tu_rate_c(levels, n, depth1=depth1)
            zr = self.dpc[self.DPC_CBF_C0_D1 if depth1
                          else self.DPC_CBF_C0]
        drop = (dist_z + lam * zr <= dist_c + lam * rate)[:, None, None]
        return jnp.where(drop, 0, levels), jnp.where(drop, 0, r2)

    def _tq_quad(self, resi, qp, is_luma, lam=None):
        """T/Q a [B, n, n] residual as four n/2 TUs: the forced
        transform split of 64-luma / 32-chroma CBs (spec 7.4.9.8:
        log2 > MaxTbLog2) and of SMP CUs (spec 7.3.8.8 interSplitFlag
        with max_transform_hierarchy_depth_inter == 0). With lam set,
        each sub-TU gets the RD zero-cbf competition (_rd_zero_tu).
        Returns (levels [B, n, n], recon residual [B, n, n])."""
        B, n, _ = resi.shape
        hn = n // 2
        t = {32: self.t32, 16: self.t16, 8: self.t8, 4: self.t4}[hn]
        q = resi.reshape(B, 2, hn, 2, hn)
        q = jnp.moveaxis(q, 2, 3).reshape(B * 4, hn, hn)
        lev, r2 = self._transform_quant(
            q, t, qp, hn, mats=self._mats_for(hn, is_luma),
            is_luma=is_luma)
        if lam is not None:
            lam4 = (jnp.repeat(lam, 4) if jnp.ndim(lam) else lam)
            lev, r2 = self._rd_zero_tu(q, lev, r2, lam4, hn, is_luma,
                                       depth1=True)
        cbf = jnp.any(lev != 0, axis=(1, 2))
        r2 = jnp.where(cbf[:, None, None], r2, 0)
        lev = jnp.where(cbf[:, None, None], lev, 0)

        def back(x):
            x = x.reshape(B, 2, 2, hn, hn)
            return jnp.moveaxis(x, 2, 3).reshape(B, n, n)
        return back(lev), back(r2)

    def _blocks_of(self, plane, n):
        rows, cols = plane.shape[0] // n, plane.shape[1] // n
        return jnp.moveaxis(plane.reshape(rows, n, cols, n), 1, 2) \
            .reshape(rows * cols, n, n), rows, cols

    def _refine_int(self, blocks, rpad, y0, x0, cand_mvs, pad,
                    lam64=None):
        """+-REFINE integer sweep around each candidate; returns best
        (mv [L,2], sad [L]). cand_mvs: [L, K, 2]; blocks may be
        rectangular [L, nh, nw] (SMP PUs). With lam64 the SADs carry
        the MV-cost prior (ops/pallas_me.py PRIOR_INT — keeps motion
        fields coherent on flat-cost content; identical integer math
        to the TPU kernel)."""
        from ..ops.pallas_me import prior_int_table
        pi_tab = prior_int_table() if lam64 is not None else None
        W = self.REFINE
        nh, n = blocks.shape[-2], blocks.shape[-1]
        best_sad = jnp.full((blocks.shape[0],), 1 << 30, jnp.int32)
        best_mv = jnp.zeros((blocks.shape[0], 2), jnp.int32)
        for k in range(cand_mvs.shape[1]):
            mvk = jnp.clip(cand_mvs[:, k], -96, 96)
            iy = (y0 + mvk[:, 1] + pad - W)[:, None] + \
                jnp.arange(nh + 2 * W)[None, :]
            ix = (x0 + mvk[:, 0] + pad - W)[:, None] + \
                jnp.arange(n + 2 * W)[None, :]
            iy = jnp.clip(iy, 0, rpad.shape[0] - 1)
            ix = jnp.clip(ix, 0, rpad.shape[1] - 1)
            win = rpad[iy[:, :, None], ix[:, None, :]]
            for dy in range(2 * W + 1):
                strip = jax.lax.dynamic_slice_in_dim(win, dy, nh, axis=1)
                for dx in range(2 * W + 1):
                    cand = jax.lax.dynamic_slice_in_dim(strip, dx, n,
                                                        axis=2)
                    sad = jnp.abs(cand - blocks).sum(axis=(1, 2)) \
                        .astype(jnp.int32)
                    if pi_tab is not None:
                        sad = sad + ((lam64 * pi_tab[dy * 7 + dx]) >> 8)
                    mvc = mvk + jnp.asarray([dx - W, dy - W], jnp.int32)
                    better = sad < best_sad
                    best_sad = jnp.where(better, sad, best_sad)
                    best_mv = jnp.where(better[:, None], mvc, best_mv)
        return best_mv, best_sad

    def _refine_subpel(self, blocks, ypad, y0, x0, mv_int, pad):
        """Half then quarter pel refinement by SATD around mv_int
        (--subme gates the steps: 0 = none, 1-2 = half, 3-4 = quarter)."""
        nh, nw = blocks.shape[-2], blocks.shape[-1]
        mv = jnp.clip(mv_int, -96, 96) * 4
        best = self._satd_tiles(blocks - self._mc_luma(
            ypad, mv, y0, x0, nw, pad, nh=nh))
        steps = ((2, 1) if self.subme >= 3
                 else (2,) if self.subme >= 1 else ())
        for step in steps:
            for (dx, dy) in ((-1, 0), (1, 0), (0, -1), (0, 1),
                             (-1, -1), (1, -1), (-1, 1), (1, 1)):
                cand = mv + jnp.asarray([dx * step, dy * step], jnp.int32)
                cost = self._satd_tiles(blocks - self._mc_luma(
                    ypad, cand, y0, x0, nw, pad, nh=nh))
                better = cost < best
                mv = jnp.where(better[:, None], cand, mv)
                best = jnp.where(better, cost, best)
        return mv, best

    def _dpc_vec(self, qp: int) -> list[float]:
        from ..engine.bit_cost import inter_dp_costs
        c = inter_dp_costs(qp, self.INIT_TYPE)
        return super()._dpc_vec(qp) + [
            c["skip"], c["merge"], c["amvp"], c["rqt0"], c["rqt1"],
            c["ref0"], c["ref_step"], c["mvd_g0_0"], c["mvd_g0_1"],
            c["mvd_g1_0"], c["mvd_g1_1"], c["idc_uni"], c["idc_bi"],
            c["intra_pm"], c["part0_0"], c["part1_0"], c["part1_1"],
            c["part3_0"], c["part3_1"], c["pu_extra"]]

    def _mv_bins(self, mvd):
        """Fractional-bit cost of an MVD at context init states: per
        component abs_mvd_greater0/1 ctx bins + 1st-order exp-golomb
        remainder + EP sign (the kvz_calc_mvd_cost_cabac analog,
        ref src/rdo.c:997 + encode_coding_tree.c:1062)."""
        a = jnp.abs(mvd).astype(jnp.float32)
        g0_0 = self.dpc[self.DPC_MVD_G0_0]
        g0_1 = self.dpc[self.DPC_MVD_G0_1]
        g1_0 = self.dpc[self.DPC_MVD_G1_0]
        g1_1 = self.dpc[self.DPC_MVD_G1_1]
        # EG1 length of (a-2): 2*floor(log2((a-2)/2+1)) + 2
        eg1 = 2.0 * jnp.floor(jnp.log2(jnp.maximum(a, 2.0) / 2.0)) + 2.0
        per = jnp.where(
            a == 0, g0_0,
            g0_1 + 1.0 + jnp.where(a == 1, g1_0, g1_1 + eg1))
        return per.sum(axis=-1)

    def _ref_cost(self, k, n_list=None):
        """ref_idx signalling bits for static index k (one per ref in
        the stack; 0 when the list has a single entry)."""
        n_list = self.n_refs if n_list is None else n_list
        if n_list <= 1:
            return jnp.float32(0.0)
        if k == 0:
            return self.dpc[self.DPC_REF0]
        return self.dpc[self.DPC_REF_STEP] + jnp.float32(max(0, k - 1))

    def _merge_proxy(self, mv_q, ref, rows, cols, extra=None):
        """Write-time merge availability proxy: a block merges when its
        motion equals its left or top same-size neighbour's choice (the
        writer resolves real spatial/TMVP candidates at encode time —
        engine/md_inter_writer.py; this batched proxy prices the common
        case). extra: additional per-block fields that must also match
        (B: second list's mv/ref + direction)."""
        fields = [mv_q.reshape(rows, cols, 2), ref.reshape(rows, cols)]
        for e in extra or ():
            fields.append(e.reshape(rows, cols, *e.shape[1:]))

        def eq_shift(f, axis):
            if axis == 1:
                a, b = f[:, 1:], f[:, :-1]
                pad = ((0, 0), (1, 0)) + ((0, 0),) * (f.ndim - 2)
            else:
                a, b = f[1:, :], f[:-1, :]
                pad = ((1, 0), (0, 0)) + ((0, 0),) * (f.ndim - 2)
            eq = a == b
            while eq.ndim > 2:
                eq = eq.all(axis=-1)
            return jnp.pad(eq, pad[:2], constant_values=False)

        left_eq = jnp.ones((rows, cols), bool)
        top_eq = jnp.ones((rows, cols), bool)
        for f in fields:
            le = eq_shift(f, 1)
            te = eq_shift(f, 0)
            left_eq = left_eq & le
            top_eq = top_eq & te
        return (left_eq | top_eq).reshape(-1)

    # ------------------------------------------------------------------
    # per-size inter candidate + cost
    # ------------------------------------------------------------------

    def _best_uni_leaf(self, blocks, refs_y, fields, y0, x0, n, lam,
                       cands_list=None):
        """SATD-best (mv qpel [B,2], ref [B], satd [B], mv_bits [B])
        across one reference stack for every aligned n-block: coarse-
        field candidate + zero MV -> integer refine -> subpel refine,
        priced with MVD bins + ref-idx bins (src/search_inter.c:1237
        per-ref loop, batched). cands_list overrides the per-ref integer
        candidate sets ([B, K, 2] each — rectangular SMP PUs pass their
        own field samples)."""
        nb = blocks.shape[0]
        P = self.SUBPEL_PAD
        lam_satd = jnp.sqrt(lam).astype(jnp.float32)
        best = None
        for k in range(refs_y.shape[0]):
            mv16 = fields[k]
            if cands_list is not None:
                cands = cands_list[k]
            elif n >= 32:
                cands = jnp.concatenate(
                    [self._field_for(mv16, n),
                     jnp.zeros((nb, 1, 2), jnp.int32)], axis=1)
            else:
                cands = jnp.stack(
                    [self._field_for(mv16, n),
                     jnp.zeros((nb, 2), jnp.int32)], axis=1)
            rpad = jnp.pad(refs_y[k], self.REFINE, mode="edge")
            mv_int, _ = self._refine_int(blocks, rpad, y0, x0, cands,
                                         self.REFINE)
            ypad = jnp.pad(refs_y[k], P, mode="edge")
            mv_q, satd = self._refine_subpel(blocks, ypad, y0, x0,
                                             mv_int, P)
            mvd = mv_q - cands[:, 0] * 4  # field MV as AMVP proxy
            cost = satd.astype(jnp.float32) + lam_satd * (
                self._mv_bins(mvd)
                + self._ref_cost(k, n_list=refs_y.shape[0]))
            if best is None:
                best = (cost, mv_q, jnp.full((nb,), k, jnp.int32),
                        self._mv_bins(mvd), satd)
            else:
                bc, bmv, bref, bbits, bsatd = best
                better = cost < bc
                best = (jnp.where(better, cost, bc),
                        jnp.where(better[:, None], mv_q, bmv),
                        jnp.where(better, k, bref),
                        jnp.where(better, self._mv_bins(mvd), bbits),
                        jnp.where(better, satd, bsatd))
        return best[1], best[2], best[4], best[3]

    def _me_xla_one(self, src_y, ref_y, cands, n, lam64):
        """XLA twin of the pallas refine kernel for one (size, ref):
        same algorithm (int +-3 SAD refine with (cand, dy, dx) strict-<
        tie-break, then SATD at all 49 qpel deltas in (qy, qx) order),
        bit-identical results — the non-TPU backends (test suite,
        multichip dryrun) run this; pallas interpret mode is far too
        slow for per-block grids."""
        blocks, rows, cols = self._blocks_of(src_y, n)
        nb = rows * cols
        bid = jnp.arange(nb)
        y0 = (bid // cols) * n
        x0 = (bid % cols) * n
        rpad = jnp.pad(ref_y, self.REFINE, mode="edge")
        mv_int, _ = self._refine_int(blocks, rpad, y0, x0, cands,
                                     self.REFINE, lam64=lam64)
        # one window gather per block (rows/cols [base-4, base+n+4)),
        # then every qpel delta is static slices + a fixed-phase filter
        # — the same evaluation structure as the kernel
        P = self.SUBPEL_PAD
        ypad = jnp.pad(ref_y, P, mode="edge")
        wy = (y0 + mv_int[:, 1] + P - 4)[:, None] + \
            jnp.arange(n + 8)[None, :]
        wx = (x0 + mv_int[:, 0] + P - 4)[:, None] + \
            jnp.arange(n + 8)[None, :]
        wy = jnp.clip(wy, 0, ypad.shape[0] - 1)
        wx = jnp.clip(wx, 0, ypad.shape[1] - 1)
        win = ypad[wy[:, :, None], wx[:, None, :]]   # [L, n+8, n+8]
        from ..ops.mc import LUMA_FILTERS as LF
        # all 49 qpel deltas as ONE scanned body (the unrolled form
        # compiles ~50x slower); phase-0 rides the generic 8-tap path
        # (LUMA_FILTERS[0] = [0,0,0,64,...] makes it identical)
        from ..ops.pallas_me import prior_qpel_table
        deltas = [(qy, qx) for qy in range(-3, 4) for qx in range(-3, 4)]
        pqv = jnp.asarray(prior_qpel_table(), jnp.int32)
        r0v = jnp.asarray([1 + (qy >> 2) for qy, _ in deltas])
        c0v = jnp.asarray([1 + (qx >> 2) for _, qx in deltas])
        cyv = jnp.asarray([LF[qy & 3] for qy, _ in deltas], jnp.int32)
        cxv = jnp.asarray([LF[qx & 3] for _, qx in deltas], jnp.int32)
        dmv = jnp.asarray([(qx, qy) for qy, qx in deltas], jnp.int32)
        nb_l = win.shape[0]

        def body(carry, t):
            best_s, best_raw, best_mv, best_p = carry
            r0, c0, cy, cx, dq, pq = t
            h14 = sum(cx[k] * jax.lax.dynamic_slice(
                win, (0, r0, c0 + k), (nb_l, n + 7, n))
                for k in range(8))
            v = sum(cy[k] * jax.lax.dynamic_slice(
                h14, (0, k, 0), (nb_l, n, n)) for k in range(8)) >> 6
            p = jnp.clip((v + 32) >> 6, 0, self.maxv)
            raw = self._satd_tiles(blocks - p)
            s = raw + ((lam64 * pq) >> 8)
            mv = mv_int * 4 + dq[None, :]
            take = s < best_s
            carry = (jnp.where(take, s, best_s),
                     jnp.where(take, raw, best_raw),
                     jnp.where(take[:, None], mv, best_mv),
                     jnp.where(take[:, None, None], p, best_p))
            return carry, None

        init = (jnp.full((nb_l,), 1 << 30, jnp.int32),
                jnp.zeros((nb_l,), jnp.int32),
                jnp.zeros((nb_l, 2), jnp.int32),
                jnp.zeros((nb_l, n, n), jnp.int32))
        (_, satd, mv_q, pred), _ = jax.lax.scan(
            body, init, (r0v, c0v, cyv, cxv, dmv, pqv))
        return mv_q, satd, pred

    def _kernel_planes(self, refs_y):
        """Padded kernel planes per ref (None on non-TPU backends —
        the XLA twins read refs_y directly)."""
        if jax.default_backend() != "tpu":
            return None
        from ..ops.pallas_me import pad_plane
        return [pad_plane(refs_y[k]) for k in range(refs_y.shape[0])]

    def _lam64(self):
        """Integer sqrt-lambda scale for the refine MV-cost prior."""
        return jnp.floor(jnp.sqrt(self.lam2[0]) * 64.0 + 0.5) \
            .astype(jnp.int32)

    def _me_kernel_sizes(self, src_y, refs_y, fields, planes=None):
        """Per-size, per-ref ME via the pallas refine kernels
        (ops/pallas_me.py): returns {n: [(mv_q [L,2], satd [L],
        pred [L,n,n]) per ref]}. Candidate sets match the XLA path it
        replaces (_field_for): 16/8 = own/parent field + zero, 32/64 =
        four spread field samples + zero."""
        from ..ops.pallas_me import me_refine, pack_info
        if planes is None:
            return self._me_sizes_xla(src_y, refs_y, fields)
        lam64 = self._lam64().reshape(1)
        out = {8: [], 16: [], 32: [], 64: []}
        for k in range(refs_y.shape[0]):
            plane = planes[k]
            f16 = fields[k]
            for n in (16, 32, 64):
                blocks, rows, cols = self._blocks_of(src_y, n)
                bid = jnp.arange(rows * cols)
                y0 = (bid // cols) * n
                x0 = (bid % cols) * n
                if n == 16:
                    cands = jnp.stack(
                        [f16.reshape(-1, 2),
                         jnp.zeros((rows * cols, 2), jnp.int32)], axis=1)
                else:
                    cands = jnp.concatenate(
                        [self._field_for(f16, n),
                         jnp.zeros((rows * cols, 1, 2), jnp.int32)],
                        axis=1)
                info = pack_info(y0[:, None], x0[:, None],
                                 cands[..., 1], cands[..., 0])
                res = me_refine(plane, blocks, info, lam64, n=n,
                                cols=cols, children=(n == 16),
                                maxv=self.maxv)
                par, pred = res[0], res[1]
                out[n].append((par[:, 0:2], par[:, 2], pred,
                               cands[:, 0] if n == 16
                               else cands[:, 0, :]))
                if n == 16:
                    ch, chpred = res[2], res[3]
                    # children TL,TR,BL,BR per 16-block -> raster 8-grid
                    r8, c8 = rows * 2, cols * 2
                    mv8 = ch[:, :, 0:2].reshape(rows, cols, 2, 2, 2)
                    mv8 = jnp.moveaxis(mv8, 2, 1).reshape(r8 * c8, 2)
                    satd8 = ch[:, :, 2].reshape(rows, cols, 2, 2)
                    satd8 = jnp.moveaxis(satd8, 2, 1).reshape(r8 * c8)
                    p8 = chpred.reshape(rows, cols, 2, 8, 2, 8)
                    p8 = jnp.moveaxis(p8, 2, 1)       # rows,2,cols,8,2,8
                    p8 = jnp.moveaxis(p8, 4, 3)       # rows,2,cols,2,8,8
                    p8 = p8.reshape(r8 * c8, 8, 8)
                    c8f = jnp.repeat(jnp.repeat(
                        f16, 2, axis=0), 2, axis=1).reshape(-1, 2)
                    out[8].append((mv8, satd8, p8, c8f))
        return out

    def _me_sizes_xla(self, src_y, refs_y, fields):
        """Non-TPU twin of _me_kernel_sizes (same candidates, same
        algorithm via _me_xla_one)."""
        lam64 = self._lam64()
        out = {8: [], 16: [], 32: [], 64: []}
        for k in range(refs_y.shape[0]):
            f16 = fields[k]
            for n in (8, 16, 32, 64):
                rows, cols = self.h // n, self.w // n
                if n == 8:
                    c0 = jnp.repeat(jnp.repeat(f16, 2, axis=0), 2,
                                    axis=1).reshape(-1, 2)
                    cands = jnp.stack(
                        [c0, jnp.zeros_like(c0)], axis=1)
                elif n == 16:
                    c0 = f16.reshape(-1, 2)
                    cands = jnp.stack(
                        [c0, jnp.zeros_like(c0)], axis=1)
                else:
                    cands = jnp.concatenate(
                        [self._field_for(f16, n),
                         jnp.zeros((rows * cols, 1, 2), jnp.int32)],
                        axis=1)
                    c0 = cands[:, 0, :]
                mv_q, satd, pred = self._me_xla_one(src_y, refs_y[k],
                                                    cands, n, lam64)
                out[n].append((mv_q, satd, pred, c0))
        return out

    def _inter_leaf(self, src_y, src_cb, src_cr, refs_y, refs_cb,
                    refs_cr, fields, n, t, tc, lam, me=None,
                    planes=None):
        """Best inter candidate for every aligned n-block across the
        reference stack. Returns (mv qpel [B,2], ref [B], cost [B],
        pred_y, pred_cb, pred_cr). With `me` (the per-ref pallas kernel
        results for this size) the luma search+MC is precomputed;
        otherwise the XLA search path runs (SMP, non-kernel callers)."""
        qp_y, qp_c, lam_n = self._qp_lam_for(n)
        if self.delta_qp:
            lam = lam_n
        blocks, rows, cols = self._blocks_of(src_y, n)
        nb = rows * cols
        bid = jnp.arange(nb)
        y0 = (bid // cols) * n
        x0 = (bid % cols) * n
        P = self.SUBPEL_PAD
        use_merge = None
        merge_delta = jnp.float32(0.0)
        if me is not None:
            lam_satd = jnp.sqrt(lam).astype(jnp.float32)
            mv_q, ref, satd, mv_bits, pred_y = self._pick_ref_me(
                me, lam_satd, nb)
            if self.merge_search:
                (mv_q, ref, mv_bits, pred_y, use_merge,
                 merge_delta) = self._merge_align_p(
                    planes, refs_y, blocks, rows, cols, n, mv_q, ref,
                    satd, mv_bits, pred_y, lam_satd)
        else:
            mv_q, ref, _, mv_bits = self._best_uni_leaf(
                blocks, refs_y, fields, y0, x0, n, lam)
            ypad_all = jnp.pad(refs_y, ((0, 0), (P, P), (P, P)),
                               mode="edge")
            pred_y = self._mc_luma_sel(ypad_all, ref, mv_q, y0, x0, n, P)
        resi = blocks - pred_y
        saved = (self.rdoq, self.sign_hiding)
        self.rdoq = self.sign_hiding = False
        try:
            if n == 64:
                levels, r2 = self._tq_quad(resi, qp_y, True, lam=lam)
            else:
                levels, r2 = self._transform_quant(
                    resi, t, qp_y, n, mats=self._mats_for(n, True))
                levels, r2 = self._rd_zero_tu(resi, levels, r2, lam, n,
                                              True)
        finally:
            self.rdoq, self.sign_hiding = saved
        dist = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        cbf_any = jnp.any(levels != 0, axis=(1, 2))
        if n == 64:
            # 64 CU -> four 32x32 TUs at trafo depth 1
            L = levels.shape[0]
            lv4 = jnp.moveaxis(levels.reshape(L, 2, 32, 2, 32), 2, 3) \
                .reshape(L * 4, 32, 32)
            rate = self._tu_rate_y(lv4, 32, depth1=True) \
                .reshape(L, 4).sum(axis=1)
        else:
            rate = self._tu_rate_y(levels, n)
        nc = n // 2
        CPW = (P >> 1) + 2
        cbpad = jnp.pad(refs_cb, ((0, 0), (CPW, CPW), (CPW, CPW)),
                        mode="edge")
        crpad = jnp.pad(refs_cr, ((0, 0), (CPW, CPW), (CPW, CPW)),
                        mode="edge")
        cy0 = (bid // cols) * nc
        cx0 = (bid % cols) * nc
        pred_cb = self._mc_chroma_sel(cbpad, ref, mv_q, cy0, cx0, nc, CPW)
        pred_cr = self._mc_chroma_sel(crpad, ref, mv_q, cy0, cx0, nc, CPW)
        ccost = jnp.zeros_like(dist)
        for plane, cpred in ((src_cb, pred_cb), (src_cr, pred_cr)):
            cblocks, _, _ = self._blocks_of(plane, nc)
            cresi = cblocks - cpred
            saved = (self.rdoq, self.sign_hiding)
            self.rdoq = self.sign_hiding = False
            try:
                if nc == 32:
                    clev, cr2 = self._tq_quad(cresi, qp_c, False,
                                              lam=lam)
                else:
                    clev, cr2 = self._transform_quant(
                        cresi, tc, qp_c, nc,
                        mats=self._mats_for(nc, False))
                    clev, cr2 = self._rd_zero_tu(cresi, clev, cr2, lam,
                                                 nc, False)
            finally:
                self.rdoq, self.sign_hiding = saved
            cdist = ((cresi - cr2).astype(jnp.float32) ** 2) \
                .sum(axis=(1, 2))
            cbf_any = cbf_any | jnp.any(clev != 0, axis=(1, 2))
            if nc == 32:
                L = clev.shape[0]
                cl4 = jnp.moveaxis(clev.reshape(L, 2, 16, 2, 16), 2, 3) \
                    .reshape(L * 4, 16, 16)
                crate = self._tu_rate_c(cl4, 16, depth1=True) \
                    .reshape(L, 4).sum(axis=1)
            else:
                crate = self._tu_rate_c(clev, nc)
            ccost = ccost + cdist + lam * crate
        # three-tier mode pricing matching the write-time resolution
        # (engine/md_inter_writer.py): skip / merge+resi / AMVP
        ref_b = sum(jnp.where(ref == k, self._ref_cost(k), 0.0)
                    for k in range(self.n_refs)) if self.n_refs > 1 \
            else jnp.float32(0.0)
        amvp_bits = (self.dpc[self.DPC_AMVP] + mv_bits + ref_b
                     + jnp.where(cbf_any, self.dpc[self.DPC_RQT1],
                                 self.dpc[self.DPC_RQT0]))
        if use_merge is None:
            # no alignment pass ran: price with the neighbour-equality
            # proxy as before
            merge_ok = self._merge_proxy(mv_q, ref, rows, cols)
            mode_bits = jnp.where(
                merge_ok,
                jnp.where(cbf_any,
                          jnp.minimum(self.dpc[self.DPC_MERGE]
                                      + self.dpc[self.DPC_RQT1],
                                      amvp_bits),
                          self.dpc[self.DPC_SKIP]),
                amvp_bits)
        else:
            mode_bits = jnp.where(
                use_merge,
                jnp.where(cbf_any,
                          self.dpc[self.DPC_MERGE] + merge_delta
                          + self.dpc[self.DPC_RQT1],
                          self.dpc[self.DPC_SKIP] + merge_delta),
                amvp_bits)
        cost = dist + lam * (rate + mode_bits) + ccost
        # with no residual anywhere the writer codes no cbf flags at all
        # (skip, or AMVP with rqt_root_cbf=0): refund the cbf-0 prices
        # _tu_rate_y/_tu_rate_c charged
        if n == 64:
            refund = (4.0 * self.dpc[self.DPC_CBF_Y0_D1]
                      + 8.0 * self.dpc[self.DPC_CBF_C0_D1])
        else:
            refund = (self.dpc[self.DPC_CBF_Y0]
                      + 2.0 * self.dpc[self.DPC_CBF_C0])
        cost = cost - lam * jnp.where(cbf_any, 0.0, refund)
        return mv_q, ref, cost, pred_y, pred_cb, pred_cr

    # ------------------------------------------------------------------
    # SMP/AMP: rectangular PU partitions (ref src/search_inter.c:2311)
    # ------------------------------------------------------------------

    # part ids (match decoder _parse_part_mode_inter strings)
    PART_GEOM = {
        1: lambda n: ((0, 0, n // 2, n), (n // 2, 0, n // 2, n)),  # 2NxN
        2: lambda n: ((0, 0, n, n // 2), (0, n // 2, n, n // 2)),  # Nx2N
        3: lambda n: ((0, 0, n // 4, n),
                      (n // 4, 0, 3 * n // 4, n)),                 # 2NxnU
        4: lambda n: ((0, 0, 3 * n // 4, n),
                      (3 * n // 4, 0, n // 4, n)),                 # 2NxnD
        5: lambda n: ((0, 0, n, n // 4), (0, n // 4, n, 3 * n // 4)),
        6: lambda n: ((0, 0, n, 3 * n // 4), (0, 3 * n // 4, n, n // 4)),
    }

    def _part_mode_bits(self, part_id: int) -> float:
        """part_mode fractional bits for an inter CU above min CB size
        (decoder _parse_part_mode_inter binarization)."""
        d = self.dpc
        bits = d[self.DPC_PART0_0]
        bits = bits + (d[self.DPC_PART1_1] if part_id in (1, 3, 4)
                       else d[self.DPC_PART1_0])
        if self.amp:
            bits = bits + (d[self.DPC_PART3_1] if part_id in (1, 2)
                           else d[self.DPC_PART3_0] + 1.0)
        return bits

    def _smp_leaf(self, src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
                  fields, n, lam):
        """Best rectangular-PU candidate per aligned n-block: for each
        enabled part mode, per-PU ME (coarse-field candidates + integer
        + subpel refine on the PU rectangle) -> exact CU prediction ->
        forced-split T/Q (interSplitFlag, spec 7.3.8.8) -> RD cost.
        Returns (part [B], mv_a, ref_a, mv_b, ref_b, cost [B])."""
        qp_y, qp_c, lam_n = self._qp_lam_for(n)
        if self.delta_qp:
            lam = lam_n
        blocks, rows, cols = self._blocks_of(src_y, n)
        nb = rows * cols
        bid = jnp.arange(nb)
        y0 = (bid // cols) * n
        x0 = (bid % cols) * n
        P = self.SUBPEL_PAD
        lam_satd = jnp.sqrt(lam).astype(jnp.float32)
        # CU-level integer candidates shared by both PUs
        cands_list = []
        for k in range(refs_y.shape[0]):
            mv16 = fields[k]
            if n >= 32:
                c = jnp.concatenate(
                    [self._field_for(mv16, n),
                     jnp.zeros((nb, 1, 2), jnp.int32)], axis=1)
            else:
                c = jnp.stack([self._field_for(mv16, n),
                               jnp.zeros((nb, 2), jnp.int32)], axis=1)
            cands_list.append(c)
        ypad = jnp.pad(refs_y, ((0, 0), (P, P), (P, P)), mode="edge")
        CPW = (P >> 1) + 2
        cbpad = jnp.pad(refs_cb, ((0, 0), (CPW, CPW), (CPW, CPW)),
                        mode="edge")
        crpad = jnp.pad(refs_cr, ((0, 0), (CPW, CPW), (CPW, CPW)),
                        mode="edge")
        cb_blocks, _, _ = self._blocks_of(src_cb, n // 2)
        cr_blocks, _, _ = self._blocks_of(src_cr, n // 2)
        modes = [1, 2] + ([3, 4, 5, 6] if self.amp and n == 32 else [])
        best = None
        for pid in modes:
            pus = self.PART_GEOM[pid](n)
            pred_y = jnp.zeros_like(blocks)
            pred_cb = jnp.zeros_like(cb_blocks)
            pred_cr = jnp.zeros_like(cr_blocks)
            pu_bits = jnp.zeros((nb,), jnp.float32)
            mvs, refs_sel = [], []
            for (dy, dx, ph, pw) in pus:
                pu_blocks = blocks[:, dy:dy + ph, dx:dx + pw]
                mv_q, ref, _, mv_bits = self._best_uni_leaf(
                    pu_blocks, refs_y, fields, y0 + dy, x0 + dx, pw,
                    lam, cands_list=cands_list)
                mvs.append(mv_q)
                refs_sel.append(ref)
                ref_b = (sum(jnp.where(ref == k, self._ref_cost(k), 0.0)
                             for k in range(self.n_refs))
                         if self.n_refs > 1 else 0.0)
                pu_bits = pu_bits + mv_bits + ref_b
                py = self._mc_luma_sel(ypad, ref, mv_q, y0 + dy, x0 + dx,
                                       pw, P, nh=ph)
                pred_y = jax.lax.dynamic_update_slice(
                    pred_y, py, (0, dy, dx))
                pcb = self._mc_chroma_sel(
                    cbpad, ref, mv_q, (y0 + dy) // 2, (x0 + dx) // 2,
                    pw // 2, CPW, nch=ph // 2)
                pcr = self._mc_chroma_sel(
                    crpad, ref, mv_q, (y0 + dy) // 2, (x0 + dx) // 2,
                    pw // 2, CPW, nch=ph // 2)
                pred_cb = jax.lax.dynamic_update_slice(
                    pred_cb, pcb, (0, dy // 2, dx // 2))
                pred_cr = jax.lax.dynamic_update_slice(
                    pred_cr, pcr, (0, dy // 2, dx // 2))
            # exact RD with the forced TU split (4 sub-TUs at depth 1)
            resi = blocks - pred_y
            saved = (self.rdoq, self.sign_hiding)
            self.rdoq = self.sign_hiding = False
            try:
                levels, r2 = self._tq_quad(resi, qp_y, True, lam=lam)
            finally:
                self.rdoq, self.sign_hiding = saved
            dist = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
            L = levels.shape[0]
            hn = n // 2
            lv4 = jnp.moveaxis(levels.reshape(L, 2, hn, 2, hn), 2, 3) \
                .reshape(L * 4, hn, hn)
            rate = self._tu_rate_y(lv4, hn, depth1=True) \
                .reshape(L, 4).sum(axis=1)
            cost = dist + lam * rate
            for cblocks, cpred in ((cb_blocks, pred_cb),
                                   (cr_blocks, pred_cr)):
                cresi = cblocks - cpred
                saved = (self.rdoq, self.sign_hiding)
                self.rdoq = self.sign_hiding = False
                try:
                    clev, cr2 = self._tq_quad(cresi, qp_c, False, lam=lam)
                finally:
                    self.rdoq, self.sign_hiding = saved
                cdist = ((cresi - cr2).astype(jnp.float32) ** 2) \
                    .sum(axis=(1, 2))
                hc = hn // 2
                cl4 = jnp.moveaxis(clev.reshape(L, 2, hc, 2, hc), 2, 3) \
                    .reshape(L * 4, hc, hc)
                crate = self._tu_rate_c(cl4, hc, depth1=True) \
                    .reshape(L, 4).sum(axis=1)
                cost = cost + cdist + lam * crate
            mode_bits = (self.dpc[self.DPC_AMVP]
                         - self.dpc[self.DPC_PART_2NX2N]
                         + self._part_mode_bits(pid)
                         + self.dpc[self.DPC_PU_EXTRA]
                         + pu_bits + self.dpc[self.DPC_RQT1])
            cost = cost + lam * mode_bits
            cand = (jnp.full((nb,), pid, jnp.int32), mvs[0], refs_sel[0],
                    mvs[1], refs_sel[1], cost)
            if best is None:
                best = cand
            else:
                better = cost < best[5]
                best = (jnp.where(better, cand[0], best[0]),
                        jnp.where(better[:, None], cand[1], best[1]),
                        jnp.where(better, cand[2], best[2]),
                        jnp.where(better[:, None], cand[3], best[3]),
                        jnp.where(better, cand[4], best[4]),
                        jnp.where(better, cost, best[5]))
        return best

    def _mc_luma_sel(self, ypad_all, ref, mv, y0, x0, n, pad, hi=False,
                     nh=None):
        """MC from a padded reference stack with per-block ref index.
        hi=True returns the 14-bit intermediate for exact bi-prediction
        (spec 8.5.3.3.3); nh selects a rectangular [L, nh, n] block
        (SMP PUs)."""
        nh = n if nh is None else nh
        ix = mv[:, 0] >> 2
        iy = mv[:, 1] >> 2
        fx = mv[:, 0] & 3
        fy = mv[:, 1] & 3
        wy = (y0 + iy + pad - 3)[:, None] + jnp.arange(nh + 7)[None, :]
        wx = (x0 + ix + pad - 3)[:, None] + jnp.arange(n + 7)[None, :]
        wy = jnp.clip(wy, 0, ypad_all.shape[-2] - 1)
        wx = jnp.clip(wx, 0, ypad_all.shape[-1] - 1)
        win = ypad_all[ref[:, None, None], wy[:, :, None], wx[:, None, :]]
        fmat = jnp.asarray(LUMA_FILTERS)
        cx = jnp.take(fmat, fx, axis=0)
        cy = jnp.take(fmat, fy, axis=0)
        h14 = sum(cx[:, k, None, None] * win[:, :, k:k + n]
                  for k in range(8))
        v = sum(cy[:, k, None, None] * h14[:, k:k + nh, :]
                for k in range(8)) >> 6
        if hi:
            return v
        return jnp.clip((v + 32) >> 6, 0, self.maxv)

    def _mc_chroma_sel(self, cpad_all, ref, mv, cy0, cx0, nc, cpadw,
                       hi=False, nch=None):
        nch = nc if nch is None else nch
        ix = mv[:, 0] >> 3
        iy = mv[:, 1] >> 3
        fx = mv[:, 0] & 7
        fy = mv[:, 1] & 7
        wy = (cy0 + iy + cpadw - 1)[:, None] + jnp.arange(nch + 3)[None, :]
        wx = (cx0 + ix + cpadw - 1)[:, None] + jnp.arange(nc + 3)[None, :]
        wy = jnp.clip(wy, 0, cpad_all.shape[-2] - 1)
        wx = jnp.clip(wx, 0, cpad_all.shape[-1] - 1)
        win = cpad_all[ref[:, None, None], wy[:, :, None],
                       wx[:, None, :]]
        fmat = jnp.asarray(CHROMA_FILTERS)
        cxf = jnp.take(fmat, fx, axis=0)
        cyf = jnp.take(fmat, fy, axis=0)
        h14 = sum(cxf[:, k, None, None] * win[:, :, k:k + nc]
                  for k in range(4))
        v = sum(cyf[:, k, None, None] * h14[:, k:k + nch, :]
                for k in range(4)) >> 6
        if hi:
            return v
        return jnp.clip((v + 32) >> 6, 0, self.maxv)

    # ------------------------------------------------------------------
    # B slices: two reference lists + exact bi-prediction
    # ------------------------------------------------------------------

    @staticmethod
    def _bi_avg(a, b, maxv):
        """Exact bi-prediction average of two 14-bit signals
        (spec 8.5.3.3.3 for 8-bit output)."""
        return jnp.clip((a + b + 64) >> 7, 0, maxv)

    @staticmethod
    def _uni_round(v, maxv):
        return jnp.clip((v + 32) >> 6, 0, maxv)

    @staticmethod
    def _left_of(g, fill=None):
        """Value of the left same-size neighbour per grid cell."""
        first = g[:, :1] if fill is None else jnp.full_like(g[:, :1],
                                                            fill)
        return jnp.concatenate([first, g[:, :-1]], axis=1)

    @staticmethod
    def _top_of(g, fill=None):
        first = g[:1] if fill is None else jnp.full_like(g[:1], fill)
        return jnp.concatenate([first, g[:-1]], axis=0)

    def _eval_exact(self, planes, refs_y, blocks, y0, x0, mvs, refsel,
                    n, want_pred=False, hi=False):
        """SATD (+ optionally pred) of exact qpel MVs per block, ref
        selected per block. mvs [L, 2]; refsel [L]. planes: padded
        kernel planes (TPU) or None (XLA fallback)."""
        if planes is not None:
            from ..ops.pallas_me import me_eval, pack_eval_info
            info = pack_eval_info(y0[:, None], x0[:, None],
                                  mvs[:, None, 0], mvs[:, None, 1])
            satd = None
            pred = None
            for rk in range(len(planes)):
                res = me_eval(planes[rk], blocks, info, n=n,
                              maxv=self.maxv, want_pred=want_pred,
                              hi=hi)
                s_k = res[0][:, 0]
                take = refsel == rk
                satd = s_k if satd is None else jnp.where(take, s_k,
                                                          satd)
                if want_pred:
                    p_k = res[1]
                    pred = p_k if pred is None else jnp.where(
                        take[:, None, None], p_k, pred)
            return (satd, pred) if want_pred else satd
        P = self.SUBPEL_PAD
        ypad_all = jnp.pad(refs_y, ((0, 0), (P, P), (P, P)),
                           mode="edge")
        pred = self._mc_luma_sel(ypad_all, refsel, mvs, y0, x0, n, P,
                                 hi=hi)
        pr = self._uni_round(pred, self.maxv) if hi else pred
        satd = self._satd_tiles(blocks - pr)
        return (satd, pred) if want_pred else satd

    # merge-candidate merge_idx estimate deltas (bits): left ~ idx 0,
    # top ~ idx 1, region/global ~ mid, zero ~ late idx
    _MERGE_IDX_DELTA = (0.0, 0.8, 1.2, 1.2, 1.6)

    def _region_cand(self, mvg, refg, rows, cols, n):
        """Per-CTB broadcast candidate: every block in a CTB offers the
        CTB's top-left block's first-pass motion. Value-based (all
        adopters share one value), so merge chains resolve without the
        conservative disable rule — only the corner block itself must
        keep its motion (checked by the caller)."""
        k = max(1, self.CTB // n)
        ri = (jnp.arange(rows) // k) * k
        ci = (jnp.arange(cols) // k) * k
        mvs = mvg[ri[:, None], ci[None, :]]
        refs = refg[ri[:, None], ci[None, :]]
        corner = (jnp.arange(rows)[:, None] % k == 0) \
            & (jnp.arange(cols)[None, :] % k == 0)
        return mvs, refs, corner, (ri, ci)

    @staticmethod
    def _global_mv(field):
        """Dominant full-pel MV of a coarse field: per-component
        median (panning content's one-candidate-fits-most)."""
        f = field.reshape(-1, 2)
        return jnp.median(f, axis=0).astype(jnp.int32)

    def _merge_align_p(self, planes, refs_y, blocks, rows, cols, n,
                       mv_q, ref, satd, mv_bits, pred_y, lam_satd):
        """Merge-aware alignment: adopt a neighbour/zero merge
        candidate when SATD+bins beat the AMVP winner. Chain-safe: a
        block may adopt from a neighbour only if that neighbour keeps
        its own first-pass motion, so every adopted MV equals its
        source's final MV and the writer's real candidate derivation
        finds it. Returns (mv_q, ref, mv_bits, pred_y, use_merge,
        merge_delta)."""
        nb = rows * cols
        bid = jnp.arange(nb)
        y0 = (bid // cols) * n
        x0 = (bid % cols) * n
        mvg = mv_q.reshape(rows, cols, 2)
        refg = ref.reshape(rows, cols)
        ci = jnp.broadcast_to(jnp.arange(cols)[None, :], (rows, cols))
        ri = jnp.broadcast_to(jnp.arange(rows)[:, None], (rows, cols))
        mvS, refS, corner, (rS, cS) = self._region_cand(
            mvg, refg, rows, cols, n)
        gmv = self._global_mv(self._merge_field0) * 4
        cands = [
            (self._left_of(mvg).reshape(-1, 2),
             self._left_of(refg).reshape(-1), (ci > 0).reshape(-1)),
            (self._top_of(mvg).reshape(-1, 2),
             self._top_of(refg).reshape(-1), (ri > 0).reshape(-1)),
            (mvS.reshape(-1, 2), refS.reshape(-1),
             jnp.ones((nb,), bool)),
            (jnp.broadcast_to(gmv, (nb, 2)),
             jnp.zeros((nb,), jnp.int32), jnp.ones((nb,), bool)),
            (jnp.zeros((nb, 2), jnp.int32),
             jnp.zeros((nb,), jnp.int32),
             jnp.ones((nb,), bool)),
        ]
        big = jnp.float32(1e18)
        best = None
        for c, (cmv, cref, valid) in enumerate(cands):
            s_c = self._eval_exact(planes, refs_y, blocks, y0, x0,
                                   cmv, cref, n)
            cost_c = s_c.astype(jnp.float32) + lam_satd * (
                self.dpc[self.DPC_MERGE] + self._MERGE_IDX_DELTA[c])
            cost_c = jnp.where(valid, cost_c, big)
            cur = (cost_c, cmv, cref, jnp.full((nb,), c, jnp.int32))
            if best is None:
                best = cur
            else:
                better = cost_c < best[0]
                best = (jnp.where(better, cost_c, best[0]),
                        jnp.where(better[:, None], cmv, best[1]),
                        jnp.where(better, cref, best[2]),
                        jnp.where(better, c, best[3]))
        mcost, mmv, mref, mpick = best
        ref_b = sum(jnp.where(ref == k, self._ref_cost(k), 0.0)
                    for k in range(self.n_refs)) if self.n_refs > 1 \
            else jnp.float32(0.0)
        acost = satd.astype(jnp.float32) + lam_satd * (
            self.dpc[self.DPC_AMVP] + mv_bits + ref_b)
        use = mcost < acost
        changed = use & (jnp.any(mmv != mv_q, axis=-1) | (mref != ref))
        chg = changed.reshape(rows, cols)
        srcL = self._left_of(chg, fill=False).reshape(-1)
        srcT = self._top_of(chg, fill=False).reshape(-1)
        srcC = chg[rS[:, None], cS[None, :]].reshape(-1)
        use = use & ~(((mpick == 0) & srcL) | ((mpick == 1) & srcT)
                      | ((mpick == 2) & srcC))
        changed = use & (jnp.any(mmv != mv_q, axis=-1) | (mref != ref))
        mv_f = jnp.where(use[:, None], mmv, mv_q)
        ref_f = jnp.where(use, mref, ref)
        delta = sum(jnp.where(mpick == c,
                              jnp.float32(self._MERGE_IDX_DELTA[c]),
                              0.0) for c in range(len(cands)))
        pred_m = self._eval_exact(planes, refs_y, blocks, y0, x0, mv_f,
                                  ref_f, n, want_pred=True)[1]
        pred_f = jnp.where(changed[:, None, None], pred_m, pred_y)
        mv_bits_f = jnp.where(use, 0.0, mv_bits)
        return mv_f, ref_f, mv_bits_f, pred_f, use, delta

    def _pick_ref_me(self, me, lam_satd, nb):
        """Best ref from per-ref kernel ME results: returns
        (mv [nb,2], ref [nb], satd [nb], bits [nb], pred)."""
        best = None
        for k, (mv_k, satd_k, pred_k, cand0) in enumerate(me):
            bits_k = self._mv_bins(mv_k - cand0 * 4)
            cost_k = satd_k.astype(jnp.float32) + lam_satd * (
                bits_k + self._ref_cost(k, n_list=len(me)))
            cur = (cost_k, mv_k, jnp.full((nb,), k, jnp.int32),
                   satd_k, bits_k, pred_k)
            if best is None:
                best = cur
            else:
                better = cost_k < best[0]
                best = (jnp.where(better, cost_k, best[0]),
                        jnp.where(better[:, None], mv_k, best[1]),
                        jnp.where(better, k, best[2]),
                        jnp.where(better, satd_k, best[3]),
                        jnp.where(better, bits_k, best[4]),
                        jnp.where(better[:, None, None], pred_k,
                                  best[5]))
        return best[1], best[2], best[3], best[4], best[5]

    def _merge_align_b(self, planes0, planes1, l0_y, l1_y, blocks,
                       rows, cols, n, y0, x0, mv0, r0, mv1, r1, dirn,
                       acost, lam_satd):
        """B-slice merge-aware alignment: neighbour full-motion tuples
        + the zero-L0 candidate, exact-SATD-evaluated (exact 14-bit
        bi), chain-safe like _merge_align_p."""
        nb = rows * cols

        def grid(a):
            return a.reshape(rows, cols, *a.shape[1:])
        fields = (mv0, r0, mv1, r1, dirn)
        candL = tuple(self._left_of(grid(f)).reshape(f.shape)
                      for f in fields)
        candT = tuple(self._top_of(grid(f)).reshape(f.shape)
                      for f in fields)
        k = max(1, self.CTB // n)
        rS = (jnp.arange(rows) // k) * k
        cS = (jnp.arange(cols) // k) * k
        candS = tuple(
            grid(f)[rS[:, None], cS[None, :]].reshape(f.shape)
            for f in fields)
        cand0 = (jnp.zeros_like(mv0), jnp.zeros_like(r0),
                 jnp.zeros_like(mv1), jnp.zeros_like(r1),
                 jnp.ones_like(dirn))
        ci = jnp.broadcast_to(jnp.arange(cols)[None, :],
                              (rows, cols)).reshape(-1)
        ri = jnp.broadcast_to(jnp.arange(rows)[:, None],
                              (rows, cols)).reshape(-1)
        valids = (ci > 0, ri > 0, jnp.ones((nb,), bool),
                  jnp.ones((nb,), bool))
        deltas = (self._MERGE_IDX_DELTA[0], self._MERGE_IDX_DELTA[1],
                  self._MERGE_IDX_DELTA[2], self._MERGE_IDX_DELTA[4])
        big = jnp.float32(1e18)
        best = None
        for c, (cand, valid) in enumerate(zip((candL, candT, candS,
                                               cand0), valids)):
            cmv0, cr0, cmv1, cr1, cdir = cand
            s0, p0 = self._eval_exact(planes0, l0_y, blocks, y0, x0,
                                      cmv0, cr0, n, want_pred=True,
                                      hi=True)
            s1, p1 = self._eval_exact(planes1, l1_y, blocks, y0, x0,
                                      cmv1, cr1, n, want_pred=True,
                                      hi=True)
            sbi = self._satd_tiles(
                blocks - self._bi_avg(p0, p1, self.maxv))
            s_c = jnp.where(cdir == 3, sbi,
                            jnp.where(cdir == 1, s0, s1))
            cost_c = s_c.astype(jnp.float32) + lam_satd * (
                self.dpc[self.DPC_MERGE] + deltas[c])
            cost_c = jnp.where(valid, cost_c, big)
            cur = (cost_c,) + cand + (jnp.full((nb,), c, jnp.int32),)
            if best is None:
                best = cur
            else:
                better = cost_c < best[0]

                def sel(a, b):
                    bb = better
                    while bb.ndim < a.ndim:
                        bb = bb[..., None]
                    return jnp.where(bb, a, b)
                best = tuple(sel(a, b) for a, b in zip(cur, best))
        mcost, bm0, br0, bm1, br1, bdir, mpick = best
        use = mcost < acost
        same = (jnp.all(bm0 == mv0, axis=-1) & (br0 == r0)
                & jnp.all(bm1 == mv1, axis=-1) & (br1 == r1)
                & (bdir == dirn))
        changed = use & ~same
        chg = changed.reshape(rows, cols)
        srcL = self._left_of(chg, fill=False).reshape(-1)
        srcT = self._top_of(chg, fill=False).reshape(-1)
        srcC = chg[rS[:, None], cS[None, :]].reshape(-1)
        use = use & ~(((mpick == 0) & srcL) | ((mpick == 1) & srcT)
                      | ((mpick == 2) & srcC))

        def pick(a, b):
            u = use
            while u.ndim < a.ndim:
                u = u[..., None]
            return jnp.where(u, a, b)
        mv0f, r0f = pick(bm0, mv0), pick(br0, r0)
        mv1f, r1f = pick(bm1, mv1), pick(br1, r1)
        dirf = pick(bdir, dirn)
        delta = sum(jnp.where(mpick == c, jnp.float32(deltas[c]), 0.0)
                    for c in range(len(deltas)))
        return mv0f, r0f, mv1f, r1f, dirf, use, delta

    def _inter_leaf_b(self, src_y, src_cb, src_cr, l0, l1, fields0,
                      fields1, n, t, tc, lam, me0=None, me1=None,
                      planes0=None, planes1=None):
        """Best B-slice inter candidate per aligned n-block: per-list
        SATD-best uni candidates + their exact bi-prediction, direction
        chosen by SATD + signalling bins (reference picks bipred the
        same way: src/search_inter.c:1442 search_pu_inter_bipred), then
        one exact RD cost of the winner for the partition DP.
        Returns (mv0, r0, mv1, r1, dir, cost)."""
        qp_y, qp_c, lam_n = self._qp_lam_for(n)
        if self.delta_qp:
            lam = lam_n
        (l0_y, l0_cb, l0_cr), (l1_y, l1_cb, l1_cr) = l0, l1
        blocks, rows, cols = self._blocks_of(src_y, n)
        nb = rows * cols
        bid = jnp.arange(nb)
        y0 = (bid // cols) * n
        x0 = (bid % cols) * n
        P = self.SUBPEL_PAD
        lam_satd = jnp.sqrt(lam).astype(jnp.float32)
        if me0 is not None:
            mv0, r0, satd0, bits0, _ = self._pick_ref_me(
                me0, lam_satd, nb)
            mv1, r1, satd1, bits1, _ = self._pick_ref_me(
                me1, lam_satd, nb)
            _, v0 = self._eval_exact(planes0, l0_y, blocks, y0, x0,
                                     mv0, r0, n, want_pred=True,
                                     hi=True)
            _, v1 = self._eval_exact(planes1, l1_y, blocks, y0, x0,
                                     mv1, r1, n, want_pred=True,
                                     hi=True)
        else:
            mv0, r0, satd0, bits0 = self._best_uni_leaf(
                blocks, l0_y, fields0, y0, x0, n, lam)
            mv1, r1, satd1, bits1 = self._best_uni_leaf(
                blocks, l1_y, fields1, y0, x0, n, lam)
            sp = ((0, 0), (P, P), (P, P))
            y0pad = jnp.pad(l0_y, sp, mode="edge")
            y1pad = jnp.pad(l1_y, sp, mode="edge")
            v0 = self._mc_luma_sel(y0pad, r0, mv0, y0, x0, n, P,
                                   hi=True)
            v1 = self._mc_luma_sel(y1pad, r1, mv1, y0, x0, n, P,
                                   hi=True)
        pred_bi = self._bi_avg(v0, v1, self.maxv)
        satd_bi = self._satd_tiles(blocks - pred_bi)
        nl0, nl1 = l0_y.shape[0], l1_y.shape[0]

        def refb(r, nl):
            if nl <= 1:
                return jnp.float32(0.0)
            return sum(jnp.where(r == k, self._ref_cost(k, n_list=nl),
                                 0.0) for k in range(nl))

        idc_u = self.dpc[self.DPC_IDC_UNI]
        idc_b = self.dpc[self.DPC_IDC_BI]
        c0 = satd0.astype(jnp.float32) + lam_satd * (
            bits0 + refb(r0, nl0) + idc_u)
        c1 = satd1.astype(jnp.float32) + lam_satd * (
            bits1 + refb(r1, nl1) + idc_u)
        cbi = satd_bi.astype(jnp.float32) + lam_satd * (
            bits0 + bits1 + refb(r0, nl0) + refb(r1, nl1) + idc_b)
        # cross-ref bi candidate: the per-ref winners of DIFFERENT
        # pictures (both lists pick the same best ref independently,
        # so the plain bi averages one picture with itself — averaging
        # two pictures is where bi-prediction's noise gain lives;
        # ref search_inter.c:1442 explores such pairs via merge cands)
        cross = None
        if (me0 is not None and self.bipred and len(me0) >= 2
                and len(me1) >= 2):
            mvA, satdA, predA, candA = me0[0]
            mvB, satdB, predB, candB = me1[1]
            px = (predA + predB + 1) >> 1      # rounded-pred estimate
            satd_x = self._satd_tiles(blocks - px)
            bitsA = self._mv_bins(mvA - candA * 4)
            bitsB = self._mv_bins(mvB - candB * 4)
            cx_cost = satd_x.astype(jnp.float32) + lam_satd * (
                bitsA + bitsB + self._ref_cost(0, n_list=nl0)
                + self._ref_cost(1, n_list=nl1) + idc_b)
            cross = (cx_cost, mvA, mvB)
        uni = jnp.where(c0 <= c1, 1, 2)
        if self.bipred:
            dirn = jnp.where((cbi <= c0) & (cbi <= c1), 3,
                             uni).astype(jnp.int32)
        else:   # --no-bipred: per-list uni candidates only
            dirn = uni.astype(jnp.int32)
        if cross is not None:
            cx_cost, mvA, mvB = cross
            cur_cost = jnp.where(
                dirn == 3, cbi, jnp.where(dirn == 1, c0, c1))
            take = cx_cost < cur_cost
            dirn = jnp.where(take, 3, dirn)
            mv0 = jnp.where(take[:, None], mvA, mv0)
            r0 = jnp.where(take, 0, r0)
            mv1 = jnp.where(take[:, None], mvB, mv1)
            r1 = jnp.where(take, 1, r1)
            # exact pred for blocks that switched rides the post-align
            # re-evaluation below; without the alignment pass, refresh
            # the hi hypotheses here
            if not (self.merge_search and me0 is not None):
                _, v0 = self._eval_exact(planes0, l0_y, blocks, y0, x0,
                                         mv0, r0, n, want_pred=True,
                                         hi=True)
                _, v1 = self._eval_exact(planes1, l1_y, blocks, y0, x0,
                                         mv1, r1, n, want_pred=True,
                                         hi=True)
                pred_bi = self._bi_avg(v0, v1, self.maxv)
        use_merge = None
        merge_delta = jnp.float32(0.0)
        if me0 is not None and self.merge_search:
            acost = jnp.minimum(jnp.minimum(c0, c1), cbi)
            if cross is not None:
                acost = jnp.minimum(acost, cross[0])
            acost = acost + lam_satd * self.dpc[self.DPC_AMVP]
            (mv0, r0, mv1, r1, dirn, use_merge,
             merge_delta) = self._merge_align_b(
                planes0, planes1, l0_y, l1_y, blocks, rows, cols, n,
                y0, x0, mv0, r0, mv1, r1, dirn, acost, lam_satd)
            _, v0 = self._eval_exact(planes0, l0_y, blocks, y0, x0,
                                     mv0, r0, n, want_pred=True,
                                     hi=True)
            _, v1 = self._eval_exact(planes1, l1_y, blocks, y0, x0,
                                     mv1, r1, n, want_pred=True,
                                     hi=True)
            pred_bi = self._bi_avg(v0, v1, self.maxv)
        sel = dirn[:, None, None]
        pred_y = jnp.where(sel == 3, pred_bi,
                           jnp.where(sel == 1,
                                     self._uni_round(v0, self.maxv),
                                     self._uni_round(v1, self.maxv)))
        # exact RD of the chosen candidate (same currency as intra)
        resi = blocks - pred_y
        saved = (self.rdoq, self.sign_hiding)
        self.rdoq = self.sign_hiding = False
        try:
            if n == 64:
                levels, r2 = self._tq_quad(resi, qp_y, True, lam=lam)
            else:
                levels, r2 = self._transform_quant(
                    resi, t, qp_y, n, mats=self._mats_for(n, True))
                levels, r2 = self._rd_zero_tu(resi, levels, r2, lam, n,
                                              True)
        finally:
            self.rdoq, self.sign_hiding = saved
        dist = ((resi - r2).astype(jnp.float32) ** 2).sum(axis=(1, 2))
        cbf_any = jnp.any(levels != 0, axis=(1, 2))
        if n == 64:
            L = levels.shape[0]
            lv4 = jnp.moveaxis(levels.reshape(L, 2, 32, 2, 32), 2, 3) \
                .reshape(L * 4, 32, 32)
            rate = self._tu_rate_y(lv4, 32, depth1=True) \
                .reshape(L, 4).sum(axis=1)
        else:
            rate = self._tu_rate_y(levels, n)
        nc = n // 2
        CPW = (P >> 1) + 2
        cp = ((0, 0), (CPW, CPW), (CPW, CPW))
        cy0 = (bid // cols) * nc
        cx0 = (bid % cols) * nc
        ccost = jnp.zeros_like(dist)
        cpreds = []
        for srcp, p0, p1 in ((src_cb, l0_cb, l1_cb),
                             (src_cr, l0_cr, l1_cr)):
            c0p = jnp.pad(p0, cp, mode="edge")
            c1p = jnp.pad(p1, cp, mode="edge")
            w0 = self._mc_chroma_sel(c0p, r0, mv0, cy0, cx0, nc, CPW,
                                     hi=True)
            w1 = self._mc_chroma_sel(c1p, r1, mv1, cy0, cx0, nc, CPW,
                                     hi=True)
            cpred = jnp.where(sel == 3, self._bi_avg(w0, w1, self.maxv),
                              jnp.where(sel == 1,
                                        self._uni_round(w0, self.maxv),
                                        self._uni_round(w1, self.maxv)))
            cpreds.append(cpred)
            cblocks, _, _ = self._blocks_of(srcp, nc)
            cresi = cblocks - cpred
            saved = (self.rdoq, self.sign_hiding)
            self.rdoq = self.sign_hiding = False
            try:
                if nc == 32:
                    clev, cr2 = self._tq_quad(cresi, qp_c, False,
                                              lam=lam)
                else:
                    clev, cr2 = self._transform_quant(
                        cresi, tc, qp_c, nc,
                        mats=self._mats_for(nc, False))
                    clev, cr2 = self._rd_zero_tu(cresi, clev, cr2, lam,
                                                 nc, False)
            finally:
                self.rdoq, self.sign_hiding = saved
            cdist = ((cresi - cr2).astype(jnp.float32) ** 2) \
                .sum(axis=(1, 2))
            cbf_any = cbf_any | jnp.any(clev != 0, axis=(1, 2))
            if nc == 32:
                L = clev.shape[0]
                cl4 = jnp.moveaxis(clev.reshape(L, 2, 16, 2, 16), 2, 3) \
                    .reshape(L * 4, 16, 16)
                crate = self._tu_rate_c(cl4, 16, depth1=True) \
                    .reshape(L, 4).sum(axis=1)
            else:
                crate = self._tu_rate_c(clev, nc)
            ccost = ccost + cdist + lam * crate
        mv_bits = jnp.where(dirn == 3, bits0 + bits1,
                            jnp.where(dirn == 1, bits0, bits1))
        ref_bits = jnp.where(
            dirn == 3, refb(r0, nl0) + refb(r1, nl1) + idc_b,
            jnp.where(dirn == 1, refb(r0, nl0) + idc_u,
                      refb(r1, nl1) + idc_u)).astype(jnp.float32)
        # three-tier mode pricing (skip / merge+resi / AMVP) with the
        # same neighbour-equality merge proxy as the P path, extended to
        # both lists + the direction
        amvp_bits = (self.dpc[self.DPC_AMVP] + mv_bits + ref_bits
                     + jnp.where(cbf_any, self.dpc[self.DPC_RQT1],
                                 self.dpc[self.DPC_RQT0]))
        if use_merge is None:
            merge_ok = self._merge_proxy(mv0, r0, rows, cols,
                                         extra=(mv1, r1, dirn))
            mode_bits = jnp.where(
                merge_ok,
                jnp.where(cbf_any,
                          jnp.minimum(self.dpc[self.DPC_MERGE]
                                      + self.dpc[self.DPC_RQT1],
                                      amvp_bits),
                          self.dpc[self.DPC_SKIP]),
                amvp_bits)
        else:
            mode_bits = jnp.where(
                use_merge,
                jnp.where(cbf_any,
                          self.dpc[self.DPC_MERGE] + merge_delta
                          + self.dpc[self.DPC_RQT1],
                          self.dpc[self.DPC_SKIP] + merge_delta),
                amvp_bits)
        cost = dist + lam * (rate + mode_bits) + ccost
        if n == 64:
            refund = (4.0 * self.dpc[self.DPC_CBF_Y0_D1]
                      + 8.0 * self.dpc[self.DPC_CBF_C0_D1])
        else:
            refund = (self.dpc[self.DPC_CBF_Y0]
                      + 2.0 * self.dpc[self.DPC_CBF_C0])
        cost = cost - lam * jnp.where(cbf_any, 0.0, refund)
        return (mv0, r0, mv1, r1, dirn, cost, pred_y, cpreds[0],
                cpreds[1])

    def _partition_inter_b(self, src_y, src_cb, src_cr, l0, l1, lam):
        """B-slice quadtree DP: per-size inter-B vs intra competition,
        then the same split DP as the P path. Returns (size_map8,
        mode_map8, inter8, dir8, mv8, ref8, mv8b, ref8b)."""
        fields0 = [self._coarse_field(src_y, l0[0][k])
                   for k in range(l0[0].shape[0])]
        fields1 = [self._coarse_field(src_y, l1[0][k])
                   for k in range(l1[0].shape[0])]
        planes0 = self._kernel_planes(l0[0])
        planes1 = self._kernel_planes(l1[0])
        me_l0 = self._me_kernel_sizes(src_y, l0[0], fields0, planes0)
        me_l1 = self._me_kernel_sizes(src_y, l1[0], fields1, planes1)
        leaf_preds = {}
        per_size = {}
        big = jnp.float32(1e18)
        for n, g, f, gc, t, tc in (
                (8, self.g8l, self.f8, self.g4c, self.t8, self.t4),
                (16, self.g16l, self.f16l, self.g8cc, self.t16, self.t8),
                (32, self.g32l, self.f32, self.g16c, self.t32, self.t16)):
            imodes, icost = self._leaf_rd(src_y, src_cb, src_cr, n, g, f,
                                          gc, t, tc, lam)
            # intra CUs in B slices also code cu_skip=0 + pred_mode=1,
            # and part_mode at min CB size (the inter side's part_mode
            # is already inside the DPC_MERGE/DPC_AMVP prices)
            icost = icost + lam * self.dpc[self.DPC_INTRA_PM]
            if n == 8:
                icost = icost + lam * self.dpc[self.DPC_PART_2NX2N]
            (mv0, r0, mv1, r1, dirn, ecost, p_y, p_cb,
             p_cr) = self._inter_leaf_b(
                src_y, src_cb, src_cr, l0, l1, fields0, fields1, n, t,
                tc, lam, me0=me_l0[n], me1=me_l1[n],
                planes0=planes0, planes1=planes1)
            leaf_preds[n] = (p_y, p_cb, p_cr)
            if not self.allow_inter[n]:
                ecost = ecost + big
            use_inter = ecost < icost
            cost = jnp.where(use_inter, ecost, icost)
            per_size[n] = dict(modes=imodes, mv=mv0, ref=r0, mvb=mv1,
                               refb=r1, dir=dirn, inter=use_inter,
                               cost=cost)
        (mv64, r64_, mv64b, r64b, dir64, ecost64, p_y, p_cb,
         p_cr) = self._inter_leaf_b(
            src_y, src_cb, src_cr, l0, l1, fields0, fields1, 64,
            self.t32, self.t16, lam, me0=me_l0[64], me1=me_l1[64],
            planes0=planes0, planes1=planes1)
        leaf_preds[64] = (p_y, p_cb, p_cr)
        r64, c64n = self.h // 64, self.w // 64
        per_size[64] = dict(
            modes=jnp.ones((r64 * c64n,), jnp.int32),
            mv=mv64, ref=r64_, mvb=mv64b, refb=r64b, dir=dir64,
            inter=jnp.ones((r64 * c64n,), bool),
            cost=ecost64 if self.allow_inter[64] else ecost64 + big)
        size_map8 = self._dp_merge(per_size, lam)
        sel8 = self._sel8_fn(per_size, size_map8)
        mode_map8 = sel8("modes").astype(jnp.int32)
        inter8 = sel8("inter")
        mv8 = sel8("mv", 2).astype(jnp.int32)
        ref8 = sel8("ref").astype(jnp.int32)
        mv8b = sel8("mvb", 2).astype(jnp.int32)
        ref8b = sel8("refb").astype(jnp.int32)
        dir8 = sel8("dir").astype(jnp.int32)
        return (size_map8, mode_map8, inter8, dir8, mv8, ref8, mv8b,
                ref8b, leaf_preds)

    # ------------------------------------------------------------------
    # partition with inter/intra competition
    # ------------------------------------------------------------------

    def _partition_inter(self, src_y, src_cb, src_cr, refs_y, refs_cb,
                         refs_cr, lam):
        fields = [self._coarse_field(src_y, refs_y[k])
                  for k in range(self.n_refs)]
        planes = self._kernel_planes(refs_y)
        self._merge_field0 = fields[0]   # global-MV merge candidate
        me_all = self._me_kernel_sizes(src_y, refs_y, fields, planes)
        leaf_preds = {}
        per_size = {}
        big = jnp.float32(1e18)
        for n, g, f, gc, t, tc in (
                (8, self.g8l, self.f8, self.g4c, self.t8, self.t4),
                (16, self.g16l, self.f16l, self.g8cc, self.t16, self.t8),
                (32, self.g32l, self.f32, self.g16c, self.t32, self.t16)):
            imodes, icost = self._leaf_rd(src_y, src_cb, src_cr, n, g, f,
                                          gc, t, tc, lam)
            # intra CUs in P slices also code cu_skip=0 + pred_mode=1,
            # and part_mode at min CB size (the inter side's part_mode
            # is already inside the DPC_MERGE/DPC_AMVP prices)
            icost = icost + lam * self.dpc[self.DPC_INTRA_PM]
            if n == 8:
                icost = icost + lam * self.dpc[self.DPC_PART_2NX2N]
            mv_q, ref, ecost, p_y, p_cb, p_cr = self._inter_leaf(
                src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr, fields,
                n, t, tc, lam, me=me_all[n], planes=planes)
            leaf_preds[n] = (p_y, p_cb, p_cr)
            if not self.allow_inter[n]:
                ecost = ecost + big
            use_inter = ecost < icost
            cost = jnp.where(use_inter, ecost, icost)
            per_size[n] = dict(modes=imodes, mv=mv_q, ref=ref,
                               inter=use_inter, cost=cost)
            if self.smp and n in (16, 32):
                # rectangular PUs compete with 2Nx2N and intra
                part, mva, refa, mvb, refb, scost = self._smp_leaf(
                    src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
                    fields, n, lam)
                if not self.allow_inter[n]:
                    scost = scost + big
                better = scost < cost
                per_size[n].update(
                    part=jnp.where(better, part, 0),
                    mv=jnp.where(better[:, None], mva, mv_q),
                    ref=jnp.where(better, refa, ref),
                    mv_pu1=jnp.where(better[:, None], mvb,
                                     jnp.zeros_like(mvb)),
                    ref_pu1=jnp.where(better, refb,
                                      jnp.zeros_like(refb)),
                    inter=use_inter | better,
                    cost=jnp.where(better, scost, cost))
            elif self.smp:
                nb_ = per_size[n]["ref"].shape[0]
                per_size[n].update(
                    part=jnp.zeros((nb_,), jnp.int32),
                    mv_pu1=jnp.zeros((nb_, 2), jnp.int32),
                    ref_pu1=jnp.zeros((nb_,), jnp.int32))
        # 64x64: inter-only leaves (intra max CU is 32; the reference
        # presets likewise keep intra min-depth >= 1, cfg.c:484-766,
        # while pu-depth-inter 0-3 codes inter 64 at medium+)
        mv64, ref64, ecost64, p_y, p_cb, p_cr = self._inter_leaf(
            src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr, fields,
            64, self.t32, self.t16, lam, me=me_all[64], planes=planes)
        leaf_preds[64] = (p_y, p_cb, p_cr)
        r64, c64n = self.h // 64, self.w // 64
        per_size[64] = dict(
            modes=jnp.ones((r64 * c64n,), jnp.int32),
            mv=mv64, ref=ref64,
            inter=jnp.ones((r64 * c64n,), bool),
            cost=ecost64 if self.allow_inter[64] else ecost64 + big)
        if self.smp:
            per_size[64].update(
                part=jnp.zeros((r64 * c64n,), jnp.int32),
                mv_pu1=jnp.zeros((r64 * c64n, 2), jnp.int32),
                ref_pu1=jnp.zeros((r64 * c64n,), jnp.int32))

        size_map8 = self._dp_merge(per_size, lam)
        sel8 = self._sel8_fn(per_size, size_map8)
        mode_map8 = sel8("modes").astype(jnp.int32)
        inter8 = sel8("inter")
        mv8 = sel8("mv", 2).astype(jnp.int32)
        ref8 = sel8("ref").astype(jnp.int32)
        part8 = None
        if self.smp:
            part8 = jnp.where(inter8, sel8("part").astype(jnp.int32), 0)
            mv8p1 = sel8("mv_pu1", 2).astype(jnp.int32)
            ref8p1 = sel8("ref_pu1").astype(jnp.int32)
            # merge per-PU motion into the 8-cell maps: cells in the
            # second PU take (mv_pu1, ref_pu1) by part geometry
            k8 = jnp.maximum(size_map8 >> 3, 1)
            rr = jnp.arange(self.r8)[:, None] % k8
            cc = jnp.arange(self.c8)[None, :] % k8
            h2 = k8 >> 1
            q4 = k8 >> 2
            pu1 = jnp.where(
                part8 == 1, rr >= h2,
                jnp.where(part8 == 2, cc >= h2,
                          jnp.where(part8 == 3, rr >= q4,
                                    jnp.where(part8 == 4, rr >= k8 - q4,
                                              jnp.where(part8 == 5,
                                                        cc >= q4,
                                                        jnp.where(
                                                            part8 == 6,
                                                            cc >= k8 - q4,
                                                            False))))))
            mv8 = jnp.where(pu1[..., None], mv8p1, mv8)
            ref8 = jnp.where(pu1, ref8p1, ref8)
        # aligned-merge MVs may differ from the leaf predictions ONLY
        # for SMP second PUs (handled by the cell-granular recon); the
        # 2Nx2N leaf preds are exact for their final motion
        return (size_map8, mode_map8, inter8, mv8, ref8, part8,
                leaf_preds)

    def _dp_merge(self, per_size, lam):
        """Bottom-up split DP over per-size leaf costs -> size_map8."""
        r16, c16n = self.h // 16, self.w // 16
        r32, c32n = self.h // 32, self.w // 32
        r64, c64n = self.h // 64, self.w // 64
        lam16 = lam32 = lam

        def sum4(c, rows, cols):
            return c.reshape(rows, 2, cols, 2).sum(axis=(1, 3))

        sp0 = self.dpc[self.DPC_SPLIT0]
        sp1 = self.dpc[self.DPC_SPLIT1]
        c8m = per_size[8]["cost"].reshape(self.r8, self.c8)
        sum8 = sum4(c8m, r16, c16n)
        leaf16 = per_size[16]["cost"].reshape(r16, c16n)
        split16 = sum8 + lam16 * sp1 < leaf16 + lam16 * sp0
        if not self.allow[8]:
            split16 = jnp.zeros_like(split16)
        if not self.allow[16]:
            split16 = jnp.ones_like(split16)
        best16 = jnp.where(split16, sum8 + lam16 * sp1,
                           leaf16 + lam16 * sp0)
        sum16 = sum4(best16, r32, c32n)
        leaf32 = per_size[32]["cost"].reshape(r32, c32n)
        split32 = sum16 + lam32 * sp1 < leaf32 + lam32 * sp0
        if not self.allow[32]:
            split32 = jnp.ones_like(split32)
        elif not (self.allow[16] or self.allow[8]):
            split32 = jnp.zeros_like(split32)
        best32 = jnp.where(split32, sum16 + lam32 * sp1,
                           leaf32 + lam32 * sp0)
        sum32 = sum4(best32, r64, c64n)
        leaf64 = per_size[64]["cost"].reshape(r64, c64n)
        split64 = sum32 + lam * sp1 < leaf64 + lam * sp0
        if not self.allow_inter[64]:
            split64 = jnp.ones_like(split64)
        e64 = jnp.repeat(jnp.repeat(
            jnp.repeat(jnp.repeat(split64, 2, 0), 2, 1), 2, 0), 2, 1)
        e32 = jnp.repeat(jnp.repeat(split32, 2, 0), 2, 1)
        sz16 = jnp.where(~e64, 64,
                         jnp.where(~e32, 32,
                                   jnp.where(split16, 8, 16)))
        return jnp.repeat(jnp.repeat(sz16, 2, 0), 2, 1).astype(jnp.int32)

    def _sel8_fn(self, per_size, size_map8):
        def to8(a, n, chan=None):
            rows, cols = self.h // n, self.w // n
            k = n // 8
            if chan is None:
                m = a.reshape(rows, cols)
            else:
                m = a.reshape(rows, cols, chan)
            return jnp.repeat(jnp.repeat(m, k, 0), k, 1)

        def sel8(key, chan=None):
            v8 = to8(per_size[8][key], 8, chan)
            v16 = to8(per_size[16][key], 16, chan)
            v32 = to8(per_size[32][key], 32, chan)
            v64 = to8(per_size[64][key], 64, chan)
            cond = (size_map8 == 8, size_map8 == 16, size_map8 == 32)
            if chan is not None:
                cond = tuple(c[..., None] for c in cond)
            return jnp.where(cond[0], v8,
                             jnp.where(cond[1], v16,
                                       jnp.where(cond[2], v32, v64)))
        return sel8

    # ------------------------------------------------------------------
    # reconstruction: batched inter leaves + wavefront intra leaves
    # ------------------------------------------------------------------

    def _inter_recon_batch(self, src_y, src_cb, src_cr, refs_y, refs_cb,
                           refs_cr, size_map8, inter8, mv8, ref8,
                           l1=None, dir8=None, mv8b=None, ref8b=None,
                           part8=None, preds=None):
        """Reconstruct every inter leaf of every size in one batch.
        With l1/dir8/mv8b/ref8b set (B slices), each block predicts
        uni-L0 / uni-L1 / exact bipred per its inter_dir.
        Returns (luma [2,Hp,Wp], chroma [4,Hc,Wc], written8)."""
        h, w = self.h, self.w
        zseed = (src_y[0, 0] * 0).astype(jnp.int32)
        luma = jnp.zeros((2, 1 + h + 64, 1 + w + 64), jnp.int32) + zseed
        chroma = jnp.zeros((4, 1 + h // 2 + 32, 1 + w // 2 + 32),
                           jnp.int32) + zseed
        written = jnp.zeros((self.r8, self.c8), bool)
        P = self.SUBPEL_PAD
        CPW = (P >> 1) + 2
        ypad = jnp.pad(refs_y, ((0, 0), (P, P), (P, P)), mode="edge")
        cbpad = jnp.pad(refs_cb, ((0, 0), (CPW, CPW), (CPW, CPW)),
                        mode="edge")
        crpad = jnp.pad(refs_cr, ((0, 0), (CPW, CPW), (CPW, CPW)),
                        mode="edge")
        if l1 is not None:
            y1pad = jnp.pad(l1[0], ((0, 0), (P, P), (P, P)), mode="edge")
            cb1pad = jnp.pad(l1[1], ((0, 0), (CPW, CPW), (CPW, CPW)),
                             mode="edge")
            cr1pad = jnp.pad(l1[2], ((0, 0), (CPW, CPW), (CPW, CPW)),
                             mode="edge")
        for n, t, tc in ((8, self.t8, self.t4), (16, self.t16, self.t8),
                         (32, self.t32, self.t16),
                         (64, self.t32, self.t16)):
            k = n // 8
            rows, cols = h // n, w // n
            nb = rows * cols
            is_leaf = (size_map8[::k, ::k] == n) & inter8[::k, ::k]
            if part8 is not None:
                # SMP CUs reconstruct in the cell-granular branch below
                is_leaf = is_leaf & (part8[::k, ::k] == 0)
            mask = is_leaf.reshape(-1)
            bid = jnp.arange(nb)
            y0 = (bid // cols) * n
            x0 = (bid % cols) * n
            mv = mv8[::k, ::k].reshape(-1, 2)
            ref = ref8[::k, ::k].reshape(-1)
            qp_y, qp_c, _ = self._qp_lam_for(n)
            if preds is not None and n in preds:
                # the DP leaf already predicted every block of this
                # size with its final motion — no second MC
                pred_y = preds[n][0]
            elif l1 is None:
                pred_y = self._mc_luma_sel(ypad, ref, mv, y0, x0, n, P)
            else:
                dirn = dir8[::k, ::k].reshape(-1)
                mvb = mv8b[::k, ::k].reshape(-1, 2)
                refb = ref8b[::k, ::k].reshape(-1)
                sel = dirn[:, None, None]
                v0 = self._mc_luma_sel(ypad, ref, mv, y0, x0, n, P,
                                       hi=True)
                v1 = self._mc_luma_sel(y1pad, refb, mvb, y0, x0, n, P,
                                       hi=True)
                pred_y = jnp.where(
                    sel == 3, self._bi_avg(v0, v1, self.maxv),
                    jnp.where(sel == 1, self._uni_round(v0, self.maxv),
                              self._uni_round(v1, self.maxv)))
            blocks, _, _ = self._blocks_of(src_y, n)
            resi = blocks - pred_y
            _, _, lam_n = self._qp_lam_for(n)
            if n == 64:       # forced TU split: four 32x32 luma TUs
                levels, r2 = self._tq_quad(resi, qp_y, True, lam=lam_n)
                cbf = jnp.bool_(True)   # per-quadrant cbf inside _tq_quad
                rec = jnp.clip(pred_y + r2, 0, self.maxv)
                lvl = levels
            else:
                levels, r2 = self._transform_quant(
                    resi, t, qp_y, n, mats=self._mats_for(n, True),
                    is_luma=True)
                levels, r2 = self._rd_zero_tu(resi, levels, r2, lam_n,
                                              n, True)
                cbf = jnp.any(levels != 0, axis=(1, 2))
                rec = jnp.clip(
                    pred_y + jnp.where(cbf[:, None, None], r2, 0),
                    0, self.maxv)
                lvl = jnp.where(cbf[:, None, None], levels, 0)
            luma = self._batch_scatter(luma, 0, rec, y0, x0, n, mask)
            luma = self._batch_scatter(luma, 1, lvl, y0, x0, n, mask)
            nc = n // 2
            cy0 = (bid // cols) * nc
            cx0 = (bid % cols) * nc
            cpads1 = (cb1pad, cr1pad) if l1 is not None else (None, None)
            for ci, (cpad, srcp) in enumerate(((cbpad, src_cb),
                                               (crpad, src_cr))):
                if preds is not None and n in preds:
                    cpred = preds[n][1 + ci]
                elif l1 is None:
                    cpred = self._mc_chroma_sel(cpad, ref, mv, cy0, cx0,
                                                nc, CPW)
                else:
                    w0 = self._mc_chroma_sel(cpad, ref, mv, cy0, cx0,
                                             nc, CPW, hi=True)
                    w1 = self._mc_chroma_sel(cpads1[ci], refb, mvb, cy0,
                                             cx0, nc, CPW, hi=True)
                    cpred = jnp.where(
                        sel == 3, self._bi_avg(w0, w1, self.maxv),
                        jnp.where(sel == 1,
                                  self._uni_round(w0, self.maxv),
                                  self._uni_round(w1, self.maxv)))
                cblocks, _, _ = self._blocks_of(srcp, nc)
                cresi = cblocks - cpred
                if nc == 32:  # four 16x16 chroma TUs
                    clev, cr2 = self._tq_quad(cresi, qp_c, False,
                                              lam=lam_n)
                    crec = jnp.clip(cpred + cr2, 0, self.maxv)
                    clvl = clev
                else:
                    clev, cr2 = self._transform_quant(
                        cresi, tc, qp_c, nc,
                        mats=self._mats_for(nc, False), is_luma=False)
                    clev, cr2 = self._rd_zero_tu(cresi, clev, cr2,
                                                 lam_n, nc, False)
                    ccbf = jnp.any(clev != 0, axis=(1, 2))
                    crec = jnp.clip(
                        cpred + jnp.where(ccbf[:, None, None], cr2, 0),
                        0, self.maxv)
                    clvl = jnp.where(ccbf[:, None, None], clev, 0)
                chroma = self._batch_scatter(chroma, ci, crec, cy0, cx0,
                                             nc, mask)
                chroma = self._batch_scatter(chroma, 2 + ci, clvl, cy0,
                                             cx0, nc, mask)
            wr = jnp.repeat(jnp.repeat(is_leaf, k, 0), k, 1)
            written = written | wr
        if part8 is not None:
            # SMP/AMP CUs: cell-granular MC (every 8x8 luma / 4x4 chroma
            # cell predicts with its own PU's motion — pointwise
            # translation makes this identical to whole-PU MC) followed
            # by the forced-split T/Q per CU
            for n in (16, 32):
                k = n // 8
                rows, cols = h // n, w // n
                nb = rows * cols
                is_smp = ((size_map8[::k, ::k] == n) & inter8[::k, ::k]
                          & (part8[::k, ::k] != 0))
                mask = is_smp.reshape(-1)
                bid = jnp.arange(nb)
                y0 = (bid // cols) * n
                x0 = (bid % cols) * n
                qp_y, qp_c, lam_n = self._qp_lam_for(n)

                def cu_cells(m8, chan=None):
                    # [r8, c8(,ch)] -> per-CU cell grids [nb, k, k(,ch)]
                    if chan is None:
                        v = m8.reshape(rows, k, cols, k)
                        return jnp.moveaxis(v, 1, 2).reshape(nb, k, k)
                    v = m8.reshape(rows, k, cols, k, chan)
                    return jnp.moveaxis(v, 1, 2).reshape(nb, k, k, chan)

                mvc = cu_cells(mv8, 2).reshape(nb * k * k, 2)
                refc = cu_cells(ref8).reshape(nb * k * k)
                dy = (jnp.arange(k * k) // k) * 8
                dx = (jnp.arange(k * k) % k) * 8
                y0c = jnp.repeat(y0, k * k) + jnp.tile(dy, nb)
                x0c = jnp.repeat(x0, k * k) + jnp.tile(dx, nb)
                pred_c8 = self._mc_luma_sel(ypad, refc, mvc, y0c, x0c,
                                            8, P)

                def cells_to_cu(p, cell):
                    v = p.reshape(nb, k, k, cell, cell)
                    v = jnp.moveaxis(v, 2, 3)
                    return v.reshape(nb, k * cell, k * cell)

                pred_y = cells_to_cu(pred_c8, 8)
                blocks, _, _ = self._blocks_of(src_y, n)
                resi = blocks - pred_y
                levels, r2 = self._tq_quad(resi, qp_y, True, lam=lam_n)
                rec = jnp.clip(pred_y + r2, 0, self.maxv)
                luma = self._batch_scatter(luma, 0, rec, y0, x0, n, mask)
                luma = self._batch_scatter(luma, 1, levels, y0, x0, n,
                                           mask)
                nc = n // 2
                cy0 = (bid // cols) * nc
                cx0 = (bid % cols) * nc
                cy0c = jnp.repeat(cy0, k * k) + jnp.tile(dy // 2, nb)
                cx0c = jnp.repeat(cx0, k * k) + jnp.tile(dx // 2, nb)
                for ci, (cpad, srcp) in enumerate(((cbpad, src_cb),
                                                   (crpad, src_cr))):
                    pc4 = self._mc_chroma_sel(cpad, refc, mvc, cy0c,
                                              cx0c, 4, CPW)
                    cpred = cells_to_cu(pc4, 4)
                    cblocks, _, _ = self._blocks_of(srcp, nc)
                    cresi = cblocks - cpred
                    clev, cr2 = self._tq_quad(cresi, qp_c, False,
                                              lam=lam_n)
                    crec = jnp.clip(cpred + cr2, 0, self.maxv)
                    chroma = self._batch_scatter(chroma, ci, crec, cy0,
                                                 cx0, nc, mask)
                    chroma = self._batch_scatter(chroma, 2 + ci, clev,
                                                 cy0, cx0, nc, mask)
                wr = jnp.repeat(jnp.repeat(is_smp, k, 0), k, 1)
                written = written | wr
        return luma, chroma, written

    @staticmethod
    def _batch_scatter(stack, plane_id, blocks, y0, x0, n, mask):
        """Scatter [B, n, n] blocks into stack[plane_id] at +1 offset,
        dropping masked-out blocks."""
        _, hh, ww = stack.shape
        yy = (y0 + 1)[:, None, None] + jnp.arange(n)[None, :, None]
        xx = (x0 + 1)[:, None, None] + jnp.arange(n)[None, None, :]
        fi = plane_id * hh * ww + yy * ww + xx
        fi = jnp.where(mask[:, None, None], fi, stack.size)
        return stack.reshape(-1).at[fi.reshape(-1)].set(
            blocks.astype(stack.dtype).reshape(-1),
            mode="drop").reshape(stack.shape)

    # ------------------------------------------------------------------
    # deblocking boundary strengths from decision maps (spec 8.7.2.4)
    # ------------------------------------------------------------------

    def _edge_maps_inter(self, size_map8, inter8, mv8, ref_poc8, nz8,
                         part8=None):
        h, w = self.h, self.w
        k = size_map8 >> 3
        c = jnp.arange(self.c8)[None, :]
        r = jnp.arange(self.r8)[:, None]
        ver_edge = ((c & (k - 1)) == 0) & (c > 0)
        hor_edge = ((r & (k - 1)) == 0) & (r > 0)
        # internal TU32 edges of 64 CUs (forced transform split): same
        # PU both sides, so bs() reduces to the cbf rule there
        ver_edge = ver_edge | ((size_map8 == 64) & ((c & 7) == 4))
        hor_edge = hor_edge | ((size_map8 == 64) & ((r & 7) == 4))
        if part8 is not None:
            # SMP/AMP: forced TU-split edges at half-CU offsets plus the
            # asymmetric PU edges at quarter offsets (8.7.2 deblocks PU
            # and TU boundaries alike; bs() sees per-PU motion via the
            # merged per-cell mv maps)
            smp = part8 != 0
            h2 = k >> 1
            q4 = k >> 2
            co = c % jnp.maximum(k, 1)
            ro = r % jnp.maximum(k, 1)
            ver_edge = ver_edge | (smp & (co == h2) & (h2 > 0))
            hor_edge = hor_edge | (smp & (ro == h2) & (h2 > 0))
            hor_edge = hor_edge | ((part8 == 3) & (ro == q4) & (q4 > 0))
            hor_edge = hor_edge | ((part8 == 4) & (ro == k - q4))
            ver_edge = ver_edge | ((part8 == 5) & (co == q4) & (q4 > 0))
            ver_edge = ver_edge | ((part8 == 6) & (co == k - q4))

        def bs(cur, nb):
            """cur/nb: dicts of per-cell maps for the two sides."""
            either_intra = cur["intra"] | nb["intra"]
            nz = cur["nz"] | nb["nz"]
            diff_ref = cur["poc"] != nb["poc"]
            dmv = (jnp.abs(cur["mvx"] - nb["mvx"]) >= 4) | \
                (jnp.abs(cur["mvy"] - nb["mvy"]) >= 4)
            one = nz | diff_ref | dmv
            return jnp.where(either_intra, 2, jnp.where(one, 1, 0))

        maps = dict(intra=~inter8, nz=nz8, poc=ref_poc8,
                    mvx=mv8[:, :, 0], mvy=mv8[:, :, 1])
        left = {kk: jnp.pad(v[:, :-1], ((0, 0), (1, 0)),
                            constant_values=(0,))
                for kk, v in maps.items()}
        up = {kk: jnp.pad(v[:-1, :], ((1, 0), (0, 0)),
                          constant_values=(0,))
              for kk, v in maps.items()}
        bs_v8 = jnp.where(ver_edge, bs(maps, left), 0)
        bs_h8 = jnp.where(hor_edge, bs(maps, up), 0)
        # expand to the deblock grid: ver [H/4, W/8], hor [H/8, W/4]
        bs_ver = jnp.repeat(bs_v8, 2, axis=0).astype(jnp.int32)
        bs_hor = jnp.repeat(bs_h8, 2, axis=1).astype(jnp.int32)
        return bs_ver, bs_hor

    def _edge_maps_inter_b(self, size_map8, inter8, dir8, mv8, mv8b,
                           poc8_0, poc8_1, nz8):
        """Deblocking BS for B slices (spec 8.7.2.4 full two-list rule,
        same matching logic as the validated 16-grid path)."""
        k = size_map8 >> 3
        c = jnp.arange(self.c8)[None, :]
        r = jnp.arange(self.r8)[:, None]
        ver_edge = ((c & (k - 1)) == 0) & (c > 0)
        hor_edge = ((r & (k - 1)) == 0) & (r > 0)
        ver_edge = ver_edge | ((size_map8 == 64) & ((c & 7) == 4))
        hor_edge = hor_edge | ((size_map8 == 64) & ((r & 7) == 4))
        use0 = inter8 & ((dir8 & 1) != 0)
        use1 = inter8 & ((dir8 & 2) != 0)
        maps = dict(
            intra=~inter8, nz=nz8,
            p0=jnp.where(use0, poc8_0, NO_REF_POC),
            p1=jnp.where(use1, poc8_1, NO_REF_POC),
            m0x=jnp.where(use0, mv8[:, :, 0], 0),
            m0y=jnp.where(use0, mv8[:, :, 1], 0),
            m1x=jnp.where(use1, mv8b[:, :, 0], 0),
            m1y=jnp.where(use1, mv8b[:, :, 1], 0),
            cnt=use0.astype(jnp.int32) + use1.astype(jnp.int32))

        def shift_left(v):
            return jnp.pad(v[:, :-1], ((0, 0), (1, 0)),
                           constant_values=(0,))

        def shift_up(v):
            return jnp.pad(v[:-1, :], ((1, 0), (0, 0)),
                           constant_values=(0,))

        def bs(cur, nb):
            def far(ax, ay, bx, by):
                return (jnp.abs(ax - bx) >= 4) | (jnp.abs(ay - by) >= 4)
            eq_s = (cur["p0"] == nb["p0"]) & (cur["p1"] == nb["p1"])
            eq_c = (cur["p0"] == nb["p1"]) & (cur["p1"] == nb["p0"])
            d_s = far(cur["m0x"], cur["m0y"], nb["m0x"], nb["m0y"]) | \
                far(cur["m1x"], cur["m1y"], nb["m1x"], nb["m1y"])
            d_c = far(cur["m0x"], cur["m0y"], nb["m1x"], nb["m1y"]) | \
                far(cur["m1x"], cur["m1y"], nb["m0x"], nb["m0y"])
            ok = (eq_s & ~d_s) | (eq_c & ~d_c)
            one = cur["nz"] | nb["nz"] | (cur["cnt"] != nb["cnt"]) | ~ok
            return jnp.where(cur["intra"] | nb["intra"], 2,
                             jnp.where(one, 1, 0))

        left = {kk: shift_left(v) for kk, v in maps.items()}
        up = {kk: shift_up(v) for kk, v in maps.items()}
        bs_v8 = jnp.where(ver_edge, bs(maps, left), 0)
        bs_h8 = jnp.where(hor_edge, bs(maps, up), 0)
        bs_ver = jnp.repeat(bs_v8, 2, axis=0).astype(jnp.int32)
        bs_hor = jnp.repeat(bs_h8, 2, axis=1).astype(jnp.int32)
        return bs_ver, bs_hor

    def _nz8(self, lvl_y, size_map8, part8=None):
        """Per-8-cell luma-TU cbf map (any nonzero level in the leaf)."""
        nz8 = jnp.zeros((self.r8, self.c8), bool)
        cell_any = (lvl_y.reshape(self.r8, 8, self.c8, 8) != 0) \
            .any(axis=(1, 3))
        for s in self.SIZES:
            k = s // 8
            rs, cs = self.r8 // k, self.c8 // k
            blk = cell_any.reshape(rs, k, cs, k).any(axis=(1, 3))
            blk8 = jnp.repeat(jnp.repeat(blk, k, 0), k, 1)
            nz8 = jnp.where(size_map8 == s, blk8, nz8)
        # 64 CUs carry four 32x32 TUs: cbf at TU (4-cell) granularity
        blk = cell_any.reshape(self.r8 // 4, 4, self.c8 // 4, 4) \
            .any(axis=(1, 3))
        blk8 = jnp.repeat(jnp.repeat(blk, 4, 0), 4, 1)
        nz8 = jnp.where(size_map8 == 64, blk8, nz8)
        if part8 is not None:
            # SMP CUs carry four half-size TUs: cbf at TU granularity
            smp = part8 != 0
            nz8 = jnp.where(smp & (size_map8 == 16), cell_any, nz8)
            blk2 = cell_any.reshape(self.r8 // 2, 2, self.c8 // 2, 2) \
                .any(axis=(1, 3))
            blk2 = jnp.repeat(jnp.repeat(blk2, 2, 0), 2, 1)
            nz8 = jnp.where(smp & (size_map8 == 32), blk2, nz8)
        return nz8

    # ------------------------------------------------------------------
    # full frame
    # ------------------------------------------------------------------

    def _inter_full_impl(self, src_y_u8, src_cb_u8, src_cr_u8,
                         refs_y_u8, refs_cb_u8, refs_cr_u8, ref_pocs):
        src_y = src_y_u8.astype(jnp.int32)
        src_cb = src_cb_u8.astype(jnp.int32)
        src_cr = src_cr_u8.astype(jnp.int32)
        refs_y = refs_y_u8.astype(jnp.int32)
        refs_cb = refs_cb_u8.astype(jnp.int32)
        refs_cr = refs_cr_u8.astype(jnp.int32)
        lam = self.lam2[0]
        (size_map8, mode_map8, inter8, mv8, ref8,
         part8, leaf_preds) = self._partition_inter(
            src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr, lam)
        init = self._inter_recon_batch(src_y, src_cb, src_cr, refs_y,
                                       refs_cb, refs_cr, size_map8,
                                       inter8, mv8, ref8, part8=part8,
                                       preds=leaf_preds)
        # the P/B writers do not signal transform_skip on intra cells
        # (no 4x4 luma TUs there); keep the device recon in lockstep
        saved_ts = self.trskip
        self.trskip = False
        try:
            state = self._recon_md(src_y, src_cb, src_cr, size_map8,
                                   mode_map8, init_state=init,
                                   exclude8=init[2])
        finally:
            self.trskip = saved_ts
        luma, chroma, _, _ts = state
        h, w = self.h, self.w
        ry = luma[0, 1:1 + h, 1:1 + w]
        rcb = chroma[0, 1:1 + h // 2, 1:1 + w // 2]
        rcr = chroma[1, 1:1 + h // 2, 1:1 + w // 2]
        lvl_y = luma[1, 1:1 + h, 1:1 + w]
        lvl_cb = chroma[2, 1:1 + h // 2, 1:1 + w // 2]
        lvl_cr = chroma[3, 1:1 + h // 2, 1:1 + w // 2]
        ref_poc8 = jnp.where(inter8, ref_pocs[ref8], NO_REF_POC)
        if self.deblock:
            from ..ops.deblock_jax import deblock_frame_jax
            nz8 = self._nz8(lvl_y, size_map8, part8=part8)
            bs_ver, bs_hor = self._edge_maps_inter(
                size_map8, inter8, mv8, ref_poc8, nz8, part8=part8)
            ry, rcb, rcr = deblock_frame_jax(
                ry, rcb, rcr, bs_ver, bs_hor, self.qp2[0], self.qp2[1],
                self.qp2[1], self.deblock_beta, self.deblock_tc,
                bit_depth=self.bd)
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
            "inter8": inter8,
            "mv8": mv8,
            "ref8": ref8.astype(jnp.int8),
            **({"part8": part8.astype(jnp.int8)} if part8 is not None
               else {}),
            "levels16_y": lvl_y.astype(jnp.int16),
            "levels16_cb": lvl_cb.astype(jnp.int16),
            "levels16_cr": lvl_cr.astype(jnp.int16),
            "hash": jnp.stack([cksum(ry, self.hash_mask_y),
                               cksum(rcb, self.hash_mask_c),
                               cksum(rcr, self.hash_mask_c)]),
            "sse": jnp.stack([sse(ry, src_y), sse(rcb, src_cb),
                              sse(rcr, src_cr)]),
            **sao_out,
        }
        ovf = jnp.bool_(False)
        for name, lv in (("y", lvl_y), ("cb", lvl_cb), ("cr", lvl_cr)):
            mask_u8, vals, o = self._sparse_pack(lv)
            out["lmask_" + name] = mask_u8
            out["lvals_" + name] = vals
            ovf = ovf | o
        out["lvl_ovf"] = ovf
        out["mv8"] = out["mv8"].astype(jnp.int16)   # qpel |mv| <= 512
        return self._pack_host_outputs(out)

    def _inter_full_b_impl(self, src_y_u8, src_cb_u8, src_cr_u8,
                           l0_y_u8, l0_cb_u8, l0_cr_u8,
                           l1_y_u8, l1_cb_u8, l1_cr_u8,
                           l0_pocs, l1_pocs):
        src_y = src_y_u8.astype(jnp.int32)
        src_cb = src_cb_u8.astype(jnp.int32)
        src_cr = src_cr_u8.astype(jnp.int32)
        l0 = (l0_y_u8.astype(jnp.int32), l0_cb_u8.astype(jnp.int32),
              l0_cr_u8.astype(jnp.int32))
        l1 = (l1_y_u8.astype(jnp.int32), l1_cb_u8.astype(jnp.int32),
              l1_cr_u8.astype(jnp.int32))
        lam = self.lam2[0]
        (size_map8, mode_map8, inter8, dir8, mv8, ref8, mv8b,
         ref8b, leaf_preds) = self._partition_inter_b(
            src_y, src_cb, src_cr, l0, l1, lam)
        init = self._inter_recon_batch(src_y, src_cb, src_cr, l0[0],
                                       l0[1], l0[2], size_map8, inter8,
                                       mv8, ref8, l1=l1, dir8=dir8,
                                       mv8b=mv8b, ref8b=ref8b,
                                       preds=leaf_preds)
        # the P/B writers do not signal transform_skip on intra cells
        # (no 4x4 luma TUs there); keep the device recon in lockstep
        saved_ts = self.trskip
        self.trskip = False
        try:
            state = self._recon_md(src_y, src_cb, src_cr, size_map8,
                                   mode_map8, init_state=init,
                                   exclude8=init[2])
        finally:
            self.trskip = saved_ts
        luma, chroma, _, _ts = state
        h, w = self.h, self.w
        ry = luma[0, 1:1 + h, 1:1 + w]
        rcb = chroma[0, 1:1 + h // 2, 1:1 + w // 2]
        rcr = chroma[1, 1:1 + h // 2, 1:1 + w // 2]
        lvl_y = luma[1, 1:1 + h, 1:1 + w]
        lvl_cb = chroma[2, 1:1 + h // 2, 1:1 + w // 2]
        lvl_cr = chroma[3, 1:1 + h // 2, 1:1 + w // 2]
        if self.deblock:
            from ..ops.deblock_jax import deblock_frame_jax
            nz8 = self._nz8(lvl_y, size_map8)
            bs_ver, bs_hor = self._edge_maps_inter_b(
                size_map8, inter8, dir8, mv8, mv8b,
                l0_pocs[ref8], l1_pocs[ref8b], nz8)
            ry, rcb, rcr = deblock_frame_jax(
                ry, rcb, rcr, bs_ver, bs_hor, self.qp2[0], self.qp2[1],
                self.qp2[1], self.deblock_beta, self.deblock_tc,
                bit_depth=self.bd)
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
            "inter8": inter8,
            "dir8": dir8.astype(jnp.int8),
            "mv8": mv8.astype(jnp.int16),
            "ref8": ref8.astype(jnp.int8),
            "mv8b": mv8b.astype(jnp.int16),
            "ref8b": ref8b.astype(jnp.int8),
            "levels16_y": lvl_y.astype(jnp.int16),
            "levels16_cb": lvl_cb.astype(jnp.int16),
            "levels16_cr": lvl_cr.astype(jnp.int16),
            "hash": jnp.stack([cksum(ry, self.hash_mask_y),
                               cksum(rcb, self.hash_mask_c),
                               cksum(rcr, self.hash_mask_c)]),
            "sse": jnp.stack([sse(ry, src_y), sse(rcb, src_cb),
                              sse(rcr, src_cr)]),
            **sao_out,
        }
        ovf = jnp.bool_(False)
        for name, lv in (("y", lvl_y), ("cb", lvl_cb), ("cr", lvl_cr)):
            mask_u8, vals, o = self._sparse_pack(lv)
            out["lmask_" + name] = mask_u8
            out["lvals_" + name] = vals
            ovf = ovf | o
        out["lvl_ovf"] = ovf
        return self._pack_host_outputs(out)

    # ------------------------------------------------------------------
    # host interface
    # ------------------------------------------------------------------

    def submit_inter(self, src_y, src_cb, src_cr, refs_y, refs_cb,
                     refs_cr, ref_pocs, qp: int | None = None):
        """refs_*: lists of reference planes (numpy or device), newest
        first, padded/truncated to n_refs by repeating the last."""
        consts = self._consts_for(qp)
        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16

        def stack(planes):
            ps = list(planes)[:self.n_refs]
            while len(ps) < self.n_refs:
                ps.append(ps[-1])
            return jnp.stack([jnp.asarray(p, pix_t) for p in ps])

        pocs = list(ref_pocs)[:self.n_refs]
        while len(pocs) < self.n_refs:
            pocs.append(pocs[-1])
        out = self._full_inter(consts,
                               jnp.asarray(src_y, pix_t),
                               jnp.asarray(src_cb, pix_t),
                               jnp.asarray(src_cr, pix_t),
                               stack(refs_y), stack(refs_cb),
                               stack(refs_cr),
                               jnp.asarray(pocs, jnp.int32))
        for k, v in out.items():
            if k == "hostbuf" or k.startswith(("lmask_", "lvals_")):
                try:
                    v.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
        return out

    def submit_inter_b(self, src_y, src_cb, src_cr, l0, l1, l0_pocs,
                       l1_pocs, qp: int | None = None):
        """B frame on the quadtree path: l0/l1 = ([y..], [cb..], [cr..])
        per-list reference stacks (numpy or device), padded to n_refs_b
        by repeating the last entry."""
        consts = self._consts_for(qp)
        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16
        K = self.n_refs_b

        def stack(planes):
            ps = list(planes)[:K]
            while len(ps) < K:
                ps.append(ps[-1])
            return jnp.stack([jnp.asarray(p, pix_t) for p in ps])

        def pocs(vals):
            vs = list(vals)[:K]
            while len(vs) < K:
                vs.append(vs[-1])
            return jnp.asarray(vs, jnp.int32)

        out = self._full_inter_b(
            consts, jnp.asarray(src_y, pix_t),
            jnp.asarray(src_cb, pix_t), jnp.asarray(src_cr, pix_t),
            stack(l0[0]), stack(l0[1]), stack(l0[2]),
            stack(l1[0]), stack(l1[1]), stack(l1[2]),
            pocs(l0_pocs), pocs(l1_pocs))
        for k, v in out.items():
            if k == "hostbuf" or k.startswith(("lmask_", "lvals_")):
                try:
                    v.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass
        return out

    def materialize(self, out):
        res = super().materialize(out)
        for k in ("inter8", "mv8", "ref8", "dir8", "mv8b", "ref8b",
                  "part8"):
            if k in res:
                res[k] = np.asarray(res[k])
        if "inter8" in res:
            res["inter8"] = res["inter8"].astype(bool)
            res["mv8"] = res["mv8"].astype(np.int32)
        if "mv8b" in res:
            res["mv8b"] = res["mv8b"].astype(np.int32)
        return res
