"""TPU inter (low-delay P) frame pipeline.

Extends the intra pipeline with:
- batched full-search integer motion estimation over the previous
  reconstruction (lax.scan over rows of the search window; every block of
  the frame searched in parallel),
- batched motion compensation (integer luma; chroma half-pel via the 4-tap
  filter, all four phase variants computed and selected per block),
- per-block inter/intra decision by SATD,
- the wavefront reconstruction pass extended to consume inter predictions
  for inter blocks (intra blocks still predict from reconstructed
  neighbours).

Reference parity: replaces kvazaar's hexagon/TZ pattern search
(src/search_inter.c:487-973) with an exhaustive batched sweep — on the MXU
the exhaustive grid is cheaper than sequential pattern refinement — and the
ipol kernels (src/strategies/avx2/ipol-avx2.c) with gather/conv variants.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.mc import CHROMA_FILTERS, LUMA_FILTERS
from .intra_pipeline import CHROMA_N, LUMA_N, IntraPipeline

ME_RANGE = 8  # integer-pel exhaustive window [-R, R]
SUBPEL_PAD = ME_RANGE + 3  # integer range + 8-tap reach (3 left)


class InterPipeline(IntraPipeline):
    """Adds inter tools to the intra pipeline (same block grid)."""

    REF_PENALTY = 8   # SATD units per ref index (ref_idx signalling cost)
    BI_PEN_BINS = 12.0  # second-list signalling cost in CABAC bins

    def __init__(self, height: int, width: int, qp: int,
                 n_refs: int = 1, deblock: bool = False,
                 deblock_beta: int = 0, deblock_tc: int = 0,
                 sao: str = "off", sign_hiding: bool = False,
                 rdoq: bool = False) -> None:
        super().__init__(height, width, qp, deblock=deblock,
                         deblock_beta=deblock_beta, deblock_tc=deblock_tc,
                         sao=sao, sign_hiding=sign_hiding, rdoq=rdoq)
        self.n_refs = max(1, n_refs)
        self._inter = jax.jit(self._with_consts(self._inter_impl))
        self._inter_b = jax.jit(self._with_consts(self._inter_b_impl))

    # -- motion estimation ---------------------------------------------------

    def _me_impl(self, src_blocks, prev_pad):
        """Full-search integer ME. src_blocks [B,16,16]; prev_pad is the
        previous recon padded by ME_RANGE on all sides.
        Returns (mv [B,2] in pels, best_sad [B])."""
        n = LUMA_N
        R = ME_RANGE
        y0 = self.b_r * n
        x0 = self.b_c * n

        def row_scan(carry, dy):
            best_sad, best_mv = carry
            # candidate block rows for this dy, all dx at once:
            # gather [B, 16, 16 + 2R]
            iy = (y0 + dy)[:, None] + jnp.arange(n)[None, :]
            ix = x0[:, None] + jnp.arange(n + 2 * R)[None, :]
            strip = prev_pad[iy[:, :, None], ix[:, None, :]]
            # SAD for each dx via sliding windows
            def dx_sad(dx):
                cand = jax.lax.dynamic_slice_in_dim(strip, dx, n, axis=2)
                return jnp.abs(cand - src_blocks).sum(axis=(1, 2))
            sads = jnp.stack([dx_sad(dx) for dx in range(2 * R + 1)],
                             axis=1)  # [B, 2R+1]
            dx_best = jnp.argmin(sads, axis=1)
            sad_best = jnp.take_along_axis(sads, dx_best[:, None],
                                           axis=1)[:, 0]
            better = sad_best < best_sad
            mv = jnp.stack([dx_best.astype(jnp.int32) - R,
                            jnp.full_like(dx_best, dy,
                                          dtype=jnp.int32) - R], axis=1)
            best_mv = jnp.where(better[:, None], mv, best_mv)
            best_sad = jnp.where(better, sad_best, best_sad)
            return (best_sad, best_mv), None

        init = (jnp.full((self.n_blocks,), 1 << 30, jnp.int32),
                jnp.zeros((self.n_blocks, 2), jnp.int32))
        (best_sad, best_mv), _ = jax.lax.scan(
            row_scan, init, jnp.arange(2 * R + 1))
        return best_mv, best_sad

    # -- motion compensation ----------------------------------------------------

    def _mc_luma_qpel(self, ypad, mv, ridx=None, hi=False):
        """Exact quarter-pel luma MC for all blocks; mv in qpel units.
        ypad: previous recon padded by SUBPEL_PAD, either one picture
        [H,W] or a reference stack [K,H,W] indexed per block by ridx.
        Returns [B, 16, 16]; hi=True returns the 14-bit intermediate
        (spec 8.5.3.3.3: bi-prediction averages two 14-bit signals)."""
        n = LUMA_N
        P = SUBPEL_PAD
        y0 = self.b_r * n
        x0 = self.b_c * n
        ix = mv[:, 0] >> 2
        iy = mv[:, 1] >> 2
        fx = mv[:, 0] & 3
        fy = mv[:, 1] & 3
        wy = (y0 + iy + P - 3)[:, None] + jnp.arange(n + 7)[None, :]
        wx = (x0 + ix + P - 3)[:, None] + jnp.arange(n + 7)[None, :]
        # clamp = the spec's edge extension; JAX would WRAP negative
        # indices to the opposite picture edge
        wy = jnp.clip(wy, 0, ypad.shape[-2] - 1)
        wx = jnp.clip(wx, 0, ypad.shape[-1] - 1)
        if ypad.ndim == 3:
            win = ypad[ridx[:, None, None], wy[:, :, None], wx[:, None, :]]
        else:
            win = ypad[wy[:, :, None], wx[:, None, :]]  # [B, n+7, n+7]
        fmat = jnp.asarray(LUMA_FILTERS)  # [4, 8]
        cx = jnp.take(fmat, fx, axis=0)  # [B, 8]
        cy = jnp.take(fmat, fy, axis=0)
        h14 = sum(cx[:, k, None, None] * win[:, :, k:k + n]
                  for k in range(8))  # [B, n+7, n]
        v = sum(cy[:, k, None, None] * h14[:, k:k + n, :]
                for k in range(8)) >> 6
        if hi:
            return v
        return jnp.clip((v + 32) >> 6, 0, 255)

    def _mc_chroma_qpel(self, cpad, mv, cy0, cx0, ridx=None, hi=False):
        """Exact eighth-pel chroma MC; mv in luma qpel units (= chroma
        eighth-pel). cpad padded by SUBPEL_PAD//2+2; [H,W] or [K,H,W]
        with per-block ridx. hi=True: 14-bit intermediate for bipred."""
        nc = CHROMA_N
        CP = (SUBPEL_PAD >> 1) + 2
        ix = mv[:, 0] >> 3
        iy = mv[:, 1] >> 3
        fx = mv[:, 0] & 7
        fy = mv[:, 1] & 7
        wy = (cy0 + iy + CP - 1)[:, None] + jnp.arange(nc + 3)[None, :]
        wx = (cx0 + ix + CP - 1)[:, None] + jnp.arange(nc + 3)[None, :]
        wy = jnp.clip(wy, 0, cpad.shape[-2] - 1)
        wx = jnp.clip(wx, 0, cpad.shape[-1] - 1)
        if cpad.ndim == 3:
            win = cpad[ridx[:, None, None], wy[:, :, None], wx[:, None, :]]
        else:
            win = cpad[wy[:, :, None], wx[:, None, :]]
        fmat = jnp.asarray(CHROMA_FILTERS)  # [8, 4]
        cxf = jnp.take(fmat, fx, axis=0)
        cyf = jnp.take(fmat, fy, axis=0)
        h14 = sum(cxf[:, k, None, None] * win[:, :, k:k + nc]
                  for k in range(4))
        v = sum(cyf[:, k, None, None] * h14[:, k:k + nc, :]
                for k in range(4)) >> 6
        if hi:
            return v
        return jnp.clip((v + 32) >> 6, 0, 255)

    def _mc_blocks(self, prevs_y, prevs_cb, prevs_cr, mv_qpel, ridx,
                   hi=False):
        """Prediction blocks for arbitrary quarter-pel MVs from a
        reference stack [K,H,W] with per-block reference choice."""
        sp = ((0, 0), (SUBPEL_PAD, SUBPEL_PAD), (SUBPEL_PAD, SUBPEL_PAD))
        ypad = jnp.pad(prevs_y, sp, mode="edge")
        pred_y = self._mc_luma_qpel(ypad, mv_qpel, ridx, hi=hi)
        CP = (SUBPEL_PAD >> 1) + 2
        nc = CHROMA_N
        cx0 = self.b_c * nc
        cy0 = self.b_r * nc
        cp = ((0, 0), (CP, CP), (CP, CP))
        cbpad = jnp.pad(prevs_cb, cp, mode="edge")
        crpad = jnp.pad(prevs_cr, cp, mode="edge")
        pred_cb = self._mc_chroma_qpel(cbpad, mv_qpel, cy0, cx0, ridx,
                                       hi=hi)
        pred_cr = self._mc_chroma_qpel(crpad, mv_qpel, cy0, cx0, ridx,
                                       hi=hi)
        return pred_y, pred_cb, pred_cr

    def _subpel_refine(self, src_blocks, ypad, mv_int):
        """Half- then quarter-pel refinement around the integer MV by
        SATD (kvazaar search_frac analog, batched over all blocks)."""
        mv = mv_int * 4
        best = self._satd8(src_blocks - self._mc_luma_qpel(ypad, mv))
        for step in (2, 1):
            for (dx, dy) in ((-1, 0), (1, 0), (0, -1), (0, 1),
                             (-1, -1), (1, -1), (-1, 1), (1, 1)):
                cand = mv + jnp.array([dx * step, dy * step], jnp.int32)
                # clamp so the interpolation window stays inside the pad
                cand = jnp.clip(cand, -4 * ME_RANGE, 4 * ME_RANGE)
                cost = self._satd8(src_blocks
                                   - self._mc_luma_qpel(ypad, cand))
                better = cost < best
                mv = jnp.where(better[:, None], cand, mv)
                best = jnp.where(better, cost, best)
        return mv, best

    # -- full inter frame step    # -- full inter frame step ---------------------------------------------------

    def _best_uni(self, src_blocks, prevs_y, n_refs):
        """Best (mv qpel, ref_idx, satd) across a reference stack
        [K, H, W]: integer full search + subpel refinement per ref, with
        a ref_idx signalling penalty so duplicated padding refs at higher
        indices are never selected."""
        best_cost = jnp.full((self.n_blocks,), 1 << 30, jnp.int32)
        mv = jnp.zeros((self.n_blocks, 2), jnp.int32)
        ref_idx = jnp.zeros((self.n_blocks,), jnp.int32)
        satd_best = best_cost
        for k in range(n_refs):
            prev_pad = jnp.pad(prevs_y[k], ME_RANGE, mode="edge")
            mv_int, _ = self._me_impl(src_blocks, prev_pad)
            ypad_k = jnp.pad(prevs_y[k], SUBPEL_PAD, mode="edge")
            mv_k, satd_k = self._subpel_refine(src_blocks, ypad_k, mv_int)
            cost_k = satd_k + self.REF_PENALTY * k
            better = cost_k < best_cost
            best_cost = jnp.where(better, cost_k, best_cost)
            satd_best = jnp.where(better, satd_k, satd_best)
            mv = jnp.where(better[:, None], mv_k, mv)
            ref_idx = jnp.where(better, k, ref_idx)
        return mv, ref_idx, satd_best

    def _intra_candidate(self, src_y, src_blocks):
        """Batched intra candidate: (modes, satd) from source refs."""
        n = LUMA_N
        modes = self._search_impl(src_y)
        refs = self._gather_search_refs(src_y)
        gsel = jnp.take(self.g16, modes, axis=0)
        filt = (refs @ self.f16.T + 2) >> 2
        both = jnp.concatenate([refs, filt], axis=1)
        ipred = (jnp.einsum("lpr,lr->lp", gsel, both,
                            preferred_element_type=jnp.int32) + 16) >> 5
        dc = self._dc_pred(refs, n, True)
        ipred = jnp.where((modes == 1)[:, None], dc, ipred)
        satd_intra = self._satd8(
            src_blocks - ipred.reshape(self.n_blocks, n, n))
        return modes, satd_intra

    def _inter_impl(self, src_y, src_cb, src_cr, prevs_y, prevs_cb,
                    prevs_cr):
        """prevs_* are reference stacks [K, H(/2), W(/2)], newest first."""
        src_y = src_y.astype(jnp.int32)
        src_cb = src_cb.astype(jnp.int32)
        src_cr = src_cr.astype(jnp.int32)
        prevs_y = prevs_y.astype(jnp.int32)
        prevs_cb = prevs_cb.astype(jnp.int32)
        prevs_cr = prevs_cr.astype(jnp.int32)
        n = LUMA_N
        src_blocks = jnp.moveaxis(
            src_y.reshape(self.rows, n, self.cols, n), 1, 2).reshape(
            self.n_blocks, n, n).astype(jnp.int32)
        mv, ref_idx, satd_inter = self._best_uni(src_blocks, prevs_y,
                                                 self.n_refs)
        pred_y, pred_cb, pred_cr = self._mc_blocks(
            prevs_y, prevs_cb, prevs_cr, mv, ref_idx)
        modes, satd_intra = self._intra_candidate(src_y, src_blocks)
        # decision: favour inter slightly (cheaper to signal)
        is_inter = satd_inter.astype(jnp.int64) * 8 <= \
            satd_intra.astype(jnp.int64) * 9
        out = self._waves_inter(src_y.astype(jnp.int32),
                                src_cb.astype(jnp.int32),
                                src_cr.astype(jnp.int32),
                                modes, is_inter, pred_y, pred_cb, pred_cr,
                                mv=mv, ref_idx=ref_idx)
        out["mv"] = mv
        out["ref_idx"] = ref_idx
        out["is_inter"] = is_inter
        out["modes_flat"] = modes
        return out

    NO_REF_POC = -(1 << 30)

    def _inter_b_impl(self, src_y, src_cb, src_cr, l0_y, l0_cb, l0_cr,
                      l1_y, l1_cb, l1_cr, l0_pocs, l1_pocs):
        """B frame: per-list best uni candidates + their 14-bit bipred
        average (spec 8.5.3.3.3: (v0 + v1 + 64) >> 7), per-block
        inter_dir decision by SATD with a lambda-scaled signalling
        penalty for the extra MV."""
        src_y = src_y.astype(jnp.int32)
        src_cb = src_cb.astype(jnp.int32)
        src_cr = src_cr.astype(jnp.int32)
        stacks = [s.astype(jnp.int32) for s in
                  (l0_y, l0_cb, l0_cr, l1_y, l1_cb, l1_cr)]
        l0_y, l0_cb, l0_cr, l1_y, l1_cb, l1_cr = stacks
        n = LUMA_N
        src_blocks = jnp.moveaxis(
            src_y.reshape(self.rows, n, self.cols, n), 1, 2).reshape(
            self.n_blocks, n, n)
        k0 = l0_y.shape[0]
        k1 = l1_y.shape[0]
        mv0, r0, satd0 = self._best_uni(src_blocks, l0_y, k0)
        mv1, r1, satd1 = self._best_uni(src_blocks, l1_y, k1)
        # 14-bit signals for both lists (uni preds derive from the same)
        v0 = self._mc_blocks(l0_y, l0_cb, l0_cr, mv0, r0, hi=True)
        v1 = self._mc_blocks(l1_y, l1_cb, l1_cr, mv1, r1, hi=True)

        def uni(v):
            return jnp.clip((v + 32) >> 6, 0, 255)

        def bi(a, b):
            return jnp.clip((a + b + 64) >> 7, 0, 255)

        pred_bi_y = bi(v0[0], v1[0])
        satd_bi = self._satd8(src_blocks - pred_bi_y)
        # extra MVD+ref+mvp of the second list, in CABAC bins
        lam_satd = jnp.sqrt(0.57) * 2.0 ** (
            (self.qp2[0].astype(jnp.float32) - 12.0) / 6.0)
        bi_pen = (self.BI_PEN_BINS * lam_satd).astype(jnp.int32)
        c0 = satd0
        c1 = satd1
        cbi = satd_bi + bi_pen
        inter_dir = jnp.where((cbi <= c0) & (cbi <= c1), 3,
                              jnp.where(c0 <= c1, 1, 2)).astype(jnp.int32)
        satd_inter = jnp.minimum(jnp.minimum(c0, c1), cbi)
        sel = inter_dir[:, None, None]
        pred_y, pred_cb, pred_cr = (
            jnp.where(sel == 3, bi(a, b),
                      jnp.where(sel == 1, uni(a), uni(b)))
            for a, b in zip(v0, v1))
        modes, satd_intra = self._intra_candidate(src_y, src_blocks)
        is_inter = satd_inter.astype(jnp.int64) * 8 <= \
            satd_intra.astype(jnp.int64) * 9
        # per-list-slot motion for BS derivation + the writer:
        # unused slots carry NO_REF / zero MV
        use0 = (inter_dir != 2)
        use1 = (inter_dir != 1)
        mv2 = jnp.stack([jnp.where(use0[:, None], mv0, 0),
                         jnp.where(use1[:, None], mv1, 0)], axis=1)
        ref2 = jnp.stack([jnp.where(use0, r0, -1),
                          jnp.where(use1, r1, -1)], axis=1)
        poc2 = jnp.stack(
            [jnp.where(use0, l0_pocs[r0], self.NO_REF_POC),
             jnp.where(use1, l1_pocs[r1], self.NO_REF_POC)], axis=1)
        out = self._waves_inter(src_y, src_cb, src_cr, modes, is_inter,
                                pred_y, pred_cb, pred_cr,
                                mv2=mv2, poc2=poc2)
        out["mv2"] = mv2
        out["ref2"] = ref2
        out["inter_dir"] = inter_dir
        out["is_inter"] = is_inter
        out["modes_flat"] = modes
        return out

    def _bs_blocks(self, is_inter, nz_blk, mv, ref_idx):
        """Per-block-edge boundary strengths (spec 8.7.2.4 specialised to
        the uniform 16x16 single-list grid): intra -> 2; nonzero luma TU,
        different reference, or MV delta >= one pel -> 1."""
        R, C = self.rows, self.cols
        intra = (~is_inter).reshape(R, C)
        nz = nz_blk.reshape(R, C)
        mvb = mv.reshape(R, C, 2)
        rib = jnp.where(intra, -1, ref_idx.reshape(R, C))

        def pair(sl_p, sl_q):
            far = (jnp.abs(mvb[sl_p] - mvb[sl_q]) >= 4).any(-1)
            bs1 = nz[sl_p] | nz[sl_q] | (rib[sl_p] != rib[sl_q]) | far
            return jnp.where(intra[sl_p] | intra[sl_q], 2,
                             bs1.astype(jnp.int32))

        bs_v = jnp.zeros((R, C), jnp.int32).at[:, 1:].set(
            pair((slice(None), slice(None, -1)),
                 (slice(None), slice(1, None))))
        bs_h = jnp.zeros((R, C), jnp.int32).at[1:, :].set(
            pair((slice(None, -1), slice(None)),
                 (slice(1, None), slice(None))))
        return bs_v, bs_h

    def _bs_blocks_bi(self, is_inter, nz_blk, mv2, poc2):
        """Boundary strengths for the two-list case (spec 8.7.2.4 full
        rule, matching ops/deblock.py compute_bs): per-list slots with
        NO_REF_POC marking unused lists and zeroed MVs. Same reference
        multiset -> compare MVs under the matching assignment; the
        both-slots-equal case needs BOTH assignments to exceed one pel."""
        R, C = self.rows, self.cols
        intra = (~is_inter).reshape(R, C)
        nz = nz_blk.reshape(R, C)
        mvb = mv2.reshape(R, C, 2, 2)
        pocb = poc2.reshape(R, C, 2)
        cnt = (pocb != self.NO_REF_POC).sum(-1)

        def far(a, b):
            return (jnp.abs(a - b) >= 4).any(-1)

        def pair(sp, sq):
            mp, mq = mvb[sp], mvb[sq]
            pp, pq = pocb[sp], pocb[sq]
            eq_s = (pp[..., 0] == pq[..., 0]) & (pp[..., 1] == pq[..., 1])
            eq_c = (pp[..., 0] == pq[..., 1]) & (pp[..., 1] == pq[..., 0])
            d_s = far(mp[..., 0, :], mq[..., 0, :]) \
                | far(mp[..., 1, :], mq[..., 1, :])
            d_c = far(mp[..., 0, :], mq[..., 1, :]) \
                | far(mp[..., 1, :], mq[..., 0, :])
            ok = (eq_s & ~d_s) | (eq_c & ~d_c)
            bs1 = nz[sp] | nz[sq] | (cnt[sp] != cnt[sq]) | ~ok
            return jnp.where(intra[sp] | intra[sq], 2,
                             bs1.astype(jnp.int32))

        bs_v = jnp.zeros((R, C), jnp.int32).at[:, 1:].set(
            pair((slice(None), slice(None, -1)),
                 (slice(None), slice(1, None))))
        bs_h = jnp.zeros((R, C), jnp.int32).at[1:, :].set(
            pair((slice(None, -1), slice(None)),
                 (slice(1, None), slice(None))))
        return bs_v, bs_h

    def _waves_inter(self, src_y, src_cb, src_cr, modes_flat, is_inter,
                     ipred_y, ipred_cb, ipred_cr, mv=None, ref_idx=None,
                     mv2=None, poc2=None):
        """Wavefront recon with per-block intra/inter selection."""
        n, nc = LUMA_N, CHROMA_N
        h, w = self.h, self.w
        zseed = (src_y[0, 0] * 0).astype(jnp.int32)
        rec_y = jnp.zeros((1 + h + n, 1 + w + n), jnp.int32) + zseed
        rec_cb = jnp.zeros((1 + h // 2 + nc, 1 + w // 2 + nc),
                           jnp.int32) + zseed
        rec_cr = jnp.zeros_like(rec_cb) + zseed
        levels_y = jnp.zeros((self.n_blocks, n, n), jnp.int32) + zseed
        levels_cb = jnp.zeros((self.n_blocks, nc, nc), jnp.int32) + zseed
        levels_cr = jnp.zeros((self.n_blocks, nc, nc), jnp.int32) + zseed

        src_blocks_y = jnp.moveaxis(src_y.reshape(
            self.rows, n, self.cols, n), 1, 2).reshape(self.n_blocks, n, n)
        src_blocks_cb = jnp.moveaxis(src_cb.reshape(
            self.rows, nc, self.cols, nc), 1, 2).reshape(
            self.n_blocks, nc, nc)
        src_blocks_cr = jnp.moveaxis(src_cr.reshape(
            self.rows, nc, self.cols, nc), 1, 2).reshape(
            self.n_blocks, nc, nc)

        def do_plane(rec, bids, mask, modes_w, inter_w, ipred, src_blocks,
                     g, f, size, qp, t, is_luma, levels_store):
            refs = self._gather_recon_refs(rec, bids, size, self.cols)
            pred = self._block_pred(refs, modes_w, g, f, size, is_luma)
            pred = pred.reshape(-1, size, size)
            pred = jnp.where(inter_w[:, None, None],
                             jnp.take(ipred, bids, axis=0), pred)
            srcb = jnp.take(src_blocks, bids, axis=0)
            resi = srcb - pred
            levels, r2 = self._transform_quant_sel(resi, t, qp, size,
                                                   inter_w)
            cbf = jnp.any(levels != 0, axis=(1, 2))
            rec_blk = jnp.clip(pred + jnp.where(cbf[:, None, None], r2, 0),
                               0, 255)
            r = bids // self.cols
            c = bids % self.cols
            y0 = r * size + 1
            x0 = c * size + 1
            yy = y0[:, None, None] + jnp.arange(size)[None, :, None]
            xx = x0[:, None, None] + jnp.arange(size)[None, None, :]
            flat = yy * rec.shape[1] + xx
            flat = jnp.where(mask[:, None, None], flat, rec.size)
            rec = rec.reshape(-1).at[flat.reshape(-1)].set(
                rec_blk.reshape(-1), mode="drop").reshape(rec.shape)
            store_ids = jnp.where(mask, bids, self.n_blocks)
            levels_store = levels_store.at[store_ids].set(
                jnp.where(cbf[:, None, None], levels, 0), mode="drop")
            return rec, levels_store

        def wave_body(i, state):
            rec_y, rec_cb, rec_cr, ly, lcb, lcr = state
            bids = self.wave_blocks[i]
            mask = self.wave_mask[i]
            modes_w = jnp.take(modes_flat, bids)
            inter_w = jnp.take(is_inter, bids)
            rec_y, ly = do_plane(rec_y, bids, mask, modes_w, inter_w,
                                 ipred_y, src_blocks_y, self.g16, self.f16,
                                 n, self.qp2[0], self.t16, True, ly)
            rec_cb, lcb = do_plane(rec_cb, bids, mask, modes_w, inter_w,
                                   ipred_cb, src_blocks_cb, self.g8c,
                                   self.g8c, nc, self.qp2[1], self.t8,
                                   False, lcb)
            rec_cr, lcr = do_plane(rec_cr, bids, mask, modes_w, inter_w,
                                   ipred_cr, src_blocks_cr, self.g8c,
                                   self.g8c, nc, self.qp2[1], self.t8,
                                   False, lcr)
            return rec_y, rec_cb, rec_cr, ly, lcb, lcr

        state = (rec_y, rec_cb, rec_cr, levels_y, levels_cb, levels_cr)
        state = jax.lax.fori_loop(0, self.n_waves, wave_body, state)
        rec_y, rec_cb, rec_cr, ly, lcb, lcr = state
        bs_blk = None
        if self.deblock and mv2 is not None:
            nz_blk = (ly != 0).any(axis=(1, 2))
            bs_blk = self._bs_blocks_bi(is_inter, nz_blk, mv2, poc2)
        elif self.deblock and mv is not None:
            nz_blk = (ly != 0).any(axis=(1, 2))
            bs_blk = self._bs_blocks(is_inter, nz_blk, mv, ref_idx)
        return self._outputs(rec_y, rec_cb, rec_cr, ly, lcb, lcr,
                             src_y, src_cb, src_cr, bs_blk=bs_blk)

    def _transform_quant_sel(self, resi, t, qp, n, inter_w):
        """Like _transform_quant but with per-block intra/inter quant
        rounding offset."""
        import numpy as _np
        from ..tables import INV_QUANT_SCALES, QUANT_SCALES
        log2n = int(_np.log2(n))
        bd = 8
        shift1 = log2n + bd - 9
        shift2 = log2n + 6
        tt = t.astype(jnp.int32)
        tmp = jnp.einsum("ij,ljk->lik", tt, jnp.swapaxes(resi, 1, 2),
                         preferred_element_type=jnp.int32)
        tmp = (tmp + (1 << (shift1 - 1) if shift1 > 0 else 0)) >> shift1
        co = jnp.einsum("ij,ljk->lik", tt, jnp.swapaxes(tmp, 1, 2),
                        preferred_element_type=jnp.int32)
        co = (co + (1 << (shift2 - 1))) >> shift2
        tshift = 15 - bd - log2n
        qbits = 14 + qp // 6 + tshift  # traced: qp is a device scalar
        scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qp % 6]
        off_i = jnp.left_shift(171, qbits - 9)
        off_p = jnp.left_shift(85, qbits - 9)
        offset = jnp.where(inter_w[:, None, None], off_p, off_i)
        levels = self._quant_levels(co, scale, qbits, offset, qp, log2n)
        dshift = bd + log2n - 9
        dscale = jnp.left_shift(
            jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qp % 6], qp // 6)
        deq = (levels * dscale + (1 << (dshift - 1))) >> dshift
        deq = jnp.clip(deq, -32768, 32767).astype(jnp.int32)
        ishift1, ishift2 = 7, 20 - bd
        tmp2 = jnp.einsum("ji,ljk->lik", tt, deq,
                          preferred_element_type=jnp.int32)
        tmp2 = jnp.clip((tmp2 + (1 << (ishift1 - 1))) >> ishift1,
                        -32768, 32767)
        r2 = jnp.einsum("lij,jk->lik", tmp2, tt,
                        preferred_element_type=jnp.int32)
        r2 = jnp.clip((r2 + (1 << (ishift2 - 1))) >> ishift2, -32768, 32767)
        return levels, r2

    def encode_inter_frame(self, src_y, src_cb, src_cr, refs_y, refs_cb,
                           refs_cr):
        return self.materialize(
            self.submit_inter(src_y, src_cb, src_cr, refs_y, refs_cb,
                              refs_cr))

    @staticmethod
    def _stack(r, k):
        """Stack a ref list to exactly k pictures (pad by repeating the
        last; the ref-idx penalty keeps duplicates from being selected)."""
        if isinstance(r, (list, tuple)):
            arrs = [jnp.asarray(a, jnp.uint8) for a in r]
            while len(arrs) < k:
                arrs.append(arrs[-1])
            return jnp.stack(arrs[:k])
        a = jnp.asarray(r, jnp.uint8)
        if a.ndim == 2:
            a = a[None]
        return a

    def submit_inter(self, src_y, src_cb, src_cr, refs_y, refs_cb, refs_cr,
                     qp: int | None = None):
        """refs_* are stacks [K, ...] (lists are stacked; a single [H,W]
        picture is promoted to K=1)."""
        k = self.n_refs
        out = self._inter(self._consts_for(qp), jnp.asarray(src_y, jnp.uint8),
                          jnp.asarray(src_cb, jnp.uint8),
                          jnp.asarray(src_cr, jnp.uint8),
                          self._stack(refs_y, k), self._stack(refs_cb, k),
                          self._stack(refs_cr, k))
        self._start_d2h(out)
        return out

    N_LIST_REFS = 2  # fixed per-list stack size of the B path

    def submit_inter_b(self, src_y, src_cb, src_cr, l0, l1, l0_pocs,
                       l1_pocs, qp: int | None = None):
        """B frame with bi-prediction. l0/l1: ([y..], [cb..], [cr..])
        reference plane lists; *_pocs the matching POCs (padded to the
        fixed per-list stack size by repeating the last)."""
        k = self.N_LIST_REFS

        def pocs(p):
            p = list(p)
            while len(p) < k:
                p.append(p[-1])
            return jnp.asarray(p[:k], jnp.int32)

        out = self._inter_b(
            self._consts_for(qp), jnp.asarray(src_y, jnp.uint8),
            jnp.asarray(src_cb, jnp.uint8), jnp.asarray(src_cr, jnp.uint8),
            self._stack(l0[0], k), self._stack(l0[1], k),
            self._stack(l0[2], k),
            self._stack(l1[0], k), self._stack(l1[1], k),
            self._stack(l1[2], k), pocs(l0_pocs), pocs(l1_pocs))
        self._start_d2h(out)
        return out
