"""Fractional-bit CABAC cost tables for the device partition DP.

The reference prices every search decision with fractional-bit CABAC
costs (kvz_f_entropy_bits, src/cabac.h:130; used throughout src/rdo.c
and src/search.c). The batched device DP cannot track real context
state (decisions are made for all CUs at once), so it uses the cost of
each bin AT ITS INITIALIZED STATE for the slice type and QP — the same
first-order approximation the reference applies when it prices bins
without committing state updates (src/rdo.c CTX_ENTROPY_FBITS).

All values are plain Python floats (bits); the pipelines fold them into
jitted constants via the per-QP consts dict, so rate control can change
QP without retracing.
"""
from __future__ import annotations

from functools import lru_cache

from ..tables import CONTEXT_INIT, ENTROPY_BITS, context_init_state

_SCALE = 1.0 / 32768.0


def ctx_bits(family: str, init_type: int, qp: int, i: int = 0
             ) -> tuple[float, float]:
    """(bits of coding 0, bits of coding 1) for one context at its
    init state (spec 9.3.2.2 + the HM/kvazaar entropy-bits table)."""
    iv = CONTEXT_INIT[family][init_type][i]
    state, mps = context_init_state(iv, qp)
    c0 = ENTROPY_BITS[(state << 1) ^ (1 if mps != 0 else 0)] * _SCALE
    c1 = ENTROPY_BITS[(state << 1) ^ (1 if mps == 0 else 0)] * _SCALE
    return float(c0), float(c1)


@lru_cache(maxsize=None)
def intra_dp_costs(qp: int, init_type: int = 0) -> dict:
    """Bit costs the intra partition DP needs, per QP (I-slice).

    Keys:
      split0[d], split1[d] — split_cu_flag by depth-ish ctx (avg ctx)
      cbf_y0/cbf_y1        — cbf_luma at trafo depth 0 (ctx 1)
      cbf_y0_d1/cbf_y1_d1  — cbf_luma at trafo depth > 0 (ctx 0)
      cbf_c0/cbf_c1        — cbf_cb/cr at trafo depth 0 (ctx 0)
      cbf_c0_d1/cbf_c1_d1  — at trafo depth 1 (64x64 CU's forced split)
      mode_mpm             — prev_intra_luma_pred_flag=1 + E[mpm_idx]
      mode_rem             — prev_intra_luma_pred_flag=0 + 5 EP bins
      chroma_dm            — intra_chroma_pred_mode derived (one 0 bin)
      part_2nx2n/part_nxn  — part_mode bin at min CB size
    """
    # split_cu_flag ctx = #neighbours with greater depth (0..2); the
    # batched DP doesn't know neighbour depths, use the middle context
    sp = [ctx_bits("split_cu_flag", init_type, qp, i) for i in range(3)]
    cbf_y_d0 = ctx_bits("cbf_luma", init_type, qp, 1)
    cbf_y_d1 = ctx_bits("cbf_luma", init_type, qp, 0)
    cbf_c_d0 = ctx_bits("cbf_chroma", init_type, qp, 0)
    cbf_c_d1 = ctx_bits("cbf_chroma", init_type, qp, 1)
    prev = ctx_bits("prev_intra_luma_pred_flag", init_type, qp, 0)
    chroma = ctx_bits("intra_chroma_pred_mode", init_type, qp, 0)
    part = ctx_bits("part_mode", init_type, qp, 0)
    return {
        "split0": sp[1][0], "split1": sp[1][1],
        "cbf_y0": cbf_y_d0[0], "cbf_y1": cbf_y_d0[1],
        "cbf_y0_d1": cbf_y_d1[0], "cbf_y1_d1": cbf_y_d1[1],
        "cbf_c0": cbf_c_d0[0], "cbf_c1": cbf_c_d0[1],
        "cbf_c0_d1": cbf_c_d1[0], "cbf_c1_d1": cbf_c_d1[1],
        # mpm_idx: 1 EP bin for idx 0, 2 for idx 1/2 -> E ~ 1.67
        "mode_mpm": prev[1] + 1.67,
        "mode_rem": prev[0] + 5.0,
        "chroma_dm": chroma[0],
        "part_2nx2n": part[1],
        "part_nxn": part[0],
    }


@lru_cache(maxsize=None)
def inter_dp_costs(qp: int, init_type: int = 1) -> dict:
    """Bit costs of the inter-CU signalling decisions for the device DP
    (P/B slices), at context init states — the kvz_calc_mvd_cost_cabac /
    skip-merge pricing analog (ref src/rdo.c:997, src/search_inter.c).

    The write-time resolution (engine/md_inter_writer.py) maps the DP's
    decisions onto three syntax shapes; each is priced here:
      skip  — cu_skip_flag=1 + merge_idx            (merge hit, cbf 0)
      merge — skip0 + pred_mode + part + merge_flag=1 + merge_idx
      amvp  — skip0 + pred_mode + part + merge_flag=0 + mvp_flag
              (+ per-list ref_idx + MVD bins, priced per candidate)
    """
    skip = ctx_bits("cu_skip_flag", init_type, qp, 1)   # middle ctx
    pred = ctx_bits("pred_mode_flag", init_type, qp, 0)
    part = ctx_bits("part_mode", init_type, qp, 0)
    mflag = ctx_bits("merge_flag", init_type, qp, 0)
    midx = ctx_bits("merge_idx", init_type, qp, 0)
    refi0 = ctx_bits("ref_idx", init_type, qp, 0)
    refi1 = ctx_bits("ref_idx", init_type, qp, 1)
    mvp = ctx_bits("mvp_flag", init_type, qp, 0)
    rqt = ctx_bits("rqt_root_cbf", init_type, qp, 0)
    g0 = ctx_bits("mvd", init_type, qp, 0)
    g1 = ctx_bits("mvd", init_type, qp, 1)
    idc0 = ctx_bits("inter_pred_idc", init_type, qp, 1)  # mid-depth ctx
    # E[merge_idx bits]: idx 0 dominates skips; idx>0 adds EP unary
    e_midx = 0.6 * midx[0] + 0.4 * (midx[1] + 1.5)
    base = pred[0] + part[1]          # pred_mode=inter + part 2Nx2N
    return {
        "skip": skip[1] + e_midx,
        "merge": skip[0] + base + mflag[1] + e_midx,
        "amvp": skip[0] + base + mflag[0] + mvp[0],
        "rqt0": rqt[0], "rqt1": rqt[1],
        "ref0": refi0[0],
        "ref_step": refi0[1] + 0.5 * (refi1[0] + refi1[1]),
        "mvd_g0_0": g0[0], "mvd_g0_1": g0[1],
        "mvd_g1_0": g1[0], "mvd_g1_1": g1[1],
        # inter_pred_idc: first bin bi-vs-uni (mid ctx), uni adds the
        # list-select bin (ctx 4 ~ 1 EP-ish bin)
        "idc_uni": idc0[0] + 1.0,
        "idc_bi": idc0[1],
        # intra CU inside a P/B slice: cu_skip=0 + pred_mode=intra
        "intra_pm": skip[0] + pred[1],
        # SMP/AMP part_mode bins (decoder _parse_part_mode_inter) + the
        # second PU's merge_flag/mvp_flag overhead
        "part0_0": part[0],
        "part1_0": ctx_bits("part_mode", init_type, qp, 1)[0],
        "part1_1": ctx_bits("part_mode", init_type, qp, 1)[1],
        "part3_0": ctx_bits("part_mode", init_type, qp, 3)[0],
        "part3_1": ctx_bits("part_mode", init_type, qp, 3)[1],
        "pu_extra": mflag[0] + mvp[0],
    }


def _bits_of(family: str, init_type: int, qp: int):
    """Per-context (bits0, bits1) arrays for a whole family."""
    import numpy as np
    n = len(CONTEXT_INIT[family][init_type])
    out = np.zeros((n, 2), np.float32)
    for i in range(n):
        out[i] = ctx_bits(family, init_type, qp, i)
    return out


@lru_cache(maxsize=None)
def rdoq_prices(qp: int, init_type: int = 0):
    """Context-init-state fractional-bit price pack for the batched
    device RDOQ (models/intra_md.py _rdoq_levels): sig_coeff_flag per
    derived context, coded_sub_block_flag, greater1/greater2 at their
    in-CG start contexts, and last-significant-position prefix prices
    per (log2 size, plane) in diagonal-scan order.

    The reference walks these contexts exactly (kvz_rdoq,
    src/rdo.c:346-661); the batched design prices every bin at its
    slice-type/QP init state instead of tracking state evolution.
    Returns dict of numpy arrays (folded into jit consts per QP).
    """
    import numpy as np

    from ..syntax.residual import (GROUP_IDX, MIN_IN_GROUP,
                                   _last_ctx_params)
    from ..tables import SCAN_DIAG, get_scan

    sig = _bits_of("sig_coeff_flag", init_type, qp)
    csbf = _bits_of("coded_sub_block_flag", init_type, qp)
    g1f = _bits_of("coeff_abs_level_greater1_flag", init_type, qp)
    g2f = _bits_of("coeff_abs_level_greater2_flag", init_type, qp)
    lastx = _bits_of("last_sig_x", init_type, qp)
    lasty = _bits_of("last_sig_y", init_type, qp)
    # greater1 ctx at c1=1 (CG start): rows = luma CG0 (set 0), luma
    # other (set 2), chroma (set 0 + 16); greater2 same sets at ctx 0
    g1 = np.stack([g1f[1], g1f[9], g1f[17]]).astype(np.float32)
    g2 = np.stack([g2f[0], g2f[2], g2f[4]]).astype(np.float32)

    def last_price(log2s: int, is_chroma: bool) -> "np.ndarray":
        n = 1 << log2s
        scan = get_scan(SCAN_DIAG, log2s)
        offset, shift = _last_ctx_params(log2s, is_chroma)
        boff = 15 if is_chroma else 0
        if is_chroma:
            offset, shift = 0, log2s - 2
        cmax = (log2s << 1) - 1
        out = np.zeros(n * n, np.float32)
        for p in range(n * n):
            x, y = int(scan[p, 0]), int(scan[p, 1])
            bits = 0.0
            for (g, tab) in ((GROUP_IDX[x], lastx), (GROUP_IDX[y], lasty)):
                for i in range(g):
                    bits += tab[boff + offset + (i >> shift), 1]
                if g < cmax:
                    bits += tab[boff + offset + (g >> shift), 0]
                if g > 3:
                    bits += (g - 2) >> 1          # EP suffix
            out[p] = bits
        return out

    last = {}
    for log2s in (2, 3, 4, 5):
        last[(log2s, False)] = last_price(log2s, False)
        if log2s <= 4:
            last[(log2s, True)] = last_price(log2s, True)
    return {"sig": sig, "csbf": csbf, "g1": g1, "g2": g2, "last": last}


def mode_cost_vec(qp: int, init_type: int = 0) -> list[float]:
    """Per-intra-mode signalling cost [35] for the batched mode sweeps.

    The sweep cannot know the true MPM list (it depends on neighbour
    decisions being made in the same batch), so it prices modes by
    their MPM hit-rate: planar/DC are in the MPM list whenever a
    neighbour is missing or non-angular (spec 8.4.2 candidate fill),
    and an angular mode is an MPM only when a neighbour chose exactly
    it. Mirrors the reference rough search's static mode-bits estimate
    (src/search_intra.c:641-699 uses ctx-approx costs the same way).
    """
    c = intra_dp_costs(qp, init_type)
    out = []
    for m in range(35):
        if m in (0, 1):          # planar, DC: usually MPM
            out.append(0.8 * c["mode_mpm"] + 0.2 * c["mode_rem"])
        elif m in (10, 26):      # hor/ver: common, MPM-ish
            out.append(0.5 * c["mode_mpm"] + 0.5 * c["mode_rem"])
        else:
            out.append(0.25 * c["mode_mpm"] + 0.75 * c["mode_rem"])
    return out
