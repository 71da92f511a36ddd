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
