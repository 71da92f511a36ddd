"""GOP structure scheduler: hierarchical (dyadic) B pyramids with
closed-GOP segmentation, display->coding order mapping, reference list
construction and DPB retention.

Reference parity: kvazaar src/gop.h (kvz_gop_ra8 and friends) defines the
same dyadic poc_offset/layer/qp-offset structure as static tables plus
src/input_frame_buffer.c:66 for the display->coding reorder. Here the
structure is generated for any span length (so end-of-sequence and
closed-GOP tails become shorter pyramids instead of special cases), and
reference lists are derived nearest-first from the retained DPB.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FrameSpec:
    """One frame's coding decision, POCs relative to the last IDR."""
    disp_idx: int            # absolute display index
    poc: int
    is_idr: bool = False
    is_ref: bool = True
    slice_type: int = 2      # 2=I 1=P 0=B
    layer: int = 0           # temporal layer (anchor = 1)
    qp_offset: int = 0
    nal: str = ""            # "" | "CRA" | "RASL" (open-GOP typing)
    l0: list = field(default_factory=list)   # active L0 POCs, nearest first
    l1: list = field(default_factory=list)   # active L1 POCs, nearest first
    keep: set = field(default_factory=set)   # POCs retained after coding


def _dyadic(lo: int, hi: int, depth: int, out: list) -> None:
    """Emit the B pictures strictly inside (lo, hi) in coding order."""
    if hi - lo <= 1:
        return
    mid = (lo + hi + 1) // 2
    out.append((mid, lo, hi, depth))
    _dyadic(lo, mid, depth + 1, out)
    _dyadic(mid, hi, depth + 1, out)


# (qp_offset, qp_model_offset, qp_model_scale) by layer, from the
# reference GOP tables (src/gop.h kvz_gop_ra8:94, kvz_gop_ra16:201).
# Total per-frame offset = qp_offset + CLIP(0, 3, qp'*scale + offset)
# with qp' = base + qp_offset (src/rate_control.c:1040-1047).
_QP_TABLE_8 = {1: (0, 0.0, 0.0), 2: (3, -6.25, 0.25),
               3: (4, -6.25, 0.25), 4: (8, -7.0, 0.245)}
_QP_TABLE_16 = {1: (1, 0.0, 0.0), 2: (1, -4.8848, 0.2061),
                3: (4, -5.7476, 0.2286), 4: (5, -5.90, 0.2333),
                5: (6, -7.1444, 0.3)}


def gop_qp_offset(layer: int, base_qp: int, gop_len: int) -> int:
    """Full per-layer QP offset for B pyramids at fixed QP."""
    table = _QP_TABLE_16 if gop_len >= 16 else _QP_TABLE_8
    off, mo, ms = table[min(max(layer, 1), max(table))]
    q = base_qp + off
    return off + int(min(3.0, max(0.0, q * ms + mo)) + 0.5)


def intra_qp_offset(gop_len: int) -> int:
    """Auto intra QP offset (ref src/encoder.c:180-183): I frames are
    coded at lower QP when they anchor a pyramid."""
    if gop_len <= 1:
        return 0
    return max(-(int(gop_len - 1).bit_length()) + 1, -3)


def lp_gop_table(g: int, d: int, t: int, n_refs: int) -> list[dict]:
    """Low-delay GOP structure for --gop=lp-gGdDtT (ref src/cfg.c:1433
    kvz_config_process_lp_gop): per-position layer from depth modulos,
    qp_offset = layer, first reference the nearest lower-layer frame
    (or t frames back on the t-grid), remaining references previous
    keyframes."""
    assert g >= 1 and d >= 1 and t >= 1
    mod = [0] * max(d, 1)
    for dd in range(d):
        mod[d - 1 - dd] = 1 << dd
    mod[0] = g
    pics = []
    for pos in range(1, g + 1):
        layer = 1
        while layer < d and (pos % mod[layer - 1]):
            layer += 1
        pics.append(dict(poc_offset=pos, layer=layer, qp_offset=layer,
                         is_ref=False, ref_neg=[]))
    for pos in range(1, g + 1):
        ent = pics[pos - 1]
        if t > 1:
            if pos % t == 0:
                ent["ref_neg"].append(t)
            else:
                r = pos - 1
                while r > 0 and not pics[r]["layer"] < ent["layer"]:
                    r -= 1
                if pics[r]["layer"] < ent["layer"]:
                    ent["ref_neg"].append(pos - pics[r]["poc_offset"])
                    pics[r]["is_ref"] = True
                else:
                    ent["ref_neg"].append(pos % g or g)
        else:
            ent["ref_neg"].append(1)
            if pos >= 2:
                pics[pos - 2]["is_ref"] = True
        keyframe = pos
        for _ in range(1, max(1, n_refs)):
            while keyframe == ent["ref_neg"][-1]:
                keyframe += g
            ent["ref_neg"].append(keyframe)
    pics[g - 1]["is_ref"] = True   # keyframe always a reference
    return pics


class GopScheduler:
    """Generates FrameSpecs. Usage: feed display indices via plan_segment
    per coding span; the Encoder buffers frames and encodes the returned
    specs in list order."""

    def __init__(self, gop_len: int, intra_period: int, n_past_refs: int = 2,
                 n_fut_refs: int = 2, base_qp: int = 0) -> None:
        assert gop_len >= 1
        self.gop = gop_len
        self.period = intra_period   # 0 = first frame only
        self.base_qp = base_qp       # for the QP-model layer offsets
        self.n_past = max(1, n_past_refs)
        self.n_fut = max(1, n_fut_refs)
        # state
        self.anchors: list[int] = []   # retained past-anchor POCs (desc)

    def segment_boundary(self, poc: int) -> bool:
        """True when `poc` (relative to last IDR) starts a new IDR."""
        return self.period > 0 and poc >= self.period

    def plan_idr(self, disp_idx: int) -> FrameSpec:
        self.anchors = [0]
        return FrameSpec(disp_idx=disp_idx, poc=0, is_idr=True, is_ref=True,
                         slice_type=2, layer=0,
                         qp_offset=intra_qp_offset(self.gop),
                         keep={0})

    def plan_span(self, disp_base: int, lo: int, hi: int,
                  intra_anchor: bool = False) -> list[FrameSpec]:
        """Plan the span of pictures (lo, hi] where `lo` is an already
        coded anchor POC: the anchor `hi` (P, past refs only; or an
        open-GOP CRA intra picture) followed by the dyadic B pyramid
        filling (lo, hi). disp_base = display index of POC 0.

        With intra_anchor (open GOP, ref src/encoderstate.c:1552-1625):
        the anchor is a CRA_NUT I picture with POC continuing, the B
        pictures inside the span become RASL leading pictures (coded
        after, displayed before, referencing across the CRA), and
        trailing pictures of later spans reference nothing older than
        the CRA."""
        specs: list[FrameSpec] = []
        past = [a for a in sorted(self.anchors, reverse=True) if a <= lo]
        l0_anchor = past[:self.n_past]
        if intra_anchor:
            anchor = FrameSpec(disp_idx=disp_base + hi, poc=hi,
                               slice_type=2, is_ref=True, layer=0,
                               qp_offset=intra_qp_offset(self.gop),
                               nal="CRA")
        else:
            anchor = FrameSpec(disp_idx=disp_base + hi, poc=hi,
                               slice_type=1, is_ref=True, layer=1,
                               qp_offset=gop_qp_offset(1, self.base_qp, self.gop),
                               l0=l0_anchor)
        specs.append(anchor)
        mids = []
        _dyadic(lo, hi, 2, mids)
        coded = set(l0_anchor) | {lo, hi}
        for (mid, mlo, mhi, depth) in mids:
            past_p = sorted((p for p in coded if p < mid), reverse=True)
            fut_p = sorted(p for p in coded if p > mid)
            is_ref = (mhi - mlo) > 2   # leaves of the pyramid are non-ref
            specs.append(FrameSpec(
                disp_idx=disp_base + mid, poc=mid, slice_type=0,
                is_ref=is_ref, layer=depth,
                qp_offset=gop_qp_offset(depth, self.base_qp,
                                        self.gop),
                l0=past_p[:self.n_past], l1=fut_p[:self.n_fut],
                nal="RASL" if intra_anchor else ""))
            if is_ref:
                coded.add(mid)
        # retention: after each spec, keep refs needed by later specs in
        # this span plus the anchors the next span will use; trailing
        # pictures of a CRA may not reference across it
        if intra_anchor:
            next_anchor_l0 = [hi]
        else:
            next_anchor_l0 = ([hi] + [a for a in l0_anchor])[:self.n_past]
        future_need = set(next_anchor_l0)
        for spec in reversed(specs):
            spec.keep = set(future_need)
            future_need |= set(spec.l0) | set(spec.l1)
        self.anchors = sorted(set(next_anchor_l0), reverse=True)
        return specs
