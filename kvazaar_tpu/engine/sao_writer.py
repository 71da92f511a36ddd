"""SAO syntax writer (spec 7.3.8.3 sao( )), the encoder mirror of
decoder/decoder.py::_decode_sao.

Consumes the per-CTB parameter tensors produced by ops/sao_jax.py and
writes the sao() syntax at the start of each CTU. Merge left/up flags are
decided here by exact parameter equality across all three components —
the search never needs to model them.

Reference parity: kvazaar src/encode_coding_tree.c (encode_sao at the CTU
head) and src/sao.c merge handling (:52-178)."""
from __future__ import annotations

import numpy as np

from ..cabac import CabacEncoder, ContextSet

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2


class SaoWriter:
    """Per-frame SAO syntax state (param tensors + merge comparison)."""

    def __init__(self, sao: dict, sao_luma: bool, sao_chroma: bool,
                 bit_depth: int = 8) -> None:
        self.cmax = (1 << (min(bit_depth, 10) - 5)) - 1
        self.luma = sao_luma and "sao_y_typ" in sao
        self.chroma = sao_chroma and "sao_c_typ" in sao
        g = lambda k: np.asarray(sao[k])
        if self.luma:
            self.y_typ = g("sao_y_typ")
            self.y_cls = g("sao_y_cls")
            self.y_offs = g("sao_y_offs")      # [4, R, C]
            self.y_pos = g("sao_y_pos")
        if self.chroma:
            self.c_typ = g("sao_c_typ")
            self.c_cls = g("sao_c_cls")
            self.cb_offs = g("sao_c_offs_cb")
            self.cb_pos = g("sao_c_pos_cb")
            self.cr_offs = g("sao_c_offs_cr")
            self.cr_pos = g("sao_c_pos_cr")

    def _key(self, cy: int, cx: int) -> tuple:
        parts = []
        if self.luma:
            parts += [self.y_typ[cy, cx], self.y_cls[cy, cx],
                      tuple(self.y_offs[:, cy, cx]), self.y_pos[cy, cx]]
        if self.chroma:
            parts += [self.c_typ[cy, cx], self.c_cls[cy, cx],
                      tuple(self.cb_offs[:, cy, cx]), self.cb_pos[cy, cx],
                      tuple(self.cr_offs[:, cy, cx]), self.cr_pos[cy, cx]]
        return tuple(parts)

    def _write_offsets(self, cab: CabacEncoder, offs, band: bool) -> None:
        # 4 abs values TU(cMax), then band signs
        for v in offs:
            a = abs(int(v))
            for _ in range(a):
                cab.encode_bin_ep(1)
            if a < self.cmax:
                cab.encode_bin_ep(0)
        if band:
            for v in offs:
                if v:
                    cab.encode_bin_ep(1 if v < 0 else 0)

    def write(self, cab: CabacEncoder, cy: int, cx: int,
              merge_left_ok: bool, merge_up_ok: bool) -> None:
        """Write sao() for CTU (cy, cx). merge_*_ok: neighbour exists in
        the same slice/tile context."""
        key = self._key(cy, cx)
        mctx = ContextSet.idx("sao_merge_flag", 0)
        if merge_left_ok:
            ml = key == self._key(cy, cx - 1)
            cab.encode_bin(mctx, 1 if ml else 0)
            if ml:
                return
        if merge_up_ok:
            mu = key == self._key(cy - 1, cx)
            cab.encode_bin(mctx, 1 if mu else 0)
            if mu:
                return
        tctx = ContextSet.idx("sao_type_idx", 0)
        if self.luma:
            typ = int(self.y_typ[cy, cx])
            if typ == SAO_OFF:
                cab.encode_bin(tctx, 0)
            else:
                cab.encode_bin(tctx, 1)
                cab.encode_bin_ep(1 if typ == SAO_EDGE else 0)
                offs = self.y_offs[:, cy, cx]
                self._write_offsets(cab, offs, typ == SAO_BAND)
                if typ == SAO_BAND:
                    cab.encode_bins_ep(int(self.y_pos[cy, cx]), 5)
                else:
                    cab.encode_bins_ep(int(self.y_cls[cy, cx]), 2)
        if self.chroma:
            typ = int(self.c_typ[cy, cx])
            if typ == SAO_OFF:
                cab.encode_bin(tctx, 0)
            else:
                cab.encode_bin(tctx, 1)
                cab.encode_bin_ep(1 if typ == SAO_EDGE else 0)
                for comp, (offs_a, pos_a) in enumerate(
                        ((self.cb_offs, self.cb_pos),
                         (self.cr_offs, self.cr_pos))):
                    offs = offs_a[:, cy, cx]
                    self._write_offsets(cab, offs, typ == SAO_BAND)
                    if typ == SAO_BAND:
                        cab.encode_bins_ep(int(pos_a[cy, cx]), 5)
                    elif comp == 0:
                        cab.encode_bins_ep(int(self.c_cls[cy, cx]), 2)
