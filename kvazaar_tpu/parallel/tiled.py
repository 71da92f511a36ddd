"""Tiled frame pipeline: HEVC tiles as independent per-tile device
programs (the single-host analog of the device-mesh sharding in
parallel/mesh.py — same decomposition, same zero cross-tile traffic).

Each tile runs the full multi-depth intra pipeline on its own rectangle.
Because the PPS signals loop_filter_across_tiles=0 (as the reference
does: src/encoder_state-bitstream.c:545), the per-tile in-graph
deblock/SAO is exactly the normative in-loop filtering, and the device
checksum stays valid by riding per-tile hash masks at the tile's global
offset (the HEVC checksum is a plain sum, so per-tile sums add up).

Pipelines are cached per tile shape; tiles sharing a shape share the
compiled program. Submission is async per tile (XLA queues all tiles
back-to-back — the on-device analog of kvazaar's one-thread-per-tile,
src/encoderstate.c:944-979).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..hevc.tiles import TileGrid
from ..models.intra_md import MdIntraPipeline


def _hash_mask(h: int, w: int, y0: int, x0: int) -> np.ndarray:
    yy, xx = np.mgrid[y0:y0 + h, x0:x0 + w]
    return ((xx & 255) ^ (yy & 255) ^ (xx >> 8) ^ (yy >> 8)) \
        .astype(np.uint32)


class TiledIntraPipeline:
    """submit/materialize-compatible wrapper running one MdIntraPipeline
    per tile rectangle and stitching frame-level decision tensors."""

    def __init__(self, height: int, width: int, qp: int, grid: TileGrid,
                 ctb: int = 64, **pipe_kw) -> None:
        assert height == grid.row_bd[-1] * ctb
        assert width == grid.col_bd[-1] * ctb
        self.h, self.w, self.ctb = height, width, ctb
        self.bd = pipe_kw.get("bit_depth", 8)
        self.grid = grid
        self.pipes: dict[tuple[int, int], MdIntraPipeline] = {}
        self.tile_masks = []
        for tid in range(grid.n_tiles):
            x0, y0, tw, th = grid.rect(tid)
            shape = (th * ctb, tw * ctb)
            if shape not in self.pipes:
                self.pipes[shape] = MdIntraPipeline(shape[0], shape[1],
                                                    qp, **pipe_kw)
            py, px = y0 * ctb, x0 * ctb
            self.tile_masks.append({
                "hash_mask_y": jnp.asarray(
                    _hash_mask(shape[0], shape[1], py, px)),
                "hash_mask_c": jnp.asarray(
                    _hash_mask(shape[0] // 2, shape[1] // 2,
                               py // 2, px // 2)),
            })

    def submit(self, src_y, src_cb, src_cr, qp: int | None = None,
               qp_map=None):
        src_y = np.asarray(src_y)
        src_cb = np.asarray(src_cb)
        src_cr = np.asarray(src_cr)
        outs = []
        for tid in range(self.grid.n_tiles):
            x0, y0, tw, th = self.grid.rect(tid)
            c = self.ctb
            ys = slice(y0 * c, (y0 + th) * c)
            xs = slice(x0 * c, (x0 + tw) * c)
            ysc = slice(y0 * c // 2, (y0 + th) * c // 2)
            xsc = slice(x0 * c // 2, (x0 + tw) * c // 2)
            pipe = self.pipes[(th * c, tw * c)]
            qm = (None if qp_map is None
                  else np.asarray(qp_map)[y0:y0 + th, x0:x0 + tw])
            outs.append(pipe.submit(src_y[ys, xs], src_cb[ysc, xsc],
                                    src_cr[ysc, xsc], qp=qp,
                                    consts_extra=self.tile_masks[tid],
                                    qp_map=qm))
        return outs

    def materialize(self, outs) -> dict:
        c = self.ctb
        res: dict = {}
        pix_t = np.uint8 if self.bd == 8 else np.uint16
        full = {
            "rec_y": np.zeros((self.h, self.w), pix_t),
            "rec_cb": np.zeros((self.h // 2, self.w // 2), pix_t),
            "rec_cr": np.zeros((self.h // 2, self.w // 2), pix_t),
            "size_map8": np.zeros((self.h // 8, self.w // 8), np.int32),
            "mode_map8": np.zeros((self.h // 8, self.w // 8), np.int32),
            "levels_y": np.zeros((self.h, self.w), np.int16),
            "levels_cb": np.zeros((self.h // 2, self.w // 2), np.int16),
            "levels_cr": np.zeros((self.h // 2, self.w // 2), np.int16),
        }
        hash_sum = np.zeros(3, np.uint64)
        sse_sum = np.zeros(3, np.int64)
        sao_keys = None
        for tid in range(self.grid.n_tiles):
            x0, y0, tw, th = self.grid.rect(tid)
            pipe = self.pipes[(th * c, tw * c)]
            d = pipe.materialize(outs[tid])
            ys, xs = slice(y0 * c, (y0 + th) * c), \
                slice(x0 * c, (x0 + tw) * c)
            ysc = slice(y0 * c // 2, (y0 + th) * c // 2)
            xsc = slice(x0 * c // 2, (x0 + tw) * c // 2)
            full["rec_y"][ys, xs] = np.asarray(d["rec_y"])
            full["rec_cb"][ysc, xsc] = np.asarray(d["rec_cb"])
            full["rec_cr"][ysc, xsc] = np.asarray(d["rec_cr"])
            s8y = slice(y0 * c // 8, (y0 + th) * c // 8)
            s8x = slice(x0 * c // 8, (x0 + tw) * c // 8)
            full["size_map8"][s8y, s8x] = d["size_map8"]
            full["mode_map8"][s8y, s8x] = d["mode_map8"]
            full["levels_y"][ys, xs] = d["levels_y"]
            full["levels_cb"][ysc, xsc] = d["levels_cb"]
            full["levels_cr"][ysc, xsc] = d["levels_cr"]
            hash_sum += np.asarray(d["hash"]).astype(np.uint64)
            sse_sum += np.asarray(d["sse"]).astype(np.int64)
            if "qp_ctb" in d:
                if "qp_ctb" not in res:
                    res["qp_ctb"] = np.zeros(
                        (self.grid.row_bd[-1], self.grid.col_bd[-1]),
                        np.int32)
                res["qp_ctb"][y0:y0 + th, x0:x0 + tw] = d["qp_ctb"]
            if any(k.startswith("sao_") for k in d):
                if sao_keys is None:
                    sao_keys = [k for k in d if k.startswith("sao_")]
                    for k in sao_keys:
                        a = np.asarray(d[k])
                        shp = ((a.shape[0], self.grid.row_bd[-1],
                                self.grid.col_bd[-1]) if a.ndim == 3
                               else (self.grid.row_bd[-1],
                                     self.grid.col_bd[-1]))
                        res[k] = np.zeros(shp, a.dtype)
                for k in sao_keys:
                    a = np.asarray(d[k])
                    sy = slice(y0, y0 + th)
                    sx = slice(x0, x0 + tw)
                    if a.ndim == 3:
                        res[k][:, sy, sx] = a
                    else:
                        res[k][sy, sx] = a
        res.update(full)
        res["hash"] = (hash_sum & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        res["sse"] = sse_sum
        return res
