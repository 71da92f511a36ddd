"""Tile parallelism over a device mesh — the quadtree pipeline.

HEVC tiles are independent picture rectangles with no cross-tile
prediction or filtering (the PPS signals loop_filter_across_tiles=0, as
the reference does: src/encoder_state-bitstream.c:545) — exactly a
spatial sharding. A uniform tiles grid of R rows x C columns maps onto a
(R, C) device mesh; one shard_mapped program runs the full multi-depth
intra pipeline (search + partition DP + wavefront recon + loop filters)
on every tile concurrently, one tile per device. The only cross-device
data movement is the output stitch, which is just the out_specs layout.

Bit-exactness: each device executes the same per-tile program as the
sequential TiledIntraPipeline (parallel/tiled.py), and all arithmetic is
exact-integer (floats only carry integers below 2^24), so the N-device
stream is byte-identical to the 1-device stream — tested on a CPU mesh
in tests/test_mesh_tiles.py.

Reference parity: kvazaar's tiles map to threads (src/encoderstate.c:
944-979); here they map to mesh devices over ICI.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map out of experimental
    from jax.sharding import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..hevc.tiles import TileGrid
from ..models.intra_md import MdIntraPipeline


def _hash_mask(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx & 255) ^ (yy & 255) ^ (xx >> 8) ^ (yy >> 8)) \
        .astype(np.uint32)


def grid_is_uniform(grid: TileGrid) -> bool:
    """True when every tile has the same CTB shape (mesh-mappable)."""
    return (len(set(grid.col_widths)) == 1
            and len(set(grid.row_heights)) == 1)


class MeshTiledIntraPipeline:
    """TiledIntraPipeline-compatible encoder running all tiles in ONE
    shard_mapped device program over an (R, C) mesh."""

    def __init__(self, devices, height: int, width: int, qp: int,
                 grid: TileGrid, ctb: int = 64, **pipe_kw) -> None:
        assert grid_is_uniform(grid)
        rows, cols = len(grid.row_heights), len(grid.col_widths)
        assert len(devices) >= rows * cols
        self.h, self.w, self.ctb = height, width, ctb
        self.grid = grid
        self.rows, self.cols = rows, cols
        self.bd = pipe_kw.get("bit_depth", 8)
        if pipe_kw.get("delta_qp"):
            raise NotImplementedError(
                "delta-QP not supported on the mesh tile path")
        tile_h = grid.row_heights[0] * ctb
        tile_w = grid.col_widths[0] * ctb
        assert tile_h * rows == height and tile_w * cols == width
        self.pipe = MdIntraPipeline(tile_h, tile_w, qp, **pipe_kw)
        self.pipe._host_pack = False   # mesh stitches raw per-tile outputs
        self.mesh = Mesh(
            np.asarray(devices[:rows * cols]).reshape(rows, cols),
            ("tr", "tc"))

        # full-frame hash masks, sharded so each tile's checksum uses its
        # xor mask at the global offset (the HEVC checksum is a plain sum,
        # so per-tile sums add up to the frame checksum)
        self._hy = jnp.asarray(_hash_mask(height, width))
        self._hc = jnp.asarray(_hash_mask(height // 2, width // 2))

        base = self.pipe._with_consts(self.pipe._full_impl)

        def tile_fn(consts, y, cb, cr):
            out = base(consts, y, cb, cr)
            # sparse level packing is a transfer optimization for the
            # single-tile path; the mesh stitch ships dense planes
            return {k: v for k, v in out.items()
                    if not k.startswith(("lmask_", "lvals_"))
                    and k not in ("lvl_ovf", "n_waves")}

        consts_example = dict(self.pipe.consts)
        consts_example["hash_mask_y"] = self._hy
        consts_example["hash_mask_c"] = self._hc
        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16
        tile_consts = dict(consts_example)
        tile_consts["hash_mask_y"] = jax.ShapeDtypeStruct(
            (tile_h, tile_w), jnp.uint32)
        tile_consts["hash_mask_c"] = jax.ShapeDtypeStruct(
            (tile_h // 2, tile_w // 2), jnp.uint32)
        shapes = jax.eval_shape(
            tile_fn, tile_consts,
            jax.ShapeDtypeStruct((tile_h, tile_w), pix_t),
            jax.ShapeDtypeStruct((tile_h // 2, tile_w // 2), pix_t),
            jax.ShapeDtypeStruct((tile_h // 2, tile_w // 2), pix_t))

        def out_spec(key, sd):
            if key in ("hash", "sse"):
                return P(("tr", "tc"))
            if sd.ndim == 2:
                return P("tr", "tc")
            if sd.ndim == 3:           # stacked sao param planes
                return P(None, "tr", "tc")
            raise AssertionError(key)

        in_consts_spec = {k: (P("tr", "tc")
                              if k in ("hash_mask_y", "hash_mask_c")
                              else P())
                          for k in consts_example}
        self._fn = jax.jit(shard_map(
            tile_fn, mesh=self.mesh,
            in_specs=(in_consts_spec, P("tr", "tc"), P("tr", "tc"),
                      P("tr", "tc")),
            out_specs={k: out_spec(k, sd) for k, sd in shapes.items()},
            check_rep=False))

    def submit(self, src_y, src_cb, src_cr, qp: int | None = None,
               qp_map=None):
        assert qp_map is None
        consts = dict(self.pipe._consts_for(qp))
        consts["hash_mask_y"] = self._hy
        consts["hash_mask_c"] = self._hc
        pix_t = jnp.uint8 if self.bd == 8 else jnp.uint16
        out = self._fn(consts,
                       jnp.asarray(src_y, pix_t),
                       jnp.asarray(src_cb, pix_t),
                       jnp.asarray(src_cr, pix_t))
        for v in out.values():
            try:
                v.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass
        return out

    def materialize(self, out) -> dict:
        n = self.rows * self.cols
        res = {}
        for k, v in out.items():
            a = np.asarray(v)
            if k == "hash":
                res[k] = (a.reshape(n, 3).astype(np.uint64).sum(0)
                          & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            elif k == "sse":
                res[k] = a.reshape(n, 3).sum(0)
            elif k.startswith("levels16_"):
                res["levels_" + k[len("levels16_"):]] = a
            else:
                res[k] = a
        return res
