"""Tile parallelism over a device mesh.

HEVC tiles are independent picture rectangles with no cross-tile
prediction — exactly a spatial sharding. Each device encodes one horizontal
tile band with the full intra pipeline (search + wavefront recon); the only
cross-device data is the final levels/recon gather, which XLA handles as
the output sharding.

Reference parity: kvazaar's tiles (src/encoder.c:337-624 geometry,
src/encoderstate.c:944-979 per-tile sub-frames). There, tiles map to
threads; here they map to mesh devices over ICI.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.intra_pipeline import IntraPipeline


def tile_encode_fn(mesh: Mesh, frame_h: int, frame_w: int, qp: int):
    """Build a jitted function encoding a frame as N horizontal tiles,
    one per device along mesh axis 'tiles'.

    Returns fn(src_y [H,W], src_cb, src_cr) -> dict of sharded outputs.
    """
    n_tiles = mesh.shape["tiles"]
    assert frame_h % (16 * n_tiles) == 0
    tile_h = frame_h // n_tiles
    pipe = IntraPipeline(tile_h, frame_w, qp)

    def encode_tile(src_y, src_cb, src_cr):
        # shard_map passes the local tile band
        modes = pipe._search_impl(src_y)
        out = pipe._waves_impl(src_y, src_cb, src_cr, modes)
        # (constants stay closure-embedded here: the tile program is
        # compiled once per mesh; acceptable)
        return (modes.reshape(pipe.rows, pipe.cols), out["rec_y"],
                out["rec_cb"], out["rec_cr"], out["levels16_y"],
                out["levels16_cb"], out["levels16_cr"])

    sharded = shard_map(
        encode_tile, mesh=mesh,
        in_specs=(P("tiles", None), P("tiles", None), P("tiles", None)),
        out_specs=(P("tiles", None), P("tiles", None), P("tiles", None),
                   P("tiles", None), P("tiles", None, None),
                   P("tiles", None, None), P("tiles", None, None)),
    )
    return jax.jit(sharded)


def encode_tiled_frame(mesh, frame_h, frame_w, qp, src_y, src_cb, src_cr):
    fn = tile_encode_fn(mesh, frame_h, frame_w, qp)
    return fn(jnp.asarray(src_y, jnp.int32), jnp.asarray(src_cb, jnp.int32),
              jnp.asarray(src_cr, jnp.int32))
