"""Tiles: geometry, decoding reference tile streams, and tiled-encoder
conformance (our decoder + entry-point/substream structure).

Mirrors the reference's tests/test_owf_wpp_tiles.sh matrix (tiles 2x2,
uneven u2 splits) with our two oracles."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder
from kvazaar_tpu.hevc.tiles import TileGrid, uniform_split


def test_geometry_uniform():
    # H.265 eq 6-3: uniform split of 5 columns into 2 tiles -> [2, 3]
    assert uniform_split(5, 2) == [2, 3]
    assert uniform_split(7, 3) == [2, 2, 3]
    g = TileGrid.make(5, 3, 2, 2)
    assert g.col_widths == [2, 3] and g.row_heights == [1, 2]
    assert g.tile_id_ctb.tolist() == [[0, 0, 1, 1, 1],
                                      [2, 2, 3, 3, 3],
                                      [2, 2, 3, 3, 3]]
    # tile-scan order covers each CTB once, tiles in raster order
    seen = list(g.scan())
    assert len(seen) == 15
    assert [t for _, _, t, _ in seen] == sorted(t for _, _, t, _ in seen)
    lasts = [(x, y) for x, y, _, l in seen if l]
    assert lasts == [(1, 0), (4, 0), (1, 2), (4, 2)]


def _mixed_frames(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = (70 + xx // 4 + yy // 6 + 5 * i).astype(np.uint8)
        y[h // 2:, : w // 2] = rng.randint(0, 255, (h - h // 2, w // 2))
        cb = (128 + 20 * np.sin(xx[: h // 2, : w // 2] / 9)).astype(
            np.uint8)
        cr = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def _write_yuv(path, frames):
    with open(path, "wb") as f:
        for y, cb, cr in frames:
            f.write(y.tobytes())
            f.write(cb.tobytes())
            f.write(cr.tobytes())


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
@pytest.mark.parametrize("flags", [
    ["--tiles", "2x2", "-p", "1", "--no-sao"],
    ["--tiles", "2x2", "-p", "1"],                    # + deblock
    ["--tiles", "3x1", "-p", "1", "--sao", "full"],
    ["--tiles", "2x2", "--no-sao"],                   # inter
    ["--tiles", "2x2", "--sao", "full"],              # inter + loopfilters
    ["--tiles-width-split", "u2", "--tiles-height-split", "u3",
     "-p", "1"],
])
def test_decode_reference_tile_stream(tmp_path, rng, flags):
    w, h = 320, 192
    frames = _mixed_frames(w, h, 3, rng)
    yuv = str(tmp_path / "in.yuv")
    hevc = str(tmp_path / "out.hevc")
    _write_yuv(yuv, frames)
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "30", "--threads", "0", "--hash", "checksum"] + flags,
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 3
    for f in dec:
        assert f.hash_ok, f"hash mismatch for tiles flags {flags}"


@pytest.mark.parametrize("w,h,tiles", [(256, 128, (2, 2)),
                                       (320, 192, (2, 2)),
                                       (200, 136, (2, 1))])
@pytest.mark.parametrize("tools", [{}, dict(sao_type="full"),
                                   dict(signhide_enable=True,
                                        rdoq_enable=True)])
def test_tiled_encode_conformance(rng, w, h, tiles, tools):
    frames = _mixed_frames(w, h, 2, rng)
    cfg = Config(width=w, height=h, qp=30, tiles=tiles, **tools)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2
    for f, info in zip(dec, infos):
        assert f.hash_ok
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_tiled_substream_structure(rng):
    """PPS signals the grid; slice has n_tiles-1 entry points."""
    from kvazaar_tpu.bitstream import split_annexb, ebsp_to_rbsp
    from kvazaar_tpu.hevc.headers import parse_pps
    w = h = 128
    cfg = Config(width=w, height=h, qp=32, tiles=(2, 2))
    stream, _ = encode_sequence(cfg, _mixed_frames(w, h, 1, rng))
    pps = None
    for nal_type, _tid, ebsp in split_annexb(stream):
        if nal_type == 34:
            pps = parse_pps(ebsp_to_rbsp(ebsp))
    assert pps is not None and pps.tiles_enabled
    assert pps.num_tile_columns == 2 and pps.num_tile_rows == 2
    assert pps.loop_filter_across_tiles == 0


def test_tiles_disable_wpp(rng):
    cfg = Config(width=128, height=128, qp=32, tiles=(2, 2), wpp=True)
    enc = Encoder(cfg)
    assert enc.pps.entropy_coding_sync_enabled == 0
    assert enc.tile_grid is not None
