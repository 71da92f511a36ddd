"""Scaling lists (spec 7.3.4/8.6.3) + transform-skip reconstruction:
reference-stream decode validation and our-encoder conformance.

Reference parity: kvazaar --scaling-list default (src/scalinglist.c) and
--transform-skip (src/transform.c trskip path)."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder
from kvazaar_tpu.hevc.scaling import (ScalingLists, default_list,
                                      parse_scaling_list_data,
                                      write_scaling_list_data)


def test_default_matrix_expansion():
    sl = ScalingLists()
    m8 = sl.matrix(8, 0)
    assert m8[0, 0] == 16 and m8[7, 7] == 115
    m16 = sl.matrix(16, 0)
    assert m16[0, 0] == 16            # DC override
    assert m16[2, 2] == m8[1, 1]
    m32 = sl.matrix(32, 3)
    assert m32[31, 31] == default_list(3, 3)[7, 7]
    # forward tables invert m: flat 4x4 positions equal the plain scale
    qt = sl.quant_table(4, 0)
    from kvazaar_tpu.tables import QUANT_SCALES
    assert (qt == np.asarray(QUANT_SCALES)[:, None, None]).all()


def test_scaling_list_data_roundtrip(rng):
    from kvazaar_tpu.bitstream import BitReader, BitWriter
    sl = ScalingLists()
    sl.lists[(1, 2)] = rng.randint(1, 200, (8, 8)).astype(np.int32)
    sl.lists[(2, 4)] = rng.randint(1, 200, (8, 8)).astype(np.int32)
    sl.dc[(2, 4)] = 23
    bw = BitWriter()
    write_scaling_list_data(bw, sl)
    bw.u(1, 1)  # stop bit so byte padding doesn't hide errors
    bw.byte_align_one()
    out = parse_scaling_list_data(BitReader(bw.get_bytes()))
    for k in sl.lists:
        assert np.array_equal(out.lists[k], sl.lists[k]), k
    assert out.dc == sl.dc


def _mixed_yuv(path, w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with open(path, "wb") as f:
        for i in range(n):
            y = (80 + xx // 4 + yy // 6 + i * 9).astype(np.uint8)
            y[h // 2:, : w // 2] = rng.randint(0, 255,
                                               (h - h // 2, w // 2))
            f.write(y.tobytes())
            f.write((128 + 20 * np.sin(xx[: h // 2, : w // 2] / 7 + i))
                    .astype(np.uint8).tobytes())
            f.write(rng.randint(0, 255, (h // 2, w // 2))
                    .astype(np.uint8).tobytes())


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
@pytest.mark.parametrize("flags", [
    ["-p", "1", "--scaling-list", "default"],
    ["--scaling-list", "default", "--rdoq"],           # inter
    ["-p", "1", "--scaling-list", "default", "--transform-skip"],
])
def test_decode_reference_scaling_stream(tmp_path, rng, flags):
    w, h = 320, 192
    yuv = str(tmp_path / "in.yuv")
    hevc = str(tmp_path / "out.hevc")
    _mixed_yuv(yuv, w, h, 3, rng)
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "27", "--threads", "0", "--hash", "checksum"] + flags,
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 3 and all(f.hash_ok for f in dec)


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
def test_decode_reference_trskip_heavy(tmp_path, rng):
    """Screen-content stream where kvazaar actually selects trskip for
    most TUs (regression: the flag used to be parsed but ignored)."""
    import kvazaar_tpu.decoder.decoder as D
    import kvazaar_tpu.syntax.residual as R
    w, h = 192, 128
    y = np.full((h, w), 235, np.uint8)
    for _ in range(40):
        x0, y0 = rng.randint(0, w - 20), rng.randint(0, h - 12)
        y[y0:y0 + rng.randint(2, 12), x0:x0 + rng.randint(2, 20)] = \
            rng.choice([16, 80, 160, 235])
    y[rng.rand(h, w) < 0.03] = 16
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    yuv = str(tmp_path / "in.yuv")
    with open(yuv, "wb") as f:
        f.write(y.tobytes() + cb.tobytes() + cb.tobytes())
    hevc = str(tmp_path / "out.hevc")
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "32", "--threads", "0", "--hash", "checksum", "-p", "1",
         "--transform-skip", "--tr-depth-intra", "3", "--rd", "3"],
        check=True, capture_output=True)
    orig = R.decode_residual
    n_ts = [0]

    def counting(*a, **k):
        c, ts = orig(*a, **k)
        n_ts[0] += bool(ts)
        return c, ts

    D.decode_residual = counting
    try:
        dec = HEVCDecoder().decode(open(hevc, "rb").read())
    finally:
        D.decode_residual = orig
    assert all(f.hash_ok for f in dec)
    assert n_ts[0] > 0, "stream exercised no transform-skip TUs"


@pytest.mark.parametrize("tools", [{}, dict(signhide_enable=True,
                                            rdoq_enable=True),
                                   dict(vaq=8)])
def test_scaling_list_encode_conformance(rng, tools):
    w = h = 128
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for i in range(2):
        y = (70 + xx // 4 + yy // 6 + 5 * i).astype(np.uint8)
        y[h // 2:, : w // 2] = rng.randint(0, 255, (h - h // 2, w // 2))
        cb = (128 + 20 * np.sin(xx[: h // 2, : w // 2] / 9)).astype(
            np.uint8)
        cr = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    cfg = Config(width=w, height=h, qp=30, scaling_list="default",
                 **tools)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2
    for f, info in zip(dec, infos):
        assert f.hash_ok
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))
