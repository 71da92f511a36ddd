"""Multi-depth (quadtree) intra path: partition sanity, conformance, and
the ffmpeg (OpenCV) oracle on the luma plane."""
import os
import tempfile

import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _mixed_frame(w, h, rng):
    """Flat / gradient / noise regions to exercise all CU sizes."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = (96 + xx // 4 + yy // 8).astype(np.uint8)
    y[: h // 2, : w // 2] = 80
    y[h // 2:, w // 2:] = rng.randint(0, 255, (h - h // 2, w - w // 2))
    cb = (128 + 30 * np.sin(xx[: h // 2, : w // 2] / 9)).astype(np.uint8)
    cr = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
    return y, cb, cr


def test_partition_adapts(rng):
    w = h = 128
    y, cb, cr = _mixed_frame(w, h, rng)
    enc = Encoder(Config(width=w, height=h, qp=32))
    assert enc.use_md
    d = enc._pipeline.materialize(enc._pipeline.submit(y, cb, cr))
    hist = {s: int((d["size_map8"] == s).sum()) for s in (8, 16, 32)}
    assert hist[32] > 0          # flat quadrant merges
    assert hist[8] + hist[16] > 0  # noise quadrant splits


# (192, 128): ≥2 CTB rows x ≥3 CTB cols — regression for the coding-order
# key (whole-grid Morton ordered CTB(1,1) before CTB(0,2))
@pytest.mark.parametrize("w,h", [(128, 128), (80, 72), (192, 64),
                                 (192, 128)])
@pytest.mark.parametrize("qp,tools", [(22, {}),
                                      (32, dict(signhide_enable=True,
                                                rdoq_enable=True,
                                                wpp=True)),
                                      (40, dict(sao_type="full"))])
def test_md_conformance(rng, w, h, qp, tools):
    cfg = Config(width=w, height=h, qp=qp, **tools)
    frames = [_mixed_frame(w, h, rng) for _ in range(2)]
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2
    for f, info in zip(dec, infos):
        assert f.hash_ok
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_md_beats_fixed_grid(rng):
    """Quadtree RDO should not lose to the fixed 16x16 grid in bytes at
    equal-or-better luma PSNR on mixed content."""
    w = h = 192
    frames = [_mixed_frame(w, h, rng)]
    s_md, i_md = encode_sequence(Config(width=w, height=h, qp=32), frames)
    s_16, i_16 = encode_sequence(
        Config(width=w, height=h, qp=32, ctu_size=16), frames)
    rd_md = len(s_md) * 0.1 ** (i_md[0]["psnr"][0] / 10)
    rd_16 = len(s_16) * 0.1 ** (i_16[0]["psnr"][0] / 10)
    assert rd_md < rd_16


@pytest.mark.parametrize("rng_,allowed", [((1, 1), {32}), ((2, 2), {16}),
                                          ((3, 3), {8}), ((1, 2), {16, 32})])
def test_pu_depth_constraints(rng, rng_, allowed):
    """--pu-depth-intra limits leaf sizes and stays conformant."""
    w = h = 128
    y, cb, cr = _mixed_frame(w, h, rng)
    cfg = Config(width=w, height=h, qp=32, pu_depth_intra=rng_)
    stream, infos = encode_sequence(cfg, [(y, cb, cr)])
    f = HEVCDecoder().decode(stream)[0]
    assert f.hash_ok
    enc = Encoder(cfg)
    d = enc._pipeline.materialize(enc._pipeline.submit(y, cb, cr))
    used = {s for s in (8, 16, 32) if (d["size_map8"] == s).any()}
    assert used <= allowed


def test_md_cv2_oracle(rng):
    cv2 = pytest.importorskip("cv2")
    w, h = 128, 64
    frames = [_mixed_frame(w, h, rng) for _ in range(2)]
    cfg = Config(width=w, height=h, qp=27, signhide_enable=True)
    stream, infos = encode_sequence(cfg, frames)
    with tempfile.NamedTemporaryFile(suffix=".hevc", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        cap = cv2.VideoCapture(path)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for info in infos:
            ok, frame = cap.read()
            assert ok, "ffmpeg could not decode the stream"
            ydec = frame.reshape(-1)[: h * w].reshape(h, w)
            assert np.array_equal(ydec, np.asarray(info["recon_out"][0],
                                                   np.uint8))
    finally:
        os.unlink(path)
