"""--slices tiles|wpp: one slice segment per tile / WPP row.

Dependent slice segments (spec 7.4.7.1) after the first; streams must
decode hash-exactly in our decoder and bit-exactly (luma) in ffmpeg.
Reference parity: kvazaar --slices (src/encoder_state-bitstream.c:915,
cfg.c slices options).
"""
import os
import tempfile

import numpy as np
import pytest

from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frame(w, h, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = np.clip(90 + 60 * np.sin(xx / 17) * np.cos(yy / 13)
                + rng.randint(-18, 18, (h, w)), 0, 255).astype(np.uint8)
    cb = (128 + 30 * np.sin(xx[:h // 2, :w // 2] / 19)).astype(np.uint8)
    cr = (128 + 30 * np.cos(yy[:h // 2, :w // 2] / 23)).astype(np.uint8)
    return y, cb, cr


def _n_slice_nals(stream):
    from kvazaar_tpu.bitstream import split_annexb
    return sum(1 for t, _, _ in split_annexb(stream) if t < 32)


def _cv2_luma_check(stream, infos, w, h):
    cv2 = pytest.importorskip("cv2")
    with tempfile.NamedTemporaryFile(suffix=".hevc", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        cap = cv2.VideoCapture(path)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i, info in enumerate(infos):
            ok, frame = cap.read()
            assert ok, f"ffmpeg could not decode frame {i}"
            ydec = frame.reshape(-1)[: h * w].reshape(h, w)
            assert np.array_equal(
                ydec, np.asarray(info["recon_out"][0], np.uint8))
    finally:
        os.unlink(path)


def test_slices_wpp_intra(rng):
    w, h = 256, 192
    frames = [_frame(w, h, rng) for _ in range(2)]
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=1,
                 wpp=1, slices="wpp")
    stream, infos = encode_sequence(cfg, frames)
    assert _n_slice_nals(stream) == 2 * (h // 64)   # one NAL per row
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2 and all(f.hash_ok for f in dec)
    _cv2_luma_check(stream, infos, w, h)


def test_slices_wpp_inter(rng):
    w, h = 192, 128
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (60 + xx // 3 + yy // 5 + rng.randint(-20, 20, (h, w)))
    frames = []
    for i in range(3):
        y = np.clip(np.roll(base, 3 * i, axis=1), 0, 255).astype(np.uint8)
        cb = (128 + 30 * np.sin(xx[:h // 2, :w // 2] / 9)).astype(np.uint8)
        cr = (128 + 30 * np.cos(yy[:h // 2, :w // 2] / 7)).astype(np.uint8)
        frames.append((y, cb, cr))
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 wpp=1, slices="wpp")
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 3 and all(f.hash_ok for f in dec)
    _cv2_luma_check(stream, infos, w, h)


def test_slices_tiles_intra(rng):
    w, h = 256, 128
    frames = [_frame(w, h, rng)]
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=1,
                 tiles=(2, 2), slices="tiles")
    stream, infos = encode_sequence(cfg, frames)
    assert _n_slice_nals(stream) == 4      # one NAL per tile
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 1 and dec[0].hash_ok
    _cv2_luma_check(stream, infos, w, h)


def test_slices_option_validation():
    with pytest.raises(ValueError):
        from kvazaar_tpu.api import Encoder
        Encoder(Config(width=64, height=64, slices="wpp"))
