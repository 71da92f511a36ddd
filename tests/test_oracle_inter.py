"""External-decoder (ffmpeg via OpenCV) oracle on inter streams.

VERDICT r3 weak #7: all inter/B conformance previously rested on the
project's own decoder. Here every P / B / WPP / RDOQ stream must also
decode in ffmpeg with a bit-exact luma plane (cv2 returns Y only; full
planes stay covered by the decoded-picture-hash SEI our decoder checks).
Reference analog: tests/util.sh decodes every stream with HM
(/root/reference/tests/util.sh:19-55).
"""
import os
import tempfile

import numpy as np
import pytest

from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config


def _pan_frames(w, h, n, rng, dx=3, dy=1):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (60 + xx // 3 + yy // 5).astype(np.int32)
    tex = rng.randint(-20, 20, (h, w))
    out = []
    for i in range(n):
        y = np.clip(np.roll(np.roll(base + tex, dx * i, axis=1),
                            dy * i, axis=0), 0, 255).astype(np.uint8)
        cb = (128 + 30 * np.sin((xx[:h // 2, :w // 2] + 5 * i) / 9)) \
            .astype(np.uint8)
        cr = np.roll(rng.randint(0, 255, (h // 2, w // 2)),
                     i, axis=1).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def _cv2_check(stream, infos, w, h):
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
                ydec, np.asarray(info["recon_out"][0], np.uint8)), \
                f"ffmpeg luma mismatch at frame {i}"
    finally:
        os.unlink(path)


@pytest.mark.parametrize("tools", [
    {},
    dict(sao_type="full", rdoq_enable=True, signhide_enable=True),
    dict(wpp=1),
])
def test_cv2_oracle_p_slices(rng, tools):
    w, h = 192, 128
    frames = _pan_frames(w, h, 4, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 **tools)
    stream, infos = encode_sequence(cfg, frames)
    _cv2_check(stream, infos, w, h)


def test_cv2_oracle_b_gop(rng):
    w, h = 192, 128
    frames = _pan_frames(w, h, 9, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 gop_len=8, sao_type="full", rdoq_enable=True)
    stream, infos = encode_sequence(cfg, frames)
    # infos arrive in coding order; cv2 outputs display order
    disp = sorted(infos, key=lambda i: i["poc"])
    _cv2_check(stream, disp, w, h)


def test_cv2_oracle_lowdelay_lp(rng):
    w, h = 192, 128
    frames = _pan_frames(w, h, 5, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 gop_len=4, gop_lowdelay=True, gop_lp=(3, 1))
    stream, infos = encode_sequence(cfg, frames)
    _cv2_check(stream, infos, w, h)
