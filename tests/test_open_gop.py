"""Open GOP (CRA + RASL leading pictures).

Our encoder: --open-gop turns period boundaries into CRA_NUT pictures
with RASL leading pictures and a continuing POC; streams decode
hash-exactly. Also decodes reference open-GOP streams.
Reference parity: kvazaar src/encoderstate.c:1552-1625 NAL typing."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.bitstream import (NAL_CRA_NUT, NAL_IDR_W_RADL,
                                   NAL_RASL_N, NAL_RASL_R, split_annexb)
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = np.clip(60 + xx // 3 + yy // 5
                    + rng.randint(-9, 9, (h, w)) + 4 * i, 0,
                    255).astype(np.uint8)
        cb = (128 + 20 * np.sin(xx[: h // 2, : w // 2] / 7 + i)) \
            .astype(np.uint8)
        cr = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def test_open_gop_structure_and_conformance(rng):
    w = h = 128
    n = 12
    frames = _frames(w, h, n, rng)
    cfg = Config(width=w, height=h, qp=32, ctu_size=16, gop_len=4,
                 intra_period=8, open_gop=True)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == n
    for f in dec:
        assert f.hash_ok
    nal_types = [t for t, _, _ in split_annexb(stream) if t < 32]
    assert nal_types.count(NAL_IDR_W_RADL) == 1        # only frame 0
    assert nal_types.count(NAL_CRA_NUT) >= 1           # period boundary
    assert (nal_types.count(NAL_RASL_R)
            + nal_types.count(NAL_RASL_N)) >= 3        # leading B pics
    # POC continues across the CRA (no reset)
    pocs = [i["poc"] for i in infos]
    assert max(pocs) >= 8


def test_open_gop_closed_still_default(rng):
    w = h = 128
    frames = _frames(w, h, 12, rng)
    cfg = Config(width=w, height=h, qp=32, ctu_size=16, gop_len=4,
                 intra_period=8)
    stream, _ = encode_sequence(cfg, frames)
    nal_types = [t for t, _, _ in split_annexb(stream) if t < 32]
    assert nal_types.count(NAL_IDR_W_RADL) == 2
    assert nal_types.count(NAL_CRA_NUT) == 0


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
def test_decode_reference_open_gop_stream(tmp_path, rng):
    w, h = 320, 192
    frames = _frames(w, h, 12, rng)
    yuv = str(tmp_path / "in.yuv")
    with open(yuv, "wb") as f:
        for y, cb, cr in frames:
            f.write(y.tobytes())
            f.write(cb.tobytes())
            f.write(cr.tobytes())
    hevc = str(tmp_path / "out.hevc")
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "30", "--threads", "0", "--hash", "checksum",
         "--gop", "8", "-p", "8", "--open-gop"],
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 12
    for f in dec:
        assert f.hash_ok
