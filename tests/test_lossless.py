"""Lossless coding (cu_transquant_bypass, kvazaar --lossless):
reference-stream decode + our-encoder source-exact round trip."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = (80 + xx // 4 + yy // 6 + i * 9).astype(np.uint8)
        y[h // 2:, : w // 2] = rng.randint(0, 255, (h - h // 2, w // 2))
        cb = (128 + 20 * np.sin(xx[: h // 2, : w // 2] / 7 + i)).astype(
            np.uint8)
        cr = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
@pytest.mark.parametrize("flags,source_exact", [
    (["-p", "1", "--lossless"], True),
    (["-p", "1", "--lossless", "--sao", "full"], True),  # SAO exempt
    (["--lossless"], False),       # kvazaar may pick lossy skip CUs
])
def test_decode_reference_lossless(tmp_path, rng, flags, source_exact):
    w, h = 320, 192
    frames = _frames(w, h, 3, rng)
    yuv = str(tmp_path / "in.yuv")
    with open(yuv, "wb") as f:
        for y, cb, cr in frames:
            f.write(y.tobytes() + cb.tobytes() + cr.tobytes())
    hevc = str(tmp_path / "out.hevc")
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "27", "--threads", "0", "--hash", "checksum"] + flags,
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 3
    for f, (y, cb, cr) in zip(dec, frames):
        assert f.hash_ok
        if source_exact:
            for a, b in zip(f.planes, (y, cb, cr)):
                assert np.array_equal(np.asarray(a, np.uint8), b)


@pytest.mark.parametrize("w,h", [(128, 128), (192, 64)])
def test_lossless_encode_source_exact(rng, w, h):
    frames = _frames(w, h, 2, rng)
    cfg = Config(width=w, height=h, qp=30, lossless=True)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2
    for f, (y, cb, cr) in zip(dec, frames):
        assert f.hash_ok
        for a, b in zip(f.planes, (y, cb, cr)):
            assert np.array_equal(np.asarray(a, np.uint8), b)
        # PSNR must report lossless
    assert all(p == 99.0 for p in infos[0]["psnr"])
