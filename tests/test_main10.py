"""Main 10 (10-bit): decoding reference 10-bit streams hash-exactly and
10-bit encoding on the quadtree path.

The 10-bit reference encoder is built at .refbuild10 (KVZ_BIT_DEPTH=10);
tests skip when absent."""
import os
import subprocess

import numpy as np
import pytest

REF10 = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild10", "bin", "kvazaar")

from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames10(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = ((280 + xx + yy // 2 + 20 * i) % 1024).astype(np.uint16)
        y[h // 2:, : w // 2] = rng.randint(0, 1024, (h - h // 2, w // 2))
        cb = (512 + 80 * np.sin(xx[: h // 2, : w // 2] / 9)).astype(
            np.uint16)
        cr = rng.randint(0, 1024, (h // 2, w // 2)).astype(np.uint16)
        out.append((y, cb, cr))
    return out


@pytest.mark.skipif(not os.path.exists(REF10),
                    reason="10-bit reference encoder not built")
@pytest.mark.parametrize("flags", [
    ["-p", "1", "--no-sao"],
    ["-p", "1", "--sao", "full", "--rdoq", "--signhide"],
    [],                                               # inter
])
def test_decode_reference_10bit(tmp_path, rng, flags):
    w, h = 320, 192
    frames = _frames10(w, h, 3, rng)
    yuv = str(tmp_path / "in.yuv")
    with open(yuv, "wb") as f:
        for y, cb, cr in frames:
            f.write(y.astype("<u2").tobytes())
            f.write(cb.astype("<u2").tobytes())
            f.write(cr.astype("<u2").tobytes())
    hevc = str(tmp_path / "out.hevc")
    subprocess.run(
        [REF10, "-i", yuv, "--input-res", f"{w}x{h}",
         "--input-bitdepth", "10", "-o", hevc, "-q", "30",
         "--threads", "0", "--hash", "checksum"] + flags,
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 3
    for f in dec:
        assert f.hash_ok, f"hash mismatch for 10-bit flags {flags}"


@pytest.mark.parametrize("tools", [{}, dict(sao_type="full",
                                            signhide_enable=True,
                                            rdoq_enable=True),
                                   dict(lossless=True)])
def test_10bit_encode_conformance(rng, tools):
    w = h = 128
    frames = _frames10(w, h, 2, rng)
    cfg = Config(width=w, height=h, qp=30, input_bitdepth=10, **tools)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2
    for f, (info, src) in zip(dec, zip(infos, frames)):
        assert f.hash_ok
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        if tools.get("lossless"):
            for a, b in zip(f.planes, src):
                assert np.array_equal(np.asarray(a, np.uint16), b)
