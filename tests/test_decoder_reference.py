"""Conformance: decode reference-encoder (kvazaar) bitstreams hash-exactly.

Mirrors the role HM's TAppDecoder plays in the reference's tests/util.sh —
here our own decoder is the oracle complement, itself validated against
reference bitstreams.
"""
import os
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.decoder.decoder import HEVCDecoder

pytestmark = pytest.mark.skipif(not have_ref_encoder(),
                                reason="reference encoder not built")


def _make_yuv(path, w, h, n, kind, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with open(path, "wb") as f:
        for i in range(n):
            if kind == "grad":
                y = ((np.arange(w * h).reshape(h, w) + i * 7) % 256)
            elif kind == "noise":
                y = rng.randint(0, 255, (h, w))
            else:
                y = 128 + 100 * np.sin(xx / 9 + i) * np.cos(yy / 13)
            u = rng.randint(0, 255, (h // 2, w // 2))
            v = 40 + i * 3 + xx[:h // 2, :w // 2] // 2
            f.write(y.astype(np.uint8).tobytes())
            f.write(u.astype(np.uint8).tobytes())
            f.write(v.astype(np.uint8).tobytes())


def _encode(yuv, w, h, out, qp, extra):
    cmd = [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", out,
           "--preset", "ultrafast", "-p", "1", "--qp", str(qp),
           "--hash", "checksum", "--no-deblock", "--no-sao",
           "--threads", "0"]
    cmd += extra if "--wpp" in extra else ["--no-wpp"] + extra
    subprocess.run(cmd, check=True, capture_output=True)


@pytest.mark.parametrize("w,h,kind", [(64, 64, "grad"), (48, 40, "sine"),
                                      (128, 96, "noise")])
@pytest.mark.parametrize("qp,extra", [
    (27, []), (37, ["--signhide"]), (32, ["--rdoq", "--signhide"]),
    (27, ["--wpp"]), (48, []), (12, []),
])
def test_decode_reference_stream(tmp_path, rng, w, h, kind, qp, extra):
    yuv = str(tmp_path / "in.yuv")
    hevc = str(tmp_path / "out.hevc")
    _make_yuv(yuv, w, h, 2, kind, rng)
    _encode(yuv, w, h, hevc, qp, extra)
    frames = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(frames) == 2
    for f in frames:
        assert f.hash_ok, f"hash mismatch ({w}x{h} {kind} qp{qp} {extra})"
