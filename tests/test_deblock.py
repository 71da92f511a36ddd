"""Deblocking filter conformance vs reference-encoder streams."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.decoder.decoder import HEVCDecoder

pytestmark = pytest.mark.skipif(not have_ref_encoder(),
                                reason="reference encoder not built")


@pytest.mark.parametrize("qp", [18, 32, 45])
@pytest.mark.parametrize("offsets", ["0:0", "2:2", "-2:-1"])
def test_decode_deblocked_stream(tmp_path, rng, qp, offsets):
    w, h = 96, 80
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    yuv = tmp_path / "in.yuv"
    with open(yuv, "wb") as f:
        for i in range(2):
            y = (128 + 100 * np.sin(xx / 9 + i) * np.cos(yy / 13))
            f.write(y.astype(np.uint8).tobytes())
            f.write(rng.randint(0, 255, (h // 2, w // 2)).astype(
                np.uint8).tobytes())
            f.write((40 + xx[:h // 2, :w // 2] // 2).astype(
                np.uint8).tobytes())
    out = tmp_path / "out.hevc"
    subprocess.run([REF_ENCODER, "-i", str(yuv), "--input-res", f"{w}x{h}",
                    "-o", str(out), "--preset", "ultrafast", "-p", "1",
                    "--qp", str(qp), "--hash", "checksum", "--no-sao",
                    "--no-wpp", "--deblock", offsets, "--threads", "0"],
                   check=True, capture_output=True)
    frames = HEVCDecoder().decode(open(out, "rb").read())
    assert len(frames) == 2 and all(f.hash_ok for f in frames)
