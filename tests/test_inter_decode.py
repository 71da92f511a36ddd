"""Inter (P/B slice) decoding conformance vs reference-encoder streams."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.decoder.decoder import HEVCDecoder

pytestmark = pytest.mark.skipif(not have_ref_encoder(),
                                reason="reference encoder not built")


def _make_motion_yuv(path, w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with open(path, "wb") as f:
        for i in range(n):
            dx, dy = int(3.7 * i), int(2.3 * i)
            y = (128 + 80 * np.sin((xx + dx) / 9) * np.cos((yy + dy) / 11)
                 + 20 * np.sin((xx + yy + 5 * i) / 23))
            u = 128 + 50 * np.sin((xx[:h // 2, :w // 2] + dx) / 13)
            v = 128 + 50 * np.cos((yy[:h // 2, :w // 2] + dy) / 15)
            f.write(y.astype(np.uint8).tobytes())
            f.write(u.astype(np.uint8).tobytes())
            f.write(v.astype(np.uint8).tobytes())


@pytest.mark.parametrize("gop,extra", [
    ("0", ["--ref", "1"]),
    ("0", ["--ref", "2"]),
    ("0", ["--ref", "1", "--bipred"]),
    ("0", ["--ref", "2", "--wpp"]),
    ("8", ["--ref", "2"]),
    ("8", ["--ref", "2", "--deblock", "0:0"]),
    ("0", ["--ref", "2", "--deblock", "1:1"]),
])
def test_decode_inter_stream(tmp_path, rng, gop, extra):
    w, h = 128, 96
    yuv = str(tmp_path / "m.yuv")
    _make_motion_yuv(yuv, w, h, 5, rng)
    out = str(tmp_path / "m.hevc")
    cmd = [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", out,
           "--preset", "ultrafast", "--gop", gop, "-p", "0", "--qp", "30",
           "--hash", "checksum", "--no-sao", "--threads", "0"]
    if "--deblock" not in extra:
        cmd += ["--no-deblock"]
    cmd += extra if "--wpp" in extra else ["--no-wpp"] + extra
    subprocess.run(cmd, check=True, capture_output=True)
    frames = HEVCDecoder().decode(open(out, "rb").read())
    assert len(frames) == 5
    for f in frames:
        assert f.hash_ok


@pytest.mark.parametrize("preset", ["ultrafast", "fast", "medium", "veryslow"])
def test_decode_full_default_presets(tmp_path, rng, preset):
    """kvazaar presets with ALL defaults (deblock+SAO+WPP+GOP+bipred)."""
    w, h = 128, 96
    yuv = str(tmp_path / "m.yuv")
    _make_motion_yuv(yuv, w, h, 6, rng)
    out = str(tmp_path / "m.hevc")
    subprocess.run([REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}",
                    "-o", out, "--preset", preset, "--qp", "32",
                    "--hash", "checksum", "--threads", "0"],
                   check=True, capture_output=True)
    frames = HEVCDecoder().decode(open(out, "rb").read())
    assert len(frames) == 6
    for f in frames:
        assert f.hash_ok


@pytest.mark.parametrize("extra", [["-p", "1"], ["--gop", "8", "-p", "0"]])
def test_decode_sao_streams(tmp_path, rng, extra):
    w, h = 96, 80
    yuv = str(tmp_path / "m.yuv")
    _make_motion_yuv(yuv, w, h, 4, rng)
    out = str(tmp_path / "m.hevc")
    subprocess.run([REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}",
                    "-o", out, "--preset", "ultrafast", "--qp", "30",
                    "--hash", "checksum", "--sao", "full", "--no-wpp",
                    "--threads", "0"] + extra,
                   check=True, capture_output=True)
    frames = HEVCDecoder().decode(open(out, "rb").read())
    assert len(frames) == 4 and all(f.hash_ok for f in frames)
