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


def test_deblock_jax_matches_numpy_oracle(rng):
    """deblock_frame_jax must be bit-exact vs the NumPy reference for
    random pictures, random BS maps, and several QPs."""
    import jax
    from kvazaar_tpu.ops.deblock import deblock_frame
    from kvazaar_tpu.ops.deblock_jax import deblock_frame_jax
    from kvazaar_tpu.tables import chroma_qp
    h, w = 96, 128
    for qp in (18, 30, 45):
        y = rng.randint(0, 256, (h, w)).astype(np.int32)
        cb = rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32)
        cr = rng.randint(0, 256, (h // 2, w // 2)).astype(np.int32)
        bs_ver = rng.randint(0, 3, (h // 4, w // 8)).astype(np.int8)
        bs_hor = rng.randint(0, 3, (h // 8, w // 4)).astype(np.int8)
        qc = chroma_qp(qp)
        ry, rcb, rcr = deblock_frame(y.copy(), cb.copy(), cr.copy(),
                                     bs_ver.copy(), bs_hor.copy(),
                                     qp, qc, qc, 0, 0)
        jy, jcb, jcr = jax.jit(deblock_frame_jax, static_argnums=(8, 9))(
            y, cb, cr, bs_ver, bs_hor, qp, qc, qc)
        assert np.array_equal(np.asarray(jy), ry), f"luma qp{qp}"
        assert np.array_equal(np.asarray(jcb), rcb), f"cb qp{qp}"
        assert np.array_equal(np.asarray(jcr), rcr), f"cr qp{qp}"


def test_device_deblock_e2e(rng):
    """Device-pipeline encode with in-loop deblocking stays conformant
    (decoder independently derives BS from syntax) for intra and inter."""
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    from kvazaar_tpu.decoder.decoder import HEVCDecoder
    w, h = 128, 96
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for i in range(4):
        y = (128 + 80 * np.sin((xx + 3 * i) / 9) * np.cos((yy + 2 * i) / 11)
             ).astype(np.uint8)
        c = (128 + 50 * np.sin((xx[:h // 2, :w // 2] + 3 * i) / 13)
             ).astype(np.uint8)
        frames.append((y, c, c))
    for kw in (dict(intra_period=1), dict(intra_period=0, ref_frames=2)):
        cfg = Config(width=w, height=h, qp=30, ctu_size=16,
                     deblock_enable=True, **kw)
        out, _ = encode_sequence(cfg, frames)
        dec = HEVCDecoder().decode(out)
        assert len(dec) == 4 and all(f.hash_ok for f in dec), kw
