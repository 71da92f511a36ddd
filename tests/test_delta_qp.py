"""Delta QP (cu_qp_delta, spec 8.6.1): decode reference VAQ streams
hash-exactly, then (encoder side) VAQ/ROI conformance on our streams.

Reference parity: kvazaar --vaq (src/encoderstate.c:1444-1526 variance
offsets, src/rate_control.c:1082 LCU QP application) enables
pps_cu_qp_delta_enabled with diff depth 0 (QG = CTB)."""
import subprocess

import numpy as np
import pytest

from conftest import REF_ENCODER, have_ref_encoder
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _mixed_yuv(path, w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with open(path, "wb") as f:
        for i in range(n):
            y = (80 + xx // 4 + yy // 6 + i * 9).astype(np.uint8)
            y[h // 2:, : w // 2] = rng.randint(0, 255,
                                               (h - h // 2, w // 2))
            f.write(y.tobytes())
            f.write((128 + 20 * np.sin(xx[: h // 2, : w // 2] / 7 + i))
                    .astype(np.uint8).tobytes())
            f.write(rng.randint(0, 255, (h // 2, w // 2))
                    .astype(np.uint8).tobytes())


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
@pytest.mark.parametrize("flags", [
    ["-p", "1", "--vaq", "8", "--no-sao"],
    ["-p", "1", "--vaq", "8"],
    ["-p", "1", "--vaq", "8", "--sao", "full", "--rdoq", "--signhide"],
    ["--vaq", "8"],                                    # inter
    ["-p", "1", "--vaq", "8", "--wpp", "--owf", "0"],
    ["-p", "1", "--vaq", "8", "--tiles", "2x2"],
])
def test_decode_reference_vaq_stream(tmp_path, rng, flags):
    w, h = 320, 192
    yuv = str(tmp_path / "in.yuv")
    hevc = str(tmp_path / "out.hevc")
    _mixed_yuv(yuv, w, h, 3, rng)
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "30", "--threads", "0", "--hash", "checksum"] + flags,
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 3
    for f in dec:
        assert f.hash_ok, f"hash mismatch for vaq flags {flags}"


@pytest.mark.skipif(not have_ref_encoder(),
                    reason="reference encoder not built")
def test_decode_vaq_nxn_trdepth_stream(tmp_path, rng):
    """cu_qp_delta with NxN / 4x4 TU splits: the qp-delta condition must
    use the PARENT chroma cbfs for all four 4x4 children (spec 7.3.8.10;
    a first child with cbf_luma=0 but coded chroma still codes the
    delta). Low-detail luma + chroma-heavy content + rd 3 exercises it."""
    w, h = 192, 128
    yuv = str(tmp_path / "in.yuv")
    hevc = str(tmp_path / "out.hevc")
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    with open(yuv, "wb") as f:
        for i in range(3):
            f.write((120 + xx // 48 + yy // 48 + i)
                    .astype(np.uint8).tobytes())
            f.write(rng.randint(0, 255, (h // 2, w // 2))
                    .astype(np.uint8).tobytes())
            f.write(rng.randint(0, 255, (h // 2, w // 2))
                    .astype(np.uint8).tobytes())
    subprocess.run(
        [REF_ENCODER, "-i", yuv, "--input-res", f"{w}x{h}", "-o", hevc,
         "-q", "34", "--threads", "0", "--hash", "checksum", "-p", "1",
         "--vaq", "8", "--rd", "3", "--tr-depth-intra", "2",
         "--no-sao"],
        check=True, capture_output=True)
    dec = HEVCDecoder().decode(open(hevc, "rb").read())
    assert len(dec) == 3
    for f in dec:
        assert f.hash_ok


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


@pytest.mark.parametrize("w,h,tools", [
    (128, 128, {}),
    (192, 128, dict(signhide_enable=True, rdoq_enable=True)),
    (128, 128, dict(wpp=True)),
    (128, 128, dict(sao_type="full")),
    (256, 128, dict(tiles=(2, 1))),
])
def test_vaq_encode_conformance(rng, w, h, tools):
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    cfg = Config(width=w, height=h, qp=32, vaq=8, **tools)
    stream, infos = encode_sequence(cfg, _frames(w, h, 2, rng))
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 2
    for f, info in zip(dec, infos):
        assert f.hash_ok
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_vaq_adapts_qp(rng):
    """Noisy CTBs get higher QP than flat CTBs."""
    from kvazaar_tpu.api import Encoder
    from kvazaar_tpu.cfg import Config
    w = h = 128
    y = np.full((h, w), 100, np.uint8)
    y[64:, :64] = rng.randint(0, 255, (64, 64))    # noisy CTB (1, 0)
    cb = np.full((h // 2, w // 2), 120, np.uint8)
    cr = np.full((h // 2, w // 2), 130, np.uint8)
    enc = Encoder(Config(width=w, height=h, qp=32, vaq=8))
    qm = enc._qp_map_for(y, cb, cr, 32)
    assert qm.shape == (2, 2)
    assert qm[1, 0] > qm[0, 0]  # noise quadrant above the flat one


def test_lcu_rate_control_conformance(rng):
    """ABR with per-CTB QP allocation (delta-QP in-stream): conformant
    and the per-CTB QPs actually differ within a frame."""
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    w, h = 192, 128
    cfg = Config(width=w, height=h, qp=32, target_bitrate=500_000,
                 framerate_num=30, framerate_denom=1)
    stream, infos = encode_sequence(cfg, _frames(w, h, 4, rng))
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 4 and all(f.hash_ok for f in dec)
    for f, info in zip(dec, infos):
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_roi_encode_conformance(rng, tmp_path):
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    w = h = 128
    roi = tmp_path / "roi.txt"
    roi.write_text("2 2\n-6 4\n4 -6\n")
    cfg = Config(width=w, height=h, qp=32, roi_file=str(roi))
    stream, infos = encode_sequence(cfg, _frames(w, h, 1, rng))
    dec = HEVCDecoder().decode(stream)
    f = dec[0]
    assert f.hash_ok
    for a, b in zip(f.planes, infos[0]["recon_out"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_oba_rate_control_conformance(rng):
    """OBA (--rc-algorithm oba): C/K-model lambda solve, conformant."""
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    w, h = 128, 128
    cfg = Config(width=w, height=h, qp=32, target_bitrate=500_000,
                 framerate_num=30, framerate_denom=1,
                 rc_algorithm="oba")
    stream, infos = encode_sequence(cfg, _frames(w, h, 4, rng))
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 4 and all(f.hash_ok for f in dec)
    assert len({i["qp"] for i in infos}) > 1  # the model moved QP
