"""End-to-end encoder conformance: our streams must decode hash-exactly in
our validation decoder (itself validated against the reference encoder)."""
import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = (128 + 90 * np.sin(xx / 7 + i) * np.cos(yy / 11)).astype(np.uint8)
        cb = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        cr = np.full((h // 2, w // 2), 77, np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("w,h", [(64, 64), (48, 40), (96, 80)])
@pytest.mark.parametrize("qp", [22, 37])
@pytest.mark.parametrize("wpp,sdh", [(False, False), (True, True)])
def test_encode_decode_hash(rng, w, h, qp, wpp, sdh):
    cfg = Config(width=w, height=h, qp=qp, wpp=wpp, signhide_enable=sdh)
    stream, infos = encode_sequence(cfg, _frames(w, h, 2, rng))
    frames = HEVCDecoder().decode(stream)
    assert len(frames) == 2
    for f, info in zip(frames, infos):
        assert f.hash_ok
        for a, b in zip(f.planes, info["recon_out"]):
            assert np.array_equal(a, np.asarray(b))


def test_encode_noise_high_activity(rng):
    w = h = 64
    frames = [(rng.randint(0, 255, (h, w)).astype(np.uint8),
               rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8),
               rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8))]
    for qp in (10, 30, 48):
        stream, _ = encode_sequence(Config(width=w, height=h, qp=qp), frames)
        assert all(f.hash_ok for f in HEVCDecoder().decode(stream))


def test_psnr_improves_with_lower_qp(rng):
    frames = _frames(64, 64, 1, rng)
    _, hi = encode_sequence(Config(width=64, height=64, qp=12), frames)
    _, lo = encode_sequence(Config(width=64, height=64, qp=45), frames)
    assert hi[0]["psnr"][0] > lo[0]["psnr"][0] + 5


def test_md5_hash_mode(rng):
    cfg = Config(width=64, height=64, qp=30, hash="md5")
    stream, _ = encode_sequence(cfg, _frames(64, 64, 1, rng))
    frames = HEVCDecoder().decode(stream)
    assert frames[0].hash_ok


def test_rate_control_model_converges():
    """R-lambda model steers QP toward the bit budget."""
    from kvazaar_tpu.engine.rate_control import RateControl
    rc = RateControl(640, 360, target_bitrate=500_000, framerate=25,
                     intra_period=1)
    # synthetic encoder: bits halve per +6 QP around 200kbit at QP 30
    def fake_bits(qp):
        return int(200_000 / 25 * 2 ** ((30 - qp) / 6.0))
    total = 0
    qps = []
    for _ in range(75):  # 3 seconds at 25 fps
        qp = rc.frame_qp(False)
        qps.append(qp)
        b = fake_bits(qp)
        total += b
        rc.update(b, False)
    # ABR contract: total bits over the sequence near duration * bitrate
    target_total = 75 / 25 * 500_000
    assert abs(total - target_total) / target_total < 0.15, (qps, total)


def test_abr_stream_decodes(tmp_path, rng):
    """ABR-encoded stream (varying per-frame QP) stays conformant."""
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    from kvazaar_tpu.decoder.decoder import HEVCDecoder
    w, h = 96, 80
    frames = [(rng.randint(0, 256, (h, w)).astype(np.uint8),
               rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
               rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(6)]
    cfg = Config(width=w, height=h, qp=30, intra_period=1,
                 target_bitrate=400_000)
    out, infos = encode_sequence(cfg, frames)
    qps = [i["qp"] for i in infos]
    assert len(set(qps)) > 1, qps  # rate control actually moved QP
    dec = HEVCDecoder().decode(out)
    assert len(dec) == 6 and all(f.hash_ok for f in dec)


@pytest.mark.parametrize("kw", [
    dict(qp=22, intra_period=1),
    dict(qp=27, intra_period=0),
    dict(qp=27, gop_len=8, intra_period=0, sao_type="full"),
])
def test_device_sign_hiding(rng, kw):
    """SDH on the device path (16x16 grid): parity-fixed levels must
    decode hash-exactly for I/P/B slices."""
    w, h = 64, 48
    cfg = Config(width=w, height=h, ctu_size=16, signhide_enable=True,
                 **kw)
    frames = [(rng.randint(0, 255, (h, w)).astype(np.uint8),
               rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8),
               rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8))
              for _ in range(5)]
    stream, infos = encode_sequence(cfg, frames)
    decoded = HEVCDecoder().decode(stream)
    assert len(decoded) == 5
    for f in decoded:
        assert f.hash_ok
