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
        for a, b in zip(f.planes, info["recon"]):
            assert np.array_equal(a, b)


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
