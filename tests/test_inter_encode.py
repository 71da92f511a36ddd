"""Inter (low-delay P) encoder conformance."""
import numpy as np
import pytest

from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _motion_frames(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        dx, dy = int(5.2 * i), int(3.1 * i)
        y = (128 + 80 * np.sin((xx + dx) / 9) * np.cos((yy + dy) / 11)
             + rng.randint(-8, 8, (h, w))).clip(0, 255).astype(np.uint8)
        u = (128 + 50 * np.sin((xx[:h // 2, :w // 2] + dx) / 13)).astype(
            np.uint8)
        v = (128 + 50 * np.cos((yy[:h // 2, :w // 2] + dy) / 15)).astype(
            np.uint8)
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("qp,wpp,period", [
    (30, False, 64), (30, True, 64), (37, False, 3), (22, False, 64)])
def test_inter_encode_conformance(rng, qp, wpp, period):
    w, h = 96, 80
    cfg = Config(width=w, height=h, qp=qp, ctu_size=16,
                 intra_period=period, wpp=wpp)
    frames = _motion_frames(w, h, 4, rng)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 4
    for f, info in zip(dec, infos):
        assert f.hash_ok
        assert np.array_equal(f.planes[0],
                              info["recon_out"][0].astype(np.uint16))


def test_inter_saves_bits(rng):
    w, h = 96, 80
    frames = _motion_frames(w, h, 4, rng)
    s_inter, infos = encode_sequence(
        Config(width=w, height=h, qp=30, ctu_size=16, intra_period=64),
        frames)
    s_intra, _ = encode_sequence(
        Config(width=w, height=h, qp=30, ctu_size=16, intra_period=1),
        frames)
    assert len(s_inter) < len(s_intra) * 0.8


def test_multi_ref_alternating_content():
    """ref_idx=1 selection: alternating frames make the 2-back reference
    the exact match; also stresses border MVs (the MC gather must clamp,
    not wrap, at picture edges)."""
    from kvazaar_tpu.api import Encoder
    from kvazaar_tpu.cfg import Config
    from kvazaar_tpu.decoder.decoder import HEVCDecoder
    rng = np.random.RandomState(3)
    w, h = 320, 192
    A = rng.randint(0, 256, (h, w)).astype(np.uint8)
    B = np.roll(A, 40, axis=1)
    Ac = rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8)
    Bc = np.roll(Ac, 20, axis=1)
    frames = [(A, Ac, Ac), (B, Bc, Bc), (A, Ac, Ac), (B, Bc, Bc),
              (A, Ac, Ac)]
    cfg = Config(width=w, height=h, qp=30, intra_period=0, ctu_size=16,
                 ref_frames=2)
    enc = Encoder(cfg)
    out = b""
    for f in frames:
        chunk, _ = enc.encode_frame(*f)
        out += chunk
    if not enc.use_device:
        return  # device-only feature
    dec = HEVCDecoder().decode(out)
    assert len(dec) == 5 and all(f.hash_ok for f in dec)
