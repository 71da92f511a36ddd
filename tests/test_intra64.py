"""64x64 intra CU leaves (--pu-depth-intra 0-x): conformance and
partition behavior.

Reference parity: kvazaar codes depth-0 intra CUs when the configured
depth range includes 0 (src/search.c:646, cfg.c:1017); the TU tree is
forced-split once at log2 6 (spec 7.3.8.8), giving four 32x32 luma TUs
plus per-child 16x16 chroma.
"""
import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _flat_frames(rng, w, h, n=2):
    """Smooth gradients -> the DP should pick 64x64 leaves."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = ((40 + xx // 8 + yy // 8 + 3 * i) % 256).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 120, np.uint8)
        cr = np.full((h // 2, w // 2), 130, np.uint8)
        out.append((y, cb, cr))
    return out


def _noisy_frames(rng, w, h, n=2):
    return [(rng.randint(0, 256, (h, w)).astype(np.uint8),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def _roundtrip(cfg, frames):
    out, infos = encode_sequence(cfg, frames)
    recs = HEVCDecoder().decode(bytes(out))
    assert len(recs) == len(frames)
    assert all(f.hash_ok for f in recs), "decoded-picture-hash mismatch"
    return out, infos, recs


@pytest.mark.parametrize("tools", [
    dict(),
    dict(deblock_enable=True, sao_type="full", rdoq_enable=True),
])
def test_intra64_stream_decodes(rng, tools):
    w, h = 192, 128
    frames = _flat_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=32, intra_period=1,
                 pu_depth_intra=(0, 3), **tools)
    _roundtrip(cfg, frames)


def test_intra64_chosen_on_flat_content(rng):
    w, h = 192, 128
    frames = _flat_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=37, intra_period=1,
                 pu_depth_intra=(0, 3))
    enc = Encoder(cfg)
    enc.encode_frame(*frames[0])
    d = enc._last_decisions
    assert (np.asarray(d["size_map8"]) == 64).any(), \
        "flat content should produce at least one 64x64 CU"


def test_intra64_beats_32_cap_on_flat(rng):
    """Bits with 64 leaves allowed <= bits with the 32 cap (QP 37)."""
    w, h = 192, 128
    frames = _flat_frames(rng, w, h)
    base = dict(width=w, height=h, qp=37, intra_period=1)
    out64, _, _ = _roundtrip(Config(pu_depth_intra=(0, 3), **base), frames)
    out32, _, _ = _roundtrip(Config(pu_depth_intra=(1, 3), **base), frames)
    assert len(out64) <= len(out32)


def test_intra64_wpp_and_noise(rng):
    w, h = 192, 128
    frames = _noisy_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=27, intra_period=1,
                 pu_depth_intra=(0, 3), wpp=True)
    _roundtrip(cfg, frames)


def test_intra64_delta_qp(rng):
    """VAQ (per-CTB delta QP) across 64-CU CTBs stays conformant."""
    w, h = 192, 128
    frames = _flat_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=32, intra_period=1,
                 pu_depth_intra=(0, 3), vaq=4)
    _roundtrip(cfg, frames)


def test_pu_depth_only_64(rng):
    """pu-depth-intra 0-0: every CTB is one 64x64 CU."""
    w, h = 128, 128
    frames = _flat_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=32, intra_period=1,
                 pu_depth_intra=(0, 0))
    out, infos, recs = _roundtrip(cfg, frames)
    enc = Encoder(cfg)
    enc.encode_frame(*frames[0])
    assert (np.asarray(enc._last_decisions["size_map8"]) == 64).all()
