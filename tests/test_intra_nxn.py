"""NxN intra partitions (--pu-depth-intra up to 4): conformance and
partition behavior.

Reference parity: kvazaar searches SIZE_NxN at depth 4 when the
configured range reaches 4 (src/search.c:807, presets medium+ use
pu-depth-intra 1-4, cfg.c:628). An NxN 8x8 CU carries four 4x4 PUs with
independent modes; IntraSplitFlag forces the TU tree into four 4x4
DST-VII luma TUs plus one 4x4 chroma TU (spec 7.3.8.5, 8.6.4).
"""
import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _noisy_frames(rng, w, h, n=2):
    return [(rng.randint(0, 256, (h, w)).astype(np.uint8),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8),
             rng.randint(0, 256, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def _detail_frames(rng, w, h, n=2):
    """4x4 mosaic of distinct directional gradients: one 8x8 mode cannot
    fit all four quadrants, so NxN should win on many cells."""
    out = []
    for _ in range(n):
        y = np.zeros((h, w), np.int32)
        for by in range(0, h, 4):
            for bx in range(0, w, 4):
                k = rng.randint(4)
                g = np.add.outer(np.arange(4) * [13, -13, 0, 29][k],
                                 np.arange(4) * [0, 23, -23, -17][k])
                y[by:by + 4, bx:bx + 4] = rng.randint(0, 200) + g
        y = y.clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 128, np.uint8)
        cr = np.full((h // 2, w // 2), 128, np.uint8)
        out.append((y, cb, cr))
    return out


def _roundtrip(cfg, frames):
    out, infos = encode_sequence(cfg, frames)
    recs = HEVCDecoder().decode(bytes(out))
    assert len(recs) == len(frames)
    assert all(f.hash_ok for f in recs), "decoded-picture-hash mismatch"
    return out, infos, recs


@pytest.mark.parametrize("tools", [
    dict(),
    dict(deblock_enable=True, sao_type="full", rdoq_enable=True),
    dict(signhide_enable=True),
])
def test_nxn_stream_decodes(rng, tools):
    w, h = 128, 64
    frames = _noisy_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=27, intra_period=1,
                 pu_depth_intra=(1, 4), **tools)
    _roundtrip(cfg, frames)


def test_nxn_chosen_on_detail(rng):
    w, h = 128, 64
    frames = _detail_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=22, intra_period=1,
                 pu_depth_intra=(1, 4))
    enc = Encoder(cfg)
    enc.encode_frame(*frames[0])
    d = enc._last_decisions
    assert (np.asarray(d["size_map8"]) == 4).any(), \
        "detailed content should produce at least one NxN CU"


def test_nxn_improves_or_matches_bits(rng):
    """Allowing depth 4 never hurts the RD choice (bits at equal QP)."""
    w, h = 128, 64
    frames = _detail_frames(rng, w, h)
    base = dict(width=w, height=h, qp=22, intra_period=1)
    out4, _, _ = _roundtrip(Config(pu_depth_intra=(1, 4), **base), frames)
    out3, _, _ = _roundtrip(Config(pu_depth_intra=(1, 3), **base), frames)
    assert len(out4) <= len(out3) * 1.02


def test_nxn_forced(rng):
    """pu-depth-intra 4-4: every 8x8 CU is NxN."""
    w, h = 64, 64
    frames = _noisy_frames(rng, w, h, 1)
    cfg = Config(width=w, height=h, qp=27, intra_period=1,
                 pu_depth_intra=(4, 4))
    _roundtrip(cfg, frames)
    enc = Encoder(cfg)
    enc.encode_frame(*frames[0])
    sz = np.asarray(enc._last_decisions["size_map8"])
    assert (sz == 4).all()


def test_nxn_wpp(rng):
    w, h = 128, 128
    frames = _noisy_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=27, intra_period=1,
                 pu_depth_intra=(1, 4), wpp=True)
    _roundtrip(cfg, frames)


def test_nxn_delta_qp(rng):
    """VAQ (per-CTB delta QP) with NxN cells stays conformant (the
    4x4 TUs use the parent's chroma cbfs in the delta-QP condition)."""
    w, h = 128, 64
    frames = _noisy_frames(rng, w, h)
    cfg = Config(width=w, height=h, qp=32, intra_period=1,
                 pu_depth_intra=(1, 4), vaq=4)
    _roundtrip(cfg, frames)


def test_nxn_native_matches_python(rng):
    """The native C++ writer and the Python writer must produce
    identical substreams for NxN streams."""
    from kvazaar_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    w, h = 128, 64
    frames = _noisy_frames(rng, w, h, 1)
    cfg = Config(width=w, height=h, qp=27, intra_period=1,
                 pu_depth_intra=(1, 4))
    out_native, _, _ = _roundtrip(cfg, frames)
    try:
        native._FORCE_OFF = True
        out_py, _, _ = _roundtrip(cfg, frames)
    finally:
        native._FORCE_OFF = False
    assert bytes(out_native) == bytes(out_py)


def test_nxn_10bit(rng):
    w, h = 128, 64
    frames = [(rng.randint(0, 1024, (h, w)).astype(np.uint16),
               rng.randint(0, 1024, (h // 2, w // 2)).astype(np.uint16),
               rng.randint(0, 1024, (h // 2, w // 2)).astype(np.uint16))]
    cfg = Config(width=w, height=h, qp=27, intra_period=1,
                 pu_depth_intra=(1, 4), input_bitdepth=10)
    _roundtrip(cfg, frames)
