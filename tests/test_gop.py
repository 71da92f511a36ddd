"""Hierarchical B-pyramid GOP tests: coding order, conformance, tails,
closed GOP, and compression benefit over low-delay P."""
import numpy as np
import pytest

from kvazaar_tpu.cfg import Config
from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames(w, h, n, seed=5, noise=12):
    rng = np.random.default_rng(seed)
    base = (np.arange(w * h).reshape(h, w) % 256).astype(np.uint8)
    for i in range(n):
        y = np.roll(base, i * 2, axis=1)
        y = (y.astype(np.int32)
             + rng.integers(0, noise, (h, w))).clip(0, 255).astype(np.uint8)
        cb = np.full((h // 2, w // 2), 100 + i, np.uint8)
        cr = ((np.arange(h // 2 * w // 2).reshape(h // 2, w // 2) + 3 * i)
              % 256).astype(np.uint8)
        yield y, cb, cr


def test_gop8_coding_order():
    cfg = Config(width=64, height=48, ctu_size=16, qp=30, intra_period=0,
                 gop_len=8)
    bs, infos = encode_sequence(cfg, _frames(64, 48, 17))
    assert [i["poc"] for i in infos] == \
        [0, 8, 4, 2, 1, 3, 6, 5, 7, 16, 12, 10, 9, 11, 14, 13, 15]


@pytest.mark.parametrize("kw,n", [
    (dict(gop_len=8, intra_period=0), 17),
    (dict(gop_len=8, intra_period=8), 17),          # closed GOP, IDR anchors
    (dict(gop_len=4, intra_period=0, wpp=True), 13),
    (dict(gop_len=8, intra_period=0, sao_type="full"), 12),  # 3-frame tail
])
def test_gop_conformance(kw, n):
    w, h = 64, 48
    cfg = Config(width=w, height=h, ctu_size=16, qp=30, **kw)
    bs, infos = encode_sequence(cfg, _frames(w, h, n))
    assert len(infos) == n
    decoded = [f for f in HEVCDecoder().decode(bs)]
    assert len(decoded) == n
    for f in decoded:
        assert f.hash_ok, f"hash mismatch poc={f.poc}"
    # every display position coded exactly once per period
    pocs = sorted(i["poc"] for i in infos)
    if kw.get("intra_period", 0) == 0:
        assert pocs == list(range(n))


def test_bipred_used_and_conformant():
    """Noisy translating content must make some blocks choose BI, and the
    stream must stay hash-exact."""
    w, h, n = 64, 48, 9
    cfg = Config(width=w, height=h, ctu_size=16, qp=30, intra_period=0,
                 gop_len=8)
    from kvazaar_tpu.api import Encoder
    enc = Encoder(cfg)
    orig = enc.finalize_frame
    dirs = []

    def fin(meta):
        if meta.get("slice_type") == 0:
            d = enc._inter_pipeline.materialize(meta["dev"])
            dirs.extend(np.asarray(d["inter_dir"])[
                np.asarray(d["is_inter"])].tolist())
        return orig(meta)

    enc.finalize_frame = fin
    bs, infos = encode_sequence(cfg, _frames(w, h, n, noise=24),
                                encoder=enc)
    assert 3 in dirs, "no block ever chose bi-prediction"
    for f in HEVCDecoder().decode(bs):
        assert f.hash_ok, f"hash mismatch poc={f.poc}"


def test_gop8_beats_lowdelay_on_smooth_motion():
    """B pyramid should compress smooth translation better than
    low-delay P at matched QP (both conformant)."""
    w, h, n = 128, 96, 17
    sizes = {}
    for gop in (0, 8):
        cfg = Config(width=w, height=h, ctu_size=16, qp=32, intra_period=0,
                     gop_len=gop, ref_frames=2)
        bs, infos = encode_sequence(cfg, _frames(w, h, n, noise=4))
        for f in HEVCDecoder().decode(bs):
            assert f.hash_ok
        sizes[gop] = len(bs)
    assert sizes[8] < sizes[0]
