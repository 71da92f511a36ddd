"""B-pyramid GOPs on the quadtree (CTB-64) path: conformance with mixed
CU sizes, bi-prediction, TMVP-enabled slice headers, and compression
benefit vs low-delay P. Mirrors tests/test_gop.py for the 16-grid."""
import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
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


W, H = 128, 64


@pytest.mark.parametrize("kw,n", [
    (dict(gop_len=4, intra_period=0), 9),
    (dict(gop_len=8, intra_period=8,
          deblock_enable=True, sao_type="full"), 9),  # closed GOP + filters
])
def test_gop_md_conformance(kw, n):
    cfg = Config(width=W, height=H, ctu_size=64, qp=30, **kw)
    bs, infos = encode_sequence(cfg, _frames(W, H, n))
    assert len(infos) == n
    decoded = [f for f in HEVCDecoder().decode(bs)]
    assert len(decoded) == n
    for f in decoded:
        assert f.hash_ok, f"hash mismatch poc={f.poc}"


def test_gop_md_uses_quadtree_and_bipred():
    cfg = Config(width=W, height=H, ctu_size=64, qp=32, intra_period=0,
                 gop_len=4)
    enc = Encoder(cfg)
    assert enc.inter_md and enc.gop_enabled
    frames = list(_frames(W, H, 5, noise=20))
    chunks = []
    for f in frames:
        chunks.extend(enc.push_frame(*f))
    chunks.extend(enc.flush())
    bs = b"".join(c for c, _ in chunks)
    d = enc._last_decisions
    assert "dir8" in d  # B decisions present on the md path
    sizes = set(np.unique(np.asarray(d["size_map8"])).tolist())
    assert sizes - {8}, f"expected mixed CU sizes, got {sizes}"
    for f in HEVCDecoder().decode(bs):
        assert f.hash_ok, f"hash mismatch poc={f.poc}"


def test_gop_md_tmvp_slice_header():
    """Inter slices on the md path signal TMVP and stay conformant."""
    cfg = Config(width=W, height=H, ctu_size=64, qp=30, intra_period=0,
                 gop_len=4)
    enc = Encoder(cfg)
    assert enc.sps.temporal_mvp_enabled == 1
    frames = list(_frames(W, H, 5))
    chunks = []
    for f in frames:
        chunks.extend(enc.push_frame(*f))
    chunks.extend(enc.flush())
    assert enc._motion_fields  # collocated fields retained
    bs = b"".join(c for c, _ in chunks)
    for f in HEVCDecoder().decode(bs):
        assert f.hash_ok


def test_gop_md_beats_lowdelay_rate():
    """The B pyramid must compress translating content better than
    low-delay P at the same QP (sanity on GOP coding efficiency)."""
    frames = list(_frames(W, H, 9, noise=6))
    cfg_b = Config(width=W, height=H, ctu_size=64, qp=32, intra_period=0,
                   gop_len=8)
    bs_b, _ = encode_sequence(cfg_b, frames)
    cfg_p = Config(width=W, height=H, ctu_size=64, qp=32, intra_period=0)
    bs_p, _ = encode_sequence(cfg_p, frames)
    assert len(bs_b) < len(bs_p)
