"""SMP/AMP rectangular PU partitions (--smp/--amp).

Encode-side parity for kvz_search_cu_smp (ref src/search_inter.c:2311)
+ part_mode syntax (encode_coding_tree.c:311): P frames with a motion
boundary inside CUs must select 2NxN/Nx2N PUs, stay hash-exact in our
decoder (which already parses SMP/AMP), and decode bit-exactly in
ffmpeg.
"""
import os
import tempfile

import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _split_motion_frames(w, h, n, rng):
    """Top band pans right, bottom band pans left; the boundary sits
    mid-CU (y = 48) so rectangular PUs beat square splits there."""
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = np.clip(70 + 50 * np.sin(xx / 13) * np.cos(yy / 9)
                   + rng.randint(-12, 12, (h, w)), 0, 255).astype(np.int32)
    cb = (128 + 25 * np.sin(xx[:h // 2, :w // 2] / 11)).astype(np.uint8)
    cr = (128 + 25 * np.cos(yy[:h // 2, :w // 2] / 15)).astype(np.uint8)
    out = []
    for i in range(n):
        y = base.copy()
        y[:48] = np.roll(base[:48], 4 * i, axis=1)
        y[48:] = np.roll(base[48:], -4 * i, axis=1)
        out.append((y.astype(np.uint8), cb, cr))
    return out


@pytest.mark.parametrize("amp", [False, True])
def test_smp_conformance(rng, amp):
    w, h = 192, 128
    frames = _split_motion_frames(w, h, 3, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 smp_enable=True, amp_enable=amp)
    enc = Encoder(cfg)
    stream, infos = encode_sequence(cfg, frames, encoder=enc)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 3
    for i, f in enumerate(dec):
        assert f.hash_ok, f"hash mismatch frame {i} (amp={amp})"
    d = enc._last_decisions
    assert "part8" in d
    parts = np.asarray(d["part8"])
    used = set(np.unique(parts).tolist()) - {0}
    assert used, "no rectangular PU chosen on split-motion content"
    if amp:
        assert used & {1, 2, 3, 4, 5, 6}
    else:
        assert used <= {1, 2}
    # ffmpeg oracle (luma)
    cv2 = pytest.importorskip("cv2")
    with tempfile.NamedTemporaryFile(suffix=".hevc", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        cap = cv2.VideoCapture(path)
        cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
        for i, info in enumerate(infos):
            ok, frame = cap.read()
            assert ok, f"ffmpeg could not decode frame {i}"
            ydec = frame.reshape(-1)[: h * w].reshape(h, w)
            assert np.array_equal(
                ydec, np.asarray(info["recon_out"][0], np.uint8))
    finally:
        os.unlink(path)


def test_smp_beats_2nx2n_on_split_motion(rng):
    """With --smp the split-motion clip must not cost more bits."""
    w, h = 192, 128
    frames = _split_motion_frames(w, h, 3, rng)
    base_cfg = Config(width=w, height=h, qp=30, ctu_size=64,
                      intra_period=0)
    smp_cfg = Config(width=w, height=h, qp=30, ctu_size=64,
                     intra_period=0, smp_enable=True)
    s0, _ = encode_sequence(base_cfg, frames)
    s1, _ = encode_sequence(smp_cfg, frames)
    assert len(s1) <= len(s0) * 1.02, \
        f"SMP made the stream larger: {len(s1)} vs {len(s0)}"
