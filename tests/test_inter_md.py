"""Inter coding on the quadtree path (CTB 64, mixed CU sizes).

Conformance: our decoder reproduces every stream hash-exactly; motion
streams must beat the same content coded all-intra (compression sanity);
the partition must actually mix CU sizes and inter/intra decisions.

Reference parity: kvazaar searches inter at every CU size
(src/search_inter.c:2202, src/search.c:646-758); the ME field design is
models/inter_md.py's hierarchical sweep."""
import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _pan_frames(w, h, n, rng, dx=3, dy=1):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = (60 + xx // 3 + yy // 5).astype(np.int32)
    tex = rng.randint(-20, 20, (h, w))
    out = []
    for i in range(n):
        y = np.clip(np.roll(np.roll(base + tex, dx * i, axis=1),
                            dy * i, axis=0), 0, 255).astype(np.uint8)
        cb = (128 + 30 * np.sin((xx[:h // 2, :w // 2] + 5 * i) / 9)) \
            .astype(np.uint8)
        cr = np.roll(rng.randint(0, 255, (h // 2, w // 2)),
                     i, axis=1).astype(np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("tools", [
    {},
    dict(sao_type="full", rdoq_enable=True, signhide_enable=True),
    dict(ref_frames=2),
    dict(deblock_enable=False),
])
def test_inter_md_conformance(rng, tools):
    w, h = 192, 128
    frames = _pan_frames(w, h, 4, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 **tools)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 4
    for i, f in enumerate(dec):
        assert f.hash_ok, f"hash mismatch frame {i} tools={tools}"
        for a, b in zip(f.planes, infos[i]["recon_out"]):
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_inter_md_beats_intra(rng):
    """P frames on a panning scene must cost far fewer bits than
    all-intra coding of the same frames."""
    w, h = 192, 128
    frames = _pan_frames(w, h, 4, rng)
    p_cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0)
    i_cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=1)
    p_stream, _ = encode_sequence(p_cfg, frames)
    i_stream, _ = encode_sequence(i_cfg, frames)
    assert len(p_stream) < 0.8 * len(i_stream), \
        f"P {len(p_stream)}B vs intra {len(i_stream)}B"


def test_inter_md_mixed_sizes_and_modes(rng):
    """The decision maps must mix CU sizes and use real motion."""
    w, h = 256, 128
    frames = _pan_frames(w, h, 3, rng, dx=5, dy=2)
    # splice a per-frame-changing detail patch: unpredictable content
    # forces intra 8/16 leaves amid the panning inter-32 background
    for i, (y, cb, cr) in enumerate(frames):
        y = y.copy()
        y[40:72, 60:124] = np.random.RandomState(77 + i).randint(
            0, 255, (32, 64))
        frames[i] = (y, cb, cr)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0)
    enc = Encoder(cfg)
    assert enc.inter_md
    out = b""
    metas = []
    for f in frames:
        chunk, info = enc.encode_frame(*f)
        out += chunk
        metas.append(info)
    d = enc._inter_pipeline.materialize(
        enc._inter_pipeline.submit_inter(
            *frames[2], [np.asarray(metas[1]["recon"][0])],
            [np.asarray(metas[1]["recon"][1])],
            [np.asarray(metas[1]["recon"][2])], ref_pocs=[0]))
    sizes = set(np.unique(d["size_map8"]).tolist())
    assert len(sizes) >= 2, f"single CU size only: {sizes}"
    assert d["inter8"].any(), "no inter CUs chosen on a panning scene"
    mvs = d["mv8"][d["inter8"]]
    assert (np.abs(mvs) >= 4).any(), "no real motion found"


def test_inter_md_64_skip(rng):
    """Static/panning content must code 64x64 inter CUs (pu-depth-inter
    0, medium parity) and they must decode hash-exactly."""
    w, h = 256, 128
    frames = _pan_frames(w, h, 3, rng, dx=2, dy=0)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0)
    enc = Encoder(cfg)
    out = b""
    for f in frames:
        chunk, _ = enc.encode_frame(*f)
        out += chunk
    dec = HEVCDecoder().decode(out)
    assert len(dec) == 3 and all(f.hash_ok for f in dec)
    d = enc._inter_pipeline.materialize(enc._inter_pipeline.submit_inter(
        *frames[2], [np.asarray(dec[1].planes[0])],
        [np.asarray(dec[1].planes[1])], [np.asarray(dec[1].planes[2])],
        ref_pocs=[0]))
    assert (np.asarray(d["size_map8"]) == 64).any(), \
        "no 64x64 CUs on a pure pan"
    # depth range honoured: pu-depth-inter 1-3 forbids 64
    cfg2 = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                  pu_depth_inter=(1, 3))
    enc2 = Encoder(cfg2)
    out2 = b""
    for f in frames:
        chunk, _ = enc2.encode_frame(*f)
        out2 += chunk
    d2 = enc2._inter_pipeline.materialize(
        enc2._inter_pipeline.submit_inter(
            *frames[2], [np.asarray(dec[1].planes[0])],
            [np.asarray(dec[1].planes[1])],
            [np.asarray(dec[1].planes[2])], ref_pocs=[0]))
    assert not (np.asarray(d2["size_map8"]) == 64).any()
    assert all(f.hash_ok for f in HEVCDecoder().decode(out2))


def test_inter_md_long_range_motion(rng):
    """A +-40 pel pan must be caught by the hierarchical ME (the old
    16-grid pipeline's +-8 window could not)."""
    w, h = 256, 128
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = np.clip(60 + 40 * np.sin(xx / 11) * np.cos(yy / 7)
                   + rng.randint(-15, 15, (h, w)), 0, 255).astype(np.uint8)
    cbc = (128 + 20 * np.sin(xx[:h // 2, :w // 2] / 13)).astype(np.uint8)
    crc = (128 + 20 * np.cos(yy[:h // 2, :w // 2] / 17)).astype(np.uint8)
    frames = [(base, cbc, crc),
              (np.roll(base, 40, axis=1), cbc, crc)]
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0)
    stream, infos = encode_sequence(cfg, frames)
    dec = HEVCDecoder().decode(stream)
    assert all(f.hash_ok for f in dec)
    # P frame must be tiny relative to the IDR. Content floor: np.roll
    # wraps, so the left 40-px band (40/256 = 15.6% of the frame) is new
    # content that must be coded fresh (intra/residual at IDR-like cost)
    # — no <=64-pel ME can predict it; add signalling for the skipped
    # 84%. Broken long-range ME shows up as ~0.5x (whole-frame residual).
    # Diagnostics (see IMPLEMENTATION_STATUS): residual must be confined
    # to the wrap band, which the second assert checks directly.
    assert infos[1]["bytes"] < 0.27 * infos[0]["bytes"], \
        f"long-range ME failed: {infos[1]['bytes']} vs {infos[0]['bytes']}"
    # the clean region (x >= 80) must be fully skipped: zero coefficients
    enc = Encoder(cfg)
    for f in frames:
        enc.encode_frame(*f)
    ly = np.asarray(enc._last_decisions["levels_y"])
    assert (ly[:, 80:] == 0).all(), "residual outside the wrap band"
