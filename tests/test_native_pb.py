"""Native (C++) P/B quadtree slice writer parity.

The C++ writer (native/entropy.cc kvz_tpu_encode_md_slice_pb) must be
bit-identical to the Python MdPSliceWriter on every path it serves:
P slices, B pyramids (TMVP + bipred), WPP substreams, SAO, and the
returned motion-field snapshot that feeds later frames' TMVP.
Reference analog: kvazaar keeps one entropy implementation; here the
Python writer is the validated oracle (tests/test_inter_md.py et al.)
and the native writer must match it byte for byte.
"""
import numpy as np
import pytest

from kvazaar_tpu import native
from kvazaar_tpu.api import encode_sequence
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


def _encode_both(cfg, frames):
    if not native.available():
        pytest.skip("native toolchain unavailable")
    native._FORCE_OFF = True
    try:
        py_stream, _ = encode_sequence(cfg, frames)
    finally:
        native._FORCE_OFF = False
    nat_stream, _ = encode_sequence(cfg, frames)
    return py_stream, nat_stream


@pytest.mark.parametrize("tools", [
    {},
    dict(sao_type="full", rdoq_enable=True, signhide_enable=True),
    dict(ref_frames=2),
    dict(wpp=1),
])
def test_native_p_slice_parity(rng, tools):
    w, h = 192, 128
    frames = _pan_frames(w, h, 4, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 **tools)
    py_stream, nat_stream = _encode_both(cfg, frames)
    assert py_stream == nat_stream, (
        f"native P stream differs ({len(nat_stream)} vs "
        f"{len(py_stream)} bytes) tools={tools}")
    dec = HEVCDecoder().decode(nat_stream)
    assert len(dec) == 4 and all(f.hash_ok for f in dec)


def test_native_b_gop_parity(rng):
    w, h = 192, 128
    frames = _pan_frames(w, h, 9, rng)
    cfg = Config(width=w, height=h, qp=30, ctu_size=64, intra_period=0,
                 gop_len=8, sao_type="full", rdoq_enable=True)
    py_stream, nat_stream = _encode_both(cfg, frames)
    assert py_stream == nat_stream, (
        f"native B stream differs ({len(nat_stream)} vs "
        f"{len(py_stream)} bytes)")
    dec = HEVCDecoder().decode(nat_stream)
    assert len(dec) == 9 and all(f.hash_ok for f in dec)
