import numpy as np
import pytest

from kvazaar_tpu.bitstream import BitReader, BitWriter
from kvazaar_tpu.cabac import CabacDecoder, CabacEncoder, ContextSet
from kvazaar_tpu.syntax.residual import decode_residual, encode_residual


def _roundtrip_tu(coeffs, log2_size, c_idx, scan_idx, sdh):
    bw = BitWriter()
    enc = CabacEncoder(bw, ContextSet(0, 27))
    encode_residual(enc, coeffs, log2_size, c_idx, scan_idx, sdh)
    enc.encode_bin_trm(1)
    enc.finish()
    bw.byte_align_one()
    dec = CabacDecoder(BitReader(bw.get_bytes()), ContextSet(0, 27))
    out, _ = decode_residual(dec, log2_size, c_idx, scan_idx, sdh)
    assert dec.decode_bin_trm() == 1
    return out


def _sdh_legal(coeffs, log2_size, scan_idx):
    """Apply sign-data-hiding parity fixup like an encoder would."""
    from kvazaar_tpu.tables import get_scan
    size = 1 << log2_size
    scan = get_scan(scan_idx, log2_size)
    flat = coeffs[scan[:, 1], scan[:, 0]].copy()
    for cg in range((size * size) // 16):
        seg = flat[cg * 16:(cg + 1) * 16]
        nz = np.nonzero(seg)[0]
        if len(nz) == 0:
            continue
        if nz[-1] - nz[0] > 3:
            total = int(np.abs(seg).sum())
            sign = 1 if seg[nz[0]] < 0 else 0
            if (total & 1) != sign:
                # adjust the last nonzero's magnitude to fix parity
                p = nz[-1]
                seg[p] += 1 if seg[p] > 0 else -1
        flat[cg * 16:(cg + 1) * 16] = seg
    out = np.zeros_like(coeffs)
    out[scan[:, 1], scan[:, 0]] = flat
    return out


@pytest.mark.parametrize("log2_size", [2, 3, 4, 5])
@pytest.mark.parametrize("c_idx", [0, 1])
@pytest.mark.parametrize("scan_idx", [0, 1, 2])
def test_residual_roundtrip(rng, log2_size, c_idx, scan_idx):
    if c_idx and log2_size == 5:
        pytest.skip("no 32x32 chroma TU in 4:2:0")
    if scan_idx and log2_size > 3:
        pytest.skip("hor/ver scans only for small TUs")
    size = 1 << log2_size
    for density in (0.02, 0.2, 0.9):
        for _ in range(4):
            c = rng.randint(-80, 80, (size, size)).astype(np.int32)
            mask = rng.rand(size, size) < density
            c = (c * mask).astype(np.int32)
            if not c.any():
                c[0, 0] = 5
            out = _roundtrip_tu(c, log2_size, c_idx, scan_idx, False)
            assert np.array_equal(out, c)


def test_residual_roundtrip_sdh(rng):
    for log2_size in (2, 3, 4, 5):
        size = 1 << log2_size
        for _ in range(6):
            c = rng.randint(-40, 40, (size, size)).astype(np.int32)
            c = (c * (rng.rand(size, size) < 0.4)).astype(np.int32)
            if not c.any():
                c[1, 1] = -3
            c = _sdh_legal(c, log2_size, 0)
            if not c.any():
                continue
            out = _roundtrip_tu(c, log2_size, 0, 0, True)
            assert np.array_equal(out, c)


def test_residual_large_levels(rng):
    for log2_size in (2, 4):
        size = 1 << log2_size
        c = np.zeros((size, size), np.int32)
        c[0, 0] = 32000
        c[size - 1, size - 1] = -31000
        c[0, 1] = 1
        out = _roundtrip_tu(c, log2_size, 0, 0, False)
        assert np.array_equal(out, c)


def test_residual_single_dc():
    for log2_size in (2, 3, 4, 5):
        size = 1 << log2_size
        c = np.zeros((size, size), np.int32)
        c[0, 0] = -1
        out = _roundtrip_tu(c, log2_size, 0, 0, False)
        assert np.array_equal(out, c)
