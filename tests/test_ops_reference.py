import numpy as np
import pytest

from kvazaar_tpu.ops import reference as ops


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_transform_roundtrip_noquant(rng, n):
    resi = rng.randint(-255, 255, (n, n)).astype(np.int32)
    c = ops.forward_transform(resi, False)
    r = ops.inverse_transform(c, False)
    # integer basis approximation error grows slightly with size
    assert np.abs(r - resi).max() <= max(1, n // 8 + 1)


def test_dst_roundtrip(rng):
    resi = rng.randint(-255, 255, (4, 4)).astype(np.int32)
    c = ops.forward_transform(resi, True)
    r = ops.inverse_transform(c, True)
    assert np.abs(r - resi).max() <= 1


@pytest.mark.parametrize("qp", [4, 22, 27, 37, 51])
def test_quant_roundtrip_error_bounded(rng, qp):
    for n in (4, 8, 16, 32):
        resi = rng.randint(-100, 100, (n, n)).astype(np.int32)
        c = ops.forward_transform(resi, False)
        q = ops.quantize(c, qp, True)
        dq = ops.dequantize(q, qp)
        r = ops.inverse_transform(dq, False)
        qstep = 2 ** ((qp - 4) / 6.0)
        assert np.abs(r - resi).max() <= max(2, qstep * 1.2)


def test_quant_identity_at_qp4():
    # at qp 4 quantization is nearly lossless for moderate coefficients
    c = np.arange(-32, 32).reshape(8, 8).astype(np.int32) * 50
    q = ops.quantize(c, 4, True)
    dq = ops.dequantize(q, 4)
    assert np.abs(dq - c).max() <= 16


def test_intra_dc_flat():
    left = np.full(16, 100, np.int32)
    top = np.full(16, 100, np.int32)
    pred = ops.intra_predict(left, top, 100, 8, 1, False)
    assert np.all(pred == 100)


def test_intra_planar_flat():
    left = np.full(16, 77, np.int32)
    top = np.full(16, 77, np.int32)
    pred = ops.intra_predict(left, top, 77, 8, 0, False)
    assert np.all(pred == 77)


def test_intra_vertical_copies_top():
    left = np.full(16, 10, np.int32)
    top = np.arange(16).astype(np.int32) + 50
    pred = ops.intra_predict(left, top, 50, 8, 26, True)  # chroma: no filter
    for y in range(8):
        assert np.array_equal(pred[y], top[:8])


def test_intra_horizontal_copies_left():
    left = np.arange(16).astype(np.int32) + 90
    top = np.full(16, 10, np.int32)
    pred = ops.intra_predict(left, top, 90, 8, 10, True)
    for x in range(8):
        assert np.array_equal(pred[:, x], left[:8])


def test_intra_mode2_diagonal():
    # mode 2: bottom-left diagonal, pred[y][x] = left[x+y+1]
    left = np.arange(16).astype(np.int32)
    top = np.full(16, 0, np.int32)
    pred = ops.intra_predict(left, top, 0, 8, 2, True)
    for y in range(8):
        for x in range(8):
            assert pred[y, x] == left[x + y + 1]


def test_ref_substitution_fill():
    n2 = 8
    left = np.zeros(n2, np.int32)
    top = np.zeros(n2, np.int32)
    l, t, c = ops.intra_ref_substitution(
        left, top, 0, np.zeros(n2, bool), np.zeros(n2, bool), False)
    assert np.all(l == 128) and np.all(t == 128) and c == 128


def test_ref_substitution_propagate():
    n2 = 8
    left = np.array([10, 11, 12, 13, 0, 0, 0, 0], np.int32)
    avail_l = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    top = np.zeros(n2, np.int32)
    l, t, c = ops.intra_ref_substitution(
        left, top, 0, avail_l, np.zeros(n2, bool), False)
    # unavailable below-left propagates from the last available upward scan;
    # corner and top take the topmost-left sample
    assert l.tolist() == [10, 11, 12, 13, 13, 13, 13, 13]
    assert c == 10
    assert np.all(t == 10)


def test_sad_satd(rng):
    a = rng.randint(0, 255, (16, 16)).astype(np.int32)
    assert ops.sad(a, a) == 0
    assert ops.satd(a, a) == 0
    b = a.copy()
    b[0, 0] += 10
    assert ops.sad(a, b) == 10
    assert ops.satd(a, b) > 0
