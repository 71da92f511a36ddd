import numpy as np

from kvazaar_tpu import tables as T


def test_dct_matrices_known_rows():
    assert T.DCT4[1].tolist() == [83, 36, -36, -83]
    assert T.DCT8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert T.DCT16[1].tolist() == [90, 87, 80, 70, 57, 43, 25, 9, -9, -25,
                                   -43, -57, -70, -80, -87, -90]
    assert T.DCT32[1][:16].tolist() == [90, 90, 88, 85, 82, 78, 73, 67, 61,
                                        54, 46, 38, 31, 22, 13, 4]
    # even rows of 2N-point contain the N-point rows
    for n, big in ((8, T.DCT16), (16, T.DCT32)):
        small = T.DCT_MATRICES[n]
        assert np.array_equal(big[::2, :n], small)


def test_dct_near_orthogonal():
    for n, m in T.DCT_MATRICES.items():
        g = m.astype(np.int64)
        gram = g @ g.T
        diag = np.diag(gram)
        # diagonal close to n * 64^2
        assert np.all(np.abs(diag - n * 4096) <= n * 10)


def test_scans_cover_all_positions():
    for scan_idx in (0, 1, 2):
        for log2 in (2, 3, 4, 5):
            s = T.get_scan(scan_idx, log2)
            size = 1 << log2
            flat = s[:, 1] * size + s[:, 0]
            assert sorted(flat.tolist()) == list(range(size * size))
            # hierarchical: every run of 16 stays in one 4x4 sub-block
            if log2 > 2:
                for i in range(0, size * size, 16):
                    blk = s[i:i + 16]
                    assert len(set(((x >> 2, y >> 2) for x, y in blk))) == 1


def test_diag_scan_up_right():
    s = T.get_scan(T.SCAN_DIAG, 2)
    assert s[:6].tolist() == [[0, 0], [0, 1], [1, 0], [0, 2], [1, 1], [2, 0]]


def test_chroma_qp():
    assert T.chroma_qp(27) == 27
    assert T.chroma_qp(30) == 29
    assert T.chroma_qp(35) == 33
    assert T.chroma_qp(43) == 37
    assert T.chroma_qp(45) == 39
    assert T.chroma_qp(51) == 45


def test_cabac_engine_tables():
    # invariants of the normative tables
    assert T.TRANS_LPS[63] == 63
    assert T.TRANS_MPS[62] == 62 and T.TRANS_MPS[63] == 63
    assert np.all(T.TRANS_LPS[1:63] <= np.arange(1, 63))
    assert T.LPS_TABLE[63].tolist() == [2, 2, 2, 2]
    assert np.all(np.diff(T.LPS_TABLE[:, 0][:63].astype(int)) <= 0)
    # transIdxLps values around the historically miscopied region
    assert T.TRANS_LPS[28] == 22 and T.TRANS_LPS[29] == 22
    assert T.TRANS_LPS[30] == 23


def test_context_init_table_shapes():
    from kvazaar_tpu.cabac import ContextSet
    for fam in ContextSet.FAMILIES:
        rows = T.CONTEXT_INIT[fam]
        assert len(rows) == 3
        assert len({len(r) for r in rows}) == 1


def test_intra_angles():
    assert T.intra_pred_angle(2) == 32
    assert T.intra_pred_angle(10) == 0
    assert T.intra_pred_angle(18) == -32
    assert T.intra_pred_angle(26) == 0
    assert T.intra_pred_angle(34) == 32
    assert T.intra_inv_angle(18) == 256
    assert T.intra_inv_angle(19) == 315
