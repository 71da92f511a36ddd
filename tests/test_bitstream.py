import numpy as np

from kvazaar_tpu.bitstream import (BitReader, BitWriter, ebsp_to_rbsp,
                                   nal_unit, rbsp_to_ebsp, split_annexb)


def test_u_roundtrip(rng):
    bw = BitWriter()
    vals = [(int(rng.randint(0, 1 << n)), n) for n in rng.randint(1, 25, 200)]
    for v, n in vals:
        bw.u(v, n)
    bw.byte_align_zero()
    br = BitReader(bw.get_bytes())
    for v, n in vals:
        assert br.u(n) == v


def test_ue_se_roundtrip(rng):
    bw = BitWriter()
    ues = [int(v) for v in rng.randint(0, 100000, 300)]
    ses = [int(v) for v in rng.randint(-50000, 50000, 300)]
    for v in ues:
        bw.ue(v)
    for v in ses:
        bw.se(v)
    bw.byte_align_one()
    br = BitReader(bw.get_bytes())
    for v in ues:
        assert br.ue() == v
    for v in ses:
        assert br.se() == v


def test_emulation_prevention(rng):
    cases = [
        b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02", b"\x00\x00\x03",
        b"\x00\x00\x04", b"\x00\x00\x00\x00\x00", b"\xff\x00\x00\x03\x00",
    ]
    for c in cases:
        assert ebsp_to_rbsp(rbsp_to_ebsp(c)) == c
    for _ in range(100):
        data = bytes(rng.randint(0, 4, rng.randint(1, 64)).astype(np.uint8))
        eb = rbsp_to_ebsp(data)
        assert ebsp_to_rbsp(eb) == data
        # no start-code emulation inside the ebsp
        assert b"\x00\x00\x00" not in eb
        assert b"\x00\x00\x01" not in eb
        assert b"\x00\x00\x02" not in eb


def test_nal_split(rng):
    payloads = [bytes(rng.randint(0, 256, 20).astype(np.uint8))
                for _ in range(4)]
    types = [32, 33, 34, 19]
    stream = b"".join(nal_unit(p, t) for p, t in zip(payloads, types))
    out = split_annexb(stream)
    assert [t for t, _, _ in out] == types
    for (t, tid, ebsp), p in zip(out, payloads):
        assert ebsp_to_rbsp(ebsp) == p
        assert tid == 0
