"""Honest option surface: every option in Config._OPTION_MAP either has
a real effect (bitstream / stream structure) or raises
NotImplementedError at Encoder construction — never a silent no-op that
changes what the user asked for.

Mirrors the reference's contract that cfg options are validated up front
(src/cfg.c kvz_config_validate)."""
import numpy as np
import pytest

from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.bitstream import NAL_AUD, split_annexb
from kvazaar_tpu.cfg import Config


def _frames(w, h, n, rng):
    return [(rng.randint(0, 255, (h, w)).astype(np.uint8),
             rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8),
             rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8))
            for _ in range(n)]


def test_smp_amp_slices_raise():
    for opt in (dict(smp_enable=True), dict(amp_enable=True),
                dict(slices="tiles")):
        cfg = Config(width=64, height=64, qp=30, **opt)
        with pytest.raises(NotImplementedError):
            Encoder(cfg)


def test_aud_emitted(rng):
    cfg = Config(width=64, height=64, qp=32, intra_period=1,
                 aud_enable=True)
    stream, _ = encode_sequence(cfg, _frames(64, 64, 2, rng))
    nal_types = [t for t, _, _ in split_annexb(stream)]
    assert nal_types.count(NAL_AUD) == 2
    assert nal_types[0] == NAL_AUD


def test_vps_period_resends_headers(rng):
    cfg = Config(width=64, height=64, qp=32, intra_period=2,
                 vps_period=1)
    stream, _ = encode_sequence(cfg, _frames(64, 64, 5, rng))
    nal_types = [t for t, _, _ in split_annexb(stream)]
    # headers at frames 0, 2, 4 -> three VPS (type 32)
    assert nal_types.count(32) == 3


def test_bitrate_upgrades_no_rc():
    cfg = Config(width=64, height=64)
    assert cfg.rc_algorithm == "no-rc"
    cfg.parse("bitrate", 100000)
    assert cfg.rc_algorithm == "lambda"


def test_no_rc_means_constant_qp():
    cfg = Config(width=64, height=64, qp=30, target_bitrate=500000,
                 rc_algorithm="no-rc", intra_period=1)
    enc = Encoder(cfg)
    assert enc._rc is None


def test_interlace_rejects_bpyramid():
    cfg = Config(width=64, height=64, qp=30, source_scan_type="tff",
                 gop_len=8, ctu_size=16, intra_period=0)
    with pytest.raises(ValueError):
        cfg.validate()


def test_rd_ladder_changes_decisions():
    """--rd widens the per-leaf RDO candidate set (top-K SATD modes get
    a full RD cost, reference src/cfg.c preset rd axis): decisions must
    differ on structured content, and every rd level stays conformant."""
    from kvazaar_tpu.decoder.decoder import HEVCDecoder
    w, h = 128, 64
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    y = ((xx * 3 + yy * 7) % 256).astype(np.uint8)
    y[16:48, 32:96] = (xx[16:48, 32:96] * 11 % 256).astype(np.uint8)
    frames = [(y, np.full((h // 2, w // 2), 100, np.uint8),
               np.full((h // 2, w // 2), 150, np.uint8))]
    outs = {}
    for rd in (0, 3):
        cfg = Config(width=w, height=h, qp=27, intra_period=1, rd=rd)
        data, _ = encode_sequence(cfg, frames)
        recs = HEVCDecoder().decode(bytes(data))
        assert all(f.hash_ok for f in recs)
        outs[rd] = bytes(data)
    assert outs[0] != outs[3]
