"""kvz_api-shaped public interface.

Mirrors the reference's stable library surface (src/kvazaar.h:664-826
`kvz_api` vtable: config_alloc/init/parse/destroy, picture_alloc/free,
encoder_open/close/headers/encode, chunk handling) with the same
1-in/<=1-out pipelined contract (src/kvazaar.c:238-308): `encoder_encode`
may buffer the frame and return data for an earlier one; feed None
(pic_in == NULL) to drain.

This is the Python ABI of the framework; `api.Encoder` remains the
idiomatic interface underneath. A C-callable shim can map onto these
functions 1:1 (ctypes/cffi), since every type here is plain
(bytes/ndarray/dataclass).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .api import Encoder
from .cfg import Config


@dataclass
class KvzPicture:
    """kvz_picture analog: planar 4:2:0 buffers + metadata."""
    width: int
    height: int
    bit_depth: int = 8
    y: np.ndarray = None
    u: np.ndarray = None
    v: np.ndarray = None
    pts: int = 0

    def __post_init__(self):
        dt = np.uint8 if self.bit_depth == 8 else np.uint16
        if self.y is None:
            self.y = np.zeros((self.height, self.width), dt)
            self.u = np.zeros((self.height // 2, self.width // 2), dt)
            self.v = np.zeros((self.height // 2, self.width // 2), dt)


@dataclass
class KvzFrameInfo:
    """kvz_frame_info analog (poc, qp, nal type, psnr)."""
    poc: int = 0
    qp: int = 0
    nal_unit_type: int = 0
    psnr: tuple = (0.0, 0.0, 0.0)


class KvzEncoder:
    """kvz_encoder analog: owns the engine + the 1-in/N-out ring."""

    def __init__(self, cfg: Config) -> None:
        self.enc = Encoder(cfg)
        self.cfg = cfg
        self._pending = []        # coded (bytes, info) not yet returned
        self._meta_q = []         # submitted device work (OWF ring)
        self._frames_in = 0
        self._frames_out = 0


class KvzApi:
    """The kvz_api vtable as a plain object. `kvz_api_get()` returns a
    singleton (bit depth selected per encoder via config)."""

    # -- config ----------------------------------------------------------

    def config_alloc(self) -> Config:
        return Config()

    def config_init(self, cfg: Config) -> Config:
        return cfg  # dataclass defaults == kvz_config_init

    def config_destroy(self, cfg: Config) -> None:
        pass

    def config_parse(self, cfg: Config, name: str, value) -> bool:
        try:
            cfg.parse(name, value)
            return True
        except (KeyError, ValueError):
            return False

    # -- pictures --------------------------------------------------------

    def picture_alloc(self, width: int, height: int,
                      bit_depth: int = 8) -> KvzPicture:
        return KvzPicture(width, height, bit_depth)

    def picture_free(self, pic: KvzPicture) -> None:
        pass

    def chunk_free(self, chunk) -> None:
        pass

    # -- encoder ---------------------------------------------------------

    def encoder_open(self, cfg: Config) -> KvzEncoder:
        return KvzEncoder(cfg)

    def encoder_close(self, enc: KvzEncoder) -> None:
        enc._pending.clear()
        enc._meta_q.clear()

    def encoder_headers(self, enc: KvzEncoder) -> bytes:
        return enc.enc.headers()

    def encoder_encode(self, enc: KvzEncoder, pic_in: KvzPicture | None):
        """Feed one picture (or None to drain). Returns
        (data_out: bytes, pic_out: KvzPicture | None,
         info: KvzFrameInfo | None) — at most one coded picture per call,
        empty data while the pipeline fills (the reference contract,
        src/kvazaar.c:251-305)."""
        e = enc.enc
        if e.gop_enabled:
            if pic_in is not None:
                enc._pending.extend(
                    e.push_frame(pic_in.y, pic_in.u, pic_in.v))
                enc._frames_in += 1
            elif enc._frames_out < enc._frames_in and not enc._pending:
                enc._pending.extend(e.flush())
        else:
            if pic_in is not None:
                # OWF analog: submit device work now, finalize the
                # PREVIOUS frame's entropy coding while it runs
                enc._meta_q.append(
                    e.submit_frame(pic_in.y, pic_in.u, pic_in.v))
                enc._frames_in += 1
                if len(enc._meta_q) > max(0, enc.cfg.owf):
                    enc._pending.append(
                        e.finalize_frame(enc._meta_q.pop(0)))
            elif enc._meta_q:
                enc._pending.append(e.finalize_frame(enc._meta_q.pop(0)))
        if not enc._pending:
            return b"", None, None
        data, info = enc._pending.pop(0)
        enc._frames_out += 1
        rec = info["recon_out"]
        pic_out = KvzPicture(self._w(rec[0]), self._h(rec[0]),
                             enc.cfg.input_bitdepth,
                             y=np.asarray(rec[0]),
                             u=np.asarray(rec[1]),
                             v=np.asarray(rec[2]))
        fi = KvzFrameInfo(poc=info["poc"], qp=info["qp"],
                          psnr=tuple(info["psnr"]))
        return data, pic_out, fi

    @staticmethod
    def _w(p):
        return p.shape[1]

    @staticmethod
    def _h(p):
        return p.shape[0]


_API = KvzApi()


def kvz_api_get(bit_depth: int = 8) -> KvzApi:
    """kvz_api_get analog (src/kvazaar.h:829); bit depth rides the
    config (`input_bitdepth`) rather than separate builds."""
    return _API
