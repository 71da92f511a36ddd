"""CABAC binary arithmetic coder (HEVC spec 9.3).

Host-side entropy coding: the encoder engine follows the standard low/range
formulation with carry propagation via byte buffering; the decoder follows
spec 9.3.4.3 exactly. Both are validated by round-trip tests and by decoding
reference-encoder bitstreams.

Reference parity: kvazaar src/cabac.c / src/cabac.h (engine + context
families) and src/context.c (initialization). In our TPU design CABAC stays
on host and consumes device-computed decision/coefficient tensors; see
kvazaar_tpu/syntax/.
"""
from __future__ import annotations

from .tables import (CONTEXT_INIT, LPS_TABLE, RENORM_TABLE, TRANS_LPS,
                     TRANS_MPS, context_init_state, ENTROPY_BITS)
from .bitstream import BitReader, BitWriter

_LPS = LPS_TABLE.tolist()
_TLPS = TRANS_LPS.tolist()
_TMPS = TRANS_MPS.tolist()
_RENORM = RENORM_TABLE.tolist()
_EBITS = ENTROPY_BITS.tolist()


class ContextSet:
    """All context models of one slice, stored as flat state/mps lists.

    Contexts are addressed as (family, index) resolved once into flat
    offsets via `offsets`.
    """

    FAMILIES = [k for k, v in CONTEXT_INIT.items() if v is not None]
    OFFSETS: dict[str, int] = {}
    _n = 0
    for _f in FAMILIES:
        OFFSETS[_f] = _n
        _n += len(CONTEXT_INIT[_f][0])
    NUM_CTX = _n

    __slots__ = ("state", "mps")

    def __init__(self, init_type: int, qp: int) -> None:
        self.state = [0] * self.NUM_CTX
        self.mps = [0] * self.NUM_CTX
        for fam in self.FAMILIES:
            base = self.OFFSETS[fam]
            for i, iv in enumerate(CONTEXT_INIT[fam][init_type]):
                s, m = context_init_state(iv, qp)
                self.state[base + i] = s
                self.mps[base + i] = m

    def copy(self) -> "ContextSet":
        new = object.__new__(ContextSet)
        new.state = list(self.state)
        new.mps = list(self.mps)
        return new

    @classmethod
    def idx(cls, family: str, i: int = 0) -> int:
        return cls.OFFSETS[family] + i


class CabacEncoder:
    """HEVC binary arithmetic encoder (low/range with buffered-byte carry)."""

    __slots__ = ("low", "range", "bits_left", "num_buffered", "buffered",
                 "bw", "ctx", "only_count", "frac_bits", "crypto_res")

    def __init__(self, bw: BitWriter | None = None,
                 ctx: ContextSet | None = None) -> None:
        self.bw = bw
        self.ctx = ctx
        self.only_count = False
        self.frac_bits = 0  # in 1/32768 bit units, for RD search
        # optional selective-encryption state: (CryptoHandle, features)
        # attached per entropy stream (extras/crypto.py)
        self.crypto_res = None
        self.reset()

    def reset(self) -> None:
        self.low = 0
        self.range = 510
        self.bits_left = 23
        self.num_buffered = 0
        self.buffered = 0xFF

    @property
    def bit_count(self) -> int:
        """Bits produced so far (incl. buffered carry bytes and the
        arithmetic-coder backlog) — for per-CTU rate-control stats."""
        base = 0
        if self.bw is not None:
            base = 8 * len(self.bw._bytes) + self.bw._nbits
        return base + 8 * self.num_buffered + (23 - self.bits_left)

    # -- engine ------------------------------------------------------------

    def _write_out(self) -> None:
        lead = self.low >> (24 - self.bits_left)
        self.bits_left += 8
        self.low &= 0xFFFFFFFF >> self.bits_left
        if lead == 0xFF:
            self.num_buffered += 1
        elif self.num_buffered > 0:
            carry = lead >> 8
            self.bw.u((self.buffered + carry) & 0xFF, 8)
            self.buffered = lead & 0xFF
            fill = (0xFF + carry) & 0xFF
            while self.num_buffered > 1:
                self.bw.u(fill, 8)
                self.num_buffered -= 1
        else:
            self.num_buffered = 1
            self.buffered = lead

    def _test_write(self) -> None:
        if self.bits_left < 12:
            self._write_out()

    def encode_bin(self, ctx_idx: int, binval: int) -> None:
        ctx = self.ctx
        state = ctx.state[ctx_idx]
        if self.only_count:
            self.frac_bits += _EBITS[(state << 1) ^
                                     (1 if binval != ctx.mps[ctx_idx] else 0)]
        lps = _LPS[state][(self.range >> 6) & 3]
        self.range -= lps
        if binval != ctx.mps[ctx_idx]:
            nbits = _RENORM[lps >> 3]
            self.low = (self.low + self.range) << nbits
            self.range = lps << nbits
            if state == 0:
                ctx.mps[ctx_idx] ^= 1
            ctx.state[ctx_idx] = _TLPS[state]
            self.bits_left -= nbits
            self._test_write()
        else:
            ctx.state[ctx_idx] = _TMPS[state]
            if self.range >= 256:
                return
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
            self._test_write()

    def encode_bin_ep(self, binval: int) -> None:
        if self.only_count:
            self.frac_bits += 32768
        self.low <<= 1
        if binval:
            self.low += self.range
        self.bits_left -= 1
        self._test_write()

    def encode_bins_ep(self, pattern: int, nbins: int) -> None:
        if self.only_count:
            self.frac_bits += 32768 * nbins
        while nbins > 8:
            nbins -= 8
            self.low = (self.low << 8) + self.range * ((pattern >> nbins)
                                                       & 0xFF)
            self.bits_left -= 8
            self._test_write()
        if nbins > 0:
            self.low = (self.low << nbins) + self.range * (pattern
                                                           & ((1 << nbins) - 1))
            self.bits_left -= nbins
            self._test_write()

    def encode_bin_trm(self, binval: int) -> None:
        if self.only_count:
            self.frac_bits += 32768  # rough
        self.range -= 2
        if binval:
            self.low += self.range
            self.low <<= 7
            self.range = 2 << 7
            self.bits_left -= 7
        elif self.range >= 256:
            return
        else:
            self.low <<= 1
            self.range <<= 1
            self.bits_left -= 1
        self._test_write()

    def finish(self) -> None:
        """Flush; caller then writes rbsp stop bit via bw.byte_align_one()."""
        if self.low >> (32 - self.bits_left):
            self.bw.u(self.buffered + 1, 8)
            while self.num_buffered > 1:
                self.bw.u(0x00, 8)
                self.num_buffered -= 1
            self.low -= 1 << (32 - self.bits_left)
        else:
            if self.num_buffered > 0:
                self.bw.u(self.buffered, 8)
            while self.num_buffered > 1:
                self.bw.u(0xFF, 8)
                self.num_buffered -= 1
        self.bw.u(self.low >> 8, 24 - self.bits_left)

    # -- composite binarizations -------------------------------------------

    def encode_unary_max(self, value: int, ctx_idx: int, max_val: int) -> None:
        """Truncated unary with a single context."""
        for i in range(value):
            self.encode_bin(ctx_idx, 1)
        if value < max_val:
            self.encode_bin(ctx_idx, 0)

    def encode_remaining_golomb(self, value: int, rice: int) -> None:
        """coeff_abs_level_remaining binarization (spec 9.3.3.13)."""
        if (value >> rice) < 3:
            length = value >> rice
            self.encode_bins_ep((1 << (length + 1)) - 2, length + 1)
            if rice:
                self.encode_bins_ep(value & ((1 << rice) - 1), rice)
        else:
            length = rice
            value -= 3 << rice
            while value >= (1 << length):
                value -= 1 << length
                length += 1
            self.encode_bins_ep((1 << (3 + length + 1 - rice)) - 2,
                                3 + length + 1 - rice)
            self.encode_bins_ep(value, length)


class CabacDecoder:
    """HEVC binary arithmetic decoder (spec 9.3.4.3)."""

    __slots__ = ("range", "offset", "br", "ctx", "crypto_res")

    def __init__(self, br: BitReader, ctx: ContextSet) -> None:
        self.br = br
        self.ctx = ctx
        self.crypto_res = None   # (CryptoHandle, features) or None
        self.range = 510
        self.offset = br.u(9)

    def _read_bit(self) -> int:
        br = self.br
        if br.pos < len(br.data) * 8:
            return br.u(1)
        br.pos += 1  # conceptually reading past the end yields 0
        return 0

    def decode_bin(self, ctx_idx: int) -> int:
        ctx = self.ctx
        state = ctx.state[ctx_idx]
        lps = _LPS[state][(self.range >> 6) & 3]
        self.range -= lps
        if self.offset >= self.range:
            binval = ctx.mps[ctx_idx] ^ 1
            self.offset -= self.range
            self.range = lps
            if state == 0:
                ctx.mps[ctx_idx] ^= 1
            ctx.state[ctx_idx] = _TLPS[state]
        else:
            binval = ctx.mps[ctx_idx]
            ctx.state[ctx_idx] = _TMPS[state]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bit()
        return binval

    def decode_bin_ep(self) -> int:
        self.offset = (self.offset << 1) | self._read_bit()
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bins_ep(self, nbins: int) -> int:
        v = 0
        for _ in range(nbins):
            v = (v << 1) | self.decode_bin_ep()
        return v

    def decode_bin_trm(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bit()
        return 0

    def decode_unary_max(self, ctx_idx: int, max_val: int) -> int:
        v = 0
        while v < max_val and self.decode_bin(ctx_idx):
            v += 1
        return v

    def decode_remaining_golomb(self, rice: int) -> int:
        prefix = 0
        while prefix < 32 and self.decode_bin_ep():
            prefix += 1
        if prefix < 3:
            return (prefix << rice) + (self.decode_bins_ep(rice) if rice
                                       else 0)
        length = prefix - 3 + rice
        return ((((1 << (prefix - 3)) + 3 - 1) << rice)
                + self.decode_bins_ep(length))
