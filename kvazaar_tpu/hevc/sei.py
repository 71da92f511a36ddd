"""SEI messages: decoded-picture-hash (spec D.2.20) and user data.

Reference parity: kvazaar src/encoder_state-bitstream.c:962 (add_checksum)
and :608 (encoder-version user-data SEI).
"""
from __future__ import annotations

import hashlib

import numpy as np

from ..bitstream import BitWriter

SEI_DECODED_PICTURE_HASH = 132
SEI_USER_DATA_UNREGISTERED = 5

HASH_MD5 = 0
HASH_CRC = 1
HASH_CHECKSUM = 2


def plane_checksum(plane: np.ndarray, bit_depth: int = 8) -> int:
    """HEVC picture checksum of one plane (spec D.3.20)."""
    h, w = plane.shape
    y, x = np.mgrid[0:h, 0:w]
    xor_mask = ((x & 0xFF) ^ (y & 0xFF) ^ (x >> 8) ^ (y >> 8)).astype(
        np.uint32)
    vals = (plane.astype(np.uint32) & 0xFF) ^ xor_mask
    total = int(vals.sum(dtype=np.uint64) & 0xFFFFFFFF)
    # For bit depths > 8 the high byte contributes too.
    if bit_depth > 8:
        hi = ((plane.astype(np.uint32) >> 8) ^ xor_mask)
        total = (total + int(hi.sum(dtype=np.uint64))) & 0xFFFFFFFF
    return total


def plane_md5(plane: np.ndarray, bit_depth: int = 8) -> bytes:
    if bit_depth <= 8:
        data = plane.astype(np.uint8).tobytes()
    else:
        data = plane.astype("<u2").tobytes()
    return hashlib.md5(data).digest()


def _sei_payload(payload_type: int, payload: bytes) -> bytes:
    out = bytearray()
    t = payload_type
    while t >= 255:
        out.append(255)
        t -= 255
    out.append(t)
    n = len(payload)
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)
    out.extend(payload)
    return bytes(out)


def write_hash_sei(planes: list[np.ndarray], hash_type: int = HASH_CHECKSUM,
                   bit_depth: int = 8, checksums=None) -> bytes:
    """RBSP of a suffix SEI carrying the decoded-picture hash.
    `checksums` (3 uint32) may be precomputed (e.g. on device)."""
    body = bytearray([hash_type])
    if hash_type == HASH_CHECKSUM and checksums is not None:
        for c in checksums:
            body.extend(int(c).to_bytes(4, "big"))
        planes = []
    for plane in planes:
        if hash_type == HASH_CHECKSUM:
            body.extend(plane_checksum(plane, bit_depth).to_bytes(4, "big"))
        elif hash_type == HASH_MD5:
            body.extend(plane_md5(plane, bit_depth))
        else:
            raise NotImplementedError("CRC hash")
    bw = BitWriter()
    bw.write_bytes(_sei_payload(SEI_DECODED_PICTURE_HASH, bytes(body)))
    bw.byte_align_one()
    return bw.get_bytes()


def parse_sei_messages(rbsp: bytes) -> list[tuple[int, bytes]]:
    """Parse SEI RBSP into (payload_type, payload) messages."""
    out = []
    i = 0
    n = len(rbsp)
    while i < n - 1:  # last byte is rbsp trailing bits
        ptype = 0
        while rbsp[i] == 255:
            ptype += 255
            i += 1
        ptype += rbsp[i]
        i += 1
        size = 0
        while rbsp[i] == 255:
            size += 255
            i += 1
        size += rbsp[i]
        i += 1
        out.append((ptype, rbsp[i:i + size]))
        i += size
        if i >= n:
            break
        # stop if only trailing bits remain
        if all(b == 0 for b in rbsp[i + 1:]) and rbsp[i] == 0x80:
            break
    return out


def parse_hash_sei(payload: bytes) -> tuple[int, list[bytes]]:
    hash_type = payload[0]
    size = {HASH_MD5: 16, HASH_CRC: 2, HASH_CHECKSUM: 4}[hash_type]
    hashes = [payload[1 + i * size:1 + (i + 1) * size]
              for i in range((len(payload) - 1) // size)]
    return hash_type, hashes


def write_pic_timing_sei(pic_struct: int, field_seq: bool = True) -> bytes:
    """pic_timing SEI RBSP (spec D.2.3/D.3.3): pic_struct only, as the
    reference writes for field coding (encoder_state-bitstream.c
    pic-timing SEI; pic_struct 1 = top field, 2 = bottom field)."""
    from ..bitstream import BitWriter
    body = BitWriter()
    body.u(pic_struct, 4)
    body.u(0, 2)    # source_scan_type: interlaced
    body.u(0, 1)    # duplicate_flag
    body.byte_align_one()
    payload = body.get_bytes()
    bw = BitWriter()
    bw.u(1, 8)      # payload type: pic_timing
    bw.u(len(payload), 8)
    out = bytes(bw.get_bytes()) + payload
    return out + b"\x80"  # rbsp trailing bits
