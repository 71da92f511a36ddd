"""Raw YUV / Y4M file reading and writing.

Reference parity: kvazaar src/yuv_io.c (yuv_io_read/seek/write incl. y4m
header handling at encmain.c:339).
"""
from __future__ import annotations

import numpy as np


class YUVReader:
    """Planar 4:2:0 reader (8- or 10+-bit LE), raw .yuv or .y4m."""

    def __init__(self, path: str, width: int = 0, height: int = 0,
                 bit_depth: int = 8) -> None:
        self.f = open(path, "rb")
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.y4m = path.endswith(".y4m")
        if self.y4m:
            header = b""
            while not header.endswith(b"\n"):
                header += self.f.read(1)
            for tok in header.decode().split():
                if tok.startswith("W"):
                    self.width = int(tok[1:])
                elif tok.startswith("H"):
                    self.height = int(tok[1:])
                elif tok.startswith("C"):
                    if tok.startswith("C420p10"):
                        self.bit_depth = 10
                    elif not tok.startswith("C420"):
                        raise ValueError("only 4:2:0 y4m supported")
        if not self.width or not self.height:
            raise ValueError("resolution required for raw yuv")

    def read_frame(self):
        if self.y4m:
            line = b""
            ch = self.f.read(1)
            if not ch:
                return None
            while ch and ch != b"\n":
                line += ch
                ch = self.f.read(1)
            if not line.startswith(b"FRAME"):
                return None
        w, h = self.width, self.height
        bpp = 2 if self.bit_depth > 8 else 1
        data = self.f.read(w * h * 3 // 2 * bpp)
        if len(data) < w * h * 3 // 2 * bpp:
            return None
        buf = np.frombuffer(data,
                            dtype=np.uint8 if bpp == 1 else "<u2")
        y = buf[:w * h].reshape(h, w)
        cb = buf[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
        cr = buf[w * h + w * h // 4:].reshape(h // 2, w // 2)
        return y, cb, cr

    def seek(self, n_frames: int) -> None:
        for _ in range(n_frames):
            if self.read_frame() is None:
                break

    def close(self) -> None:
        self.f.close()


def write_yuv(path: str, frames) -> None:
    with open(path, "wb") as f:
        for (y, cb, cr) in frames:
            f.write(np.asarray(y, np.uint8).tobytes())
            f.write(np.asarray(cb, np.uint8).tobytes())
            f.write(np.asarray(cr, np.uint8).tobytes())
