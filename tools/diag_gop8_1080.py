"""Instrumented 1080p GOP8 encode on TPU: per-frame submit/finalize
wall times, to localize where gop8 fps goes."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np

from bench import TOOLS, synth_frames
from kvazaar_tpu.api import Encoder
from kvazaar_tpu.cfg import Config

W, H, QP, N = 1920, 1080, 27, 12


def main():
    frames = synth_frames(N, W, H)
    cfg = Config(width=W, height=H, qp=QP, ctu_size=64,
                 intra_period=24, gop_len=8, **TOOLS)
    enc = Encoder(cfg)
    t_start = time.time()
    out = []
    for i, (y, cb, cr) in enumerate(frames):
        t0 = time.time()
        coded = enc.push_frame(y, cb, cr)
        dt = time.time() - t0
        print(f"disp {i:2d}: push {dt:7.2f}s  -> {len(coded)} coded",
              flush=True)
        out.extend(coded)
    t0 = time.time()
    out.extend(enc.flush())
    print(f"flush: {time.time()-t0:7.2f}s", flush=True)
    tot = time.time() - t_start
    print(f"total {tot:.1f}s = {N/tot:.4f} fps "
          f"({sum(len(b) for b, _ in out)} B)", flush=True)


if __name__ == "__main__":
    main()
