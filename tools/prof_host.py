"""Host-side finalize profile of the flagship pipelines.

Answers "where do the host milliseconds go per frame" (VERDICT r3 #2:
the host entropy bottleneck): warms the 1080p program, then cProfiles
submit_frame + finalize_frame in steady state and prints the top
cumulative offenders, plus coarse wall-clock splits (D2H wait,
materialize, slice write, assembly).

Usage: python tools/prof_host.py [--frames 6] [--mode intra|lowdelay]
"""
import argparse
import cProfile
import io
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np


def synth(n, w, h):
    rng = np.random.RandomState(7)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        noise = rng.randint(-12, 12, (h, w))
        y = np.clip(128 + 80 * np.sin(xx / 23 + i * .3) * np.cos(yy / 17)
                    + 20 * np.sin((xx + yy) / 7) + noise, 0,
                    255).astype(np.uint8)
        cb = (128 + 40 * np.sin(xx[:h // 2, :w // 2] / 31)).astype(np.uint8)
        cr = (128 + 40 * np.cos(yy[:h // 2, :w // 2] / 29)).astype(np.uint8)
        out.append((y, cb, cr))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--mode", default="intra",
                    choices=("intra", "lowdelay", "gop8"))
    ap.add_argument("--res", default="1920x1080")
    args = ap.parse_args()
    from kvazaar_tpu.api import Encoder
    from kvazaar_tpu.cfg import Config

    W, H = (int(v) for v in args.res.split("x"))
    kw = dict(width=W, height=H, qp=27, ctu_size=64,
              deblock_enable=True, sao_type="full", rdoq_enable=True,
              signhide_enable=False)
    if args.mode == "intra":
        kw.update(intra_period=1)
    elif args.mode == "lowdelay":
        kw.update(intra_period=0, gop_len=4, gop_lowdelay=True,
                  gop_lp=(3, 1), ref_frames=1)
    else:
        kw.update(intra_period=24, gop_len=8)
    cfg = Config(**kw)
    frames = synth(args.frames, W, H)

    enc = Encoder(cfg)
    t0 = time.time()
    from kvazaar_tpu.api import encode_sequence
    encode_sequence(cfg, frames[:2], encoder=enc)
    print(f"warmup: {time.time() - t0:.1f}s", flush=True)

    enc = Encoder(cfg)
    if args.mode != "intra":
        # steady-state P frames: feed the pipeline past the IDR
        for f in frames[:2]:
            enc.encode_frame(*f)

    # coarse wall splits on one frame
    meta = enc.submit_frame(*frames[2])
    t0 = time.time()
    np.asarray(meta["dev"]["hostbuf"])
    t_d2h = time.time() - t0
    t0 = time.time()
    enc.finalize_frame(meta)
    t_fin = time.time() - t0
    print(f"D2H(hostbuf wait): {t_d2h * 1000:.1f} ms   "
          f"finalize: {t_fin * 1000:.1f} ms", flush=True)

    # cProfile over the steady loop
    pr = cProfile.Profile()
    n = 0
    t0 = time.time()
    pr.enable()
    for f in frames[2:]:
        meta = enc.submit_frame(*f)
        enc.finalize_frame(meta)
        n += 1
    pr.disable()
    dt = time.time() - t0
    print(f"profiled loop: {dt / n * 1000:.0f} ms/frame", flush=True)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
