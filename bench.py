"""Benchmark: 1080p all-intra encode fps (device pipeline + host entropy).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference encoder (kvazaar, ultrafast
all-intra) run on the host CPU of this machine when the binary is
available; otherwise vs_baseline is null.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# persistent XLA compilation cache: first-run compile of the 1080p pipeline
# is expensive over remote-compile backends; subsequent runs hit the cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

W, H, QP, N_FRAMES = 1920, 1080, 27, 8


def synth_frames(n, w, h):
    rng = np.random.RandomState(7)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    frames = []
    for i in range(n):
        y = (128 + 80 * np.sin(xx / 23 + i * 0.3) * np.cos(yy / 17)
             + 20 * np.sin((xx + yy) / 7)).astype(np.uint8)
        cb = (128 + 40 * np.sin(xx[:h // 2, :w // 2] / 31)).astype(np.uint8)
        cr = (128 + 40 * np.cos(yy[:h // 2, :w // 2] / 29)).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def bench_ours(frames):
    from kvazaar_tpu.api import Encoder, encode_sequence
    from kvazaar_tpu.cfg import Config
    cfg = Config(width=W, height=H, qp=QP, ctu_size=16, intra_period=1)
    enc = Encoder(cfg)
    # warmup (compile)
    enc.encode_frame(*frames[0])
    enc.frame_num = 0
    t0 = time.time()
    out, _ = encode_sequence(cfg, frames, encoder=enc)
    dt = time.time() - t0
    return len(frames) / dt, len(out)


def bench_reference(frames):
    ref = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".refbuild", "bin", "kvazaar")
    if not os.path.exists(ref):
        return None
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for (y, cb, cr) in frames:
                f.write(y.tobytes())
                f.write(cb.tobytes())
                f.write(cr.tobytes())
        t0 = time.time()
        # default threading + wpp/owf: the reference gets the whole host CPU
        subprocess.run([ref, "-i", yuv, "--input-res", f"{W}x{H}", "-o",
                        os.path.join(td, "o.hevc"), "--preset", "ultrafast",
                        "-p", "1", "--qp", str(QP)],
                       check=True, capture_output=True)
        dt = time.time() - t0
    return len(frames) / dt


def main():
    frames = synth_frames(N_FRAMES, W, H)
    fps, nbytes = bench_ours(frames)
    ref_fps = bench_reference(frames)
    print(json.dumps({
        "metric": "1080p_allintra_encode_fps",
        "value": round(fps, 4),
        "unit": "fps",
        "vs_baseline": round(fps / ref_fps, 4) if ref_fps else None,
    }))


if __name__ == "__main__":
    main()
