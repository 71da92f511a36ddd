"""Benchmark: 1080p all-intra encode fps on the QUADTREE flagship path
(CTB 64 partition DP + wavefront recon + deblock + SAO + RDOQ, native
C++ entropy) vs the reference encoder's MEDIUM preset on this host, with
a BD-rate measurement at matched settings (tools/bd_rate.py, QP
22/27/32/37, 416x240 clips).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline = our fps / reference-medium fps (all-intra, same content).
Extra keys: breakdown (device/entropy ms), bytes at QP27 for both
encoders, and bd_rate_vs_medium_pct (negative = we need fewer bits at
equal PSNR).
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

W, H, QP, N_FRAMES = 1920, 1080, 27, 12
TOOLS = dict(deblock_enable=True, sao_type="full", rdoq_enable=True,
             signhide_enable=False)   # the medium-preset tool row


def synth_frames(n, w, h):
    rng = np.random.RandomState(7)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    noise = rng.randint(-12, 12, (h, w))
    frames = []
    for i in range(n):
        y = np.clip(128 + 80 * np.sin(xx / 23 + i * 0.3) * np.cos(yy / 17)
                    + 20 * np.sin((xx + yy) / 7) + noise, 0, 255) \
            .astype(np.uint8)
        cb = (128 + 40 * np.sin(xx[:h // 2, :w // 2] / 31)).astype(np.uint8)
        cr = (128 + 40 * np.cos(yy[:h // 2, :w // 2] / 29)).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def bench_ours(frames):
    from kvazaar_tpu.api import Encoder, encode_sequence
    from kvazaar_tpu.cfg import Config
    cfg = Config(width=W, height=H, qp=QP, ctu_size=64, intra_period=1,
                 **TOOLS)
    enc = Encoder(cfg)
    # warmup (compile)
    enc.encode_frame(*frames[0])
    enc.frame_num = 0
    t0 = time.time()
    out, infos = encode_sequence(cfg, frames, encoder=enc)
    dt = time.time() - t0
    # breakdown: device-only throughput (pull one small dependent output
    # per frame so timing can't run ahead of execution), then host
    # entropy alone
    pipe = enc._pipeline
    y, cb, cr = frames[1]
    yp = np.pad(y, ((0, 8), (0, 0)), mode="edge")
    cbp = np.pad(cb, ((0, 4), (0, 0)), mode="edge")
    crp = np.pad(cr, ((0, 4), (0, 0)), mode="edge")
    outs = pipe.submit(yp, cbp, crp)
    dep = "hostbuf" if "hostbuf" in outs else "hash"
    np.asarray(outs[dep])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        outs = pipe.submit(yp, cbp, crp)
        np.asarray(outs[dep])
    t_dev = (time.time() - t0) / reps
    d = pipe.materialize(outs)
    meta = enc.submit_frame(*frames[1])
    t0 = time.time()
    enc.finalize_frame(meta)
    t_host = time.time() - t0
    return len(frames) / dt, len(out), t_dev, t_host


def bench_reference(frames, preset="medium"):
    from tools.refbuild import ensure_ref_encoder
    ref = ensure_ref_encoder()
    if ref is None:
        return None, None
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for (y, cb, cr) in frames:
                f.write(y.tobytes())
                f.write(cb.tobytes())
                f.write(cr.tobytes())
        t0 = time.time()
        # preset FIRST (presets override earlier flags); the reference
        # gets default threading (whole host CPU)
        subprocess.run([ref, "--preset", preset, "-i", yuv,
                        "--input-res", f"{W}x{H}", "-o",
                        os.path.join(td, "o.hevc"),
                        "-p", "1", "--qp", str(QP)],
                       check=True, capture_output=True)
        dt = time.time() - t0
        nbytes = os.path.getsize(os.path.join(td, "o.hevc"))
    return len(frames) / dt, nbytes


def main():
    frames = synth_frames(N_FRAMES, W, H)
    fps, nbytes, t_dev, t_host = bench_ours(frames)
    ref_fps, ref_bytes = bench_reference(frames)
    bd = None
    if "--no-bd" not in sys.argv and ref_fps is not None:
        try:
            from tools.bd_rate import measure
            bd = measure("medium", 8)["bd_rate_pct"]
        except Exception:
            bd = None
    print(json.dumps({
        "metric": "1080p_allintra_quadtree_fps_vs_medium",
        "value": round(fps, 4),
        "unit": "fps",
        "vs_baseline": (round(fps / ref_fps, 4) if ref_fps else None),
        "ref_medium_fps": round(ref_fps, 4) if ref_fps else None,
        "device_ms_per_frame": round(t_dev * 1000, 1),
        "host_entropy_ms_per_frame": round(t_host * 1000, 1),
        "bytes_qp27_ours": nbytes,
        "bytes_qp27_ref": ref_bytes,
        "bd_rate_vs_medium_pct": bd,
    }))


if __name__ == "__main__":
    main()
