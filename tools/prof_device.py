"""Device-side stage profile of the quadtree all-intra pipeline.

Times (on the real TPU): the full per-frame program, the partition DP
alone, partition+recon (no loop filters / packing), the wavefront wave
count, and the steady-state submit/finalize loop fps. Used to aim
optimization work; not part of the bench contract.

Usage: python tools/prof_device.py [--frames 8]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from kvazaar_tpu.api import Encoder
    from kvazaar_tpu.cfg import Config

    W, H, QP = 1920, 1080, 27
    cfg = Config(width=W, height=H, qp=QP, ctu_size=64, intra_period=1,
                 deblock_enable=True, sao_type="full", rdoq_enable=True,
                 signhide_enable=False)
    enc = Encoder(cfg)
    rng = np.random.RandomState(7)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    frames = []
    for i in range(args.frames):
        noise = rng.randint(-12, 12, (H, W))
        y = np.clip(128 + 80 * np.sin(xx / 23 + i * .3) * np.cos(yy / 17)
                    + 20 * np.sin((xx + yy) / 7) + noise, 0,
                    255).astype(np.uint8)
        cb = (128 + 40 * np.sin(xx[:H // 2, :W // 2] / 31)).astype(np.uint8)
        cr = (128 + 40 * np.cos(yy[:H // 2, :W // 2] / 29)).astype(np.uint8)
        frames.append((y, cb, cr))

    t0 = time.time()
    enc.encode_frame(*frames[0])
    print(f"warmup(full): {time.time()-t0:.1f}s", flush=True)
    enc.frame_num = 0
    pipe = enc._pipeline

    # sub-stage programs
    def part_only(y, cb, cr):
        return pipe._partition(y.astype(jnp.int32), cb.astype(jnp.int32),
                               cr.astype(jnp.int32), pipe.lam2[0])

    def part_recon(y, cb, cr):
        s, m, m4 = pipe._partition(y.astype(jnp.int32),
                                   cb.astype(jnp.int32),
                                   cr.astype(jnp.int32), pipe.lam2[0])
        luma, chroma, _ = pipe._recon_md(y.astype(jnp.int32),
                                         cb.astype(jnp.int32),
                                         cr.astype(jnp.int32), s, m,
                                         mode_map4=m4)
        return luma[0].sum() + chroma[0].sum(), pipe._last_waves

    jpart = jax.jit(pipe._with_consts(part_only))
    jpr = jax.jit(pipe._with_consts(part_recon))
    y, cb, cr = [jnp.asarray(p) for p in frames[1]]
    t0 = time.time()
    s, m, m4 = jpart(pipe.consts, y, cb, cr)
    np.asarray(s)
    print(f"compile(part): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = jpr(pipe.consts, y, cb, cr)
    np.asarray(out[0])
    print(f"compile(part+recon): {time.time()-t0:.1f}s  "
          f"n_waves={int(np.asarray(out[1]))}", flush=True)

    def timeit(fn, reps=3):
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        return (time.time() - t0) / reps

    t_part = timeit(lambda: np.asarray(jpart(pipe.consts, y, cb, cr)[0]))
    t_pr = timeit(lambda: np.asarray(jpr(pipe.consts, y, cb, cr)[0]))
    outs = pipe.submit(*[np.asarray(p) for p in (y, cb, cr)])
    t_full = timeit(lambda: np.asarray(
        pipe.submit(np.asarray(y), np.asarray(cb),
                    np.asarray(cr))["hostbuf"])[0:1])
    print(f"partition: {t_part*1000:.1f} ms")
    print(f"partition+recon: {t_pr*1000:.1f} ms "
          f"(recon ~ {(t_pr-t_part)*1000:.1f} ms)")
    print(f"full(+filters+pack+D2H): {t_full*1000:.1f} ms", flush=True)

    # steady-state loop
    meta = enc.submit_frame(*frames[0])
    enc.finalize_frame(meta)
    enc.frame_num = 0
    t0 = time.time()
    pending = None
    for f in frames:
        meta = enc.submit_frame(*f)
        if pending is not None:
            enc.finalize_frame(pending)
        pending = meta
    enc.finalize_frame(pending)
    dt = time.time() - t0
    n = len(frames)
    print(f"loop: {dt/n*1000:.0f} ms/frame = {n/dt:.3f} fps", flush=True)


if __name__ == "__main__":
    main()
