"""Stage-level wall-clock profile of the quadtree inter pipeline at
1080p on the real device: times each device sub-stage as its own jitted
program (fusion differs from the monolith, so treat as indicative), plus
the end-to-end P and B programs.

Usage: python tools/prof_md.py [--skip-stages]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from kvazaar_tpu.models.inter_md import MdInterPipeline

W, H, QP = 1920, 1088, 27   # CTB-aligned (the API pads 1080 -> 1088)


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000
    print(f"{name:34s} {dt:9.1f} ms   (first call {compile_s:6.1f} s)",
          flush=True)
    return out


def main():
    rng = np.random.RandomState(3)
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    base = np.clip(128 + 80 * np.sin(xx / 23) * np.cos(yy / 17)
                   + rng.randint(-10, 10, (H, W)), 0, 255).astype(np.uint8)
    src = np.roll(base, (3, 5), (0, 1))
    cb = np.full((H // 2, W // 2), 120, np.uint8)
    cr = np.full((H // 2, W // 2), 130, np.uint8)

    pipe = MdInterPipeline(H, W, QP, n_refs=1, b_slices=True,
                           deblock=True, sao="full", rdoq=True,
                           sign_hiding=False)
    srcj = jnp.asarray(src, jnp.int32)
    refj = jnp.asarray(base, jnp.int32)
    cbj = jnp.asarray(cb, jnp.int32)
    crj = jnp.asarray(cr, jnp.int32)
    refs_y = refj[None]
    refs_cb = cbj[None]
    refs_cr = crj[None]
    lam = pipe.lam2[0]
    C = pipe.consts

    if "--skip-stages" not in sys.argv:
        wc = pipe._with_consts

        cf = jax.jit(wc(pipe._coarse_field))
        mv16 = timeit("coarse_field (1 ref)", cf, C, srcj, refj)

        fields = [mv16]
        for n in (8, 16, 32, 64):
            fn = jax.jit(wc(
                lambda s, ry, f, nn=n: pipe._best_uni_leaf(
                    pipe._blocks_of(s, nn)[0], ry, [f],
                    (jnp.arange((H // nn) * (W // nn)) // (W // nn)) * nn,
                    (jnp.arange((H // nn) * (W // nn)) % (W // nn)) * nn,
                    nn, pipe.lam2[0])))
            timeit(f"best_uni_leaf n={n} (1 ref)", fn, C, srcj, refs_y,
                   mv16)

        for n, g, f, gc, t, tc in (
                (8, pipe.g8l, pipe.f8, pipe.g4c, pipe.t8, pipe.t4),
                (16, pipe.g16l, pipe.f16l, pipe.g8cc, pipe.t16, pipe.t8),
                (32, pipe.g32l, pipe.f32, pipe.g16c, pipe.t32, pipe.t16)):
            fn = jax.jit(wc(
                lambda sy, sb, sr, nn=n, gg=g, ff=f, gcc=gc, tt=t, tcc=tc:
                pipe._leaf_rd(sy, sb, sr, nn, gg, ff, gcc, tt, tcc,
                              pipe.lam2[0])))
            timeit(f"intra leaf_rd n={n}", fn, C, srcj, cbj, crj)

        for n, t, tc in ((8, pipe.t8, pipe.t4), (16, pipe.t16, pipe.t8),
                         (32, pipe.t32, pipe.t16),
                         (64, pipe.t32, pipe.t16)):
            fn = jax.jit(wc(
                lambda sy, sb, sr, ry, rb, rr, f, nn=n, tt=t, tcc=tc:
                pipe._inter_leaf(sy, sb, sr, ry, rb, rr, [f], nn, tt,
                                 tcc, pipe.lam2[0])))
            timeit(f"inter_leaf n={n} (P)", fn, C, srcj, cbj, crj,
                   refs_y, refs_cb, refs_cr, mv16)

        part = jax.jit(wc(
            lambda sy, sb, sr, ry, rb, rr: pipe._partition_inter(
                sy, sb, sr, ry, rb, rr, pipe.lam2[0])))
        pout = timeit("partition_inter (P, full)", part, C, srcj, cbj,
                      crj, refs_y, refs_cb, refs_cr)
        size_map8, mode_map8, inter8, mv8, ref8 = pout[:5]
        part8 = pout[5] if len(pout) > 5 else None

        recon = jax.jit(wc(
            lambda sy, sb, sr, ry, rb, rr, s8, i8, m8, r8:
            pipe._inter_recon_batch(sy, sb, sr, ry, rb, rr, s8, i8, m8,
                                    r8, part8=None)))
        init = timeit("inter_recon_batch", recon, C, srcj, cbj, crj,
                      refs_y, refs_cb, refs_cr, size_map8, inter8, mv8,
                      ref8)

        def wave(sy, sb, sr, s8, m8, i0, i1, i2):
            saved = pipe.trskip
            pipe.trskip = False
            try:
                return pipe._recon_md(sy, sb, sr, s8, m8,
                                      init_state=(i0, i1, i2),
                                      exclude8=i2)
            finally:
                pipe.trskip = saved
        wv = jax.jit(wc(wave))
        timeit("recon_md wavefront (excl inter)", wv, C, srcj, cbj, crj,
               size_map8, mode_map8, init[0], init[1], init[2])

    # end-to-end programs (the shipping ones)
    ref_pocs = np.asarray([0], np.int32)
    t0 = time.time()
    out = pipe.submit_inter(src, cb, cr, [base], [cb], [cr], ref_pocs)
    jax.block_until_ready(out["hostbuf"])
    print(f"P full first-call: {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = pipe.submit_inter(src, cb, cr, [base], [cb], [cr], ref_pocs)
        jax.block_until_ready(out["hostbuf"])
    print(f"P full steady: {(time.time() - t0) / reps * 1000:.1f} ms",
          flush=True)

    l0 = ([base, base], [cb, cb], [cr, cr])
    l1 = ([base, base], [cb, cb], [cr, cr])
    t0 = time.time()
    out = pipe.submit_inter_b(src, cb, cr, l0, l1, [0, 0], [2, 2])
    jax.block_until_ready(out["hostbuf"])
    print(f"B full first-call: {time.time() - t0:.1f} s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = pipe.submit_inter_b(src, cb, cr, l0, l1, [0, 0], [2, 2])
        jax.block_until_ready(out["hostbuf"])
    print(f"B full steady: {(time.time() - t0) / reps * 1000:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
