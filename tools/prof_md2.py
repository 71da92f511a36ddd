"""Sub-op profile of _inter_leaf pieces at one size."""
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

W, H, QP = 1920, 1088, 27


def timeit(name, fn, *args, reps=5):
    t0 = time.time()
    jax.block_until_ready(fn(*args))
    c = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    print(f"{name:40s} {(time.time() - t0) / reps * 1000:9.1f} ms "
          f"(compile {c:5.1f}s)", flush=True)
    return out


def main():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 256, (H, W)).astype(np.int32)
    ref = np.clip(src + rng.randint(-6, 6, (H, W)), 0, 255)
    pipe = MdInterPipeline(H, W, QP, n_refs=1, b_slices=False,
                           deblock=True, sao="full", rdoq=True,
                           sign_hiding=False)
    srcj = jnp.asarray(src)
    refj = jnp.asarray(ref)
    refs_y = refj[None]
    C = pipe.consts
    wc = pipe._with_consts

    for n in (16, 64):
        t = {8: pipe.t8, 16: pipe.t16, 32: pipe.t32, 64: pipe.t32}[n]
        blocks, rows, cols = pipe._blocks_of(srcj, n)
        nb = rows * cols
        bid = np.arange(nb)
        y0 = jnp.asarray((bid // cols) * n)
        x0 = jnp.asarray((bid % cols) * n)
        mv = jnp.zeros((nb, 2), jnp.int32)
        refsel = jnp.zeros((nb,), jnp.int32)
        P = pipe.SUBPEL_PAD

        def mc(s, ry):
            ypad = jnp.pad(ry, ((0, 0), (P, P), (P, P)), mode="edge")
            return pipe._mc_luma_sel(ypad, refsel, mv, y0, x0, n, P)
        pred = timeit(f"n={n} mc_luma_sel", jax.jit(wc(mc)), C, srcj,
                      refs_y)

        resi = (blocks - pred).astype(jnp.int32)

        def tq(r):
            saved = (pipe.rdoq, pipe.sign_hiding)
            pipe.rdoq = pipe.sign_hiding = False
            try:
                if n == 64:
                    return pipe._tq_quad(r, pipe.qp2[0], True,
                                         lam=pipe.lam2[0])
                return pipe._transform_quant(
                    r, t, pipe.qp2[0], n, mats=pipe._mats_for(n, True))
            finally:
                pipe.rdoq, pipe.sign_hiding = saved
        levels, r2 = timeit(f"n={n} transform_quant", jax.jit(wc(tq)),
                            C, resi)

        if n != 64:
            def zt(r, lv, rr):
                return pipe._rd_zero_tu(r, lv, rr, pipe.lam2[0], n, True)
            timeit(f"n={n} rd_zero_tu", jax.jit(wc(zt)), C, resi,
                   levels, r2)

        def rate(lv):
            if n == 64:
                L = lv.shape[0]
                lv4 = jnp.moveaxis(lv.reshape(L, 2, 32, 2, 32), 2, 3) \
                    .reshape(L * 4, 32, 32)
                return pipe._tu_rate_y(lv4, 32, depth1=True)
            return pipe._tu_rate_y(lv, n)
        timeit(f"n={n} tu_rate_y", jax.jit(wc(rate)), C, levels)

        def mproxy(m, rf):
            return pipe._merge_proxy(m, rf, rows, cols)
        timeit(f"n={n} merge_proxy", jax.jit(wc(mproxy)), C, mv, refsel)

        nc = n // 2
        CPW = (P >> 1) + 2
        cb = jnp.asarray(rng.randint(0, 256, (H // 2, W // 2)), jnp.int32)
        cbr = jnp.asarray(np.asarray(
            np.clip(np.asarray(cb) + rng.randint(-4, 4, (H // 2, W // 2)),
                    0, 255)), jnp.int32)
        cy0 = jnp.asarray((bid // cols) * nc)
        cx0 = jnp.asarray((bid % cols) * nc)

        def mcc(c):
            cpad = jnp.pad(c[None], ((0, 0), (CPW, CPW), (CPW, CPW)),
                           mode="edge")
            return pipe._mc_chroma_sel(cpad, refsel, mv, cy0, cx0, nc,
                                       CPW)
        cpred = timeit(f"n={n} mc_chroma_sel", jax.jit(wc(mcc)), C, cbr)

        cblocks, _, _ = pipe._blocks_of(cb, nc)
        cresi = (cblocks - cpred).astype(jnp.int32)

        def ctq(r):
            saved = (pipe.rdoq, pipe.sign_hiding)
            pipe.rdoq = pipe.sign_hiding = False
            try:
                if nc == 32:
                    return pipe._tq_quad(r, pipe.qp2[1], False,
                                         lam=pipe.lam2[0])
                tc = {4: pipe.t4, 8: pipe.t8, 16: pipe.t16}[nc]
                lv, rr = pipe._transform_quant(
                    r, tc, pipe.qp2[1], nc, mats=pipe._mats_for(nc, False))
                return pipe._rd_zero_tu(r, lv, rr, pipe.lam2[0], nc,
                                        False)
            finally:
                pipe.rdoq, pipe.sign_hiding = saved
        timeit(f"n={n} chroma tq+zero", jax.jit(wc(ctq)), C, cresi)


if __name__ == "__main__":
    main()
