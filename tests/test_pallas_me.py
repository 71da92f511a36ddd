"""ME refine: the XLA fallback (_me_xla_one) must match a brute-force
numpy model — int +-3 SAD refine with (cand, dy, dx) strict-< ties,
then SATD over all 49 qpel deltas in (qy, qx) scan order.

The pallas TPU kernel (ops/pallas_me.py me_refine) implements the same
algorithm; tools/check_me_parity.py asserts kernel == fallback on real
TPU hardware (the CPU suite cannot run Mosaic kernels)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from kvazaar_tpu.models.inter_md import MdInterPipeline  # noqa: E402
from kvazaar_tpu.ops.mc import LUMA_FILTERS  # noqa: E402


def np_interp(rp, y, x, mvq, n, maxv=255):
    iy, ix = int(mvq[1]) >> 2, int(mvq[0]) >> 2
    fy, fx = int(mvq[1]) & 3, int(mvq[0]) & 3
    f = LUMA_FILTERS

    def at(r, c):
        return rp[np.clip(r, 0, rp.shape[0] - 1),
                  np.clip(c, 0, rp.shape[1] - 1)]
    rows = np.arange(y + iy - 3, y + iy + n + 4)
    cols = np.arange(x + ix - 3, x + ix + n + 4)
    win = at(np.clip(rows, 0, rp.shape[0] - 1)[:, None],
             np.clip(cols, 0, rp.shape[1] - 1)[None, :]).astype(np.int64)
    if fx == 0:
        h14 = win[:, 3:3 + n] * 64
    else:
        h14 = sum(int(f[fx][k]) * win[:, k:k + n] for k in range(8))
    if fy == 0:
        v = (h14[3:3 + n] * 64) >> 6
    else:
        v = sum(int(f[fy][k]) * h14[k:k + n] for k in range(8)) >> 6
    return np.clip((v + 32) >> 6, 0, maxv)


def np_satd(d):
    h = np.array([[1.]])
    for _ in range(3):
        h = np.block([[h, h], [h, -h]])
    tot = 0
    for r in range(d.shape[0] // 8):
        for c in range(d.shape[1] // 8):
            t = h @ d[r * 8:r * 8 + 8, c * 8:c * 8 + 8].astype(
                np.float64) @ h
            tot += np.floor((np.abs(t).sum() + 2.0) / 4.0)
    return int(tot)


def test_me_xla_matches_numpy():
    H, W, n = 64, 128, 16
    rng = np.random.RandomState(11)
    ref = rng.randint(0, 256, (H, W)).astype(np.int32)
    src = np.clip(np.roll(ref, (2, -5), (0, 1))
                  + rng.randint(-2, 2, (H, W)), 0, 255).astype(np.int32)
    pipe = MdInterPipeline(H, W, 27, n_refs=1, deblock=False, sao="",
                           rdoq=False, sign_hiding=False)
    rows, cols = H // n, W // n
    L = rows * cols
    cands = np.zeros((L, 2, 2), np.int32)
    cands[:, 0] = rng.randint(-10, 10, (L, 2))
    mv_q, satd, pred = jax.jit(pipe._with_consts(
        lambda s, r, c, nn=n: pipe._me_xla_one(
            s, r, c, nn, jnp.int32(0))))(
        pipe.consts, jnp.asarray(src), jnp.asarray(ref),
        jnp.asarray(cands))
    mv_q, satd, pred = (np.asarray(mv_q), np.asarray(satd),
                        np.asarray(pred))

    blocks = np.moveaxis(src.reshape(rows, n, cols, n), 1, 2) \
        .reshape(L, n, n)
    for b in range(L):
        y0, x0 = (b // cols) * n, (b % cols) * n
        best = (1 << 30, None)
        for c in range(2):
            cx, cy = cands[b, c]
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    win = np_interp(ref, y0, x0,
                                    ((cx + dx) * 4, (cy + dy) * 4), n)
                    sad = np.abs(win.astype(np.int64)
                                 - blocks[b]).sum()
                    if sad < best[0]:
                        best = (sad, (cx + dx, cy + dy))
        bi = best[1]
        bs = (1 << 30, None, None)
        for qy in range(-3, 4):
            for qx in range(-3, 4):
                mv = (bi[0] * 4 + qx, bi[1] * 4 + qy)
                p = np_interp(ref, y0, x0, mv, n)
                s = np_satd(blocks[b] - p)
                if s < bs[0]:
                    bs = (s, mv, p)
        assert tuple(mv_q[b]) == bs[1], (b, tuple(mv_q[b]), bs[1])
        assert satd[b] == bs[0]
        assert np.array_equal(pred[b], bs[2])
