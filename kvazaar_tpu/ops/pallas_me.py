"""Pallas TPU kernels for motion-estimation refinement.

The XLA formulation of the ME refine (per-block window *gathers* +
per-candidate MC) runs at ~100M gathered elements/s on TPU and
dominated the whole inter search (~3.8 s/frame at 1080p, measured).
This kernel replaces it with the TPU-native shape: one aligned DMA per
(block, candidate) from the padded reference plane in HBM into VMEM,
row alignment via an 8-way static switch (Mosaic requires 8-row-aligned
HBM slices; dynamic sublane rolls miscompile), column alignment via a
dynamic lane roll, then fully static-sliced evaluation:

  - integer refine: 49 SADs (+-3 around each candidate MV, SAD
    tie-break in (candidate, dy, dx) scan order like the XLA
    _refine_int it replaces)
  - subpel refine: SATD at ALL 49 quarter-pel deltas in [-3,3]^2
    around the best integer MV (a superset of the reference's
    half-then-quarter two-step walk, ref src/search_inter.c:974),
    with the exact HEVC 8-tap interpolation arithmetic of
    models/inter_md.py _mc_luma
  - the winning prediction block is produced as an output, so the
    later leaf RD needs no separate MC gather

The n=16 kernel also refines the four 8x8 children of each 16-block
from the same DMA window (their candidate field is the 16-field,
models/inter_md.py _field_for), halving DMA traffic for the two
smallest sizes.

Numerics are integer-exact and backend-independent: the CPU test suite
runs the same kernels under pallas interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc import LUMA_FILTERS

# padded-plane geometry: PAD_Y rows of edge padding above/below; width
# is padded left by PAD_X and rounded up so every 256-lane DMA stays in
# bounds after clamping. Sized for the +-96 full-pel search range plus
# refine/subpel/filter reach (per-size worst case PAD >= 89-n+R8 = 113).
PAD_Y = 120
PAD_X = 128

# blocks per pallas_call: the candidate table rides SMEM via scalar
# prefetch and each scalar costs 128 B there — chunk the grid.
CHUNK = 1024

# MV-cost prior (the kvz_calc_mvd_cost_cabac analog applied DURING the
# refine, ref src/search_inter.c:1237): without it the SAD/SATD
# argmin scatters MVs on flat-cost content (gradients, repeating
# texture) and the motion field loses the coherence every later stage
# (merge/skip, AMVP prediction) depends on. Deliberately TIE-BREAKER
# scale (a few SAD units): the refine's job is to fix the coarse
# field's error, and a full bit-cost prior freezes it onto the coarse
# candidate (measured: +20% BD on real-motion clips). Applied as
# penalty = (lam64 * P) >> 8.
PRIOR_INT = (0, 2, 3, 3)        # full-pel |delta| 0..3
PRIOR_QPEL = (0, 1, 2, 2)       # quarter-pel |delta| 0..3


def prior_int_table():
    return [PRIOR_INT[abs(dy - 3)] + PRIOR_INT[abs(dx - 3)]
            for dy in range(7) for dx in range(7)]


def prior_qpel_table():
    return [PRIOR_QPEL[abs(qy)] + PRIOR_QPEL[abs(qx)]
            for qy in range(-3, 4) for qx in range(-3, 4)]


def plane_dims(h: int, w: int) -> tuple[int, int]:
    hp = h + 2 * PAD_Y
    wp = w + PAD_X + 128
    wp += (-wp) % 128
    return hp, wp


def pad_plane(plane: jax.Array) -> jax.Array:
    """Edge-pad a [H, W] int plane to kernel geometry (int32)."""
    h, w = plane.shape
    hp, wp = plane_dims(h, w)
    return jnp.pad(plane.astype(jnp.int32),
                   ((PAD_Y, hp - h - PAD_Y), (PAD_X, wp - w - PAD_X)),
                   mode="edge")


def _butterfly(t, axis):
    """In-place 8-point Hadamard butterflies along `axis` for every
    aligned 8-group (exact int32; the MXU's one-pass bf16 f32 matmul
    truncates 10-bit pixels, so SATD avoids matmuls entirely).
    partner(i) = t[i ^ k] via two static circular rolls + a bit mask —
    i ^ k == i + k when bit k of i is clear, i - k when set, and never
    crosses an 8-group boundary."""
    bn = t.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    size = t.shape[axis]
    for k in (1, 2, 4):
        up = pltpu.roll(t, size - k, axis)
        dn = pltpu.roll(t, k, axis)
        clear = (idx & k) == 0
        partner = jnp.where(clear, up, dn)
        t = jnp.where(clear, t + partner, partner - t)
    return t


def _group_sum8(t, axis):
    """Sum within every aligned 8-group along `axis`, replicated to
    all 8 positions (exact int32, roll-add tree)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    size = t.shape[axis]
    for k in (1, 2, 4):
        up = pltpu.roll(t, size - k, axis)
        dn = pltpu.roll(t, k, axis)
        t = t + jnp.where((idx & k) == 0, up, dn)
    return t


def _satd8(diff):
    """SATD via 8x8 Hadamard tiles — same arithmetic as
    models/intra_md.py _satd_tiles, exact in int32."""
    t = _butterfly(_butterfly(diff, 0), 1)
    s = _group_sum8(_group_sum8(jnp.abs(t), 0), 1)
    # each 8x8 tile now holds its abs-sum in all 64 positions
    r = (s + 2) >> 2
    return (r.sum() // 64).astype(jnp.int32)


def _interp(ws, oy, ox, py, px, n, maxv, hi=False):
    """Exact 8-tap luma interpolation of an [n, n] block from the
    aligned subpel window ws (col/row 0 = subpel base = block start
    minus 4 integer pels). oy/ox in {-1, 0}, py/px phase 0..3; all
    static. Mirrors models/inter_md.py _mc_luma arithmetic; hi=True
    returns the 14-bit intermediate for exact bi-prediction."""
    f = LUMA_FILTERS
    r0 = 1 + oy
    c0 = 1 + ox
    if px == 0:
        h14 = ws[r0:r0 + n + 7, c0 + 3:c0 + 3 + n] * 64
    else:
        cf = f[px]
        h14 = sum(int(cf[k]) * ws[r0:r0 + n + 7, c0 + k:c0 + k + n]
                  for k in range(8) if cf[k] != 0)
    if py == 0:
        v = (h14[3:3 + n, :] * 64) >> 6
    else:
        cf = f[py]
        v = sum(int(cf[k]) * h14[k:k + n, :]
                for k in range(8) if cf[k] != 0) >> 6
    if hi:
        return v
    return jnp.clip((v + 32) >> 6, 0, maxv)


def _row8(vals, ncols=8):
    """[len(vals)]-scalar list -> [1, ncols] int32 vector (masked
    build; 1-D iota is not supported by Mosaic)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, ncols), 1)
    out = jnp.zeros((1, ncols), jnp.int32)
    for k, v in enumerate(vals):
        out = jnp.where(ii == k, v, out)
    return out


def make_refine_kernel(n: int, n_cand: int, wp: int, maxv: int,
                       children: bool, cols: int, base: int):
    WIN = n + 14
    R8 = ((WIN + 7) // 8) * 8 + 8

    pi_tab = prior_int_table()
    pq_tab = prior_qpel_table()

    def kernel(lam_ref, info_ref, plane_ref, src_ref, par_ref,
               pred_ref, *rest):
        if children:
            ch_ref, chpred_ref, scr, align, sem = rest
        else:
            scr, align, sem = rest
        i = pl.program_id(0)
        lam64 = lam_ref[0]
        src = src_ref[0]
        gid = i + base
        y0 = (gid // cols) * n
        x0 = (gid % cols) * n

        for c in range(n_cand):
            packed = info_ref[i, c]
            ys = packed >> 12
            xs = packed & 4095
            ya = pl.multiple_of((ys // 8) * 8, 8)
            xa = jnp.minimum((xs // 128) * 128, wp - 256)
            xa = pl.multiple_of(xa, 128)
            dma = pltpu.make_async_copy(
                plane_ref.at[pl.ds(ya, R8), pl.ds(xa, 256)], scr, sem)
            dma.start()
            dma.wait()
            ry = ys - ya
            rx = xs - xa
            w = jax.lax.switch(
                ry, [(lambda kk=kk: scr[kk:kk + WIN, :])
                     for kk in range(8)])
            align[c] = pltpu.roll(w, 256 - rx, 1)

        def int_refine(by0, bx0, blk):
            """SAD refine over all candidates for the [bn, bn] source
            block at (by0, bx0) inside the n-window. Returns
            (sad, code), code = c*64 + dy*8 + dx (dy/dx = delta+3)."""
            bn = blk.shape[0]
            best_s = jnp.int32(1 << 30)
            best_c = jnp.int32(0)
            for c in range(n_cand):
                w = align[c]
                for dy in range(7):
                    for dx in range(7):
                        sl = w[by0 + 4 + dy:by0 + 4 + dy + bn,
                               bx0 + 4 + dx:bx0 + 4 + dx + bn]
                        sad = jnp.abs(sl - blk).sum().astype(jnp.int32)
                        sad = sad + ((lam64 * pi_tab[dy * 7 + dx])
                                     >> 8)
                        code = jnp.int32(c * 64 + dy * 8 + dx)
                        take = sad < best_s
                        best_s = jnp.where(take, sad, best_s)
                        best_c = jnp.where(take, code, best_c)
            return best_s, best_c

        def subpel(code, by0, bx0, blk):
            """All-qpel SATD sweep around the refined integer MV."""
            bn = blk.shape[0]
            c = code // 64
            dy = (code % 64) // 8
            dx = code % 8
            w = align[c]                      # dynamic leading index
            ws = jax.lax.switch(
                dy, [(lambda kk=kk: w[by0 + kk:by0 + kk + bn + 8, :])
                     for kk in range(7)])
            ws = pltpu.roll(ws, 256 - (bx0 + dx), 1)
            best_s = jnp.int32(1 << 30)
            best_raw = jnp.int32(0)
            best_d = jnp.int32(0)
            pred = jnp.zeros((bn, bn), jnp.int32)
            for qy in range(-3, 4):
                for qx in range(-3, 4):
                    p = _interp(ws, qy >> 2, qx >> 2, qy & 3, qx & 3,
                                bn, maxv)
                    raw = _satd8(blk - p)
                    s = raw + ((lam64 * pq_tab[(qy + 3) * 7 + qx + 3])
                               >> 8)
                    take = s < best_s
                    best_s = jnp.where(take, s, best_s)
                    best_raw = jnp.where(take, raw, best_raw)
                    best_d = jnp.where(
                        take, jnp.int32((qy + 3) * 8 + qx + 3), best_d)
                    pred = jnp.where(take, p, pred)
            return c, dy, dx, best_d, best_raw, pred

        def mv_of(c, dy, dx, dcode):
            # candidate MV back out of the packed window start
            p = info_ref[i, 0]
            for cc in range(1, n_cand):
                p = jnp.where(c == cc, info_ref[i, cc], p)
            cy = (p >> 12) + 7 - PAD_Y - y0
            cx = (p & 4095) + 7 - PAD_X - x0
            qy = (cy + dy - 3) * 4 + dcode // 8 - 3
            qx = (cx + dx - 3) * 4 + dcode % 8 - 3
            return qx, qy

        _, code = int_refine(0, 0, src)
        c, dy, dx, dcode, satd, pred = subpel(code, 0, 0, src)
        qx, qy = mv_of(c, dy, dx, dcode)
        par_ref[0, 0, :] = _row8([qx, qy, satd])[0]
        pred_ref[0, :, :] = pred

        if children:
            hn = n // 2
            mosaic = jnp.zeros((n, n), jnp.int32)
            rows = []
            for (cy0, cx0) in ((0, 0), (0, hn), (hn, 0), (hn, hn)):
                blk = src[cy0:cy0 + hn, cx0:cx0 + hn]
                _, code_k = int_refine(cy0, cx0, blk)
                ck, dyk, dxk, dck, satdk, pk = subpel(code_k, cy0, cx0,
                                                      blk)
                qxk, qyk = mv_of(ck, dyk, dxk, dck)
                rows.append(_row8([qxk, qyk, satdk]))
                # place the child block via matmul embedding (Mosaic
                # has neither dynamic_update_slice nor pad/concat with
                # offsets; pixel values stay exact in f32)
                ri = jax.lax.broadcasted_iota(jnp.int32, (n, hn), 0)
                rk = jax.lax.broadcasted_iota(jnp.int32, (n, hn), 1)
                rmat = (ri == rk + cy0).astype(jnp.float32)
                ci = jax.lax.broadcasted_iota(jnp.int32, (hn, n), 1)
                ck = jax.lax.broadcasted_iota(jnp.int32, (hn, n), 0)
                cmat = (ci == ck + cx0).astype(jnp.float32)
                # nibble-split keeps the matmul exact under the MXU's
                # one-pass bf16 f32 (values <= 255 are bf16-exact)
                def place(v):
                    return jnp.dot(
                        jnp.dot(rmat, v.astype(jnp.float32),
                                preferred_element_type=jnp.float32),
                        cmat, preferred_element_type=jnp.float32)
                placed = (4.0 * place(pk >> 2) + place(pk & 3))
                mosaic = mosaic + placed.astype(jnp.int32)
            ch_ref[0, :, :] = jnp.concatenate(rows, axis=0)
            chpred_ref[0, :, :] = mosaic

    return kernel


def _me_refine_chunk(plane, src_blocks, info, lam64, n, children,
                     maxv, interpret, cols, base):
    L = src_blocks.shape[0]
    n_cand = info.shape[1]
    wp = plane.shape[1]
    WIN = n + 14
    R8 = ((WIN + 7) // 8) * 8 + 8
    kern = make_refine_kernel(n, n_cand, wp, maxv, children, cols,
                              base)
    out_shapes = [jax.ShapeDtypeStruct((L, 1, 8), jnp.int32),
                  jax.ShapeDtypeStruct((L, n, n), jnp.int32)]
    out_specs = [pl.BlockSpec((1, 1, 8),
                              lambda i, lam_ref, info_ref: (i, 0, 0)),
                 pl.BlockSpec((1, n, n),
                              lambda i, lam_ref, info_ref: (i, 0, 0))]
    if children:
        out_shapes += [jax.ShapeDtypeStruct((L, 4, 8), jnp.int32),
                       jax.ShapeDtypeStruct((L, n, n), jnp.int32)]
        out_specs += [pl.BlockSpec(
            (1, 4, 8), lambda i, lam_ref, info_ref: (i, 0, 0)),
            pl.BlockSpec((1, n, n),
                         lambda i, lam_ref, info_ref: (i, 0, 0))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, n, n),
                               lambda i, lam_ref, info_ref: (i, 0, 0))],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((R8, 256), jnp.int32),
                        pltpu.VMEM((n_cand, WIN, 256), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    outs = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
    )(lam64, info, plane, src_blocks)
    return [outs[0].reshape(L, 8)] + list(outs[1:])


def pack_info(y0, x0, cand_y, cand_x):
    """Window starts packed for the SMEM table: (ys << 12) | xs with
    ys/xs = PAD + block origin + candidate - 7. y0/x0/cand_*: [L] or
    [L, n_cand] int arrays (broadcast)."""
    ys = PAD_Y + y0 + cand_y - 7
    xs = PAD_X + x0 + cand_x - 7
    return (ys.astype(jnp.int32) << 12) | xs.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("n", "children", "maxv", "cols",
                              "interpret"))
def me_refine(plane, src_blocks, info, lam64, *, n, cols, children,
              maxv, interpret=False):
    """Refine candidate integer MVs to quarter-pel for every block.

    plane: [Hp, Wp] int32 padded reference (pad_plane).
    src_blocks: [L, n, n] int32 source blocks (raster block order,
      cols blocks per row).
    info: [L, n_cand] int32 packed window starts (pack_info).
    Returns [par [L, 8] = (mvqx, mvqy, satd, 0...), pred [L, n, n]];
    with children also ch [L, 4, 8] (child order: TL, TR, BL, BR) and
    chpred [L, n, n] (child predictions as a mosaic)."""
    L = src_blocks.shape[0]
    outs = []
    for s in range(0, L, CHUNK):
        e = min(L, s + CHUNK)
        outs.append(_me_refine_chunk(plane, src_blocks[s:e], info[s:e],
                                     lam64, n, children, maxv,
                                     interpret, cols, s))
    if len(outs) == 1:
        return list(outs[0])
    return [jnp.concatenate([o[k] for o in outs], axis=0)
            for k in range(len(outs[0]))]


# ---------------------------------------------------------------------
# exact-MV candidate evaluation (merge-aware search support)
# ---------------------------------------------------------------------

def make_eval_kernel(n: int, n_cand: int, wp: int, maxv: int,
                     want_pred: bool, hi: bool):
    """SATD (+ optionally the prediction of candidate 0) at K exact
    qpel MVs per block. info packs, per candidate:
    (ys << 16) | (xs << 4) | (py << 2) | px with ys/xs = window start
    (PAD + y0/x0 + (mv >> 2) - 4) and py/px the qpel phases."""
    RE8 = ((n + 8 + 7) // 8) * 8 + 8

    def kernel(info_ref, plane_ref, src_ref, satd_ref, *rest):
        if want_pred:
            pred_ref, scr, sem = rest
        else:
            scr, sem = rest
        i = pl.program_id(0)
        src = src_ref[0]
        satds = []
        for c in range(n_cand):
            packed = info_ref[i, c]
            ys = packed >> 16
            xs = (packed >> 4) & 4095
            py = (packed >> 2) & 3
            px = packed & 3
            ya = pl.multiple_of((ys // 8) * 8, 8)
            xa = jnp.minimum((xs // 128) * 128, wp - 256)
            xa = pl.multiple_of(xa, 128)
            dma = pltpu.make_async_copy(
                plane_ref.at[pl.ds(ya, RE8), pl.ds(xa, 256)], scr, sem)
            dma.start()
            dma.wait()
            w = jax.lax.switch(
                ys - ya, [(lambda kk=kk: scr[kk:kk + n + 8, :])
                          for kk in range(8)])
            ws = pltpu.roll(w, 256 - (xs - xa), 1)
            # dynamic phases: 4-way switches with static coefficients
            p = jax.lax.switch(py, [
                (lambda pyk=pyk: jax.lax.switch(px, [
                    (lambda pxk=pxk, pyk=pyk: _interp(
                        ws, 0, 0, pyk, pxk, n, maxv, hi=hi))
                    for pxk in range(4)]))
                for pyk in range(4)])
            pr = jnp.clip((p + 32) >> 6, 0, maxv) if hi else p
            satds.append(_satd8(src - pr))
            if want_pred and c == 0:
                pred_ref[0, :, :] = p
        satd_ref[0, 0, :] = _row8(satds)[0]

    return kernel


def _me_eval_chunk(plane, src_blocks, info, n, maxv, want_pred,
                   hi, interpret):
    L = src_blocks.shape[0]
    n_cand = info.shape[1]
    wp = plane.shape[1]
    RE8 = ((n + 8 + 7) // 8) * 8 + 8
    kern = make_eval_kernel(n, n_cand, wp, maxv, want_pred, hi)
    out_shapes = [jax.ShapeDtypeStruct((L, 1, 8), jnp.int32)]
    out_specs = [pl.BlockSpec((1, 1, 8), lambda i, info_ref: (i, 0, 0))]
    if want_pred:
        out_shapes.append(jax.ShapeDtypeStruct((L, n, n), jnp.int32))
        out_specs.append(pl.BlockSpec((1, n, n),
                                      lambda i, info_ref: (i, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((1, n, n),
                               lambda i, info_ref: (i, 0, 0))],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((RE8, 256), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    outs = pl.pallas_call(
        kern, out_shape=out_shapes, grid_spec=grid_spec,
        interpret=interpret)(info, plane, src_blocks)
    res = [outs[0].reshape(L, 8)[:, :n_cand]]
    if want_pred:
        res.append(outs[1])
    return res


def pack_eval_info(y0, x0, mv_qx, mv_qy):
    """Pack exact qpel MVs for me_eval ([L] or [L, K] broadcastable)."""
    ys = PAD_Y + y0 + (mv_qy >> 2) - 4
    xs = PAD_X + x0 + (mv_qx >> 2) - 4
    return ((ys.astype(jnp.int32) << 16)
            | (xs.astype(jnp.int32) << 4)
            | ((mv_qy & 3).astype(jnp.int32) << 2)
            | (mv_qx & 3).astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("n", "maxv", "want_pred", "hi",
                              "interpret"))
def me_eval(plane, src_blocks, info, *, n, maxv, want_pred=False,
            hi=False, interpret=False):
    """SATD of K exact-MV candidates per block (pack_eval_info);
    optionally also candidate 0's prediction (14-bit intermediate when
    hi=True, for exact bi-prediction). Returns
    [satd [L, K]] (+ [pred [L, n, n]])."""
    L = src_blocks.shape[0]
    outs = []
    for s in range(0, L, CHUNK):
        e = min(L, s + CHUNK)
        outs.append(_me_eval_chunk(plane, src_blocks[s:e], info[s:e],
                                   n, maxv, want_pred, hi, interpret))
    if len(outs) == 1:
        return list(outs[0])
    return [jnp.concatenate([o[k] for o in outs], axis=0)
            for k in range(len(outs[0]))]
