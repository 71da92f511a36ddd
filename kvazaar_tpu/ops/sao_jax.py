"""SAO search + application on device (JAX), whole frame batched.

Search (non-normative): per-CTB statistics for all 4 edge-offset classes
(category counts / diff sums) and the 32-band histogram are computed with
block reductions over the full frame in one trace; offsets are the
distortion-optimal rounded estimates, rate-adjusted with a lambda in
CABAC-bin units. The type decision (off / band / edge class) is a per-CTB
argmax, luma independent, chroma joint over (Cb, Cr) because the syntax
shares sao_type_idx_chroma / sao_eo_class_chroma between them.

Application is the normative spec 8.7.3 mapping, bit-exact vs the NumPy
oracle ops/sao.py::apply_sao_plane (neighbours read the pre-SAO deblocked
picture; picture-border samples with outside neighbours are skipped).

Reference parity: kvazaar src/sao.c (kvz_sao_search_lcu :671 — the same
count/sum offset estimation; merge evaluation happens at write time here)
and src/strategies/generic/sao-generic.c (reconstruction).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2

# eo class -> (neighbour a dy,dx ; neighbour b dy,dx), matching ops/sao.py
_EO_DIRS = (((0, -1), (0, 1)),
            ((-1, 0), (1, 0)),
            ((-1, -1), (1, 1)),
            ((1, -1), (-1, 1)))
# categories in offset order: cat -2 -> offsets[0] (>=0), -1 -> [1] (>=0),
# 1 -> [2] (<=0), 2 -> [3] (<=0)
_CAT_VALS = (-2, -1, 1, 2)


def _eo_cat_maps(rec):
    """rec [H, W] int32 -> (cats [4, H, W] in -2..2, valid [4, H, W])."""
    h, w = rec.shape
    pad = jnp.pad(rec, 1, mode="edge")

    def sh(dy, dx):
        return pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    cats, valids = [], []
    for (ady, adx), (bdy, bdx) in _EO_DIRS:
        na, nb = sh(ady, adx), sh(bdy, bdx)
        cats.append(jnp.sign(rec - na) + jnp.sign(rec - nb))
        va = ((yy + ady >= 0) & (yy + ady < h)
              & (xx + adx >= 0) & (xx + adx < w))
        vb = ((yy + bdy >= 0) & (yy + bdy < h)
              & (xx + bdx >= 0) & (xx + bdx < w))
        valids.append(va & vb)
    return jnp.stack(cats), jnp.stack(valids)


def _breduce(x, n):
    """Block-reduce trailing [H, W] -> [H/n, W/n]."""
    *lead, h, w = x.shape
    return x.reshape(*lead, h // n, n, w // n, n).sum(axis=(-3, -1))


def _round_div(s, c):
    """Nearest-integer s/c (c >= 0), 0 where c == 0."""
    cs = jnp.maximum(c, 1)
    q = jnp.where(s >= 0, (2 * s + cs) // (2 * cs),
                  -((-2 * s + cs) // (2 * cs)))
    return jnp.where(c > 0, q, 0)


def _plane_option_stats(src, rec, n, lam, cats, valid, bit_depth=8):
    cmax = (1 << (min(bit_depth, 10) - 5)) - 1
    """Per-CTB rate-adjusted gains for every SAO option of one plane.

    Returns dict with: eo_net [4cls, R, C] (offset-rate-adjusted distortion
    gain), eo_offs [4cls, 4cat, R, C]; band_net [R, C], band_pos [R, C],
    band_offs [4, R, C]. Gains exclude the shared type/class/position bits
    (added by the caller's decision)."""
    diff = src - rec
    # --- edge offsets ---
    eo_cnt, eo_sum = [], []
    for cv in _CAT_VALS:
        m = (cats == cv) & valid                       # [4, H, W]
        eo_cnt.append(_breduce(m.astype(jnp.int32), n))
        eo_sum.append(_breduce(jnp.where(m, diff, 0), n))
    eo_cnt = jnp.stack(eo_cnt, axis=1)                 # [4cls, 4cat, R, C]
    eo_sum = jnp.stack(eo_sum, axis=1)
    est = _round_div(eo_sum, eo_cnt)
    lo = jnp.asarray([0, 0, -cmax, -cmax], jnp.int32)[None, :, None, None]
    hi = jnp.asarray([cmax, cmax, 0, 0], jnp.int32)[None, :, None, None]
    offs = jnp.clip(est, lo, hi)
    gain = 2 * offs * eo_sum - offs * offs * eo_cnt
    # drop an offset to 0 when its gain doesn't pay its extra TU bins
    keep = gain.astype(jnp.float32) >= lam * jnp.abs(offs)
    offs = jnp.where(keep, offs, 0)
    gain = jnp.where(keep, gain, 0)
    rate = jnp.abs(offs).sum(axis=1) + 4               # TU bins, 4 offsets
    eo_net = gain.sum(axis=1).astype(jnp.float32) - lam * rate
    # --- band offsets ---
    band = rec >> (bit_depth - 5)
    b_cnt, b_sum = [], []
    for b in range(32):
        m = band == b
        b_cnt.append(_breduce(m.astype(jnp.int32), n))
        b_sum.append(_breduce(jnp.where(m, diff, 0), n))
    b_cnt = jnp.stack(b_cnt)                           # [32, R, C]
    b_sum = jnp.stack(b_sum)
    boff = jnp.clip(_round_div(b_sum, b_cnt), -cmax, cmax)
    bgain = 2 * boff * b_sum - boff * boff * b_cnt
    bkeep = bgain.astype(jnp.float32) >= lam * (jnp.abs(boff) + 1)
    boff = jnp.where(bkeep, boff, 0)
    bnet = (jnp.where(bkeep, bgain, 0).astype(jnp.float32)
            - lam * (jnp.abs(boff) + 1 + (boff != 0)))
    win = jnp.stack([bnet[p:p + 4].sum(axis=0) for p in range(29)])
    band_pos = jnp.argmax(win, axis=0).astype(jnp.int32)   # [R, C]
    band_net = jnp.take_along_axis(win, band_pos[None], axis=0)[0]
    band_offs = jnp.stack([jnp.take_along_axis(boff, (band_pos + i)[None],
                                               axis=0)[0]
                           for i in range(4)])         # [4, R, C]
    return {"eo_net": eo_net, "eo_offs": offs,
            "band_net": band_net, "band_pos": band_pos,
            "band_offs": band_offs}


def _select(st, typ, cls):
    """Pick per-CTB offset/pos tensors for a (typ, cls) decision."""
    eo_offs = jnp.take_along_axis(
        st["eo_offs"], cls[None, None], axis=0)[0]     # [4cat, R, C]
    offs = jnp.where(typ[None] == SAO_EDGE, eo_offs,
                     jnp.where(typ[None] == SAO_BAND, st["band_offs"], 0))
    pos = jnp.where(typ == SAO_BAND, st["band_pos"], 0)
    return offs.astype(jnp.int32), pos


def _expand(m, n):
    return jnp.repeat(jnp.repeat(m, n, axis=0), n, axis=1)


def _apply(rec, cats, valid, typ, cls, offs, pos, n, max_val=255,
           bit_depth=8):
    """Apply per-CTB SAO params to one plane. offs [4, R, C], rest [R, C]."""
    typ_p = _expand(typ, n)
    cls_p = _expand(cls, n)[None]
    cat_sel = jnp.take_along_axis(cats, cls_p, axis=0)[0]
    val_sel = jnp.take_along_axis(valid, cls_p, axis=0)[0]
    off_eo = jnp.zeros_like(rec)
    for i, cv in enumerate(_CAT_VALS):
        off_eo = off_eo + _expand(offs[i], n) * (cat_sel == cv)
    band = rec >> (bit_depth - 5)
    pos_p = _expand(pos, n)
    off_band = jnp.zeros_like(rec)
    for i in range(4):
        off_band = off_band + _expand(offs[i], n) * \
            (band == ((pos_p + i) & 31))
    out = rec + jnp.where((typ_p == SAO_EDGE) & val_sel, off_eo, 0) \
        + jnp.where(typ_p == SAO_BAND, off_band, 0)
    return jnp.clip(out, 0, max_val)


def _type_bits(allow_band, allow_edge):
    big = jnp.float32(1e18)
    return (jnp.float32(0.0) if allow_band else big,
            jnp.float32(0.0) if allow_edge else big)


def sao_luma(src, rec, n, lam, allow_band=True, allow_edge=True,
             bit_depth=8):
    """Search + apply SAO for the luma plane. Returns (filtered, params)
    with params: typ/cls/pos [R, C] int32, offs [4, R, C] int32."""
    cats, valid = _eo_cat_maps(rec)
    st = _plane_option_stats(src, rec, n, lam, cats, valid, bit_depth)
    pen_band, pen_edge = _type_bits(allow_band, allow_edge)
    g_off = -lam * 1.0
    g_band = st["band_net"] - lam * (2 + 5) - pen_band
    cls = jnp.argmax(st["eo_net"], axis=0).astype(jnp.int32)
    g_edge = jnp.take_along_axis(st["eo_net"], cls[None], axis=0)[0] \
        - lam * (2 + 2) - pen_edge
    typ = jnp.where((g_band > g_off) & (g_band >= g_edge), SAO_BAND,
                    jnp.where(g_edge > g_off, SAO_EDGE, SAO_OFF)) \
        .astype(jnp.int32)
    offs, pos = _select(st, typ, cls)
    out = _apply(rec, cats, valid, typ, cls, offs, pos, n,
                 max_val=(1 << bit_depth) - 1, bit_depth=bit_depth)
    return out, {"typ": typ, "cls": cls, "offs": offs, "pos": pos}


def sao_chroma(src_cb, src_cr, rec_cb, rec_cr, n, lam,
               allow_band=True, allow_edge=True, bit_depth=8):
    """Joint Cb/Cr SAO (shared type + EO class). Returns
    (filtered_cb, filtered_cr, params) with offs/pos per component."""
    cats_b, valid_b = _eo_cat_maps(rec_cb)
    cats_r, valid_r = _eo_cat_maps(rec_cr)
    st_b = _plane_option_stats(src_cb, rec_cb, n, lam, cats_b, valid_b,
                               bit_depth)
    st_r = _plane_option_stats(src_cr, rec_cr, n, lam, cats_r, valid_r,
                               bit_depth)
    pen_band, pen_edge = _type_bits(allow_band, allow_edge)
    g_off = -lam * 1.0
    g_band = st_b["band_net"] + st_r["band_net"] - lam * (2 + 5 + 5) \
        - pen_band
    eo_net = st_b["eo_net"] + st_r["eo_net"]
    cls = jnp.argmax(eo_net, axis=0).astype(jnp.int32)
    g_edge = jnp.take_along_axis(eo_net, cls[None], axis=0)[0] \
        - lam * (2 + 2) - pen_edge
    typ = jnp.where((g_band > g_off) & (g_band >= g_edge), SAO_BAND,
                    jnp.where(g_edge > g_off, SAO_EDGE, SAO_OFF)) \
        .astype(jnp.int32)
    offs_b, pos_b = _select(st_b, typ, cls)
    offs_r, pos_r = _select(st_r, typ, cls)
    mv = (1 << bit_depth) - 1
    out_b = _apply(rec_cb, cats_b, valid_b, typ, cls, offs_b, pos_b, n,
                   max_val=mv, bit_depth=bit_depth)
    out_r = _apply(rec_cr, cats_r, valid_r, typ, cls, offs_r, pos_r, n,
                   max_val=mv, bit_depth=bit_depth)
    return out_b, out_r, {"typ": typ, "cls": cls, "offs_cb": offs_b,
                          "pos_cb": pos_b, "offs_cr": offs_r,
                          "pos_cr": pos_r}
