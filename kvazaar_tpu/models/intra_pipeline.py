"""TPU-native all-intra frame pipeline (JAX).

Two jitted stages over a fixed 16x16 CTU grid (frame dims multiples of 16;
the API pads with a conformance window):

1. `search_modes`: evaluates all 35 intra modes for every block of the
   frame in one batch — predictions via a single constant-matrix matmul
   (ops/intra_matrices.py), costs via Hadamard-SATD matmuls on the MXU,
   argmin per block. Uses clamped source-pixel references (search is
   non-normative).

2. `encode_waves`: exact reconstruction in WPP-style anti-diagonal waves
   (d = 2r + c): all blocks of a wave predict from previously reconstructed
   neighbours (normative reference substitution), transform/quantize/
   dequantize/inverse-transform in exact int32, and scatter recon + levels.
   Output levels stream to the host CABAC writer.

This replaces kvazaar's per-CTU threadqueue jobs (src/encoderstate.c:832)
and SIMD kernels (src/strategies/avx2/): the wavefront lives inside one
jitted program; XLA pipelines the waves asynchronously.

Reference parity: decisions are framework-specific (search is free), but
reconstruction/levels must decode hash-exactly — guaranteed by integer
parity with ops/reference.py and validated end-to-end by the decoder.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.intra_matrices import (build_filter_matrix, build_pred_matrices,
                                  ref_vec_len)
from ..tables import DCT_MATRICES, INV_QUANT_SCALES, QUANT_SCALES

LUMA_N = 16
CHROMA_N = 8


def _sparse_unpack(mask_u8: np.ndarray, vals: np.ndarray,
                   shape: tuple) -> np.ndarray:
    """Rebuild a level plane from the device's sparse pack (bitmask +
    compacted int16 values, see _sparse_pack). Uses the native C++
    unpacker when available (int32 output, which is also what the
    native slice writer consumes); numpy otherwise."""
    from .. import native
    if native.available():
        return native.sparse_unpack(mask_u8, vals, shape)
    bits = np.unpackbits(mask_u8)
    flat = np.zeros(bits.shape[0], np.int16)
    nnz = int(bits.sum())
    flat[bits.astype(bool)] = vals[:nnz]
    return flat.reshape(shape)


def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def _wave_structure(rows: int, cols: int) -> tuple[np.ndarray, np.ndarray,
                                                   int]:
    """Anti-diagonal (d = 2r + c) wave schedule over the block grid.
    Returns (wave_blocks [n_waves, wlen] flat block ids, wave_mask, wlen)."""
    n_waves = 2 * (rows - 1) + cols
    waves = [[] for _ in range(n_waves)]
    for r in range(rows):
        for c in range(cols):
            waves[2 * r + c].append(r * cols + c)
    wlen = max(len(w) for w in waves)
    blocks = np.zeros((n_waves, wlen), dtype=np.int32)
    mask = np.zeros((n_waves, wlen), dtype=bool)
    for i, w in enumerate(waves):
        blocks[i, :len(w)] = w
        mask[i, :len(w)] = True
    return blocks, mask, wlen


class IntraPipeline:
    """Jit-compiled all-intra encoder compute path for one frame size."""

    # rate model underestimates real CABAC bin costs; 1.5 won the BD-rate
    # sweep (intra -0.9%, GOP8 -22% vs deadzone quant on synthetic video)
    RDOQ_LAMBDA_SCALE = 1.5

    def __init__(self, height: int, width: int, qp: int,
                 deblock: bool = False, deblock_beta: int = 0,
                 deblock_tc: int = 0, sao: str = "off",
                 sign_hiding: bool = False, rdoq: bool = False) -> None:
        assert height % LUMA_N == 0 and width % LUMA_N == 0
        self.sign_hiding = sign_hiding
        self.rdoq = rdoq
        self.h, self.w, self.qp = height, width, qp
        self.deblock = deblock
        self.deblock_beta = deblock_beta
        self.deblock_tc = deblock_tc
        self.sao = sao if sao != "off" else None
        self.rows, self.cols = height // LUMA_N, width // LUMA_N
        self.n_blocks = self.rows * self.cols

        # constant matrices
        self.g16 = jnp.asarray(build_pred_matrices(LUMA_N))
        self.f16 = jnp.asarray(build_filter_matrix(LUMA_N))
        self.g8c = jnp.asarray(build_pred_matrices(CHROMA_N, chroma=True))
        self.t16 = jnp.asarray(DCT_MATRICES[16])
        self.t8 = jnp.asarray(DCT_MATRICES[8])
        self.h8 = jnp.asarray(_hadamard(8))

        blocks, mask, wlen = _wave_structure(self.rows, self.cols)
        self.wave_blocks = jnp.asarray(blocks)
        self.wave_mask = jnp.asarray(mask)
        self.n_waves = blocks.shape[0]
        self.wlen = wlen

        # per-block geometry
        bid = np.arange(self.n_blocks)
        self.b_r = jnp.asarray(bid // self.cols)
        self.b_c = jnp.asarray(bid % self.cols)

        # decoded-picture-hash xor masks (spec D.3.20), device-resident
        def _mask(hh, ww):
            yy, xx = np.mgrid[0:hh, 0:ww]
            return jnp.asarray(((xx & 255) ^ (yy & 255) ^ (xx >> 8)
                                ^ (yy >> 8)).astype(np.uint32))
        self.hash_mask_y = _mask(height, width)
        self.hash_mask_c = _mask(height // 2, width // 2)

        # quant constants (luma + chroma qp); qp2 rides the consts dict so
        # per-frame QP changes (rate control) never retrace the jit
        from ..tables import chroma_qp
        self.qp_c = chroma_qp(qp)
        self.qp2 = jnp.asarray([qp, self.qp_c], jnp.int32)

        # Big constant arrays are passed as jit ARGUMENTS, not closure
        # constants: embedding them as HLO literals costs minutes of
        # compile time on remote-compile backends.
        self.consts = {k: getattr(self, k) for k in self.CONST_KEYS}
        self._search = jax.jit(self._with_consts(self._search_impl))
        self._waves = jax.jit(self._with_consts(self._waves_impl))
        self._full = jax.jit(self._with_consts(self._full_impl))
        # frame-batched variant: all-intra frames are independent, so
        # vmapping the whole per-frame program multiplies the arithmetic
        # intensity of the (latency-bound) wavefront loop — the TPU
        # analog of kvazaar's OWF frame parallelism across threads
        self._full_b = jax.jit(jax.vmap(self._with_consts(self._full_impl),
                                        in_axes=(None, 0, 0, 0)))

    CONST_KEYS = ("g16", "f16", "g8c", "t16", "t8", "h8", "wave_blocks",
                  "wave_mask", "b_r", "b_c", "hash_mask_y", "hash_mask_c",
                  "qp2")

    def _with_consts(self, fn):
        def wrapped(consts, *args):
            saved = {k: getattr(self, k) for k in consts}
            for k, v in consts.items():
                setattr(self, k, v)
            try:
                return fn(*args)
            finally:
                for k, v in saved.items():
                    setattr(self, k, v)
        return wrapped

    # ------------------------------------------------------------------
    # stage 1: batched mode search
    # ------------------------------------------------------------------

    def search_modes(self, src_y: np.ndarray) -> jax.Array:
        return self._search(self.consts, jnp.asarray(src_y, dtype=jnp.int32))

    def _full_impl(self, src_y_u8, src_cb_u8, src_cr_u8):
        src_y = src_y_u8.astype(jnp.int32)
        modes = self._search_impl(src_y)
        out = self._waves_impl(src_y, src_cb_u8.astype(jnp.int32),
                               src_cr_u8.astype(jnp.int32), modes)
        out["modes_flat"] = modes
        return out

    def _gather_search_refs(self, src: jax.Array) -> jax.Array:
        """Clamped source references for every block: [B, rlen(16)]."""
        n = LUMA_N
        y0 = self.b_r * n
        x0 = self.b_c * n
        h, w = self.h, self.w
        # left col: (y0 + i, x0 - 1), i in 0..2n-1
        iy = jnp.clip(y0[:, None] + jnp.arange(2 * n)[None, :], 0, h - 1)
        ix = jnp.clip(x0[:, None] - 1, 0, w - 1)
        left = src[iy, jnp.broadcast_to(ix, iy.shape)]
        ty = jnp.clip(y0[:, None] - 1, 0, h - 1)
        tx = jnp.clip(x0[:, None] + jnp.arange(2 * n)[None, :], 0, w - 1)
        top = src[jnp.broadcast_to(ty, tx.shape), tx]
        cy = jnp.clip(y0 - 1, 0, h - 1)
        cx = jnp.clip(x0 - 1, 0, w - 1)
        corner = src[cy, cx]
        pad = jnp.zeros((self.n_blocks, 1), jnp.int32)
        return jnp.concatenate([left, corner[:, None], top, pad], axis=1)

    def _preds_all_modes(self, refs: jax.Array, g: jax.Array,
                         f: jax.Array, n: int) -> jax.Array:
        """refs [B, rlen] -> preds [B, 35, n*n] (mode 1 slot garbage)."""
        filt = (refs @ f.T + 2) >> 2
        both = jnp.concatenate([refs, filt], axis=1)  # [B, 2*rlen]
        # one matmul: [35*nn, 2rlen] x [2rlen, B]
        gm = g.reshape(-1, g.shape[-1])
        preds = (both @ gm.T + 16) >> 5  # [B, 35*nn]
        return preds.reshape(-1, 35, n * n)

    def _dc_pred(self, refs: jax.Array, n: int,
                 is_luma: bool) -> jax.Array:
        """DC prediction [B, n*n] (with luma edge filter for n < 32)."""
        left = refs[:, :n]
        top = refs[:, 2 * n + 1:3 * n + 1]
        log2n = int(np.log2(n))
        dc = (left.sum(1) + top.sum(1) + n) >> (log2n + 1)
        pred = jnp.broadcast_to(dc[:, None, None], (refs.shape[0], n, n))
        if is_luma and n < 32:
            # edge filter via iota masks (a static-index .at[].set
            # lowers to an XLA scatter, which serializes on TPU)
            row0 = (top + 3 * dc[:, None] + 2) >> 2
            col0 = (left + 3 * dc[:, None] + 2) >> 2
            tl = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
            ii = jnp.arange(n)
            is_r0 = (ii == 0)[None, :, None]
            is_c0 = (ii == 0)[None, None, :]
            pred = jnp.where(is_r0, row0[:, None, :], pred)
            pred = jnp.where(is_c0 & ~is_r0, col0[:, :, None], pred)
            pred = jnp.where(is_r0 & is_c0, tl[:, None, None], pred)
        return pred.reshape(refs.shape[0], n * n)

    def _fix_1026(self, preds: jax.Array, refs: jax.Array,
                  n: int) -> jax.Array:
        """Post-filter for pure horizontal/vertical luma modes (n < 32)."""
        left = refs[:, :n]
        top = refs[:, 2 * n + 1:3 * n + 1]
        corner = refs[:, 2 * n]
        maxv = 255
        p = preds.reshape(-1, 35, n, n)
        col = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1), 0, maxv)
        p = p.at[:, 26, :, 0].set(col)
        row = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1), 0, maxv)
        p = p.at[:, 10, 0, :].set(row)
        return p.reshape(-1, 35, n * n)

    def _satd8(self, diff: jax.Array) -> jax.Array:
        """SATD over trailing [.., 16, 16] via 8x8 Hadamard; exact int32."""
        d = diff.reshape(*diff.shape[:-2], 2, 8, 2, 8)
        d = jnp.moveaxis(d, -2, -3)  # [..., 2, 2, 8, 8]
        t = jnp.einsum("ij,...jk,kl->...il", self.h8, d, self.h8)
        s = jnp.abs(t).sum(axis=(-1, -2))
        s = (s + 2) >> 2
        return s.sum(axis=(-1, -2))

    def _search_impl(self, src: jax.Array) -> jax.Array:
        n = LUMA_N
        refs = self._gather_search_refs(src)
        preds = self._preds_all_modes(refs, self.g16, self.f16, n)
        preds = self._fix_1026(preds, refs, n)
        preds = preds.at[:, 1, :].set(self._dc_pred(refs, n, True))
        blocks = src.reshape(self.rows, n, self.cols, n)
        blocks = jnp.moveaxis(blocks, 1, 2).reshape(self.n_blocks, 1, n, n)
        diff = blocks - preds.reshape(self.n_blocks, 35, n, n)
        cost = self._satd8(diff)  # [B, 35]
        return jnp.argmin(cost, axis=1).astype(jnp.int32)

    # ------------------------------------------------------------------
    # stage 2: wavefront reconstruction
    # ------------------------------------------------------------------

    def encode_frame(self, src_y, src_cb, src_cr):
        """Returns dict of numpy arrays: modes, levels, cbfs, recon."""
        return self.materialize(self.submit(src_y, src_cb, src_cr))

    def submit(self, src_y, src_cb, src_cr, qp: int | None = None):
        """Dispatch the frame's device work; returns device arrays
        (async — does not block). qp overrides the constructor QP for
        this frame (rate control) without retracing."""
        out = self._full(self._consts_for(qp), jnp.asarray(src_y, jnp.uint8),
                         jnp.asarray(src_cb, jnp.uint8),
                         jnp.asarray(src_cr, jnp.uint8))
        self._start_d2h(out)
        return out

    def submit_many(self, ys, cbs, crs, qp: int | None = None) -> list:
        """Batched dispatch of B independent frames through one jitted
        program; returns per-frame output dicts (lazy slices of the
        batched buffers)."""
        out = self._full_b(self._consts_for(qp),
                           jnp.asarray(np.stack(ys), jnp.uint8),
                           jnp.asarray(np.stack(cbs), jnp.uint8),
                           jnp.asarray(np.stack(crs), jnp.uint8))
        b = len(ys)
        per = [{k: v[i] for k, v in out.items()} for i in range(b)]
        for p in per:
            self._start_d2h(p)
        return per

    def _consts_for(self, qp: int | None):
        if qp is None or qp == self.qp:
            return self.consts
        from ..tables import chroma_qp
        consts = dict(self.consts)
        consts["qp2"] = jnp.asarray([qp, chroma_qp(qp)], jnp.int32)
        return consts

    @staticmethod
    def _start_d2h(out) -> None:
        """Kick off async device->host copies for the host-needed outputs
        so the (slow-link) transfer overlaps the next frame's compute.
        int16 levels stay device-resident (pulled only on int8 overflow)."""
        for k, v in out.items():
            if (k.startswith(("lmask_", "lvals_", "sao_"))
                    or k in ("hash", "sse", "modes_flat", "mv", "is_inter",
                             "ref_idx", "mv2", "ref2", "inter_dir",
                             "lvl_ovf")):
                try:
                    v.copy_to_host_async()
                except (AttributeError, RuntimeError):
                    pass

    def materialize(self, out):
        """Pull the host-needed outputs (levels/modes/hash/sse); recon
        stays on device."""
        res = {k: (np.asarray(v) if
                   k in ("hash", "sse", "modes_flat", "mv", "is_inter",
                         "ref_idx", "mv2", "ref2", "inter_dir")
                   or k.startswith("sao_")
                   else v)
               for k, v in out.items()}
        if bool(np.asarray(out["lvl_ovf"])):
            for p in ("y", "cb", "cr"):
                res["levels_" + p] = np.asarray(out["levels16_" + p])
        else:
            for p in ("y", "cb", "cr"):
                res["levels_" + p] = _sparse_unpack(
                    np.asarray(out["lmask_" + p]),
                    np.asarray(out["lvals_" + p]),
                    out["levels16_" + p].shape)
        for p in ("y", "cb", "cr"):
            res.pop("levels16_" + p, None)
            res.pop("lmask_" + p, None)
            res.pop("lvals_" + p, None)
        res.pop("lvl_ovf", None)
        if "modes_flat" in res:
            res["modes"] = res.pop("modes_flat").reshape(self.rows,
                                                         self.cols)
        if "mv" in res:
            res["mv"] = res["mv"].reshape(self.rows, self.cols, 2)
        if "is_inter" in res:
            res["is_inter"] = res["is_inter"].reshape(self.rows, self.cols)
        if "ref_idx" in res:
            res["ref_idx"] = res["ref_idx"].reshape(self.rows, self.cols)
        if "mv2" in res:
            res["mv2"] = res["mv2"].reshape(self.rows, self.cols, 2, 2)
            res["ref2"] = res["ref2"].reshape(self.rows, self.cols, 2)
            res["inter_dir"] = res["inter_dir"].reshape(self.rows,
                                                        self.cols)
        return res

    # 4x4 diagonal scan as flat (y*4+x) indices in scan order — the only
    # in-CG scan on this path (16x16 luma / 8x8 chroma TUs are always
    # diagonal per spec 7.4.9.11)
    _DIAG4 = None

    @classmethod
    def _diag4(cls):
        # cached as NUMPY (a cached jnp array created inside a fori_loop
        # trace would leak tracers across jit scopes)
        if cls._DIAG4 is None:
            from ..tables import SCAN_DIAG, scan_order
            xy = scan_order(SCAN_DIAG, 2)
            order = np.asarray([y * 4 + x for x, y in xy], np.int32)
            inv = np.empty(16, np.int32)
            inv[order] = np.arange(16)
            cls._DIAG4 = (order, inv)
        return cls._DIAG4

    def _sdh_fix(self, levels: jax.Array, n: int, err: jax.Array,
                 qbits) -> jax.Array:
        """Sign-data-hiding parity fix (spec 7.4.9.11, kvazaar
        quant-generic.c sign-hiding analog): for each 4x4 coefficient
        group whose nonzero span covers >= 4 scan positions the writer
        omits the first coefficient's sign and the decoder infers it from
        the abs-sum parity. When the parity disagrees, apply the
        distortion-cheapest |level| +-1 among the nonzero coefficients:
        +1 where the quantizer rounded down hardest (max err), -1 where
        it rounded up hardest (min err; only on |level| >= 2 so scan
        positions and the hidden sign never move)."""
        order, inv = self._diag4()
        L = levels.shape[0]
        g = n // 4
        big = jnp.int32(1 << 30)
        qbits = jnp.asarray(qbits)
        if qbits.ndim:                       # per-block QP: [L,1,1]->[L,1]
            qbits = qbits.reshape(L, 1)

        def reorder(x):
            x = x.reshape(L, g, 4, g, 4)
            return jnp.moveaxis(x, 2, 3).reshape(L, g * g, 16)[:, :, order]

        s = reorder(levels)
        e = reorder(err)
        nz = s != 0
        any_nz = nz.any(-1)
        first = jnp.argmax(nz, axis=-1)
        last = 15 - jnp.argmax(nz[..., ::-1], axis=-1)
        total = jnp.abs(s).sum(-1)
        sfirst = jnp.take_along_axis(s, first[..., None], -1)[..., 0]
        need = (any_nz & ((last - first) >= 4)
                & ((total & 1) != (sfirst < 0)))
        # +1 candidate: nonzero coeff with max rounding deficit
        e_up = jnp.where(nz, e, -big)
        pos_up = jnp.argmax(e_up, axis=-1)
        cost_up = (1 << qbits) - 2 * jnp.take_along_axis(
            e_up, pos_up[..., None], -1)[..., 0]
        # -1 candidate: |level| >= 2 coeff with max rounding excess
        ok_dn = jnp.abs(s) >= 2
        e_dn = jnp.where(ok_dn, e, big)
        pos_dn = jnp.argmin(e_dn, axis=-1)
        cost_dn = (1 << qbits) + 2 * jnp.take_along_axis(
            e_dn, pos_dn[..., None], -1)[..., 0]
        use_dn = ok_dn.any(-1) & (cost_dn < cost_up)
        pos = jnp.where(use_dn, pos_dn, pos_up)
        step = jnp.where(use_dn, -1, 1)
        sel = jnp.take_along_axis(s, pos[..., None], -1)[..., 0]
        bump = jnp.where(need, jnp.sign(sel) * step, 0)
        onehot = jax.nn.one_hot(pos, 16, dtype=levels.dtype)
        s = s + onehot * bump[..., None]
        out = s[:, :, inv].reshape(L, g, g, 4, 4)
        return jnp.moveaxis(out, 2, 3).reshape(L, n, n)

    def _rdoq_levels(self, co: jax.Array, scale, qbits, qp, log2n: int,
                     offset, is_luma: bool = True) -> jax.Array:
        """Rate-distortion optimized quantization, batched (replaces
        kvazaar src/rdo.c kvz_rdoq's sequential coefficient walk with an
        independent per-coefficient choice): pick |level| among
        {0, l-1, l} (l = nearest) minimizing e^2 + lambda*R with a
        context-free CABAC-bin rate model. Non-normative — any level
        choice stays conformant."""
        bd = getattr(self, "bd", 8)
        absco = jnp.abs(co)
        l_f = ((absco * scale + (1 << (qbits - 1))) >> qbits)

        lam = 0.57 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 3.0)
        # pixel-SSE = coeff-SSE / 4^(15-bd-log2n); errors computed in the
        # scaled domain e = |co|*scale - l*2^qbits carry an extra scale^2.
        # RDOQ_LAMBDA_SCALE compensates the context-free rate model
        # underestimating real CABAC bin costs (tuned empirically).
        k = self.RDOQ_LAMBDA_SCALE * lam \
            * (scale.astype(jnp.float32) ** 2) * 4.0 ** (15 - bd - log2n)

        def rate(l):
            lf = l.astype(jnp.float32)
            r3 = 5.0 + 2.0 * jnp.floor(jnp.log2(jnp.maximum(lf - 1.0,
                                                            1.0)))
            return jnp.where(l == 0, 1.0,
                             jnp.where(l == 1, 3.0,
                                       jnp.where(l == 2, 4.0, r3)))

        def cost(l):
            e = (absco * scale - (l << qbits)).astype(jnp.float32)
            return e * e + k * rate(l)

        best = jnp.zeros_like(l_f)
        best_c = cost(best)
        for cand in (jnp.maximum(l_f - 1, 0), l_f):
            c = cost(cand)
            take = c < best_c
            best = jnp.where(take, cand, best)
            best_c = jnp.where(take, c, best_c)
        return (jnp.sign(co) * best).astype(jnp.int32)

    def _quant_levels(self, co, scale, qbits, offset, qp, log2n,
                      is_luma=True):
        """Quantize: RDOQ when enabled, else the standard offset rule;
        then the SDH parity fix."""
        if self.rdoq:
            levels = self._rdoq_levels(co, scale, qbits, qp, log2n, offset,
                                       is_luma=is_luma)
        else:
            absq = (jnp.abs(co) * scale + offset) >> qbits
            levels = (jnp.sign(co) * absq).astype(jnp.int32)
        if self.sign_hiding:
            err = jnp.abs(co) * scale - (jnp.abs(levels) << qbits)
            levels = self._sdh_fix(levels, 1 << log2n, err, qbits)
        return levels

    def _transform_quant(self, resi: jax.Array, t: jax.Array, qp: int,
                         n: int, mats=None,
                         is_luma: bool = True) -> tuple[jax.Array, jax.Array]:
        """Forward transform + quant + dequant + inverse; exact int32.
        resi [L, n, n] -> (levels, recon_resi). qp: traced device scalar
        or a per-block [L] vector (delta-QP paths) in the Qp' domain
        (i.e. incl. QpBdOffset for 10-bit). mats: optional
        (quant_table [6, n, n], dequant matrix m [n, n]) for scaling
        lists (spec 8.6.3; kvazaar scalinglist.c quant/dequant coeffs)."""
        log2n = int(np.log2(n))
        bd = getattr(self, "bd", 8)
        shift1 = log2n + bd - 9
        shift2 = log2n + 6
        tt = t.astype(jnp.int32)
        tmp = jnp.einsum("ij,ljk->lik", tt, jnp.swapaxes(resi, 1, 2),
                         preferred_element_type=jnp.int32)
        tmp = (tmp + (1 << (shift1 - 1) if shift1 > 0 else 0)) >> shift1
        co = jnp.einsum("ij,ljk->lik", tt, jnp.swapaxes(tmp, 1, 2),
                        preferred_element_type=jnp.int32)
        co = (co + (1 << (shift2 - 1))) >> shift2
        # quant (qp quantities broadcast [L, 1, 1] when qp is a vector);
        # quantization runs in the Qp' domain (QpY + QpBdOffset, 8.6.3)
        qp = jnp.asarray(qp) + 6 * (bd - 8)
        qb = qp if qp.ndim == 0 else qp[:, None, None]
        tshift = 15 - bd - log2n
        qbits = 14 + qb // 6 + tshift
        if mats is None:
            scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qb % 6]
        else:
            # per-position forward scale: [n, n] or [L, n, n]
            scale = jnp.take(mats[0], qp % 6, axis=0)
        offset = jnp.left_shift(171, qbits - 9)
        levels = self._quant_levels(co, scale, qbits, offset, qb, log2n,
                                    is_luma=is_luma)
        # dequant
        if mats is None:
            dscale = jnp.left_shift(
                jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qb % 6],
                qb // 6)
            dshift = bd + log2n - 9
            deq = (levels * dscale + (1 << (dshift - 1))) >> dshift
        else:
            # spec 8.6.3 with m: (lvl*m*ls << qp/6 + rnd) >> bdShift.
            # int32-safe: fold the qp/6 left shift into the right shift
            # (exact) and pre-clamp when the fold goes negative — the
            # final clip to +-32767 absorbs the saturation
            ils = jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qb % 6]
            x = levels * mats[1] * ils        # |x| <= 2^15*255*72 < 2^31
            dshift = bd + log2n - 5           # bdShift
            s_fold = dshift - qb // 6
            pos = jnp.maximum(s_fold, 0)
            bias = jnp.where(pos > 0,
                             jnp.left_shift(1, jnp.maximum(pos - 1, 0)),
                             0)
            d_rs = (x + bias) >> pos
            d_ls = jnp.clip(x, -40000, 40000) << jnp.maximum(-s_fold, 0)
            deq = jnp.where(s_fold > 0, d_rs, d_ls)
        deq = jnp.clip(deq, -32768, 32767).astype(jnp.int32)
        # inverse
        ishift1, ishift2 = 7, 20 - bd
        tmp2 = jnp.einsum("ji,ljk->lik", tt, deq,
                          preferred_element_type=jnp.int32)
        tmp2 = jnp.clip((tmp2 + (1 << (ishift1 - 1))) >> ishift1,
                        -32768, 32767)
        r2 = jnp.einsum("lij,jk->lik", tmp2, tt,
                        preferred_element_type=jnp.int32)
        r2 = jnp.clip((r2 + (1 << (ishift2 - 1))) >> ishift2, -32768, 32767)
        return levels, r2

    def _transform_quant_skip(self, resi: jax.Array, qp, n: int,
                              mats=None, is_luma: bool = True
                              ) -> tuple[jax.Array, jax.Array]:
        """transform_skip T/Q/IT (reference transform.c:163-196
        kvz_transformskip / kvz_itransformskip): the DCT/DST is replaced
        by a pure shift of the residual into the coefficient dynamic
        range; quant/dequant are the normal paths (incl. RDOQ/SDH)."""
        log2n = int(np.log2(n))
        bd = getattr(self, "bd", 8)
        tshift = 15 - bd - log2n
        co = resi.astype(jnp.int32) << tshift
        qp = jnp.asarray(qp) + 6 * (bd - 8)
        qb = qp if qp.ndim == 0 else qp[:, None, None]
        qbits = 14 + qb // 6 + tshift
        if mats is None:
            scale = jnp.asarray(QUANT_SCALES, jnp.int32)[qb % 6]
        else:
            scale = jnp.take(mats[0], qp % 6, axis=0)
        offset = jnp.left_shift(171, qbits - 9)
        levels = self._quant_levels(co, scale, qbits, offset, qb, log2n,
                                    is_luma=is_luma)
        if mats is None:
            dscale = jnp.left_shift(
                jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qb % 6],
                qb // 6)
            dshift = bd + log2n - 9
            deq = (levels * dscale + (1 << (dshift - 1))) >> dshift
        else:
            ils = jnp.asarray(INV_QUANT_SCALES, jnp.int32)[qb % 6]
            x = levels * mats[1] * ils
            dshift = bd + log2n - 5
            s_fold = dshift - qb // 6
            pos = jnp.maximum(s_fold, 0)
            bias = jnp.where(pos > 0,
                             jnp.left_shift(1, jnp.maximum(pos - 1, 0)),
                             0)
            d_rs = (x + bias) >> pos
            d_ls = jnp.clip(x, -40000, 40000) << jnp.maximum(-s_fold, 0)
            deq = jnp.where(s_fold > 0, d_rs, d_ls)
        deq = jnp.clip(deq, -32768, 32767).astype(jnp.int32)
        r2 = (deq + (1 << (tshift - 1))) >> tshift
        return levels, jnp.clip(r2, -32768, 32767)

    def _gather_recon_refs(self, rec: jax.Array, bids: jax.Array,
                           n: int, cols: int) -> jax.Array:
        """Normative refs with substitution from a padded recon plane.
        rec is padded: [1 + H + n, 1 + W + n], offset (1, 1).
        Returns [L, rlen]."""
        r = bids // cols
        c = bids % cols
        y0 = r * n + 1
        x0 = c * n + 1
        w = cols * n
        # raw gathers (in-bounds thanks to padding)
        iy = y0[:, None] + jnp.arange(2 * n)[None, :]
        left = rec[iy, (x0 - 1)[:, None]]
        tx = x0[:, None] + jnp.arange(2 * n)[None, :]
        top = rec[(y0 - 1)[:, None], tx]
        corner = rec[y0 - 1, x0 - 1]
        # availability (CTU raster order == block raster order)
        has_top = (r > 0)[:, None]
        has_left = (c > 0)[:, None]
        has_tr = ((r > 0) & (c < cols - 1))[:, None]
        # bottom-left never available in a flat CTU grid
        # substitution (spec 8.4.4.2.2) specialised to segment granularity:
        fill = jnp.full_like(left[:, :1], 128)
        # upper-left available? -> borrow order: bl<-left[n-1];
        # corner<-left[0] if !top&left; left&corner<-top[0] if top&!left
        lu = jnp.where(has_left, left[:, :n],
                       jnp.where(has_top, jnp.broadcast_to(top[:, :1],
                                                           left[:, :n].shape),
                                 jnp.broadcast_to(fill,
                                                  left[:, :n].shape)))
        bl = jnp.broadcast_to(lu[:, n - 1:n], (left.shape[0], n))
        corner_sub = jnp.where(has_top[:, 0] & has_left[:, 0], corner,
                               jnp.where(has_left[:, 0], lu[:, 0],
                                         jnp.where(has_top[:, 0], top[:, 0],
                                                   128)))
        tmain = jnp.where(has_top, top[:, :n],
                          jnp.broadcast_to(corner_sub[:, None],
                                           top[:, :n].shape))
        tr = jnp.where(has_tr, top[:, n:],
                       jnp.broadcast_to(tmain[:, n - 1:n],
                                        top[:, n:].shape))
        pad = jnp.zeros((left.shape[0], 1), jnp.int32)
        return jnp.concatenate([lu, bl, corner_sub[:, None], tmain, tr,
                                pad], axis=1)

    def _block_pred(self, refs: jax.Array, modes: jax.Array, g: jax.Array,
                    f: jax.Array, n: int, is_luma: bool) -> jax.Array:
        """Predict each block with its own mode. [L, n*n]."""
        filt = (refs @ f.T + 2) >> 2 if is_luma else refs
        both = jnp.concatenate([refs, filt], axis=1)
        gsel = jnp.take(g, modes, axis=0)  # [L, nn, 2rlen]
        pred = (jnp.einsum("lpr,lr->lp", gsel, both,
                           preferred_element_type=jnp.int32) + 16) >> 5
        dc = self._dc_pred(refs, n, is_luma)
        pred = jnp.where((modes == 1)[:, None], dc, pred)
        if is_luma:
            # 10/26 edge fixup
            left = refs[:, :n]
            top = refs[:, 2 * n + 1:3 * n + 1]
            corner = refs[:, 2 * n]
            p = pred.reshape(-1, n, n)
            col = jnp.clip(top[:, :1] + ((left - corner[:, None]) >> 1),
                           0, 255)
            row = jnp.clip(left[:, :1] + ((top - corner[:, None]) >> 1),
                           0, 255)
            p = jnp.where((modes == 26)[:, None, None],
                          p.at[:, :, 0].set(col), p)
            p = jnp.where((modes == 10)[:, None, None],
                          p.at[:, 0, :].set(row), p)
            pred = p.reshape(-1, n * n)
        return pred

    def _waves_impl(self, src_y, src_cb, src_cr, modes_flat):
        n, nc = LUMA_N, CHROMA_N
        h, w = self.h, self.w
        # seed the carries from the inputs (0 * src) so that under
        # shard_map the carry is device-varying like the inputs
        zseed = (src_y[0, 0] * 0).astype(jnp.int32)
        rec_y = jnp.zeros((1 + h + n, 1 + w + n), jnp.int32) + zseed
        rec_cb = jnp.zeros((1 + h // 2 + nc, 1 + w // 2 + nc),
                           jnp.int32) + zseed
        rec_cr = jnp.zeros_like(rec_cb) + zseed
        levels_y = jnp.zeros((self.n_blocks, n, n), jnp.int32) + zseed
        levels_cb = jnp.zeros((self.n_blocks, nc, nc), jnp.int32) + zseed
        levels_cr = jnp.zeros((self.n_blocks, nc, nc), jnp.int32) + zseed

        src_blocks_y = src_y.reshape(self.rows, n, self.cols, n)
        src_blocks_y = jnp.moveaxis(src_blocks_y, 1, 2).reshape(
            self.n_blocks, n, n)
        src_blocks_cb = jnp.moveaxis(src_cb.reshape(
            self.rows, nc, self.cols, nc), 1, 2).reshape(
            self.n_blocks, nc, nc)
        src_blocks_cr = jnp.moveaxis(src_cr.reshape(
            self.rows, nc, self.cols, nc), 1, 2).reshape(
            self.n_blocks, nc, nc)

        def do_plane(rec, bids, mask, modes_w, src_blocks, g, f, size, qp,
                     t, is_luma, levels_store):
            refs = self._gather_recon_refs(rec, bids, size, self.cols)
            pred = self._block_pred(refs, modes_w, g, f, size, is_luma)
            pred = pred.reshape(-1, size, size)
            srcb = jnp.take(src_blocks, bids, axis=0)
            resi = srcb - pred
            levels, r2 = self._transform_quant(resi, t, qp, size)
            cbf = jnp.any(levels != 0, axis=(1, 2))
            rec_blk = jnp.clip(pred + jnp.where(cbf[:, None, None], r2, 0),
                               0, 255)
            # scatter recon into padded plane
            r = bids // self.cols
            c = bids % self.cols
            y0 = r * size + 1
            x0 = c * size + 1
            yy = y0[:, None, None] + jnp.arange(size)[None, :, None]
            xx = x0[:, None, None] + jnp.arange(size)[None, None, :]
            flat = yy * rec.shape[1] + xx
            flat = jnp.where(mask[:, None, None], flat, rec.size)
            rec = rec.reshape(-1).at[flat.reshape(-1)].set(
                rec_blk.reshape(-1), mode="drop").reshape(rec.shape)
            # store levels
            store_ids = jnp.where(mask, bids, self.n_blocks)
            levels_store = levels_store.at[store_ids].set(
                jnp.where(cbf[:, None, None], levels, 0), mode="drop")
            return rec, levels_store

        def wave_body(i, state):
            rec_y, rec_cb, rec_cr, ly, lcb, lcr = state
            bids = self.wave_blocks[i]
            mask = self.wave_mask[i]
            modes_w = jnp.take(modes_flat, bids)
            rec_y, ly = do_plane(rec_y, bids, mask, modes_w, src_blocks_y,
                                 self.g16, self.f16, n, self.qp2[0],
                                 self.t16, True, ly)
            rec_cb, lcb = do_plane(rec_cb, bids, mask, modes_w,
                                   src_blocks_cb, self.g8c, self.g8c, nc,
                                   self.qp2[1], self.t8, False, lcb)
            rec_cr, lcr = do_plane(rec_cr, bids, mask, modes_w,
                                   src_blocks_cr, self.g8c, self.g8c, nc,
                                   self.qp2[1], self.t8, False, lcr)
            return rec_y, rec_cb, rec_cr, ly, lcb, lcr

        state = (rec_y, rec_cb, rec_cr, levels_y, levels_cb, levels_cr)
        state = jax.lax.fori_loop(0, self.n_waves, wave_body, state)
        rec_y, rec_cb, rec_cr, ly, lcb, lcr = state
        return self._outputs(rec_y, rec_cb, rec_cr, ly, lcb, lcr,
                             src_y, src_cb, src_cr)

    def _expand_bs(self, bs_blk_v, bs_blk_h):
        """Per-block-edge BS [R, C] (vertical: edge left of block (r,c);
        horizontal: edge above) -> segment-grid maps [H/4, W/8] /
        [H/8, W/4] (16-aligned edges only; picture borders excluded)."""
        h, w = self.h, self.w
        bs_ver = jnp.zeros((h // 4, w // 8), jnp.int32)
        bs_ver = bs_ver.at[:, 2::2].set(
            jnp.repeat(bs_blk_v[:, 1:], 4, axis=0))
        bs_hor = jnp.zeros((h // 8, w // 4), jnp.int32)
        bs_hor = bs_hor.at[2::2, :].set(
            jnp.repeat(bs_blk_h[1:, :], 4, axis=1))
        return bs_ver, bs_hor

    def _apply_deblock(self, ry, rcb, rcr, bs_blk_v=None, bs_blk_h=None):
        """In-loop deblock on device (hash/SSE/reference pictures must see
        the filtered picture). Default BS maps: 2 everywhere (all-intra)."""
        from ..ops.deblock_jax import deblock_frame_jax
        if bs_blk_v is None:
            bs_blk_v = jnp.full((self.rows, self.cols), 2, jnp.int32)
            bs_blk_h = bs_blk_v
        bs_ver, bs_hor = self._expand_bs(bs_blk_v, bs_blk_h)
        return deblock_frame_jax(ry, rcb, rcr, bs_ver, bs_hor,
                                 self.qp2[0], self.qp2[1], self.qp2[1],
                                 self.deblock_beta, self.deblock_tc)

    def _outputs(self, rec_y, rec_cb, rec_cr, ly, lcb, lcr,
                 src_y, src_cb, src_cr, bs_blk=None):
        n, h, w = LUMA_N, self.h, self.w
        ry = rec_y[1:1 + h, 1:1 + w]
        rcb = rec_cb[1:1 + h // 2, 1:1 + w // 2]
        rcr = rec_cr[1:1 + h // 2, 1:1 + w // 2]
        if self.deblock:
            bv, bh = bs_blk if bs_blk is not None else (None, None)
            ry, rcb, rcr = self._apply_deblock(ry, rcb, rcr, bv, bh)
        sao_out = {}
        if self.sao:
            from ..ops.sao_jax import sao_chroma, sao_luma
            lam = 0.57 * 2.0 ** ((self.qp2[0].astype(jnp.float32) - 12.0)
                                 / 3.0)
            ab = self.sao in ("full", "band")
            ae = self.sao in ("full", "edge")
            ry, py = sao_luma(src_y, ry, LUMA_N, lam, ab, ae)
            rcb, rcr, pc = sao_chroma(src_cb, src_cr, rcb, rcr, CHROMA_N,
                                      lam, ab, ae)
            for k, v in py.items():
                sao_out["sao_y_" + k] = v.astype(jnp.int8)
            for k, v in pc.items():
                sao_out["sao_c_" + k] = v.astype(jnp.int8)

        def cksum(plane, mask):
            return jnp.sum((plane.astype(jnp.uint32) ^ mask),
                           dtype=jnp.uint32)

        def sse(a, b):
            d = a - b
            return jnp.sum(d * d, dtype=jnp.int64)

        # Quantized levels are mostly zero at practical QPs, so they cross
        # the slow host link sparse-packed: a significance bitmask plus the
        # nonzero values compacted to int8 at 1/8 capacity. A device-side
        # overflow flag (|level| > 127 or nnz > capacity) switches
        # materialize to the dense int16 copy, which otherwise never
        # leaves the device.
        out = {
            "rec_y": ry.astype(jnp.uint8),
            "rec_cb": rcb.astype(jnp.uint8),
            "rec_cr": rcr.astype(jnp.uint8),
            "levels16_y": ly.astype(jnp.int16),
            "levels16_cb": lcb.astype(jnp.int16),
            "levels16_cr": lcr.astype(jnp.int16),
            "hash": jnp.stack([cksum(ry, self.hash_mask_y),
                               cksum(rcb, self.hash_mask_c),
                               cksum(rcr, self.hash_mask_c)]),
            "sse": jnp.stack([sse(ry, src_y), sse(rcb, src_cb),
                              sse(rcr, src_cr)]),
            **sao_out,
        }
        ovf = jnp.bool_(False)
        for name, lv in (("y", ly), ("cb", lcb), ("cr", lcr)):
            mask_u8, vals, o = self._sparse_pack(lv)
            out["lmask_" + name] = mask_u8
            out["lvals_" + name] = vals
            ovf = ovf | o
        out["lvl_ovf"] = ovf
        return out

    @staticmethod
    def _sparse_pack(levels):
        """Pack [B, n, n] int32 levels into (bitmask uint8[size/8],
        compacted int16 values at 1/4 capacity, overflow flag).

        1/4 density covers real content at low QPs (noisy 1080p at QP27
        measured ~22% nonzero); the overflow flag falls back to pulling
        the full int16 plane, which costs a multi-hundred-ms synchronous
        device->host transfer on tunneled links — so the capacity is
        sized to make that path rare, not common."""
        flat = levels.reshape(-1)
        nz = flat != 0
        cap = flat.shape[0] // 4
        pos = jnp.cumsum(nz.astype(jnp.int32)) - 1
        nnz = pos[-1] + 1
        vals = jnp.zeros((cap,), jnp.int16).at[
            jnp.where(nz, pos, cap)].set(
            flat.astype(jnp.int16), mode="drop")
        # MSB-first bit packing, matching np.unpackbits on the host
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
        mask_u8 = (nz.reshape(-1, 8).astype(jnp.int32) @ weights) \
            .astype(jnp.uint8)
        ovf = nnz > cap
        return mask_u8, vals, ovf
