"""Frame-level rate control (ABR) using the R-lambda model.

The model follows JCTVC-K0103 as the reference encoder does
(kvazaar src/rate_control.c: kvz_get_rc_data/update_rc_parameters,
lambda -> QP mapping at kvz_lambda_to_qp): a per-frame bit budget is
converted to lambda via lambda = alpha * bpp^beta, QP derives from
lambda, and (alpha, beta) adapt after each frame from the bits the
encoder actually produced. A virtual buffer spreads over/undershoot
across the following frames.

With the pipelined encode_sequence the model update lags one frame
behind the QP decision (frame N+1's QP is chosen before frame N's bits
are known) — the same ordering the reference accepts under OWF.
"""
from __future__ import annotations

import math

import numpy as np


_H8 = np.array([[1, 1, 1, 1, 1, 1, 1, 1],
                [1, -1, 1, -1, 1, -1, 1, -1],
                [1, 1, -1, -1, 1, 1, -1, -1],
                [1, -1, -1, 1, 1, -1, -1, 1],
                [1, 1, 1, 1, -1, -1, -1, -1],
                [1, -1, 1, -1, -1, 1, -1, 1],
                [1, 1, -1, -1, -1, -1, 1, 1],
                [1, -1, -1, 1, -1, 1, -1, 1]], dtype=np.float64)


def intra_hadamard_cost(y_plane) -> tuple[float, np.ndarray]:
    """Per-8x8 Hadamard activity of the SOURCE picture and its per-CTB
    aggregation — the intra complexity estimate the reference feeds its
    I-frame bit allocation (rate_control.c:202-289
    xCalcHADs8x8_ISlice / :352-360): |H8 x H8^T| summed minus the DC
    term, (sum + 2) >> 2 per block."""
    y = np.asarray(y_plane, np.float64)
    h, w = y.shape
    h8, w8 = h // 8, w // 8
    b = y[:h8 * 8, :w8 * 8].reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3)
    t = np.einsum("ij,abjk,lk->abil", _H8, b, _H8)
    s = np.abs(t).sum(axis=(2, 3)) - np.abs(t[:, :, 0, 0])
    cost8 = (s + 2) // 4
    rc, cc = (h + 63) // 64, (w + 63) // 64
    per_ctb = np.zeros((rc, cc))
    np.add.at(per_ctb,
              (np.repeat(np.arange(h8) // 8, w8),
               np.tile(np.arange(w8) // 8, h8)),
              cost8.reshape(-1))
    return float(cost8.sum()), per_ctb


class RateControl:
    MIN_QP, MAX_QP = 0, 51

    def __init__(self, width: int, height: int, target_bitrate: float,
                 framerate: float, intra_period: int = 0,
                 intra_bits: bool = False, gop_len: int = 0,
                 rdo: int = 1) -> None:
        self.pixels = width * height
        self.bits_per_frame = target_bitrate / max(framerate, 1e-6)
        self.intra_period = intra_period
        self.target_bitrate = target_bitrate
        self.framerate = max(framerate, 1e-6)
        self.gop_len = max(gop_len, 1)
        self.rdo = rdo
        # --intra-bits: Hadamard-cost driven I-frame allocation
        # (rate_control.c:352-377, :509-530, :913-921)
        self.intra_bits = intra_bits
        self.intra_alpha = 6.7542
        self.intra_beta = 1.7860
        self._icost = 0.0
        self._intra_target = None   # set when the last QP used the model
        # K0103 initial model parameters
        self.alpha = 3.2003
        self.beta = -1.367
        # virtual buffer: positive = we have spent less than allotted
        self.surplus = 0.0
        self._last: tuple[float, float] | None = None  # (lambda, bpp used)
        # LCU-level allocation state (kvazaar rate_control.c
        # lcu_allocate_bits / kvz_set_lcu_lambda_and_qp analog):
        # per-CTB bit weights measured from the previous frame
        self.lcu_bits: np.ndarray | None = None

    # -- LCU-level QP map ------------------------------------------------------

    def lcu_qp_map(self, shape: tuple[int, int], frame_qp: int,
                   is_idr: bool, y_plane=None) -> np.ndarray:
        """Per-CTB QP from lambda-domain bit allocation. Weights come
        from the previous frame's measured per-CTB bits; the first frame
        falls back to source-activity (variance) weighting."""
        rc, cc = shape
        if self.lcu_bits is not None and self.lcu_bits.shape == shape:
            w = self.lcu_bits.astype(np.float64) + 1.0
        elif y_plane is not None:
            y = np.asarray(y_plane, np.float64)
            w = y.reshape(rc, 64, cc, 64).var(axis=(1, 3)) + 1.0
        else:
            w = np.ones(shape)
        w = w / w.sum()
        target = self.frame_target_bits(is_idr)
        lam_frame = (self._last[0] if self._last is not None
                     else self.alpha * (target / self.pixels) ** self.beta)
        bits_i = target * w
        bpp_i = np.maximum(bits_i / (64 * 64), 1e-6)
        lam_i = self.alpha * bpp_i ** self.beta
        # clip to the frame lambda band (eq. 26, rate_control.c:1135-38)
        lam_i = np.clip(lam_i, lam_frame * 0.6299605249474366,
                        lam_frame * 1.5874010519681994)
        qp_i = np.round(4.2005 * np.log(lam_i) + 13.7122)
        qp_i = np.clip(qp_i, frame_qp - 2, frame_qp + 2)
        return np.clip(qp_i, self.MIN_QP, self.MAX_QP).astype(np.int32)

    def update_lcu(self, bits_map: np.ndarray) -> None:
        """Feed the measured per-CTB bits of the last written frame."""
        bits_map = np.asarray(bits_map, np.float64)
        if self.lcu_bits is None or self.lcu_bits.shape != bits_map.shape:
            self.lcu_bits = bits_map
        else:
            self.lcu_bits = 0.5 * self.lcu_bits + 0.5 * bits_map

    # -- QP decision -----------------------------------------------------------

    def frame_target_bits(self, is_idr: bool) -> float:
        # spread accumulated surplus/deficit over ~16 future frames;
        # intra frames get a boost mirroring the reference's gop
        # allocation weights (rate_control.c select_picture_lambda)
        target = self.bits_per_frame + self.surplus / 8.0
        if is_idr and self.intra_period != 1:
            target *= 4.0
        return max(target, self.pixels * 0.01)

    def _intra_allocate(self, y_plane) -> float:
        """I-frame target from Hadamard source activity
        (rate_control.c pic_allocate_bits:352-377)."""
        icost, _ = intra_hadamard_cost(y_plane)
        self._icost = icost
        bits = (self.bits_per_frame * self.gop_len
                + self.surplus / 8.0) / self.gop_len
        a = 0.25 if bits * 40 < self.pixels else 0.3
        low = (1.0 if self.rdo < 2 else 1.2) \
            * self.framerate ** -0.873 * self.target_bitrate
        high = (1.1 if self.rdo < 2 else 2.25) \
            * self.framerate ** -0.61 * self.target_bitrate
        original = a * (icost * 4 / max(bits, 1.0)) ** 0.5582 * bits
        return min(max(low, original), high)

    def frame_qp(self, is_idr: bool, y_plane=None, layer: int = 0) -> int:
        self._intra_target = None
        if is_idr and self.intra_bits and y_plane is not None \
                and self.intra_period != 1:
            # --intra-bits: complexity-driven target and the intra
            # R-lambda form (rate_control.c:509-530)
            target = self._intra_allocate(y_plane)
            bpp = target / self.pixels
            temp = (self._icost / self.pixels) ** 1.2517   # BETA1
            lam = self.intra_alpha / 256.0 \
                * (temp / max(bpp, 1e-9)) ** self.intra_beta
            lam = min(max(lam, 0.1), 10000.0)
            self._last = (lam, bpp)
            self._intra_target = target
            qp = round(4.2005 * math.log(lam) + 13.7122)
            return int(min(max(qp, self.MIN_QP), self.MAX_QP))
        bpp = self.frame_target_bits(is_idr) / self.pixels
        lam = self.alpha * (bpp ** self.beta)
        lam = min(max(lam, 0.1), 10000.0)
        qp = round(4.2005 * math.log(lam) + 13.7122)
        qp = min(max(qp, self.MIN_QP), self.MAX_QP)
        self._last = (lam, bpp)
        return int(qp)

    # -- model update ----------------------------------------------------------

    def update(self, actual_bits: int, is_idr: bool,
               layer: int = 0) -> None:
        if self._intra_target is not None and is_idr:
            # intra model adaptation (rate_control.c:913-921)
            lnbpp = math.log(max(
                (self._icost / self.pixels) ** 1.2517, 1e-9))
            diff = self.intra_beta * math.log(max(actual_bits, 1.0)) \
                - math.log(max(self._intra_target, 1.0))
            diff = min(max(0.25 * diff, -0.125), 0.125)
            self.intra_alpha *= math.exp(diff)
            if abs(lnbpp) > 1e-9:
                self.intra_beta += diff / lnbpp
            self._intra_target = None
        # budget accounting uses the NOMINAL per-frame allocation; the
        # surplus-adjusted target is only a borrowing decision, counting
        # it here would be positive feedback (buffer windup). The IDR
        # boost in frame_target_bits borrows implicitly: the big frame
        # drives surplus negative and the following frames repay it.
        self.surplus += self.bits_per_frame - actual_bits
        # keep the buffer bounded to a few seconds of budget
        cap = 4.0 * self.bits_per_frame * 16.0
        self.surplus = min(max(self.surplus, -cap), cap)
        if self._last is None:
            return
        lam_used, _ = self._last
        bpp_real = max(actual_bits / self.pixels, 1e-6)
        lam_comp = self.alpha * (bpp_real ** self.beta)
        lam_comp = min(max(lam_comp, 0.1), 10000.0)
        err = math.log(lam_used) - math.log(lam_comp)
        # K0103 adaptation rates; log(bpp) enters clipped to [-5, -1]
        # (reference update_parameters, rate_control.c:157) so the beta
        # step always opposes the lambda error even at bpp > 1
        self.alpha += 0.10 * err * self.alpha
        self.beta += 0.05 * err * min(max(math.log(bpp_real), -5.0), -1.0)
        self.alpha = min(max(self.alpha, 0.05), 20.0)
        self.beta = min(max(self.beta, -3.0), -0.1)


class OBARateControl(RateControl):
    """OBA rate control (kvazaar --rc-algorithm oba; rate_control.c
    kvz_estimate_pic_lambda :492 / kvz_update_after_picture :904,
    following doi 10.1109/TIP.2014.2336550).

    Per-CTB R-D model D = C * bpp^K with lambda = -dD/dR =
    -C*K*bpp^(K-1). The picture lambda solves
    sum_i (a_i / lambda)^{b_i} = target_bits (a_i = -C_i K_i /
    pixels^(K_i-1), b_i = -1/(K_i-1)); at the optimum every CTB shares
    that lambda (the OBA theorem), so the QP map is flat unless VAQ/ROI
    offsets ride on top. After each picture the per-CTB C/K adapt from
    measured bits and distortion (update_ck, rate_control.c:857-885)."""

    def __init__(self, width: int, height: int, target_bitrate: float,
                 framerate: float, intra_period: int = 0,
                 intra_bits: bool = False, gop_len: int = 0,
                 rdo: int = 1) -> None:
        super().__init__(width, height, target_bitrate, framerate,
                         intra_period, intra_bits=intra_bits,
                         gop_len=gop_len, rdo=rdo)
        self.rc_ctbs = ((height + 63) // 64, (width + 63) // 64)
        n = self.rc_ctbs[0] * self.rc_ctbs[1]
        self.ctu_pixels = 64 * 64
        # per-temporal-layer C/K models and lambda history
        # (rate_control.c c_para[layer]/k_para[layer]/previous_lambdas,
        # kvz_estimate_pic_lambda:492-551)
        self._n_ctu = n
        self.c_ctu_layer: dict[int, np.ndarray] = {}
        self.k_ctu_layer: dict[int, np.ndarray] = {}
        self.prev_lambda = -1.0                   # previous_frame_lambda
        self.prev_lambda_layer: dict[int, float] = {}
        self._last_lam = None
        self._last_layer = 0

    def _layer_model(self, layer: int):
        if layer not in self.c_ctu_layer:
            self.c_ctu_layer[layer] = np.full(self._n_ctu, 4.2)
            self.k_ctu_layer[layer] = np.full(self._n_ctu, -1.2)
            return None
        return (self.c_ctu_layer[layer], self.k_ctu_layer[layer])

    def _solve_lambda(self, target_bits: float, lam0: float,
                      c_ctu, k_ctu) -> float:
        """Newton solve of sum (a_i/lam)^{b_i} = target (the reference
        iterates a cubic Taylor expansion, rate_control.c:399-473)."""
        a = -c_ctu * k_ctu / self.ctu_pixels ** (k_ctu - 1.0)
        b = -1.0 / (k_ctu - 1.0)
        lam = min(max(lam0, 0.1), 10000.0)
        for _ in range(12):
            r = (a / lam) ** b
            f = r.sum() - target_bits
            if abs(f) < 0.01:
                break
            df = -(b * r / lam).sum()
            if df == 0:
                break
            lam = min(max(lam - f / df, 0.001), 1e8)
        return lam

    def frame_qp(self, is_idr: bool, y_plane=None, layer: int = 0) -> int:
        self._intra_target = None
        self._last_layer = layer
        if is_idr and self.intra_bits and y_plane is not None \
                and self.intra_period != 1:
            return super().frame_qp(is_idr, y_plane=y_plane, layer=layer)
        target = self.frame_target_bits(is_idr)
        bpp = target / self.pixels
        lam = self.alpha * bpp ** self.beta
        if is_idr and self.intra_period != 1:
            lam *= 0.5      # reference's intra reduction (:531)
        model = self._layer_model(layer)
        if model is not None and not (is_idr and self.intra_period != 1):
            lam = self._solve_lambda(target, lam, *model)
        # clip against this layer's previous lambda and the previous
        # frame's lambda (rate_control.c:538-551)
        p = self.prev_lambda_layer.get(layer, -1.0)
        if p > 0:
            p = min(max(p, 0.1), 10000.0)
            lam = min(max(lam, p * 0.5), p * 2.0)
        if self.prev_lambda > 0:
            p = min(max(self.prev_lambda, 0.1), 2000.0)
            lam = min(max(lam, p * 2.0 ** (-10 / 3)), p * 2.0 ** (10 / 3))
        lam = min(max(lam, 0.1), 10000.0)
        self._last = (lam, bpp)
        self._last_lam = lam
        qp = round(4.2005 * math.log(lam) + 13.7122)
        return int(min(max(qp, self.MIN_QP), self.MAX_QP))

    def update_oba(self, bits_map, src_planes, rec_planes,
                   layer: int | None = None) -> None:
        """Post-picture per-layer C/K update from per-CTB bits and
        distortion (rate_control.c update_ck:857-885)."""
        if self._last_lam is None:
            return
        if layer is None:
            layer = self._last_layer
        lam = self._last_lam
        y_s = np.asarray(src_planes[0], np.float64)
        y_r = np.asarray(rec_planes[0], np.float64)
        h, w = y_s.shape
        rc, cc = self.rc_ctbs
        pady, padx = rc * 64 - h, cc * 64 - w
        if pady or padx:
            y_s = np.pad(y_s, ((0, pady), (0, padx)), mode="edge")
            y_r = np.pad(y_r, ((0, pady), (0, padx)), mode="edge")
        d = ((y_s - y_r) ** 2).reshape(rc, 64, cc, 64).sum(axis=(1, 3))
        dist = np.maximum(d.reshape(-1) / self.ctu_pixels, 1e-4)
        bpp = np.clip(np.asarray(bits_map, np.float64).reshape(-1)
                      / self.ctu_pixels, 1e-4, 10.0)
        new_k = np.clip(-bpp * lam / dist, -3.0, -0.001)
        new_c = np.clip(dist / bpp ** new_k, 0.1, 100.0)
        self._layer_model(layer)   # ensure slot exists
        self.c_ctu_layer[layer] = new_c
        self.k_ctu_layer[layer] = new_k
        self.prev_lambda = lam
        self.prev_lambda_layer[layer] = lam
