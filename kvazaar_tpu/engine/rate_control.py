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


class RateControl:
    MIN_QP, MAX_QP = 0, 51

    def __init__(self, width: int, height: int, target_bitrate: float,
                 framerate: float, intra_period: int = 0) -> None:
        self.pixels = width * height
        self.bits_per_frame = target_bitrate / max(framerate, 1e-6)
        self.intra_period = intra_period
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

    def frame_qp(self, is_idr: bool) -> int:
        bpp = self.frame_target_bits(is_idr) / self.pixels
        lam = self.alpha * (bpp ** self.beta)
        lam = min(max(lam, 0.1), 10000.0)
        qp = round(4.2005 * math.log(lam) + 13.7122)
        qp = min(max(qp, self.MIN_QP), self.MAX_QP)
        self._last = (lam, bpp)
        return int(qp)

    # -- model update ----------------------------------------------------------

    def update(self, actual_bits: int, is_idr: bool) -> None:
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
                 framerate: float, intra_period: int = 0) -> None:
        super().__init__(width, height, target_bitrate, framerate,
                         intra_period)
        self.rc_ctbs = ((height + 63) // 64, (width + 63) // 64)
        n = self.rc_ctbs[0] * self.rc_ctbs[1]
        self.c_ctu = np.full(n, 4.2)
        self.k_ctu = np.full(n, -1.2)
        self.ctu_pixels = 64 * 64
        self.prev_lambda = -1.0
        self._model_ready = False
        self._last_lam = None

    def _solve_lambda(self, target_bits: float, lam0: float) -> float:
        """Newton solve of sum (a_i/lam)^{b_i} = target (the reference
        iterates a cubic Taylor expansion, rate_control.c:399-473)."""
        a = -self.c_ctu * self.k_ctu /             self.ctu_pixels ** (self.k_ctu - 1.0)
        b = -1.0 / (self.k_ctu - 1.0)
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

    def frame_qp(self, is_idr: bool) -> int:
        target = self.frame_target_bits(is_idr)
        bpp = target / self.pixels
        lam = self.alpha * bpp ** self.beta
        if is_idr and self.intra_period != 1:
            lam *= 0.5      # reference's intra reduction (:531)
        if self._model_ready and not (is_idr and self.intra_period != 1):
            lam = self._solve_lambda(target, lam)
        if self.prev_lambda > 0:
            p = min(max(self.prev_lambda, 0.1), 2000.0)
            lam = min(max(lam, p * 2.0 ** (-10 / 3)), p * 2.0 ** (10 / 3))
        lam = min(max(lam, 0.1), 10000.0)
        self._last = (lam, bpp)
        self._last_lam = lam
        qp = round(4.2005 * math.log(lam) + 13.7122)
        return int(min(max(qp, self.MIN_QP), self.MAX_QP))

    def update_oba(self, bits_map, src_planes, rec_planes) -> None:
        """Post-picture model update from per-CTB bits and distortion."""
        if self._last_lam is None:
            return
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
        self.c_ctu = new_c
        self.k_ctu = new_k
        self.prev_lambda = lam
        self._model_ready = True
