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
