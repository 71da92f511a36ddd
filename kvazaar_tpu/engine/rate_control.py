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
        # K0103 adaptation rates
        self.alpha += 0.10 * err * self.alpha
        self.beta += 0.05 * err * math.log(bpp_real)
        self.alpha = min(max(self.alpha, 0.05), 20.0)
        self.beta = min(max(self.beta, -3.0), -0.1)
