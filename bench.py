"""Benchmark: 1080p encode fps vs the reference encoder's MEDIUM preset
on this host, with BD-rate measurements at matched scenarios
(tools/bd_rate.py, QP 22/27/32/37, 416x240 clips).

Scenarios (BASELINE.json driver configs):
  - all-intra on the quadtree flagship path (CTB 64 partition DP +
    wavefront recon + deblock + SAO + RDOQ, native C++ entropy)
  - low-delay P (lp-g4d3t1) on the quadtree inter path
  - GOP8 B pyramid

Prints ONE JSON line on stdout: {"metric", "value", "unit",
"vs_baseline", ...}. vs_baseline = our fps / reference-medium fps
(all-intra, same content). Extra keys: device/host breakdown, low-delay
and GOP8 fps + ratios, compile seconds per scenario, and
bd_rate_*_pct (negative = we need fewer bits at equal PSNR).

Driver-proofing (VERDICT r3 #1): the cumulative result dict is flushed
to stdout if the process receives SIGTERM/SIGINT (the driver's timeout
sends TERM), and to BENCH_PARTIAL.json + stderr at every stage boundary,
so a timeout always leaves the latest measured numbers behind. The
reference encoder is built FIRST (cheap, cached) and every stage checks
the wall-clock budget before starting.
"""
import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

W, H, QP, N_FRAMES = 1920, 1080, 27, 12
TOOLS = dict(deblock_enable=True, sao_type="full", rdoq_enable=True,
             signhide_enable=False)   # the medium-preset tool row

# wall-clock budget: stages are skipped (with an explanatory key) once
# the budget is spent, so the bench emits its JSON line instead of
# overrunning the driver. The CORE stage is also guarded: it runs only
# if enough budget remains for a cold compile.
# the driver's recorded runs were SIGTERMed at ~1800 s wall
# (BENCH_r04.json killed_by_signal=15 at 1798 s): budget must land the
# final JSON line before that
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_T_START = time.time()

RES = {
    "metric": "1080p_allintra_quadtree_fps_vs_medium",
    "value": None,
    "unit": "fps",
    "vs_baseline": None,
}
_EMITTED = False


def _elapsed():
    return time.time() - _T_START


def _over_budget(reserve_s=0.0):
    return _elapsed() + reserve_s > BUDGET_S


def _emit_final():
    """The ONE stdout JSON line (idempotent)."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    RES["bench_wall_s"] = round(_elapsed(), 1)
    print(json.dumps(RES), flush=True)


def _checkpoint(stage):
    """Record progress at a stage boundary: side file + stderr (NOT
    stdout — stdout carries exactly one JSON line)."""
    RES["last_stage"] = stage
    try:
        with open(os.path.join(REPO, "BENCH_PARTIAL.json"), "w") as f:
            json.dump(RES, f)
    except OSError:
        pass
    print(f"[bench {_elapsed():7.1f}s] {stage}: "
          + json.dumps(RES), file=sys.stderr, flush=True)


def _on_term(signum, frame):
    RES["killed_by_signal"] = signum
    _emit_final()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGINT, _on_term)


def synth_frames(n, w, h):
    rng = np.random.RandomState(7)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    noise = rng.randint(-12, 12, (h, w))
    frames = []
    for i in range(n):
        y = np.clip(128 + 80 * np.sin(xx / 23 + i * 0.3) * np.cos(yy / 17)
                    + 20 * np.sin((xx + yy) / 7) + noise, 0, 255) \
            .astype(np.uint8)
        cb = (128 + 40 * np.sin(xx[:h // 2, :w // 2] / 31)).astype(np.uint8)
        cr = (128 + 40 * np.cos(yy[:h // 2, :w // 2] / 29)).astype(np.uint8)
        frames.append((y, cb, cr))
    return frames


def bench_ours(frames, cfg_extra=None):
    """Returns (fps, nbytes, encoder, compile_s)."""
    from kvazaar_tpu.api import Encoder, encode_sequence
    from kvazaar_tpu.cfg import Config
    kw = dict(width=W, height=H, qp=QP, ctu_size=64, intra_period=1,
              **TOOLS)
    kw.update(cfg_extra or {})
    cfg = Config(**kw)
    enc = Encoder(cfg)
    # warmup (compile) — timed so compile cost is visible in the output.
    # The warmup must cover EVERY device program variant (I, P and B
    # slices), or the timed run below pays a ~400 s compile mid-stream:
    # a B pyramid needs a full GOP (+1 to flush the anchor) to reach
    # its first B frame
    n_warm = 2 if cfg.gop_len <= 1 else min(len(frames), cfg.gop_len + 2)
    t0 = time.time()
    out0, _ = encode_sequence(cfg, frames[:n_warm], encoder=enc)
    compile_s = time.time() - t0
    enc2 = Encoder(cfg)
    t0 = time.time()
    out, infos = encode_sequence(cfg, frames, encoder=enc2)
    dt = time.time() - t0
    return len(frames) / dt, len(out), enc2, compile_s


def breakdown(enc, frames):
    """(device ms/frame incl. D2H, host-only finalize ms) on the
    all-intra pipeline, measured with the device output already pulled
    so host work can't hide a device wait."""
    y, cb, cr = frames[1]
    meta = enc.submit_frame(y, cb, cr)
    np.asarray(meta["dev"]["hostbuf"])
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        outs = enc.submit_frame(y, cb, cr)
        np.asarray(outs["dev"]["hostbuf"])
    t_dev = (time.time() - t0) / reps
    meta2 = enc.submit_frame(y, cb, cr)
    np.asarray(meta2["dev"]["hostbuf"])
    t0 = time.time()
    enc.finalize_frame(meta2)
    t_host = time.time() - t0
    return t_dev, t_host


def bench_reference(frames, preset="medium", extra=("-p", "1")):
    from tools.refbuild import ensure_ref_encoder
    ref = ensure_ref_encoder()
    if ref is None:
        return None, None
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for (y, cb, cr) in frames:
                f.write(y.tobytes())
                f.write(cb.tobytes())
                f.write(cr.tobytes())
        t0 = time.time()
        # preset FIRST (presets override earlier flags); the reference
        # gets default threading (whole host CPU)
        subprocess.run([ref, "--preset", preset, "-i", yuv,
                        "--input-res", f"{W}x{H}", "-o",
                        os.path.join(td, "o.hevc"),
                        *extra, "--qp", str(QP)],
                       check=True, capture_output=True)
        dt = time.time() - t0
        nbytes = os.path.getsize(os.path.join(td, "o.hevc"))
    return len(frames) / dt, nbytes


def main():
    fast = "--fast" in sys.argv
    _checkpoint("start")

    # Stage 0: reference build + reference all-intra measurement FIRST
    # (cheap: cmake build is cached in .refbuild/, encode ~15 s) so the
    # baseline side of the ratio exists even if our compile times out.
    frames = synth_frames(N_FRAMES, W, H)
    ref_fps = ref_bytes = None
    try:
        ref_fps, ref_bytes = bench_reference(frames)
        RES["ref_medium_fps"] = round(ref_fps, 4) if ref_fps else None
        RES["bytes_qp27_ref"] = ref_bytes
    except Exception as e:
        RES["ref_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint("reference_allintra")

    # Stage 1: our all-intra quadtree flagship (the core metric).
    try:
        fps, nbytes, enc, comp_s = bench_ours(frames)
        RES["value"] = round(fps, 4)
        RES["vs_baseline"] = (round(fps / ref_fps, 4) if ref_fps else None)
        RES["bytes_qp27_ours"] = nbytes
        RES["compile_s_allintra"] = round(comp_s, 1)
        _checkpoint("ours_allintra")
        t_dev, t_host = breakdown(enc, frames)
        RES["device_ms_per_frame"] = round(t_dev * 1000, 1)
        RES["host_entropy_ms_per_frame"] = round(t_host * 1000, 1)
        del enc
        _checkpoint("breakdown")
    except Exception as e:
        RES["allintra_error"] = f"{type(e).__name__}: {e}"[:300]
        _checkpoint("ours_allintra_failed")

    # Stage 1b: the headline quality number FIRST (bd-intra), so a
    # driver timeout during the expensive inter stages still leaves it
    _bd_one("intra", "bd_rate_vs_medium_pct", fast, ref_fps)

    # Stage 2: low-delay P on the quadtree inter path (driver config 2)
    try:
        if _over_budget():
            raise TimeoutError("bench budget spent")
        ld_cfg = dict(intra_period=0, gop_len=4, gop_lowdelay=True,
                      gop_lp=(3, 1), ref_frames=2)
        ld_fps, ld_bytes, _enc, comp_s = bench_ours(frames, ld_cfg)
        del _enc
        ld_ref_fps, ld_ref_bytes = bench_reference(
            frames, extra=("-p", "0", "--gop", "lp-g4d3t1"))
        RES["lowdelay_fps"] = round(ld_fps, 4)
        RES["lowdelay_vs_medium"] = (round(ld_fps / ld_ref_fps, 4)
                                     if ld_ref_fps else None)
        RES["lowdelay_bytes_ours"] = ld_bytes
        RES["lowdelay_bytes_ref"] = ld_ref_bytes
        RES["compile_s_lowdelay"] = round(comp_s, 1)
    except Exception as e:  # pragma: no cover - keep the bench emitting
        RES["lowdelay_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint("lowdelay")

    # Stage 3: GOP8 B pyramid (driver config 3) on the quadtree path
    try:
        if _over_budget():
            raise TimeoutError("bench budget spent")
        g8_cfg = dict(intra_period=24, gop_len=8)
        g8_fps, g8_bytes, _enc, comp_s = bench_ours(frames, g8_cfg)
        del _enc
        g8_ref_fps, g8_ref_bytes = bench_reference(
            frames, extra=("-p", "24", "--gop", "8"))
        RES["gop8_fps"] = round(g8_fps, 4)
        RES["gop8_vs_medium"] = (round(g8_fps / g8_ref_fps, 4)
                                 if g8_ref_fps else None)
        RES["gop8_bytes_ours"] = g8_bytes
        RES["gop8_bytes_ref"] = g8_ref_bytes
        RES["compile_s_gop8"] = round(comp_s, 1)
    except Exception as e:  # pragma: no cover
        RES["gop8_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint("gop8")

    # Stage 4: remaining BD-rates at matched configurations
    _bd_one("lowdelay", "bd_rate_lowdelay_pct", fast, ref_fps)
    _bd_one("gop8", "bd_rate_gop8_pct", fast, ref_fps)

    _emit_final()


def _bd_one(mode, key, fast, ref_fps):
    if "--no-bd" in sys.argv or fast or ref_fps is None:
        return
    from tools.bd_rate import measure
    try:
        if _over_budget():
            raise TimeoutError("bench budget spent")
        RES[key] = measure("medium", 8, mode=mode)["bd_rate_pct"]
    except Exception as e:
        RES[key] = None
        RES[key + "_error"] = f"{type(e).__name__}: {e}"[:200]
    _checkpoint(f"bd_{mode}")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # last-resort: always leave a JSON line
        RES["fatal_error"] = f"{type(e).__name__}: {e}"[:300]
        _emit_final()
        raise
