"""BD-rate (Bjøntegaard delta) harness: our encoder vs the reference.

Encodes synthetic clips at QP {22, 27, 32, 37} with both encoders,
computes PSNR-based BD-rate (piecewise-cubic log-rate integration over
the overlapping PSNR interval, the standard VCEG-M33 method), and prints
one JSON object.

Reference parity: the reference gates everything on conformance+quality
(/root/reference/tests/util.sh); it has no in-repo BD harness, so this
is the framework's matched-quality measurement (BASELINE.md recipe).

Usage: python tools/bd_rate.py [--preset medium] [--frames 8]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = os.path.join(REPO, ".refbuild", "bin", "kvazaar")


def _ensure_ref() -> bool:
    from tools.refbuild import ensure_ref_encoder
    return ensure_ref_encoder() is not None

QPS = (22, 27, 32, 37)


def synth_clips(n_frames: int, w: int = 416, h: int = 240):
    """Three synthetic clips: smooth gradient+motion, detail/noise mix,
    moving sines (the ffmpeg-mandelbrot analog of tests/util.sh)."""
    rng = np.random.RandomState(3)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    clips = {}
    clips["gradient"] = [
        ((64 + xx // 3 + yy // 4 + 7 * i) % 256,
         (128 + xx[:h // 2, :w // 2] // 5) % 256,
         (128 + yy[:h // 2, :w // 2] // 5) % 256)
        for i in range(n_frames)]
    noise = rng.randint(0, 256, (h, w))
    mixed = []
    for i in range(n_frames):
        y = (96 + 60 * np.sin(xx / 17 + i * .4) * np.cos(yy / 11)).astype(int)
        y[h // 3: 2 * h // 3] = (y[h // 3: 2 * h // 3]
                                 + noise[h // 3: 2 * h // 3] // 4)
        mixed.append((np.clip(y, 0, 255),
                      128 + 24 * np.sin(xx[:h // 2, :w // 2] / 13 + i * .2),
                      128 + 24 * np.cos(yy[:h // 2, :w // 2] / 9)))
    clips["mixed"] = mixed
    clips["sines"] = [
        (128 + 90 * np.sin(xx / 23 + i * .3) * np.cos(yy / 17)
         + 20 * np.sin((xx + yy) / 7),
         128 + 40 * np.sin(xx[:h // 2, :w // 2] / 31 + i * .1),
         128 + 40 * np.cos(yy[:h // 2, :w // 2] / 29))
        for i in range(n_frames)]
    out = {}
    for name, fs in clips.items():
        out[name] = [tuple(np.clip(np.asarray(p), 0, 255).astype(np.uint8)
                           for p in f) for f in fs]
    return out, w, h


def psnr_yuv(src_frames, rec_frames, bd: int = 8) -> float:
    """Weighted (6Y+Cb+Cr)/8 PSNR over the sequence (JCT-VC common)."""
    mv = float((1 << bd) - 1)
    acc = []
    for (sy, scb, scr), (ry, rcb, rcr) in zip(src_frames, rec_frames):
        def mse(a, b):
            return np.mean((np.asarray(a, np.float64)
                            - np.asarray(b, np.float64)) ** 2)

        def db(m):
            return 99.0 if m == 0 else 10.0 * np.log10(mv * mv / m)
        acc.append((6 * db(mse(sy, ry)) + db(mse(scb, rcb))
                    + db(mse(scr, rcr))) / 8.0)
    return float(np.mean(acc))


def bd_rate(r1, p1, r2, p2) -> float:
    """BD-rate of (r2, p2) vs anchor (r1, p1) in percent (negative =
    the test encoder needs fewer bits at equal PSNR)."""
    lr1, lr2 = np.log(r1), np.log(r2)
    f1 = np.polyfit(p1, lr1, 3)
    f2 = np.polyfit(p2, lr2, 3)
    lo = max(min(p1), min(p2))
    hi = min(max(p1), max(p2))
    if hi <= lo:
        return float("nan")
    i1 = np.polyint(f1)
    i2 = np.polyint(f2)
    avg1 = (np.polyval(i1, hi) - np.polyval(i1, lo)) / (hi - lo)
    avg2 = (np.polyval(i2, hi) - np.polyval(i2, lo)) / (hi - lo)
    return float((np.exp(avg2 - avg1) - 1) * 100)


def encode_ours(frames, w, h, qp, tools) -> tuple[int, float]:
    from kvazaar_tpu.api import encode_sequence
    from kvazaar_tpu.cfg import Config
    cfg = Config(width=w, height=h, qp=qp,
                 **{"ctu_size": 64, **tools})
    stream, infos = encode_sequence(cfg, frames)
    # reorder to display order (B pyramids emit in coding order)
    infos = sorted(infos, key=lambda i: i["poc"])
    recs = [i["recon_out"] for i in infos]
    return len(stream), psnr_yuv(frames, recs)


def encode_ref(frames, w, h, qp, preset,
               extra: tuple = ("-p", "1")) -> tuple[int, float]:
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for (y, cb, cr) in frames:
                f.write(y.tobytes())
                f.write(cb.tobytes())
                f.write(cr.tobytes())
        hevc = os.path.join(td, "o.hevc")
        rec = os.path.join(td, "rec.yuv")
        subprocess.run(
            [REF, "--preset", preset, "-i", yuv, "--input-res",
             f"{w}x{h}", "-o", hevc, *extra, "--qp", str(qp),
             "--threads", "0", "--debug", rec],
            check=True, capture_output=True)
        nbytes = os.path.getsize(hevc)
        recs = []
        with open(rec, "rb") as f:
            for _ in frames:
                y = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
                cb = np.frombuffer(f.read(w * h // 4),
                                   np.uint8).reshape(h // 2, w // 2)
                cr = np.frombuffer(f.read(w * h // 4),
                                   np.uint8).reshape(h // 2, w // 2)
                recs.append((y, cb, cr))
    return nbytes, psnr_yuv(frames, recs)


# quality tools matching the medium preset row (cfg.c:625-652):
# deblock + sao + rdoq, signhide off, pu-depth-intra 1-4, rd 0
MEDIUM_TOOLS = dict(deblock_enable=True, sao_type="full",
                    rdoq_enable=True, signhide_enable=False,
                    pu_depth_intra=(1, 4), rd=0)

# per-mode config: (our Config extras, reference CLI extras).
# The BD comparison is scenario-matched (same random-access contract),
# not tool-matched — each encoder runs its own best settings for the
# scenario, like the BASELINE.md driver configs.
MODES = {
    "intra": (dict(intra_period=1), ("-p", "1")),
    # low-delay P: one IDR, 4-frame lp-gop, 1 ref (driver config 2)
    "lowdelay": (dict(intra_period=0, gop_len=4, gop_lowdelay=True,
                      gop_lp=(3, 1), ref_frames=2),
                 ("-p", "0", "--gop", "lp-g4d3t1")),
    # random access GOP8 B pyramid (driver config 3) on the quadtree
    # B path (r3 flagship; the 16-grid fallback measured worse)
    "gop8": (dict(intra_period=16, gop_len=8),
             ("-p", "16", "--gop", "8")),
}


def measure(preset: str = "medium", n_frames: int = 8,
            tools: dict | None = None,
            size: tuple[int, int] = (416, 240),
            mode: str = "intra") -> dict:
    if not _ensure_ref():
        raise RuntimeError(
            "reference encoder unavailable (build failed or no source); "
            "cannot measure BD-rate")
    if tools is None:
        tools = dict(MEDIUM_TOOLS)
    ours_extra, ref_extra = MODES[mode]
    tools = {**tools, **ours_extra}
    if tools.get("ctu_size") == 16:
        # the 16-grid pipeline has no pu-depth/rd knobs
        tools.pop("pu_depth_intra", None)
        tools.pop("rd", None)
    clips, w, h = synth_clips(n_frames, *size)
    per_clip = {}
    for name, frames in clips.items():
        ours_r, ours_p, ref_r, ref_p = [], [], [], []
        for qp in QPS:
            b, p = encode_ours(frames, w, h, qp, tools)
            ours_r.append(b)
            ours_p.append(p)
            b, p = encode_ref(frames, w, h, qp, preset, ref_extra)
            ref_r.append(b)
            ref_p.append(p)
        per_clip[name] = {
            "bd_rate_pct": round(bd_rate(ref_r, ref_p, ours_r, ours_p), 2),
            "ours": [[r, round(p, 3)] for r, p in zip(ours_r, ours_p)],
            "ref": [[r, round(p, 3)] for r, p in zip(ref_r, ref_p)],
        }
    vals = [c["bd_rate_pct"] for c in per_clip.values()]
    return {
        "metric": f"bd_rate_vs_{preset}_{mode}",
        "bd_rate_pct": round(float(np.mean(vals)), 2),
        "per_clip": per_clip,
        "qps": list(QPS),
        "frames": n_frames,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--mode", default="intra", choices=sorted(MODES))
    ap.add_argument("--size", default="416x240",
                    help="clip WxH (e.g. 448x288 isolates the CTB "
                         "padding overhead: no conformance cropping)")
    args = ap.parse_args()
    if not _ensure_ref():
        print(json.dumps({"error": "reference encoder not built"}))
        sys.exit(0)
    w, h = (int(v) for v in args.size.split("x"))
    print(json.dumps(measure(args.preset, args.frames, size=(w, h),
                             mode=args.mode)))
