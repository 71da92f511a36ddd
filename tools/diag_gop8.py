"""Diagnose the gop8/lowdelay BD-rate gap: per-frame bytes + PSNR,
mode distribution (skip/merge/AMVP/intra share), ours vs reference, on
the bd_rate clips.

Usage: python tools/diag_gop8.py [--mode gop8|lowdelay] [--clip sines]
       [--qp 27] [--frames 8]
"""
import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

from tools.bd_rate import (MEDIUM_TOOLS, MODES, REF, _ensure_ref,
                           psnr_yuv, synth_clips)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="gop8")
    ap.add_argument("--clip", default="sines")
    ap.add_argument("--qp", type=int, default=27)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    clips, w, h = synth_clips(args.frames)
    frames = clips[args.clip]
    ours_extra, ref_extra = MODES[args.mode]
    tools = {**MEDIUM_TOOLS, **ours_extra}

    # ---- ours, with per-frame info
    from kvazaar_tpu.api import Encoder, encode_sequence
    from kvazaar_tpu.cfg import Config
    cfg = Config(width=w, height=h, qp=args.qp, ctu_size=64, **tools)
    enc = Encoder(cfg)
    stream, infos = encode_sequence(cfg, frames, encoder=enc)
    with open("/tmp/diag_ours.hevc", "wb") as f:
        f.write(stream)
    print(f"== ours total {len(stream)} B")
    infos_d = sorted(infos, key=lambda i: i["poc"])
    recs = [i["recon_out"] for i in infos_d]
    print(f"   seq PSNR {psnr_yuv(frames, recs):.3f}")
    for i in infos:
        dec = i.get("decisions") or {}
        extra = ""
        if "inter8" in dec if isinstance(dec, dict) else False:
            pass
        print(f"   poc={i['poc']:3d} type={i.get('slice_type')} "
              f"qp={i.get('qp')} bytes={i.get('bytes')} "
              f"psnr={i.get('psnr', [0])[0] if i.get('psnr') else ''}"
              + extra)

    # ---- reference, with per-frame stats via --debug recon + stderr
    if not _ensure_ref():
        print("no reference encoder")
        return
    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for (y, cb, cr) in frames:
                f.write(y.tobytes())
                f.write(cb.tobytes())
                f.write(cr.tobytes())
        hevc = os.path.join(td, "o.hevc")
        rec = os.path.join(td, "rec.yuv")
        r = subprocess.run(
            [REF, "--preset", "medium", "-i", yuv, "--input-res",
             f"{w}x{h}", "-o", hevc, *ref_extra, "--qp", str(args.qp),
             "--threads", "0", "--debug", rec],
            capture_output=True, text=True)
        import shutil
        shutil.copy(hevc, "/tmp/diag_ref.hevc")
        print(f"== ref total {os.path.getsize(hevc)} B")
        recs = []
        with open(rec, "rb") as f:
            for _ in frames:
                y = np.frombuffer(f.read(w * h), np.uint8).reshape(h, w)
                cb = np.frombuffer(f.read(w * h // 4),
                                   np.uint8).reshape(h // 2, w // 2)
                cr = np.frombuffer(f.read(w * h // 4),
                                   np.uint8).reshape(h // 2, w // 2)
                recs.append((y, cb, cr))
        print(f"   seq PSNR {psnr_yuv(frames, recs):.3f}")
        for ln in r.stderr.splitlines():
            if "POC" in ln or "bits" in ln.lower():
                print("   " + ln.strip())


if __name__ == "__main__":
    main()
