"""Per-frame CU-mode statistics of an HEVC stream, via the validation
decoder (works on our streams AND reference-encoder streams — ground
truth for comparing mode decisions at matched configs).

Usage: python tools/stream_stats.py file.hevc
       python tools/stream_stats.py --compare ours.hevc ref.hevc
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stats_of(stream: bytes):
    from kvazaar_tpu.decoder.decoder import HEVCDecoder
    dec = HEVCDecoder()
    dec.collect_stats = True
    frames = dec.decode(stream)
    rows = []
    for f in frames:
        st = getattr(f, "stats", None) or {}
        px = st.get("px", 0)
        rows.append({
            "poc": f.poc,
            "type": {2: "I", 1: "P", 0: "B"}.get(st.get("slice_type"), "?"),
            "skip%": round(100 * st.get("px_skip", 0) / px, 1) if px else "",
            "intra%": round(100 * st.get("px_intra", 0) / px, 1)
            if px else "",
            "merge": st.get("pu_merge", 0),
            "amvp": st.get("pu_amvp", 0),
            "mvd_abs": st.get("mvd_abs", 0),
        })
    return rows


def frame_sizes(stream: bytes):
    """Rough per-frame byte split: bytes between successive slice NALs."""
    import re
    starts = [m.start() for m in re.finditer(b"\x00\x00\x01", stream)]
    sizes = []
    for i, s in enumerate(starts):
        nt = (stream[s + 3] >> 1) & 0x3F
        end = starts[i + 1] if i + 1 < len(starts) else len(stream)
        if nt <= 21:  # VCL
            sizes.append(end - s)
    return sizes


def show(path):
    with open(path, "rb") as f:
        stream = f.read()
    rows = stats_of(stream)
    sizes = frame_sizes(stream)
    print(f"== {path} ({len(stream)} B, {len(rows)} frames)")
    print(f"{'poc':>4} {'ty':>2} {'bytes':>7} {'skip%':>6} {'intra%':>6} "
          f"{'merge':>6} {'amvp':>6} {'mvd_abs':>8}")
    for i, r in enumerate(rows):
        b = sizes[i] if i < len(sizes) else ""
        print(f"{r['poc']:>4} {r['type']:>2} {b:>7} {r['skip%']:>6} "
              f"{r['intra%']:>6} {r['merge']:>6} {r['amvp']:>6} "
              f"{r['mvd_abs']:>8}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--compare"]
    for p in args:
        show(p)
