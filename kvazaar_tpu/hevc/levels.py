"""HEVC level limits (spec A.4, tables A.6/A.7) and auto-selection.

Reference parity: kvazaar's level auto-detection and bitrate warnings
(src/cfg.c level validation; src/encmain.c:662-693 runtime max-bitrate
check against the level's CpbBrVclFactor limits).
"""
from __future__ import annotations

# level -> (MaxLumaPs, MaxLumaSr, main-tier MaxBR kbits/s,
#           high-tier MaxBR kbits/s or None)
LEVELS = {
    10: (36864, 552960, 128, None),
    20: (122880, 3686400, 1500, None),
    21: (245760, 7372800, 3000, None),
    30: (552960, 16588800, 6000, None),
    31: (983040, 33177600, 10000, None),
    40: (2228224, 66846720, 12000, 30000),
    41: (2228224, 133693440, 20000, 50000),
    50: (8912896, 267386880, 25000, 100000),
    51: (8912896, 534773760, 40000, 160000),
    52: (8912896, 1069547520, 60000, 240000),
    60: (35651584, 1069547520, 60000, 240000),
    61: (35651584, 2139095040, 120000, 480000),
    62: (35651584, 4278190080, 240000, 800000),
}


def select_level(width: int, height: int, fps: float,
                 bitrate: int = 0) -> tuple[int, int]:
    """Smallest (level, tier) covering the configuration.
    Returns (level_idc = level*3 when written as general_level_idc/...,
    actually level*3? spec: general_level_idc = level_number * 30 / 10),
    i.e. (level*3, tier_flag)."""
    luma_ps = width * height
    luma_sr = luma_ps * max(fps, 1e-6)
    for lvl in sorted(LEVELS):
        max_ps, max_sr, br_main, br_high = LEVELS[lvl]
        if luma_ps > max_ps or luma_sr > max_sr:
            continue
        if bitrate <= br_main * 1000 or bitrate == 0:
            return lvl * 3, 0
        if br_high is not None and bitrate <= br_high * 1000:
            return lvl * 3, 1
    return 62 * 3, 1  # cap at 6.2 high


def max_bitrate(level_idc: int, tier: int) -> int:
    """Level's max VCL bitrate in bits/s (for runtime warnings)."""
    lvl = level_idc // 3
    ent = LEVELS.get(lvl)
    if ent is None:
        return 1 << 62
    br = ent[3] if tier and ent[3] is not None else ent[2]
    return br * 1000
