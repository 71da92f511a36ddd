"""Encoder configuration and presets.

Reference parity: kvazaar src/cfg.c (kvz_config_init/parse/validate,
~90 options, presets at cfg.c:484-766). This framework exposes the same
option names through `Config.parse(name, value)`; options not yet
implemented by the engine are accepted and validated but raise at encode
time if they would change the bitstream (tracked in UNIMPLEMENTED).
"""
from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass
class Config:
    # input/output geometry
    width: int = 0
    height: int = 0
    framerate_num: int = 25
    framerate_denom: int = 1
    input_bitdepth: int = 8

    # coding structure
    qp: int = 22
    intra_period: int = 64          # --period
    target_bitrate: int = 0         # --bitrate (bits/s; 0 = CQP)
    # open GOP: period boundaries become CRA pictures with RASL leading
    # pictures instead of IDR resets (kvazaar --open-gop)
    open_gop: bool = False
    vps_period: int = 0
    gop_len: int = 0                # 0 = low-delay default until B support
    # low-delay GOP structure (--gop lp-gGdDtT): layered QP offsets and
    # keyframe references on the low-delay path
    gop_lowdelay: bool = False
    gop_lp: tuple[int, int] = (1, 1)    # (d, t)
    ref_frames: int = 1

    # block structure
    ctu_size: int = 64
    cu_log2: int = 4                # fixed CU size of the v0 engine
    min_cu_size: int = 8
    tr_depth_intra: int = 0
    max_tb_log2: int = 5

    # tools
    deblock_enable: bool = True     # --deblock (on by default, as kvazaar)
    deblock_beta: int = 0
    deblock_tc: int = 0
    sao_type: str = "off"
    signhide_enable: bool = False
    rdoq_enable: bool = False
    trskip_enable: bool = False
    smp_enable: bool = False
    amp_enable: bool = False
    lossless: bool = False
    strong_intra_smoothing: bool = False

    # mode search
    # intra PU depth range (kvazaar --pu-depth-intra min-max); depths on
    # the quadtree path: 0=64x64, 1=32x32, 2=16x16, 3=8x8, 4=4x4 NxN
    pu_depth_intra: tuple[int, int] = (1, 3)
    # inter CU depth range (kvazaar --pu-depth-inter); 0=64x64 .. 3=8x8
    pu_depth_inter: tuple[int, int] = (0, 3)
    rd: int = 0
    intra_rdo_et: bool = False
    full_intra_search: bool = False
    # integer ME algorithm (kvazaar --me hexbs|tz|full|dia|full8..64).
    # The TPU engine always runs one exhaustive batched hierarchical
    # sweep (a superset of every listed pattern), so the option selects
    # nothing but is accepted for CLI/API parity (ref src/cfg.c me opts)
    me: str = "hexbs"
    # fractional-pel refinement depth (kvazaar --subme 0..4):
    # 0 = integer only, 1-2 = half-pel, 3-4 = quarter-pel
    subme: int = 4
    # bi-prediction search in B slices (kvazaar --bipred; the engine
    # evaluates the exact bi average of the per-list best candidates)
    bipred: bool = True
    # ME range clamp (kvazaar --mv-constraint none|frametile|
    # frametilemargin); tiles force frametilemargin like the reference
    mv_constraint: str = "none"
    # custom quantization matrices file (kvazaar --cqmfile, HM format)
    cqmfile: str = ""
    # learned coefficient-rate table file (kvazaar --fast-coeff-table:
    # binary/text weight table; here a JSON {log2size: {qp: [8 floats]}})
    fast_coeff_table: str = ""

    # parallelism
    wpp: bool = False
    owf: int = 0
    tiles: tuple[int, int] = (1, 1)
    # tile->device-mesh routing: "auto" uses one shard_mapped program
    # over the mesh when the grid is uniform and devices suffice;
    # "off" forces the sequential per-tile path (same bitstream)
    mesh_tiles: str = "auto"
    # adaptive QP: VAQ strength (kvazaar --vaq) and ROI delta-QP file
    # (kvazaar --roi: "w h" header + w*h integer deltas)
    vaq: int = 0
    roi_file: str = ""
    # quantization matrices: "off" or "default" (kvazaar --scaling-list)
    scaling_list: str = "off"
    slices: str = "none"
    threads: int = 0
    # frame-batched all-intra device dispatch (0/1 = off): groups this
    # many frames into one vmapped device program
    frame_batch: int = 0
    # interlacing: "progressive" | "tff" | "bff" (kvazaar
    # --source-scan-type; field coding splits frames into two fields)
    source_scan_type: str = "progressive"


    # rate control. rc_algorithm "auto" resolves at construction:
    # lambda RC when a bitrate is set, else no-rc (constant QP) —
    # mirroring --bitrate's parse-time upgrade (ref src/cfg.c:1096).
    # An explicit "no-rc" always means constant QP.
    target_bitrate: int = 0
    rc_algorithm: str = "auto"
    # --intra-bits (cfg.c:1390): Hadamard-cost driven I-frame bit
    # allocation + the intra R-lambda model (rate_control.c:352-377)
    intra_bits: bool = False

    # selective encryption (kvazaar --crypto, src/extras/crypto.cpp):
    # "off" | "on" | '+'-joined features (mvs, mv_signs, trans_coeffs,
    # trans_coeff_signs, intra_pred_modes); --key = 16 comma-separated
    # bytes (cfg.c:1207-1212)
    crypto: str = "off"
    crypto_key: str = ""

    # stream metadata
    hash: str = "checksum"          # checksum | md5 | none
    aud_enable: bool = False
    info: bool = False
    level: int = 0                  # 0 = auto
    # per-frame RC/observability dumps (ref src/rate_control.c:98-106:
    # --stats-file-prefix writes one line per frame: poc, qp, lambda,
    # bits, per-plane PSNR)
    stats_file_prefix: str = ""

    def __post_init__(self) -> None:
        if self.rc_algorithm == "auto":
            self.rc_algorithm = ("lambda" if self.target_bitrate > 0
                                 else "no-rc")
        if self.cqmfile and self.scaling_list == "off":
            self.scaling_list = "custom"

    def validate(self) -> None:
        if self.width <= 0 or self.height <= 0:
            raise ValueError("input resolution required")
        if self.width % 8 or self.height % 8:
            raise ValueError("dimensions must be multiples of 8")
        if not 0 <= self.qp <= 51:
            raise ValueError("qp out of range")
        if self.ctu_size not in (16, 32, 64):
            raise ValueError("ctu size must be 16/32/64")
        if self.hash not in ("checksum", "md5", "none"):
            raise ValueError("unknown hash type")
        if self.gop_lowdelay:
            if self.gop_len < 1:
                raise ValueError("lp-gop needs g >= 1")
        elif self.gop_len not in (0, 1, 2, 4, 8, 16):
            raise ValueError("gop must be 0/1/2/4/8/16 or lp-gGdDtT")
        reorder = self.gop_len > 1 and not self.gop_lowdelay
        if self.source_scan_type in ("tff", "bff") and reorder:
            # field pic_timing parity is derived from coding order, which
            # only equals display order without a reordering B GOP
            raise ValueError("interlaced coding requires gop 0/1/lp "
                             "(no B-pyramid reorder)")
        if reorder:
            if self.intra_period == 1:
                self.gop_len = 0  # all-intra: GOP structure is moot
            elif self.intra_period > 0 and \
                    self.intra_period % self.gop_len:
                raise ValueError("intra period must be a multiple of the "
                                 "gop length (closed GOP)")

    # kvazaar-compatible string option interface (src/cfg.c config_parse)
    _OPTION_MAP = {
        "qp": ("qp", int),
        "period": ("intra_period", int),
        "open-gop": ("open_gop", bool),
        "bitrate": ("target_bitrate", int),
        "vps-period": ("vps_period", int),
        "ref": ("ref_frames", int),
        "gop": ("gop_len", "gop"),
        "signhide": ("signhide_enable", bool),
        "rdoq": ("rdoq_enable", bool),
        "deblock": ("deblock_enable", bool),
        "transform-skip": ("trskip_enable", bool),
        "lossless": ("lossless", bool),
        "wpp": ("wpp", bool),
        "tiles": ("tiles", "tiles"),
        "vaq": ("vaq", int),
        "roi": ("roi_file", str),
        "scaling-list": ("scaling_list", str),
        "pu-depth-intra": ("pu_depth_intra", "range"),
        "pu-depth-inter": ("pu_depth_inter", "range"),
        "source-scan-type": ("source_scan_type", str),
        "rc-algorithm": ("rc_algorithm", str),
        "intra-bits": ("intra_bits", bool),
        "owf": ("owf", int),
        "threads": ("threads", int),
        "rd": ("rd", int),
        "me": ("me", str),
        "subme": ("subme", int),
        "bipred": ("bipred", bool),
        "mv-constraint": ("mv_constraint", str),
        "cqmfile": ("cqmfile", str),
        "fast-coeff-table": ("fast_coeff_table", str),
        "smp": ("smp_enable", bool),
        "amp": ("amp_enable", bool),
        "slices": ("slices", str),
        "bitrate": ("target_bitrate", int),
        "crypto": ("crypto", str),
        "key": ("crypto_key", str),
        "hash": ("hash", str),
        "aud": ("aud_enable", bool),
        "info": ("info", bool),
        "stats-file-prefix": ("stats_file_prefix", str),
    }

    def parse(self, name: str, value) -> None:
        if name not in self._OPTION_MAP:
            raise KeyError(f"unknown option {name}")
        attr, typ = self._OPTION_MAP[name]
        # --bitrate upgrades no-rc to lambda RC (ref src/cfg.c:1096)
        if name == "bitrate" and int(value) > 0 \
                and self.rc_algorithm == "no-rc":
            self.rc_algorithm = "lambda"
        if typ is bool:
            value = value in (True, 1, "1", "true", "yes", "on")
        elif typ == "gop":
            v = str(value)
            if v.startswith("lp-"):
                import re
                m = re.match(r"lp-g(\d+)d(\d+)t(\d+)$", v)
                if not m:
                    raise ValueError(
                        "GOP syntax: lp-g8d4t2 (ref src/cfg.c:1029)")
                self.gop_lowdelay = True
                self.gop_lp = (int(m.group(2)), int(m.group(3)))
                value = int(m.group(1))
            else:
                self.gop_lowdelay = False
                value = int(v)
        elif typ == "tiles":
            # "CxR" like the reference's --tiles (src/cfg.c:254-296)
            c, r = str(value).lower().split("x")
            value = (int(c), int(r))
        elif typ == "range":
            lo, hi = str(value).split("-")
            value = (int(lo), int(hi))
        else:
            value = typ(value)
        setattr(self, attr, value)


PRESETS = {
    # speed ladder mirroring kvazaar's table exactly for the knobs this
    # engine has (src/cfg.c:484-766: rd / pu-depth-intra / gop / ref /
    # sao / rdoq / signhide); me pattern and smp/amp are omitted until
    # they land (me is n/a by design: the ME is an exhaustive batched
    # sweep). Depth 4 (NxN 4x4 PUs) matches the reference's medium+
    # rows (cfg.c:628 "pu-depth-intra 1-4").
    "ultrafast": dict(rd=0, pu_depth_intra=(2, 3),
                      pu_depth_inter=(1, 2), gop_len=8,
                      ref_frames=1, sao_type="off", subme=0, me="hexbs",
                      signhide_enable=False, rdoq_enable=False),
    "superfast": dict(rd=0, pu_depth_intra=(2, 3),
                      pu_depth_inter=(1, 2), gop_len=8,
                      ref_frames=1, sao_type="full", subme=2, me="hexbs",
                      signhide_enable=False, rdoq_enable=False),
    "veryfast": dict(rd=0, pu_depth_intra=(2, 3),
                     pu_depth_inter=(1, 3), gop_len=8,
                     ref_frames=1, sao_type="full", subme=2, me="hexbs",
                     signhide_enable=False, rdoq_enable=False),
    "faster": dict(rd=0, pu_depth_intra=(2, 3),
                   pu_depth_inter=(1, 3), gop_len=8,
                   ref_frames=1, sao_type="full", subme=4, me="hexbs",
                   signhide_enable=False, rdoq_enable=False),
    "fast": dict(rd=0, pu_depth_intra=(1, 3), pu_depth_inter=(1, 3),
                 gop_len=8, ref_frames=2,
                 sao_type="full", signhide_enable=False,
                 rdoq_enable=False),
    "medium": dict(rd=0, pu_depth_intra=(1, 4),
                   pu_depth_inter=(0, 3), gop_len=16,
                   ref_frames=4, sao_type="full",
                   signhide_enable=False, rdoq_enable=True),
    "slow": dict(rd=1, pu_depth_intra=(1, 4), pu_depth_inter=(0, 3),
                 gop_len=16, ref_frames=4,
                 sao_type="full", signhide_enable=False,
                 rdoq_enable=True),
    "slower": dict(rd=2, pu_depth_intra=(1, 4),
                   pu_depth_inter=(0, 3), gop_len=16,
                   ref_frames=4, sao_type="full", signhide_enable=True,
                   rdoq_enable=True),
    "veryslow": dict(rd=3, pu_depth_intra=(1, 4),
                     pu_depth_inter=(0, 3), gop_len=16,
                     ref_frames=4, sao_type="full", signhide_enable=True,
                     rdoq_enable=True),
    "placebo": dict(rd=3, pu_depth_intra=(1, 4),
                    pu_depth_inter=(0, 3), gop_len=16,
                    ref_frames=4, sao_type="full", signhide_enable=True,
                    rdoq_enable=True),
}


def apply_preset(cfg: Config, name: str) -> Config:
    for k, v in PRESETS[name].items():
        setattr(cfg, k, v)
    return cfg
