"""Build the reference encoder (kvazaar) from /root/reference on demand.

The reference checkout is read-only, so the build tree lives in the repo
root (.refbuild / .refbuild10, both gitignored). Used by bench.py,
tools/bd_rate.py and tests/conftest.py so a fresh host always has a
baseline to compare against; everything skips gracefully when the source
or toolchain is absent.
"""
from __future__ import annotations

import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference"

# memoized build results (path or None) so a failing build is attempted
# at most once per process — have_ref_encoder() runs in skipif at import
# of many test modules, and a silent ~25 min rebuild per module is not ok
_CACHE: dict[int, "str | None"] = {}


def ref_encoder_path(bit_depth: int = 8) -> str:
    d = ".refbuild" if bit_depth == 8 else ".refbuild10"
    return os.path.join(REPO, d, "bin", "kvazaar")


def ensure_ref_encoder(bit_depth: int = 8, quiet: bool = True) -> str | None:
    """Return the path to a reference kvazaar binary, building it with
    cmake+ninja if needed. Returns None if it cannot be built (cached:
    a failed build is not retried within the process or across processes
    that see the .failed sentinel)."""
    if bit_depth in _CACHE:
        return _CACHE[bit_depth]
    exe = _ensure_uncached(bit_depth, quiet)
    _CACHE[bit_depth] = exe
    return exe


def _ensure_uncached(bit_depth: int, quiet: bool) -> str | None:
    exe = ref_encoder_path(bit_depth)
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REF_SRC) or shutil.which("cmake") is None:
        return None
    build = os.path.dirname(os.path.dirname(exe))
    sentinel = os.path.join(build, ".build_failed")
    if os.path.exists(sentinel):
        return None
    os.makedirs(build, exist_ok=True)
    # serialize concurrent builders (bench.py + pytest) on the shared tree
    import fcntl
    lockf = open(os.path.join(build, ".lock"), "w")
    try:
        fcntl.flock(lockf, fcntl.LOCK_EX)
        if os.path.exists(exe):
            return exe
        if os.path.exists(sentinel):
            return None
        out = _build(exe, build, bit_depth, quiet)
        if out is None:
            with open(sentinel, "w") as f:
                f.write("build failed; delete this file to retry\n")
        return out
    finally:
        fcntl.flock(lockf, fcntl.LOCK_UN)
        lockf.close()


def _build(exe: str, build: str, bit_depth: int, quiet: bool) -> str | None:
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    flags = ["-DCMAKE_BUILD_TYPE=Release",
             # the kvazaar-bin target hardcodes RUNTIME_OUTPUT_DIRECTORY
             # to the (read-only) source tree; build only the library
             # with cmake and link the CLI by hand below
             "-DBUILD_KVAZAAR_BINARY=OFF", "-DBUILD_TESTS=OFF"]
    if bit_depth != 8:
        # kvazaar selects bit depth at compile time (src/kvazaar.h
        # KVZ_BIT_DEPTH); the cmake project honours a CFLAGS define
        flags.append(f"-DCMAKE_C_FLAGS=-DKVZ_BIT_DEPTH={bit_depth}")
    try:
        subprocess.run(["cmake", "-S", REF_SRC, "-B", build, *flags, *gen],
                       check=True, capture_output=quiet, timeout=300)
        subprocess.run(["cmake", "--build", build, "-j8"],
                       check=True, capture_output=quiet, timeout=900)
        os.makedirs(os.path.join(build, "bin"), exist_ok=True)
        cli = [os.path.join(REF_SRC, "src", f)
               for f in ("encmain.c", "cli.c", "yuv_io.c")]
        cc = ["gcc", "-O2", "-pthread",
              "-I", os.path.join(REF_SRC, "src"),
              "-I", os.path.join(REF_SRC, "src", "extras")]
        if bit_depth != 8:
            cc.append(f"-DKVZ_BIT_DEPTH={bit_depth}")
        subprocess.run([*cc, *cli, "-L", build, "-lkvazaar", "-lm",
                        "-Wl,-rpath,$ORIGIN/..", "-o", exe],
                       check=True, capture_output=quiet, timeout=300)
    except (subprocess.SubprocessError, OSError):
        return None
    return exe if os.path.exists(exe) else None


if __name__ == "__main__":
    import sys
    bd = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    p = ensure_ref_encoder(bd, quiet=False)
    print(p or "FAILED")
