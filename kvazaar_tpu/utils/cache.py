"""Persistent JAX compilation-cache locations.

XLA:CPU serialized executables are AOT-compiled against the build
host's exact CPU feature set; loading one on a machine with different
features SIGILLs/SIGSEGVs inside the cache-deserialize path (observed:
test-suite segfault when .jax_cache written on an avx512-different
host was reused). TPU executables do not embed host CPU features and
stay portable across hosts with the same TPU generation.

So: CPU-backend runs (the test suite, the multichip dryrun) use a
host-fingerprinted subdirectory; TPU runs share the repo-level
directory so a pre-warmed cache carries across hosts.
"""
import hashlib
import os

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
BASE = os.path.join(REPO, ".jax_cache")


def host_fingerprint() -> str:
    """Short stable hash of this machine's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    # the ISA cap changes codegen: capped and uncapped executables
    # must not share a namespace
    isa = ""
    for tok in os.environ.get("XLA_FLAGS", "").split():
        if tok.startswith("--xla_cpu_max_isa"):
            isa = tok
    return hashlib.sha1((flags + "|" + isa).encode()).hexdigest()[:12]


def cpu_cache_dir() -> str:
    """Cache dir for CPU-backend runs (host-specific)."""
    return os.path.join(BASE, "cpu-" + host_fingerprint())


def tpu_cache_dir() -> str:
    """Cache dir for TPU runs (shared across hosts)."""
    return BASE
