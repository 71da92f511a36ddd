import os
import sys

# Tests run on a local CPU backend with a virtual 8-device mesh.
# Scrub the axon TPU hooks *before* jax is imported: with them active,
# any XLA_FLAGS customisation routes compilation through the remote
# compile service (minutes per program instead of seconds).
os.environ["JAX_PLATFORMS"] = "cpu"
# Cap XLA:CPU codegen at AVX2: the AVX512/AMX paths SEGFAULT compiling
# (and serializing) the large inter-search programs on some hosts —
# verified: the same suite crashes without the cap and passes with it.
# (With jax_platforms=cpu the axon plugin does not reroute compilation,
# so setting XLA_FLAGS here is safe; TPU runs never load this file.)
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_max_isa" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_cpu_max_isa=AVX2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# env alone is not enough: the axon hook still routes compilation through
# the remote compile service unless the platform is also set via config.
jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the multi-depth pipeline is expensive to
# compile; repeated test runs hit the cache. CPU-backend executables
# are NOT portable across hosts (XLA:CPU AOT embeds the build host's
# CPU features; loading a foreign one segfaults), so the CPU cache
# lives in a host-fingerprinted subdirectory.
from kvazaar_tpu.utils.cache import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# XLA:CPU executable.serialize() segfaults for some large (inter)
# programs on some hosts, killing the whole test run from inside the
# cache-write path. Sandbox every cache write in a forked child: a
# crash there only loses that cache entry. (Reads are safe: entries
# that were never written are recompiled.)
import signal as _signal  # noqa: E402
import jax._src.compilation_cache as _jcc  # noqa: E402

_orig_put = _jcc.put_executable_and_time


def _safe_put(cache_key, module_name, executable, backend,
              compile_time):
    pid = os.fork()
    if pid == 0:
        try:
            _signal.alarm(120)   # serialize can hang post-fork: bail
            _orig_put(cache_key, module_name, executable, backend,
                      compile_time)
        except BaseException:
            pass
        finally:
            os._exit(0)
    os.waitpid(pid, 0)


_jcc.put_executable_and_time = _safe_put
# compiler.py binds the module, not the function, so the patch takes
from jax._src import compiler as _jcompiler  # noqa: E402,F401

import numpy as np
import pytest

REF_ENCODER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "bin", "kvazaar")


def have_ref_encoder() -> bool:
    if os.path.exists(REF_ENCODER):
        return True
    try:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.refbuild import ensure_ref_encoder
        return ensure_ref_encoder() is not None
    except Exception:
        return False


@pytest.fixture
def rng():
    return np.random.RandomState(1234)


def scrubbed_multidevice_env(n_devices: int = 8) -> dict:
    """Environment for a subprocess running local JAX with N CPU devices,
    free of the axon TPU hooks."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env.pop("PYTHONPATH", None)  # drops the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{n_devices} --xla_cpu_max_isa=AVX2")
    env["JAX_COMPILATION_CACHE_DIR"] = cpu_cache_dir()
    return env
