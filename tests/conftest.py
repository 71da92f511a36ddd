import os
import sys

# Tests run on a local CPU backend with a virtual 8-device mesh.
# Scrub the axon TPU hooks *before* jax is imported: with them active,
# any XLA_FLAGS customisation routes compilation through the remote
# compile service (minutes per program instead of seconds).
os.environ["JAX_PLATFORMS"] = "cpu"
# note: do NOT set XLA_FLAGS here — with the axon plugin registered,
# custom XLA_FLAGS route compilation through the remote compile service.
# Multi-device tests run in a subprocess with a scrubbed environment
# (see scrubbed_multidevice_env).

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
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["JAX_COMPILATION_CACHE_DIR"] = cpu_cache_dir()
    return env
