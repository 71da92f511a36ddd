import os
import sys

# Force JAX tests onto a virtual multi-device CPU mesh; sample-exact tests
# are numpy-only and unaffected.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8 "
    + os.environ.get("XLA_FLAGS", ""))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

REF_ENCODER = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".refbuild", "bin", "kvazaar")


def have_ref_encoder() -> bool:
    return os.path.exists(REF_ENCODER)


@pytest.fixture
def rng():
    return np.random.RandomState(1234)
