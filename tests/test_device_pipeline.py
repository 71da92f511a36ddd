"""JAX device pipeline: conformance and multi-chip dry run (CPU backend)."""
import numpy as np
import pytest

from kvazaar_tpu.api import encode_sequence
from kvazaar_tpu.cfg import Config
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames(w, h, n, rng):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = []
    for i in range(n):
        y = (128 + 90 * np.sin(xx / 7 + i) * np.cos(yy / 11)).astype(np.uint8)
        out.append((y, rng.randint(0, 255, (h // 2, w // 2)).astype(np.uint8),
                    np.full((h // 2, w // 2), 77, np.uint8)))
    return out


@pytest.mark.parametrize("w,h", [(64, 64), (128, 96), (120, 88)])
def test_device_path_conformance(rng, w, h):
    cfg = Config(width=w, height=h, qp=30, ctu_size=16)
    stream, infos = encode_sequence(cfg, _frames(w, h, 2, rng))
    frames = HEVCDecoder().decode(stream)
    assert len(frames) == 2
    for f, info in zip(frames, infos):
        assert f.hash_ok
        assert np.array_equal(f.planes[0],
                              info["recon_out"][0].astype(np.uint16))


def test_device_vs_host_paths_both_conformant(rng):
    # same content through device (ctu16) and host (ctu64) paths
    fr = _frames(64, 64, 1, rng)
    for ctu in (16, 64):
        cfg = Config(width=64, height=64, qp=27, ctu_size=ctu)
        stream, _ = encode_sequence(cfg, fr)
        assert all(f.hash_ok for f in HEVCDecoder().decode(stream))


def test_multichip_dryrun():
    import os
    import subprocess
    import sys
    from conftest import scrubbed_multidevice_env
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = ("import sys; sys.path.insert(0, %r); "
            "import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('DRYRUN_OK')" % root)
    r = subprocess.run([sys.executable, "-c", code],
                       env=scrubbed_multidevice_env(8), capture_output=True,
                       text=True, timeout=600)
    assert "DRYRUN_OK" in r.stdout, r.stderr[-2000:]


def test_device_path_with_deblocking(rng):
    cfg = Config(width=96, height=80, qp=30, ctu_size=16,
                 deblock_enable=True)
    stream, infos = encode_sequence(cfg, _frames(96, 80, 2, rng))
    frames = HEVCDecoder().decode(stream)
    assert all(f.hash_ok for f in frames)
