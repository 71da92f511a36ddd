"""Mesh-sharded tiles: the multi-device quadtree tile path.

Runs the full dryrun payload (encode over an 8-device CPU mesh, decode
hash-exact, 1-vs-N-device bit-identity) in a subprocess with a scrubbed
environment, mirroring the driver's dryrun_multichip.
"""
import os
import subprocess
import sys

from conftest import scrubbed_multidevice_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_mesh_dryrun_8_devices():
    r = subprocess.run(
        [sys.executable, "-m", "kvazaar_tpu.parallel.dryrun", "8"],
        env=scrubbed_multidevice_env(8), cwd=REPO,
        capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-4000:]
    assert "MULTICHIP OK" in r.stdout
