"""Multi-host distributed harness: 2 OS processes x 4 virtual CPU devices
stitched by jax.distributed into one 8-device runtime, running the
landmark-sharded Schur BA over the GLOBAL mesh (SURVEY §4's "how to test
multi-node without a cluster"; BASELINE north star's N-host path)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")



import pytest

# Full-engine / compile-heavy: excluded from the fast core subset
pytestmark = pytest.mark.slow

def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_ba(tmp_path):
    port = _free_port()
    out = str(tmp_path / "result.npz")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), out],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outputs.append(stdout.decode())
    for p, o in zip(procs, outputs):
        assert p.returncode == 0, o[-3000:]

    data = np.load(out)
    T, chi2, T_true = data["T"], data["chi2"], data["T_true"]
    assert np.all(np.isfinite(T))
    # BA from noisy landmarks must reduce chi2 and keep poses near truth
    # (poses started exact; gauge-fixed camera 0).
    assert chi2[-1] <= chi2[0]
    assert np.abs(T[:, :3, 3] - T_true[:, :3, 3]).max() < 0.05
