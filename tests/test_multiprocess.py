"""Two-process distributed operation on CPU (multi-host readiness).

The reference claims multi-node operation via Legion index launches but
never tests it (``/root/reference/src/fft.rg:513-537``; CI runs
single-node with GASNet off, ``test.sh:38``).  Here we actually run two
coordinated JAX processes, 4 virtual devices each, and verify a global
slab FFT across the 8-device world — shard-exact against numpy.
"""
import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_slab_fft():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=_REPO)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=210)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multi-process workers timed out; output so far: {outs}")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert any("OK" in o for o in outs)
    # cross-process wisdom sync ran on both workers (wisdom-api.c analog)
    assert all("WISDOM-SYNC OK" in o for o in outs), outs
