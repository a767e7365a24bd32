"""complex128 (double-precision) verification path.

The reference's double-precision parity (Regent ``complex64`` = 2xf64,
``src/fft.rg:293-320``).  f64 requires JAX_ENABLE_X64 before init, so this
runs in a subprocess.
"""
import json
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json
import numpy as np
import regent_fft_tpu as rft
from regent_fft_tpu.utils.verify import rel_l2

rng = np.random.default_rng(0)
out = {}
x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(np.complex128)
out["c2c_1024"] = rel_l2(rft.fft(x), np.fft.fft(x))
x3 = (rng.standard_normal((16, 16, 16)) + 1j * rng.standard_normal((16, 16, 16))).astype(np.complex128)
out["c2c_3d"] = rel_l2(rft.fftn(x3), np.fft.fftn(x3))
xr = rng.standard_normal(256).astype(np.float64)
out["r2c"] = rel_l2(rft.rfft(xr), np.fft.rfft(xr))
print(json.dumps(out))
"""


def test_complex128_accuracy():
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", _SCRIPT], capture_output=True,
                       text=True, timeout=300, env=env,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    # double-precision tables + f64 matmuls: ~1e-15 relative error
    for key, err in res.items():
        assert err < 1e-13, (key, err)
