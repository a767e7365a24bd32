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
out["c2c_ifft"] = rel_l2(rft.ifft(x), np.fft.ifft(x))
out["c2c_ortho"] = rel_l2(rft.fft(x, norm="ortho"), np.fft.fft(x, norm="ortho"))
# non-pow2 smooth + prime sizes (mixed-radix / rader / bluestein paths)
for n in (640, 1000, 101, 1009):
    xn = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex128)
    out[f"c2c_{n}"] = rel_l2(rft.fft(xn), np.fft.fft(xn))
# rank sweep
x2 = (rng.standard_normal((64, 48)) + 1j * rng.standard_normal((64, 48))).astype(np.complex128)
out["c2c_2d"] = rel_l2(rft.fft2(x2), np.fft.fft2(x2))
x3 = (rng.standard_normal((16, 16, 16)) + 1j * rng.standard_normal((16, 16, 16))).astype(np.complex128)
out["c2c_3d"] = rel_l2(rft.fftn(x3), np.fft.fftn(x3))
out["c2c_3d_inv"] = rel_l2(rft.ifftn(x3), np.fft.ifftn(x3))
# batched plan API (interface generator, c128-typed)
xb = (rng.standard_normal((8, 256)) + 1j * rng.standard_normal((8, 256))).astype(np.complex128)
itf = rft.generate_fft_interface(2, np.complex128, np.complex128)
p = itf.make_plan_batch((8, 256), batch_axis=0)
out["plan_batch"] = rel_l2(p(xb), np.fft.fft(xb, axis=-1))
# real transforms
xr = rng.standard_normal(256).astype(np.float64)
out["r2c"] = rel_l2(rft.rfft(xr), np.fft.rfft(xr))
out["c2r"] = rel_l2(rft.irfft(rft.rfft(xr), 256), xr)
xr3 = rng.standard_normal((12, 16, 20)).astype(np.float64)
out["r2c_3d"] = rel_l2(rft.rfftn(xr3), np.fft.rfftn(xr3))
out["c2r_3d"] = rel_l2(rft.irfftn(np.fft.rfftn(xr3), xr3.shape), xr3)
# r2r kinds vs scipy (f64 path) — all DCT/DST types, 1-D and 2-D
import scipy.fft as sfft
for kind in (1, 2, 3, 4):
    out[f"dct{kind}"] = rel_l2(rft.dct(xr, type=kind), sfft.dct(xr, type=kind))
    out[f"dst{kind}"] = rel_l2(rft.dst(xr, type=kind), sfft.dst(xr, type=kind))
xr2 = rng.standard_normal((24, 32)).astype(np.float64)
out["dctn_2d"] = rel_l2(rft.plan_r2r((24, 32), rft.R2RKind.REDFT10)(xr2),
                        sfft.dctn(xr2, type=2))
out["dht"] = rel_l2(np.asarray(rft.dht(xr)),
                    np.fft.fft(xr).real - np.fft.fft(xr).imag)
# guru strided layout at c128 (transposed view both sides = zero-copy)
from regent_fft_tpu.guru import IODim, plan_guru
gp = plan_guru(dims=[IODim(64, 8, 8)], howmany_dims=[IODim(8, 1, 1)],
               norm=rft.Norm.NONE, dtype="complex128")
xg = (rng.standard_normal((8, 64)) + 1j * rng.standard_normal((8, 64))
      ).astype(np.complex128)
out["guru_transposed"] = rel_l2(
    np.asarray(gp(xg.T.reshape(-1))).reshape(64, 8).T, np.fft.fft(xg, axis=1))
# distributed C2C at x64: f64 planes ride the collectives
from regent_fft_tpu.parallel import distributed as dist
xd = (rng.standard_normal((8, 4, 16)) + 1j * rng.standard_normal((8, 4, 16))
      ).astype(np.complex128)
pd = dist.make_plan_slab((8, 4, 16), norm=rft.Norm.NONE, dtype="complex128")
yd = np.asarray(pd(xd))
assert yd.dtype == np.complex128, yd.dtype
out["distributed_slab"] = rel_l2(yd, np.fft.fftn(xd))
pd1 = dist.make_plan_slab_1d(4096, norm=rft.Norm.NONE, dtype="complex128")
x1 = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)
      ).astype(np.complex128)
out["distributed_slab1d"] = rel_l2(pd1(x1), np.fft.fft(x1))
print(json.dumps(out))
"""


def test_complex128_accuracy():
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu",
               XLA_FLAGS=(os.environ.get("XLA_FLAGS", "")
                          + " --xla_force_host_platform_device_count=8"))
    r = subprocess.run([sys.executable, "-c", _SCRIPT], capture_output=True,
                       text=True, timeout=600, env=env,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    # double-precision tables + f64 matmuls: ~1e-15 relative error
    for key, err in res.items():
        assert err < 1e-13, (key, err)
