"""Worker for the 2-process distributed test (run via subprocess).

Each process hosts 4 virtual CPU devices; together they form an
8-device world.  Verifies multi-process init (num_nodes() == 2), global
mesh construction spanning both hosts, and a global slab FFT whose local
output shards match numpy computed per-process.
"""
import sys

coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax
jax.config.update("jax_platforms", "cpu")

from regent_fft_tpu.parallel.mesh import init_distributed, num_nodes

init_distributed(coordinator, nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert num_nodes() == nproc
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
from regent_fft_tpu.parallel import distributed as dist
from regent_fft_tpu.dtypes import Norm

shape = (8, 4, 16)
plan = dist.make_plan_slab(shape, norm=Norm.NONE)

rng = np.random.default_rng(0)  # same seed everywhere: same global input
x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
    np.complex64)

xr_g = jax.make_array_from_callback(
    shape, plan.in_sharding, lambda idx: x.real[idx].astype(np.float32))
xi_g = jax.make_array_from_callback(
    shape, plan.in_sharding, lambda idx: x.imag[idx].astype(np.float32))
yr, yi = plan._fn(xr_g, xi_g)

ref = np.fft.fftn(x)
for sh_r, sh_i in zip(yr.addressable_shards, yi.addressable_shards):
    want = ref[sh_r.index]
    got = np.asarray(sh_r.data) + 1j * np.asarray(sh_i.data)
    rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    assert rel < 1e-5, (pid, sh_r.index, rel)

print(f"worker {pid}: OK ({len(yr.addressable_shards)} local shards verified)")

# ---------------------------------------------------------------------------
# Cross-process wisdom sync (fftw_mpi_gather_wisdom / broadcast_wisdom,
# mpi/wisdom-api.c): a winner measured on process 0 must be APPLIED on
# process 1 (not re-raced), and process-1 wisdom must gather back to 0.
# ---------------------------------------------------------------------------
import regent_fft_tpu as rft
from regent_fft_tpu.ops import factor
from regent_fft_tpu import plan as planmod

if pid == 0:
    # "measure" a backend winner + a schedule override on process 0 only
    p_meas = rft.make_plan((8, 64), axes=(0, 1), kind=rft.Kind.R2C,
                           direction=rft.FORWARD, planner="measure")
    assert p_meas.measurements["backend"]["timings"] != "cached-wisdom"
    factor.set_schedule_override(1024, (32, 32))
else:
    factor.set_schedule_override(512, (8, 64))   # proc-1-only knowledge

n_bcast = rft.broadcast_wisdom()
if pid == 1:
    assert n_bcast > 0, "broadcast imported nothing on process 1"
    # winner measured on proc 0 is applied, NOT re-raced, on proc 1
    assert factor.schedule(1024) == (32, 32)
    rft.clear_plan_cache()
    p2 = rft.make_plan((8, 64), axes=(0, 1), kind=rft.Kind.R2C,
                       direction=rft.FORWARD, planner="measure")
    assert p2.measurements["backend"]["timings"] == "cached-wisdom", \
        p2.measurements["backend"]
else:
    assert n_bcast == 0

n_gath = rft.gather_wisdom()
if pid == 0:
    assert n_gath > 0, "gather imported nothing on process 0"
    assert factor.schedule(512) == (8, 64)   # proc 1's knowledge arrived

print(f"worker {pid}: WISDOM-SYNC OK (bcast={n_bcast} gather={n_gath})")
