"""Radix-8 head-stage A/B (VERDICT r4 #1a): run once with
REGENT_FFT_RADIX8=0 and once with =1 (separate processes — the packed
tables are cached per (n, sign), one config per process).

Measures, honest chained timer, idle host required:
  f2grid   - 512^3 fused2 grid pass (two 512-axes)
  f2ring   - 512^3 fused2 manual-ring pass
  last2048 - 1-D n=2048 batch 2048 last-axis kernel (3 -> 2 stages)
  plan512  - full 512^3 C2C plan (the headline)

Usage: REGENT_FFT_RADIX8=0 python scripts/probe_radix8.py [--quick]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.ops import pallas_stockham as ps
from regent_fft_tpu.utils import timing

N = 512
SHAPE = (N, N, N)


def timed(step, shape, iters=4, reps=2):
    def make_carry(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.normal(kr, shape, jnp.float32),
                jax.random.normal(ki, shape, jnp.float32))
    return timing.time_chain(step, make_carry, iters, reps)


def check2(step, n):
    rng = np.random.default_rng(0)
    small = (4, n, n)
    a = rng.standard_normal(small).astype(np.float32)
    b = rng.standard_normal(small).astype(np.float32)
    yr, yi = jax.jit(step)((jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(yr).astype(np.complex128) + 1j * np.asarray(yi)
    ref = np.fft.fftn(a.astype(np.complex128) + 1j * b, axes=(1, 2))
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def main():
    quick = "--quick" in sys.argv
    r8 = os.environ.get("REGENT_FFT_RADIX8", "1")
    print(f"RADIX8={r8} radices(512)={ps._stage_radices(512)} "
          f"(2048)={ps._stage_radices(2048)}", flush=True)
    results = {}

    def f2grid(c):
        return ps.fft_axes2_stockham(c[0], c[1], Direction.FORWARD)

    def f2ring(c):
        return ps.fft_axes2_ring(c[0], c[1], Direction.FORWARD)

    err = check2(f2grid, N)
    print(f"f2grid rel_err={err:.2e}", flush=True)
    assert err < 1e-6
    for name, fn in (("f2grid", f2grid), ("f2ring", f2ring)):
        t0 = time.time()
        t = timed(fn, SHAPE)
        results[name] = round(t * 1e3, 2)
        print(f"{name}: {t*1e3:.2f} ms (wall {time.time()-t0:.0f}s)",
              flush=True)

    # last-axis kernel at n=2048 (stage count 3 -> 2 with radix-8)
    def last2048(c):
        return ps.fft_axis_stockham(c[0], c[1], 1, Direction.FORWARD)
    t = timed(last2048, (2048, 2048), iters=8, reps=3)
    results["last2048"] = round(t * 1e3, 3)
    print(f"last2048: {t*1e3:.3f} ms", flush=True)

    if not quick:
        from regent_fft_tpu.plan import PlanSpec, make_plan
        plan = make_plan(PlanSpec(shape=SHAPE, axes=(0, 1, 2),
                                  kind=Kind.C2C, direction=Direction.FORWARD,
                                  norm=Norm.NONE, use_3m=True))
        t = timing.time_plan(plan, iters=4, reps=2)
        results["plan512"] = round(t * 1e3, 2)
        print(f"plan512: {t*1e3:.2f} ms", flush=True)

        # 1-D n=512 batch 8192 (one head stage instead of two)
        p1 = make_plan(PlanSpec(shape=(8192, 512), axes=(1,), kind=Kind.C2C,
                                direction=Direction.FORWARD, norm=Norm.NONE,
                                use_3m=True))
        t = timing.time_plan(p1, iters=8, reps=3)
        results["1d512x8192"] = round(t * 1e3, 3)
        print(f"1d512x8192: {t*1e3:.3f} ms", flush=True)

    print(dict(results), flush=True)


if __name__ == "__main__":
    main()
