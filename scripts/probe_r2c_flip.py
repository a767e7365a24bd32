"""r2c tail-arrangement A/B (VERDICT r4 #5): REGENT_FFT_R2C_FLIP=in
(r4 form: flip the head, two tail dots) vs =out (r5: one STACKED tail
dot on the unflipped head + half-size output flip).  Run once per mode
in separate processes (runner caches are env-keyed, but plan caches are
not):

  REGENT_FFT_R2C_FLIP=in  python scripts/probe_r2c_flip.py
  REGENT_FFT_R2C_FLIP=out python scripts/probe_r2c_flip.py

Rows (honest chained timer, idle host required):
  c2c_4096x1024   - the c2c anchor (VERDICT target: r2c <= 0.75x this)
  r2c_4096x1024   - the BASELINE 1-D r2c row
  r2c_65536x1024  - big-batch r2c (kernel-dominated)
  r2c_3d_256x4    - 3-D r2c plan (first pass uses the same kernel)
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from regent_fft_tpu.plan import PlanSpec, make_plan
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.utils import timing
from regent_fft_tpu.utils.verify import to_numpy_complex


def row(name, spec, iters=6, reps=4):
    plan = make_plan(spec)
    t = timing.time_plan(plan, iters=iters, reps=reps)
    t = min(t, timing.time_plan(plan, iters=iters, reps=reps, seed0=300))
    print(f"{name}: {t * 1e3:.3f} ms", flush=True)


def main():
    mode = os.environ.get("REGENT_FFT_R2C_FLIP", "out")
    print(f"R2C_FLIP={mode}", flush=True)

    # correctness spot-check on hardware first
    rng = np.random.default_rng(0)
    x = rng.standard_normal((256, 1024)).astype(np.float32)
    p = make_plan(PlanSpec(shape=(256, 1024), axes=(1,), kind=Kind.R2C,
                           direction=Direction.FORWARD, norm=Norm.NONE,
                           use_3m=True))
    # complex buffers cannot cross host<->device on axon: fetch via the
    # split-plane helper (CLAUDE.md)
    got = to_numpy_complex(p(x))
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    err = float(np.abs(got - ref).max() / np.abs(ref).max())
    print(f"hw rel err (256x1024): {err:.2e}", flush=True)
    assert err < 1e-5

    row("c2c_4096x1024", PlanSpec(
        shape=(4096, 1024), axes=(1,), kind=Kind.C2C,
        direction=Direction.FORWARD, norm=Norm.NONE, use_3m=True))
    row("r2c_4096x1024", PlanSpec(
        shape=(4096, 1024), axes=(1,), kind=Kind.R2C,
        direction=Direction.FORWARD, norm=Norm.NONE, use_3m=True))
    row("r2c_65536x1024", PlanSpec(
        shape=(65536, 1024), axes=(1,), kind=Kind.R2C,
        direction=Direction.FORWARD, norm=Norm.NONE, use_3m=True),
        iters=4, reps=3)
    row("r2c_3d_256x4", PlanSpec(
        shape=(4, 256, 256, 256), axes=(1, 2, 3), kind=Kind.R2C,
        direction=Direction.FORWARD, norm=Norm.NONE, use_3m=True),
        iters=4, reps=3)


if __name__ == "__main__":
    main()
