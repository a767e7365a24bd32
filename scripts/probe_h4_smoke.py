"""Hardware smoke for the h4 tail default: correctness + time on the
plan surface the suite benches (1-D batch, 3-D c2c, 3-D r2c, 512^3
headline).  Compares against BENCH_r03 rows (highest-tail era).
"""
import os
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.plan import PlanSpec, make_plan
from regent_fft_tpu.utils.timing import time_plan

RNG = np.random.default_rng(7)


def crand(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


def check(plan, x, ref, name, r03):
    import jax.numpy as jnp
    yd = plan(x)
    # complex buffers cannot cross the axon tunnel: fetch split planes
    y = np.asarray(jnp.real(yd)) + 1j * np.asarray(jnp.imag(yd))
    err = float(np.linalg.norm(y - ref) / np.linalg.norm(ref))
    t = time_plan(plan, iters=4, reps=2)
    print(f"{name}: {t*1e3:.3f} ms (r03 {r03} ms)  rel_err={err:.2e}",
          flush=True)


def main():
    cases = [
        ("1d_c2c_1024_b4096", (4096, 1024), (1,), Kind.C2C, "0.165"),
        ("1d_c2c_2048_b2048", (2048, 2048), (1,), Kind.C2C, "-"),
        ("3d_c2c_256^3x4", (4, 256, 256, 256), (1, 2, 3), Kind.C2C, "9.47"),
        ("3d_c2c_512^3", (512, 512, 512), (0, 1, 2), Kind.C2C, "18.45"),
    ]
    for name, shape, axes, kind, r03 in cases:
        spec = PlanSpec(shape=shape, axes=axes, kind=kind,
                        direction=Direction.FORWARD, norm=Norm.NONE)
        p = make_plan(spec)
        x = crand(shape)
        ref = np.fft.fftn(x.astype(np.complex128), axes=axes)
        check(p, x, ref, name, r03)
        rft.destroy_plan(p)
    # r2c
    for name, shape, axes, r03 in [
            ("1d_r2c_1024_b4096", (4096, 1024), (1,), "0.163"),
            ("3d_r2c_256^3x4", (4, 256, 256, 256), (1, 2, 3), "6.63")]:
        spec = PlanSpec(shape=shape, axes=axes, kind=Kind.R2C,
                        direction=Direction.FORWARD, norm=Norm.NONE)
        p = make_plan(spec)
        x = RNG.standard_normal(shape).astype(np.float32)
        ref = np.fft.rfftn(x.astype(np.float64), axes=axes)
        check(p, x, ref, name, r03)
        rft.destroy_plan(p)


if __name__ == "__main__":
    main()
