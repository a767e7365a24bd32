"""Round-4 tail-scheme probes, part C (after probe_f2_r4b found the
HIGHEST 3M tails are ~3.8 ms of fused2's 9.28 and h4 recovers 1.32).

fused2 ring variants:
  f2_h4       - h4 tails (part-B winner, re-measured as anchor)
  f2_b6       - 3-way bf16 tails, 3 DEFAULT dots K=6mt (f32-grade
                1.9e-7 accuracy; split cost on the data is the risk)
  f2_b62      - 3-way fold, 2 DEFAULT dots K=12mt
  f2_mt128_h4 - TAIL_MT=128 + h4: ONE VPU head stage and a K=256
                fully-utilized tail (4x tail MACs)

a0fs (512^3 axis-0 two-pass four-step) variants:
  a0_hi       - highest stage dots (r3 anchor: 9.28)
  a0_h4       - h4 stage dots (exact f32)

Run on an IDLE host.
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

from regent_fft_tpu.dtypes import Direction
from regent_fft_tpu.ops import pallas_stockham as ps
from regent_fft_tpu.utils import timing

N = 512
SHAPE = (N, N, N)


def timed(step, iters=4, reps=2):
    def make_carry(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.normal(kr, SHAPE, jnp.float32),
                jax.random.normal(ki, SHAPE, jnp.float32))
    return timing.time_chain(step, make_carry, iters, reps)


def check(step, name, axes):
    rng = np.random.default_rng(0)
    small = (4, N, N) if axes == (1, 2) else (N, 8, N)
    a = rng.standard_normal(small).astype(np.float32)
    b = rng.standard_normal(small).astype(np.float32)
    yr, yi = jax.jit(step)((jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(yr).astype(np.complex128) + 1j * np.asarray(yi)
    ref = np.fft.fftn(a.astype(np.complex128) + 1j * b, axes=axes)
    err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    print(f"    {name} rel_err={err:.2e}", flush=True)


def f2_step(c):
    return ps.fft_axes2_ring(c[0], c[1], Direction.FORWARD)


def a0_step(c):
    return ps.fft_axis0_fourstep(c[0], c[1], 0, Direction.FORWARD)


def main():
    results = {}

    def run_variant(name, env, fn, axes, verify=False):
        for kk, vv in env.items():
            os.environ[kk] = vv
        try:
            if verify:
                check(fn, name, axes)
            t0 = time.time()
            t = timed(fn)
            results[name] = t
            print(f"{name}: {t*1e3:.2f} ms  (wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for kk in env:
                os.environ.pop(kk, None)

    variants = {
        "f2_h4": (("REGENT_FFT_TAIL_PREC", "h4"), f2_step, (1, 2), False),
        "f2_b6": (("REGENT_FFT_TAIL_PREC", "b6"), f2_step, (1, 2), True),
        "f2_b62": (("REGENT_FFT_TAIL_PREC", "b62"), f2_step, (1, 2), True),
        "f2_mt128_h4": (("REGENT_FFT_TAIL_PREC", "h4",
                         "REGENT_FFT_TAIL_MT", "128"),
                        f2_step, (1, 2), True),
        "a0_hi": ((), a0_step, (0,), False),
        "a0_h4": (("REGENT_FFT_A0FS_PREC", "h4"), a0_step, (0,), True),
    }
    names = sys.argv[1:] or list(variants)
    for nm in names:
        envt, fn, axes, verify = variants[nm]
        env = dict(zip(envt[::2], envt[1::2]))
        run_variant(nm, env, fn, axes, verify=verify)
    print(results)


if __name__ == "__main__":
    main()
