"""Round-4 fused2 compute-reduction probes, part B.

probe_f2_r4.py established fused2 is COMPUTE-bound: the common part
(DMA + strip transposes) is bf1 + bf2 - full = 4.94 + 5.11 - 9.57 =
0.48 ms, i.e. DMA (3.3 ms floor) hides entirely behind ~4.5 ms of
butterfly compute PER AXIS.  These variants attack the compute:

  base       - ring, default strips (4), highest tails
  strips1/2  - wider VPU ops per stage (fewer, larger slices)
  tail_dflt  - tails at DEFAULT bf16 (WRONG accuracy; attribution of
               the MXU-tail share of the 4.5 ms)
  tail_h4    - 4M-folded HIGHEST tails: 2 dots K=2mt vs 3M's 3 at K=mt
               (exact f32; dispatch-shape win if tails are
               dispatch-bound)
  s1_h4      - strips=1 + h4 combined

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


def check(step, name):
    rng = np.random.default_rng(0)
    small = (4, N, N)
    a = rng.standard_normal(small).astype(np.float32)
    b = rng.standard_normal(small).astype(np.float32)
    yr, yi = jax.jit(step)((jnp.asarray(a), jnp.asarray(b)))
    got = np.asarray(yr).astype(np.complex128) + 1j * np.asarray(yi)
    ref = np.fft.fftn(a.astype(np.complex128) + 1j * b, axes=(1, 2))
    err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    print(f"    {name} rel_err={err:.2e}", flush=True)


def main():
    results = {}

    def step(c):
        return ps.fft_axes2_ring(c[0], c[1], Direction.FORWARD)

    def run_variant(name, env, verify=False):
        for kk, vv in env.items():
            os.environ[kk] = vv
        try:
            if verify:
                check(step, name)
            t0 = time.time()
            t = timed(step)
            results[name] = t
            print(f"{name}: {t*1e3:.2f} ms  (wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        finally:
            for kk in env:
                os.environ.pop(kk, None)

    run_variant("base", {})
    run_variant("strips1", {"REGENT_FFT_F2_RING_STRIPS": "1"}, verify=True)
    run_variant("strips2", {"REGENT_FFT_F2_RING_STRIPS": "2"})
    run_variant("tail_dflt", {"REGENT_FFT_TAIL_PREC": "default"})
    run_variant("tail_h4", {"REGENT_FFT_TAIL_PREC": "h4"}, verify=True)
    run_variant("s1_h4", {"REGENT_FFT_F2_RING_STRIPS": "1",
                          "REGENT_FFT_TAIL_PREC": "h4"})
    print(results)


if __name__ == "__main__":
    main()
