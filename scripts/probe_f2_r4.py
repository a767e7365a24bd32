"""Round-4 fused2 probes (VERDICT r3 #1): where do fused2's 9.6 ms go,
and can the compute hide behind the contiguous DMA?

Variants of the manual plane-ring (fft_axes2_ring) at 512^3, honest
chained timer:
  grid      - the default grid-pipelined fused2 (baseline, ~9.6)
  ring      - manual K=2 ring, VPU butterflies (r3: ~9.35)
  noc       - ring, copy-only body = the VALID DMA floor of this slab
              pattern (expect ~3.3 per docs/tpu_notes.md wide-run table)
  bf1/bf2   - ring with only one butterfly (timing attribution; results
              intentionally wrong)
  mxu2      - ring, VPU first butterfly + HIGHEST-3M _mxu_tile second
  mxu       - ring, HIGHEST-3M _mxu_tile both butterflies
  mxu_k3    - same, ring depth 3 (MXU temporaries are small)

Run on an IDLE host.  Correctness asserted for grid/ring/mxu variants.
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
    return err


def main():
    results = {}

    def run_variant(name, env, fn, verify=False):
        for kk, vv in env.items():
            os.environ[kk] = vv
        try:
            if verify:
                check(fn, name)
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

    def grid_step(c):
        return ps.fft_axes2_stockham(c[0], c[1], Direction.FORWARD)

    def ring_step(c):
        return ps.fft_axes2_ring(c[0], c[1], Direction.FORWARD)

    def ring_step_k3(c):
        return ps.fft_axes2_ring(c[0], c[1], Direction.FORWARD, k=3)

    run_variant("grid", {}, grid_step, verify=True)
    run_variant("ring", {}, ring_step, verify=True)
    run_variant("noc", {"REGENT_FFT_F2_BODY": "noc"}, ring_step)
    run_variant("bf1", {"REGENT_FFT_F2_BODY": "bf1"}, ring_step)
    run_variant("bf2", {"REGENT_FFT_F2_BODY": "bf2"}, ring_step)
    run_variant("mxu2", {"REGENT_FFT_F2_TILE": "mxu2"}, ring_step,
                verify=True)
    run_variant("mxu", {"REGENT_FFT_F2_TILE": "mxu"}, ring_step,
                verify=True)
    run_variant("mxu_k3", {"REGENT_FFT_F2_TILE": "mxu"}, ring_step_k3)
    print(results)


if __name__ == "__main__":
    main()
