"""1024^3 complex32 flagship hardening (VERDICT r4 #3).

The old bench method (paired single-dispatch minus barriered gen) carries
+-3 ms error and never aliases buffers (in+out+temps exceed HBM -> XLA
streams).  New method: DONATED chain differencing —

  x = gen() on device; time k2 and k1 chained donated dispatches of an
  ORTHO-normalized plan (norm rides the last kernel table for free, and
  ortho preserves the L2 norm so bf16 magnitudes stay bounded for any
  chain length); per-iter = (t_k2 - t_k1) / (k2 - k1).

Differencing cancels the constant fetch + dispatch overhead; donation
lets XLA alias the 4.3 GB input planes into the output.  Also measures
the no-donation variant to quantify the streaming tax.

Run on an IDLE host: python scripts/probe_1024_r5.py
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

from regent_fft_tpu.plan import PlanSpec, _build_core
from regent_fft_tpu.dtypes import Direction, Kind, Norm

N = 1024


def gen_fn(seed):
    i = jax.lax.broadcasted_iota(jnp.uint32, (N, N, N), 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, (N, N, N), 2)
    h = (i * jnp.uint32(2654435761) ^ (j + seed) * jnp.uint32(40503))
    f = (h >> 16).astype(jnp.float32) / 32768.0 - 1.0
    g = ((h & jnp.uint32(0xffff)).astype(jnp.float32) / 32768.0 - 1.0)
    return f.astype(jnp.bfloat16), g.astype(jnp.bfloat16)


def main():
    spec = PlanSpec(shape=(N, N, N), axes=(0, 1, 2), kind=Kind.C2C,
                    direction=Direction.FORWARD, norm=Norm.ORTHO,
                    dtype="complex32")
    core = _build_core(spec)
    gen = jax.jit(gen_fn)

    # small-shape accuracy check of the ortho chain first
    sspec = PlanSpec(shape=(4, 256, 256), axes=(1, 2), kind=Kind.C2C,
                     direction=Direction.FORWARD, norm=Norm.ORTHO,
                     dtype="complex32")
    score = _build_core(sspec)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 256, 256)).astype(np.float32)
    b = rng.standard_normal((4, 256, 256)).astype(np.float32)
    yr, yi = jax.jit(score)(jnp.asarray(a, jnp.bfloat16),
                            jnp.asarray(b, jnp.bfloat16))
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    ref = np.fft.fftn(a.astype(np.complex128) + 1j * b, axes=(1, 2),
                      norm="ortho")
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    print(f"ortho c32 small-shape rel err: {err:.2e}", flush=True)
    assert err < 2e-2

    def chain_time(f, k, seed, reps=3):
        ts = []
        for r in range(reps):
            xr, xi = gen(jnp.uint32(seed + 97 * r))
            jax.block_until_ready((xr, xi))
            t0 = time.perf_counter()
            for _ in range(k):
                xr, xi = f(xr, xi)
            v = float(xr[0, 0, 0])
            ts.append(time.perf_counter() - t0)
            del xr, xi
        return min(ts), v

    for name, f in (("donated", jax.jit(lambda a_, b_: core(a_, b_),
                                        donate_argnums=(0, 1))),
                    ("no-donate", jax.jit(lambda a_, b_: core(a_, b_)))):
        try:
            t1, _ = chain_time(f, 2, 10)     # warm + short chain
            t1, _ = chain_time(f, 2, 20)
            t2, _ = chain_time(f, 7, 30)
            per = (t2 - t1) / 5
            print(f"{name}: k2=7 {t2*1e3:.1f} ms, k1=2 {t1*1e3:.1f} ms "
                  f"-> {per*1e3:.2f} ms/iter", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
