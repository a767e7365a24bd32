#!/usr/bin/env python
"""Can fused2 run its MXU tails at the b32 scheme with a raised
scoped-VMEM limit?  (r3 finding: b32 at 512^2 blocks overflows the 16M
stack by 3.4M with strips lane-clamped at 4 — this probes
vmem_limit_bytes as the escape.)  Times the standalone 512^3 fused2
pass: highest (baseline ~9.6 ms) vs b32 at 32/64 MB limits, plus
accuracy on a small block.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    ("highest", {}),
    ("b32_v32", {"REGENT_FFT_TAIL_PREC": "b32",
                 "REGENT_FFT_F2_VMEM_MB": "32"}),
    ("b32_v64", {"REGENT_FFT_TAIL_PREC": "b32",
                 "REGENT_FFT_F2_VMEM_MB": "64"}),
    ("b32_v96", {"REGENT_FFT_TAIL_PREC": "b32",
                 "REGENT_FFT_F2_VMEM_MB": "96"}),
]


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from regent_fft_tpu.utils import timing
    from regent_fft_tpu.dtypes import Direction
    from regent_fft_tpu.ops import pallas_stockham as ps

    iters = int(os.environ.get("PROBE_ITERS", "4"))
    shape = (512, 512, 512)

    def set_env(env):
        for k in ("REGENT_FFT_TAIL_PREC", "REGENT_FFT_F2_VMEM_MB"):
            os.environ.pop(k, None)
        os.environ.update(env)

    for name, env in VARIANTS:
        set_env(env)
        try:
            # accuracy gate on a small shape vs numpy f64
            rng = np.random.default_rng(0)
            sr = rng.standard_normal((4, 512, 512)).astype(np.float32)
            si = rng.standard_normal((4, 512, 512)).astype(np.float32)
            gr, gi = jax.jit(lambda a, b: ps.fft_axes2_stockham(
                a, b, Direction.FORWARD))(jnp.asarray(sr), jnp.asarray(si))
            got = (np.asarray(gr).astype(np.complex128)
                   + 1j * np.asarray(gi))
            ref = np.fft.fft2(sr.astype(np.float64)
                              + 1j * si.astype(np.float64), axes=(1, 2))
            err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))

            def step(c):
                return ps.fft_axes2_stockham(c[0], c[1], Direction.FORWARD)

            def make_carry(seed):
                kr, ki = jax.random.split(jax.random.PRNGKey(seed))
                return (jax.random.normal(kr, shape, jnp.float32),
                        jax.random.normal(ki, shape, jnp.float32))
            t = timing.time_chain(step, make_carry, iters, 2, 100)
            print(json.dumps({"probe": name, "ms": round(t * 1e3, 3),
                              "rel_err": err}), flush=True)
        except Exception as e:
            print(json.dumps({"probe": name,
                              "failed": repr(e)[:200]}), flush=True)
    set_env({})


if __name__ == "__main__":
    main()
