#!/usr/bin/env python
"""Single-process c32 (bf16-plane) pass breakdown at 256^3x4.

Times, with the SAME honest timer in one process:
  plan32   full complex32 plan core (fused2 + axis-1)
  f2b      fft_axes2_stockham on bf16 planes
  f2f      fft_axes2_stockham on f32 planes (reference)
  axb      fft_axis_dma on bf16 planes
  plan64   full complex64 plan core
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    only = sys.argv[1:] or None
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from regent_fft_tpu.utils import timing
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, _build_core
    from regent_fft_tpu.ops import pallas_stockham as ps

    shape = (4, 256, 256, 256)
    iters = int(os.environ.get("PROBE_ITERS", "4"))

    def timeit(name, fn2, dt):
        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32).astype(dt),
                    jax.random.normal(ki, shape, jnp.float32).astype(dt))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 3)}),
              flush=True)

    spec32 = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.C2C,
                      direction=Direction.FORWARD, norm=Norm.NONE,
                      dtype="complex32")
    spec64 = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.C2C,
                      direction=Direction.FORWARD, norm=Norm.NONE,
                      use_3m=True)
    cases = {
        "plan32": (lambda: _build_core(spec32), jnp.bfloat16),
        "f2b": (lambda: (lambda a, b: ps.fft_axes2_stockham(
            a, b, Direction.FORWARD)), jnp.bfloat16),
        "f2f": (lambda: (lambda a, b: ps.fft_axes2_stockham(
            a, b, Direction.FORWARD)), jnp.float32),
        "axb": (lambda: (lambda a, b: ps.fft_axis_dma(
            a, b, 1, Direction.FORWARD)), jnp.bfloat16),
        "f2rb": (lambda: (lambda a, b: ps.fft_axes2_ring(
            a, b, Direction.FORWARD)), jnp.bfloat16),
        "f2rf": (lambda: (lambda a, b: ps.fft_axes2_ring(
            a, b, Direction.FORWARD)), jnp.float32),
        "plan64": (lambda: _build_core(spec64), jnp.float32),
    }
    for name, (mk, dt) in cases.items():
        if only and name not in only:
            continue
        timeit(name, mk(), dt)


if __name__ == "__main__":
    main()
