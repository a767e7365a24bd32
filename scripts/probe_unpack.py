#!/usr/bin/env python
"""How much of the 3-D r2c plan is the _unpack_nyquist lane-misaligned
concat?  Times the full 256^3x4 r2c core vs the same pipeline with the
unpack replaced by a lane-0 sum bump (same compute, no 128->129 concat
relayout)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    from regent_fft_tpu import plan as plan_mod

    shape = (4, 256, 256, 256)
    spec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.R2C,
                    direction=Direction.FORWARD, norm=Norm.NONE, use_3m=True)
    iters = int(os.environ.get("PROBE_ITERS", "4"))

    def run(name, core):
        def step(c):
            yr, yi = core(c[0])
            bump = (jnp.sum(yr) + jnp.sum(yi)) * 1e-30
            return (c[0] + bump.astype(c[0].dtype), c[1])

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32),
                    jax.random.normal(ki, shape, jnp.float32))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 3)}),
              flush=True)

    run("r2c3d_full", _build_core(spec))

    orig = plan_mod._unpack_nyquist

    def no_unpack(yr, yi, axes):
        # same data consumed, no concat: sums force lane-0 compute
        return yr + (jnp.sum(yi[..., :1]) * 1e-30), yi
    plan_mod._unpack_nyquist = no_unpack
    try:
        run("r2c3d_no_unpack", _build_core(spec))
    finally:
        plan_mod._unpack_nyquist = orig


if __name__ == "__main__":
    main()
