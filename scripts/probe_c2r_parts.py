#!/usr/bin/env python
"""Attribute the 3-D c2r plan's time (256^3x4): pack vs mids vs kernel.

  full     the C2R plan via time_plan (core_chain glue)
  nopack   _pack_nyquist replaced by a plain slice (skips rev+concat)
  kern     the packed c2r kernel pass alone ((4*256*256, 128) -> 256)
  r2ckern  the packed r2c kernel pass alone (for symmetry comparison)
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
    from regent_fft_tpu.plan import PlanSpec, make_plan
    from regent_fft_tpu import plan as plan_mod
    from regent_fft_tpu.ops import pallas_stockham as ps

    iters = int(os.environ.get("PROBE_ITERS", "4"))
    shape = (4, 256, 256, 256)
    spec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.C2R,
                    direction=Direction.BACKWARD, norm=Norm.NONE,
                    use_3m=True)

    def out(name, t):
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 3)}),
              flush=True)

    def want(name):
        return only is None or name in only

    if want("full"):
        out("full", timing.time_plan(make_plan(spec), iters=iters, reps=3))

    if want("nopack"):
        orig = plan_mod._pack_nyquist
        plan_mod._pack_nyquist = lambda xr, xi, axes: (xr[..., :-1],
                                                       xi[..., :-1])
        try:
            plan_mod.clear_plan_cache()
            out("nopack", timing.time_plan(make_plan(spec), iters=iters,
                                           reps=3))
        finally:
            plan_mod._pack_nyquist = orig
            plan_mod.clear_plan_cache()

    if want("kern") or want("r2ckern"):
        rows = 4 * 256 * 256
        m = 128

        def mk_half(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, (rows, m), jnp.float32),
                    jax.random.normal(ki, (rows, m), jnp.float32))

        if want("kern"):
            def step(c):
                y = ps.ifft_last_c2r_stockham(c[0], c[1], 256, packed=True)
                bump = jnp.sum(y[:, :1]) * 1e-30
                return (c[0] + bump, c[1])
            out("kern", timing.time_chain(step, mk_half, iters, 2, 100))

        if want("r2ckern"):
            def mk_real(seed):
                kr, ki = jax.random.split(jax.random.PRNGKey(seed))
                return (jax.random.normal(kr, (rows, 256), jnp.float32),
                        jax.random.normal(ki, (rows, m), jnp.float32))

            def step2(c):
                yr, yi = ps.fft_last_r2c_stockham(c[0], packed=True)
                bump = (jnp.sum(yr[:, :1]) + jnp.sum(yi[:, :1])) * 1e-30
                return (c[0] + bump, c[1])
            out("r2ckern", timing.time_chain(step2, mk_real, iters, 2, 100))




def padded_variants():
    """Time c2r AND r2c with the Nyquist-packed path disabled (lane-
    padded mids instead): is the pack/unpack pass eating the packed
    path's halved mid-pass traffic?"""
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from regent_fft_tpu.utils import timing
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, make_plan
    from regent_fft_tpu import plan as plan_mod

    iters = int(os.environ.get("PROBE_ITERS", "4"))
    shape = (4, 256, 256, 256)
    cspec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.C2R,
                     direction=Direction.BACKWARD, norm=Norm.NONE,
                     use_3m=True)
    rspec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.R2C,
                     direction=Direction.FORWARD, norm=Norm.NONE,
                     use_3m=True)
    orig = plan_mod._packed_real_ok
    plan_mod._packed_real_ok = lambda n_r: False
    try:
        plan_mod.clear_plan_cache()
        for name, spec in (("c2r_padded", cspec), ("r2c_padded", rspec)):
            t = timing.time_plan(make_plan(spec), iters=iters, reps=3)
            print(json.dumps({"probe": name, "ms": round(t * 1e3, 3)}),
                  flush=True)
    finally:
        plan_mod._packed_real_ok = orig
        plan_mod.clear_plan_cache()


if __name__ == "__main__":
    if "padded" in sys.argv[1:]:
        padded_variants()
    else:
        main()
