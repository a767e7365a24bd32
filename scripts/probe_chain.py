#!/usr/bin/env python
"""A/B the R2C timing-chain glue designs at the 256^3x4 suite shape.

Variants (env CHAIN_VARIANT):
  concat   round-2 design: slice half planes + lane-misaligned concat
  barrier  optimization_barrier + full-array x+bump add
  dus      optimization_barrier + 1-element dynamic-update-slice bump
  sum      full-output jnp.sum bump (no barrier; write may be elided)
  probe    [..., :1] column-sum bump (no barrier; unpack may be narrowed)

Each run is one process (compile caching is per program anyway).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    variant = os.environ.get("CHAIN_VARIANT", "dus")
    import jax
    import jax.numpy as jnp
    from regent_fft_tpu.utils import timing
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, _build_core

    shape = (4, 256, 256, 256)
    spec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.R2C,
                    direction=Direction.FORWARD, norm=Norm.NONE, use_3m=True)
    core = _build_core(spec)
    n = shape[-1]

    def make_carry(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), shape,
                                 jnp.float32)

    if variant == "concat":
        def step(x):
            yr, yi = core(x)
            a = jax.lax.slice_in_dim(yr, 0, (n + 1) // 2, axis=3)
            b = jax.lax.slice_in_dim(yi, 0, n // 2, axis=3)
            return jnp.concatenate([a, b], axis=3)
    elif variant == "barrier":
        def step(x):
            yr, yi = core(x)
            yr, yi = jax.lax.optimization_barrier((yr, yi))
            bump = (yr[0, 0, 0, 0] + yi[0, 0, 0, 0]) * jnp.float32(1e-30)
            return x + bump
    elif variant == "dus":
        def step(x):
            yr, yi = core(x)
            yr, yi = jax.lax.optimization_barrier((yr, yi))
            bump = (yr[0, 0, 0, 0] + yi[0, 0, 0, 0]) * jnp.float32(1e-30)
            return x.at[0, 0, 0, 0].add(bump)
    elif variant == "sum":
        def step(x):
            yr, yi = core(x)
            bump = (jnp.sum(yr) + jnp.sum(yi)) * jnp.float32(1e-30)
            return x.at[0, 0, 0, 0].add(bump)
    elif variant == "probe":
        def step(x):
            yr, yi = core(x)
            bump = (jnp.sum(yr[..., :1]) + jnp.sum(yi[..., :1])) \
                * jnp.float32(1e-30)
            return x.at[0, 0, 0, 0].add(bump)
    else:
        raise SystemExit(f"unknown variant {variant}")

    t = timing.time_chain(step, make_carry, 4, 2, 100)
    print(json.dumps({"variant": variant, "ms": round(t * 1e3, 3)}))


if __name__ == "__main__":
    main()
