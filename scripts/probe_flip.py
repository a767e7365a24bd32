#!/usr/bin/env python
"""Probe: is an in-kernel frequency reversal cheap on TPU Mosaic?

Strategies for reversing the second-minor (sublane) axis of an (n, tb)
f32 block inside a pallas kernel:
  flip     jnp.flip(x, axis=0)
  rev      jax.lax.rev(x, (0,))
  roll+T   reversal on the LANE axis of the (tb, n) input view, pre-T

Each is checked for correctness against numpy and timed standalone over
a (rows, n) operand the size of a 512^3 pass block stream.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "flip"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    tb = 128
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from regent_fft_tpu.utils import timing

    def kernel(x_ref, o_ref):
        x = x_ref[...].T  # (n, tb), freq on sublanes
        if which == "flip":
            y = jnp.flip(x, axis=0)
        elif which == "rev":
            y = jax.lax.rev(x, (0,))
        elif which == "lane":
            xl = x_ref[...]          # (tb, n), freq on lanes
            y = jnp.flip(xl, axis=1).T
        elif which == "gather":
            idx = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0)
            y = jnp.take_along_axis(x, (n - 1) - idx, axis=0)
        else:
            raise SystemExit(f"unknown {which}")
        o_ref[...] = y.T + x_ref[...]

    rows = 4096

    def run(x):
        bs = pl.BlockSpec((2 * tb, n), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(rows // (2 * tb),), in_specs=[bs], out_specs=bs,
            out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        )(x)

    rng = np.random.default_rng(0)
    xs = rng.standard_normal((rows, n)).astype(np.float32)
    got = np.asarray(jax.jit(run)(jnp.asarray(xs)))
    # kernel computes flip-over-sublanes-of-transpose = flip over lanes
    # of the (tb, n) row view, added back to x
    blocks = xs.reshape(-1, 2 * tb, n)
    ref = blocks[:, :, ::-1] + blocks
    ok = bool(np.array_equal(got.reshape(blocks.shape), ref))

    def step(c):
        return (run(c[0]), c[1])

    def make_carry(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        sh = (rows, n)
        return (jax.random.normal(kr, sh, jnp.float32),
                jax.random.normal(ki, sh, jnp.float32))

    t = timing.time_chain(step, make_carry, 4, 2, 100)
    print(json.dumps({"probe": which, "n": n, "exact": ok,
                      "ms": round(t * 1e3, 3)}))


if __name__ == "__main__":
    main()
