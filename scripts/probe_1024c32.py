"""A/B the 1024^3 complex32 plan's axis-0 implementation on hardware.

The auto plan runs three plain grid butterflies (fused2 blocks exceed
the Mosaic envelope at 1024^2, the DMA ring's 512-lane columns exceed
it at n*512, and bf16 is gated out of the four-step by the 256^3
measurement) — so the leading-axis pass sits on the strided-gather
floor.  This probe measures whole-plan time per impl with the bench's
paired single-dispatch method (the chained timer OOMs at 8 GB planes).

Usage: python scripts/probe_1024c32.py [auto|fourstep|dma|grid]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

impl = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["REGENT_FFT_AXIS0_IMPL"] = impl

import jax
import jax.numpy as jnp

from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.plan import PlanSpec, _build_core

n = 1024
spec = PlanSpec(shape=(n, n, n), axes=(0, 1, 2), kind=Kind.C2C,
                direction=Direction.FORWARD, norm=Norm.NONE,
                dtype="complex32")
core = _build_core(spec)


def gen(seed):
    i = jax.lax.broadcasted_iota(jnp.uint32, (n, n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, (n, n, n), 2)
    h = (i * jnp.uint32(2654435761) ^ (j + seed) * jnp.uint32(40503))
    f = (h >> 16).astype(jnp.float32) / 32768.0 - 1.0
    g = ((h & jnp.uint32(0xffff)).astype(jnp.float32) / 32768.0 - 1.0)
    return f.astype(jnp.bfloat16), g.astype(jnp.bfloat16)


@jax.jit
def once(seed):
    xr, xi = jax.lax.optimization_barrier(gen(seed))
    yr, yi = core(xr, xi)
    return yr[0, 0, :1], yi[0, 0, :1]


@jax.jit
def gen_only(seed):
    xr, xi = jax.lax.optimization_barrier(gen(seed))
    return xr[0, 0, :1], xi[0, 0, :1]


def timed(fn, seeds):
    ts = []
    for s in seeds:
        t0 = time.perf_counter()
        float(fn(jnp.uint32(s))[0][0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


timed(once, [1])
timed(gen_only, [2])
t = timed(once, [10, 11, 12]) - timed(gen_only, [20, 21, 22])
print(f"impl={impl}: 1024^3 c32 full plan {t * 1e3:.2f} ms")
