"""bf16 four-step 'hd' stage dots (r5): rescue the 1024-class leading
axis from the strided small-run floor.

At 1024^3 complex32 the axis-0 pass can use neither the single-pass DMA
ring (n*512 lanes exceeds the block envelope) nor fused2 (1024^2-element
planes), so it runs a grid butterfly reading 256-byte runs at 2 MB
stride — the measured ~174-225 GB/s small-run tier.  The four-step's two
wide-run passes were A/B'd at bf16 only PRE-fstw (r3: 157 vs 139 ms),
with stage dots paying f32-emulation MXU passes on bf16 data.  The 'hd'
scheme (h4 shared-rhs fold at DEFAULT precision, one native bf16 MXU
pass per dot — the fstw lesson applied to the four-step stages) plus
equal-BYTE (32 KB-run) bf16 slabs re-opens the question.

A/B here, whole-plan donated-chain differencing (the honest 1024^3
method, docs/tpu_notes.md r5):
  1. 1024^3 c32: axis0_impl='grid' (old auto) vs 'fourstep' (new auto).
  2. 256^3x4 + 512^3 c32: auto (single-pass ring) vs forced fourstep —
     does 'hd' flip the r3 ring-vs-fourstep verdict where the ring DOES
     fit?

Run on an IDLE host: python scripts/probe_a0fs_hd.py [small|big]
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


def gen_fn(shape):
    def f(seed):
        i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        j = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        h = (i * jnp.uint32(2654435761) ^ (j + seed) * jnp.uint32(40503))
        fr = (h >> 16).astype(jnp.float32) / 32768.0 - 1.0
        fi = ((h & jnp.uint32(0xffff)).astype(jnp.float32) / 32768.0 - 1.0)
        return fr.astype(jnp.bfloat16), fi.astype(jnp.bfloat16)
    return jax.jit(f)


def chain_per_iter(core, shape, k1=2, k2=7, reps=3):
    gen = gen_fn(shape)
    f = jax.jit(lambda a_, b_: core(a_, b_), donate_argnums=(0, 1))

    def chain_time(k, seed):
        ts = []
        for r in range(reps):
            xr, xi = gen(jnp.uint32(seed + 97 * r))
            jax.block_until_ready((xr, xi))
            t0 = time.perf_counter()
            for _ in range(k):
                xr, xi = f(xr, xi)
            _ = float(xr[(0,) * len(shape)])
            ts.append(time.perf_counter() - t0)
            del xr, xi
        return min(ts)

    chain_time(k1, 10)                       # warm
    t1 = chain_time(k1, 20)
    t2 = chain_time(k2, 30)
    return (t2 - t1) / (k2 - k1)


def accuracy(axis0_impl, shape=(512, 64, 1024)):
    """Forced-fourstep bf16 path vs numpy at complex32 tolerance."""
    spec = PlanSpec(shape=shape, axes=(0,), kind=Kind.C2C,
                    direction=Direction.FORWARD, norm=Norm.ORTHO,
                    dtype="complex32", axis0_impl=axis0_impl)
    core = _build_core(spec)
    rng = np.random.default_rng(0)
    a = rng.standard_normal(shape).astype(np.float32)
    b = rng.standard_normal(shape).astype(np.float32)
    yr, yi = jax.jit(core)(jnp.asarray(a, jnp.bfloat16),
                           jnp.asarray(b, jnp.bfloat16))
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    ref = np.fft.fft(a.astype(np.complex128) + 1j * b, axis=0, norm="ortho")
    return float(np.linalg.norm(got - ref) / np.linalg.norm(ref))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "small"):
        for impl in ("grid", "fourstep"):
            err = accuracy(impl)
            print(f"accuracy axis0={impl} (512,64,1024) c32: {err:.2e}",
                  flush=True)
            assert err < 2e-2, err

        # batch-LEADING 4x256^3 (post=64K — the layout the r4 ring
        # measurements used; trailing batch hits the pad-to-128 blowup).
        # 512^3 c32 already measured this session: auto(ring) 11.51 vs
        # forced fourstep-hd 7.77 ms.
        for shape, axes in (((4, 256, 256, 256), (1, 2, 3)),):
            for impl in ("auto", "fourstep"):
                spec = PlanSpec(shape=shape, axes=axes, kind=Kind.C2C,
                                direction=Direction.FORWARD, norm=Norm.ORTHO,
                                dtype="complex32", axis0_impl=impl)
                try:
                    per = chain_per_iter(_build_core(spec), shape)
                    print(f"{shape} c32 axis0={impl}: {per*1e3:.2f} ms/iter",
                          flush=True)
                except Exception as e:
                    print(f"{shape} c32 axis0={impl}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    if which in ("all", "big"):
        shape = (1024, 1024, 1024)
        for impl in ("grid", "fourstep"):
            spec = PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.C2C,
                            direction=Direction.FORWARD, norm=Norm.ORTHO,
                            dtype="complex32", axis0_impl=impl)
            try:
                per = chain_per_iter(_build_core(spec), shape)
                print(f"1024^3 c32 axis0={impl}: {per*1e3:.2f} ms/iter",
                      flush=True)
            except Exception as e:
                print(f"1024^3 axis0={impl}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
