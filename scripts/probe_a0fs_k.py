"""Ring-depth (REGENT_FFT_A0FS_K) sweep for the bf16 'hd' four-step.

The r3 f32 sweep settled on K=2 (docs/tpu_notes.md "a0fs ring-depth
sweep"), but bf16 slabs halve bytes per ring buffer, so deeper rings
now fit the same VMEM; with the 'hd' stage dots the passes are closer
to DMA-bound, where depth could matter.  Whole-plan donated-chain
differencing on the two flagship complex32 shapes.

Run on an IDLE host: python scripts/probe_a0fs_k.py [512|1024]
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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "auto":
        # _a0fs_k_auto validation: auto picks K=3 at 256/512-class
        # (measured faster) and K=2 at 1024^3 (K=3 cannot compile)
        for shape, axes in (((4, 256, 256, 256), (1, 2, 3)),
                            ((512, 512, 512), (0, 1, 2)),
                            ((1024, 1024, 1024), (0, 1, 2))):
            spec = PlanSpec(shape=shape, axes=axes, kind=Kind.C2C,
                            direction=Direction.FORWARD, norm=Norm.ORTHO,
                            dtype="complex32", axis0_impl="fourstep")
            per = chain_per_iter(_build_core(spec), shape)
            print(f"{shape} c32 fourstep K=auto: {per*1e3:.2f} ms/iter",
                  flush=True)
        return
    if which == "wa1024":
        # Wide-slab probe: force g=32 rows at 1024^3 (2x the budget
        # formula's grant).  A 32x1024 bf16 slab is a 1M-element block
        # — past the validated 512K bf16 envelope, so this probes the
        # envelope as much as the perf.
        shape = (1024, 1024, 1024)
        for wa, wb in ((32, 32), (32, 16)):
            os.environ["REGENT_FFT_A0FS_WA"] = str(wa)
            os.environ["REGENT_FFT_A0FS_WB"] = str(wb)
            spec = PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.C2C,
                            direction=Direction.FORWARD, norm=Norm.ORTHO,
                            dtype="complex32", axis0_impl="fourstep")
            try:
                per = chain_per_iter(_build_core(spec), shape)
                print(f"1024^3 c32 WA={wa} WB={wb}: {per*1e3:.2f} ms/iter",
                      flush=True)
            except Exception as e:
                print(f"1024^3 WA={wa} WB={wb}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        for v in ("REGENT_FFT_A0FS_WA", "REGENT_FFT_A0FS_WB"):
            os.environ.pop(v, None)
        return
    shapes = []
    if which in ("all", "512"):
        shapes.append((512, 512, 512))
    if which in ("all", "1024"):
        shapes.append((1024, 1024, 1024))
    for shape in shapes:
        for k in (2, 3, 4):
            os.environ["REGENT_FFT_A0FS_K"] = str(k)
            spec = PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.C2C,
                            direction=Direction.FORWARD, norm=Norm.ORTHO,
                            dtype="complex32", axis0_impl="fourstep")
            try:
                per = chain_per_iter(_build_core(spec), shape)
                print(f"{shape} c32 fourstep K={k}: {per*1e3:.2f} ms/iter",
                      flush=True)
            except Exception as e:
                print(f"{shape} c32 K={k}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
    os.environ.pop("REGENT_FFT_A0FS_K", None)


if __name__ == "__main__":
    main()
