#!/usr/bin/env python
"""Round-3 hardware probes: gap-fused pass + flat-tile A/B at 512^3.

Each invocation measures ONE configuration (env vars are read at kernel
build time and runners are lru_cached, so configs must not share a
process):

  python scripts/probe_r3.py plan            # full 512^3 plan
  python scripts/probe_r3.py gap             # gap-fused (Z,X) pass alone
  python scripts/probe_r3.py fused2          # fused2 (Y,X) pass alone
  python scripts/probe_r3.py axis0           # axis-0 mid-kernel pass alone
  python scripts/probe_r3.py mid             # axis-1 (Y) pass alone

with REGENT_FFT_GAP_FUSED / REGENT_FFT_TILE_IMPL set by the caller.
All timings via the package honest timer (utils.timing.time_chain).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "plan"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    iters = int(os.environ.get("PROBE_ITERS", "4"))
    import jax
    import jax.numpy as jnp
    from regent_fft_tpu.utils import timing
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, _build_core
    from regent_fft_tpu.ops import pallas_stockham as ps

    shape = (size, size, size)

    if what == "plan":
        spec = PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.C2C,
                        direction=Direction.FORWARD, norm=Norm.NONE,
                        precision="highest", use_3m=True)
        fn2 = _build_core(spec)
    elif what == "gap":
        def fn2(a, b):
            return ps.fft_axes_gap_stockham(a, b, Direction.FORWARD)
    elif what == "fused2":
        def fn2(a, b):
            return ps.fft_axes2_stockham(a, b, Direction.FORWARD)
    elif what == "axis0":
        def fn2(a, b):
            return ps.fft_axis_stockham(a, b, 0, Direction.FORWARD)
    elif what == "mid":
        def fn2(a, b):
            return ps.fft_axis_stockham(a, b, 1, Direction.FORWARD)
    elif what == "last":
        def fn2(a, b):
            return ps.fft_axis_stockham(a, b, 2, Direction.FORWARD)
    elif what in ("r2c3d", "r2c1d", "c2c3d", "c2c1d", "c32"):
        if what.endswith("3d") or what == "c32":
            shape = (4, 256, 256, 256)
            axes = (1, 2, 3)
        else:
            shape = (4096, 1024)
            axes = (1,)
        kind = Kind.R2C if what.startswith("r2c") else Kind.C2C
        dt = "complex32" if what == "c32" else "complex64"
        spec = PlanSpec(shape=shape, axes=axes, kind=kind,
                        direction=Direction.FORWARD, norm=Norm.NONE,
                        use_3m=(dt != "complex32"), dtype=dt,
                        backend=os.environ.get("REGENT_FFT_PROBE_BACKEND",
                                               "auto"))
        core = _build_core(spec)
        if kind == Kind.R2C:
            def step(c):
                return core(c[0])[0], c[1]

            def make_carry(seed):
                kr, ki = jax.random.split(jax.random.PRNGKey(seed))
                return (jax.random.normal(kr, shape, jnp.float32),
                        jax.random.normal(ki, shape, jnp.float32))
            # r2c output (half) doesn't match input shape; chain by
            # returning the input-compatible carry: time via scan over
            # fresh inputs — reuse the r2 convention: carry the real
            # input, output discarded through an add-back.

            def step(c):
                yr, yi = core(c[0])
                # fold a cheap reduction of the output back into the
                # carry so the transform cannot be DCE'd
                bump = (jnp.sum(yr[..., :1]) + jnp.sum(yi[..., :1])) * 1e-30
                return (c[0] + bump.astype(c[0].dtype), c[1])
            t = timing.time_chain(step, make_carry, iters, 2, 100)
            out = {"probe": what, "ms": round(t * 1e3, 3),
                   "r2c_impl": os.environ.get("REGENT_FFT_R2C_IMPL",
                                              "shared")}
            print(json.dumps(out))
            return
        cdt = jnp.bfloat16 if dt == "complex32" else jnp.float32

        def fn2(a, b):
            return core(a, b)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32).astype(cdt),
                    jax.random.normal(ki, shape, jnp.float32).astype(cdt))

        def step(c):
            return fn2(*c)
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        out = {"probe": what, "ms": round(t * 1e3, 3), "dtype": dt}
        print(json.dumps(out))
        return
    elif what in ("c2r3d", "c2r1d"):
        # full C2R plan timing (pair vs shared kernel impls: set
        # REGENT_FFT_C2R_IMPL in the caller; one config per process)
        from regent_fft_tpu.plan import make_plan
        if what == "c2r3d":
            shape = (4, 256, 256, 256)
            axes = (1, 2, 3)
        else:
            shape = (4096, 1024)
            axes = (1,)
        spec = PlanSpec(shape=shape, axes=axes, kind=Kind.C2R,
                        direction=Direction.BACKWARD, norm=Norm.NONE,
                        use_3m=True)
        plan = make_plan(spec)
        t = timing.time_plan(plan, iters=iters, reps=3)
        print(json.dumps({"probe": what, "ms": round(t * 1e3, 3),
                          "c2r_impl": os.environ.get("REGENT_FFT_C2R_IMPL",
                                                     "shared")}))
        return
    elif what in ("c32f2", "c32ax", "c32last", "c32mid"):
        # complex32 (bf16-plane) pass breakdown at 256^3x4: fused2 block
        # kernel (c32f2), the axis-1 DMA ring (c32ax), or the single-axis
        # kernels (c32last/c32mid).
        shape = (4, 256, 256, 256)

        if what == "c32f2":
            def fn2(a, b):
                return ps.fft_axes2_stockham(a, b, Direction.FORWARD)
        elif what == "c32ax":
            def fn2(a, b):
                return ps.fft_axis_dma(a, b, 1, Direction.FORWARD)
        elif what == "c32last":
            def fn2(a, b):
                return ps.fft_axis_stockham(a, b, 3, Direction.FORWARD)
        else:
            def fn2(a, b):
                return ps.fft_axis_stockham(a, b, 2, Direction.FORWARD)

        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32)
                    .astype(jnp.bfloat16),
                    jax.random.normal(ki, shape, jnp.float32)
                    .astype(jnp.bfloat16))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        print(json.dumps({"probe": what, "ms": round(t * 1e3, 3)}))
        return
    elif what == "axis0dma":
        k = int(os.environ.get("PROBE_DMA_K", "4"))
        # correctness first (small)
        rng = np.random.default_rng(0)
        small = rng.standard_normal((256, 8, 512)).astype(np.float32) \
            + 1j * 0
        xr = jnp.asarray(np.real(small).astype(np.float32))
        xi = jnp.asarray(np.imag(small).astype(np.float32))
        yr, yi = jax.jit(lambda a, b: ps.fft_axis0_dma(
            a, b, Direction.FORWARD, k=k))(xr, xi)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(np.asarray(small, np.complex128), axis=0)
        rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        assert rel < 1e-5, rel

        def fn2(a, b):
            return ps.fft_axis0_dma(a, b, Direction.FORWARD, k=k)

        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32),
                    jax.random.normal(ki, shape, jnp.float32))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        print(json.dumps({"probe": what, "K": k, "ms": round(t * 1e3, 3),
                          "rel_small": rel}))
        return
    elif what in ("a0fsA", "a0fsB"):
        # one stage of the four-step ring alone (REGENT_FFT_A0FS_NOC=1
        # turns the compute off -> valid manual-DMA floor)
        k = int(os.environ.get("PROBE_DMA_K", "2"))
        n = size
        x = size
        mid = size
        r1, r2 = ps._a0fs_split(n)
        stage = "a" if what.endswith("A") else "b"
        r = r1 if stage == "a" else r2
        wv = ps._a0fs_g(r, x, mid, "REGENT_FFT_A0FS_W" + stage.upper(), k)
        nc = mid // wv
        run = ps._runner_a0fs(stage, n, r1, r2, wv, x, nc, 1, -1, k,
                              envkey=ps._env_key())
        in_shape = ((r1, r2, nc, wv, x) if stage == "a"
                    else (n, nc, wv, x))

        def fn2(a, b):
            yr, yi = run(a, b)
            return yr.reshape(in_shape), yi.reshape(in_shape)

        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, in_shape, jnp.float32),
                    jax.random.normal(ki, in_shape, jnp.float32))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        nbytes = n * mid * x * 4 * 2 * 2
        print(json.dumps({"probe": what, "K": k, "ms": round(t * 1e3, 3),
                          "w": wv, "gbps": round(nbytes / t / 1e9, 1),
                          "noc": os.environ.get("REGENT_FFT_A0FS_NOC", "0")}))
        return
    elif what == "fused2ring":
        # manual plane-ring fused trailing-pair pass vs the grid fused2
        k = int(os.environ.get("PROBE_DMA_K", "2"))
        rng = np.random.default_rng(0)
        small = rng.standard_normal((4, 128, 512)).astype(np.float32)
        smi = rng.standard_normal((4, 128, 512)).astype(np.float32)
        yr, yi = jax.jit(lambda a, b: ps.fft_axes2_ring(
            a, b, Direction.FORWARD, k=k))(jnp.asarray(small),
                                           jnp.asarray(smi))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft2(small.astype(np.complex128) + 1j * smi,
                          axes=(-2, -1))
        rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        assert rel < 1e-5, rel

        def fn2(a, b):
            return ps.fft_axes2_ring(a, b, Direction.FORWARD, k=k)

        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32),
                    jax.random.normal(ki, shape, jnp.float32))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        nbytes = size ** 3 * 4 * 2 * 2
        print(json.dumps({"probe": what, "K": k, "ms": round(t * 1e3, 3),
                          "rel_small": rel,
                          "gbps": round(nbytes / t / 1e9, 1)}))
        return
    elif what == "middma":
        # mid-axis (Y) ring in the NEW contiguous plane-slab mode:
        # post = size <= 2048 so each slab is a whole (n, x) plane =
        # one contiguous run
        k = int(os.environ.get("PROBE_DMA_K", "2"))
        rng = np.random.default_rng(0)
        small = rng.standard_normal((4, 128, 512)).astype(np.float32)
        smi = rng.standard_normal((4, 128, 512)).astype(np.float32)
        yr, yi = jax.jit(lambda a, b: ps.fft_axis_dma(
            a, b, 1, Direction.FORWARD, k=k))(jnp.asarray(small),
                                              jnp.asarray(smi))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(small.astype(np.complex128) + 1j * smi, axis=1)
        rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        assert rel < 1e-5, rel

        def fn2(a, b):
            return ps.fft_axis_dma(a, b, 1, Direction.FORWARD, k=k)

        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32),
                    jax.random.normal(ki, shape, jnp.float32))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        nbytes = size ** 3 * 4 * 2 * 2
        print(json.dumps({"probe": what, "K": k, "ms": round(t * 1e3, 3),
                          "rel_small": rel,
                          "gbps": round(nbytes / t / 1e9, 1)}))
        return
    elif what == "a0fs":
        k = int(os.environ.get("PROBE_DMA_K", "2"))
        # correctness first (small, on hardware)
        rng = np.random.default_rng(0)
        small = rng.standard_normal((256, 8, 512)).astype(np.float32)
        xr = jnp.asarray(small)
        xi = jnp.asarray(rng.standard_normal((256, 8, 512)).astype(np.float32))
        yr, yi = jax.jit(lambda a, b: ps.fft_axis0_fourstep(
            a, b, 0, Direction.FORWARD, k=k))(xr, xi)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(np.asarray(small, np.complex128)
                         + 1j * np.asarray(xi, np.complex128), axis=0)
        rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        assert rel < 1e-5, rel

        def fn2(a, b):
            return ps.fft_axis0_fourstep(a, b, 0, Direction.FORWARD, k=k)

        def step(c):
            return fn2(*c)

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32),
                    jax.random.normal(ki, shape, jnp.float32))
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        print(json.dumps({"probe": what, "K": k, "ms": round(t * 1e3, 3),
                          "rel_small": rel,
                          "wa": os.environ.get("REGENT_FFT_A0FS_WA", "auto"),
                          "wb": os.environ.get("REGENT_FFT_A0FS_WB", "auto"),
                          "strips": os.environ.get("REGENT_FFT_A0FS_STRIPS",
                                                   "auto")}))
        return
    elif what == "dmadeep":
        # K-deep manual DMA ring over the axis-0 strided-read pattern:
        # read (Z, X) slabs (rows 1 MB apart) into VMEM, write each back
        # to a CONTIGUOUS destination block — the (Z,Y,X)->(Y,Z,X)
        # transpose.  Tests whether deep DMA pipelining lifts the ~210
        # GB/s Mosaic gather floor (XLA's own transpose sustains ~670).
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        K = int(os.environ.get("PROBE_DMA_K", "8"))
        Z = Y = X = size

        def kernel(src_ref, dst_ref, vmem, insems, outsems):
            def start_in(slot, i):
                pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(i * X, X)], vmem.at[slot],
                    insems.at[slot]).start()

            for i in range(K):
                start_in(i, i)

            def body(i, _):
                slot = jax.lax.rem(i, K)
                pltpu.make_async_copy(
                    src_ref.at[:, pl.ds(i * X, X)], vmem.at[slot],
                    insems.at[slot]).wait()
                if os.environ.get("PROBE_DMA_OUT") == "strided":
                    out = pltpu.make_async_copy(
                        vmem.at[slot], dst_ref.at[:, pl.ds(i * X, X)],
                        outsems.at[slot])
                else:
                    out = pltpu.make_async_copy(
                        vmem.at[slot], dst_ref.at[pl.ds(i * Z, Z), :],
                        outsems.at[slot])
                out.start()
                out.wait()

                @pl.when(i + K < Y)
                def _():
                    start_in(slot, i + K)
                return 0

            jax.lax.fori_loop(0, Y, body, 0)

        def copy_one(a2):
            return pl.pallas_call(
                kernel,
                grid=(),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
                out_shape=jax.ShapeDtypeStruct(
                    (Z, Y * X) if os.environ.get("PROBE_DMA_OUT") == "strided"
                    else (Y * Z, X), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((K, Z, X), jnp.float32),
                    pltpu.SemaphoreType.DMA((K,)),
                    pltpu.SemaphoreType.DMA((K,)),
                ],
                compiler_params=pltpu.CompilerParams(has_side_effects=True),
            )(a2)

        def fn2(a, b):
            y0 = copy_one(a.reshape(Z, Y * X))
            return y0.reshape(shape), b

        def make_carry(seed):
            kr, ki = jax.random.split(jax.random.PRNGKey(seed))
            return (jax.random.normal(kr, shape, jnp.float32),
                    jax.random.normal(ki, shape, jnp.float32))

        def step(c):
            return fn2(*c)
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        nbytes = Z * Y * X * 4 * 2  # one read + one write of one plane
        print(json.dumps({"probe": what, "K": K, "ms": round(t * 1e3, 3),
                          "gbps": round(nbytes / t / 1e9, 1)}))
        return
    else:
        raise SystemExit(f"unknown probe {what}")

    def step(c):
        return fn2(*c)

    def make_carry(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.normal(kr, shape, jnp.float32),
                jax.random.normal(ki, shape, jnp.float32))

    t = timing.time_chain(step, make_carry, iters, 2, 100)
    out = {"probe": what, "size": size, "ms": round(t * 1e3, 3),
           "gap": os.environ.get("REGENT_FFT_GAP_FUSED", "0"),
           "tile": os.environ.get("REGENT_FFT_TILE_IMPL", "stacked")}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
