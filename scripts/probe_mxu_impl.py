#!/usr/bin/env python
"""Race the bf16 four-step MXU tile schemes (REGENT_FFT_MXU_IMPL) on
hardware at n=1024 — the one length the complex32 path reaches them
(direct covers n <= 512).

  fourstep  3M Karatsuba dots + full-element VPU twiddle (r3 baseline)
  fs4m      4M shared-rhs folds; no Karatsuba combines, VPU twiddle
  fstw      fs4m stage 1 + twiddle folded into a k1-batched stage-2 dot
            (one (n1,n2,v)->(n2,n1,v) transpose instead of the twiddle)

Rows: 1-D last-axis (32768, 1024) and mid-axis (256, 1024, 256), both
complex32 — proxies for the 1024^3 passes (all of which are
compute-bound at ~34 ps/element, docs/tpu_notes.md).  Accuracy vs
numpy f64 on a small block guards each variant.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMPLS = ("fourstep", "fs4m", "fstw")


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, destroy_plan, make_plan
    from regent_fft_tpu.utils import timing

    iters = int(os.environ.get("PROBE_ITERS", "6"))
    rows = [
        ("1d_last_32768x1024", PlanSpec(
            shape=(32768, 1024), axes=(1,), kind=Kind.C2C,
            direction=Direction.FORWARD, norm=Norm.NONE,
            dtype="complex32")),
        ("mid_256x1024x256", PlanSpec(
            shape=(256, 1024, 256), axes=(1,), kind=Kind.C2C,
            direction=Direction.FORWARD, norm=Norm.NONE,
            dtype="complex32")),
    ]
    out = {}
    for impl in IMPLS:
        os.environ["REGENT_FFT_MXU_IMPL"] = impl
        res = {}
        # accuracy guard: small shape through the real kernel path
        rng = np.random.default_rng(0)
        import jax.numpy as jnp
        spec_a = PlanSpec(shape=(512, 1024), axes=(1,), kind=Kind.C2C,
                          direction=Direction.FORWARD, norm=Norm.NONE,
                          dtype="complex32")
        pa = make_plan(spec_a)
        xr = rng.standard_normal((512, 1024)).astype(np.float32)
        xi = rng.standard_normal((512, 1024)).astype(np.float32)
        from regent_fft_tpu.dtypes import SplitComplex
        y = pa(SplitComplex(jnp.asarray(xr, jnp.bfloat16),
                            jnp.asarray(xi, jnp.bfloat16)))
        got = (np.asarray(y.re.astype(jnp.float32)).astype(np.complex128)
               + 1j * np.asarray(y.im.astype(jnp.float32)))
        xbf = (np.asarray(jnp.asarray(xr, jnp.bfloat16).astype(jnp.float32))
               .astype(np.float64)
               + 1j * np.asarray(jnp.asarray(xi, jnp.bfloat16)
                                 .astype(jnp.float32)))
        ref = np.fft.fft(xbf, axis=1)
        res["rel_err"] = float(np.abs(got - ref).max()
                               / np.abs(ref).max())
        for name, spec in rows:
            plan = make_plan(spec)
            t = timing.time_plan(plan, iters=iters, reps=3)
            res[name] = round(t * 1e3, 3)
            destroy_plan(plan)  # plans cache by spec; env must re-trace
        destroy_plan(pa)
        out[impl] = res
        print(json.dumps({impl: res}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
