#!/usr/bin/env python
"""Headline benchmark: single-chip 3-D complex64 C2C FFT.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N}

* value: GFLOP/s by the FFTW libbench2 convention 5*N*log2(N)/t
  (/root/reference/fftw-3.3.8/libbench2/mflops.c:22-23).
* vs_baseline: speedup vs XLA's built-in jnp.fft.fftn measured in the SAME
  run on the SAME chip (the reference publishes no numbers — BASELINE.md).

Timing methodology (docs/tpu_notes.md): scan-chained iterations inside one
dispatch, fresh DEVICE-generated inputs per rep (attach tunnels memoize
identical executions and transfer slowly), timed to a value fetch
(block_until_ready can acknowledge on enqueue).

Accuracy gates: a small host-side float64 golden check anchors absolute
accuracy; the full-size output is compared on-device against XLA's fftn
(itself ~3.6e-7 vs f64) so no large buffers cross the host boundary.

Usage: python bench.py [--size 512] [--iters 6]
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np


def _timed_chain(fn2, shape, iters: int, reps: int = 3, seed0: int = 100):
    """Honest seconds/iteration: see module docstring."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(a, b):
        def body(c, _):
            return fn2(*c), None
        out, _ = jax.lax.scan(body, (a, b), None, length=iters)
        return out

    @jax.jit
    def mkinput(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.normal(kr, shape, jnp.float32),
                jax.random.normal(ki, shape, jnp.float32))

    a, b = mkinput(seed0)
    out = many(a, b)
    jax.block_until_ready(out)
    _ = float(out[0].ravel()[0])  # warm fetch path
    best = float("inf")
    for i in range(reps):
        a, b = mkinput(seed0 + 1 + i)
        jax.block_until_ready((a, b))
        _ = float(a.ravel()[0])
        t0 = time.perf_counter()
        out = many(a, b)
        _ = float(out[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_3d_c2c(size: int, iters: int, precision: str = "highest"):
    import jax
    import jax.numpy as jnp
    from regent_fft_tpu.plan import PlanSpec, _build_core
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.utils import flopcount

    shape = (size, size, size)
    n = size ** 3
    # 3M (Karatsuba) complex products: ~5% faster at HIGHEST with error
    # still ~1.5e-7 — ties XLA's fftn at 256^3 and beats it 1.5x at 512^3.
    spec = PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.C2C,
                    direction=Direction.FORWARD, norm=Norm.NONE,
                    precision=precision, use_3m=True)
    core = _build_core(spec)

    def xla_fftn_pair(a, b):
        z = jnp.fft.fftn(jax.lax.complex(a, b))
        return jnp.real(z), jnp.imag(z)

    # --- accuracy gate 1: small host-side float64 golden check ---
    rng = np.random.default_rng(0)
    small = (64, 64, 64)
    sr = rng.standard_normal(small).astype(np.float32)
    si = rng.standard_normal(small).astype(np.float32)
    small_spec = PlanSpec(shape=small, axes=(0, 1, 2), kind=Kind.C2C,
                          direction=Direction.FORWARD, norm=Norm.NONE,
                          precision=precision, use_3m=True)
    gr, gi = jax.jit(_build_core(small_spec))(jnp.asarray(sr), jnp.asarray(si))
    got = np.asarray(gr).astype(np.complex128) + 1j * np.asarray(gi)
    ref = np.fft.fftn(sr.astype(np.float64) + 1j * si.astype(np.float64))
    rel_f64 = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    assert rel_f64 < 1e-5, f"f64 golden check failed: {rel_f64}"

    # --- accuracy gate 2: full size, on-device, vs XLA's fftn ---
    @jax.jit
    def relcheck(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        a = jax.random.normal(kr, shape, jnp.float32)
        b = jax.random.normal(ki, shape, jnp.float32)
        yr, yi = core(a, b)
        zr, zi = xla_fftn_pair(a, b)
        num = jnp.sqrt(jnp.sum((yr - zr) ** 2 + (yi - zi) ** 2))
        den = jnp.sqrt(jnp.sum(zr ** 2 + zi ** 2))
        return num / den
    rel_xla = float(relcheck(7))
    assert rel_xla < 1e-5, f"cross-check vs XLA fftn failed: {rel_xla}"

    t_ours = _timed_chain(core, shape, iters)
    t_xla = _timed_chain(xla_fftn_pair, shape, iters)

    gflops = 5.0 * n * math.log2(n) / t_ours / 1e9
    gflops_xla = 5.0 * n * math.log2(n) / t_xla / 1e9
    hw = flopcount.detect_hardware()
    bytes_min = 2 * n * 8  # read + write complex64 once
    roofline_frac = (bytes_min / (hw.hbm_gbps * 1e9)) / t_ours
    return {
        "metric": f"3d_c2c_fft_{size}cubed_complex64_gflops",
        "value": round(gflops, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(gflops / gflops_xla, 3),
        "extra": {
            "time_ms": round(t_ours * 1e3, 3),
            "xla_fftn_ms": round(t_xla * 1e3, 3),
            "xla_fftn_gflops": round(gflops_xla, 1),
            "rel_err_vs_f64_64cubed": rel_f64,
            "rel_vs_xla_fftn_fullsize": rel_xla,
            "hbm_roofline_fraction_1pass": round(roofline_frac, 3),
            "device": str(hw.name),
            "precision": precision,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--precision", default="highest")
    args = ap.parse_args()
    res = bench_3d_c2c(args.size, args.iters, args.precision)
    extra = res.pop("extra")
    print(json.dumps(res))
    print(json.dumps({"detail": extra}), file=sys.stderr)


if __name__ == "__main__":
    main()
