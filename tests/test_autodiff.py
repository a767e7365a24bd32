"""Differentiability: the transform core is pure jnp, so jvp/vjp/grad flow
through — capability the FFTW/cuFFT-wrapping reference cannot offer."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import regent_fft_tpu as rft
from regent_fft_tpu.ops.stockham import build_c2c_1d
from regent_fft_tpu.dtypes import Direction


def test_grad_through_fft_core():
    n = 32
    fn = build_c2c_1d(n, Direction.FORWARD)

    def loss(xr, xi):
        yr, yi = fn(xr, xi)
        return jnp.sum(yr ** 2 + yi ** 2)

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    gr, gi = jax.grad(loss, argnums=(0, 1))(xr, xi)
    # Parseval: sum |X|^2 = n * sum |x|^2, so d/dx = 2n*x.
    np.testing.assert_allclose(np.asarray(gr), 2 * n * np.asarray(xr), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gi), 2 * n * np.asarray(xi), rtol=1e-4)


def test_jit_vmap_compose():
    fn = build_c2c_1d(16, Direction.FORWARD)
    f1 = lambda xr, xi: fn(xr[None], xi[None])
    v = jax.jit(jax.vmap(f1))
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    yr, yi = v(xr, jnp.zeros_like(xr))
    ref = np.fft.fft(np.asarray(xr))
    got = np.asarray(yr[:, 0]) + 1j * np.asarray(yi[:, 0])
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


def test_fftshift_splitcomplex():
    from regent_fft_tpu.dtypes import SplitComplex
    x = np.arange(8).astype(np.float32)
    s = SplitComplex(jnp.asarray(x), jnp.asarray(-x))
    out = rft.fftshift(s)
    np.testing.assert_array_equal(np.asarray(out.re), np.fft.fftshift(x))
    np.testing.assert_array_equal(np.asarray(out.im), np.fft.fftshift(-x))


def test_plan_benchmark_smoke():
    p = rft.make_plan((4, 64), axes=(1,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    res = p.benchmark(iters=1)
    assert res["time_s"] > 0 and res["gflops_convention"] > 0


def test_plan_benchmark_profile_trace(tmp_path):
    """profile_dir wraps the timed run in jax.profiler.trace (the
    SURVEY-named tracing hook); artifacts must land on disk."""
    import os
    p = rft.make_plan((4, 64), axes=(1,), kind=rft.Kind.C2C,
                      direction=rft.FORWARD)
    res = p.benchmark(iters=1, profile_dir=str(tmp_path))
    assert res["time_s"] > 0
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found, "profiler trace produced no artifacts"
