"""1-D core correctness: golden comparison vs float64 numpy across the
(size x direction x algorithm) matrix — the random-problem methodology of
FFTW's check.pl, with automated assertions the reference lacks."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from regent_fft_tpu.dtypes import Direction
from regent_fft_tpu.ops.stockham import build_c2c_1d
from regent_fft_tpu.utils.verify import tolerance

RNG = np.random.default_rng(42)


def run_1d(n, direction, batch=3, use_3m=False):
    x = RNG.standard_normal((batch, n)) + 1j * RNG.standard_normal((batch, n))
    fn = jax.jit(build_c2c_1d(n, direction, use_3m=use_3m))
    yr, yi = fn(jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x) if direction == Direction.FORWARD else np.fft.ifft(x) * n
    return np.linalg.norm(y - ref) / np.linalg.norm(ref)


# direct (<=128), mixed smooth, awkward smooth, bluestein primes
SIZES = [1, 2, 3, 4, 5, 7, 8, 16, 31, 97, 128,
         256, 1024, 120, 360, 1000, 4096,
         131, 509, 2011]


@pytest.mark.parametrize("n", SIZES)
def test_forward(n):
    assert run_1d(n, Direction.FORWARD) < tolerance(n)


@pytest.mark.parametrize("n", [8, 128, 1024, 360, 131])
def test_backward(n):
    assert run_1d(n, Direction.BACKWARD) < tolerance(n)


@pytest.mark.parametrize("n", [128, 1024, 360])
def test_3m_karatsuba(n):
    # 3M complex product trades a bit of accuracy for 25% fewer matmuls.
    assert run_1d(n, Direction.FORWARD, use_3m=True) < 4 * tolerance(n)


def test_batch_1():
    assert run_1d(1024, Direction.FORWARD, batch=1) < tolerance(1024)


def test_large_batch():
    assert run_1d(64, Direction.FORWARD, batch=257) < tolerance(64)


def test_bluestein_small_max_radix_terminates():
    # max_radix < 5 must not recurse: padding stays smooth w.r.t. the cap.
    x = RNG.standard_normal((2, 7)) + 1j * RNG.standard_normal((2, 7))
    fn = jax.jit(build_c2c_1d(7, Direction.FORWARD, max_radix=4))
    yr, yi = fn(jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(y - np.fft.fft(x)) / np.linalg.norm(np.fft.fft(x)) < tolerance(7)
