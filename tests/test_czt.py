"""Chirp-z transform / zoom FFT vs scipy.signal."""
import numpy as np
import pytest
from scipy import signal as ssig

from regent_fft_tpu import CZT, ZoomFFT, czt, zoom_fft

RNG = np.random.default_rng(17)


def _rel(got, ref):
    return np.linalg.norm(np.asarray(got) - ref) / np.linalg.norm(ref)


@pytest.mark.parametrize("n,m", [(50, 50), (37, 64), (128, 33)])
def test_czt_default_w(n, m):
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    got = czt(x, m)
    ref = ssig.czt(x.astype(np.complex128), m)
    assert _rel(got, ref) < 1e-5


def test_czt_equals_fft():
    x = (RNG.standard_normal(64) + 1j * RNG.standard_normal(64)).astype(np.complex64)
    assert _rel(czt(x), np.fft.fft(x.astype(np.complex128))) < 1e-5


def test_czt_spiral_and_axis():
    n, m = 40, 25
    w = np.exp(-2j * np.pi / 97) * 1.0  # off-grid unit-modulus spiral
    a = np.exp(2j * np.pi * 0.13)
    x = (RNG.standard_normal((3, n)) + 1j * RNG.standard_normal((3, n))).astype(np.complex64)
    got = czt(x, m, w, a, axis=1)
    ref = ssig.czt(x.astype(np.complex128), m, w, a, axis=1)
    assert got.shape == ref.shape
    assert _rel(got, ref) < 1e-5
    # real input
    xr = RNG.standard_normal(n).astype(np.float32)
    assert _rel(czt(xr, m, w, a), ssig.czt(xr.astype(np.float64), m, w, a)) < 1e-5


def test_czt_plan_reuse():
    plan = CZT(48, 20)
    x = (RNG.standard_normal(48) + 1j * RNG.standard_normal(48)).astype(np.complex64)
    y1 = plan(x)
    ref = ssig.CZT(48, 20)(x.astype(np.complex128))
    assert _rel(y1, ref) < 1e-5
    with pytest.raises(ValueError, match="length"):
        plan(np.zeros(47, np.complex64))


@pytest.mark.parametrize("endpoint", [False, True])
def test_zoom_fft(endpoint):
    n, m = 100, 31
    x = RNG.standard_normal(n).astype(np.float32)
    got = zoom_fft(x, [0.1, 0.4], m, fs=2, endpoint=endpoint)
    ref = ssig.zoom_fft(x.astype(np.float64), [0.1, 0.4], m, fs=2,
                        endpoint=endpoint)
    assert _rel(got, ref) < 1e-5


def test_zoom_fft_scalar_fn_matches_fft_prefix():
    x = RNG.standard_normal(64).astype(np.float32)
    got = zoom_fft(x, 2, fs=2)  # full band = plain FFT
    ref = np.fft.fft(x.astype(np.float64))
    assert _rel(got, ref) < 1e-5


def test_czt_overflow_raises_clearly():
    # |w| != 1 spirals overflow the f32 chirp tables at moderate sizes;
    # scipy (f64) handles them — we raise instead of returning NaN.
    x = RNG.standard_normal(80).astype(np.float32)
    with pytest.raises(ValueError, match="overflow"):
        czt(x, 80, w=0.95)


def test_czt_off_unit_small_spiral():
    # mild off-unit spirals stay within f32 range and track scipy
    n, m, w = 32, 32, 0.99
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    got = czt(x, m, w)
    ref = ssig.czt(x.astype(np.complex128), m, w)
    assert _rel(got, ref) < 5e-3


def test_czt_no_retrace_on_reuse():
    import jax
    plan = CZT(64, 64)
    x = (RNG.standard_normal((2, 64))
         + 1j * RNG.standard_normal((2, 64))).astype(np.complex64)
    plan(x)
    fn = plan._jitted[(2, 1)]
    traces0 = fn._cache_size()
    for _ in range(3):
        plan(x)
    assert fn._cache_size() == traces0  # no retraces on reuse
