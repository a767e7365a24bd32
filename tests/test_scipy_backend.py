"""scipy.fft uarray backend adapter (``regent_fft_tpu.scipy_backend``).

The reference is itself consumed as an FFT engine behind a wrapper API
(``/root/reference/src/fft.rg:262``); scipy.fft's ``set_backend`` is the
ecosystem's standard slot for third-party engines (pyFFTW/cuFFT use it).
These tests drive REAL scipy.fft calls through the adapter and check
values against scipy's own pocketfft, plus the fallback contract:
anything the adapter declines must still produce scipy's answer.
"""
import numpy as np
import pytest
import scipy.fft as sfft

from regent_fft_tpu.scipy_backend import RegentFFTBackend

RNG = np.random.default_rng(42)


def _rel(got, ref):
    got = np.asarray(got, dtype=np.complex128)
    ref = np.asarray(ref, dtype=np.complex128)
    return np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)


def _c64(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)
            ).astype(np.complex64)


def _f32(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# complex family
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("fn", ["fft", "ifft"])
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_fft_ifft_match_scipy(fn, norm):
    x = _c64(4, 96)
    ref = getattr(sfft, fn)(x.astype(np.complex128), norm=norm)
    with sfft.set_backend(RegentFFTBackend):
        got = getattr(sfft, fn)(x, norm=norm)
    assert isinstance(got, np.ndarray) and got.dtype == np.complex64
    assert _rel(got, ref) < 1e-5


@pytest.mark.parametrize("fn", ["fft2", "ifft2", "fftn", "ifftn"])
def test_nd_complex_match_scipy(fn):
    x = _c64(3, 16, 32)
    ref = getattr(sfft, fn)(x.astype(np.complex128))
    with sfft.set_backend(RegentFFTBackend):
        got = getattr(sfft, fn)(x)
    assert _rel(got, ref) < 1e-5


def test_fft_n_and_axis_kwargs():
    x = _c64(5, 40)
    ref = sfft.fft(x.astype(np.complex128), n=64, axis=-1)
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.fft(x, n=64, axis=-1)
    assert got.shape == ref.shape
    assert _rel(got, ref) < 1e-5


# ---------------------------------------------------------------------------
# real family
# ---------------------------------------------------------------------------
def test_rfft_irfft_roundtrip_and_values():
    x = _f32(6, 64)
    ref = sfft.rfft(x.astype(np.float64))
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.rfft(x)
        back = sfft.irfft(got, n=64)
    assert got.shape == ref.shape and got.dtype == np.complex64
    assert _rel(got, ref) < 1e-5
    assert back.dtype == np.float32
    assert _rel(back, x) < 1e-5


def test_rfftn_hfft_match_scipy():
    x = _f32(4, 16, 32)
    ref = sfft.rfftn(x.astype(np.float64))
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.rfftn(x)
    assert _rel(got, ref) < 1e-5

    xc = _c64(4, 33)
    refh = sfft.hfft(xc.astype(np.complex128))
    with sfft.set_backend(RegentFFTBackend):
        goth = sfft.hfft(xc)
    assert _rel(goth, refh) < 1e-4


# ---------------------------------------------------------------------------
# r2r family
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("fn", ["dct", "idct", "dst", "idst"])
@pytest.mark.parametrize("typ", [1, 2, 3, 4])
def test_r2r_1d_match_scipy(fn, typ):
    x = _f32(3, 24)
    ref = getattr(sfft, fn)(x.astype(np.float64), type=typ)
    with sfft.set_backend(RegentFFTBackend):
        got = getattr(sfft, fn)(x, type=typ)
    assert got.dtype == np.float32
    assert _rel(got, ref) < 1e-4


def test_r2r_nd_match_scipy():
    x = _f32(2, 12, 16)
    ref = sfft.dctn(x.astype(np.float64), type=2)
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.dctn(x, type=2)
    assert _rel(got, ref) < 1e-4


# ---------------------------------------------------------------------------
# dtype contract: precision class of the input is preserved on return
# ---------------------------------------------------------------------------
def test_f64_in_c128_out():
    x = RNG.standard_normal((4, 32))            # numpy default f64
    assert x.dtype == np.float64
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.fft(x)
        gotr = sfft.rfft(x)
    assert got.dtype == np.complex128
    assert gotr.dtype == np.complex128
    # values computed at f32 unless x64 is on; bound accordingly
    assert _rel(got, sfft.fft(x)) < 1e-5
    assert _rel(gotr, sfft.rfft(x)) < 1e-5


def test_irfft_f64_in_f64_out():
    x = RNG.standard_normal((2, 33)) + 1j * RNG.standard_normal((2, 33))
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.irfft(x)
    assert got.dtype == np.float64
    assert _rel(got, sfft.irfft(x)) < 1e-5


# ---------------------------------------------------------------------------
# fallback contract
# ---------------------------------------------------------------------------
def test_uncovered_function_falls_back():
    # prev_fast_len isn't covered -> scipy's own answer, not an error.
    with sfft.set_backend(RegentFFTBackend):
        assert sfft.prev_fast_len(1025) == sfft.prev_fast_len(1025)


def test_unsupported_args_fall_back():
    x = _f32(4, 20)
    ref = sfft.dct(x.astype(np.float64), type=2, norm="ortho")
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.dct(x, type=2, norm="ortho")  # ortho r2r -> declined
    assert _rel(got, ref) < 1e-4


def test_next_fast_len_is_engine_specific():
    with sfft.set_backend(RegentFFTBackend):
        n = sfft.next_fast_len(1009)
    assert isinstance(n, int) and n >= 1009
    # the returned size must be fast for THIS engine (kernel radix set)
    from regent_fft_tpu.ops import factor
    assert n == factor.next_fast_len(1009)


def test_fht_matches_scipy():
    a = _f32(64).astype(np.float64)
    dln, mu = 0.1, 0.5
    ref = sfft.fht(a, dln, mu)
    with sfft.set_backend(RegentFFTBackend):
        got = sfft.fht(a, dln, mu)
    assert _rel(got, ref) < 1e-4


def test_global_enable_disable_roundtrip():
    from regent_fft_tpu import scipy_backend
    x = _c64(2, 32)
    ref = sfft.fft(x.astype(np.complex128))
    scipy_backend.enable()
    try:
        got = sfft.fft(x)
        assert _rel(got, ref) < 1e-5
    finally:
        scipy_backend.disable()
    # after disable, scipy's own backend answers again
    assert _rel(sfft.fft(x), ref) < 1e-5
