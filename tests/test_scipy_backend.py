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
def test_declined_args_still_behave_like_scipy():
    # An invalid norm is declined by the adapter; scipy's own backend then
    # raises its usual error — the fallback chain stays intact.
    x = _f32(4, 20)
    with sfft.set_backend(RegentFFTBackend):
        with pytest.raises(ValueError):
            sfft.fft(x.astype(np.complex64), norm="bogus")


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
@pytest.mark.parametrize("orth", [None, True, False])
def test_r2r_norm_orthogonalize_through_backend(norm, orth):
    x = _f32(3, 20)
    for fn in ("dct", "idct", "dst", "idst"):
        ref = getattr(sfft, fn)(x.astype(np.float64), type=2, norm=norm,
                                orthogonalize=orth)
        with sfft.set_backend(RegentFFTBackend):
            got = getattr(sfft, fn)(x, type=2, norm=norm, orthogonalize=orth)
        assert got.dtype == np.float32, fn
        assert _rel(got, ref) < 1e-4, fn


def test_hermitian_nd_through_backend():
    z = _c64(3, 8, 9)
    xr = _f32(3, 8, 16)
    for fn, arg in (("hfft2", z), ("hfftn", z),
                    ("ihfft2", xr), ("ihfftn", xr)):
        ref = getattr(sfft, fn)(np.asarray(arg, dtype=np.complex128
                                           if arg.dtype.kind == "c"
                                           else np.float64))
        with sfft.set_backend(RegentFFTBackend):
            got = getattr(sfft, fn)(arg)
        assert got.shape == ref.shape, fn
        assert _rel(got, ref) < 1e-4, fn


def _dispatches_via_uarray(fn) -> bool:
    # scipy >= 1.17 turned the fast_len helpers into plain lru_cache
    # functions (no uarray dispatch); older scipys expose multimethods.
    return hasattr(fn, "_extractor") or type(fn).__module__.startswith("uarray")


def test_prev_fast_len_is_engine_specific():
    from regent_fft_tpu.ops import factor
    # the handler itself is always engine-specific
    got = RegentFFTBackend.__ua_function__(sfft.prev_fast_len, (1009,), {})
    assert got == factor.prev_fast_len(1009) <= 1009
    if _dispatches_via_uarray(sfft.prev_fast_len):
        with sfft.set_backend(RegentFFTBackend):
            assert sfft.prev_fast_len(1009) == got


def test_next_fast_len_is_engine_specific():
    from regent_fft_tpu.ops import factor
    got = RegentFFTBackend.__ua_function__(sfft.next_fast_len, (1009,), {})
    # the returned size must be fast for THIS engine (kernel radix set)
    assert isinstance(got, int) and got >= 1009
    assert got == factor.next_fast_len(1009)
    if _dispatches_via_uarray(sfft.next_fast_len):
        with sfft.set_backend(RegentFFTBackend):
            assert sfft.next_fast_len(1009) == got


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
