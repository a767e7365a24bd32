"""fftconvolve vs scipy (scipy.signal.fftconvolve parity).

Covers the plain (next_fast_len) path, the packed-pow2 real path (the
Nyquist-packed spectral product incl. the lane-0 untangle fixup), the
complex C2C path, modes full/same/valid, and axes subsets.
"""
import numpy as np
import pytest
from scipy import signal as ssig

from regent_fft_tpu.signal import fftconvolve

RNG = np.random.default_rng(7)


def _check(a, b, **kw):
    got = np.asarray(fftconvolve(a, b, **{k: v for k, v in kw.items()
                                          if k not in ("scipy_kw",)}))
    skw = {k: v for k, v in kw.items() if k in ("mode", "axes")}
    ref = ssig.fftconvolve(np.asarray(a, np.float64)
                           if not np.iscomplexobj(a) else a,
                           np.asarray(b, np.float64)
                           if not np.iscomplexobj(b) else b, **skw)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * scale), \
        np.abs(got - ref).max() / scale


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fftconvolve_1d_real(mode):
    a = RNG.standard_normal(200).astype(np.float32)
    b = RNG.standard_normal(31).astype(np.float32)
    _check(a, b, mode=mode)


def test_fftconvolve_2d_real_plain():
    a = RNG.standard_normal((40, 50)).astype(np.float32)
    b = RNG.standard_normal((7, 9)).astype(np.float32)
    _check(a, b, mode="same")


def test_fftconvolve_packed_path():
    # sizes rounding to (256, 256): packed pow2 path with lane-0 fixup
    a = RNG.standard_normal((200, 220)).astype(np.float32)
    b = RNG.standard_normal((50, 30)).astype(np.float32)
    _check(a, b, mode="full", method="packed", backend="stockham")
    # and the same problem through the plain path must agree with scipy
    _check(a, b, mode="full", method="plain")


def test_fftconvolve_complex():
    a = (RNG.standard_normal((30, 40))
         + 1j * RNG.standard_normal((30, 40))).astype(np.complex64)
    b = (RNG.standard_normal((5, 6))
         + 1j * RNG.standard_normal((5, 6))).astype(np.complex64)
    _check(a, b, mode="full")


def test_fftconvolve_axes_subset():
    # batch axis 0 not convolved
    a = RNG.standard_normal((3, 64, 64)).astype(np.float32)
    b = RNG.standard_normal((3, 9, 9)).astype(np.float32)
    _check(a, b, mode="same", axes=(1, 2))


def test_fftconvolve_validation():
    a = np.zeros((4, 8), np.float32)
    b = np.zeros((9, 8), np.float32)
    with pytest.raises(ValueError, match="valid mode"):
        fftconvolve(a, b, mode="valid")
    with pytest.raises(ValueError, match="rank"):
        fftconvolve(np.zeros(4, np.float32), np.zeros((2, 2), np.float32))


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_correlate_real(mode):
    from regent_fft_tpu.signal import correlate
    a = RNG.standard_normal((40, 50)).astype(np.float32)
    b = RNG.standard_normal((7, 10)).astype(np.float32)
    got = np.asarray(correlate(a, b, mode=mode))
    ref = ssig.correlate(a.astype(np.float64), b.astype(np.float64),
                         mode=mode, method="fft")
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def test_correlate_complex_conjugation():
    from regent_fft_tpu.signal import correlate
    a = (RNG.standard_normal(64) + 1j * RNG.standard_normal(64)).astype(np.complex64)
    b = (RNG.standard_normal(16) + 1j * RNG.standard_normal(16)).astype(np.complex64)
    got = np.asarray(correlate(a, b, mode="full"))
    ref = ssig.correlate(a.astype(np.complex128), b.astype(np.complex128),
                         mode="full", method="fft")
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_oaconvolve_1d(mode):
    from regent_fft_tpu.signal import oaconvolve
    a = RNG.standard_normal(3000).astype(np.float32)
    b = RNG.standard_normal(25).astype(np.float32)
    got = np.asarray(oaconvolve(a, b, mode=mode))
    ref = ssig.oaconvolve(a.astype(np.float64), b.astype(np.float64),
                          mode=mode)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def test_oaconvolve_2d_and_swap():
    from regent_fft_tpu.signal import oaconvolve
    a = RNG.standard_normal((8, 2000)).astype(np.float32)
    b = RNG.standard_normal((8, 17)).astype(np.float32)
    got = np.asarray(oaconvolve(a, b, mode="same", axes=(1,)))
    ref = ssig.oaconvolve(a.astype(np.float64), b.astype(np.float64),
                          mode="same", axes=1)
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())
    # swapped argument order (short first) must commute
    got2 = np.asarray(oaconvolve(b, a, mode="full", axes=(1,)))
    ref2 = ssig.oaconvolve(b.astype(np.float64), a.astype(np.float64),
                           mode="full", axes=1)
    assert np.allclose(got2, ref2, rtol=2e-4, atol=2e-4 * np.abs(ref2).max())


def test_oaconvolve_fallback_similar_sizes():
    from regent_fft_tpu.signal import oaconvolve
    a = RNG.standard_normal((64, 64)).astype(np.float32)
    b = RNG.standard_normal((60, 60)).astype(np.float32)
    got = np.asarray(oaconvolve(a, b, mode="full"))
    ref = ssig.oaconvolve(a.astype(np.float64), b.astype(np.float64))
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def test_oaconvolve_2d_blocked_plus_full_axis():
    from regent_fft_tpu.signal import oaconvolve
    a = RNG.standard_normal((30, 1500)).astype(np.float32)
    b = RNG.standard_normal((5, 11)).astype(np.float32)
    got = np.asarray(oaconvolve(a, b, mode="full"))
    ref = ssig.oaconvolve(a.astype(np.float64), b.astype(np.float64))
    assert got.shape == ref.shape
    assert np.allclose(got, ref, rtol=2e-4, atol=2e-4 * np.abs(ref).max())


def _stft_pair(x, **kw):
    from regent_fft_tpu.signal import stft
    from regent_fft_tpu.utils.verify import to_numpy_complex
    f, t, z = stft(x, **kw)
    fr, tr, zr = ssig.stft(np.asarray(x, np.float64), detrend=False, **kw)
    return (f, t, to_numpy_complex(z)), (fr, tr, zr)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(nperseg=128, noverlap=96),
    dict(window="hamming", nperseg=64, nfft=128),
    dict(boundary=None, padded=False, nperseg=64),
    dict(scaling="psd", fs=10.0, nperseg=64),
])
def test_stft_matches_scipy(kw):
    x = RNG.standard_normal(1000).astype(np.float32)
    (f, t, z), (fr, tr, zr) = _stft_pair(x, **kw)
    assert np.allclose(f, fr) and np.allclose(t, tr)
    assert z.shape == zr.shape, (z.shape, zr.shape)
    assert np.allclose(z, zr, rtol=1e-4, atol=1e-4 * np.abs(zr).max())


def test_stft_batched_axis():
    x = RNG.standard_normal((3, 777)).astype(np.float32)
    (f, t, z), (fr, tr, zr) = _stft_pair(x, nperseg=64, axis=1)
    assert z.shape == zr.shape
    assert np.allclose(z, zr, rtol=1e-4, atol=1e-4 * np.abs(zr).max())


@pytest.mark.parametrize("kw", [
    dict(nperseg=128),
    dict(nperseg=120, noverlap=90),   # step does not divide nperseg
    dict(window="hamming", nperseg=64, scaling="psd"),
])
def test_stft_istft_roundtrip(kw):
    from regent_fft_tpu.signal import stft, istft
    x = RNG.standard_normal(2000).astype(np.float32)
    f, t, z = stft(x, **kw)
    ikw = {k: v for k, v in kw.items() if k != "noverlap"}
    if "noverlap" in kw:
        ikw["noverlap"] = kw["noverlap"]
    t2, xr = istft(z, **ikw)
    xr = np.asarray(xr)
    n = min(len(xr), len(x))
    assert np.allclose(xr[:n], x[:n], atol=1e-4), np.abs(xr[:n] - x[:n]).max()


def test_istft_matches_scipy():
    from regent_fft_tpu.signal import stft, istft
    x = RNG.standard_normal(1500).astype(np.float32)
    f, t, z = stft(x, nperseg=100, noverlap=60)
    from regent_fft_tpu.utils.verify import to_numpy_complex
    znp = to_numpy_complex(z)
    t2, got = istft(z, nperseg=100, noverlap=60)
    tr, ref = ssig.istft(znp.astype(np.complex128), nperseg=100, noverlap=60)
    got = np.asarray(got)
    n = min(len(got), len(ref))
    assert np.allclose(got[:n], ref[:n], rtol=1e-4,
                       atol=1e-4 * np.abs(ref).max())
