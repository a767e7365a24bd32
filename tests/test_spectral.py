"""Spectral estimation + analytic-signal + resampling vs scipy.

Covers periodogram/welch/csd/coherence/spectrogram (density & spectrum
scaling, onesided/twosided, detrend constant/linear/off, mean/median
averaging, batch axes) and hilbert/hilbert2/resample against
scipy.signal on float64 references.
"""
import numpy as np
import pytest
from scipy import signal as ssig

from regent_fft_tpu.signal import hilbert, hilbert2, resample
from regent_fft_tpu.spectral import (coherence, csd, periodogram,
                                     spectrogram, welch)

RNG = np.random.default_rng(11)


def _close(got, ref, tol=2e-4):
    got = np.asarray(got)
    ref = np.asarray(ref)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    scale = max(np.abs(ref).max(), 1e-12)
    err = np.abs(got - ref).max() / scale
    assert err < tol, err


# ---------------------------------------------------------------- welch
@pytest.mark.parametrize("scaling", ["density", "spectrum"])
@pytest.mark.parametrize("detrend", ["constant", "linear", False])
def test_welch_scaling_detrend(scaling, detrend):
    x = RNG.standard_normal(1500).astype(np.float32)
    f, p = welch(x, fs=10.0, nperseg=256, scaling=scaling, detrend=detrend)
    fr, pr = ssig.welch(x.astype(np.float64), fs=10.0, nperseg=256,
                        scaling=scaling, detrend=detrend)
    _close(f, fr)
    _close(p, pr)


def test_welch_defaults_and_short_signal():
    x = RNG.standard_normal(100).astype(np.float32)  # < default nperseg
    f, p = welch(x)
    fr, pr = ssig.welch(x.astype(np.float64))
    _close(f, fr)
    _close(p, pr)


def test_welch_median_average():
    x = RNG.standard_normal(2048).astype(np.float32)
    f, p = welch(x, nperseg=128, average="median")
    fr, pr = ssig.welch(x.astype(np.float64), nperseg=128, average="median")
    _close(p, pr)


def test_welch_complex_twosided():
    x = (RNG.standard_normal(1024)
         + 1j * RNG.standard_normal(1024)).astype(np.complex64)
    f, p = welch(x, nperseg=256)
    fr, pr = ssig.welch(x, nperseg=256, return_onesided=False)
    _close(f, fr)
    _close(p, pr, tol=5e-4)


def test_welch_batch_axis():
    x = RNG.standard_normal((3, 1000)).astype(np.float32)
    f, p = welch(x, nperseg=200, axis=-1)
    fr, pr = ssig.welch(x.astype(np.float64), nperseg=200, axis=-1)
    _close(p, pr)
    # and along a non-last axis
    f2, p2 = welch(x.T, nperseg=200, axis=0)
    _close(p2, pr.T)


# ---------------------------------------------------------- periodogram
@pytest.mark.parametrize("window", ["boxcar", "hann"])
def test_periodogram(window):
    x = RNG.standard_normal(777).astype(np.float32)
    f, p = periodogram(x, fs=2.0, window=window)
    fr, pr = ssig.periodogram(x.astype(np.float64), fs=2.0, window=window)
    _close(f, fr)
    _close(p, pr)


def test_periodogram_nfft():
    x = RNG.standard_normal(300).astype(np.float32)
    f, p = periodogram(x, nfft=512)
    fr, pr = ssig.periodogram(x.astype(np.float64), nfft=512)
    _close(p, pr)
    # nfft < n truncates like scipy
    f2, p2 = periodogram(x, nfft=128)
    fr2, pr2 = ssig.periodogram(x.astype(np.float64), nfft=128)
    _close(p2, pr2)


# ------------------------------------------------------------------ csd
def test_csd_matches_scipy():
    x = RNG.standard_normal(1200).astype(np.float32)
    y = (0.5 * x + 0.1 * RNG.standard_normal(1200)).astype(np.float32)
    f, pxy = csd(x, y, fs=4.0, nperseg=256)
    fr, pr = ssig.csd(x.astype(np.float64), y.astype(np.float64),
                      fs=4.0, nperseg=256)
    _close(f, fr)
    _close(pxy, pr)


def test_csd_unequal_lengths_zero_pads():
    x = RNG.standard_normal(800).astype(np.float32)
    y = RNG.standard_normal(500).astype(np.float32)
    f, pxy = csd(x, y, nperseg=128)
    fr, pr = ssig.csd(x.astype(np.float64), y.astype(np.float64),
                      nperseg=128)
    _close(pxy, pr)


# ------------------------------------------------------------ coherence
def test_coherence():
    x = RNG.standard_normal(4096).astype(np.float32)
    y = (x + 0.5 * RNG.standard_normal(4096)).astype(np.float32)
    f, c = coherence(x, y, nperseg=256)
    fr, cr = ssig.coherence(x.astype(np.float64), y.astype(np.float64),
                            nperseg=256)
    _close(c, cr, tol=1e-3)


# ---------------------------------------------------------- spectrogram
@pytest.mark.parametrize("mode", ["psd", "magnitude", "complex"])
def test_spectrogram(mode):
    x = RNG.standard_normal(2000).astype(np.float32)
    f, t, s = spectrogram(x, fs=8.0, nperseg=128, mode=mode)
    fr, tr, sr = ssig.spectrogram(x.astype(np.float64), fs=8.0,
                                  nperseg=128, mode=mode)
    _close(f, fr)
    _close(t, tr)
    _close(s, sr, tol=5e-4)


def test_spectrogram_defaults():
    x = RNG.standard_normal(1024).astype(np.float32)
    f, t, s = spectrogram(x)
    fr, tr, sr = ssig.spectrogram(x.astype(np.float64))
    _close(t, tr)
    _close(s, sr, tol=5e-4)


# -------------------------------------------------------------- hilbert
@pytest.mark.parametrize("n", [256, 255])
def test_hilbert(n):
    x = RNG.standard_normal(n).astype(np.float32)
    got = hilbert(x)
    ref = ssig.hilbert(x.astype(np.float64))
    _close(got, ref)


def test_hilbert_padded_and_batched():
    x = RNG.standard_normal((4, 200)).astype(np.float32)
    got = hilbert(x, N=256, axis=-1)
    ref = ssig.hilbert(x.astype(np.float64), N=256, axis=-1)
    _close(got, ref)


def test_hilbert_rejects_complex():
    with pytest.raises(ValueError):
        hilbert(np.zeros(8, np.complex64))


def test_hilbert2():
    x = RNG.standard_normal((32, 48)).astype(np.float32)
    got = hilbert2(x)
    ref = ssig.hilbert2(x.astype(np.float64))
    _close(got, ref)


# ------------------------------------------------------------- resample
@pytest.mark.parametrize("nx,num", [(128, 64), (128, 200), (127, 64),
                                    (127, 201), (128, 129), (100, 50)])
def test_resample_real(nx, num):
    x = RNG.standard_normal(nx).astype(np.float32)
    got = resample(x, num)
    ref = ssig.resample(x.astype(np.float64), num)
    _close(got, ref, tol=5e-4)


@pytest.mark.parametrize("nx,num", [(128, 64), (128, 200), (127, 63)])
def test_resample_complex(nx, num):
    x = (RNG.standard_normal(nx)
         + 1j * RNG.standard_normal(nx)).astype(np.complex64)
    got = resample(x, num)
    ref = ssig.resample(x, num)
    _close(got, ref, tol=5e-4)


def test_resample_axis_and_t():
    x = RNG.standard_normal((6, 90)).astype(np.float32)
    t = np.arange(90) / 10.0
    got, new_t = resample(x, 45, t=t, axis=1)
    ref, ref_t = ssig.resample(x.astype(np.float64), 45, t=t, axis=1)
    _close(got, ref, tol=5e-4)
    _close(new_t, ref_t)


def test_resample_window():
    x = RNG.standard_normal(128).astype(np.float32)
    got = resample(x, 64, window="hann")
    ref = ssig.resample(x.astype(np.float64), 64, window="hann")
    _close(got, ref, tol=5e-4)
