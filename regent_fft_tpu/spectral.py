"""Spectral estimation on TPU (scipy.signal parity): periodogram, welch,
csd, coherence, spectrogram.

One shared machinery: strided segment gather -> per-segment detrend ->
window -> ONE batched (r)fft plan over all segments (segments ride the
batch dimension — the TPU-native shape) -> scaled cross/auto products ->
segment average.  Semantics follow ``scipy.signal`` (defaults, density /
spectrum scaling, onesided doubling, Welch median-bias correction) and
are scipy-verified in ``tests/test_spectral.py``.

Beyond the reference: Regent-FFT (``/root/reference/src/fft.rg``) has no
real, batched, or inverse transforms, so none of these estimators can be
expressed on it; they are the serving-shaped workloads an FFT framework
exists for.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .signal import _get_window


def _detrend_segments(segs, detrend):
    """Per-segment detrend along the last axis ('constant' | 'linear' |
    False).  Closed-form least squares for 'linear' (no host solve)."""
    if detrend is False or detrend is None:
        return segs
    if detrend == "constant":
        return segs - jnp.mean(segs, axis=-1, keepdims=True)
    if detrend == "linear":
        n = segs.shape[-1]
        tc = np.arange(n) - (n - 1) / 2.0
        denom = float((tc * tc).sum()) or 1.0
        t = jnp.asarray(tc.astype(np.float32))
        mean = jnp.mean(segs, axis=-1, keepdims=True)
        slope = jnp.sum(segs * t, axis=-1, keepdims=True) / denom
        return segs - mean - slope * t
    raise ValueError("detrend must be 'constant', 'linear', or False")


def _median_bias(n: int) -> float:
    """Bias of the median of n chi^2_2 variables relative to the mean
    (scipy.signal._spectral_py._median_bias)."""
    ii_2 = 2 * np.arange(1.0, (n - 1) // 2 + 1)
    return float(1 + np.sum(1.0 / (ii_2 + 1) - 1.0 / ii_2))


def _spectral_helper(x, y, fs, window, nperseg, noverlap, nfft, detrend,
                     return_onesided, scaling, axis, mode="psd"):
    """Framed cross-spectrum core shared by all estimators.

    Returns ``(freqs, t, Pxy)`` with ``Pxy`` laid out
    ``(..., nseg, nfreq)`` (callers average over / transpose the segment
    axis).  ``mode='psd'`` applies the conj(X)*Y product; ``mode='stft'``
    returns the scaled segment spectra themselves.
    """
    x = jnp.asarray(x)
    same = y is x or y is None
    axis = axis % x.ndim
    xm = jnp.moveaxis(x, axis, -1)
    cplx = jnp.issubdtype(x.dtype, jnp.complexfloating)
    if not same:
        y = jnp.asarray(y)
        if y.ndim != x.ndim:
            raise ValueError(f"rank mismatch: {x.ndim} vs {y.ndim}")
        ym = jnp.moveaxis(y, axis % y.ndim, -1)
        if xm.shape[:-1] != ym.shape[:-1]:
            raise ValueError("x and y must match on non-transform axes: "
                             f"{x.shape} vs {y.shape}")
        # scipy zero-pads the shorter input along the transform axis
        n = max(xm.shape[-1], ym.shape[-1])
        pad = [(0, 0)] * (xm.ndim - 1)
        if xm.shape[-1] < n:
            xm = jnp.pad(xm, pad + [(0, n - xm.shape[-1])])
        if ym.shape[-1] < n:
            ym = jnp.pad(ym, pad + [(0, n - ym.shape[-1])])
        cplx = cplx or jnp.issubdtype(y.dtype, jnp.complexfloating)
    n = xm.shape[-1]

    nperseg = 256 if nperseg is None else int(nperseg)
    nperseg = min(nperseg, n)  # scipy clamps (with a warning)
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg")
    nfft = nperseg if nfft is None else int(nfft)
    if nfft < nperseg:
        raise ValueError("nfft must be >= nperseg")
    win = _get_window(window, nperseg)
    step = nperseg - noverlap
    nseg = (n - nperseg) // step + 1
    idx = (np.arange(nseg)[:, None] * step
           + np.arange(nperseg)[None, :])          # (nseg, nperseg)
    winj = jnp.asarray(win.astype(np.float32))

    onesided = bool(return_onesided) and not cplx

    def frames_of(a):
        fr = a[..., idx]                            # (..., nseg, nperseg)
        fr = fr if cplx else fr.astype(jnp.float32)
        fr = _detrend_segments(fr, detrend)
        return fr * winj

    from .api import fft, rfft
    def spectra(a):
        fr = frames_of(a)
        if nfft > nperseg:
            fr = jnp.pad(fr, [(0, 0)] * (fr.ndim - 1)
                         + [(0, nfft - nperseg)])
        return rfft(fr, axis=-1) if onesided else fft(fr, axis=-1)

    X = spectra(xm)
    Y = X if same else spectra(ym)

    if scaling == "density":
        scale = 1.0 / (fs * float((win * win).sum()))
    elif scaling == "spectrum":
        scale = 1.0 / float(win.sum()) ** 2
    else:
        raise ValueError("scaling must be 'density' or 'spectrum'")

    if mode == "stft":
        P = X * jnp.asarray(np.float32(np.sqrt(scale)))
    else:
        P = jnp.conj(X) * Y * jnp.asarray(np.float32(scale))
        if onesided:
            if nfft % 2:
                P = P.at[..., 1:].multiply(2.0)
            else:
                P = P.at[..., 1:-1].multiply(2.0)  # Nyquist bin not doubled

    freqs = (np.arange(nfft // 2 + 1) * (fs / nfft) if onesided
             else np.fft.fftfreq(nfft, 1.0 / fs))
    t = (np.arange(nseg) * step + nperseg / 2.0) / fs
    return freqs, t, P


def _average_segments(P, average: str):
    nseg = P.shape[-2]
    if average == "mean":
        return jnp.mean(P, axis=-2)
    if average == "median":
        bias = _median_bias(nseg)
        if jnp.issubdtype(P.dtype, jnp.complexfloating):
            med = (jnp.median(jnp.real(P), axis=-2)
                   + 1j * jnp.median(jnp.imag(P), axis=-2))
        else:
            med = jnp.median(P, axis=-2)
        return med / bias
    raise ValueError("average must be 'mean' or 'median'")


def csd(x, y, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
        noverlap: Optional[int] = None, nfft: Optional[int] = None,
        detrend="constant", return_onesided: bool = True,
        scaling: str = "density", axis: int = -1, average: str = "mean"):
    """Cross power spectral density ``Pxy`` by Welch's method
    (``scipy.signal.csd`` semantics).  Returns ``(f, Pxy)``."""
    freqs, _, P = _spectral_helper(jnp.asarray(x), y, fs, window, nperseg,
                                   noverlap, nfft, detrend, return_onesided,
                                   scaling, axis)
    P = _average_segments(P, average)
    return freqs, jnp.moveaxis(P, -1, axis % P.ndim)


def welch(x, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
          noverlap: Optional[int] = None, nfft: Optional[int] = None,
          detrend="constant", return_onesided: bool = True,
          scaling: str = "density", axis: int = -1, average: str = "mean"):
    """Power spectral density by Welch's method (``scipy.signal.welch``
    semantics).  Returns ``(f, Pxx)`` with ``Pxx`` real."""
    x = jnp.asarray(x)
    freqs, Pxy = csd(x, x, fs, window, nperseg, noverlap, nfft, detrend,
                     return_onesided, scaling, axis, average)
    return freqs, jnp.real(Pxy)


def periodogram(x, fs: float = 1.0, window="boxcar",
                nfft: Optional[int] = None, detrend="constant",
                return_onesided: bool = True, scaling: str = "density",
                axis: int = -1):
    """Periodogram PSD estimate (``scipy.signal.periodogram`` semantics):
    Welch with one full-length segment.  Returns ``(f, Pxx)``."""
    x = jnp.asarray(x)
    n = x.shape[axis % x.ndim]
    if nfft is not None and nfft < n:
        # scipy truncates the signal to nfft in this case
        sl = [slice(None)] * x.ndim
        sl[axis % x.ndim] = slice(0, nfft)
        x = x[tuple(sl)]
        n, nfft = nfft, None
    return welch(x, fs, window, nperseg=n, noverlap=0, nfft=nfft,
                 detrend=detrend, return_onesided=return_onesided,
                 scaling=scaling, axis=axis)


def coherence(x, y, fs: float = 1.0, window="hann",
              nperseg: Optional[int] = None, noverlap: Optional[int] = None,
              nfft: Optional[int] = None, detrend="constant",
              axis: int = -1):
    """Magnitude-squared coherence ``|Pxy|^2 / (Pxx Pyy)``
    (``scipy.signal.coherence`` semantics).  Returns ``(f, Cxy)``."""
    freqs, Pxx = welch(x, fs, window, nperseg, noverlap, nfft, detrend,
                       axis=axis)
    _, Pyy = welch(y, fs, window, nperseg, noverlap, nfft, detrend,
                   axis=axis)
    _, Pxy = csd(x, y, fs, window, nperseg, noverlap, nfft, detrend,
                 axis=axis)
    return freqs, jnp.abs(Pxy) ** 2 / (Pxx * Pyy)


def spectrogram(x, fs: float = 1.0, window=("tukey", 0.25),
                nperseg: Optional[int] = None,
                noverlap: Optional[int] = None, nfft: Optional[int] = None,
                detrend="constant", return_onesided: bool = True,
                scaling: str = "density", axis: int = -1,
                mode: str = "psd"):
    """Spectrogram (``scipy.signal.spectrogram`` semantics): per-segment
    spectra with the frequency axis before time.  Returns
    ``(f, t, Sxx)`` with ``Sxx`` shaped ``(..., nfreq, nseg)``."""
    x = jnp.asarray(x)
    n = x.shape[axis % x.ndim]
    nperseg_eff = min(256 if nperseg is None else int(nperseg), n)
    if noverlap is None:
        noverlap = nperseg_eff // 8
    if mode == "psd":
        freqs, t, P = _spectral_helper(x, x, fs, window, nperseg_eff,
                                       noverlap, nfft, detrend,
                                       return_onesided, scaling, axis)
        S = jnp.real(P)
    elif mode in ("complex", "magnitude"):
        freqs, t, Z = _spectral_helper(x, x, fs, window, nperseg_eff,
                                       noverlap, nfft, detrend,
                                       return_onesided, scaling, axis,
                                       mode="stft")
        S = jnp.abs(Z) if mode == "magnitude" else Z
    else:
        raise ValueError("mode must be 'psd', 'complex', or 'magnitude'")
    return freqs, t, jnp.swapaxes(S, -1, -2)
