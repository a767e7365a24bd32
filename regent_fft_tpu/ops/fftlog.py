"""Fast Hankel transform (FFTLog) — scipy.fft.fht/ifht/fhtoffset parity.

The logarithmic-grid Hankel transform of Talman (1978) / Hamilton (2000):
for ``a`` sampled on a log-spaced grid ``r_j = r_c exp(j dln)``, the
transform pair

    A(k) = int_0^inf a(r) J_mu(k r) k dr

discretizes to a log-periodic convolution, which FFTLog evaluates as ONE
real FFT, a pointwise multiply by Gamma-function coefficients, and one
inverse real FFT — so the whole transform rides this framework's packed
r2c/c2r kernel path on TPU and is batchable over every leading axis.

The reference ecosystem gets this from scipy-on-CPU only (the reference
wrapper transforms nothing but plain C2C/R2C grids,
``/root/reference/src/fft.rg:36-39``); here it is one more plan-cached
spectral product.  Coefficients are generated host-side in f64 (like the
twiddle tables, ``ops/twiddle.py``) using ``scipy.special.loggamma``;
the hot path is pure JAX.

Verified bit-for-bit (to f32) against ``scipy.fft.fht``/``ifht`` in
``tests/test_fftlog.py``.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = ["fht", "ifht", "fhtoffset"]

_LN_2 = math.log(2)


def _loggamma(z):
    from scipy.special import loggamma
    return loggamma(z)


def _fhtcoeff(n: int, dln: float, mu: float, offset: float = 0.0,
              bias: float = 0.0, inverse: bool = False) -> np.ndarray:
    """FFTLog frequency-domain coefficients u_m (Hamilton 2000, eq. 18).

    u_m = (2/kr)^{-2 i y_m} 2^q Gamma(xp + i y_m) / Gamma(xm - i y_m)
    with xp = (mu+1+q)/2, xm = (mu+1-q)/2, y_m = pi m / (n dln).
    """
    lnkr, q = float(offset), float(bias)
    xp = (mu + 1 + q) / 2
    xm = (mu + 1 - q) / 2
    y = np.linspace(0, np.pi * (n // 2) / (n * dln), n // 2 + 1)
    v = _loggamma(xm + 1j * y)
    u = _loggamma(xp + 1j * y)
    re = u.real - v.real + _LN_2 * q
    im = u.imag + v.imag + 2 * (_LN_2 - lnkr) * y
    u = np.exp(re + 1j * im)
    # the Nyquist coefficient must be real for an exactly
    # length-preserving real-to-real round trip (scipy does the same)
    if n % 2 == 0:
        u.imag[-1] = 0.0
    if not np.isfinite(u[0]):
        # Gamma pole at m=0: the limit is 2^q Gamma(xp)/Gamma(xm), which
        # poch evaluates correctly through the negative-integer cases
        # (scipy-parity special case)
        from scipy.special import poch
        u[0] = 2 ** q * poch(xm, xp - xm)
    import warnings
    if np.isinf(u[0]) and not inverse:
        warnings.warn("singular transform; consider changing the bias",
                      stacklevel=3)
        u = np.copy(u)
        u[0] = 0
    elif u[0] == 0 and inverse:
        warnings.warn("singular inverse transform; consider changing "
                      "the bias", stacklevel=3)
        u = np.copy(u)
        u[0] = np.inf
    return u


def _fhtq(a, u: np.ndarray, inverse: bool = False):
    """The log-periodic circular convolution core: one r2c, a pointwise
    coefficient multiply, one c2r, and a reversal (the output grid runs
    in the opposite log direction)."""
    from ..api import irfft, rfft
    n = a.shape[-1]
    A = rfft(a)
    cu = jnp.asarray(u if not inverse else 1.0 / np.conj(u),
                     dtype=jnp.complex64)
    A = A * cu
    a_out = irfft(A, n=n)
    return jnp.flip(a_out, axis=-1)


def fht(a, dln: float, mu: float, offset: float = 0.0, bias: float = 0.0):
    """Fast Hankel transform of order ``mu`` on a log-spaced grid
    (``scipy.fft.fht`` parity; batched over leading axes)."""
    a = jnp.asarray(a)
    n = a.shape[-1]
    if bias != 0:
        j_c = (n - 1) / 2
        j = np.arange(n)
        a = a * jnp.asarray(np.exp(-bias * (j - j_c) * dln), a.dtype)
    u = _fhtcoeff(n, dln, mu, offset=offset, bias=bias)
    A = _fhtq(a, u)
    if bias != 0:
        A = A * jnp.asarray(np.exp(-bias * ((j - j_c) * dln + offset)),
                            A.dtype)
    return A


def ifht(A, dln: float, mu: float, offset: float = 0.0, bias: float = 0.0):
    """Inverse fast Hankel transform (``scipy.fft.ifht`` parity)."""
    A = jnp.asarray(A)
    n = A.shape[-1]
    if bias != 0:
        j_c = (n - 1) / 2
        j = np.arange(n)
        A = A * jnp.asarray(np.exp(bias * ((j - j_c) * dln + offset)),
                            A.dtype)
    u = _fhtcoeff(n, dln, mu, offset=offset, bias=bias, inverse=True)
    a = _fhtq(A, u, inverse=True)
    if bias != 0:
        a = a * jnp.asarray(np.exp(bias * (j - j_c) * dln), a.dtype)
    return a


def fhtoffset(dln: float, mu: float, initial: float = 0.0,
              bias: float = 0.0) -> float:
    """Optimal offset for a low-ringing Hankel transform
    (``scipy.fft.fhtoffset`` parity): shift ``initial`` to the nearest
    log-grid point where the Nyquist-frequency coefficient's phase
    vanishes (Hamilton 2000, eq. 20)."""
    lnkr, q = float(initial), float(bias)
    xp = (mu + 1 + q) / 2
    xm = (mu + 1 - q) / 2
    y = np.pi / (2 * dln)
    zp = _loggamma(xp + 1j * y)
    zm = _loggamma(xm + 1j * y)
    arg = (_LN_2 - lnkr) / dln + (zp.imag + zm.imag) / np.pi
    return lnkr + (arg - np.round(arg)) * dln
