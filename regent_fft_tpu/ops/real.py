"""Real-input (r2c) and real-output (c2r) transforms via conjugate-even packing.

TPU re-design of the reference's r2c path (``/root/reference/src/fft.rg:313``
``fftw_plan_dft_r2c`` and FFTW's ``rdft/`` solvers): for even N, pack the N
reals into N/2 complex points z[m] = x[2m] + i*x[2m+1], run one half-size
complex FFT, and untangle the conjugate-even halves — halving both flops and
HBM traffic versus a padded complex transform (BASELINE.md names this
explicitly).  Odd N falls back to a full complex transform + slice.

C2R is new capability: the reference never wired up inverse or c2r
transforms (``src/fft.rg:319,580`` hardcode FORWARD); FFTW supports both, so
we ship them (SURVEY.md capability checklist item 6).

All functions compute *unscaled* transforms (DFT / inverse-DFT-times-N
semantics); normalization is applied once at the plan level.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import Direction
from . import twiddle as _twiddle
from .stockham import build_c2c_1d, cmul_elem


def build_r2c_1d(n: int, max_radix, precision, use_3m=False, cfft=None):
    """fn((B, n) real) -> ((B, n//2+1), (B, n//2+1)) split halfspectrum.

    ``cfft`` optionally injects the half-length (B, n//2) complex core —
    the plan layer passes the Pallas butterfly kernel here so the
    work-halving reduction runs on the kernel path too (even n only).
    """
    if n == 1:
        def fn1(x):
            return x, jnp.zeros_like(x)
        return fn1
    if n % 2 == 1:
        # Odd N: full complex FFT of (x + 0i), keep k = 0..n//2.
        cfft = build_c2c_1d(n, Direction.FORWARD, max_radix, precision, use_3m)
        h = n // 2 + 1

        def fn_odd(x):
            yr, yi = cfft(x, jnp.zeros_like(x))
            return yr[:, :h], yi[:, :h]
        return fn_odd

    m = n // 2
    if cfft is None:
        cfft = build_c2c_1d(m, Direction.FORWARD, max_radix, precision, use_3m)

    def fn(x):
        wr_np, wi_np = _twiddle.halfcomplex_untangle(
            n, np.float64 if x.dtype == jnp.float64 else np.float32)
        b = x.shape[0]
        z = x.reshape(b, m, 2)
        zr_, zi_ = cfft(z[:, :, 0], z[:, :, 1])      # Z = FFT_m(even + i*odd)
        # Z[k] for k = 0..m (k = m wraps to Z[0]); Z[(m-k) mod m] conjugated.
        zk_r = jnp.concatenate([zr_, zr_[:, :1]], axis=1)
        zk_i = jnp.concatenate([zi_, zi_[:, :1]], axis=1)
        zm_r = jnp.concatenate([zr_[:, :1], zr_[:, 1:][:, ::-1], zr_[:, :1]], axis=1)
        zm_i = -jnp.concatenate([zi_[:, :1], zi_[:, 1:][:, ::-1], zi_[:, :1]], axis=1)
        # Xe = (Zk + conj(Z[m-k]))/2 ; Xo = -i/2 * (Zk - conj(Z[m-k]))
        xe_r = 0.5 * (zk_r + zm_r)
        xe_i = 0.5 * (zk_i + zm_i)
        xo_r = 0.5 * (zk_i - zm_i)
        xo_i = -0.5 * (zk_r - zm_r)
        # X = Xe + w^k * Xo
        tw_r, tw_i = cmul_elem(xo_r, xo_i, jnp.asarray(wr_np)[None], jnp.asarray(wi_np)[None])
        return xe_r + tw_r, xe_i + tw_i
    return fn


def build_c2r_1d(n: int, max_radix, precision, use_3m=False, cinv=None):
    """fn((B, n//2+1) split halfspectrum) -> (B, n) real, UNSCALED inverse.

    Output equals N times the true inverse (caller applies 1/N per norm).
    Assumes conjugate-even input (imag parts of bins 0 and N/2 ignored in
    effect, matching numpy.fft.irfft).  ``cinv`` optionally injects the
    half-length backward complex core (kernel path; even n only).
    """
    if n == 1:
        def fn1(xr, xi):
            return xr
        return fn1
    if n % 2 == 1:
        cinv = build_c2c_1d(n, Direction.BACKWARD, max_radix, precision, use_3m)
        h = n // 2 + 1

        def fn_odd(xr, xi):
            # Rebuild the full spectrum by Hermitian symmetry.
            fr = jnp.concatenate([xr, xr[:, 1:h][:, ::-1]], axis=1)
            fi = jnp.concatenate([xi, -xi[:, 1:h][:, ::-1]], axis=1)
            yr, _ = cinv(fr, fi)
            return yr
        return fn_odd

    m = n // 2
    if cinv is None:
        cinv = build_c2c_1d(m, Direction.BACKWARD, max_radix, precision, use_3m)

    def fn(xr, xi):
        wr_np, wi_np = _twiddle.halfcomplex_untangle(
            n, np.float64 if xr.dtype == jnp.float64 else np.float32)
        # Enforce Hermitian endpoint bins (real X[0], X[m]) like FFTW/numpy.
        xi = xi.at[:, 0].set(0.0).at[:, m].set(0.0)
        xkr, xki = xr[:, :m], xi[:, :m]                       # X[k], k=0..m-1
        xmr = xr[:, 1:][:, ::-1]                              # X[m-k]
        xmi = -xi[:, 1:][:, ::-1]                             # conj
        xe_r = 0.5 * (xkr + xmr)
        xe_i = 0.5 * (xki + xmi)
        dr = 0.5 * (xkr - xmr)
        di = 0.5 * (xki - xmi)
        # Xo = (X[k] - conj(X[m-k]))/2 * w^{-k}
        xo_r, xo_i = cmul_elem(dr, di, jnp.asarray(wr_np[:m])[None], -jnp.asarray(wi_np[:m])[None])
        # Z = Xe + i*Xo ; V = IDFT_m_unscaled(Z); y_even = 2 Vr, y_odd = 2 Vi
        zr_ = xe_r - xo_i
        zi_ = xe_i + xo_r
        vr, vi = cinv(zr_, zi_)
        y = jnp.stack([2.0 * vr, 2.0 * vi], axis=-1)
        return y.reshape(xr.shape[0], n)
    return fn
