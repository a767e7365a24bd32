"""Twiddle-factor and DFT-matrix table generation.

Analog of FFTW's twiddle management (``/root/reference/fftw-3.3.8/kernel/
twiddle.c``, ``kernel/trig.c``).  FFTW computes twiddles with extra-precision
trig reductions; we compute every table in float64 numpy on the host and
round once to the compute dtype, so table error never exceeds 0.5 ulp of the
storage type (SURVEY.md "hard parts" item 4: error-aware twiddle generation).

All tables are returned as (re, im) float pairs — the TPU vector units have
no complex type, so split planes are the native layout end to end.
"""
from __future__ import annotations

import functools

import numpy as np


def _exp_table(exponent: np.ndarray, denom: int, sign: int, dtype):
    """exp(sign * 2*pi*i * exponent / denom), computed in float64.

    Uses exact integer reduction mod denom before the float multiply so huge
    exponents (outer products of large indices) lose no precision.
    """
    e = np.mod(exponent.astype(np.int64), denom)
    theta = (2.0 * np.pi / denom) * e.astype(np.float64) * float(sign)
    return np.cos(theta).astype(dtype), np.sin(theta).astype(dtype)


@functools.lru_cache(maxsize=1024)
def dft_matrix(n: int, sign: int, dtype=np.float32):
    """Dense DFT matrix D[j, k] = exp(sign*2*pi*i*j*k/n) as an (re, im) pair.

    The matmul analog of FFTW's generated codelets
    (``fftw-3.3.8/dft/scalar/codelets/``): on TPU a direct n<=128 DFT is a
    single MXU pass, so the "codelet" is just this matrix.
    """
    jk = np.outer(np.arange(n, dtype=np.int64), np.arange(n, dtype=np.int64))
    return _exp_table(jk, n, sign, dtype)


@functools.lru_cache(maxsize=1024)
def twiddle_outer(n_rows: int, n_cols: int, denom: int, sign: int, dtype=np.float32):
    """Cooley-Tukey inter-stage twiddles T[a, b] = exp(sign*2*pi*i*a*b/denom).

    Used between stages of the mixed-radix decomposition (re-derivation of
    ``fftw-3.3.8/dft/ct.c``'s twiddle step in matmul form).
    """
    ab = np.outer(np.arange(n_rows, dtype=np.int64), np.arange(n_cols, dtype=np.int64))
    return _exp_table(ab, denom, sign, dtype)


@functools.lru_cache(maxsize=1024)
def chirp(n: int, sign: int, dtype=np.float32):
    """Bluestein chirp c[j] = exp(sign*pi*i*j^2/n) as an (re, im) pair.

    j^2 is reduced mod 2n exactly in integers (exp has period 2n in j^2),
    matching the precision trick in ``fftw-3.3.8/dft/bluestein.c``.
    """
    j = np.arange(n, dtype=np.int64)
    e = np.mod(j * j, 2 * n)
    return _exp_table(e, 2 * n, sign, dtype)


@functools.lru_cache(maxsize=1024)
def halfcomplex_untangle(n: int, dtype=np.float32):
    """Tables for r2c untangling of an n/2-point complex FFT of packed reals.

    For real input x of even length n packed as z[m] = x[2m] + i*x[2m+1],
    with Z = FFT_{n/2}(z), the spectrum is
        X[k] = (Z[k] + conj(Z[n/2-k]))/2  - (i/2) * w^k * (Z[k] - conj(Z[n/2-k]))
    where w = exp(-2*pi*i/n), k = 0..n/2.  Returns the w^k table for
    k = 0..n/2 inclusive as an (re, im) float pair (computed in f64).
    Reference analog: conjugate-even packing in ``fftw-3.3.8/rdft/``.
    """
    k = np.arange(n // 2 + 1, dtype=np.int64)
    return _exp_table(k, n, -1, dtype)
