"""Chirp-z transform and zoom FFT (scipy.signal.czt / zoom_fft parity).

The generalized form of the Bluestein machinery this framework already
uses for non-smooth sizes (``ops/bluestein.py``, re-derived from
``/root/reference/fftw-3.3.8/dft/bluestein.c``): evaluate

    y[k] = sum_n x[n] a^{-n} w^{n k},      k = 0..m-1

on an arbitrary logarithmic spiral (a, w) via the chirp factorization
``w^{nk} = w^{n^2/2} w^{k^2/2} w^{-(k-n)^2/2}`` — one linear convolution
of 5-smooth length, so the inner transforms ride the same mixed-radix
MXU path as every other plan.  Chirp tables and the kernel spectrum are
host-precomputed in float64 (the FFTW plan-time convention).

``ops/bluestein.py`` is the (a=1, w=unit-root, m=n) specialization of
this pipeline, kept separate because it sits on the plan hot path with
its own hardware validation; the kernel wrap-around layout here mirrors
its ``_bluestein_tables`` (keep the two in sync).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .dtypes import Direction, SplitComplex, as_split, from_split
from .ops import factor as _factor
from .ops.stockham import build_c2c_1d, cmul_elem
import jax


@functools.lru_cache(maxsize=128)
def _czt_tables(n: int, m: int, w: complex, a: complex, L: int):
    """Host f64 tables: u-chirp (n), k-chirp (m), kernel spectrum (L)."""
    err = np.errstate(over="ignore")  # overflow is caught and raised below
    err.__enter__()
    j_n = np.arange(n, dtype=np.float64)
    j_m = np.arange(m, dtype=np.float64)
    wl = complex(w)
    al = complex(a)
    # u[n] multiplier: a^{-n} w^{n^2/2}
    un = al ** (-j_n) * wl ** (j_n * j_n / 2.0)
    # output chirp: w^{k^2/2}
    ck = wl ** (j_m * j_m / 2.0)
    # kernel v[j] = w^{-j^2/2}, j = -(n-1) .. (m-1), circular at length L
    v = np.zeros(L, dtype=np.complex128)
    j_pos = np.arange(m, dtype=np.float64)
    v[:m] = wl ** (-(j_pos * j_pos) / 2.0)
    j_neg = np.arange(1, n, dtype=np.float64)
    v[L - (n - 1):] = (wl ** (-(j_neg * j_neg) / 2.0))[::-1]
    vhat = np.fft.fft(v)
    f32 = np.float32
    tabs = (un.real.astype(f32), un.imag.astype(f32),
            ck.real.astype(f32), ck.imag.astype(f32),
            vhat.real.astype(f32), vhat.imag.astype(f32))
    err.__exit__(None, None, None)
    if not all(np.isfinite(t).all() for t in tabs):
        raise ValueError(
            f"czt spiral |w|={abs(wl):.6g}, |a|={abs(al):.6g} overflows "
            f"float32 chirp tables at n={n}, m={m} (the TPU-native path "
            "computes in f32; keep |w|, |a| near 1 or shorten the "
            "transform)")
    return tabs


class CZT:
    """Plan-style chirp-z transform (``scipy.signal.CZT`` analog).

    Callable on arrays whose ``axis`` has length ``n``; returns the
    m-point transform along that axis.
    """

    def __init__(self, n: int, m: Optional[int] = None,
                 w: Optional[complex] = None, a: complex = 1 + 0j,
                 max_radix: int = _factor.DEFAULT_MAX_RADIX,
                 use_3m: bool = False):
        if n < 1:
            raise ValueError(f"n must be positive, got {n}")
        m = n if m is None else int(m)
        if m < 1:
            raise ValueError(f"m must be positive, got {m}")
        if w is None:
            w = np.exp(-2j * np.pi / m)
        self.n, self.m, self.w, self.a = int(n), m, complex(w), complex(a)
        L = _factor.next_fast_len(self.n + m - 1)
        self._L = L
        prec = jax.lax.Precision.HIGHEST
        self._fwd = build_c2c_1d(L, Direction.FORWARD, max_radix, prec,
                                 use_3m)
        self._inv = build_c2c_1d(L, Direction.BACKWARD, max_radix, prec,
                                 use_3m)
        self._tabs = _czt_tables(self.n, m, self.w, self.a, L)

        def core(xr, xi):
            unr, uni, ckr, cki, vhr, vhi = [jnp.asarray(t)[None]
                                            for t in self._tabs]
            ur, ui = cmul_elem(xr, xi, unr, uni)
            pad = [(0, 0), (0, L - self.n)]
            fr, fi = self._fwd(jnp.pad(ur, pad), jnp.pad(ui, pad))
            gr, gi = cmul_elem(fr, fi, vhr, vhi)
            cr, ci = self._inv(gr, gi)
            s = jnp.float32(1.0 / L)
            return cmul_elem(cr[:, :m] * s, ci[:, :m] * s, ckr, cki)

        self._core = core
        self._jitted = {}  # (ndim, axis) -> compiled executor

    def _executor(self, ndim: int, axis: int):
        """One jitted executor per (ndim, axis) — plan reuse must not
        retrace (jax caches by jitted-function identity, so the closure
        is built once and memoized here)."""
        key = (ndim, axis)
        fn = self._jitted.get(key)
        if fn is None:
            def run(xr, xi):
                mr = jnp.moveaxis(xr, axis, -1)
                mi = jnp.moveaxis(xi, axis, -1)
                lead = mr.shape[:-1]
                yr, yi = self._core(mr.reshape(-1, self.n),
                                    mi.reshape(-1, self.n))
                yr = jnp.moveaxis(yr.reshape(*lead, self.m), -1, axis)
                yi = jnp.moveaxis(yi.reshape(*lead, self.m), -1, axis)
                return yr, yi
            fn = jax.jit(run)
            self._jitted[key] = fn
        return fn

    def __call__(self, x, axis: int = -1):
        # split re/im at the boundary (axon transports cannot move
        # complex buffers host<->device; same convention as Plan)
        sx = as_split(x, jnp.float32)
        axis = axis % sx.re.ndim
        if sx.re.shape[axis] != self.n:
            raise ValueError(f"axis {axis} has length {sx.re.shape[axis]}, "
                             f"planned n={self.n}")
        yr, yi = self._executor(sx.re.ndim, axis)(sx.re, sx.im)
        return from_split(SplitComplex(yr, yi), jnp.complex64)


@functools.lru_cache(maxsize=64)
def _cached_czt(n, m, w, a) -> CZT:
    """Bounded plan cache (frequency sweeps create many (w, a) pairs;
    each plan pins compiled executors, so the cache must evict)."""
    return CZT(n, m, w, a)


def czt(x, m: Optional[int] = None, w: Optional[complex] = None,
        a: complex = 1 + 0j, *, axis: int = -1):
    """One-shot chirp-z transform (``scipy.signal.czt`` semantics)."""
    n = int(np.shape(x)[axis])  # no asarray: complex numpy stays on host
    m = n if m is None else int(m)
    w = complex(w) if w is not None else complex(np.exp(-2j * np.pi / m))
    return _cached_czt(n, m, w, complex(a))(x, axis=axis)


def _zoom_params(n, fn, m, fs, endpoint):
    if np.ndim(fn) == 0:
        f1, f2 = 0.0, float(fn)
    else:
        f1, f2 = (float(v) for v in fn)
    m = n if m is None else int(m)
    step = (f2 - f1) / (m - 1 if endpoint and m > 1 else m)
    w = complex(np.exp(-2j * np.pi * step / fs))
    a = complex(np.exp(2j * np.pi * f1 / fs))
    return m, w, a


class ZoomFFT(CZT):
    """Zoom FFT over the band [f1, f2) (``scipy.signal.ZoomFFT`` analog)."""

    def __init__(self, n: int, fn, m: Optional[int] = None, *, fs: float = 2,
                 endpoint: bool = False):
        m, w, a = _zoom_params(n, fn, m, fs, endpoint)
        super().__init__(n, m, w, a)


def zoom_fft(x, fn, m: Optional[int] = None, *, fs: float = 2,
             endpoint: bool = False, axis: int = -1):
    """One-shot zoom FFT (``scipy.signal.zoom_fft`` semantics); plans
    are cached per (n, m, w, a) like :func:`czt`."""
    n = int(np.shape(x)[axis])
    m, w, a = _zoom_params(n, fn, m, fs, endpoint)
    return _cached_czt(n, m, w, a)(x, axis=axis)
