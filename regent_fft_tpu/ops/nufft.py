"""Non-uniform FFT (NUFFT), types 1, 2, and 3, dims 1-3.

The reference wrapper (and FFTW/cuFFT behind it) transforms uniform
grids only; real deployments (MRI, radio astronomy, cosmology particle
meshes) need nonuniform sample points.  This layer implements the
Dutt-Rokhlin / Greengard-Lee Gaussian-gridding NUFFT (Greengard & Lee,
SIAM Review 46(3), 2004) the TPU-first way:

* spreading/interpolation are dense gather/scatter-add over a static
  (2p+1)^d tap stencil — XLA-native, batched over any leading axes,
  fully jittable (static shapes: nj and n_modes fix the program);
* the oversampled-grid FFT rides this framework's plan machinery
  (butterfly kernels on TPU);
* the Gaussian deconvolution factors are host-precomputed in f64 like
  every other table in this package (``ops/twiddle.py`` convention).

Conventions (finufft-compatible):
  type 1 (nonuniform -> uniform modes):
      f_k = sum_j c_j exp(isign * i * k . x_j),  k in [-N/2, N/2)
  type 2 (uniform modes -> nonuniform points):
      c_j = sum_k f_k exp(isign * i * k . x_j)
  type 3 (nonuniform points -> nonuniform frequencies):
      f_k = sum_j c_j exp(isign * i * s_k . x_j),  x and s arbitrary reals
with x in [-pi, pi) for types 1/2 (any values accepted; wrapped mod
2pi) and unrestricted for type 3 (the grid scales to max|x|*max|s|).

Accuracy: the Gaussian kernel with oversampling R=2 and p one-sided
taps gives ~1e-6 relative at p=6 in f32 (tail truncation ~e^{-pi p/2});
``eps`` selects p.  Verified against the direct NDFT in
``tests/test_nufft.py``.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nufft1d1", "nufft1d2", "nufft2d1", "nufft2d2",
           "nufft3d1", "nufft3d2", "nufft1d3", "nufft2d3", "nufft3d3"]

_R = 2  # oversampling ratio (Greengard-Lee recommended)


def _taps_for_eps(eps: float) -> int:
    """One-sided tap count p: truncation error ~ exp(-pi*p/2) (GL eq. 9
    neighborhood), floored at 3, capped at 12 (f32 floor ~1e-7)."""
    p = int(math.ceil(-math.log(max(eps, 1e-12)) / (math.pi / 2) / 2)) + 1
    return max(3, min(12, p))


def _tau(n: int, p: int) -> float:
    """Gaussian width: GL 2004 eq. (10) with R=2: tau = p / n^2 *
    pi / (R (R - 0.5))."""
    return math.pi * p / (n * n * _R * (_R - 0.5))


def _grid_1d(x, n: int, p: int, tau: float):
    """Tap indices (nj, 2p) into the M_r = R*n grid and Gaussian weights.

    2p taps centered on x: the nearest grid point and p-1/p neighbors
    either side (GL spread all points within p cells).
    """
    mr = _R * n
    h = 2.0 * math.pi / mr
    xw = jnp.mod(x, 2.0 * math.pi)          # [0, 2pi)
    m0 = jnp.floor(xw / h).astype(jnp.int32)
    offs = jnp.arange(-(p - 1), p + 1, dtype=jnp.int32)   # 2p taps
    idx = (m0[..., None] + offs) % mr                      # (nj, 2p)
    dist = xw[..., None] - (m0[..., None] + offs).astype(x.dtype) * h
    w = jnp.exp(-(dist * dist) / (4.0 * tau))              # (nj, 2p)
    return idx, w


def _spread_grid(ys, cr, ci, ns, p: int):
    """Gaussian scatter-add spread of (cr, ci) at points ``ys`` onto the
    FLAT oversampled grid (length prod(2 ns)); the single spread body
    behind types 1 and 3 in every dimension."""
    if len(ns) == 1:
        idx, w = _grid_1d(ys[0], ns[0], p, _tau(ns[0], p))
        total = _R * ns[0]
    else:
        idx, w = _nd_tap_product(ys, ns, p)
        total = int(np.prod([_R * n for n in ns]))
    sr = cr[..., :, None] * w
    si = ci[..., :, None] * w
    flat = idx.reshape(-1)
    gr = jnp.zeros(sr.shape[:-2] + (total,), jnp.float32)
    gi = jnp.zeros(si.shape[:-2] + (total,), jnp.float32)
    gr = gr.at[..., flat].add(sr.reshape(sr.shape[:-2] + (-1,)))
    gi = gi.at[..., flat].add(si.reshape(si.shape[:-2] + (-1,)))
    return gr, gi


@partial(jax.jit, static_argnums=(3, 4))
def _spread_jit(ys, cr, ci, ns, p: int):
    return _spread_grid(ys, cr, ci, ns, p)


def _deconv_1d(n: int, tau: float) -> np.ndarray:
    """sqrt(pi/tau) * exp(k^2 tau) for k = -n/2 .. n/2-1 (f64 host)."""
    k = np.arange(-(n // 2), (n + 1) // 2, dtype=np.float64)
    return (math.sqrt(math.pi / tau) * np.exp(k * k * tau)).astype(
        np.float64)


def _mode_slices(n: int, mr: int):
    """Positions of modes k=-n/2..n/2-1 inside the length-mr DFT output
    (standard DFT order: k >= 0 at [0, n/2), k < 0 at [mr - n/2, mr))."""
    neg = slice(mr - n // 2, mr)
    pos = slice(0, (n + 1) // 2)
    return neg, pos


def _c2c_core(shape, ndim: int, inverse: bool):
    """Split-plane complex64 C2C core over the trailing ``ndim`` axes.

    NOT the one-shot API: a SplitComplex argument there signals the
    complex32 (bf16) fast path — the NUFFT grid must transform at full
    f32 (measured: the bf16 path costs 2.3e-3 relative on the result).
    """
    from ..dtypes import Direction, Kind, Norm
    from ..plan import PlanSpec, _build_core
    nd = len(shape)
    spec = PlanSpec(shape=tuple(shape), axes=tuple(range(nd - ndim, nd)),
                    kind=Kind.C2C,
                    direction=(Direction.BACKWARD if inverse
                               else Direction.FORWARD),
                    norm=Norm.BACKWARD if inverse else Norm.NONE,
                    dtype="complex64")
    return _build_core(spec)


def _fft_1d(gr, gi, inverse: bool):
    return _c2c_core(gr.shape, 1, inverse)(gr, gi)


@partial(jax.jit, static_argnums=(3, 4, 5))
def _nufft1d1_impl(x, cr, ci, n: int, isign: int, p: int):
    tau = _tau(n, p)
    mr = _R * n
    gr, gi = _spread_grid((x,), cr, ci, (n,), p)
    # f_k = sqrt(pi/tau) e^{k^2 tau} * DFT_coeff(k); with isign=+1 the
    # analysis integral (1/2pi) int f e^{-ikx} pairs with e^{+ikx_j}
    # synthesis, i.e. the FORWARD DFT of the grid divided by mr ... the
    # (1/mr) and (2pi) factors cancel into the coefficient form below.
    gr2, gi2 = _fft_1d(gr, gi, inverse=(isign > 0))
    if isign > 0:
        # ifft includes 1/mr; coefficient sum needs plain sum -> * mr
        gr2 = gr2 * float(mr)
        gi2 = gi2 * float(mr)
    neg, pos = _mode_slices(n, mr)
    fr = jnp.concatenate([gr2[..., neg], gr2[..., pos]], axis=-1)
    fi = jnp.concatenate([gi2[..., neg], gi2[..., pos]], axis=-1)
    d = jnp.asarray(_deconv_1d(n, tau) / mr, jnp.float32)
    return fr * d, fi * d


@partial(jax.jit, static_argnums=(3, 4))
def _nufft1d2_impl(x, fr, fi, isign: int, p: int):
    n = fr.shape[-1]
    tau = _tau(n, p)
    mr = _R * n
    d = jnp.asarray(_deconv_1d(n, tau) / mr, jnp.float32)
    fr = fr * d
    fi = fi * d
    neg, pos = _mode_slices(n, mr)
    gr = jnp.zeros(fr.shape[:-1] + (mr,), jnp.float32)
    gi = jnp.zeros(fi.shape[:-1] + (mr,), jnp.float32)
    gr = gr.at[..., neg].set(fr[..., :n // 2])
    gr = gr.at[..., pos].set(fr[..., n // 2:])
    gi = gi.at[..., neg].set(fi[..., :n // 2])
    gi = gi.at[..., pos].set(fi[..., n // 2:])
    # the DFT matrix is symmetric, so the adjoint uses the SAME
    # exponential sign as type 1: isign=+1 -> e^{+ikx} synthesis
    gr2, gi2 = _fft_1d(gr, gi, inverse=(isign > 0))
    if isign > 0:
        gr2 = gr2 * float(mr)
        gi2 = gi2 * float(mr)
    idx, w = _grid_1d(x, n, p, tau)                       # (nj, 2p)
    cr = jnp.sum(gr2[..., idx] * w, axis=-1)
    ci = jnp.sum(gi2[..., idx] * w, axis=-1)
    return cr, ci


def _split_in(c):
    from ..dtypes import as_split
    s = as_split(c, jnp.float32)
    return s.re, s.im


def _join_out(r, i):
    from ..dtypes import SplitComplex, from_split
    return from_split(SplitComplex(r, i), jnp.complex64)


def nufft1d1(x, c, n_modes: int, isign: int = 1, eps: float = 1e-6):
    """Type-1 (adjoint) NUFFT: nonuniform samples -> ``n_modes`` Fourier
    modes, f_k = sum_j c_j e^{isign i k x_j}, k = -N/2..N/2-1."""
    p = _taps_for_eps(eps)
    x = jnp.asarray(x, jnp.float32)
    cr, ci = _split_in(c)
    fr, fi = _nufft1d1_impl(x, cr, ci, int(n_modes), int(isign), p)
    return _join_out(fr, fi)


def nufft1d2(x, f, isign: int = 1, eps: float = 1e-6):
    """Type-2 (forward) NUFFT: Fourier modes -> nonuniform samples,
    c_j = sum_k f_k e^{isign i k x_j}."""
    p = _taps_for_eps(eps)
    x = jnp.asarray(x, jnp.float32)
    fr, fi = _split_in(f)
    cr, ci = _nufft1d2_impl(x, fr, fi, int(isign), p)
    return _join_out(cr, ci)


# ---------------------------------------------------------------------------
# 2-D / 3-D: separable Gaussian taps, one fused scatter/gather over the
# (2p)^d stencil; the uniform FFT is this package's plan-backed fftn.
# ---------------------------------------------------------------------------
def _fft_nd(gr, gi, inverse: bool, ndim: int):
    return _c2c_core(gr.shape, ndim, inverse)(gr, gi)


def _nd_tap_product(coords, ns, p):
    """Per-dim taps -> flat stencil indices/weights.

    Returns (idx, w): idx (nj, T) flat indices into the oversampled
    grid (row-major over dims), w (nj, T) separable Gaussian weights,
    T = (2p)^d.
    """
    idxs, ws, strides = [], [], []
    stride = 1
    mrs = [_R * n for n in ns]
    for mr in reversed(mrs):
        strides.append(stride)
        stride *= mr
    strides = list(reversed(strides))
    for x, n, st in zip(coords, ns, strides):
        tau = _tau(n, p)
        ix, w = _grid_1d(x, n, p, tau)
        idxs.append(ix.astype(jnp.int32) * st)
        ws.append(w)
    d = len(ns)
    if d == 2:
        idx = idxs[0][:, :, None] + idxs[1][:, None, :]
        w = ws[0][:, :, None] * ws[1][:, None, :]
    else:
        idx = (idxs[0][:, :, None, None] + idxs[1][:, None, :, None]
               + idxs[2][:, None, None, :])
        w = (ws[0][:, :, None, None] * ws[1][:, None, :, None]
             * ws[2][:, None, None, :])
    nj = idx.shape[0]
    return idx.reshape(nj, -1), w.reshape(nj, -1)


def _deconv_nd(ns, p):
    d = None
    for n in ns:
        tau = _tau(n, p)
        dk = _deconv_1d(n, tau) / (_R * n)
        d = dk if d is None else np.multiply.outer(d, dk)
    return d.astype(np.float64)


def _center_from_dft(g, ns, mrs):
    """Extract modes -n/2..n/2-1 per axis from DFT-ordered oversampled
    output (roll the negative block next to the positive block)."""
    for ax, (n, mr) in enumerate(zip(ns, mrs)):
        a = ax - len(ns)
        neg = jax.lax.slice_in_dim(g, mr - n // 2, mr, axis=a)
        pos = jax.lax.slice_in_dim(g, 0, (n + 1) // 2, axis=a)
        g = jnp.concatenate([neg, pos], axis=a)
    return g


def _embed_to_dft(f, ns, mrs):
    """Adjoint of :func:`_center_from_dft`: place centered modes into the
    oversampled DFT-ordered grid (zero elsewhere)."""
    for ax, (n, mr) in enumerate(zip(ns, mrs)):
        a = ax - len(ns)
        half = n // 2
        negpart = jax.lax.slice_in_dim(f, 0, half, axis=a)
        pospart = jax.lax.slice_in_dim(f, half, n, axis=a)
        padcfg = [(0, 0, 0)] * f.ndim
        padcfg[a] = (0, mr - n + half, 0)
        pos = jax.lax.pad(pospart, jnp.asarray(0.0, f.dtype),
                          padcfg)
        padcfg[a] = (mr - half, 0, 0)
        neg = jax.lax.pad(negpart, jnp.asarray(0.0, f.dtype), padcfg)
        f = pos + neg
    return f


@partial(jax.jit, static_argnums=(4, 5, 6))
def _nufftnd1_impl(coords, cr, ci, _unused, ns, isign: int, p: int):
    mrs = tuple(_R * n for n in ns)
    total = int(np.prod(mrs))
    gr, gi = _spread_grid(coords, cr, ci, ns, p)
    gr = gr.reshape(gr.shape[:-1] + mrs)
    gi = gi.reshape(gi.shape[:-1] + mrs)
    gr2, gi2 = _fft_nd(gr, gi, inverse=(isign > 0), ndim=len(ns))
    if isign > 0:
        gr2 = gr2 * float(total)
        gi2 = gi2 * float(total)
    fr = _center_from_dft(gr2, ns, mrs)
    fi = _center_from_dft(gi2, ns, mrs)
    d = jnp.asarray(_deconv_nd(ns, p), jnp.float32)
    return fr * d, fi * d


@partial(jax.jit, static_argnums=(4, 5, 6))
def _nufftnd2_impl(coords, fr, fi, _unused, ns, isign: int, p: int):
    mrs = tuple(_R * n for n in ns)
    d = jnp.asarray(_deconv_nd(ns, p), jnp.float32)
    fr = fr * d
    fi = fi * d
    gr = _embed_to_dft(fr, ns, mrs)
    gi = _embed_to_dft(fi, ns, mrs)
    gr2, gi2 = _fft_nd(gr, gi, inverse=(isign > 0), ndim=len(ns))
    total = int(np.prod(mrs))
    if isign > 0:
        gr2 = gr2 * float(total)
        gi2 = gi2 * float(total)
    gr2 = gr2.reshape(gr2.shape[:-len(ns)] + (total,))
    gi2 = gi2.reshape(gi2.shape[:-len(ns)] + (total,))
    idx, w = _nd_tap_product(coords, ns, p)
    cr = jnp.sum(gr2[..., idx] * w, axis=-1)
    ci = jnp.sum(gi2[..., idx] * w, axis=-1)
    return cr, ci


def _nd_entry1(coords, c, ns, isign, eps):
    p = _taps_for_eps(eps)
    coords = tuple(jnp.asarray(v, jnp.float32) for v in coords)
    cr, ci = _split_in(c)
    fr, fi = _nufftnd1_impl(coords, cr, ci, None, tuple(int(n) for n in ns),
                            int(isign), p)
    return _join_out(fr, fi)


def _nd_entry2(coords, f, isign, eps, ndim):
    p = _taps_for_eps(eps)
    coords = tuple(jnp.asarray(v, jnp.float32) for v in coords)
    fr, fi = _split_in(f)
    ns = tuple(int(n) for n in fr.shape[-ndim:])
    cr, ci = _nufftnd2_impl(coords, fr, fi, None, ns, int(isign), p)
    return _join_out(cr, ci)


def nufft2d1(x, y, c, n1: int, n2: int, isign: int = 1, eps: float = 1e-6):
    """2-D type-1 NUFFT: f[k1, k2] = sum_j c_j e^{isign i (k1 x_j + k2 y_j)}."""
    return _nd_entry1((x, y), c, (n1, n2), isign, eps)


def nufft2d2(x, y, f, isign: int = 1, eps: float = 1e-6):
    """2-D type-2 NUFFT: c_j = sum_{k1,k2} f[k1,k2] e^{isign i (k1 x_j + k2 y_j)}."""
    return _nd_entry2((x, y), f, isign, eps, 2)


def nufft3d1(x, y, z, c, n1: int, n2: int, n3: int, isign: int = 1,
             eps: float = 1e-6):
    """3-D type-1 NUFFT."""
    return _nd_entry1((x, y, z), c, (n1, n2, n3), isign, eps)


def nufft3d2(x, y, z, f, isign: int = 1, eps: float = 1e-6):
    """3-D type-2 NUFFT."""
    return _nd_entry2((x, y, z), f, isign, eps, 3)


# ---------------------------------------------------------------------------
# Type 3 (nonuniform -> nonuniform): f_k = sum_j c_j e^{isign i s_k x_j}
# for arbitrary real source points x_j and target frequencies s_k.
#
# Decomposition (Lee & Greengard 2005 §4; finufft's t3 strategy):
# rescale sources into the center half of a 2pi-periodic fine grid,
# Gaussian-SPREAD them (the taps never wrap, so the non-periodicity of
# e^{i sigma x} is never violated), then the trig sum over the grid
# points is EXACTLY a type-2 NUFFT with the grid values as integer
# modes and u = isign*sigma*h as the nonuniform points; finally divide
# by the spreading Gaussian's transform per TARGET (a (nk,) vector,
# not a grid).  Aliasing control matches type 1: |u| <= pi/2 (the same
# quarter-band the R=2 oversampling protects there).
# ---------------------------------------------------------------------------
def _t3_dim_params(X: float, S: float, p: int):
    """Per-dimension type-3 parameters.

    gamma maps sources into [-pi/2, pi/2]; the grid half-size n3 keeps
    every rescaled target inside the quarter band |u| <= pi/2 and the
    Gaussian taps interior (no wraparound).
    """
    from .factor import next_fast_len
    X = max(float(X), 1e-12)
    S = max(float(S), 1e-12)
    gamma = X / (math.pi / 2.0)
    sigma_max = S * gamma
    # mr = 2*n3 >= 4*sigma_max  <=>  |u| = sigma*2pi/mr <= pi/2
    n3 = next_fast_len(max(int(math.ceil(2.0 * sigma_max)), 4 * p, 16))
    tau = _tau(n3, p)
    return gamma, n3, tau


def _t3_deconv(sigma, n3: int, tau: float):
    """h / w_hat(sigma) for the spreading Gaussian e^{-x^2/(4 tau)}:
    w_hat(s) = 2 sqrt(pi tau) e^{-s^2 tau}.  Bounded: sigma^2 tau <=
    pi p / 12 by construction (same bound as the type-1 deconvolution)."""
    mr = _R * n3
    h = 2.0 * math.pi / mr
    return (h / (2.0 * math.sqrt(math.pi * tau))) * jnp.exp(
        (sigma * sigma) * tau)


def _nd_entry3(xs, c, ss, isign, eps):
    """Shared type-3 driver: per-dim spread params, one fused spread,
    inner type-2 at u = isign*sigma*h, per-target deconvolution."""
    p = _taps_for_eps(eps)
    isign = 1 if int(isign) >= 0 else -1
    xs = tuple(jnp.asarray(v, jnp.float32) for v in xs)
    ss = tuple(jnp.asarray(v, jnp.float32) for v in ss)
    cr, ci = _split_in(c)
    # Data-dependent grid sizing happens on host (finufft sizes its fine
    # grid from max|x|, max|s| at setpts time too); the spread/FFT/interp
    # pipeline below is jitted with the resulting static shapes.
    dims = []
    for x, s in zip(xs, ss):
        X = float(jnp.max(jnp.abs(x)))
        S = float(jnp.max(jnp.abs(s)))
        dims.append(_t3_dim_params(X, S, p))
    # Sources into [pi/2, 3pi/2]: the spread taps stay interior, so the
    # non-periodicity of e^{i sigma x} is never violated by index wrap.
    ys = tuple(x / g + math.pi for x, (g, _, _) in zip(xs, dims))
    ns3 = tuple(n3 for (_, n3, _) in dims)
    gr, gi = _spread_jit(ys, cr, ci, ns3, p)
    us, d = [], 1.0
    for s, (gamma, n3, tau) in zip(ss, dims):
        sigma = s * gamma
        us.append((isign * 2.0 * math.pi / (_R * n3)) * sigma)
        d = d * _t3_deconv(sigma, n3, tau)
    if len(xs) == 1:
        vr, vi = _nufft1d2_impl(us[0], gr, gi, 1, p)
    else:
        mrs = tuple(_R * n3 for n3 in ns3)
        gr = gr.reshape(gr.shape[:-1] + mrs)
        gi = gi.reshape(gi.shape[:-1] + mrs)
        vr, vi = _nufftnd2_impl(tuple(us), gr, gi, None, mrs, 1, p)
    return _join_out(vr * d, vi * d)


def nufft1d3(x, c, s, isign: int = 1, eps: float = 1e-6):
    """Type-3 NUFFT: f_k = sum_j c_j e^{isign i s_k x_j} for arbitrary
    real points ``x`` and frequencies ``s`` (finufft ``nufft1d3``)."""
    return _nd_entry3((x,), c, (s,), isign, eps)


def nufft2d3(x, y, c, s, t, isign: int = 1, eps: float = 1e-6):
    """2-D type-3 NUFFT: f_k = sum_j c_j e^{isign i (s_k x_j + t_k y_j)}."""
    return _nd_entry3((x, y), c, (s, t), isign, eps)


def nufft3d3(x, y, z, c, s, t, u, isign: int = 1, eps: float = 1e-6):
    """3-D type-3 NUFFT: f_k = sum_j c_j
    e^{isign i (s_k x_j + t_k y_j + u_k z_j)}."""
    return _nd_entry3((x, y, z), c, (s, t, u), isign, eps)
