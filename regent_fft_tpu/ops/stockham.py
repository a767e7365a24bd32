"""Mixed-radix matmul-form FFT core (split re/im, MXU-friendly).

This is the TPU re-design of the reference's entire compute path: where
Regent-FFT hands raw pointers to FFTW codelets / cuFFT
(``/root/reference/src/fft.rg:574-608``), we express the transform as a
static schedule of MXU matmul stages:

    N = r_1 * r_2 * ... * r_k   (each r_i <= 128)

Each stage contracts a radix-r DFT matrix against one axis of the working
array (one MXU pass) followed by an elementwise twiddle multiply that XLA
fuses into the surrounding ops.  A direct N<=128 DFT is a single matmul —
the matmul *is* the codelet (``fftw-3.3.8/dft/scalar/codelets`` analog).

All arithmetic is on split (re, im) float planes: TPU vector/matrix units
have no complex type, and splitting lets us pick the 4-matmul (accurate) or
3-matmul Karatsuba (fast) complex product explicitly.

Derivation (Cooley-Tukey, decimation-in-time over rows):
  with n = n1*N2 + n2 and k = k1 + N1*k2,
  X[k1 + N1*k2] = sum_{n2} W_{N2}^{n2 k2} [ W_N^{k1 n2}
                     * sum_{n1} x[n1*N2 + n2] W_{N1}^{n1 k1} ]
i.e. reshape to (N1, N2) -> DFT columns -> twiddle -> DFT rows -> transpose.
This mirrors ``fftw-3.3.8/dft/ct.c`` re-derived in matmul form.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import Direction
from . import factor as _factor
from . import twiddle as _twiddle

Pair = Tuple[jax.Array, jax.Array]


def _tab_dtype(v):
    """Numpy table dtype matching the traced compute dtype (f32/f64)."""
    return np.float64 if v.dtype == jnp.float64 else np.float32


def _pref(v):
    return v.dtype


def _dot(a, b, precision):
    return jnp.dot(a, b, preferred_element_type=a.dtype, precision=precision)


def cmul_mat(ar, ai, br, bi, precision, use_3m=False):
    """Complex matmul of split operands: (ar+i*ai) @ (br+i*bi).

    4M variant: 4 real matmuls, best accuracy.
    3M (Karatsuba) variant: 3 matmuls + extra adds, ~25% fewer MXU flops,
    slightly worse rounding — used for the bf16/complex32 path.
    """
    if use_3m:
        t1 = _dot(ar, br, precision)
        t2 = _dot(ai, bi, precision)
        t3 = _dot(ar + ai, br + bi, precision)
        return t1 - t2, t3 - t1 - t2
    yr = _dot(ar, br, precision) - _dot(ai, bi, precision)
    yi = _dot(ar, bi, precision) + _dot(ai, br, precision)
    return yr, yi


def cmul_elem(ar, ai, br, bi):
    """Elementwise complex multiply of split operands (VPU, fused by XLA)."""
    return ar * br - ai * bi, ar * bi + ai * br


def direct_dft(xr, xi, n: int, sign: int, precision, use_3m=False) -> Pair:
    """Direct DFT over the last axis via one dense-matrix matmul (n<=128)."""
    dr, di = _twiddle.dft_matrix(n, sign, _tab_dtype(xr))
    return cmul_mat(xr, xi, jnp.asarray(dr), jnp.asarray(di), precision, use_3m)


def mixed_radix_fft(xr, xi, n: int, factors, sign: int, precision, use_3m=False) -> Pair:
    """DFT over the last axis of (B, n) arrays via recursive matmul stages.

    ``factors`` is the radix schedule from :func:`factor.factorize`
    (largest-first, each <= 128).  The recursion unrolls at trace time into
    len(factors) matmul stages with twiddle multiplies between them.
    """
    if len(factors) == 1:
        return direct_dft(xr, xi, n, sign, precision, use_3m)
    n1 = factors[0]
    n2 = n // n1
    b = xr.shape[0]
    xr = xr.reshape(b, n1, n2)
    xi = xi.reshape(b, n1, n2)

    # Stage 1: DFT of size n1 along axis 1 (columns).  Contract with the
    # dense DFT matrix: A[b, k1, n2] = sum_n1 D[n1, k1] * x[b, n1, n2].
    dr, di = _twiddle.dft_matrix(n1, sign, _tab_dtype(xr))
    dr = jnp.asarray(dr)
    di = jnp.asarray(di)

    def _contract(v, m):
        return jnp.einsum("bnm,nk->bkm", v, m,
                          preferred_element_type=v.dtype,
                          precision=precision)

    if use_3m:
        t1r = _contract(xr, dr)
        t2r = _contract(xi, di)
        t3 = _contract(xr + xi, dr + di)
        ar_, ai_ = t1r - t2r, t3 - t1r - t2r
    else:
        ar_ = _contract(xr, dr) - _contract(xi, di)
        ai_ = _contract(xr, di) + _contract(xi, dr)

    # Twiddle: W_N^{k1 * n2}, table shape (n1, n2) broadcast over batch.
    tr, ti = _twiddle.twiddle_outer(n1, n2, n, sign, _tab_dtype(ar_))
    ar_, ai_ = cmul_elem(ar_, ai_, jnp.asarray(tr)[None], jnp.asarray(ti)[None])

    # Stage 2: recurse over the n2 axis with batch b*n1.
    cr, ci = mixed_radix_fft(
        ar_.reshape(b * n1, n2), ai_.reshape(b * n1, n2),
        n2, factors[1:], sign, precision, use_3m,
    )
    # Output index is k1 + N1*k2: flatten as [k2, k1].
    cr = cr.reshape(b, n1, n2).transpose(0, 2, 1).reshape(b, n)
    ci = ci.reshape(b, n1, n2).transpose(0, 2, 1).reshape(b, n)
    return cr, ci


_EINSUM_LETTERS = "abcdefghijklmnopqrstuvwxy"


def direct_dft_axis(xr, xi, axis: int, n: int, sign: int, precision,
                    use_3m: bool = False) -> Pair:
    """Direct DFT along ``axis`` of an N-D array via ONE einsum contraction.

    No moveaxis, no reshape, no twiddle: XLA fuses the layout permutation
    into the dot, so an axis pass costs a single read+write of the array —
    the minimum possible.  O(n^2) matmul flops are cheap on the MXU for
    n up to ~512, where this beats the mixed-radix pipeline's extra
    materializations (measured in docs/tpu_notes.md).
    """
    ndim = xr.ndim
    axis = axis % ndim
    dr, di = _twiddle.dft_matrix(n, sign, _tab_dtype(xr))
    dr = jnp.asarray(dr)
    di = jnp.asarray(di)
    ix = _EINSUM_LETTERS[:ndim]
    out = ix[:axis] + "z" + ix[axis + 1:]
    expr = f"{ix},{ix[axis]}z->{out}"

    return _cplx_einsum(expr, xr, xi, dr, di, precision, use_3m)


def _cplx_einsum(expr, vr, vi, mr, mi, precision, use_3m=False) -> Pair:
    """Complex einsum contraction ``(vr + i vi) . (mr + i mi)`` where
    ``expr`` contracts one operand letter against the matrix's first axis
    and emits 'z' (the matrix's second axis) in its place.

    Scheme per :func:`_xla_cmul_scheme`; 'h4' issues ONE einsum on
    K-concatenated operands with the paired matrix [[mr, mi], [-mi, mr]]
    and splits [yr | yi] from the doubled z axis.
    """
    def _c(v, m):
        return jnp.einsum(expr, v, m, preferred_element_type=v.dtype,
                          precision=precision)

    if use_3m:
        t1 = _c(vr, mr)
        t2 = _c(vi, mi)
        t3 = _c(vr + vi, mr + mi)
        return t1 - t2, t3 - t1 - t2
    if _xla_cmul_scheme() == "h4":
        lhs, rest = expr.split(",")
        kpos = lhs.index(rest[0])      # contracted letter's operand axis
        v2 = jnp.concatenate([vr, vi], axis=kpos)
        m2 = jnp.concatenate(
            [jnp.concatenate([mr, mi], axis=1),
             jnp.concatenate([-mi, mr], axis=1)], axis=0)
        y2 = _c(v2, m2)
        zpos = expr.split("->")[1].index("z")
        nz = mr.shape[1]
        tak = [slice(None)] * y2.ndim
        tak[zpos] = slice(0, nz)
        yr = y2[tuple(tak)]
        tak[zpos] = slice(nz, 2 * nz)
        return yr, y2[tuple(tak)]
    return _c(vr, mr) - _c(vi, mi), _c(vr, mi) + _c(vi, mr)


def _xla_cmul_scheme() -> str:
    """Complex-contraction form of the XLA einsum stages: '4m' (four
    dots), '3m' (Karatsuba — the bf16 path), or 'h4' (ONE dot: the split
    operands concatenate along the contracted axis and the paired DFT
    matrix [[mr, mi], [-mi, mr]] produces [yr | yi] stacked along the
    output axis — a 2K x 2N dispatch instead of four K x N ones, fixing
    the small-K MXU underutilization that makes non-pow2 radices slow;
    same trick as the Pallas kernels' h4 tails, docs/tpu_notes.md r4)."""
    import os
    return os.environ.get("REGENT_FFT_XLA_CMUL", "h4")


def mixed_radix_fft_axis(xr, xi, axis: int, n: int, n1: int, sign: int,
                         precision, use_3m: bool = False) -> Pair:
    """Two-stage Cooley-Tukey along ``axis`` of an N-D array, in place.

    Splits the axis into (n1, n2) sub-axes by a free reshape, contracts
    each sub-axis with its DFT matrix via einsum (XLA fuses the layout into
    the dot — no moveaxis), multiplies the (n1, n2) twiddle broadcast in
    between, and finishes with the single digit-reversal transpose of the
    two sub-axes.  Three read+write passes per axis versus the flattened
    pipeline's five-plus; n^2-direct's one pass but with O(n1+n2) flops
    per element instead of O(n).
    """
    ndim = xr.ndim
    axis = axis % ndim
    n2 = n // n1
    shape = xr.shape
    split = shape[:axis] + (n1, n2) + shape[axis + 1:]
    xr = xr.reshape(split)
    xi = xi.reshape(split)
    nd2 = ndim + 1

    ix = _EINSUM_LETTERS[:nd2]
    # stage 1: contract the n1 sub-axis (position `axis`)
    e1 = f"{ix},{ix[axis]}z->{ix[:axis]}z{ix[axis + 1:]}"
    # stage 2: contract the n2 sub-axis (position `axis+1`)
    e2 = f"{ix},{ix[axis + 1]}z->{ix[:axis + 1]}z{ix[axis + 2:]}"

    td = _tab_dtype(xr)
    d1r, d1i = map(jnp.asarray, _twiddle.dft_matrix(n1, sign, td))
    d2r, d2i = map(jnp.asarray, _twiddle.dft_matrix(n2, sign, td))
    twr, twi = _twiddle.twiddle_outer(n1, n2, n, sign, td)  # (k1, nu2)
    tshape = (1,) * axis + (n1, n2) + (1,) * (ndim - 1 - axis)
    twr = jnp.asarray(twr).reshape(tshape)
    twi = jnp.asarray(twi).reshape(tshape)

    def _c(expr, v, m):
        return jnp.einsum(expr, v, m, preferred_element_type=v.dtype,
                          precision=precision)

    def _cplx(expr, vr, vi, mr, mi):
        return _cplx_einsum(expr, vr, vi, mr, mi, precision, use_3m)

    ar, ai = _cplx(e1, xr, xi, d1r, d1i)                    # k1 in place
    ar, ai = ar * twr - ai * twi, ar * twi + ai * twr       # W_n^{k1 nu2}
    cr, ci = _cplx(e2, ar, ai, d2r, d2i)                    # k2 in place
    # k = k1 + n1*k2: flatten [k2, k1] -> swap the sub-axes.
    cr = cr.swapaxes(axis, axis + 1).reshape(shape)
    ci = ci.swapaxes(axis, axis + 1).reshape(shape)
    return cr, ci


def best_two_factor(n: int, max_radix: int = _factor.DEFAULT_MAX_RADIX):
    """Most balanced split n = n1*n2 with both <= max_radix (None if none)."""
    best = None
    f = int(math.isqrt(n))
    while f >= 2:
        if n % f == 0 and f <= max_radix and n // f <= max_radix:
            return (max(f, n // f), min(f, n // f))
        f -= 1
    return best


def build_c2c_1d(n: int, direction: Direction, max_radix: int = _factor.DEFAULT_MAX_RADIX,
                 precision=jax.lax.Precision.HIGHEST, use_3m: bool = False,
                 planner: str = "estimate"):
    """Build fn((B, n) re, im) -> (re, im) computing an unscaled DFT.

    Dispatches direct / mixed-radix / Bluestein, the static analog of
    FFTW's planner choosing among solvers (``fftw-3.3.8/kernel/planner.c``);
    ``planner`` selects the schedule search rigor (see factor.schedule).
    """
    sign = int(direction)
    kind, info = _factor.plan_factors(n, max_radix, planner)
    if kind == "direct":
        def fn(xr, xi):
            return direct_dft(xr, xi, n, sign, precision, use_3m)
        return fn
    if kind == "mixed":
        factors = info

        def fn(xr, xi):
            return mixed_radix_fft(xr, xi, n, factors, sign, precision, use_3m)
        return fn
    if kind == "rader":
        # Prime n with smooth n-1: length-(n-1) cyclic convolution.
        from . import rader as _rader
        return _rader.build_rader_1d(n, direction, max_radix, precision, use_3m)
    # Bluestein fallback for sizes with prime factors > max_radix.
    from . import bluestein as _bluestein
    return _bluestein.build_bluestein_1d(n, direction, info, max_radix, precision, use_3m)


@functools.lru_cache(maxsize=512)
def schedule_description(n: int, max_radix: int = _factor.DEFAULT_MAX_RADIX) -> str:
    """Human-readable schedule, for Plan.print_plan (fftw_print_plan analog)."""
    kind, info = _factor.plan_factors(n, max_radix)
    if kind == "direct":
        return f"direct-dft-{n} (1 matmul)"
    if kind == "mixed":
        stages = " -> ".join(f"radix-{r}" for r in info)
        return f"mixed({n} = {'*'.join(map(str, info))}): {stages}"
    if kind == "rader":
        return f"rader({n}, conv={info}: {schedule_description(info, max_radix)})"
    return f"bluestein({n}, conv={info}: {schedule_description(info, max_radix)})"
