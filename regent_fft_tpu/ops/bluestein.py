"""Bluestein chirp-z transform for sizes with large prime factors.

Re-derivation of ``/root/reference/fftw-3.3.8/dft/bluestein.c`` (the
reference's non-smooth-size fallback inside FFTW) as a TPU-friendly
convolution: using nk = (n^2 + k^2 - (k-n)^2)/2,

    X[k] = c[k] * sum_n (x[n] c[n]) * conj(c[k-n]),   c[j] = e^{sign*pi*i*j^2/N}

i.e. a linear convolution of a = x*c with h[j] = conj(c[j]) (even in j),
evaluated via a circular convolution of 5-smooth length M >= 2N-1 so the
inner FFTs are plain mixed-radix matmul stages.

The kernel spectrum H = FFT_M(h) is precomputed on the host in float64
(matching FFTW, which measures/plans the inner transforms once per plan) —
runtime cost is 2 smooth FFTs + O(M) elementwise work.

Rader's algorithm (``fftw-3.3.8/dft/rader.c``) lives in ``ops/rader.py``;
the planner chooses between them by ENGINE, not operation count
(``factor.plan_factors``): Bluestein wins whenever its pow2 pad m rides
the butterfly kernels (measured p=1009: 0.085 ms vs Rader's 0.156 —
the m=2048 kernel convolution beats the L=1008 einsum one despite ~2x
the flops), while Rader wins when its own L = p-1 is a kernel-range
pow2 (p=257) or when both engines fall back to einsum (p=2053).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import Direction
from . import twiddle as _twiddle
from .stockham import cmul_elem


@functools.lru_cache(maxsize=256)
def _bluestein_tables(n: int, m: int, sign: int, dtype=np.float32):
    """Host-side f64 precompute: chirp c[0:n] and kernel spectrum H[0:m]."""
    cr64, ci64 = _twiddle.chirp(n, sign, np.float64)
    c = cr64 + 1j * ci64                    # complex128 chirp
    h = np.zeros(m, dtype=np.complex128)
    h[:n] = np.conj(c)
    h[m - n + 1:] = np.conj(c)[1:][::-1]    # h[m-j] = conj(c[j]), j=1..n-1
    hhat = np.fft.fft(h)                     # float64 reference FFT at plan time
    return (
        c.real.astype(dtype), c.imag.astype(dtype),
        hhat.real.astype(dtype), hhat.imag.astype(dtype),
    )


def _inner_kernel_pair(m: int, direction: Direction):
    """(B, m) butterfly-kernel FFT for the inner transforms, or None.

    When the padded size m is a power of two on TPU, the Stockham VPU
    kernel runs the inner transforms ~2.4x faster than the einsum path
    (the reason :func:`~regent_fft_tpu.ops.factor.plan_factors` prefers
    pow2 padding in kernel range) — the Bluestein analog of FFTW
    planning its inner problems through the full solver registry
    (``fftw-3.3.8/dft/bluestein.c`` calls ``X(mkplan_d)``)."""
    import os
    import jax
    if (jax.default_backend() == "tpu"
            and os.environ.get("REGENT_FFT_BLUESTEIN_KERNEL", "1") != "0"
            and m >= 64 and (m & (m - 1)) == 0):
        from . import pallas_stockham as _ps
        if m <= _ps.MAX_LAST_N:
            def fn(zr, zi, _d=direction):
                return _ps.fft_axis_stockham(zr, zi, -1, _d)
            return fn
    return None


def build_bluestein_1d(n: int, direction: Direction, m: int,
                       max_radix: int, precision, use_3m: bool = False):
    """Build fn((B, n) re, im) -> (re, im): unscaled DFT via chirp-z."""
    from .stockham import build_c2c_1d  # circular at module load otherwise

    sign = int(direction)
    # Inner transforms are always smooth-size mixed radix, never Bluestein.
    fwd = build_c2c_1d(m, Direction.FORWARD, max_radix, precision, use_3m)
    inv = build_c2c_1d(m, Direction.BACKWARD, max_radix, precision, use_3m)
    kfwd = _inner_kernel_pair(m, Direction.FORWARD)
    kinv = _inner_kernel_pair(m, Direction.BACKWARD)

    def fn(xr, xi):
        dt = np.float64 if xr.dtype == jnp.float64 else np.float32
        # the butterfly kernels are f32-only; f64 keeps the einsum path
        f, g = ((kfwd, kinv) if kfwd is not None and dt == np.float32
                else (fwd, inv))
        cr_np, ci_np, hr_np, hi_np = _bluestein_tables(n, m, sign, dt)
        inv_scale = dt(1.0 / m)
        b = xr.shape[0]
        cr = jnp.asarray(cr_np)[None]
        ci = jnp.asarray(ci_np)[None]
        ar, ai = cmul_elem(xr, xi, cr, ci)           # a = x * c
        pad = [(0, 0), (0, m - n)]
        ar = jnp.pad(ar, pad)
        ai = jnp.pad(ai, pad)
        fr, fi = f(ar, ai)                            # FFT_M(a)
        gr, gi = cmul_elem(fr, fi, jnp.asarray(hr_np)[None], jnp.asarray(hi_np)[None])
        vr, vi = g(gr, gi)                            # IFFT_M (unscaled)
        vr = vr[:, :n] * inv_scale
        vi = vi[:, :n] * inv_scale
        return cmul_elem(vr, vi, cr, ci)              # X = c * conv
    return fn
