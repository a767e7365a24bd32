"""Verification harness: FFTW's methodology, not the reference's.

The reference "verifies" by printing arrays for eyeball inspection
(``/root/reference/test/fft_test.rg:16-93``; its compare task is commented
out at ``test/fft_test.rg:98-113``).  We instead adopt the vendored FFTW
verification model (``/root/reference/fftw-3.3.8/libbench2/verify-dft.c:
130-174`` and ``verify-lib.c``):

* **impulse**: FFT(delta at j) must equal the j-th DFT-matrix column;
* **linearity**: FFT(a*x + b*y) == a*FFT(x) + b*FFT(y);
* **time shift**: FFT(x rolled by s)[k] == FFT(x)[k] * W^{s k};
* **golden**: direct comparison against a float64 reference DFT,
  with the O(sqrt(log N))-scaled error bound from FFTW's accuracy model.

All checks report a *relative L2* error; `TOLERANCE(n)` is eps-scaled so the
same harness validates f32, f64, and complex32 paths.
"""
from __future__ import annotations

import math
from typing import Callable

import numpy as np

from ..dtypes import SplitComplex


def to_numpy_complex(y) -> np.ndarray:
    """Materialize any output representation as numpy complex128.

    Fetches complex device arrays as separate re/im planes — some TPU
    attach transports cannot transfer complex buffers directly.
    """
    if isinstance(y, SplitComplex):
        return (np.asarray(y.re, dtype=np.float64)
                + 1j * np.asarray(y.im, dtype=np.float64))
    if isinstance(y, np.ndarray):
        return y.astype(np.complex128)
    import jax
    import jax.numpy as jnp
    arr = jnp.asarray(y)
    if jnp.issubdtype(arr.dtype, jnp.complexfloating):
        re, im = _split_jit()(arr)
        return (np.asarray(re, dtype=np.float64)
                + 1j * np.asarray(im, dtype=np.float64))
    return np.asarray(arr).astype(np.complex128)


def _split_jit():
    """Jitted complex->planes splitter (eager complex ops can be flaky on
    attach transports; jitted programs with complex operands are fine)."""
    global _SPLIT_JIT
    if _SPLIT_JIT is None:
        import jax
        import jax.numpy as jnp
        _SPLIT_JIT = jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))
    return _SPLIT_JIT


_SPLIT_JIT = None


def rel_l2(a, b) -> float:
    a = to_numpy_complex(a).ravel()
    b = to_numpy_complex(b).ravel()
    denom = np.linalg.norm(b)
    if denom == 0:
        return float(np.linalg.norm(a))
    return float(np.linalg.norm(a - b) / denom)


def tolerance(n: int, dtype: str = "complex64") -> float:
    """FFTW-style error bound: C * eps * sqrt(log2 N).

    C=8 gives comfortable headroom over the observed ~1e-7 errors while
    staying below the 1e-6 verification target for all benchmark sizes.
    """
    eps = {"complex32": 2 ** -8, "complex64": 2 ** -23, "complex128": 2 ** -52}[dtype]
    return 8.0 * eps * max(1.0, math.sqrt(math.log2(max(n, 2))))


def reference_dft(x: np.ndarray, axes=None, sign: int = -1) -> np.ndarray:
    """float64 reference DFT (numpy's FFT is f64-exact for our purposes)."""
    x = to_numpy_complex(x)
    axes = tuple(range(x.ndim)) if axes is None else tuple(axes)
    y = np.fft.fftn(x, axes=axes)
    if sign == +1:
        n = int(np.prod([x.shape[a] for a in axes]))
        y = np.conj(np.fft.fftn(np.conj(x), axes=axes))  # unscaled inverse
    return y


def check_impulse(fft_fn: Callable, n: int, j: int = 1, dtype="complex64") -> float:
    """FFT of a delta at j == W^{jk} column (verify-dft.c impulse test)."""
    x = np.zeros(n, dtype=np.complex128)
    x[j % n] = 1.0
    y = to_numpy_complex(fft_fn(x.astype(np.complex64)))
    k = np.arange(n)
    expect = np.exp(-2j * np.pi * (j % n) * k / n)
    return float(np.linalg.norm(y - expect) / math.sqrt(n))


def check_linearity(fft_fn: Callable, n: int, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    y = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    a, b = np.complex64(1.3 - 0.4j), np.complex64(-0.7 + 2.1j)
    lhs = to_numpy_complex(fft_fn(a * x + b * y))
    rhs = a * to_numpy_complex(fft_fn(x)) + b * to_numpy_complex(fft_fn(y))
    return rel_l2(lhs, rhs)


def check_shift(fft_fn: Callable, n: int, s: int = 1, seed: int = 0) -> float:
    """FFT(roll(x, s))[k] == FFT(x)[k] * exp(-2 pi i s k / n)... (time shift).

    Note roll(x, s)[j] = x[j - s], so the spectrum picks up W^{+s k}?  With
    numpy forward convention: FFT(x shifted right by s)[k]
      = sum_j x[j-s] W^{jk} = W^{sk} X[k], W = e^{-2 pi i / n}.
    """
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    lhs = to_numpy_complex(fft_fn(np.roll(x, s)))
    k = np.arange(n)
    rhs = to_numpy_complex(fft_fn(x)) * np.exp(-2j * np.pi * s * k / n)
    return rel_l2(lhs, rhs)


def verify_plan(plan, x=None, seed: int = 0) -> dict:
    """Golden check of a Plan against the float64 reference.

    Returns {'rel_l2', 'tol', 'ok'}; usable for any kind/axes/norm.
    """
    from ..plan import Plan
    from ..dtypes import Direction, Kind, Norm

    spec = plan.spec
    rng = np.random.default_rng(seed)
    if spec.kind == Kind.R2C:
        x_in = rng.standard_normal(spec.shape).astype(np.float32) if x is None else x
        ref = np.fft.rfftn(np.asarray(x_in, np.float64),
                           axes=spec.axes)
    elif spec.kind == Kind.C2R:
        from ..plan import _half_shape
        hs = _half_shape(spec)
        x_in = (rng.standard_normal(hs) + 1j * rng.standard_normal(hs)).astype(np.complex64) if x is None else x
        ref = np.fft.irfftn(np.asarray(x_in, np.complex128), s=[spec.shape[a] for a in spec.axes],
                            axes=spec.axes) * _np_norm_undo(spec)
    else:
        x_in = (rng.standard_normal(spec.shape)
                + 1j * rng.standard_normal(spec.shape)).astype(np.complex64) if x is None else x
        if spec.direction == Direction.FORWARD:
            ref = np.fft.fftn(np.asarray(x_in, np.complex128), axes=spec.axes)
        else:
            ref = np.fft.ifftn(np.asarray(x_in, np.complex128), axes=spec.axes) * spec.logical_n
        ref = ref * _fwd_scale(spec)
    if spec.kind != Kind.C2R:
        ref = ref * _fwd_scale(spec) if spec.kind == Kind.R2C else ref
    y = plan(x_in)
    err = rel_l2(y, ref)
    tol = tolerance(spec.logical_n, spec.dtype)
    return {"rel_l2": err, "tol": tol, "ok": err <= tol}


def _fwd_scale(spec) -> float:
    """Scale turning the unscaled-DFT convention into the plan's norm."""
    from ..plan import _norm_scale
    return _norm_scale(spec)


def _np_norm_undo(spec) -> float:
    """numpy irfftn applies 1/N; rescale to the plan's norm convention."""
    from ..plan import _norm_scale
    return _norm_scale(spec) * spec.logical_n


def check_parseval(fft_fn: Callable, n: int, seed: int = 0) -> float:
    """Parseval/Plancherel: sum|X|^2 == n * sum|x|^2 (energy identity)."""
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    y = to_numpy_complex(fft_fn(x))
    lhs = float(np.sum(np.abs(y) ** 2))
    rhs = float(n * np.sum(np.abs(x) ** 2))
    return abs(lhs - rhs) / rhs
