"""scipy.fft backend adapter: route ``scipy.fft.*`` through this framework.

scipy.fft dispatches every transform through the ``uarray`` multimethod
protocol (domain ``"numpy.scipy.fft"``), so a third-party FFT engine can
be installed process-wide or per-scope without scipy knowing about it.
This module implements that protocol for regent_fft_tpu::

    import scipy.fft
    from regent_fft_tpu.scipy_backend import RegentFFTBackend

    with scipy.fft.set_backend(RegentFFTBackend):
        y = scipy.fft.fft(x)          # runs on this framework (TPU under jit)

    # or process-wide, with automatic fallback for anything we don't cover:
    from regent_fft_tpu import scipy_backend
    scipy_backend.enable()

Covered: the complex/real/Hermitian transform family (fft/ifft/fft2/
ifft2/fftn/ifftn, rfft/irfft/rfft2/irfft2/rfftn/irfftn, hfft/ihfft/
hfft2/ihfft2/hfftn/ihfftn), the r2r family with full norm/orthogonalize
semantics (dct/idct/dst/idst, dctn/idctn/dstn/idstn), the fast Hankel
transform (fht/ifht), and next_fast_len/prev_fast_len.  Anything not
covered (an exotic argument combination, ``plan=``) returns
``NotImplemented`` so scipy falls back to its own pocketfft
implementation — the adapter never changes results scipy could not
produce, it only accelerates the ones we cover.

Outputs are returned as numpy arrays when every array input was numpy
(the scipy contract), fetched as split re/im planes — complex buffers
cannot cross the host boundary on some TPU attach transports.  JAX-array
inputs get JAX outputs (usable inside jit via the library API directly).

dtype contract: scipy preserves the input's precision class, so the
adapter casts outputs back to it (f64/c128 in -> c128 out).  The
*computation* runs at f64 only when ``jax_enable_x64`` is on; otherwise
f64 inputs are transformed at f32 precision (~1e-7 relative error) and
widened on return — the standard accelerator-backend trade, called out
here so it is a documented contract rather than a silent demotion.

Reference parity note: the reference wraps FFTW behind its own plan API
(``/root/reference/src/fft.rg:262``); FFTW itself is ALSO consumed by
scipy via this exact backend mechanism (``scipy.fft.set_backend`` exists
so pyFFTW and cuFFT can slot in).  This module is the analog entry point
for the TPU engine.
"""
from __future__ import annotations

import warnings

import numpy as np

from . import api as _api
from .dtypes import SplitComplex
from .ops import r2r as _r2r
from .ops import factor as _factor
from .ops import fftlog as _fftlog

__all__ = ["RegentFFTBackend", "enable", "disable"]

_NOT = object()  # sentinel: handler declines, let scipy fall back

_WARNED_FALLBACKS: set = set()  # function names that already warned once


def _is_numpy(x) -> bool:
    return isinstance(x, (np.ndarray, np.generic, int, float, complex, list,
                          tuple))


def _in_precision(x0):
    """64 if the caller's array was double-precision, else 32."""
    d = getattr(x0, "dtype", None)
    if d is not None:
        d = np.dtype(d)
        if (d.kind == "c" and d.itemsize >= 16) or \
           (d.kind == "f" and d.itemsize >= 8):
            return 64
        if d.kind in "cf":
            return 32
        return 64  # integer input: numpy promotes to f64
    if d is None and isinstance(x0, (list, tuple, float, complex)):
        return 64  # numpy would promote python scalars/lists to f64
    return 32


def _to_numpy(y, numpy_in: bool, prec: int = 32):
    """Materialize framework output for a scipy caller.

    Numpy-in -> numpy-out; complex device arrays are fetched as separate
    planes (complex buffers can't cross some attach transports).  The
    output is cast back to the caller's precision class (see module
    docstring for the compute-precision caveat).
    """
    if not numpy_in:
        return y
    if isinstance(y, SplitComplex):
        ct = np.complex128 if prec == 64 else np.complex64
        ft = np.float64 if prec == 64 else np.float32
        return (np.asarray(y.re, dtype=ft)
                + 1j * np.asarray(y.im, dtype=ft)).astype(ct)
    import jax.numpy as jnp
    arr = jnp.asarray(y)
    if jnp.issubdtype(arr.dtype, jnp.complexfloating):
        out = np.empty(arr.shape, dtype=np.dtype(arr.dtype))
        out.real = np.asarray(arr.real)
        out.imag = np.asarray(arr.imag)
        want = np.complex128 if prec == 64 else np.complex64
        return out.astype(want, copy=False)
    out = np.asarray(arr)
    if out.dtype.kind == "f":
        want = np.float64 if prec == 64 else np.float32
        return out.astype(want, copy=False)
    return out


def _norm_ok(norm) -> bool:
    return norm in (None, "backward", "ortho", "forward")


# ---------------------------------------------------------------------------
# Handlers: scipy signatures on the outside, framework calls on the inside.
# Each returns _NOT to decline (scipy then falls back when only=False).
# ---------------------------------------------------------------------------
def _cplx(fn):
    def h(x, n=None, axis=-1, norm=None, overwrite_x=False, workers=None,
          *, plan=None):
        if plan is not None or not _norm_ok(norm):
            return _NOT
        return fn(x, n=n, axis=axis, norm=norm), x
    return h


def _cplx_nd(fn, default_axes=None):
    # uarray passes only the caller's args — OUR defaults stand in for
    # scipy's, so the 2-D family needs its (-2, -1) default replicated.
    def h(x, s=None, axes=default_axes, norm=None, overwrite_x=False,
          workers=None, *, plan=None):
        if plan is not None or not _norm_ok(norm):
            return _NOT
        return fn(x, s=s, axes=axes, norm=norm), x
    return h


def _r2r_1d(fn):
    # The one-shots carry scipy's full contract (n/norm/orthogonalize),
    # so the handler is pure pass-through; bad args raise ValueError and
    # the dispatcher declines to scipy's own (which then errors the same).
    def h(x, type=2, n=None, axis=-1, norm=None, overwrite_x=False,
          workers=None, orthogonalize=None):
        return fn(x, type=type, n=n, axis=axis, norm=norm,
                  orthogonalize=orthogonalize), x
    return h


def _r2r_nd(fn):
    def h(x, type=2, s=None, axes=None, norm=None, overwrite_x=False,
          workers=None, orthogonalize=None):
        return fn(x, type=type, s=s, axes=axes, norm=norm,
                  orthogonalize=orthogonalize), x
    return h


def _fht(a, dln, mu, offset=0.0, bias=0.0):
    return _fftlog.fht(a, dln, mu, offset=offset, bias=bias), a


def _ifht(A, dln, mu, offset=0.0, bias=0.0):
    return _fftlog.ifht(A, dln, mu, offset=offset, bias=bias), A


def _next_fast_len(target, real=False):
    # Sizes fast for THIS engine: factorable into the kernel radix set
    # (the whole point of asking the active backend).
    return int(_factor.next_fast_len(int(target))), target


def _prev_fast_len(target, real=False):
    return int(_factor.prev_fast_len(int(target))), target


_HANDLERS = {
    "fft": _cplx(_api.fft), "ifft": _cplx(_api.ifft),
    "rfft": _cplx(_api.rfft), "irfft": _cplx(_api.irfft),
    "hfft": _cplx(_api.hfft), "ihfft": _cplx(_api.ihfft),
    "fft2": _cplx_nd(_api.fft2, (-2, -1)),
    "ifft2": _cplx_nd(_api.ifft2, (-2, -1)),
    "fftn": _cplx_nd(_api.fftn), "ifftn": _cplx_nd(_api.ifftn),
    "rfft2": _cplx_nd(_api.rfft2, (-2, -1)),
    "irfft2": _cplx_nd(_api.irfft2, (-2, -1)),
    "rfftn": _cplx_nd(_api.rfftn), "irfftn": _cplx_nd(_api.irfftn),
    "hfft2": _cplx_nd(_api.hfft2, (-2, -1)),
    "ihfft2": _cplx_nd(_api.ihfft2, (-2, -1)),
    "hfftn": _cplx_nd(_api.hfftn), "ihfftn": _cplx_nd(_api.ihfftn),
    "dct": _r2r_1d(_r2r.dct), "idct": _r2r_1d(_r2r.idct),
    "dst": _r2r_1d(_r2r.dst), "idst": _r2r_1d(_r2r.idst),
    "dctn": _r2r_nd(_r2r.dctn), "idctn": _r2r_nd(_r2r.idctn),
    "dstn": _r2r_nd(_r2r.dstn), "idstn": _r2r_nd(_r2r.idstn),
    "fht": _fht, "ifht": _ifht,
    "next_fast_len": _next_fast_len,
    "prev_fast_len": _prev_fast_len,
}


class RegentFFTBackend:
    """uarray backend object for ``scipy.fft.set_backend`` /
    ``set_global_backend``."""

    __ua_domain__ = "numpy.scipy.fft"

    @staticmethod
    def __ua_function__(method, args, kwargs):
        name = getattr(method, "__name__", None)
        handler = _HANDLERS.get(name)
        if handler is None:
            return NotImplemented
        try:
            out = handler(*args, **kwargs)
        except NotImplementedError:
            # deliberate "this argument combination is unsupported" signal
            return NotImplemented
        except (TypeError, ValueError) as e:
            # Could be a genuine engine bug, not just an unsupported
            # argument: fall back to pocketfft but say so once per function
            # so acceleration is never lost silently.
            if name not in _WARNED_FALLBACKS:
                _WARNED_FALLBACKS.add(name)
                warnings.warn(
                    f"regent_fft_tpu scipy backend: {name}() raised "
                    f"{type(e).__name__}: {e} — falling back to scipy for "
                    f"this function call (warning shown once per function)",
                    RuntimeWarning, stacklevel=2)
            return NotImplemented
        if out is _NOT:
            return NotImplemented
        y, x0 = out if isinstance(out, tuple) else (out, None)
        if isinstance(y, (int, float)):
            return y
        return _to_numpy(y, _is_numpy(x0), _in_precision(x0))


def enable(coerce: bool = False):
    """Install the backend process-wide (``scipy.fft.set_global_backend``).

    Uncovered functions and argument combinations fall back to scipy's
    own implementation (``only=False``).
    """
    import scipy.fft
    scipy.fft.set_global_backend(RegentFFTBackend, coerce=coerce, only=False)


def disable():
    """Restore scipy's default backend."""
    import scipy.fft
    try:
        # public string-registry form (scipy >= 1.5)
        scipy.fft.set_global_backend("scipy")
    except Exception:
        # fallback for scipy versions whose string registration differs
        from scipy.fft._backend import _named_backends
        scipy.fft.set_global_backend(_named_backends["scipy"])
