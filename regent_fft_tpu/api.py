"""Public API: numpy.fft-style one-shots + reference-parity plan interface.

Two API layers, both over the same Plan machinery:

1. numpy.fft-compatible one-shot functions (``fft``, ``ifft``, ``rfft``,
   ``fftn``...).  Each call plans through the wisdom cache, so repeated
   calls with the same problem reuse the compiled executor.

2. A reference-parity layer: :func:`generate_fft_interface` mirrors the
   reference's metaprogrammed interface factory
   (``/root/reference/src/fft.rg:31`` ``fft.generate_fft_interface(itype,
   dtype_in, dtype_out)``) returning an object with ``make_plan``,
   ``make_plan_batch``, ``make_plan_distrib``, ``execute_plan``,
   ``destroy_plan`` — so a user of the reference can map their code 1:1.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import Direction, Kind, Norm, SplitComplex
from .plan import Plan, PlanSpec, make_plan, execute_plan, destroy_plan

_NORMS = {None: Norm.BACKWARD, "backward": Norm.BACKWARD, "ortho": Norm.ORTHO,
          "forward": Norm.FORWARD, "none": Norm.NONE}


def _dtype_of(x) -> str:
    # NEVER jnp.asarray numpy complex here: that would transfer a complex
    # buffer host->device, which some attach transports cannot do (the
    # split happens later, on host, in dtypes.as_split).
    if isinstance(x, SplitComplex):
        return "complex32"
    d = x.dtype if isinstance(x, np.ndarray) else jnp.asarray(x).dtype
    if d == np.complex128 or d == np.float64:
        # numpy defaults to f64; without x64 the c128 plan path would
        # raise, so silently take the c64 fast path like jnp.fft does.
        if not jax.config.read("jax_enable_x64"):
            return "complex64"
        return "complex128"
    return "complex64"


def _shape_of(x) -> Tuple[int, ...]:
    if isinstance(x, SplitComplex):
        return tuple(x.re.shape)
    if isinstance(x, np.ndarray):
        return tuple(x.shape)
    return tuple(jnp.asarray(x).shape)


def _axes_tuple(ndim, axis=None, axes=None) -> Tuple[int, ...]:
    if axis is not None:
        return (axis % ndim,)
    if axes is None:
        return tuple(range(ndim))
    return tuple(a % ndim for a in axes)


def _padded(x, axes, sizes):
    """numpy.fft n/s semantics: crop or zero-pad each axis to the target.

    Numpy inputs are padded with numpy (complex buffers must not cross the
    host boundary; the split happens later in dtypes.as_split).
    """
    if sizes is None:
        return x
    for n in sizes:
        if n is not None and n < 1:
            raise ValueError(f"invalid number of FFT data points: {n}")
    if isinstance(x, np.ndarray):
        for ax, n in zip(axes, sizes):
            if n is None or x.shape[ax] == n:
                continue
            if x.shape[ax] > n:
                x = np.take(x, np.arange(n), axis=ax)
            else:
                pad = [(0, 0)] * x.ndim
                pad[ax] = (0, n - x.shape[ax])
                x = np.pad(x, pad)
        return x
    arrs = (x.re, x.im) if isinstance(x, SplitComplex) else (jnp.asarray(x),)
    outs = []
    for a in arrs:
        for ax, n in zip(axes, sizes):
            if n is None or a.shape[ax] == n:
                continue
            if a.shape[ax] > n:
                a = jax.lax.slice_in_dim(a, 0, n, axis=ax)
            else:
                pad = [(0, 0)] * a.ndim
                pad[ax] = (0, n - a.shape[ax])
                a = jnp.pad(a, pad)
        outs.append(a)
    return SplitComplex(*outs) if isinstance(x, SplitComplex) else outs[0]


def _c2c(x, axes_t, direction, norm, **opts):
    spec = PlanSpec(shape=_shape_of(x), axes=axes_t, kind=Kind.C2C,
                    direction=direction, norm=_NORMS[norm],
                    dtype=_dtype_of(x), **opts)
    return make_plan(spec)(x)


# ---------------------------------------------------------------------------
# numpy.fft-compatible one-shots
# ---------------------------------------------------------------------------
def fft(x, n: Optional[int] = None, axis: int = -1, norm=None, **opts):
    axes_t = _axes_tuple(jnp.ndim(x.re if isinstance(x, SplitComplex) else x), axis=axis)
    x = _padded(x, axes_t, (n,) if n is not None else None)
    return _c2c(x, axes_t, Direction.FORWARD, norm, **opts)


def ifft(x, n: Optional[int] = None, axis: int = -1, norm=None, **opts):
    axes_t = _axes_tuple(jnp.ndim(x.re if isinstance(x, SplitComplex) else x), axis=axis)
    x = _padded(x, axes_t, (n,) if n is not None else None)
    return _c2c(x, axes_t, Direction.BACKWARD, norm, **opts)


def fft2(x, s=None, axes=(-2, -1), norm=None, **opts):
    return fftn(x, s=s, axes=axes, norm=norm, **opts)


def ifft2(x, s=None, axes=(-2, -1), norm=None, **opts):
    return ifftn(x, s=s, axes=axes, norm=norm, **opts)


def fftn(x, s=None, axes=None, norm=None, **opts):
    nd = jnp.ndim(x.re if isinstance(x, SplitComplex) else x)
    if s is not None and axes is None:
        axes = tuple(range(nd - len(s), nd))
    axes_t = _axes_tuple(nd, axes=axes)
    x = _padded(x, axes_t, s)
    return _c2c(x, axes_t, Direction.FORWARD, norm, **opts)


def ifftn(x, s=None, axes=None, norm=None, **opts):
    nd = jnp.ndim(x.re if isinstance(x, SplitComplex) else x)
    if s is not None and axes is None:
        axes = tuple(range(nd - len(s), nd))
    axes_t = _axes_tuple(nd, axes=axes)
    x = _padded(x, axes_t, s)
    return _c2c(x, axes_t, Direction.BACKWARD, norm, **opts)


def rfft(x, n: Optional[int] = None, axis: int = -1, norm=None, **opts):
    return rfftn(x, s=(n,) if n is not None else None, axes=(axis,), norm=norm, **opts)


def rfftn(x, s=None, axes=None, norm=None, **opts):
    x = jnp.asarray(x)
    nd = x.ndim
    if s is not None and axes is None:
        axes = tuple(range(nd - len(s), nd))
    axes_t = _axes_tuple(nd, axes=axes)
    x = _padded(x, axes_t, s)
    dtype = "complex128" if x.dtype == jnp.float64 else "complex64"
    spec = PlanSpec(shape=tuple(x.shape), axes=axes_t, kind=Kind.R2C,
                    direction=Direction.FORWARD, norm=_NORMS[norm],
                    dtype=dtype, **opts)
    return make_plan(spec)(x)


def irfft(x, n: Optional[int] = None, axis: int = -1, norm=None, **opts):
    return irfftn(x, s=(n,) if n is not None else None, axes=(axis,), norm=norm, **opts)


def irfftn(x, s=None, axes=None, norm=None, **opts):
    shape = _shape_of(x)
    nd = len(shape)
    if s is not None and axes is None:
        axes = tuple(range(nd - len(s), nd))
    axes_t = _axes_tuple(nd, axes=axes)
    # Real output shape: numpy default for the last axis is 2*(m-1).
    out_shape = list(shape)
    if s is not None:
        for ax, n in zip(axes_t, s):
            if n is not None:
                out_shape[ax] = n
        if s[-1] is None:
            out_shape[axes_t[-1]] = 2 * (shape[axes_t[-1]] - 1)
    else:
        out_shape[axes_t[-1]] = 2 * (shape[axes_t[-1]] - 1)
    # Crop/pad the complex input on the non-last axes to match.
    in_sizes = [out_shape[a] for a in axes_t[:-1]] + [out_shape[axes_t[-1]] // 2 + 1]
    x = _padded(x, axes_t, in_sizes)
    spec = PlanSpec(shape=tuple(out_shape), axes=axes_t, kind=Kind.C2R,
                    direction=Direction.BACKWARD, norm=_NORMS[norm],
                    dtype=_dtype_of(x), **opts)
    return make_plan(spec)(x)


def irfft2(x, s=None, axes=(-2, -1), norm=None, **opts):
    return irfftn(x, s=s, axes=axes, norm=norm, **opts)


def rfft2(x, s=None, axes=(-2, -1), norm=None, **opts):
    return rfftn(x, s=s, axes=axes, norm=norm, **opts)


# Hermitian-input transforms (numpy.fft parity).  numpy defines them by
# direction-swapped conjugate identities — hfft(a) == irfft(conj(a)) at the
# swapped norm — which map straight onto the existing r2c/c2r plan kinds.
_SWAP_NORM = {None: "forward", "backward": "forward",
              "forward": "backward", "ortho": "ortho", "none": "none"}


def _conj(x):
    if isinstance(x, SplitComplex):
        return SplitComplex(x.re, -jnp.asarray(x.im))
    return jnp.conj(jnp.asarray(x))


def hfft(x, n: Optional[int] = None, axis: int = -1, norm=None, **opts):
    """FFT of Hermitian-symmetric input (half spectrum) -> real output of
    length ``n`` (default 2*(m-1)); numpy.fft.hfft semantics."""
    return irfft(_conj(x), n=n, axis=axis, norm=_SWAP_NORM[norm], **opts)


def ihfft(x, n: Optional[int] = None, axis: int = -1, norm=None, **opts):
    """Inverse of :func:`hfft`: real input -> conjugated half spectrum."""
    return _conj(rfft(x, n=n, axis=axis, norm=_SWAP_NORM[norm], **opts))


def hfftn(x, s=None, axes=None, norm=None, **opts):
    """N-D FFT of Hermitian-symmetric input -> real output (scipy.fft.hfftn
    identity: hfftn(x, s) == irfftn(conj(x), s) at the swapped norm)."""
    return irfftn(_conj(x), s=s, axes=axes, norm=_SWAP_NORM[norm], **opts)


def hfft2(x, s=None, axes=(-2, -1), norm=None, **opts):
    """2-D Hermitian-input FFT (scipy.fft.hfft2)."""
    return hfftn(x, s=s, axes=axes, norm=norm, **opts)


def ihfftn(x, s=None, axes=None, norm=None, **opts):
    """N-D inverse of :func:`hfftn`: real input -> conjugated half
    spectrum (scipy.fft.ihfftn)."""
    return _conj(rfftn(x, s=s, axes=axes, norm=_SWAP_NORM[norm], **opts))


def ihfft2(x, s=None, axes=(-2, -1), norm=None, **opts):
    """2-D inverse Hermitian-input FFT (scipy.fft.ihfft2)."""
    return ihfftn(x, s=s, axes=axes, norm=norm, **opts)


# Shift/frequency helpers (numpy parity; trivial but part of "everything a
# user needs to switch").  SplitComplex shifts plane-wise.
def fftshift(x, axes=None):
    if isinstance(x, SplitComplex):
        return SplitComplex(jnp.fft.fftshift(x.re, axes=axes),
                            jnp.fft.fftshift(x.im, axes=axes))
    return jnp.fft.fftshift(jnp.asarray(x), axes=axes)


def ifftshift(x, axes=None):
    if isinstance(x, SplitComplex):
        return SplitComplex(jnp.fft.ifftshift(x.re, axes=axes),
                            jnp.fft.ifftshift(x.im, axes=axes))
    return jnp.fft.ifftshift(jnp.asarray(x), axes=axes)


def fftfreq(n, d=1.0, dtype=jnp.float32):
    return jnp.fft.fftfreq(n, d).astype(dtype)


def rfftfreq(n, d=1.0, dtype=jnp.float32):
    return jnp.fft.rfftfreq(n, d).astype(dtype)


# ---------------------------------------------------------------------------
# Reference-parity interface (src/fft.rg:31 generate_fft_interface)
# ---------------------------------------------------------------------------
class FFTInterface:
    """Typed interface for a fixed (dim, dtype_in, dtype_out) tuple.

    Mirrors the reference's per-type metaprogrammed ``iface`` table
    (``/root/reference/src/fft.rg:31-664``): ``make_plan`` validates
    shapes/dtypes against the interface's types the way the reference's
    Terra specialization does at compile time.
    """

    def __init__(self, dim: int, dtype_in, dtype_out, **default_opts):
        if not (1 <= dim <= 3):
            # The reference asserts 1<=dim<=3 (src/fft.rg:41); the generic
            # numpy-style API above supports any rank.
            raise ValueError("generate_fft_interface supports 1 <= dim <= 3 "
                             "(use the numpy-style API for higher rank)")
        self.dim = dim
        self.dtype_in = jnp.dtype(dtype_in) if dtype_in != "complex32" else "complex32"
        self.dtype_out = jnp.dtype(dtype_out) if dtype_out != "complex32" else "complex32"
        in_is_real = (self.dtype_in in (jnp.float32, jnp.float64)
                      if self.dtype_in != "complex32" else False)
        self.kind = Kind.R2C if in_is_real else Kind.C2C  # src/fft.rg:36-39
        self._opts = default_opts

    def _dtype_str(self):
        if self.dtype_in == "complex32" or self.dtype_out == "complex32":
            return "complex32"
        if self.dtype_out == jnp.complex128:
            return "complex128"
        return "complex64"

    def make_plan(self, shape, direction=Direction.FORWARD, norm="none", **opts) -> Plan:
        """Plan over all ``dim`` axes (the reference's whole-region FFT)."""
        shape = tuple(shape)
        if len(shape) != self.dim:
            raise ValueError(f"interface is {self.dim}-D, got shape {shape}")
        spec = PlanSpec(shape=shape, axes=tuple(range(self.dim)), kind=self.kind,
                        direction=direction, norm=_NORMS[norm],
                        dtype=self._dtype_str(), **{**self._opts, **opts})
        return make_plan(spec)

    def make_plan_batch(self, shape, direction=Direction.FORWARD, norm="none",
                        batch_axis: int = -1, **opts) -> Plan:
        """Batched plan: transform all axes EXCEPT ``batch_axis``.

        The reference treats the last axis as batch and is 3D-only with an
        off-by-one (``src/fft.rg:416-504``, noted in SURVEY.md); here any
        rank and any batch axis work.
        """
        shape = tuple(shape)
        nd = len(shape)
        b = batch_axis % nd
        axes = tuple(a for a in range(nd) if a != b)
        spec = PlanSpec(shape=shape, axes=axes, kind=self.kind,
                        direction=direction, norm=_NORMS[norm],
                        dtype=self._dtype_str(), **{**self._opts, **opts})
        return make_plan(spec)

    def make_plan_distrib(self, shape, mesh=None, direction=Direction.FORWARD,
                          norm="none", **opts):
        """Per-shard independent plans over the leading axis (reference
        semantics: equal partition + index launch, ``src/fft.rg:513-537``).

        Returns a distributed plan from :mod:`regent_fft_tpu.parallel`.
        """
        from .parallel import distributed as _dist
        return _dist.make_plan_shards(
            shape, kind=self.kind, direction=direction, norm=_NORMS[norm],
            dtype=self._dtype_str(), mesh=mesh, **{**self._opts, **opts})

    @staticmethod
    def execute_plan(plan: Plan, x):
        return execute_plan(plan, x)

    # The reference wraps execute in a task so the mapper can place it on
    # GPU (src/fft.rg:613-617); under jit placement is XLA's job.
    execute_plan_task = execute_plan

    @staticmethod
    def destroy_plan(plan: Plan):
        destroy_plan(plan)

    destroy_plan_task = destroy_plan

    @staticmethod
    def get_num_nodes() -> int:
        """Tunable analog (src/fft.rg:146-148): process count."""
        return jax.process_count()

    @staticmethod
    def get_num_local_devices() -> int:
        """Tunable analog (src/fft.rg:151-153): local device count."""
        return jax.local_device_count()


def generate_fft_interface(dim: int, dtype_in, dtype_out, **opts) -> FFTInterface:
    """Reference-parity factory (``/root/reference/src/fft.rg:31``)."""
    return FFTInterface(dim, dtype_in, dtype_out, **opts)


# ---------------------------------------------------------------------------
# Worker-count API (scipy.fft.set_workers / FFTW threads analog)
# ---------------------------------------------------------------------------

_WORKERS = [1]


class set_workers:
    """Context manager mirroring ``scipy.fft.set_workers``.

    FFTW exposes intra-node parallelism through its threads API
    (``fftw_plan_with_nthreads``, ``/root/reference/fftw-3.3.8/threads/
    api.c:77-81``; the reference builds with ``--enable-openmp``,
    ``install.py:53``).  On TPU intra-chip parallelism is owned by
    XLA/Mosaic (every kernel already uses all VPU lanes and the full MXU),
    so the worker count is purely advisory: it is recorded and visible
    via :func:`get_workers` for API compatibility, but it neither
    throttles nor widens device execution.  (Calls that fall back to
    pocketfft under the :mod:`regent_fft_tpu.scipy_backend` adapter keep
    whatever ``workers=`` argument the caller passed scipy directly.)
    """

    def __init__(self, workers: int):
        workers = int(workers)
        if workers == 0:
            raise ValueError("workers must be nonzero")
        self.workers = workers

    def __enter__(self):
        _WORKERS.append(self.workers)
        return self.workers

    def __exit__(self, *exc):
        _WORKERS.pop()
        return False


def get_workers() -> int:
    """Current advisory worker count (``scipy.fft.get_workers`` analog)."""
    return _WORKERS[-1]
