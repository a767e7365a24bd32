"""Core type vocabulary for the TPU FFT framework.

Mirrors the reference's type dispatch (``/root/reference/src/fft.rg:36-39,
293-320``) where an interface is generated per (index type, in-dtype,
out-dtype) and ``real_flag`` selects r2c paths.

Terminology note (SURVEY.md "terminology trap"): the reference (Regent) calls
double-precision complex ``complex64`` and single-precision complex
``complex32``.  Here we use the JAX/numpy meaning throughout:

* ``complex64``  = 2 x float32  (the native TPU fast path)
* ``complex128`` = 2 x float64  (verification path; slow on TPU)
* ``complex32``  = split re/im bfloat16 planes with float32 accumulation
  (no ecosystem precedent; represented as a :class:`SplitComplex` pytree).
"""
from __future__ import annotations

import enum
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Direction(enum.IntEnum):
    """Transform direction, FFTW sign convention.

    The reference hardcodes FORWARD (``src/fft.rg:319,580``); we ship both
    (SURVEY.md capability checklist item 6).
    """

    FORWARD = -1
    BACKWARD = +1


class Kind(enum.Enum):
    """Transform kind: complex-to-complex, real-to-complex, complex-to-real.

    Mirrors the reference's ``real_flag`` dispatch (``src/fft.rg:36-39``) and
    FFTW's ``fftw_plan_dft`` / ``fftw_plan_dft_r2c`` split
    (``src/fft.rg:313,319``); C2R is new capability (FFTW has it, the
    reference never wired it up).
    """

    C2C = "c2c"
    R2C = "r2c"
    C2R = "c2r"


class Norm(enum.Enum):
    """Normalization convention (numpy.fft-compatible strings)."""

    BACKWARD = "backward"  # no scale forward, 1/N on inverse (numpy default)
    ORTHO = "ortho"        # 1/sqrt(N) both ways
    FORWARD = "forward"    # 1/N on forward, no scale on inverse
    NONE = "none"          # never scale (raw FFTW semantics)


class SplitComplex(NamedTuple):
    """A complex array stored as separate real/imaginary planes.

    This is the in-kernel representation on TPU (no native complex in the
    vector units) and the public representation of ``complex32``
    (bfloat16 planes).  Registered as a pytree via NamedTuple, so it flows
    through ``jit``/``vmap``/``shard_map`` transparently.
    """

    re: jax.Array
    im: jax.Array

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):
        return self.re.dtype

    def astype(self, dtype) -> "SplitComplex":
        return SplitComplex(self.re.astype(dtype), self.im.astype(dtype))

    def conj(self) -> "SplitComplex":
        return SplitComplex(self.re, -self.im)

    def to_complex(self) -> jax.Array:
        ctype = jnp.complex128 if self.re.dtype == jnp.float64 else jnp.complex64
        return jax.lax.complex(
            self.re.astype(_real_of(ctype)), self.im.astype(_real_of(ctype))
        ).astype(ctype)


def _real_of(cdtype):
    return jnp.float64 if cdtype == jnp.complex128 else jnp.float32


def as_split(x, compute_dtype=jnp.float32) -> SplitComplex:
    """Convert a complex / real / SplitComplex array to split planes.

    Numpy complex inputs are split on the HOST before device transfer:
    some TPU attach transports cannot move complex buffers host<->device
    (on-device complex compute is fine) — and split planes are the layout
    the kernels want anyway.
    """
    if isinstance(x, SplitComplex):
        return SplitComplex(
            x.re.astype(compute_dtype), x.im.astype(compute_dtype)
        )
    if isinstance(x, np.ndarray) and np.issubdtype(x.dtype, np.complexfloating):
        np_real = np.float64 if compute_dtype == jnp.float64 else np.float32
        re = jnp.asarray(np.asarray(x.real, dtype=np_real))
        im = jnp.asarray(np.asarray(x.imag, dtype=np_real))
        if jnp.dtype(compute_dtype) not in (jnp.float32, jnp.float64):
            re, im = re.astype(compute_dtype), im.astype(compute_dtype)
        return SplitComplex(re, im)
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re, im = _split_complex_jit()(x)
        return SplitComplex(re.astype(compute_dtype), im.astype(compute_dtype))
    xr = x.astype(compute_dtype)
    return SplitComplex(xr, jnp.zeros_like(xr))


def from_split(s: SplitComplex, out_dtype):
    """Convert split planes to the requested output representation."""
    out_dtype_name = getattr(out_dtype, "name", str(out_dtype))
    if out_dtype_name == "complex32" or out_dtype is SplitComplex:
        return SplitComplex(s.re.astype(jnp.bfloat16), s.im.astype(jnp.bfloat16))
    out_dtype = jnp.dtype(out_dtype)
    if jnp.issubdtype(out_dtype, jnp.complexfloating):
        return s.to_complex().astype(out_dtype)
    # real output (c2r)
    return s.re.astype(out_dtype)


_SPLIT_COMPLEX_JIT = None


def _split_complex_jit():
    """Jitted complex->planes splitter: eager complex ops can be flaky on
    attach transports, while jitted programs with complex operands work."""
    global _SPLIT_COMPLEX_JIT
    if _SPLIT_COMPLEX_JIT is None:
        _SPLIT_COMPLEX_JIT = jax.jit(lambda z: (jnp.real(z), jnp.imag(z)))
    return _SPLIT_COMPLEX_JIT


# Canonical dtype spellings accepted by plan_fft. "complex32" is our split
# bf16 format (SURVEY.md hard-parts item 6).
COMPLEX_DTYPES = ("complex32", "complex64", "complex128")


def canonical_dtype(dtype) -> str:
    if dtype is SplitComplex:
        return "complex32"
    name = getattr(dtype, "name", None) or str(np.dtype(dtype) if not isinstance(dtype, str) else dtype)
    if isinstance(dtype, str):
        name = dtype
    aliases = {
        "complex32": "complex32",
        "complex64": "complex64",
        "complex128": "complex128",
        "float32": "float32",
        "float64": "float64",
        "bfloat16": "bfloat16",
    }
    if name not in aliases:
        raise ValueError(f"unsupported dtype for FFT: {dtype!r}")
    return aliases[name]
