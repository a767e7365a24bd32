"""torch.fft drop-in namespace backed by the regent_fft_tpu engine.

The reference reaches GPU users through cuFFT (``/root/reference/src/
fft.rg:16-20,574-580``); today most cuFFT consumers call it through
``torch.fft``.  This module mirrors the ``torch.fft`` namespace —
identical function names, signatures (``input, n/s, dim, norm``) and
dtype promotion — so a torch program can switch engines with one import::

    from regent_fft_tpu import torch_fft as fft   # was: from torch import fft

Tensors go through the host bridge (``Tensor`` ↔ ``numpy``), the
transform runs on the configured JAX device (TPU when attached), and the
result returns as a ``torch.Tensor`` on the input tensor's device with
torch's promotion rule (float32/complex64 → complex64, float64/complex128
→ complex128; integer/bool → complex64).  Like the scipy backend adapter
(:mod:`regent_fft_tpu.scipy_backend`), computation happens in the
engine's f32 path unless JAX x64 is enabled — the 64-bit *class* of the
input is preserved on the output either way.

This is an inference-path adapter: the bridge detaches from autograd.
For differentiable transforms use the JAX-native API (every plan is
jit/grad-compatible, ``tests/test_autodiff.py``).
"""
from __future__ import annotations

import numpy as np

from . import api as _api

try:  # torch is an optional peer, not a dependency of the engine
    import torch as _torch
except ImportError:  # pragma: no cover - torch is present in CI images
    _torch = None

__all__ = ["fft", "ifft", "fft2", "ifft2", "fftn", "ifftn",
           "rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn",
           "hfft", "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn",
           "fftshift", "ifftshift", "fftfreq", "rfftfreq"]


def _require_torch():
    if _torch is None:  # pragma: no cover
        raise ImportError("regent_fft_tpu.torch_fft requires torch")
    return _torch


def _from_tensor(x):
    """Tensor -> (numpy array, device, 64-bit class flag)."""
    t = _require_torch()
    if not isinstance(x, t.Tensor):
        x = t.as_tensor(x)
    dev = x.device
    if not (x.dtype.is_floating_point or x.dtype.is_complex):
        x = x.to(t.float32)  # torch promotes int/bool to the default dtype
    # Half-precision classes numpy can't hold (bf16, chalf) — and f16,
    # which the engine computes at f32 anyway — widen for the bridge;
    # the result comes back in the f32 class (documented: computation is
    # f32 unless x64 is enabled).
    if x.dtype in (t.bfloat16, t.float16):
        x = x.to(t.float32)
    elif x.dtype == t.complex32:
        x = x.to(t.complex64)
    wide = x.dtype in (t.float64, t.complex128)
    return x.detach().cpu().numpy(), dev, wide


def _to_tensor(y, dev, wide: bool, real: bool):
    t = _require_torch()
    y = np.asarray(y)
    if real:
        dt = np.float64 if wide else np.float32
    else:
        dt = np.complex128 if wide else np.complex64
    y = np.ascontiguousarray(y.astype(dt, copy=False))
    if not y.flags.writeable:  # jax buffers are read-only; torch needs a copy
        y = y.copy()
    out = t.from_numpy(y)
    return out.to(dev) if dev.type != "cpu" else out


def _wrap_1d(fn, real_out=False):
    def h(input, n=None, dim=-1, norm=None, *, out=None):
        if out is not None:
            raise NotImplementedError("out= is not supported")
        x, dev, wide = _from_tensor(input)
        y = fn(x, n=n, axis=dim, norm=norm)
        return _to_tensor(y, dev, wide, real_out)
    h.__name__ = fn.__name__
    return h


def _wrap_nd(fn, default_dim, real_out=False):
    def h(input, s=None, dim=default_dim, norm=None, *, out=None):
        if out is not None:
            raise NotImplementedError("out= is not supported")
        x, dev, wide = _from_tensor(input)
        y = fn(x, s=s, axes=dim, norm=norm)
        return _to_tensor(y, dev, wide, real_out)
    h.__name__ = fn.__name__
    return h


fft = _wrap_1d(_api.fft)
ifft = _wrap_1d(_api.ifft)
rfft = _wrap_1d(_api.rfft)
irfft = _wrap_1d(_api.irfft, real_out=True)
hfft = _wrap_1d(_api.hfft, real_out=True)
ihfft = _wrap_1d(_api.ihfft)

fft2 = _wrap_nd(_api.fft2, (-2, -1))
ifft2 = _wrap_nd(_api.ifft2, (-2, -1))
fftn = _wrap_nd(_api.fftn, None)
ifftn = _wrap_nd(_api.ifftn, None)
rfft2 = _wrap_nd(_api.rfft2, (-2, -1))
irfft2 = _wrap_nd(_api.irfft2, (-2, -1), real_out=True)
rfftn = _wrap_nd(_api.rfftn, None)
irfftn = _wrap_nd(_api.irfftn, None, real_out=True)
hfft2 = _wrap_nd(_api.hfft2, (-2, -1), real_out=True)
ihfft2 = _wrap_nd(_api.ihfft2, (-2, -1))
hfftn = _wrap_nd(_api.hfftn, None, real_out=True)
ihfftn = _wrap_nd(_api.ihfftn, None)


def fftshift(input, dim=None):
    t = _require_torch()
    x = input if isinstance(input, t.Tensor) else t.as_tensor(input)
    return t.roll(x, [x.shape[d] // 2 for d in _dims(x, dim)],
                  _dims(x, dim))


def ifftshift(input, dim=None):
    t = _require_torch()
    x = input if isinstance(input, t.Tensor) else t.as_tensor(input)
    return t.roll(x, [-(x.shape[d] // 2) for d in _dims(x, dim)],
                  _dims(x, dim))


def _dims(x, dim):
    if dim is None:
        return list(range(x.ndim))
    if isinstance(dim, int):
        return [dim]
    return list(dim)


def fftfreq(n, d=1.0, *, out=None, dtype=None, layout=None, device=None,
            requires_grad=False):
    if out is not None:
        raise NotImplementedError("out= is not supported")
    t = _require_torch()
    y = t.from_numpy(np.fft.fftfreq(int(n), d=float(d)))
    y = y.to(dtype or t.get_default_dtype())
    if device is not None:
        y = y.to(device)
    return y.requires_grad_(True) if requires_grad else y


def rfftfreq(n, d=1.0, *, out=None, dtype=None, layout=None, device=None,
             requires_grad=False):
    if out is not None:
        raise NotImplementedError("out= is not supported")
    t = _require_torch()
    y = t.from_numpy(np.fft.rfftfreq(int(n), d=float(d)))
    y = y.to(dtype or t.get_default_dtype())
    if device is not None:
        y = y.to(device)
    return y.requires_grad_(True) if requires_grad else y
