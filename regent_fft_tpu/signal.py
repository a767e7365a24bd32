"""FFT convolution on TPU (scipy.signal.fftconvolve parity).

The serving-shaped workload the reference wrapper cannot express at all
(forward-only, no inverse: ``/root/reference/src/fft.rg:319,580``):
``y = irfftn(rfftn(a_pad) * rfftn(b_pad))`` with cached plans.

Real inputs ride the kernel real-transform path; when every convolution
axis rounds to a power of two (the kernels' native sizes), the plans use
the Nyquist-PACKED boundary layout (``PlanSpec.packed_layout``) — both
repack passes disappear (measured 25% of the r2c+c2r roundtrip at
256^3x4, docs/tpu_notes.md).  Packed planes multiply directly on lanes
1..n/2-1; lane 0 holds the TANGLED bin-0/Nyquist pair, untangled and
re-tangled on that single column (1/(n/2) of the data):

    A0  = (P_a + conj(rev(P_a))) / 2       rev = mid-axis frequency
    ANq = (P_a - conj(rev(P_a))) / (2i)          reversal
    P_c = (A0*B0) + i * (ANq*BNq)

Products of conjugate-even spectra stay conjugate-even, so ``P_c`` is a
valid packed c2r input.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dtypes import Direction, Kind, Norm, SplitComplex, as_split
from .ops import factor as _factor
from .plan import PlanSpec, make_plan, _rev_freq


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _conv_sizes(sa, sb, axes, method: str) -> Tuple[Tuple[int, ...], bool]:
    """Padded FFT sizes per axis and whether the packed path applies.

    ``auto`` uses packed power-of-two sizes when their total padding
    stays within 1.35x of the next_fast_len sizes (the packed roundtrip
    saves ~25%, so a bigger blowup loses); else plain fast sizes.
    """
    full = [sa[a] + sb[a] - 1 for a in range(len(sa))]
    fast = [(_factor.next_fast_len(f) if a in axes else sa[a])
            for a, f in enumerate(full)]
    pow2 = [(_next_pow2(f) if a in axes else sa[a])
            for a, f in enumerate(full)]
    last = axes[-1]
    packed_ok = pow2[last] >= 256 and (pow2[last] // 2) % 128 == 0
    if method == "plain" or not packed_ok:
        return tuple(fast), False
    if method == "packed":
        return tuple(pow2), True
    blowup = np.prod([pow2[a] / fast[a] for a in axes])
    if blowup <= 1.35:
        return tuple(pow2), True
    return tuple(fast), False


def _pad_to(x, shape):
    cfg = [(0, t - s) for s, t in zip(x.shape, shape)]
    return jnp.pad(x, cfg)


def _mul_split(a: SplitComplex, b: SplitComplex) -> SplitComplex:
    return SplitComplex(a.re * b.re - a.im * b.im,
                        a.re * b.im + a.im * b.re)


def _packed_mul(za: SplitComplex, zb: SplitComplex, mid_axes) -> SplitComplex:
    """Spectral product of two Nyquist-packed half spectra."""
    c = _mul_split(za, zb)  # correct on lanes >= 1; lane 0 fixed below

    def untangle(z):
        pr, pi = z.re[..., 0], z.im[..., 0]
        rr = _rev_freq(pr, mid_axes)
        ri = _rev_freq(pi, mid_axes)
        x0 = SplitComplex(0.5 * (pr + rr), 0.5 * (pi - ri))
        nq = SplitComplex(0.5 * (pi + ri), -0.5 * (pr - rr))
        return x0, nq

    a0, anq = untangle(za)
    b0, bnq = untangle(zb)
    c0 = _mul_split(a0, b0)
    cnq = _mul_split(anq, bnq)
    p0r = c0.re - cnq.im
    p0i = c0.im + cnq.re
    # lane-0 `where` (identity-mapped bulk) instead of a prepend-concat:
    # same measured rewrite as plan._pack_nyquist (the concat form pays a
    # shift-by-one relayout of the whole bulk).
    lane = jax.lax.iota(jnp.int32, c.re.shape[-1])
    mask = lane == 0
    return SplitComplex(jnp.where(mask, p0r[..., None], c.re),
                        jnp.where(mask, p0i[..., None], c.im))


def _slice_mode(y, sa, sb, axes, mode: str):
    if mode == "full":
        idx = [slice(0, sa[a] + sb[a] - 1) if a in axes else slice(None)
               for a in range(y.ndim)]
    elif mode == "same":
        idx = []
        for a in range(y.ndim):
            if a in axes:
                start = (sb[a] - 1) // 2
                idx.append(slice(start, start + sa[a]))
            else:
                idx.append(slice(None))
    elif mode == "valid":
        idx = []
        for a in range(y.ndim):
            if a in axes:
                if sa[a] < sb[a]:
                    raise ValueError("valid mode needs a no smaller than b "
                                     "on every convolved axis")
                idx.append(slice(sb[a] - 1, sa[a]))
            else:
                idx.append(slice(None))
    else:
        raise ValueError(f"mode must be full|same|valid, got {mode!r}")
    return y[tuple(idx)]


def fftconvolve(a, b, mode: str = "full", axes: Optional[Sequence[int]] = None,
                method: str = "auto", backend: str = "auto"):
    """Convolve ``a`` with ``b`` via cached FFT plans
    (``scipy.signal.fftconvolve`` semantics).

    ``method``: 'auto' picks the packed-pow2 real path when its padding
    blowup is small; 'packed' forces it; 'plain' forces next_fast_len
    sizes with the numpy-layout plans.  Complex inputs always use C2C
    plans.  ``backend`` passes through to the plans (off-TPU, packed
    needs backend='stockham').
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != b.ndim:
        raise ValueError(f"rank mismatch: {a.ndim} vs {b.ndim}")
    axes = (tuple(range(a.ndim)) if axes is None
            else tuple(sorted(ax % a.ndim for ax in axes)))
    for ax in range(a.ndim):
        if ax not in axes and a.shape[ax] != b.shape[ax]:
            raise ValueError(f"non-convolved axis {ax} must match: "
                             f"{a.shape} vs {b.shape}")
    sa, sb = a.shape, b.shape
    cplx = (jnp.issubdtype(a.dtype, jnp.complexfloating)
            or jnp.issubdtype(b.dtype, jnp.complexfloating))

    if cplx:
        fft_shape = tuple(
            _factor.next_fast_len(sa[ax] + sb[ax] - 1) if ax in axes
            else sa[ax] for ax in range(a.ndim))
        spec = PlanSpec(shape=fft_shape, axes=axes, kind=Kind.C2C,
                        direction=Direction.FORWARD, norm=Norm.NONE,
                        use_3m=True, backend=backend)
        fwd = make_plan(spec)
        inv = fwd.inverse()
        za = as_split(fwd(_pad_to(a.astype(jnp.complex64), fft_shape)),
                      jnp.float32)
        zb = as_split(fwd(_pad_to(b.astype(jnp.complex64), fft_shape)),
                      jnp.float32)
        from .dtypes import from_split
        y = inv(from_split(_mul_split(za, zb), jnp.complex64))
        return _slice_mode(y, sa, sb, axes, mode)

    fft_shape, packed = _conv_sizes(sa, sb, axes, method)

    def _plans(fft_shape, packed):
        fwd = make_plan(PlanSpec(shape=fft_shape, axes=axes, kind=Kind.R2C,
                                 direction=Direction.FORWARD, norm=Norm.NONE,
                                 use_3m=True, backend=backend,
                                 packed_layout=packed))
        inv = make_plan(PlanSpec(shape=fft_shape, axes=axes, kind=Kind.C2R,
                                 direction=Direction.BACKWARD,
                                 norm=Norm.BACKWARD, use_3m=True,
                                 backend=backend, packed_layout=packed))
        return fwd, inv

    if packed:
        try:
            fwd, inv = _plans(fft_shape, True)
        except ValueError:
            if method == "packed":
                raise  # the caller demanded it; surface the reason
            # auto: the packed kernel path isn't available (e.g. the
            # resolved backend is xla off-TPU) — plain fast sizes
            fft_shape, packed = _conv_sizes(sa, sb, axes, "plain")
            fwd, inv = _plans(fft_shape, False)
    else:
        fwd, inv = _plans(fft_shape, False)
    za = as_split(fwd(_pad_to(a.astype(jnp.float32), fft_shape)),
                  jnp.float32)
    zb = as_split(fwd(_pad_to(b.astype(jnp.float32), fft_shape)),
                  jnp.float32)
    mid_axes = axes[:-1]
    if packed:
        zc = _packed_mul(za, zb, mid_axes)
    else:
        zc = _mul_split(za, zb)
    from .dtypes import from_split
    y = inv(from_split(zc, jnp.complex64))
    return _slice_mode(y, sa, sb, axes, mode)


def correlate(a, b, mode: str = "full", axes: Optional[Sequence[int]] = None,
              method: str = "auto", backend: str = "auto"):
    """Cross-correlation via FFT (``scipy.signal.correlate(method='fft')``
    semantics): ``correlate(a, b) = convolve(a, reversed(conj(b)))``.

    scipy's 'same'/'valid' windows are defined on the correlation
    lattice; flipping ``b`` maps them onto fftconvolve's slicing when
    the flipped kernel's mode-window is shifted by the parity of b — we
    reproduce scipy exactly by slicing the FULL result here.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != b.ndim:
        raise ValueError(f"rank mismatch: {a.ndim} vs {b.ndim}")
    axes_t = (tuple(range(a.ndim)) if axes is None
              else tuple(sorted(ax % a.ndim for ax in axes)))
    brev = jnp.flip(b, axis=axes_t)
    if jnp.issubdtype(b.dtype, jnp.complexfloating):
        brev = jnp.conj(brev)
    y = fftconvolve(a, brev, mode="full", axes=axes_t, method=method,
                    backend=backend)
    if mode == "full":
        return y
    sa, sb = a.shape, b.shape
    idx = []
    for ax in range(a.ndim):
        if ax not in axes_t:
            idx.append(slice(None))
        elif mode == "same":
            # scipy centers the 'same' window on the correlation lattice:
            # start = (sb - 1) // 2 on the flipped-convolution output
            start = (sb[ax] - 1) // 2
            idx.append(slice(start, start + sa[ax]))
        elif mode == "valid":
            if sa[ax] < sb[ax]:
                raise ValueError("valid mode needs a no smaller than b "
                                 "on every correlated axis")
            idx.append(slice(sb[ax] - 1, sa[ax]))
        else:
            raise ValueError(f"mode must be full|same|valid, got {mode!r}")
    return y[tuple(idx)]


def oaconvolve(a, b, mode: str = "full", axes: Optional[Sequence[int]] = None,
               method: str = "auto", backend: str = "auto"):
    """Overlap-add convolution (``scipy.signal.oaconvolve`` semantics).

    When one input is much longer than the other along some convolved
    axis, blocks of the long input convolve against the short kernel
    through ONE batched FFT plan (blocks ride the batch dimension — the
    TPU-native shape) and overlap-add stitches the seams; otherwise this
    falls back to :func:`fftconvolve`.  The overlap-add itself is
    scatter-free: block tails (length k-1 <= L) land on the next block's
    head via one pad+reshape+add.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim != b.ndim:
        raise ValueError(f"rank mismatch: {a.ndim} vs {b.ndim}")
    axes_t = (tuple(range(a.ndim)) if axes is None
              else tuple(sorted(ax % a.ndim for ax in axes)))
    swapped = False
    if any(a.shape[ax] < b.shape[ax] for ax in axes_t) and \
            all(a.shape[ax] <= b.shape[ax] for ax in axes_t):
        a, b = b, a  # convolution commutes; keep 'a' the long one
        swapped = True
    sa, sb = a.shape, b.shape
    # pick the blocking axis: largest long/short ratio
    ratios = [(sa[ax] / max(sb[ax], 1), ax) for ax in axes_t]
    ratio, ax_s = max(ratios)
    k = sb[ax_s]
    if ratio < 8 or k < 2 or sa[ax_s] < 64:
        y = fftconvolve(a, b, mode="full", axes=axes_t, method=method,
                        backend=backend)
        return _slice_mode(y, sb if swapped else sa,
                           sa if swapped else sb, axes_t, mode)
    # block length: pow2 FFT of ~8x the kernel (scipy's cost heuristic
    # lands in the same decade; exactness comes from the math, not L)
    fftlen = _next_pow2(8 * k)
    L = fftlen - (k - 1)
    n_long = sa[ax_s]
    nb = -(-n_long // L)
    # move the blocking axis last, split into (nb, L) batch blocks
    am = jnp.moveaxis(a, ax_s, -1)
    am = jnp.pad(am, [(0, 0)] * (am.ndim - 1) + [(0, nb * L - n_long)])
    blocks = am.reshape(am.shape[:-1] + (nb, L))
    blocks = jnp.moveaxis(blocks, -2, 0)      # (nb, ..., L)
    bm = jnp.moveaxis(b, ax_s, -1)[None]      # (1, ..., k) broadcast-batch
    bm = jnp.broadcast_to(bm, (1,) + bm.shape[1:])
    # convolve blocks against the kernel over ALL conv axes; the blocked
    # axis is now the LAST axis, other conv axes keep full padded sizes
    conv_axes = tuple((ax + 1 if ax < ax_s else ax) for ax in axes_t
                      if ax != ax_s) + (blocks.ndim - 1,)
    # (axes shift by +1 for the new leading block dim; ax_s is now last)
    yb = fftconvolve(blocks, jnp.broadcast_to(
        bm, (nb,) + bm.shape[1:]), mode="full", axes=conv_axes,
        method=method, backend=backend)       # (nb, ..., L + k - 1)
    # overlap-add along the last axis: body | tail split at L
    body = yb[..., :L]
    tail = yb[..., L:]                        # (nb, ..., k - 1)
    body = jnp.moveaxis(body, 0, -2)          # (..., nb, L)
    tail = jnp.moveaxis(tail, 0, -2)          # (..., nb, k - 1)
    flat_body = body.reshape(body.shape[:-2] + (nb * L,))
    flat_body = jnp.pad(flat_body,
                        [(0, 0)] * (flat_body.ndim - 1) + [(0, L)])
    tail_pad = jnp.pad(tail, [(0, 0)] * (tail.ndim - 2)
                       + [(1, 0), (0, L - (k - 1))])  # (..., nb+1, L)
    flat = flat_body + tail_pad.reshape(tail_pad.shape[:-2]
                                        + ((nb + 1) * L,))
    full_len = n_long + k - 1
    y = jnp.moveaxis(flat[..., :full_len], -1, ax_s)
    return _slice_mode(y, sb if swapped else sa,
                       sa if swapped else sb, axes_t, mode)


def hilbert(x, N: Optional[int] = None, axis: int = -1):
    """Analytic signal via the FFT (``scipy.signal.hilbert`` semantics).

    ``x_a = ifft(fft(x) * h)`` with the one-sided step multiplier ``h``
    (DC and Nyquist kept at 1, positive frequencies doubled, negative
    zeroed).  One forward + one inverse cached C2C plan; the reference
    wrapper cannot express this at all (forward-only,
    ``/root/reference/src/fft.rg:319``).
    """
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("x must be real.")
    axis = axis % x.ndim
    n = x.shape[axis] if N is None else int(N)
    if n <= 0:
        raise ValueError("N must be positive.")
    from .api import fft, ifft
    h = np.zeros(n, np.float32)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1:n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
    shape = [1] * x.ndim
    shape[axis] = n
    Xf = fft(x.astype(jnp.float32), n=n, axis=axis)
    return ifft(Xf * jnp.asarray(h).reshape(shape), axis=axis)


def hilbert2(x, N=None):
    """2-D analytic signal (``scipy.signal.hilbert2`` semantics): the
    separable one-sided multiplier applied to ``fft2(x)``."""
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("x must be 2-D.")
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("x must be real.")
    if N is None:
        n1, n2 = x.shape
    elif np.isscalar(N):
        n1 = n2 = int(N)
    else:
        n1, n2 = (int(v) for v in N)
    if n1 <= 0 or n2 <= 0:
        raise ValueError("N must be positive.")

    def _h(n):
        # scipy's single-orthant convention: DC kept, strictly-positive
        # frequencies doubled, the Nyquist bin (even n) ZEROED — unlike
        # the 1-D hilbert, which keeps it.
        h = np.zeros(n, np.float32)
        h[0] = 1.0
        h[1:(n + 1) // 2] = 2.0
        return h

    from .api import fft2, ifft2
    hh = jnp.asarray(np.outer(_h(n1), _h(n2)))
    Xf = fft2(x.astype(jnp.float32), s=(n1, n2))
    return ifft2(Xf * hh)


def resample(x, num: int, t=None, axis: int = 0, window=None,
             domain: str = "time"):
    """Fourier-method resampling (``scipy.signal.resample`` semantics).

    Real inputs ride the r2c/c2r plan path (half-spectrum resize);
    complex inputs use C2C plans with the two-sided spectrum resize and
    the scipy Nyquist-bin split/merge rules.
    """
    x = jnp.asarray(x)
    num = int(num)
    if num < 1:
        raise ValueError("num must be positive")
    axis = axis % x.ndim
    Nx = x.shape[axis]
    real_input = not jnp.issubdtype(x.dtype, jnp.complexfloating)
    from .api import fft, ifft, irfft, rfft, fftfreq

    if domain == "time":
        Xf = (rfft(x.astype(jnp.float32), axis=axis) if real_input
              else fft(x, axis=axis))
    elif domain == "freq":
        Xf = x  # already a spectrum (scipy: dtype decides the layout)
    else:
        raise ValueError("domain must be 'time' or 'freq'")

    # optional spectral window (applied over the full-length spectrum)
    if window is not None:
        if callable(window):
            W = np.asarray(window(np.asarray(fftfreq(Nx))), np.float64)
        elif isinstance(window, (np.ndarray, jnp.ndarray)):
            W = np.asarray(window, np.float64)
            if W.shape != (Nx,):
                raise ValueError("window must have length Nx")
        else:
            from scipy.signal import get_window as _gw
            W = np.fft.ifftshift(_gw(window, Nx)).astype(np.float64)
        shape = [1] * x.ndim
        if real_input:
            # fold the two-sided window onto the half spectrum
            Wr = W.copy()
            Wr[1:] += Wr[:0:-1]
            Wr[1:] *= 0.5
            Wr = Wr[:Nx // 2 + 1]
            shape[axis] = len(Wr)
            Xf = Xf * jnp.asarray(Wr.astype(np.float32)).reshape(shape)
        else:
            shape[axis] = Nx
            Xf = Xf * jnp.asarray(W.astype(np.float32)).reshape(shape)

    N = min(num, Nx)
    nyq = N // 2 + 1
    newshape = list(Xf.shape)
    newshape[axis] = num // 2 + 1 if real_input else num
    Y = jnp.zeros(newshape, Xf.dtype)

    def _sl(a, b):
        s = [slice(None)] * Xf.ndim
        s[axis] = slice(a, b)
        return tuple(s)

    Y = Y.at[_sl(0, nyq)].set(Xf[_sl(0, nyq)])
    if not real_input and N > 2:
        # negative frequencies
        Y = Y.at[_sl(newshape[axis] - (N - nyq), None)].set(
            Xf[_sl(Nx - (N - nyq), None)])

    if N % 2 == 0:
        if num < Nx:  # downsampling: fold the split Nyquist pair
            if real_input:
                Y = Y.at[_sl(N // 2, N // 2 + 1)].multiply(2.0)
            else:
                Y = Y.at[_sl(N // 2, N // 2 + 1)].add(
                    Xf[_sl(Nx - N // 2, Nx - N // 2 + 1)])
        elif num > Nx:  # upsampling: split the Nyquist bin
            Y = Y.at[_sl(N // 2, N // 2 + 1)].multiply(0.5)
            if not real_input:
                Y = Y.at[_sl(num - N // 2, num - N // 2 + 1)].set(
                    Y[_sl(N // 2, N // 2 + 1)])

    y = (irfft(Y, n=num, axis=axis) if real_input
         else ifft(Y, axis=axis))
    y = y * (float(num) / float(Nx))
    if t is None:
        return y
    new_t = np.arange(0, num) * (t[1] - t[0]) * Nx / float(num) + t[0]
    return y, new_t


def _frame_params(nperseg, noverlap, nfft, n):
    nperseg = int(nperseg)
    if nperseg < 1:
        raise ValueError("nperseg must be positive")
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    if noverlap >= nperseg:
        raise ValueError("noverlap must be less than nperseg")
    nfft = nperseg if nfft is None else int(nfft)
    if nfft < nperseg:
        raise ValueError("nfft must be >= nperseg")
    return nperseg, noverlap, nfft


def _get_window(window, nperseg):
    from scipy.signal import get_window as _gw
    if isinstance(window, (str, tuple)):
        w = _gw(window, nperseg)
    else:
        w = np.asarray(window)
        if w.shape != (nperseg,):
            raise ValueError(f"window length {w.shape} != nperseg {nperseg}")
    return w.astype(np.float64)


def stft(x, fs: float = 1.0, window="hann", nperseg: int = 256,
         noverlap: Optional[int] = None, nfft: Optional[int] = None,
         boundary: Optional[str] = "zeros", padded: bool = True,
         axis: int = -1, scaling: str = "spectrum"):
    """Short-time Fourier transform (``scipy.signal.stft`` semantics,
    ``detrend=False, return_onesided=True``).

    Frames are one strided gather + window multiply, then ONE batched
    r2c plan over all segments — the TPU-native shape (the reference
    wrapper has no real, batched, or inverse transforms at all).
    Returns (f, t, Zxx) like scipy.
    """
    x = jnp.asarray(x)
    axis = axis % x.ndim
    nperseg, noverlap, nfft = _frame_params(nperseg, noverlap, nfft,
                                            x.shape[axis])
    win = _get_window(window, nperseg)
    step = nperseg - noverlap

    xm = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    n = xm.shape[-1]
    if boundary is not None:
        if boundary != "zeros":
            raise NotImplementedError("boundary: only 'zeros'/None")
        pad = [(0, 0)] * (xm.ndim - 1) + [(nperseg // 2, nperseg // 2)]
        xm = jnp.pad(xm, pad)
        n = xm.shape[-1]
    if padded:
        nseg = max(1, -(-(n - nperseg) // step) + 1)
        total = (nseg - 1) * step + nperseg
        if total > n:
            xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, total - n)])
            n = total
    nseg = (n - nperseg) // step + 1
    idx = (np.arange(nseg)[:, None] * step
           + np.arange(nperseg)[None, :])          # (nseg, nperseg)
    frames = xm[..., idx] * jnp.asarray(win.astype(np.float32))
    if nfft > nperseg:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1)
                         + [(0, nfft - nperseg)])
    from .api import rfft
    z = rfft(frames, axis=-1)                       # (..., nseg, nfft//2+1)
    if scaling == "spectrum":
        z = z * jnp.asarray(np.float32(1.0 / win.sum()))
    elif scaling == "psd":
        z = z * jnp.asarray(np.float32(1.0 / np.sqrt(fs * (win * win).sum())))
    else:
        raise ValueError("scaling must be 'spectrum' or 'psd'")
    # scipy layout: frequency axis before time: (..., nfreq, nseg)
    z = jnp.swapaxes(z, -1, -2)
    f = np.arange(nfft // 2 + 1) * (fs / nfft)
    t = (np.arange(nseg) * step
         + (0 if boundary is None else 0)) / fs
    if boundary is None:
        t = (np.arange(nseg) * step + nperseg / 2) / fs
    return f, t, z


def istft(Zxx, fs: float = 1.0, window="hann", nperseg: Optional[int] = None,
          noverlap: Optional[int] = None, nfft: Optional[int] = None,
          boundary: bool = True, time_axis: int = -1, freq_axis: int = -2,
          scaling: str = "spectrum"):
    """Inverse STFT (``scipy.signal.istft`` semantics, onesided input):
    batched irfft over segments + windowed overlap-add with the COLA
    normalization.  Returns (t, x) like scipy."""
    z = jnp.asarray(Zxx)
    time_axis = time_axis % z.ndim
    freq_axis = freq_axis % z.ndim
    nfreq = z.shape[freq_axis]
    nfft = 2 * (nfreq - 1) if nfft is None else int(nfft)
    nperseg = nfft if nperseg is None else int(nperseg)
    noverlap = nperseg // 2 if noverlap is None else int(noverlap)
    step = nperseg - noverlap
    win = _get_window(window, nperseg)

    # move (freq, time) to the trailing axes as (..., nseg, nfreq)
    z = jnp.moveaxis(z, (freq_axis, time_axis), (-1, -2))
    nseg = z.shape[-2]
    from .api import irfft
    segs = irfft(z, n=nfft, axis=-1)[..., :nperseg]  # (..., nseg, nperseg)
    if scaling == "spectrum":
        segs = segs * jnp.asarray(np.float32(win.sum()))
    elif scaling == "psd":
        segs = segs * jnp.asarray(np.float32(np.sqrt(fs * (win * win).sum())))
    else:
        raise ValueError("scaling must be 'spectrum' or 'psd'")
    wsegs = segs * jnp.asarray(win.astype(np.float32))

    total = (nseg - 1) * step + nperseg
    lead = wsegs.shape[:-2]
    # scatter-free overlap-add when step divides nperseg (the common
    # hop cases incl. the 50% default): split each segment into
    # nperseg/step step-chunks and roll them onto a (nseg+q-1, step) grid
    if nperseg % step == 0:
        q = nperseg // step
        chunks = wsegs.reshape(*lead, nseg, q, step)
        out = jnp.zeros(lead + ((nseg + q - 1) * step,), jnp.float32)
        for j in range(q):
            sl = chunks[..., :, j, :].reshape(*lead, nseg * step)
            out = out.at[..., j * step:(j + nseg) * step].add(sl)
        out = out[..., :total]
    else:
        out = jnp.zeros(lead + (total,), jnp.float32)
        for i in range(nseg):
            out = out.at[..., i * step:i * step + nperseg].add(
                wsegs[..., i, :])
    norm = np.zeros(total)
    for i in range(nseg):
        norm[i * step:i * step + nperseg] += win * win
    norm = np.where(norm > 1e-10, norm, 1.0)
    x = out / jnp.asarray(norm.astype(np.float32))
    if boundary:
        x = x[..., nperseg // 2: total - nperseg // 2]
    t = np.arange(x.shape[-1]) / fs
    return t, x
