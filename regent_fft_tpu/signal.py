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
    return SplitComplex(
        jnp.concatenate([p0r[..., None], c.re[..., 1:]], axis=-1),
        jnp.concatenate([p0i[..., None], c.im[..., 1:]], axis=-1))


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
