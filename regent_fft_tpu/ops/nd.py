"""N-D transforms: row-column decomposition over arbitrary axes.

TPU re-design of FFTW's rank>=2 solver (``/root/reference/fftw-3.3.8/dft/
rank-geq2.c``): an N-D FFT is a sequence of batched 1-D FFTs, one per axis,
with layout moves between them.  The reference supports 1 <= dim <= 3
(``/root/reference/src/fft.rg:41``); we support arbitrary rank and arbitrary
axis subsets (numpy.fft semantics), with leading batch dims free.

At this (jnp) level the inter-axis "transposes" are expressed as moveaxis —
XLA chooses the physical layout/copies.  The Pallas execution path fuses the
last-axis FFT with a tiled transpose instead (ops/pallas_fft.py).
"""
from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jax.Array, jax.Array]


def apply_along_axis(fn_1d: Callable, axis: int, xr, xi) -> Pair:
    """Apply a (B, n)->(B, k) split-pair 1-D transform along ``axis``."""
    ndim = xr.ndim
    axis = axis % ndim
    if axis != ndim - 1:
        xr = jnp.moveaxis(xr, axis, -1)
        xi = jnp.moveaxis(xi, axis, -1)
    lead = xr.shape[:-1]
    n = xr.shape[-1]
    yr, yi = fn_1d(xr.reshape(-1, n), xi.reshape(-1, n))
    k = yr.shape[-1]
    yr = yr.reshape(*lead, k)
    yi = yi.reshape(*lead, k)
    if axis != ndim - 1:
        yr = jnp.moveaxis(yr, -1, axis)
        yi = jnp.moveaxis(yi, -1, axis)
    return yr, yi


def apply_along_axis_real_in(fn_1d: Callable, axis: int, x) -> Pair:
    """Apply a (B, n)->pair r2c transform along ``axis`` of a real array."""
    ndim = x.ndim
    axis = axis % ndim
    if axis != ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    n = x.shape[-1]
    yr, yi = fn_1d(x.reshape(-1, n))
    k = yr.shape[-1]
    yr = yr.reshape(*lead, k)
    yi = yi.reshape(*lead, k)
    if axis != ndim - 1:
        yr = jnp.moveaxis(yr, -1, axis)
        yi = jnp.moveaxis(yi, -1, axis)
    return yr, yi


def apply_along_axis_real_out(fn_1d: Callable, axis: int, xr, xi):
    """Apply a pair->(B, n) c2r transform along ``axis``; returns real array."""
    ndim = xr.ndim
    axis = axis % ndim
    if axis != ndim - 1:
        xr = jnp.moveaxis(xr, axis, -1)
        xi = jnp.moveaxis(xi, axis, -1)
    lead = xr.shape[:-1]
    h = xr.shape[-1]
    y = fn_1d(xr.reshape(-1, h), xi.reshape(-1, h))
    y = y.reshape(*lead, y.shape[-1])
    if axis != ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def c2c_nd(fns_by_axis: Sequence[Tuple[int, Callable]], xr, xi) -> Pair:
    """Multi-axis C2C: apply each (axis, fn_1d) in sequence.

    Axis order matters for performance only (the DFTs commute); callers
    should order the last (contiguous, lane-aligned) axis first.
    """
    for axis, fn in fns_by_axis:
        xr, xi = apply_along_axis(fn, axis, xr, xi)
    return xr, xi
