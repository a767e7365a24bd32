"""Self-sorting Stockham butterfly kernels (VPU path).

The matmul-form kernels (pallas_fft.py) pay the MXU's bf16 precision
passes: f32-accurate products cost 6 MXU passes (HIGHEST), so large-radix
stages are compute-bound.  Butterfly FFTs run on the VPU where f32
multiply-add is NATIVE: ~4.25*N*log2(N) real flops at full precision, no
precision passes at all (SURVEY.md hard-parts item 1 resolved in favor of
planar split re/im + VPU).

The Stockham iteration is chosen for its layout behavior, not just
self-sorting: with the transform axis on SUBLANES as (L, M, lanes),
every stage is

    top/bot = static slices of the middle axis
    butterfly = VPU adds + twiddle multiplies
    recombine = stack on a NEW LEADING axis + leading-dim reshape

None of these touch the lane dimension, which is exactly the set of ops
the Mosaic compiler handles natively (docs/tpu_notes.md layout rules):
no transposes, no gathers, no bit-reversal pass, naturally ordered output.

Kernel core operates on (n, V) blocks — transform axis 0 on sublanes,
vector payload on lanes.  N-D wrappers put any transform axis there via
free host-side reshapes (leading/middle splits only).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import Direction
from . import twiddle as _twiddle

# Lane-tile width per kernel instance and per-call operand cap (same
# Mosaic limits as pallas_fft.py).
LANE_TILE = 256
MAX_CALL_ELEMS = 4 * 1024 * 1024


def _plan_stages(n: int):
    """Radix schedule: radix-4 stages, radix-2 when 4 doesn't divide."""
    stages = []
    m = n
    while m > 1:
        r = 4 if m % 4 == 0 else 2
        stages.append((r, m))
        m //= r
    return stages


def _stage_tables(n: int, sign: int):
    """Per-stage twiddle (re, im) numpy arrays, shaped (h, 1) for sublane
    broadcast against (L, h, V) views.  Radix-4 stages carry W^j, W^2j,
    W^3j; radix-2 stages carry W^j.  Computed in float64."""
    tabs = []
    for r, m in _plan_stages(n):
        h = m // r
        j = np.arange(h, dtype=np.int64)
        ws = []
        for q in range(1, r):
            theta = (2.0 * np.pi * q / m) * j * float(sign)
            ws.append(np.cos(theta).astype(np.float32).reshape(h, 1))
            ws.append(np.sin(theta).astype(np.float32).reshape(h, 1))
        tabs.append(tuple(ws))
    return tabs


def _cmul(br, bi, wr, wi):
    return br * wr - bi * wi, br * wi + bi * wr


def _stockham_tile(xr, xi, n: int, sign: int, tabs):
    """Mixed radix-4/2 Stockham over axis 0 of (n, V) VMEM values."""
    v = xr.shape[-1]
    ar = xr.reshape(1, n, v)
    ai = xi.reshape(1, n, v)
    L = 1
    s = float(sign)
    for (r, m), ws in zip(_plan_stages(n), tabs):
        h = m // r
        if r == 2:
            w_r, w_i = ws[0][None], ws[1][None]
            tr, ti = ar[:, :h, :], ai[:, :h, :]
            br, bi = ar[:, h:, :], ai[:, h:, :]
            er, ei = tr + br, ti + bi
            dr, di = tr - br, ti - bi
            o_r, o_i = _cmul(dr, di, w_r, w_i)
            ar = jnp.stack([er, o_r], axis=0).reshape(2 * L, h, v)
            ai = jnp.stack([ei, o_i], axis=0).reshape(2 * L, h, v)
            L *= 2
        else:
            w1r, w1i = ws[0][None], ws[1][None]
            w2r, w2i = ws[2][None], ws[3][None]
            w3r, w3i = ws[4][None], ws[5][None]
            q0r, q0i = ar[:, 0*h:1*h, :], ai[:, 0*h:1*h, :]
            q1r, q1i = ar[:, 1*h:2*h, :], ai[:, 1*h:2*h, :]
            q2r, q2i = ar[:, 2*h:3*h, :], ai[:, 2*h:3*h, :]
            q3r, q3i = ar[:, 3*h:4*h, :], ai[:, 3*h:4*h, :]
            t0r, t0i = q0r + q2r, q0i + q2i
            t1r, t1i = q0r - q2r, q0i - q2i
            t2r, t2i = q1r + q3r, q1i + q3i
            t3r, t3i = q1r - q3r, q1i - q3i
            # i_ * t3 with i_ = sign*i: re = -s*t3i, im = s*t3r
            it3r, it3i = -s * t3i, s * t3r
            y0r, y0i = t0r + t2r, t0i + t2i
            y1r, y1i = _cmul(t1r + it3r, t1i + it3i, w1r, w1i)
            y2r, y2i = _cmul(t0r - t2r, t0i - t2i, w2r, w2i)
            y3r, y3i = _cmul(t1r - it3r, t1i - it3i, w3r, w3i)
            ar = jnp.stack([y0r, y1r, y2r, y3r], axis=0).reshape(4 * L, h, v)
            ai = jnp.stack([y0i, y1i, y2i, y3i], axis=0).reshape(4 * L, h, v)
            L *= 4
    return ar.reshape(n, v), ai.reshape(n, v)


@functools.lru_cache(maxsize=256)
def _runner_axis0(n: int, sign: int, vt: int, interpret: bool = False):
    """Kernel over (n, V) arrays: FFT along axis 0, grid over lane tiles.

    Twiddle tables are baked as jnp constants?  No — Mosaic kernels cannot
    capture constants; they enter as operands with constant index maps.
    """
    tabs_np = _stage_tables(n, sign)
    flat = [t for group in tabs_np for t in group]
    counts = [len(g) for g in tabs_np]
    n_tab = len(flat)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        tab_vals = [r[:] for r in refs[2:2 + n_tab]]
        yr_ref, yi_ref = refs[2 + n_tab], refs[3 + n_tab]
        tabs, i = [], 0
        for c in counts:
            tabs.append(tuple(tab_vals[i:i + c]))
            i += c
        yr, yi = _stockham_tile(xr_ref[:], xi_ref[:], n, sign, tabs)
        yr_ref[:] = yr
        yi_ref[:] = yi

    def run(xr, xi):
        vdim = xr.shape[1]
        bs = pl.BlockSpec((n, vt), lambda j: (0, j), memory_space=pltpu.VMEM)
        tspecs = [pl.BlockSpec(t.shape, lambda j: (0, 0),
                               memory_space=pltpu.VMEM) for t in flat]
        return pl.pallas_call(
            kernel, grid=(vdim // vt,),
            in_specs=[bs, bs] + tspecs, out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((n, vdim), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * vdim),
                bytes_accessed=4 * n * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(t) for t in flat])
    return run


@functools.lru_cache(maxsize=256)
def _runner_mid(n: int, sign: int, vt: int, interpret: bool = False):
    """Kernel for FFT along the MIDDLE axis of (P, n, V) data.

    The array is viewed 2-D as (P*n, V); grid (P, V/vt) with block
    (n, vt) whose row BLOCK index i selects rows [i*n, (i+1)*n) — the
    i-th pre-slice.  Everything stays 2-D (3-D blocks with unit leading
    dims crash this Mosaic build).
    """
    tabs_np = _stage_tables(n, sign)
    flat = [t for group in tabs_np for t in group]
    counts = [len(g) for g in tabs_np]
    n_tab = len(flat)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        tab_vals = [r[:] for r in refs[2:2 + n_tab]]
        yr_ref, yi_ref = refs[2 + n_tab], refs[3 + n_tab]
        tabs, i = [], 0
        for c in counts:
            tabs.append(tuple(tab_vals[i:i + c]))
            i += c
        yr, yi = _stockham_tile(xr_ref[:], xi_ref[:], n, sign, tabs)
        yr_ref[:] = yr
        yi_ref[:] = yi

    def run(xr, xi):
        """xr, xi: (P*n, V) 2-D views; returns same-shaped planes."""
        rows, vdim = xr.shape
        p = rows // n
        bs = pl.BlockSpec((n, vt), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        tspecs = [pl.BlockSpec(t.shape, lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM) for t in flat]
        return pl.pallas_call(
            kernel, grid=(p, vdim // vt),
            in_specs=[bs, bs] + tspecs, out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((rows, vdim), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * vdim * p),
                bytes_accessed=4 * rows * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(t) for t in flat])
    return run


@functools.lru_cache(maxsize=256)
def _runner_last(n: int, sign: int, tb: int, interpret: bool = False):
    """Kernel over (B, n) arrays: FFT along the LAST axis.

    Blocks (tb, n) are transposed IN VMEM (2-D transposes are
    Mosaic-native) so the butterfly core still runs with the transform
    axis on sublanes; transposed back on write.
    """
    tabs_np = _stage_tables(n, sign)
    flat = [t for group in tabs_np for t in group]
    counts = [len(g) for g in tabs_np]
    n_tab = len(flat)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        tab_vals = [r[:] for r in refs[2:2 + n_tab]]
        yr_ref, yi_ref = refs[2 + n_tab], refs[3 + n_tab]
        tabs, i = [], 0
        for c in counts:
            tabs.append(tuple(tab_vals[i:i + c]))
            i += c
        yr, yi = _stockham_tile(xr_ref[:].T, xi_ref[:].T, n, sign, tabs)
        yr_ref[:] = yr.T
        yi_ref[:] = yi.T

    def run(xr, xi):
        b = xr.shape[0]
        bs = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        tspecs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for t in flat]
        return pl.pallas_call(
            kernel, grid=(b // tb,),
            in_specs=[bs, bs] + tspecs, out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * b),
                bytes_accessed=4 * b * n * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(t) for t in flat])
    return run


def fft_axis_stockham(xr, xi, axis: int, direction: Direction,
                      interpret: bool = False):
    """FFT along ``axis`` of an N-D split pair via the butterfly kernels.

    Host-side reshapes only split/merge leading or middle dims (free);
    the lane dimension is never reshaped.  Power-of-two lengths only.
    """
    ndim = xr.ndim
    axis = axis % ndim
    n = xr.shape[axis]
    if n & (n - 1):
        raise ValueError(f"stockham path needs power-of-two length, got {n}")
    sign = int(direction)
    shape = xr.shape
    if axis == ndim - 1:
        b = int(np.prod(shape[:-1])) if ndim > 1 else 1
        xr2 = xr.reshape(b, n)
        xi2 = xi.reshape(b, n)
        tb = 256 if n <= 1024 else 128
        pad = (-b) % tb
        if pad:
            xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
            xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
        run = _runner_last(n, sign, tb, interpret)
        yr, yi = _chunked_rows(run, xr2, xi2, tb)
        return yr[:b].reshape(shape), yi[:b].reshape(shape)
    pre = int(np.prod(shape[:axis])) if axis else 1
    post = int(np.prod(shape[axis + 1:]))
    if pre == 1:
        yr, yi = fft_axis0_pallas(xr.reshape(n, post), xi.reshape(n, post),
                                  n, direction, interpret)
        return yr.reshape(shape), yi.reshape(shape)
    xr3 = xr.reshape(pre, n, post)
    xi3 = xi.reshape(pre, n, post)
    vt = min(LANE_TILE, max(128, post))
    pad = (-post) % vt
    if pad:
        xr3 = jnp.pad(xr3, ((0, 0), (0, 0), (0, pad)))
        xi3 = jnp.pad(xi3, ((0, 0), (0, 0), (0, pad)))
    vp = xr3.shape[-1]
    run = _runner_mid(n, sign, vt, interpret)
    yr, yi = _chunked_pre(run, xr3.reshape(pre * n, vp),
                          xi3.reshape(pre * n, vp), pre, n)
    yr = yr.reshape(pre, n, vp)[:, :, :post].reshape(shape)
    yi = yi.reshape(pre, n, vp)[:, :, :post].reshape(shape)
    return yr, yi


def _chunked_pre(run, xr2, xi2, pre, n):
    """Chunk a (P*n, V) mid-axis call over groups of pre-slices."""
    rows, v = xr2.shape
    if rows * v <= MAX_CALL_ELEMS:
        return run(xr2, xi2)
    chunk = max(1, MAX_CALL_ELEMS // (n * v))  # pre-slices per call
    while pre % chunk:
        chunk -= 1
    nc = pre // chunk
    xr4 = xr2.reshape(nc, chunk * n, v)
    xi4 = xi2.reshape(nc, chunk * n, v)
    yr4, yi4 = jax.lax.map(lambda ab: run(ab[0], ab[1]), (xr4, xi4))
    return yr4.reshape(rows, v), yi4.reshape(rows, v)


def _chunked_rows(run, xr, xi, tb):
    """Row-chunk a (B, n) call so operands stay under the Mosaic limit."""
    b, n = xr.shape
    if b * n <= MAX_CALL_ELEMS:
        return run(xr, xi)
    chunk = max(tb, (MAX_CALL_ELEMS // n) // tb * tb)
    while b % chunk:
        chunk -= tb
    nc = b // chunk
    xr3 = xr.reshape(nc, chunk, n)
    xi3 = xi.reshape(nc, chunk, n)
    yr3, yi3 = jax.lax.map(lambda ab: run(ab[0], ab[1]), (xr3, xi3))
    return yr3.reshape(b, n), yi3.reshape(b, n)


def fft_axis0_pallas(xr, xi, n: int, direction: Direction,
                     interpret: bool = False):
    """FFT along axis 0 of (n, V) split planes via the butterfly kernel.

    V is padded to a lane-tile multiple; calls are chunked so operands
    stay under the Mosaic size limit.
    """
    sign = int(direction)
    v = xr.shape[1]
    vt = min(LANE_TILE, max(128, v))
    pad = (-v) % vt
    if pad:
        xr = jnp.pad(xr, ((0, 0), (0, pad)))
        xi = jnp.pad(xi, ((0, 0), (0, pad)))
    vp = xr.shape[1]
    run = _runner_axis0(n, sign, vt, interpret)
    max_cols = max(vt, (MAX_CALL_ELEMS // n) // vt * vt)
    if vp <= max_cols:
        yr, yi = run(xr, xi)
        return yr[:, :v], yi[:, :v]
    # chunk the lane dimension through lax.map (middle split is free)
    while vp % max_cols:
        max_cols -= vt
    nc = vp // max_cols
    xr3 = xr.reshape(n, nc, max_cols)
    xi3 = xi.reshape(n, nc, max_cols)
    # lax.map needs a leading axis; moveaxis of the chunk axis is one copy
    xr3 = jnp.moveaxis(xr3, 1, 0)
    xi3 = jnp.moveaxis(xi3, 1, 0)
    yr3, yi3 = jax.lax.map(lambda ab: run(ab[0], ab[1]), (xr3, xi3))
    yr = jnp.moveaxis(yr3, 0, 1).reshape(n, vp)
    yi = jnp.moveaxis(yi3, 0, 1).reshape(n, vp)
    return yr[:, :v], yi[:, :v]
