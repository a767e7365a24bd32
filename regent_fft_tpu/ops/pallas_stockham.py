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

# Lane-tile width per kernel instance and per-call operand cap.  Hardware
# bisection: the Mosaic grid pipeline compiles butterfly kernels only with
# <=128-wide tiles and n <= 1024 (wider tiles or more rows crash the
# compile helper).
LANE_TILE = 128
MAX_STOCKHAM_N = 1024
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


def _packed_tables(n: int, sign: int):
    """All stages' twiddles packed into TWO (T, 1) arrays + slice offsets.

    Radix-4 stages pack W^j | W^2j | W^3j; radix-2 stages pack W^j.
    Packing matters: the Mosaic grid pipeline crashes with ~18 separate
    table operands but is fine with two (found by hardware bisection).
    Returns (wr (T,1), wi (T,1), offsets) where offsets[stage] is a list
    of (start, h) slices per twiddle factor of that stage.
    """
    re_parts, im_parts, offsets = [], [], []
    pos = 0
    for r, m in _plan_stages(n):
        h = m // r
        j = np.arange(h, dtype=np.int64)
        offs = []
        for q in range(1, r):
            theta = (2.0 * np.pi * q / m) * j * float(sign)
            re_parts.append(np.cos(theta).astype(np.float32))
            im_parts.append(np.sin(theta).astype(np.float32))
            offs.append((pos, h))
            pos += h
        offsets.append(offs)
    if pos == 0:  # n == 1
        re_parts, im_parts = [np.zeros(1, np.float32)], [np.zeros(1, np.float32)]
        pos = 1
    wr = np.concatenate(re_parts).reshape(pos, 1)
    wi = np.concatenate(im_parts).reshape(pos, 1)
    return wr, wi, offsets


def _cmul(br, bi, wr, wi):
    return br * wr - bi * wi, br * wi + bi * wr


def _stockham_tile(xr, xi, n: int, sign: int, wr_all, wi_all):
    """Mixed radix-4/2 Stockham over axis 0 of (n, V) VMEM values.

    ``wr_all``/``wi_all`` are the packed (T, 1) twiddle planes; stage
    slices are static.
    """
    v = xr.shape[-1]
    ar = xr.reshape(1, n, v)
    ai = xi.reshape(1, n, v)
    L = 1
    s = float(sign)
    _, _, offsets = _packed_tables(n, sign)
    for (r, m), offs in zip(_plan_stages(n), offsets):
        h = m // r
        ws = []
        for (start, hh) in offs:
            ws.append(wr_all[start:start + hh])
            ws.append(wi_all[start:start + hh])
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

    Packed twiddle planes enter as two operands with constant index maps
    (kernels cannot capture constants; many separate operands crash the
    grid pipeline).
    """
    wr_np, wi_np, _ = _packed_tables(n, sign)

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        yr, yi = _stockham_tile(xr_ref[:], xi_ref[:], n, sign,
                                wr_ref[:], wi_ref[:])
        yr_ref[:] = yr
        yi_ref[:] = yi

    def run(xr, xi):
        vdim = xr.shape[1]
        bs = pl.BlockSpec((n, vt), lambda j: (0, j), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(vdim // vt,),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((n, vdim), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * vdim),
                bytes_accessed=4 * n * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


@functools.lru_cache(maxsize=256)
def _runner_mid(n: int, sign: int, vt: int, interpret: bool = False):
    """Kernel for FFT along the MIDDLE axis of (P, n, V) data.

    The array is viewed 2-D as (P*n, V); grid (P, V/vt) with block
    (n, vt) whose row BLOCK index i selects rows [i*n, (i+1)*n) — the
    i-th pre-slice.  Everything stays 2-D (3-D blocks with unit leading
    dims crash this Mosaic build).
    """
    wr_np, wi_np, _ = _packed_tables(n, sign)

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        yr, yi = _stockham_tile(xr_ref[:], xi_ref[:], n, sign,
                                wr_ref[:], wi_ref[:])
        yr_ref[:] = yr
        yi_ref[:] = yi

    def run(xr, xi):
        """xr, xi: (P*n, vt) 2-D views; returns same-shaped planes.

        ROW-tiled 1-D grid only: each block is one full-width pre-slice
        (column-tiled grids crash this Mosaic build).
        """
        rows, vdim = xr.shape
        assert vdim == vt, (vdim, vt)
        p = rows // n
        bs = pl.BlockSpec((n, vt), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(p,),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((rows, vdim), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * vdim * p),
                bytes_accessed=4 * rows * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


@functools.lru_cache(maxsize=256)
def _runner_last(n: int, sign: int, tb: int, interpret: bool = False):
    """Kernel over (B, n) arrays: FFT along the LAST axis.

    Blocks (tb, n) are transposed IN VMEM (2-D transposes are
    Mosaic-native) so the butterfly core still runs with the transform
    axis on sublanes; transposed back on write.
    """
    wr_np, wi_np, _ = _packed_tables(n, sign)

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        yr, yi = _stockham_tile(xr_ref[:].T, xi_ref[:].T, n, sign,
                                wr_ref[:], wi_ref[:])
        yr_ref[:] = yr.T
        yi_ref[:] = yi.T

    def run(xr, xi):
        b = xr.shape[0]
        bs = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(b // tb,),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * b),
                bytes_accessed=4 * b * n * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


def _vt_cap(n: int) -> int:
    """Lane-tile width for an n-point kernel.

    Hardware-validated envelope: vt = min(512, 64K/n rounded down to a
    lane multiple) but never below 128 — so n=1024 runs at 128-wide tiles
    (128K-element blocks, validated on hardware); wider tiles at large n
    crash the Mosaic helper.
    """
    return max(LANE_TILE, min(512, (65536 // max(n, 1)) // 128 * 128))


def _mid_apply(xr3, xi3, n: int, sign: int, interpret: bool):
    """FFT over axis 1 of (pre, n, post) split planes via row-tiled blocks.

    post is padded to a lane multiple.  When post exceeds the VMEM width
    cap, the lane dim is split (free) and the chunk axis transposed out
    (one copy each way) so every block stays full-width — column-tiled
    grids crash this Mosaic build.
    """
    pre, _, post = xr3.shape
    vt = _vt_cap(n)
    pad = (-post) % 128
    if pad:
        xr3 = jnp.pad(xr3, ((0, 0), (0, 0), (0, pad)))
        xi3 = jnp.pad(xi3, ((0, 0), (0, 0), (0, pad)))
    postp = xr3.shape[-1]
    if postp <= vt:
        run = _runner_mid(n, sign, postp, interpret)
        yr, yi = _chunk_rows_map(run, xr3.reshape(pre * n, postp),
                                 xi3.reshape(pre * n, postp), n)
        yr = yr.reshape(pre, n, postp)[:, :, :post]
        yi = yi.reshape(pre, n, postp)[:, :, :post]
        return yr, yi
    # wide case: (pre, n, nc, vc) -> (pre, nc, n, vc) [copy] -> row blocks
    vc = vt
    while postp % vc:
        vc -= 128
    nc = postp // vc
    xr4 = jnp.swapaxes(xr3.reshape(pre, n, nc, vc), 1, 2)
    xi4 = jnp.swapaxes(xi3.reshape(pre, n, nc, vc), 1, 2)
    run = _runner_mid(n, sign, vc, interpret)
    yr, yi = _chunk_rows_map(run, xr4.reshape(pre * nc * n, vc),
                             xi4.reshape(pre * nc * n, vc), n)
    yr = jnp.swapaxes(yr.reshape(pre, nc, n, vc), 1, 2).reshape(pre, n, postp)
    yi = jnp.swapaxes(yi.reshape(pre, nc, n, vc), 1, 2).reshape(pre, n, postp)
    return yr[:, :, :post], yi[:, :, :post]


def _chunk_rows_map(run, xr2, xi2, n: int):
    """Split a (R, vc) row-blocked call into operand-size-safe pieces."""
    rows, vc = xr2.shape
    if rows * vc <= MAX_CALL_ELEMS:
        return run(xr2, xi2)
    pre = rows // n
    chunk = max(1, MAX_CALL_ELEMS // (n * vc))  # pre-slices per call
    while pre % chunk:
        chunk -= 1
    nc = pre // chunk
    xr4 = xr2.reshape(nc, chunk * n, vc)
    xi4 = xi2.reshape(nc, chunk * n, vc)
    yr4, yi4 = jax.lax.map(lambda ab: run(ab[0], ab[1]), (xr4, xi4))
    return yr4.reshape(rows, vc), yi4.reshape(rows, vc)


def fft_axis_stockham(xr, xi, axis: int, direction: Direction,
                      interpret: bool = False):
    """FFT along ``axis`` of an N-D split pair via the butterfly kernels.

    Power-of-two lengths only.  Last axis: row-tiled (tb, n) blocks with
    in-VMEM 2-D transposes.  Other axes: row-tiled full-width (n, vc)
    blocks (one normalization copy each way when the trailing extent
    exceeds the VMEM width cap).
    """
    ndim = xr.ndim
    axis = axis % ndim
    n = xr.shape[axis]
    if n & (n - 1) or n > MAX_STOCKHAM_N:
        raise ValueError(
            f"stockham path needs power-of-two length <= {MAX_STOCKHAM_N}, got {n}")
    sign = int(direction)
    shape = xr.shape
    if axis == ndim - 1 and ndim > 1:
        b = int(np.prod(shape[:-1]))
        xr2 = xr.reshape(b, n)
        xi2 = xi.reshape(b, n)
        tb = LANE_TILE
        pad = (-b) % tb
        if pad:
            xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
            xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
        run = _runner_last(n, sign, tb, interpret)
        yr, yi = _chunk_rows_map(run, xr2, xi2, tb)
        return yr[:b].reshape(shape), yi[:b].reshape(shape)
    pre = int(np.prod(shape[:axis])) if axis else 1
    post = int(np.prod(shape[axis + 1:]))
    yr, yi = _mid_apply(xr.reshape(pre, n, post), xi.reshape(pre, n, post),
                        n, sign, interpret)
    return yr.reshape(shape), yi.reshape(shape)
