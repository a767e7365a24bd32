"""Fused Pallas TPU kernels for the FFT hot path.

Replaces the reference's cuFFT dispatch (``/root/reference/src/fft.rg:
574-580``) with hand-written kernels.  The XLA matmul path
(ops/stockham.py) materializes every radix stage to HBM; these kernels run
the FULL mixed-radix pipeline on a VMEM-resident batch tile — one HBM read
and one HBM write per transform instead of one per stage (SURVEY.md
hard-parts items 1-2).

Mosaic layout rules discovered on hardware (and respected here):
  * reshapes that split/merge the trailing (lane) dimension into sub-128
    pieces force a relayout — NEVER reshape inside the kernel;
  * dot_general contracting the MIDDLE axis of a 3-D operand is native;
  * swapaxes of the last two dims is fine when both are >= 16.

So the kernel operates on 3-D blocks pre-shaped at the JAX level:

  x (B, n) --host reshape--> (B, n1, n2), n = n1*n2, 16 <= n_i <= 128
  kernel tile (tb, n1, n2), all VMEM:
    A  = dot_mid(x, D_{n1})        # contract nu1        -> (tb, n2, k1)
    A *= T[nu2, k1]                # fused VPU twiddle
    C  = dot_mid(A, D_{n2})        # contract nu2        -> (tb, k1, k2)
    out = C.swapaxes(1, 2)         # k = k1 + n1*k2 ordering
  --host reshape--> (B, n)

Sizes n <= 128 use a single direct dot (no twiddle, no swap).  Sizes with
no 2-factor schedule in [16, 128]^2 fall back to the XLA path.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import Direction
from . import factor as _factor
from . import twiddle as _twiddle

# VMEM working-set budget per kernel instance (~16 MiB/core on v5e; stay
# low so Mosaic can double-buffer the grid pipeline).
VMEM_BUDGET = 6 * 1024 * 1024
_WS_FACTOR = 6 * 4  # re+im x (in, temp, out) x 4 bytes

# Mosaic (this backend) crashes compiling compute kernels whose HBM operand
# planes exceed ~32 MiB; batches beyond this are chunked through lax.map so
# each pallas_call stays small (one compile, sequential chunk execution).
MAX_CALL_ELEMS = 4 * 1024 * 1024  # f32 elements per plane per pallas_call


def _chunk_size(b: int, tb: int, per_elems: int) -> int:
    """Largest multiple of tb dividing b with chunk*per_elems <= cap."""
    m = b // tb
    target = max(1, MAX_CALL_ELEMS // (per_elems * tb))
    d = min(m, target)
    while m % d:
        d -= 1
    return d * tb


def _chunked_call(run3, xr, xi, tb: int):
    """Apply run3 over batch chunks so each pallas_call stays small.

    One trace/compile (lax.map reuses the body), sequential execution per
    chunk — the pipeline inside each call keeps the chip busy.
    """
    b = xr.shape[0]
    per = int(np.prod(xr.shape[1:]))
    if b * per <= MAX_CALL_ELEMS:
        return run3(xr, xi)
    chunk = _chunk_size(b, tb, per)
    nc = b // chunk
    xr4 = xr.reshape((nc, chunk) + xr.shape[1:])
    xi4 = xi.reshape((nc, chunk) + xi.shape[1:])
    yr4, yi4 = jax.lax.map(lambda ab: run3(ab[0], ab[1]), (xr4, xi4))
    return (yr4.reshape((b,) + yr4.shape[2:]), yi4.reshape((b,) + yi4.shape[2:]))


def _middot(v, m, precision):
    """Contract axis 1 of (b, n, t) with (n, k) -> (b, t, k)."""
    return jax.lax.dot_general(
        v, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _cdot_mid(xr, xi, dr, di, precision):
    yr = _middot(xr, dr, precision) - _middot(xi, di, precision)
    yi = _middot(xr, di, precision) + _middot(xi, dr, precision)
    return yr, yi


def _cdot_last(xr, xi, dr, di, precision):
    """(b, n) @ (n, k) complex via 4 real MXU dots."""
    d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                             precision=precision)
    return d(xr, dr) - d(xi, di), d(xr, di) + d(xi, dr)


def two_stage_split(n: int) -> Optional[Tuple[int, int]]:
    """n = n1*n2 with 16 <= n_i <= 128, preferring balanced factors."""
    s = _factor.pallas_schedule(n)
    if s is None or len(s) > 2:
        return None
    if len(s) == 1:
        return None  # handled by the 1-stage kernel
    return (s[0], s[1])


def pick_tile_batch(n: int, batch: int) -> int:
    """Largest power-of-two batch tile whose working set fits VMEM.

    Callers pad the batch up to a tile multiple, so tb need not divide it.
    """
    tb = max(1, VMEM_BUDGET // max(1, n * _WS_FACTOR))
    tb = 1 << (tb.bit_length() - 1)
    if batch > 0:
        ceil_pow2 = 1 << max(0, (batch - 1)).bit_length()
        tb = min(tb, ceil_pow2)
    # Mosaic (this backend) crashes on compute kernels with batch tiles
    # beyond 64 rows; 64 x 128 lanes also saturates the VPU/MXU pipe.
    return max(min(tb, 64), 1)


@functools.lru_cache(maxsize=256)
def _runner_1stage(n: int, sign: int, tb: int, precision_name: str,
                   interpret: bool = False):
    """Direct DFT kernel: one complex matmul on (tb, n) 2-D tiles."""
    precision = getattr(jax.lax.Precision, precision_name)
    dr_np, di_np = _twiddle.dft_matrix(n, sign)

    def kernel(xr_ref, xi_ref, dr_ref, di_ref, yr_ref, yi_ref):
        yr, yi = _cdot_last(xr_ref[:], xi_ref[:], dr_ref[:], di_ref[:], precision)
        yr_ref[:] = yr
        yi_ref[:] = yi

    def run(xr, xi):
        b = xr.shape[0]
        bs = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ds = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(b // tb,),
            in_specs=[bs, bs, ds, ds], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((b, n), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=8 * n * n * b, bytes_accessed=4 * b * n * 4,
                transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(dr_np), jnp.asarray(di_np))
    return run


@functools.lru_cache(maxsize=256)
def _runner_2stage(n1: int, n2: int, sign: int, tb: int, precision_name: str,
                   interpret: bool = False):
    """Fused two-stage kernel on (tb, n1, n2) 3-D tiles (docstring above)."""
    n = n1 * n2
    precision = getattr(jax.lax.Precision, precision_name)
    d1r, d1i = _twiddle.dft_matrix(n1, sign)
    d2r, d2i = _twiddle.dft_matrix(n2, sign)
    twr, twi = _twiddle.twiddle_outer(n1, n2, n, sign)        # (k1, nu2)
    twr = np.ascontiguousarray(twr.T)                          # (nu2, k1)
    twi = np.ascontiguousarray(twi.T)
    tables = (d1r, d1i, d2r, d2i, twr, twi)

    def kernel(xr_ref, xi_ref, d1r_ref, d1i_ref, d2r_ref, d2i_ref,
               tr_ref, ti_ref, yr_ref, yi_ref):
        ar, ai = _cdot_mid(xr_ref[:], xi_ref[:], d1r_ref[:], d1i_ref[:],
                           precision)                          # (tb, n2, k1)
        tr = tr_ref[:][None]
        ti = ti_ref[:][None]
        ar, ai = ar * tr - ai * ti, ar * ti + ai * tr
        cr, ci = _cdot_mid(ar, ai, d2r_ref[:], d2i_ref[:], precision)
        yr_ref[:] = cr.swapaxes(1, 2)                          # (tb, k2, k1)
        yi_ref[:] = ci.swapaxes(1, 2)

    def run(xr, xi):
        """xr, xi: (B, n1, n2) -> (B, n2, n1); caller reshapes flat."""
        b = xr.shape[0]
        bs_in = pl.BlockSpec((tb, n1, n2), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        bs_out = pl.BlockSpec((tb, n2, n1), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        tspecs = [pl.BlockSpec(t.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for t in tables]
        flops = (8 * n * (n1 + n2) + 6 * n) * b
        return pl.pallas_call(
            kernel, grid=(b // tb,),
            in_specs=[bs_in, bs_in] + tspecs, out_specs=[bs_out, bs_out],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=4 * b * n * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, *[jnp.asarray(t) for t in tables])
    return run


def _plan_kind(n: int):
    if 2 <= n <= 128:
        return ("direct",)
    split = two_stage_split(n)
    if split is not None:
        return ("two", split)
    return None


def build_c2c_1d_pallas(n: int, direction: Direction, max_radix: int,
                        precision, use_3m: bool = False,
                        planner: str = "estimate",
                        interpret: bool = False):
    """Build fn((B, n) re, im) -> (re, im) running the fused kernel.

    Returns None when the size can't take the Pallas path (caller falls
    back to the XLA matmul path).
    """
    if not interpret and jax.default_backend() != "tpu":
        return None
    kind = _plan_kind(n)
    if kind is None:
        return None
    sign = int(direction)
    prec_name = ("HIGHEST" if precision == jax.lax.Precision.HIGHEST
                 else "HIGH" if precision == jax.lax.Precision.HIGH
                 else "DEFAULT")

    if kind[0] == "direct":
        def fn(xr, xi):
            b = xr.shape[0]
            tb = pick_tile_batch(n, b)
            pad = (-b) % tb
            if pad:
                xr = jnp.pad(xr, ((0, pad), (0, 0)))
                xi = jnp.pad(xi, ((0, pad), (0, 0)))
            run = _runner_1stage(n, sign, tb, prec_name, interpret)
            yr, yi = _chunked_call(run, xr, xi, tb)
            return yr[:b], yi[:b]
        return fn

    n1, n2 = kind[1]

    def fn(xr, xi):
        b = xr.shape[0]
        tb = pick_tile_batch(n, b)
        pad = (-b) % tb
        if pad:
            xr = jnp.pad(xr, ((0, pad), (0, 0)))
            xi = jnp.pad(xi, ((0, pad), (0, 0)))
        bp = xr.shape[0]
        run = _runner_2stage(n1, n2, sign, tb, prec_name, interpret)
        yr, yi = _chunked_call(run, xr.reshape(bp, n1, n2),
                               xi.reshape(bp, n1, n2), tb)
        return yr.reshape(bp, n)[:b], yi.reshape(bp, n)[:b]
    return fn
