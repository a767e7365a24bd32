"""Distributed real-to-real transforms: FFTW's MPI r2r layer.

``fftw_mpi_plan_r2r`` (``/root/reference/fftw-3.3.8/mpi/api.c:687-731``,
solver ``mpi/rdft-rank-geq2.c``) plans an N-D r2r transform — one FFTW
kind (DCT/DST/DHT/halfcomplex) per axis — with the first axis
block-distributed.  The TPU-native form mirrors the slab C2C pipeline
(``distributed.make_plan_slab``) but moves ONE real plane through each
``all_to_all`` — r2r transports half the ICI bytes of same-size C2C,
which is the whole point of planning r2r instead of complexifying.

Pipeline: local r2r over axes 1..nd-1 (through the library's own r2r
kind builders, ``ops/r2r.build_r2r_1d``), one all_to_all trading axis 0
for the last axis, r2r of the former slab axis at full length, and an
inverse all_to_all unless ``transposed_out`` (FFTW_MPI_TRANSPOSED_OUT,
kept distributed over the LAST axis).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import r2r as _r2r
from ..ops import factor as _factor
from .mesh import make_fft_mesh
from .distributed import shard_map

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _r2r_axes_core(local_shape, axes, kinds, max_radix, precision):
    """Local-stage multi-axis r2r core (R2RPlan's axis loop, shaped for a
    shard-local block): fn(real array) -> real array, unnormalized."""
    prec = _PRECISIONS[precision]
    fns = [(a, _r2r.build_r2r_1d(int(local_shape[a]), k, max_radix, prec))
           for a, k in zip(axes, kinds)]

    def core(x):
        for a, fn in fns:
            nd = x.ndim
            ax = a % nd
            moved = jnp.moveaxis(x, ax, -1) if ax != nd - 1 else x
            lead = moved.shape[:-1]
            y2 = fn(moved.reshape(-1, moved.shape[-1]))
            y = y2.reshape(*lead, y2.shape[-1])
            x = jnp.moveaxis(y, -1, ax) if ax != nd - 1 else y
        return x

    return core


class DistributedR2RPlan:
    """Slab-distributed N-D r2r plan: callable on the global real array."""

    def __init__(self, desc, mesh, in_spec, out_spec, fn, shape, flops):
        self.description = desc
        self.mesh = mesh
        self.in_sharding = NamedSharding(mesh, in_spec)
        self.out_sharding = NamedSharding(mesh, out_spec)
        self.global_shape = tuple(shape)
        self.flops = flops
        self._fn = jax.jit(fn)
        self._destroyed = False
        from ..utils.plog import log_plan
        log_plan(self)

    def __call__(self, x):
        if self._destroyed:
            raise RuntimeError("plan was destroyed")
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            raise TypeError(f"r2r plans take real input, got {x.dtype}")
        x = x.astype(jnp.float32)
        if x.shape != self.global_shape:
            raise ValueError(
                f"input shape {x.shape} != planned {self.global_shape}")
        x = jax.lax.with_sharding_constraint(x, self.in_sharding)
        return self._fn(x)

    execute = __call__

    def print_plan(self):
        print(self.description)

    def destroy(self):
        self._destroyed = True
        self._fn = None


def make_plan_slab_r2r(shape, kinds, mesh: Optional[Mesh] = None,
                       axis_name: str = "fft", transposed_out: bool = False,
                       max_radix: int = _factor.DEFAULT_MAX_RADIX,
                       precision: str = "highest") -> DistributedR2RPlan:
    """Global N-D r2r transform, slab-decomposed over the first axis.

    ``kinds``: one :class:`~regent_fft_tpu.ops.r2r.R2RKind` (applied to
    every axis) or one kind per axis, FFTW argument order
    (``fftw_mpi_plan_r2r``'s kind array).  Unnormalized FFTW semantics —
    compose with scipy-style scaling at the call site if needed.
    Requires rank >= 2, P | shape[0] and P | shape[-1] (the all_to_all
    axis trade); ``transposed_out`` keeps the result distributed over the
    LAST axis, skipping the second collective.
    """
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    shape = tuple(int(s) for s in shape)
    nd = len(shape)
    if nd < 2:
        raise ValueError("slab r2r needs rank >= 2 (use ops.r2r.plan_r2r "
                         "for single-device 1-D transforms)")
    if isinstance(kinds, (int, _r2r.R2RKind)):
        kinds = (_r2r.R2RKind(kinds),) * nd
    kinds = tuple(_r2r.R2RKind(k) for k in kinds)
    if len(kinds) != nd:
        raise ValueError(f"{len(kinds)} kinds for rank-{nd} transform")
    if shape[0] % p or shape[-1] % p:
        raise ValueError(
            f"axes 0 and -1 must be divisible by mesh size {p}: {shape}")

    local_shape = (shape[0] // p,) + shape[1:]
    core_local = _r2r_axes_core(local_shape, range(1, nd), kinds[1:],
                                max_radix, precision)
    traded = (shape[0],) + shape[1:-1] + (shape[-1] // p,)
    core_ax0 = _r2r_axes_core(traded, (0,), kinds[:1], max_radix, precision)

    def local_fn(x):
        from ..utils.plog import log_collective
        x = core_local(x)
        log_collective("r2r-a2a(real plane)", axis_name, tuple(x.shape))
        x = lax.all_to_all(x, axis_name, split_axis=nd - 1, concat_axis=0,
                           tiled=True)
        x = core_ax0(x)
        if not transposed_out:
            x = lax.all_to_all(x, axis_name, split_axis=0,
                               concat_axis=nd - 1, tiled=True)
        return x

    in_spec = P(axis_name, *([None] * (nd - 1)))
    out_spec = (P(*([None] * (nd - 1)), axis_name) if transposed_out
                else in_spec)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(in_spec,),
                   out_specs=out_spec)
    flops = 0.0
    for a, k in zip(range(nd), kinds):
        nl = _r2r.logical_size(shape[a], k)
        flops += (2.5 * np.prod(shape) / shape[a]
                  * nl * max(1.0, math.log2(max(nl, 2))))
    kind_names = ",".join(k.name for k in kinds)
    desc = (f"(plan-distrib-slab-r2r shape={shape} P={p} "
            f"kinds=[{kind_names}] local-r2r(axes 1..{nd-1}) -> "
            f"all_to_all(real) -> r2r(axis0)"
            f"{' [transposed output]' if transposed_out else ' -> a2a back'})")
    return DistributedR2RPlan(desc, mesh, in_spec, out_spec, fn, shape,
                              flops)
