"""Standalone distributed transpose plans — FFTW-MPI's user primitive.

FFTW exposes its internal distributed transpose as a public plan type
(``fftw_mpi_plan_transpose`` / ``fftw_mpi_plan_many_transpose``,
``/root/reference/fftw-3.3.8/mpi/api.c:521-551``; solvers at
``mpi/transpose-alltoall.c:61-78`` and ``mpi/transpose-pairwise.c:21-49``)
because users build custom distributed pipelines out of it: transpose,
do your own per-row work, transpose back.

The TPU-native form: one ``lax.all_to_all`` under ``shard_map`` plus a
local ``swapaxes`` — the all_to_all converts the row-block distribution
of the (n0, n1) global matrix into a column-block distribution (every
device then holds ``(n0, n1/P)``), and the local transpose produces the
``(n1/P, n0)`` row-block of the transposed matrix.  XLA lowers the
collective onto ICI directly; there is no pairwise-schedule variant
because the interconnect is not a commodity network — the all_to_all IS
the hardware's native pattern (see docs/distributed_projection.md).

``howmany`` carries FFTW's interleaved-tuple semantics
(``plan_many_transpose``'s howmany doubles as the split-complex carrier:
FFTW transposes complex arrays as howmany=2 real tuples): each matrix
element is a length-``howmany`` vector, kept as a TRAILING axis so tuple
lanes stay contiguous on the TPU's lane dimension.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_fft_mesh
from .distributed import shard_map


class TransposePlan:
    """Callable global-transpose plan over a 1-D device mesh.

    Input: the global ``(n0, n1[, howmany])`` array, row-block distributed
    (sharded over axis 0).  Output: the transposed ``(n1, n0[, howmany])``
    array, row-block distributed.  Accepts real or complex arrays of any
    dtype XLA can all_to_all (complex is moved as is on CPU meshes; on
    TPU attach transports pass split planes yourself — or use howmany=2).
    """

    def __init__(self, n0: int, n1: int, howmany: int = 1,
                 mesh: Optional[Mesh] = None, axis_name: str = "fft"):
        mesh = mesh or make_fft_mesh(axis_name=axis_name)
        axis_name = mesh.axis_names[0]
        p = int(mesh.shape[axis_name])
        n0, n1, howmany = int(n0), int(n1), int(howmany)
        if n0 % p or n1 % p:
            raise ValueError(
                f"transpose needs P | n0 and P | n1: ({n0}, {n1}) on P={p}")
        self.mesh = mesh
        self.n0, self.n1, self.howmany = n0, n1, howmany
        self.global_shape = ((n0, n1) if howmany == 1
                             else (n0, n1, howmany))
        self.out_shape = ((n1, n0) if howmany == 1
                          else (n1, n0, howmany))
        trail = () if howmany == 1 else (None,)
        in_spec = P(axis_name, None, *trail)
        self.in_spec, self.out_spec = in_spec, in_spec
        self.in_sharding = NamedSharding(mesh, in_spec)
        self.out_sharding = self.in_sharding

        def local_fn(x):
            from ..utils.plog import log_collective
            log_collective(f"transpose-a2a(n0={n0}, n1={n1}, "
                           f"howmany={howmany})", axis_name, tuple(x.shape))
            # (n0/P, n1, h) --a2a(split n1, concat n0)--> (n0, n1/P, h)
            y = lax.all_to_all(x, axis_name, split_axis=1, concat_axis=0,
                               tiled=True)
            return jnp.swapaxes(y, 0, 1)          # (n1/P, n0, h)

        self._fn = jax.jit(shard_map(local_fn, mesh=mesh,
                                     in_specs=(in_spec,),
                                     out_specs=in_spec))
        self._destroyed = False
        self.description = (f"(plan-transpose {n0}x{n1}"
                            f"{f'x{howmany}' if howmany > 1 else ''} P={p} "
                            f"all_to_all + local swap)")
        from ..utils.plog import log_plan
        log_plan(self)

    def __call__(self, x):
        if self._destroyed:
            raise RuntimeError("plan was destroyed")
        x = jnp.asarray(x)
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


def make_plan_transpose(n0: int, n1: int, mesh: Optional[Mesh] = None,
                        axis_name: str = "fft") -> TransposePlan:
    """``fftw_mpi_plan_transpose(n0, n1)`` analog: plan a global (n0, n1)
    -> (n1, n0) transpose over the mesh (input and output row-block
    distributed)."""
    return TransposePlan(n0, n1, 1, mesh, axis_name)


def make_plan_many_transpose(n0: int, n1: int, howmany: int,
                             mesh: Optional[Mesh] = None,
                             axis_name: str = "fft") -> TransposePlan:
    """``fftw_mpi_plan_many_transpose`` analog: each matrix element is a
    contiguous ``howmany``-tuple (trailing axis).  howmany=2 is FFTW's own
    idiom for transposing complex data through the real transpose plan."""
    return TransposePlan(n0, n1, howmany, mesh, axis_name)
