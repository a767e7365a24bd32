"""Distributed transforms: per-shard parity mode + true global FFTs.

Three modes, in increasing capability:

1. ``shards`` — reference parity.  The reference's "distributed" mode is an
   equal partition + index launch of INDEPENDENT per-node plans
   (``/root/reference/src/fft.rg:513-537``): each node FFTs only its own
   slab.  Here: shard the leading batch axis over the mesh and run the
   local plan under ``shard_map`` with no communication.

2. ``slab`` — a single global N-D FFT with the first axis block-distributed.
   Transform all local axes, one ``all_to_all`` (the distributed transpose,
   re-deriving ``/root/reference/fftw-3.3.8/mpi/transpose-alltoall.c:61-78``
   on ICI), transform the remaining axis.  ``transposed_out=True`` skips the
   inverse transpose exactly like FFTW_MPI_TRANSPOSED_OUT
   (``fftw-3.3.8/mpi/dft-rank-geq2-transposed.c``).

3. ``pencil`` — 2-D process mesh for rank-3 transforms (scales past
   slab's P <= Z limit): two all_to_alls over independent mesh axes.

The reference never wired up a true distributed transform (README "Future
Developments", ``/root/reference/README.md:117-119``); modes 2-3 are the
north-star capability (BASELINE.md distributed 3D target).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map as _jax_shard_map

# Pallas calls inside shard_map cannot declare varying-mesh-axes metadata
# (jax would reject the kernels' ShapeDtypeStructs), so the executor bodies
# run with the vma check off.
shard_map = partial(_jax_shard_map, check_vma=False)

from ..dtypes import Direction, Kind, Norm, SplitComplex, as_split, from_split
from .mesh import make_fft_mesh

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _local_core(local_shape, axes, direction=Direction.FORWARD,
                kind=Kind.C2C, precision: str = "highest",
                use_3m: bool = False, max_radix: int = 128,
                backend: str = "auto", dtype: str = "complex64"):
    """Local-stage transform through the SAME dispatch as single-chip plans.

    Builds an unscaled (norm=NONE) plan core for the shard-local shape, so
    every distributed phase inherits the Stockham/fused2 butterfly kernels
    on TPU (einsum on other backends) instead of the raw einsum path —
    the analog of FFTW's MPI solvers reusing the serial solver registry
    (``/root/reference/fftw-3.3.8/mpi/dft-rank-geq2.c:30-60``).  The
    returned core is shape-polymorphic over batch extents (only the
    transformed-axis lengths and rank are baked in), so pipeline chunks
    reuse one core.
    """
    from ..plan import PlanSpec, _build_core
    if kind == Kind.R2C:
        direction = Direction.FORWARD
    elif kind == Kind.C2R:
        direction = Direction.BACKWARD
    if kind != Kind.C2C:
        dtype = "complex64"  # real-kind kernels are f32-only
    spec = PlanSpec(shape=tuple(local_shape), axes=tuple(axes), kind=kind,
                    direction=direction, norm=Norm.NONE, dtype=dtype,
                    precision=precision, use_3m=use_3m, max_radix=max_radix,
                    backend=backend)
    return _build_core(spec)



def _require_real(x, what: str):
    """R2C plans take REAL input; silently dropping an imaginary part via
    astype would return a plausible-looking wrong spectrum."""
    if jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating):
        raise TypeError(f"{what} takes real input, got {jnp.asarray(x).dtype}")
    return x


def _norm_scale(n: int, direction: Direction, norm: Norm) -> float:
    if norm == Norm.NONE:
        return 1.0
    fwd = direction == Direction.FORWARD
    if norm == Norm.BACKWARD:
        return 1.0 if fwd else 1.0 / n
    if norm == Norm.FORWARD:
        return 1.0 / n if fwd else 1.0
    return 1.0 / math.sqrt(n)


def _apply_scale(xr, xi, scale):
    if scale != 1.0:
        s = jnp.asarray(scale, xr.dtype)
        xr, xi = xr * s, xi * s
    return xr, xi


def _a2a(xr, xi, axis_name: str, split: int, concat: int):
    """all_to_all on both planes, logged at REGENT_FFT_LOG=2.

    The logging analog of the reference's LoggingWrapper, which records
    every mapping/sharding decision at ``-level mapper=2``
    (``/root/reference/test/logging_mapper.cc:129-217``); collectives are
    traced once per plan build, so each site logs its static local shape
    and axes exactly once per compilation.
    """
    from ..utils.plog import log_collective
    log_collective(f"all_to_all(split={split}, concat={concat})",
                   axis_name, tuple(xr.shape))
    xr = lax.all_to_all(xr, axis_name, split_axis=split, concat_axis=concat,
                        tiled=True)
    xi = lax.all_to_all(xi, axis_name, split_axis=split, concat_axis=concat,
                        tiled=True)
    return xr, xi


def _rev_freq_sharded(x, axis: int, axis_name, p: int):
    """Global modular frequency reversal x[k] -> x[(-k) mod n] along a
    SHARDED axis, inside shard_map.

    flip(local) + shard-order ppermute gives g with g[k] = x[n-1-k]; one
    global roll by +1 row (boundary ppermute) turns that into the modular
    reversal — including bin 0, which lands from the last shard's flipped
    block automatically.  Two collectives, one of them a single row.

    ``axis_name`` may be a TUPLE of mesh axis names for an axis sharded
    jointly (e.g. the pencil output's ``P((a1, a2))`` layout): the
    permutation then runs over the row-major linearized shard index,
    matching the PartitionSpec block order, with ``p`` the product size.
    """
    c = x.shape[axis]
    g = jnp.flip(x, axis=axis)
    g = lax.ppermute(g, axis_name, [(q, (p - 1 - q) % p) for q in range(p)])
    last = jax.lax.slice_in_dim(g, c - 1, c, axis=axis)
    prev_last = lax.ppermute(last, axis_name,
                             [(q, (q + 1) % p) for q in range(p)])
    rest = jax.lax.slice_in_dim(g, 0, c - 1, axis=axis)
    return jnp.concatenate([prev_last, rest], axis=axis)


def _untangle_packed(yr, yi, loc_axes, sh_axis: int, axis_name, p: int):
    """Packed (…, n/2) planes -> (…, n/2+1) half spectrum, distributed.

    After the complex transforms over the leading axes, packed lane 0
    holds Z = F(X0) + i*F(Nq) where X0/Nq were the real bin-0/Nyquist
    slabs (the two-real-FFTs-in-one-complex trick, ``plan._unpack_nyquist``
    applied under shard_map): recovering F(X0) = (Z + conj(Z[-k]))/2 and
    F(Nq) = (Z - conj(Z[-k]))/(2i) needs the modular reversal along every
    transformed leading axis — local flips plus ONE
    :func:`_rev_freq_sharded` on the sharded axis (lane-0 plane only, so
    the extra collectives move 1/(n/2) of the array).
    """
    from ..plan import _rev_freq
    zr = yr[..., 0]
    zi = yi[..., 0]
    rr = _rev_freq_sharded(_rev_freq(zr, loc_axes), sh_axis, axis_name, p)
    ri = _rev_freq_sharded(_rev_freq(zi, loc_axes), sh_axis, axis_name, p)
    x0r = 0.5 * (zr + rr)
    x0i = 0.5 * (zi - ri)
    nqr = 0.5 * (zi + ri)
    nqi = -0.5 * (zr - rr)
    yr = jnp.concatenate([x0r[..., None], yr[..., 1:], nqr[..., None]],
                         axis=-1)
    yi = jnp.concatenate([x0i[..., None], yi[..., 1:], nqi[..., None]],
                         axis=-1)
    return yr, yi


def _tangle_packed(xr, xi, loc_axes, sh_axis: int, axis_name, p: int):
    """(…, n/2+1) half spectrum -> packed (…, n/2) planes, distributed.

    The c2r-side inverse of :func:`_untangle_packed` (``plan._pack_nyquist``
    under shard_map): endpoint slabs are projected onto their conjugate-
    even parts along every transformed leading axis so the packing is
    exact for ARBITRARY (non-Hermitian) input — matching numpy.irfftn,
    which drops the imaginary parts the projection removes.  The packed
    lane rides every subsequent collective at n/2 (lane-aligned) width.
    """
    from ..plan import _rev_freq
    m = xr.shape[-1] - 1

    def herm(r, i):
        rr = _rev_freq_sharded(_rev_freq(r, loc_axes), sh_axis, axis_name, p)
        ri = _rev_freq_sharded(_rev_freq(i, loc_axes), sh_axis, axis_name, p)
        return 0.5 * (r + rr), 0.5 * (i - ri)

    x0r, x0i = herm(xr[..., 0], xi[..., 0])
    nqr, nqi = herm(xr[..., m], xi[..., m])
    # Identity-mapped bulk lanes: lane-0 `where` over the aligned [..., :m]
    # slice instead of a prepend-concat (shift-by-one bulk relayout) —
    # same measured rewrite as plan._pack_nyquist (10.66 -> 9.09 ms at
    # 256^3x4 single-chip; the per-shard pass here is the same program).
    lane = jax.lax.iota(jnp.int32, m)
    mask = lane == 0
    return (jnp.where(mask, (x0r - nqi)[..., None], xr[..., :m]),
            jnp.where(mask, (x0i + nqr)[..., None], xi[..., :m]))


def _constrain(x, sharding):
    """with_sharding_constraint, skipped when the array's extents do not
    divide the sharding (uneven-block plans: jax NamedShardings require
    divisibility; the executor pads to blocks internally, so the
    constraint is a layout hint we can safely drop)."""
    spec = sharding.spec
    mesh = sharding.mesh
    for dim, names in enumerate(spec):
        if names is None:
            continue
        if isinstance(names, str):
            names = (names,)
        size = int(np.prod([mesh.shape[nm] for nm in names]))
        if x.shape[dim] % size:
            return x
    return jax.lax.with_sharding_constraint(x, sharding)


def _blk(n: int, p: int) -> int:
    """FFTW's ``XM(default_block)`` analog — ceil(n/p) with a short last
    block (``/root/reference/fftw-3.3.8/mpi/block.c:39``).  shard_map
    needs EQUAL shards, so uneven distributions are realized as
    pad-to-block inside the plan (zeros ride the collectives; the
    transform axes are always sliced back to their true length before
    being transformed) with a crop on exit."""
    return -(-int(n) // int(p))


def _pad_axis(x, axis: int, to: int):
    """Zero-pad ``axis`` up to length ``to`` (no-op when already there)."""
    cur = x.shape[axis]
    if cur == to:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, to - cur)
    return jnp.pad(x, cfg)


def _slice_axis(x, axis: int, to: int):
    """Slice ``axis`` down to its true length ``to`` (no-op if equal)."""
    if x.shape[axis] == to:
        return x
    return jax.lax.slice_in_dim(x, 0, to, axis=axis)


def _chunked(n_chunks: int, extent: int):
    """Chunk slices along an axis for the overlap pipeline (1 = off)."""
    c = max(1, min(n_chunks, extent))
    while extent % c:
        c -= 1
    size = extent // c
    return [slice(k * size, (k + 1) * size) for k in range(c)]


class DistributedFFTPlan:
    """A plan whose executor runs under shard_map over a device mesh.

    Callable on a global ``jax.Array`` (sharded or not — inputs are
    constrained to the plan's input sharding).  ``in_sharding`` /
    ``out_sharding`` expose the NamedShardings for callers building
    pipelines around the transform.
    """

    # Executor argument indices donated when ``donate=True`` (subclasses
    # with single-input executors override to (0,)).
    _donate_argnums: Tuple[int, ...] = (0, 1)

    def __init__(self, spec_desc: str, mesh: Mesh, in_spec: P, out_spec: P,
                 fn, shape, dtype: str, flops: float, donate: bool = False):
        self.description = spec_desc
        self.mesh = mesh
        self.in_sharding = NamedSharding(mesh, in_spec)
        self.out_sharding = NamedSharding(mesh, out_spec)
        self.global_shape = tuple(shape)
        self.dtype = dtype
        self.flops = flops
        # ``donate`` aliases the input planes to the executor (serving
        # deployments: halves peak HBM for the largest transforms, the
        # in-place analog of FFTW's in-place plans).
        self._fn = jax.jit(
            fn, donate_argnums=self._donate_argnums if donate else ())
        self._destroyed = False
        from ..utils.plog import log_plan
        log_plan(self)

    def __call__(self, x):
        if self._destroyed:
            raise RuntimeError("plan was destroyed")
        # complex32 C2C plans carry bf16 planes end-to-end: every
        # all_to_all moves HALF the ICI bytes (the distributed-FFT
        # bottleneck) and local stages run the bf16 kernel tiles.
        # complex128 plans carry f64 planes (needs JAX_ENABLE_X64).
        sx = as_split(x, self._plane_dtype())
        if sx.re.shape != self.global_shape:
            raise ValueError(f"input shape {sx.re.shape} != planned {self.global_shape}")
        xr = _constrain(sx.re, self.in_sharding)
        xi = _constrain(sx.im, self.in_sharding)
        yr, yi = self._fn(xr, xi)
        out = {"complex32": "complex32", "complex128": jnp.complex128}.get(
            self.dtype, jnp.complex64)
        return from_split(SplitComplex(yr, yi), out)

    execute = __call__

    # True on complex-in/complex-out plans whose cores take a dtype (the
    # base C2C class and _Slab1D); real-kind subclasses override __call__
    # with f32 planes (their kernels are f32-only).
    _c128_planes = True

    def _plane_dtype(self):
        if self._bf16_planes():
            return jnp.bfloat16
        if self.dtype == "complex128" and self._c128_planes:
            return jnp.float64
        return jnp.float32

    def _bf16_planes(self) -> bool:
        # C2C base class only; real-kind subclasses stay f32 (their
        # kernels are f32-only and their inputs/outputs are real arrays).
        return self.dtype == "complex32" and type(self) is DistributedFFTPlan

    def print_plan(self):
        print(self.description)

    def destroy(self):
        self._destroyed = True
        self._fn = None


def make_plan_shards(shape, kind=Kind.C2C, direction=Direction.FORWARD,
                     norm=Norm.NONE, dtype="complex64", mesh: Optional[Mesh] = None,
                     axis_name: str = "fft", precision: str = "highest",
                     use_3m: bool = False, max_radix: int = 128,
                     backend: str = "auto",
                     donate: bool = False) -> DistributedFFTPlan:
    """Reference-parity distributed mode: independent per-shard transforms.

    Equal-partitions the LEADING axis across the mesh; each device runs a
    FULL rank-ndim FFT of its own LOCAL block with zero communication —
    exactly the semantics of ``make_plan_distrib`` + index-launched
    ``execute_plan_task`` (``src/fft.rg:513-537``: ``make_plan_task``
    plans ``fftw_plan_dft(dim, ...)`` against each node's slab, so the
    partitioned axis is transformed at its LOCAL length).  A 1-D plan is
    therefore P independent length-(n/P) FFTs, matching
    ``test/fft_test.rg:282-305``.

    ``kind=R2C``/``C2R`` mirror the reference's real interfaces, whose
    ``make_plan_task`` dispatches into ``fftw_plan_dft_r2c`` per node
    (``src/fft.rg:311-313,533-536``): each shard runs a local
    rfftn/irfftn-equivalent, the last axis halved at its LOCAL length.
    For C2R, ``shape`` is the REAL output shape.
    """
    if kind not in (Kind.C2C, Kind.R2C, Kind.C2R):
        raise ValueError(f"shards mode supports C2C/R2C/C2R, got {kind}")
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    shape = tuple(shape)
    if shape[0] % p != 0:
        # The reference hard-asserts on mismatched partition counts
        # (src/fft.rg:519); we require divisibility for the equal partition.
        raise ValueError(f"leading axis {shape[0]} not divisible by mesh size {p}")
    local_shape = (shape[0] // p,) + shape[1:]
    axes = tuple(range(len(shape)))
    n_local = int(np.prod(local_shape))
    if kind == Kind.R2C:
        direction = Direction.FORWARD
    elif kind == Kind.C2R:
        direction = Direction.BACKWARD
    scale = _norm_scale(n_local, direction, norm)
    core = _local_core(local_shape, axes, direction, kind=kind,
                       precision=precision, use_3m=use_3m,
                       max_radix=max_radix, backend=backend)
    pspec = P(axis_name, *([None] * (len(shape) - 1)))
    # Each shard's half axis (the LAST transformed axis for real kinds) is
    # halved at its LOCAL length — reference semantics: make_plan_task
    # plans fftw_plan_dft_r2c against each node's slab
    # (``src/fft.rg:311-313,533-536``), so for dim=1 the output is P
    # stacked local half-spectra.
    local_half = local_shape[:-1] + (local_shape[-1] // 2 + 1,)
    half_global = ((p * local_half[0],) + local_half[1:]
                   if len(shape) == 1 else (shape[0],) + local_half[1:])
    mesh_desc = dict(zip(mesh.axis_names, mesh.devices.shape))
    flops_conv = 2.5 if kind != Kind.C2C else 5.0
    flops = p * flops_conv * n_local * max(1.0, math.log2(max(n_local, 2)))

    if kind == Kind.C2C:
        def local_fn(xr, xi):
            yr, yi = core(xr, xi)
            return _apply_scale(yr, yi, scale)

        fn = shard_map(local_fn, mesh=mesh, in_specs=(pspec, pspec),
                       out_specs=(pspec, pspec))
        desc = (f"(plan-distrib-shards shape={shape} mesh={mesh_desc} "
                f"independent {len(shape)}D FFT of each local {local_shape} "
                f"slab, no collectives)")
        return DistributedFFTPlan(desc, mesh, pspec, pspec, fn, shape, dtype,
                                  flops, donate)

    if kind == Kind.R2C:
        def local_fn(x):
            yr, yi = core(x)
            return _apply_scale(yr, yi, scale)

        fn = shard_map(local_fn, mesh=mesh, in_specs=(pspec,),
                       out_specs=(pspec, pspec))
        desc = (f"(plan-distrib-shards-r2c real-shape={shape} "
                f"mesh={mesh_desc} independent local rfftn of each "
                f"{local_shape} slab -> local half {local_half}, "
                f"no collectives)")

        class _ShardsR2C(DistributedFFTPlan):
            _donate_argnums = (0,)

            def __call__(self, x):
                if self._destroyed:
                    raise RuntimeError("plan was destroyed")
                x = jnp.asarray(_require_real(x, "shards R2C plan"))
                if x.shape != shape:
                    raise ValueError(
                        f"input shape {x.shape} != planned {shape}")
                x = _constrain(x.astype(jnp.float32), self.in_sharding)
                yr, yi = self._fn(x)
                return from_split(SplitComplex(yr, yi), jnp.complex64)
            execute = __call__

        return _ShardsR2C(desc, mesh, pspec, pspec, fn, half_global, dtype,
                          flops, donate)

    # C2R: ``shape`` is the REAL output shape; input is the stacked
    # per-shard local half-spectrum layout produced by the R2C plan above.
    def local_fn(xr, xi):
        y = core(xr, xi)
        if scale != 1.0:
            y = y * jnp.asarray(scale, y.dtype)
        return y

    fn = shard_map(local_fn, mesh=mesh, in_specs=(pspec, pspec),
                   out_specs=pspec)
    desc = (f"(plan-distrib-shards-c2r real-shape={shape} mesh={mesh_desc} "
            f"independent local irfftn of each {local_half} half slab, "
            f"no collectives)")

    class _ShardsC2R(DistributedFFTPlan):
        def __call__(self, x):
            if self._destroyed:
                raise RuntimeError("plan was destroyed")
            sx = as_split(x, jnp.float32)
            if sx.re.shape != half_global:
                raise ValueError(f"input shape {sx.re.shape} != planned "
                                 f"half layout {half_global}")
            xr = _constrain(sx.re, self.in_sharding)
            xi = _constrain(sx.im, self.in_sharding)
            return self._fn(xr, xi)
        execute = __call__

    return _ShardsC2R(desc, mesh, pspec, pspec, fn, shape, dtype, flops,
                      donate)


def make_plan_slab(shape, direction=Direction.FORWARD, norm=Norm.BACKWARD,
                   dtype="complex64", mesh: Optional[Mesh] = None,
                   axis_name: str = "fft", transposed_out: bool = False,
                   transposed_in: bool = False,
                   precision: str = "highest", use_3m: bool = False,
                   max_radix: int = 128, backend: str = "auto",
                   pipeline_chunks: int = 1, howmany: int = 1,
                   donate: bool = False) -> DistributedFFTPlan:
    """Single global N-D C2C FFT, slab-decomposed over the first axis.

    Local FFT over axes 1..nd-1, then one all_to_all that trades the first
    axis for the last (the ICI transpose), then FFT over the former first
    axis.  With ``transposed_out`` the result stays distributed over the
    LAST axis with axes order unchanged (FFTW_MPI_TRANSPOSED_OUT analog);
    otherwise a second all_to_all restores first-axis distribution.

    ``transposed_in`` accepts input already distributed over the LAST
    axis (FFTW_MPI_TRANSPOSED_IN analog): the pipeline reverses — FFT the
    locally-complete first axis, ONE all_to_all back to slabs, FFT the
    rest — so a forward ``transposed_out`` plan chains into an inverse
    ``transposed_in`` plan with two collectives total instead of four.
    Mutually exclusive with ``transposed_out``.

    ``pipeline_chunks > 1`` (rank >= 3 only) splits the
    a2a -> fft(axis0) -> a2a phases into independent chunks along axis 1
    — an axis no collective touches — so XLA's scheduler can hide each
    chunk's ICI transfer behind the previous chunk's butterflies (the
    scheduled-exchange idea of
    ``/root/reference/fftw-3.3.8/mpi/transpose-pairwise.c:21-49``).

    ``howmany > 1`` plans a BATCH of independent global transforms
    (``fftw_mpi_plan_many_dft``'s howmany,
    ``/root/reference/fftw-3.3.8/mpi/api.c:249-304``): the input gains a
    LEADING batch axis — shape ``(howmany, *shape)`` — every collective
    moves the whole batch in one exchange, and the local stages run
    batched through the same cores.  FFTW interleaves the howmany tuple
    innermost; on TPU the batch leads so the transform axes keep the
    lane-contiguous layout the kernels want.
    """
    if transposed_in and transposed_out:
        raise ValueError("transposed_in and transposed_out are exclusive "
                         "(the single-collective pipeline cannot skip its "
                         "only all_to_all)")
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    shape = tuple(shape)
    nd_ = len(shape)
    if nd_ < 2:
        raise ValueError("slab decomposition needs rank >= 2")
    # Uneven block distribution (FFTW XM(default_block),
    # ``/root/reference/fftw-3.3.8/mpi/block.c:39``): non-divisible axes
    # are padded to p*ceil(n/p) blocks inside the plan — the pad rows are
    # zeros (or placeholder spectrum lanes that never feed a transform at
    # padded length: every transform axis is sliced to its TRUE length
    # while locally complete) and the output is cropped on exit.
    n0, nl = shape[0], shape[-1]
    n0p, nlp = p * _blk(n0, p), p * _blk(nl, p)
    uneven0, unevenl = n0p != n0, nlp != nl
    howmany = int(howmany)
    off = 1 if howmany > 1 else 0       # leading batch axis present?
    bshape = ((howmany,) if off else ()) + shape
    n_total = int(np.prod(shape))
    scale = _norm_scale(n_total, direction, norm)
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend, dtype=dtype)
    # Local stages through the plan core (kernel path on TPU): all
    # locally-complete axes as ONE multi-axis core (fused trailing-pair
    # kernels apply), the slab axis as a single-axis core.  With howmany,
    # the batch is just an extra leading non-transformed axis of the
    # local specs (the cores are batch-polymorphic over leading extents).
    core_local = _local_core(
        bshape[:off] + (_blk(n0, p),) + shape[1:],
        range(off + 1, off + nd_), direction, **core_kw)
    core_ax0 = _local_core(
        bshape[:off] + (n0,) + shape[1:-1] + (_blk(nl, p),),
        (off,), direction, **core_kw)
    chunks = pipeline_chunks if nd_ >= 3 else 1
    ax0, axl = off, off + nd_ - 1       # slab axis / last axis positions
    flops = max(howmany, 1) * 5.0 * n_total * math.log2(max(n_total, 2))
    unv = f" [uneven blocks {n0}->{n0p}|{nl}->{nlp}]" \
        if (uneven0 or unevenl) else ""

    if transposed_in:
        # Reversed pipeline: (Z, ..., X/P) in -> fft(Z) -> one a2a back
        # to slabs -> fft(local axes) -> (Z/P, ..., X) out.
        def local_fn(xr, xi):
            xr, xi = core_ax0(xr, xi)           # axis0 true length
            if uneven0:                         # zeros ride the a2a
                xr = _pad_axis(xr, ax0, n0p)
                xi = _pad_axis(xi, ax0, n0p)
            xr, xi = _a2a(xr, xi, axis_name, ax0, axl)
            if unevenl:                         # slice BEFORE transforming
                xr = _slice_axis(xr, axl, nl)
                xi = _slice_axis(xi, axl, nl)
            xr, xi = core_local(xr, xi)
            return _apply_scale(xr, xi, scale)

        slab_spec = P(*([None] * off), axis_name, *([None] * (nd_ - 1)))
        in_spec = P(*([None] * (off + nd_ - 1)), axis_name)
        fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                             out_specs=(slab_spec, slab_spec))
        if uneven0 or unevenl:
            def fn(xr, xi):
                xr, xi = _pad_axis(xr, axl, nlp), _pad_axis(xi, axl, nlp)
                yr, yi = fn_inner(xr, xi)
                return (_slice_axis(yr, ax0, n0),
                        _slice_axis(yi, ax0, n0))
        else:
            fn = fn_inner
        desc = (f"(plan-distrib-slab shape={shape} P={p} axis={axis_name} "
                f"{f'howmany={howmany} ' if off else ''}"
                f"[transposed input] fft(axis0) -> all_to_all(ICI) -> "
                f"local-{nd_-1}ax-fft{unv})")
        return DistributedFFTPlan(desc, mesh, in_spec, slab_spec, fn, bshape,
                                  dtype, flops, donate)

    def _phase2(cr, ci):
        # Distributed transpose over ICI: gather axis 0, scatter axis -1,
        # transform the former slab axis, optionally transpose back.
        cr, ci = _a2a(cr, ci, axis_name, axl, ax0)
        if uneven0:                     # axis 0 now locally complete:
            cr = _slice_axis(cr, ax0, n0)   # transform at TRUE length
            ci = _slice_axis(ci, ax0, n0)
        cr, ci = core_ax0(cr, ci)
        if not transposed_out:
            if uneven0:
                cr = _pad_axis(cr, ax0, n0p)
                ci = _pad_axis(ci, ax0, n0p)
            cr, ci = _a2a(cr, ci, axis_name, ax0, axl)
        return cr, ci

    chunk_ax = off + 1                  # axis no collective touches

    def local_fn(xr, xi):
        # (Z/P, ..., X): all locally-complete axes first.
        xr, xi = core_local(xr, xi)
        if unevenl:
            # the LAST axis is already transformed: padding its spectrum
            # with placeholder zero lanes only evens the a2a split
            xr = _pad_axis(xr, axl, nlp)
            xi = _pad_axis(xi, axl, nlp)
        if chunks <= 1:
            xr, xi = _phase2(xr, xi)
        else:
            pre = (slice(None),) * chunk_ax
            outs = [
                _phase2(xr[pre + (sl,)], xi[pre + (sl,)])
                for sl in _chunked(chunks, xr.shape[chunk_ax])
            ]
            xr = jnp.concatenate([o[0] for o in outs], axis=chunk_ax)
            xi = jnp.concatenate([o[1] for o in outs], axis=chunk_ax)
        return _apply_scale(xr, xi, scale)

    in_spec = P(*([None] * off), axis_name, *([None] * (nd_ - 1)))
    out_spec = (P(*([None] * (off + nd_ - 1)), axis_name)
                if transposed_out else in_spec)
    fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                         out_specs=(out_spec, out_spec))
    if uneven0 or unevenl:
        def fn(xr, xi):
            xr, xi = _pad_axis(xr, ax0, n0p), _pad_axis(xi, ax0, n0p)
            yr, yi = fn_inner(xr, xi)
            if not transposed_out:
                yr, yi = _slice_axis(yr, ax0, n0), _slice_axis(yi, ax0, n0)
            return _slice_axis(yr, axl, nl), _slice_axis(yi, axl, nl)
    else:
        fn = fn_inner
    desc = (f"(plan-distrib-slab shape={shape} P={p} axis={axis_name} "
            f"{f'howmany={howmany} ' if off else ''}"
            f"local-{nd_-1}ax-fft -> all_to_all(ICI) -> fft(axis0)"
            f"{' [transposed output]' if transposed_out else ' -> all_to_all back'}"
            f"{f' [pipelined x{chunks}]' if chunks > 1 else ''}{unv})")
    return DistributedFFTPlan(desc, mesh, in_spec, out_spec, fn, bshape,
                              dtype, flops, donate)


def make_plan_slab_r2c(shape, norm=Norm.BACKWARD, dtype="complex64",
                       mesh: Optional[Mesh] = None, axis_name: str = "fft",
                       transposed_out: bool = False, precision: str = "highest",
                       use_3m: bool = False, max_radix: int = 128,
                       backend: str = "auto", donate: bool = False):
    """Global real-input N-D FFT, slab-decomposed over the first axis.

    Real packing happens on the LAST axis locally (conjugate-even, halving
    traffic before the ICI transpose); the all_to_all then trades the slab
    axis against AXIS 1 (not the halved axis, sidestepping the (n/2+1)
    divisibility problem that classic slab r2c hits).  Requires rank >= 3
    and P | shape[0], P | shape[1].  Output is the half-spectrum array,
    distributed over axis 1 when ``transposed_out`` else over axis 0.
    """
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    shape = tuple(shape)
    nd_ = len(shape)
    if nd_ < 3:
        raise ValueError("slab r2c needs rank >= 3 (use single-chip rfftn below that)")
    # Uneven blocks (mpi/block.c:39 analog; see make_plan_slab): axis 0
    # is zero-padded at entry (zero REAL rows transform to zero spectrum
    # rows), axis 1 is padded with placeholder lanes AFTER its local
    # transform; both are cropped on exit.
    n0, n1 = shape[0], shape[1]
    n0p, n1p = p * _blk(n0, p), p * _blk(n1, p)
    uneven0, uneven1 = n0p != n0, n1p != n1
    uneven = uneven0 or uneven1
    n_total = int(np.prod(shape))
    scale = _norm_scale(n_total, Direction.FORWARD, norm)
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend)
    local_real = (_blk(n0, p),) + shape[1:]
    xh = shape[-1] // 2 + 1
    mid_axes = tuple(range(1, nd_ - 1))
    from ..ops import pallas_stockham as _ps
    # The packed-transport untangle's modular frequency reversal runs
    # over the GLOBAL sharded-axis extent, which padding would corrupt —
    # uneven shapes take the unpacked path.
    packed = _ps.r2c_packed_supported(shape[-1]) and not uneven
    if packed:
        # Nyquist-packed transport (STATUS r2 limitation 4 closed): the
        # half spectrum crosses every collective at n/2 lanes (lane-
        # aligned) instead of n/2+1; the packed-lane untangle runs at the
        # END, with the reversal over the then-sharded axis done by
        # :func:`_rev_freq_sharded` (flip + 2 ppermutes).
        m = shape[-1] // 2
        core_mid_p = _local_core(local_real[:-1] + (m,), mid_axes,
                                 Direction.FORWARD, **core_kw)
        core_z_p = _local_core(
            (shape[0],) + (shape[1] // p,) + shape[2:-1] + (m,), (0,),
            Direction.FORWARD, **core_kw)

        def local_fn(x):
            interp = jax.default_backend() != "tpu"
            yr, yi = _ps.fft_last_r2c_stockham(x, interpret=interp,
                                               packed=True)
            yr, yi = core_mid_p(yr, yi)
            yr, yi = _a2a(yr, yi, axis_name, 1, 0)
            yr, yi = core_z_p(yr, yi)
            if not transposed_out:
                yr, yi = _a2a(yr, yi, axis_name, 0, 1)   # (Z/P, Y, m)
                sh_axis, loc_axes = 0, list(range(1, nd_ - 1))
            else:                                        # (Z, Y/P, m)
                sh_axis, loc_axes = 1, [0] + list(range(2, nd_ - 1))
            yr, yi = _untangle_packed(yr, yi, loc_axes, sh_axis,
                                      axis_name, p)
            return _apply_scale(yr, yi, scale)
    else:
        core_r2c = _local_core(local_real, (nd_ - 1,), kind=Kind.R2C,
                               **core_kw)
        core_mid = _local_core(local_real[:-1] + (xh,), mid_axes,
                               Direction.FORWARD, **core_kw)
        core_z = _local_core(
            (n0,) + (_blk(n1, p),) + shape[2:-1] + (xh,), (0,),
            Direction.FORWARD, **core_kw)

        def local_fn(x):
            xr, xi = core_r2c(x)                                 # halve X
            xr, xi = core_mid(xr, xi)                            # mid axes
            if uneven1:   # axis 1 already transformed: placeholder lanes
                xr = _pad_axis(xr, 1, n1p)
                xi = _pad_axis(xi, 1, n1p)
            xr, xi = _a2a(xr, xi, axis_name, 1, 0)
            if uneven0:   # slab axis locally complete: TRUE length
                xr = _slice_axis(xr, 0, n0)
                xi = _slice_axis(xi, 0, n0)
            xr, xi = core_z(xr, xi)                              # slab axis
            if not transposed_out:
                if uneven0:
                    xr = _pad_axis(xr, 0, n0p)
                    xi = _pad_axis(xi, 0, n0p)
                xr, xi = _a2a(xr, xi, axis_name, 0, 1)
            return _apply_scale(xr, xi, scale)

    in_spec = P(axis_name, *([None] * (nd_ - 1)))
    out_spec = (P(None, axis_name, *([None] * (nd_ - 2)))
                if transposed_out else in_spec)
    fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec,),
                         out_specs=(out_spec, out_spec))
    if uneven:
        def fn(x):
            yr, yi = fn_inner(_pad_axis(x, 0, n0p))
            if not transposed_out:
                yr, yi = _slice_axis(yr, 0, n0), _slice_axis(yi, 0, n0)
            return _slice_axis(yr, 1, n1), _slice_axis(yi, 1, n1)
    else:
        fn = fn_inner
    half = shape[:-1] + (shape[-1] // 2 + 1,)
    desc = (f"(plan-distrib-slab-r2c real-shape={shape} half={half} P={p} "
            f"r2c(X)+fft(mid) -> a2a(Y<->Z) -> fft(Z)"
            f"{' [transposed output]' if transposed_out else ' -> a2a back'}"
            f"{f' [uneven blocks {n0}->{n0p}|{n1}->{n1p}]' if uneven else ''})")
    flops = 2.5 * n_total * math.log2(max(n_total, 2))

    class _R2CPlan(DistributedFFTPlan):
        _donate_argnums = (0,)

        def __call__(self, x):
            if self._destroyed:
                raise RuntimeError("plan was destroyed")
            x = jnp.asarray(_require_real(x, "slab R2C plan"))
            if x.shape != shape:
                raise ValueError(f"input shape {x.shape} != planned {shape}")
            x = _constrain(x.astype(jnp.float32), self.in_sharding)
            yr, yi = self._fn(x)
            return from_split(SplitComplex(yr, yi), jnp.complex64)
        execute = __call__

    return _R2CPlan(desc, mesh, in_spec, out_spec, fn, half, dtype, flops,
                    donate)


def make_plan_slab_c2r(shape, norm=Norm.BACKWARD, dtype="complex64",
                       mesh: Optional[Mesh] = None, axis_name: str = "fft",
                       transposed_in: bool = False, precision: str = "highest",
                       use_3m: bool = False, max_radix: int = 128,
                       backend: str = "auto", donate: bool = False):
    """Inverse of :func:`make_plan_slab_r2c`: half-spectrum -> real field.

    ``shape`` is the REAL output shape.  With ``transposed_in`` the input
    is expected in the r2c plan's transposed-output layout (axis-1
    distributed), skipping one all_to_all — pair
    ``make_plan_slab_r2c(transposed_out=True)`` with
    ``make_plan_slab_c2r(transposed_in=True)`` for a round trip with two
    collectives total instead of four.
    """
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    shape = tuple(shape)
    nd_ = len(shape)
    if nd_ < 3:
        raise ValueError("slab c2r needs rank >= 3")
    # Uneven blocks: reverse of make_plan_slab_r2c — padded input
    # spectrum rows/lanes are sliced off before each inverse transform.
    n0, n1 = shape[0], shape[1]
    n0p, n1p = p * _blk(n0, p), p * _blk(n1, p)
    uneven0, uneven1 = n0p != n0, n1p != n1
    uneven = uneven0 or uneven1
    n_total = int(np.prod(shape))
    scale = _norm_scale(n_total, Direction.BACKWARD, norm)
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend)
    local_real = (_blk(n0, p),) + shape[1:]
    xh = shape[-1] // 2 + 1
    mid_axes = tuple(range(1, nd_ - 1))
    from ..ops import pallas_stockham as _ps
    packed = _ps.r2c_packed_supported(shape[-1]) and not uneven
    if packed:
        # Nyquist-packed transport, c2r side: tangle the endpoint bins
        # into packed lane 0 at INPUT (with the conjugate-even projection
        # of _tangle_packed — the sharded-axis reversal runs on the
        # lane-0 plane only), then every collective and inverse mid/Z
        # transform runs at n/2 lane-aligned width and the packed c2r
        # kernel unpacks in-VMEM.
        m = shape[-1] // 2
        core_mid_p = _local_core(local_real[:-1] + (m,), mid_axes,
                                 Direction.BACKWARD, **core_kw)
        core_z_p = _local_core(
            (shape[0],) + (shape[1] // p,) + shape[2:-1] + (m,), (0,),
            Direction.BACKWARD, **core_kw)

        def local_fn(xr, xi):
            if not transposed_in:                        # (Z/P, Y, Xh)
                sh_axis, loc_axes = 0, list(range(1, nd_ - 1))
            else:                                        # (Z, Y/P, Xh)
                sh_axis, loc_axes = 1, [0] + list(range(2, nd_ - 1))
            xr, xi = _tangle_packed(xr, xi, loc_axes, sh_axis,
                                    axis_name, p)
            if not transposed_in:
                xr, xi = _a2a(xr, xi, axis_name, 1, 0)   # (Z, Y/P, m)
            xr, xi = core_z_p(xr, xi)                    # inverse Z
            xr, xi = _a2a(xr, xi, axis_name, 0, 1)       # (Z/P, Y, m)
            xr, xi = core_mid_p(xr, xi)                  # inverse mids
            interp = jax.default_backend() != "tpu"
            y = _ps.ifft_last_c2r_stockham(xr, xi, shape[-1],
                                           interpret=interp, packed=True)
            if scale != 1.0:
                y = y * jnp.asarray(scale, y.dtype)
            return y
    else:
        core_c2r = _local_core(local_real, (nd_ - 1,), kind=Kind.C2R,
                               **core_kw)
        core_mid = _local_core(local_real[:-1] + (xh,), mid_axes,
                               Direction.BACKWARD, **core_kw)
        core_z = _local_core(
            (n0,) + (_blk(n1, p),) + shape[2:-1] + (xh,), (0,),
            Direction.BACKWARD, **core_kw)

        def local_fn(xr, xi):
            if not transposed_in:
                # (Z/P, Y, Xh) -> gather Z, shard Y
                if uneven1:   # placeholder lanes even the axis-1 split
                    xr = _pad_axis(xr, 1, n1p)
                    xi = _pad_axis(xi, 1, n1p)
                xr, xi = _a2a(xr, xi, axis_name, 1, 0)
            if uneven0:       # Z locally complete: drop padded bins
                xr = _slice_axis(xr, 0, n0)
                xi = _slice_axis(xi, 0, n0)
            xr, xi = core_z(xr, xi)                              # inverse Z
            if uneven0:
                xr = _pad_axis(xr, 0, n0p)
                xi = _pad_axis(xi, 0, n0p)
            xr, xi = _a2a(xr, xi, axis_name, 0, 1)
            if uneven1:       # Y locally complete: drop padded bins
                xr = _slice_axis(xr, 1, n1)
                xi = _slice_axis(xi, 1, n1)
            xr, xi = core_mid(xr, xi)                            # inverse mid
            y = core_c2r(xr, xi)                                 # unpack X
            if scale != 1.0:
                y = y * jnp.asarray(scale, y.dtype)
            return y

    slab_spec = P(axis_name, *([None] * (nd_ - 1)))
    in_spec = (P(None, axis_name, *([None] * (nd_ - 2)))
               if transposed_in else slab_spec)
    fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                         out_specs=slab_spec)
    if uneven:
        pad_ax = 1 if transposed_in else 0
        pad_to = n1p if transposed_in else n0p
        def fn(xr, xi):
            y = fn_inner(_pad_axis(xr, pad_ax, pad_to),
                         _pad_axis(xi, pad_ax, pad_to))
            return _slice_axis(y, 0, n0)
    else:
        fn = fn_inner
    half = shape[:-1] + (shape[-1] // 2 + 1,)
    desc = (f"(plan-distrib-slab-c2r real-shape={shape} P={p} "
            f"{'[transposed input] ' if transposed_in else 'a2a -> '}"
            f"ifft(Z) -> a2a -> ifft(mid) -> c2r(X)"
            f"{' [nyquist-packed transport]' if packed else ''}"
            f"{f' [uneven blocks {n0}->{n0p}|{n1}->{n1p}]' if uneven else ''})")
    flops = 2.5 * n_total * math.log2(max(n_total, 2))

    class _C2RPlan(DistributedFFTPlan):
        def __call__(self, x):
            if self._destroyed:
                raise RuntimeError("plan was destroyed")
            sx = as_split(x, jnp.float32)
            if sx.re.shape != half:
                raise ValueError(f"input shape {sx.re.shape} != planned half-spectrum {half}")
            xr = _constrain(sx.re, self.in_sharding)
            xi = _constrain(sx.im, self.in_sharding)
            return self._fn(xr, xi)
        execute = __call__

    return _C2RPlan(desc, mesh, in_spec, slab_spec, fn, shape, dtype, flops,
                    donate)


def _slab1d_factors(n: int, p: int) -> Tuple[int, int]:
    """Pick n = R*C with P | R and P | C, R nearest sqrt(n) (balanced
    local FFT lengths = balanced MXU tile sizes on both stages)."""
    best = None
    r = p
    while r * p <= n:
        if n % r == 0 and (n // r) % p == 0:
            if best is None or abs(r - math.isqrt(n)) < abs(best - math.isqrt(n)):
                best = r
        r += p
    if best is None:
        raise ValueError(
            f"distributed 1-D FFT needs n = R*C with {p} | R and {p} | C; "
            f"n={n} has no such split on P={p} devices")
    return best, n // best


def make_plan_slab_1d(n, direction=Direction.FORWARD, norm=Norm.BACKWARD,
                      dtype="complex64", mesh: Optional[Mesh] = None,
                      axis_name: str = "fft", factors: Optional[Tuple[int, int]] = None,
                      scrambled_in: bool = False, scrambled_out: bool = False,
                      precision: str = "highest", use_3m: bool = False,
                      max_radix: int = 128, backend: str = "auto",
                      kind: Kind = Kind.C2C,
                      donate: bool = False) -> DistributedFFTPlan:
    """Distributed 1-D (rank-1) C2C FFT: one vector too big for one chip.

    Re-derivation of FFTW's rank-1 MPI solver
    (``/root/reference/fftw-3.3.8/mpi/dft-rank1-bigvec.c``) as the
    four-step factorization n = R*C over the mesh (Bailey's algorithm,
    the mesh-level variant of the single-chip ``fft_axis0_fourstep``):
    view x as the row-major (R, C) matrix, then

        a2a -> FFT_R (columns, local) -> twiddle w^(k1*c) -> a2a
            -> FFT_C (rows, local) -> [global transpose for natural order]

    ``scrambled_out=True`` skips the final transpose collective and
    returns the digit-reversed order (element (k1, k2) of the row-major
    (R, C) grid holds X[k1 + R*k2]) — FFTW_MPI_SCRAMBLED_OUT
    (``mpi/ifftw-mpi.h:31-34``): 2 collectives instead of 3.
    ``scrambled_in=True`` accepts that order (FFTW_MPI_SCRAMBLED_IN) and
    produces natural output with 2 collectives, so a forward/backward
    round trip pays 4 collectives total.  The twiddle table is symmetric
    (w^(a*b)), so BOTH orderings share one sharded table.

    Plan tables: the (R, C) twiddle is precomputed in f64 on the host and
    sharded over columns with the data — per-device table memory equals
    one local plane.

    ``kind=Kind.R2C`` / ``Kind.C2R`` (r5): the rank-1 big-vector REAL
    transform, re-deriving ``fftw-3.3.8/mpi/rdft-rank1-bigvec.c``.  The
    real signal packs into a HALF-length complex vector z[j] = x[2j] +
    i*x[2j+1] locally (zero data movement: each shard's block stays its
    own), the mesh four-step runs at m = n/2, and the Hermitian untangle
    X[k] = E[k] + W^k O[k] runs distributed — its modular frequency
    reversal Z[(m-k) mod m] is :func:`_rev_freq_sharded` (flip + two
    ppermutes).  Output is the PACKED halfcomplex vector of length m
    (bin m's real Nyquist value rides bin 0's zero imaginary slot — the
    FFTW R2HC packing, same convention as ``PlanSpec(packed_layout=
    True)``), so the output shards evenly; ``unpack_halfcomplex_rank1``
    converts to the numpy (n/2+1,) half spectrum.  ``kind=C2R`` inverts
    it (input packed, output real, unnormalized times n).  Real kinds
    require even n and natural ordering (no scrambled flags).
    """
    if scrambled_in and scrambled_out:
        raise ValueError("scrambled_in and scrambled_out are exclusive "
                         "(use one natural boundary per plan)")
    kind = Kind(kind)
    if kind != Kind.C2C:
        if scrambled_in or scrambled_out:
            raise ValueError("rank-1 real transforms need natural order "
                             "(the Hermitian untangle is index-based)")
        if n % 2:
            raise ValueError(f"rank-1 {kind} needs even n, got {n}")
        return _make_plan_slab_1d_real(
            n, kind, norm, dtype, mesh, axis_name, factors,
            precision=precision, use_3m=use_3m, max_radix=max_radix,
            backend=backend, donate=donate)
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    n = int(n)
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh size {p}")
    R, C = factors if factors is not None else _slab1d_factors(n, p)
    R, C = int(R), int(C)
    if R * C != n or R % p or C % p:
        raise ValueError(f"factors {(R, C)} invalid: need R*C={n}, "
                         f"{p} | R, {p} | C")
    scale = _norm_scale(n, direction, norm)
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend, dtype=dtype)
    core_R = _local_core((R, C // p), (0,), direction, **core_kw)
    core_C = _local_core((R // p, C), (1,), direction, **core_kw)
    # Sharded twiddle table, f64 host precompute (in-kernel f32 synthesis
    # measured less accurate AND slower — docs/tpu_notes.md r2).
    sign = float(int(direction))
    k1 = np.arange(R, dtype=np.float64)[:, None]
    c = np.arange(C, dtype=np.float64)[None, :]
    theta = sign * 2.0 * np.pi * (k1 * c) / n
    plane_dt = {"complex32": jnp.bfloat16,
                "complex128": jnp.float64}.get(dtype, jnp.float32)
    tw_r = jnp.asarray(np.cos(theta), plane_dt)
    tw_i = jnp.asarray(np.sin(theta), plane_dt)
    tw_spec = P(None, axis_name)

    def _twiddle(ar, ai, tr, ti):
        return ar * tr - ai * ti, ar * ti + ai * tr

    if scrambled_in:
        def local_fn(xr, xi, tr, ti):
            xr = xr.reshape(R // p, C); xi = xi.reshape(R // p, C)
            xr, xi = core_C(xr, xi)                      # rows j2 (local C)
            xr, xi = _a2a(xr, xi, axis_name, 1, 0)       # (R, C/P)
            xr, xi = _twiddle(xr, xi, tr, ti)
            xr, xi = core_R(xr, xi)                      # columns (local R)
            xr, xi = _a2a(xr, xi, axis_name, 0, 1)       # (R/P, C) natural
            xr, xi = _apply_scale(xr, xi, scale)
            return xr.reshape(-1), xi.reshape(-1)
    else:
        def local_fn(xr, xi, tr, ti):
            xr = xr.reshape(R // p, C); xi = xi.reshape(R // p, C)
            xr, xi = _a2a(xr, xi, axis_name, 1, 0)       # (R, C/P)
            xr, xi = core_R(xr, xi)                      # FFT_R columns
            xr, xi = _twiddle(xr, xi, tr, ti)
            xr, xi = _a2a(xr, xi, axis_name, 0, 1)       # (R/P, C)
            xr, xi = core_C(xr, xi)                      # FFT_C rows
            if not scrambled_out:
                # global transpose (R, C) -> (C, R): natural order out
                xr, xi = _a2a(xr, xi, axis_name, 1, 0)   # (R, C/P)
                xr = jnp.swapaxes(xr, 0, 1)              # (C/P, R)
                xi = jnp.swapaxes(xi, 0, 1)
            xr, xi = _apply_scale(xr, xi, scale)
            return xr.reshape(-1), xi.reshape(-1)

    vec_spec = P(axis_name)
    fn_inner = shard_map(local_fn, mesh=mesh,
                         in_specs=(vec_spec, vec_spec, tw_spec, tw_spec),
                         out_specs=(vec_spec, vec_spec))

    def fn(xr, xi):
        return fn_inner(xr, xi, tw_r, tw_i)

    ncoll = 2 if (scrambled_in or scrambled_out) else 3
    desc = (f"(plan-distrib-1d n={n}={R}x{C} P={p} four-step over ICI, "
            f"{ncoll} collectives"
            f"{' [scrambled in]' if scrambled_in else ''}"
            f"{' [scrambled out]' if scrambled_out else ''})")
    flops = 5.0 * n * math.log2(max(n, 2))

    class _Slab1D(DistributedFFTPlan):
        def _bf16_planes(self):
            return self.dtype == "complex32"

    return _Slab1D(desc, mesh, vec_spec, vec_spec, fn, (n,), dtype, flops,
                   donate)


def unpack_halfcomplex_rank1(y):
    """Packed rank-1 halfcomplex (m,) -> numpy-convention (m+1,) half
    spectrum: bin m's real value rides bin 0's zero imaginary slot (the
    FFTW R2HC packing, ``rdft/rdft.h``)."""
    y = np.asarray(y)
    out = np.empty(y.shape[0] + 1, np.complex128)
    out[0] = y[0].real
    out[1:-1] = y[1:]
    out[-1] = y[0].imag
    return out


def pack_halfcomplex_rank1(h):
    """numpy-convention (m+1,) half spectrum -> packed (m,) halfcomplex
    (inverse of :func:`unpack_halfcomplex_rank1`; endpoint imaginary
    parts are dropped, as numpy.irfft does)."""
    h = np.asarray(h)
    out = np.array(h[:-1], np.complex64)
    out[0] = complex(h[0].real, h[-1].real)
    return out


def _make_plan_slab_1d_real(n, kind: Kind, norm, dtype, mesh,
                            axis_name: str, factors,
                            precision: str = "highest", use_3m: bool = False,
                            max_radix: int = 128, backend: str = "auto",
                            donate: bool = False) -> DistributedFFTPlan:
    """Rank-1 big-vector REAL transform over the mesh (see
    :func:`make_plan_slab_1d` ``kind`` docs;
    ``/root/reference/fftw-3.3.8/mpi/rdft-rank1-bigvec.c``)."""
    mesh = mesh or make_fft_mesh(axis_name=axis_name)
    axis_name = mesh.axis_names[0]
    p = int(mesh.shape[axis_name])
    n = int(n)
    m = n // 2
    if m % p:
        raise ValueError(f"n/2={m} not divisible by mesh size {p}")
    R, C = factors if factors is not None else _slab1d_factors(m, p)
    R, C = int(R), int(C)
    if R * C != m or R % p or C % p:
        raise ValueError(f"factors {(R, C)} invalid: need R*C={m}, "
                         f"{p} | R, {p} | C")
    direction = (Direction.FORWARD if kind == Kind.R2C
                 else Direction.BACKWARD)
    scale = _norm_scale(n, direction, norm)
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend)
    core_R = _local_core((R, C // p), (0,), direction, **core_kw)
    core_C = _local_core((R // p, C), (1,), direction, **core_kw)
    sign = float(int(direction))
    # four-step inter-factor twiddle (R, C), sharded over columns
    k1 = np.arange(R, dtype=np.float64)[:, None]
    c = np.arange(C, dtype=np.float64)[None, :]
    theta = sign * 2.0 * np.pi * (k1 * c) / m
    tw_r = jnp.asarray(np.cos(theta), jnp.float32)
    tw_i = jnp.asarray(np.sin(theta), jnp.float32)
    # Hermitian half twiddle W^k = exp(sign*2*pi*i*k/n), k global, sharded
    kk = np.arange(m, dtype=np.float64)
    th2 = sign * 2.0 * np.pi * kk / n
    hw_r = jnp.asarray(np.cos(th2), jnp.float32)
    hw_i = jnp.asarray(np.sin(th2), jnp.float32)
    mloc = m // p

    def _fourstep(xr, xi, tr, ti):
        # the natural-order mesh four-step of make_plan_slab_1d, at m
        xr = xr.reshape(R // p, C); xi = xi.reshape(R // p, C)
        xr, xi = _a2a(xr, xi, axis_name, 1, 0)       # (R, C/P)
        xr, xi = core_R(xr, xi)
        xr, xi = xr * tr - xi * ti, xr * ti + xi * tr
        xr, xi = _a2a(xr, xi, axis_name, 0, 1)       # (R/P, C)
        xr, xi = core_C(xr, xi)
        xr, xi = _a2a(xr, xi, axis_name, 1, 0)       # (R, C/P)
        xr = jnp.swapaxes(xr, 0, 1)                  # (C/P, R) natural
        xi = jnp.swapaxes(xi, 0, 1)
        return xr.reshape(-1), xi.reshape(-1)

    def _kmask():
        # global-index-0 lane: shard 0, local position 0
        q = jax.lax.axis_index(axis_name)
        k = q * mloc + jax.lax.iota(jnp.int32, mloc)
        return k == 0

    if kind == Kind.R2C:
        def local_fn(x, tr, ti, wr, wi):
            # pack x -> z[j] = x[2j] + i x[2j+1] (local: n/P is even)
            x2 = x.reshape(-1, 2)
            zr, zi = _fourstep(x2[:, 0], x2[:, 1], tr, ti)
            # E = (Z + conj(Zrev))/2, O = (Z - conj(Zrev))/(2i)
            rr = _rev_freq_sharded(zr, 0, axis_name, p)
            ri = _rev_freq_sharded(zi, 0, axis_name, p)
            er, ei = 0.5 * (zr + rr), 0.5 * (zi - ri)
            o_r, o_i = 0.5 * (zi + ri), -0.5 * (zr - rr)
            # X[k] = E[k] + W^k O[k], k in [0, m); X[m] = E[0] - O[0]
            twor = o_r * wr - o_i * wi
            twoi = o_r * wi + o_i * wr
            yr = er + twor
            yi = ei + twoi
            # bin 0's imaginary slot (zero) carries the real Nyquist bin
            yi = jnp.where(_kmask(), er - twor, yi)
            return _apply_scale(yr, yi, scale)

        vec_spec = P(axis_name)
        tw_spec = P(None, axis_name)
        fn_inner = shard_map(
            local_fn, mesh=mesh,
            in_specs=(vec_spec, tw_spec, tw_spec, vec_spec, vec_spec),
            out_specs=(vec_spec, vec_spec))

        def fn(x):
            return fn_inner(x, tw_r, tw_i, hw_r, hw_i)

        desc = (f"(plan-distrib-1d-r2c n={n} pack->four-step(m={m}={R}x{C})"
                f" P={p} -> distributed Hermitian untangle; packed"
                f" halfcomplex (m,) out, 5 collectives)")
        flops = 2.5 * n * math.log2(max(n, 2))

        class _Slab1DR2C(DistributedFFTPlan):
            _donate_argnums = (0,)
            packed_layout = True

            def __call__(self, x):
                if self._destroyed:
                    raise RuntimeError("plan was destroyed")
                x = jnp.asarray(_require_real(x, "rank-1 R2C plan"))
                if x.shape != (n,):
                    raise ValueError(f"input shape {x.shape} != ({n},)")
                x = _constrain(x.astype(jnp.float32), self.in_sharding)
                yr, yi = self._fn(x)
                return from_split(SplitComplex(yr, yi), jnp.complex64)
            execute = __call__

        return _Slab1DR2C(desc, mesh, vec_spec, vec_spec, fn, (m,), dtype,
                          flops, donate)

    # C2R: packed (m,) half spectrum -> real (n,), unnormalized times n.
    def local_fn(yr, yi, tr, ti, wr, wi):
        mask = _kmask()
        xr_ = yr
        xi_ = jnp.where(mask, 0.0, yi)               # X[0] is real
        rr = _rev_freq_sharded(xr_, 0, axis_name, p)
        ri = _rev_freq_sharded(xi_, 0, axis_name, p)
        rr = jnp.where(mask, yi, rr)                 # X[m-0] = X[m] = im(y0)
        ri = jnp.where(mask, 0.0, ri)
        # E' = X + conj(Xrev); O' = conj(W)^k (X - conj(Xrev)) — the 1/2s
        # cancel against c2r's unnormalized times-n convention
        er, ei = xr_ + rr, xi_ - ri
        dr, di = xr_ - rr, xi_ + ri
        o_r = dr * wr - di * wi
        o_i = dr * wi + di * wr
        zr, zi = er - o_i, ei + o_r                  # z' = E' + i O'
        zr, zi = _fourstep(zr, zi, tr, ti)           # BWD_m -> n * z
        zr, zi = _apply_scale(zr, zi, scale)
        return jnp.stack([zr, zi], axis=-1).reshape(-1)   # un-interleave

    vec_spec = P(axis_name)
    tw_spec = P(None, axis_name)
    fn_inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=(vec_spec, vec_spec, tw_spec, tw_spec, vec_spec, vec_spec),
        out_specs=vec_spec)

    def fn(yr, yi):
        return fn_inner(yr, yi, tw_r, tw_i, hw_r, hw_i)

    desc = (f"(plan-distrib-1d-c2r n={n} distributed Hermitian tangle ->"
            f" inverse four-step(m={m}={R}x{C}) P={p} -> unpack; packed"
            f" halfcomplex (m,) in, 5 collectives)")
    flops = 2.5 * n * math.log2(max(n, 2))

    class _Slab1DC2R(DistributedFFTPlan):
        def __call__(self, x):
            if self._destroyed:
                raise RuntimeError("plan was destroyed")
            sx = as_split(x, jnp.float32)
            if sx.re.shape != (m,):
                raise ValueError(f"input shape {sx.re.shape} != packed ({m},)")
            xr = _constrain(sx.re, self.in_sharding)
            xi = _constrain(sx.im, self.in_sharding)
            return self._fn(xr, xi)
        execute = __call__

    return _Slab1DC2R(desc, mesh, vec_spec, vec_spec, fn, (n,), dtype,
                      flops, donate)


def make_plan_pencil(shape, direction=Direction.FORWARD, norm=Norm.BACKWARD,
                     dtype="complex64", mesh: Optional[Mesh] = None,
                     mesh_shape: Optional[Tuple[int, int]] = None,
                     axis_names: Tuple[str, str] = ("fy", "fz"),
                     transposed_out: bool = False,
                     precision: str = "highest", use_3m: bool = False,
                     max_radix: int = 128, backend: str = "auto",
                     pipeline_chunks: int = 1, pipeline_chunks2: int = 1,
                     howmany: int = 1,
                     donate: bool = False) -> DistributedFFTPlan:
    """Single global 3-D C2C FFT, pencil-decomposed over a 2-D mesh.

    ``howmany > 1`` batches independent global transforms over a LEADING
    batch axis (input shape ``(howmany, Z, Y, X)``) — the
    ``fftw_mpi_plan_many_dft`` analog (``mpi/api.c:249-304``); see
    :func:`make_plan_slab`.

    Input (Z, Y, X) distributed as (Z/P1, Y/P2, X) — X-pencils.  Three local
    1-D FFT phases separated by two all_to_alls, each over ONE mesh axis
    (re-derivation of FFTW's rank>=2 MPI solvers,
    ``fftw-3.3.8/mpi/dft-rank-geq2-transposed.c``):

        (Z/P1, Y/P2, X ) --fft X--> a2a(fz): X<->Y --> (Z/P1, Y, X/P2)
                         --fft Y--> a2a(fy): Y<->Z --> (Z, Y/P1, X/P2)
                         --fft Z--> [optionally a2a back to input layout]

    ``pipeline_chunks > 1`` splits the first a2a + fft(Y) into chunks
    along the local Z axis (untouched by that collective) so the ICI
    exchange of one chunk hides behind the butterflies of the previous
    (``fftw-3.3.8/mpi/transpose-pairwise.c`` scheduled-exchange analog).
    ``pipeline_chunks2 > 1`` does the same for the SECOND a2a + fft(Z),
    chunking along the local X axis.

    Multi-slice pods (DCN): build the mesh with
    ``make_multislice_mesh(n_slices, chips_per_slice)`` and pass it
    here — the slice axis lands on ``a1``, so with
    ``transposed_out=True`` the plan pays exactly ONE DCN collective
    (the second a2a) and one ICI collective; ``pipeline_chunks2`` is
    the knob that hides the slow DCN exchange behind fft(Z) compute.
    The reference's FFTW-MPI layer has no multi-tier network awareness
    (``mpi/transpose-alltoall.c`` treats all ranks uniformly).
    """
    from .mesh import make_pencil_mesh
    shape = tuple(shape)
    if len(shape) != 3:
        raise ValueError("pencil decomposition is for rank-3 transforms")
    if mesh is None:
        if mesh_shape is None:
            ndev = len(jax.devices())
            r = int(math.sqrt(ndev))
            while ndev % r:
                r -= 1
            mesh_shape = (r, ndev // r)
        mesh = make_pencil_mesh(mesh_shape, axis_names)
    a1, a2 = mesh.axis_names
    p1, p2 = int(mesh.shape[a1]), int(mesh.shape[a2])
    z, y, x = shape
    # Uneven blocks (mpi/block.c:39 analog; see make_plan_slab): Z pads
    # to P1 blocks, Y to lcm(P1, P2) blocks (it is split over BOTH mesh
    # axes), X to P2 blocks; every transform still runs at true length.
    lcm12 = p1 * p2 // math.gcd(p1, p2)
    zp = p1 * _blk(z, p1)
    yp = lcm12 * _blk(y, lcm12)
    xp = p2 * _blk(x, p2)
    unz, uny, unx = zp != z, yp != y, xp != x
    uneven = unz or uny or unx
    n_total = z * y * x
    howmany = int(howmany)
    off = 1 if howmany > 1 else 0
    bshape = ((howmany,) if off else ()) + shape
    scale = _norm_scale(n_total, direction, norm)
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend, dtype=dtype)
    b = bshape[:off]
    core_x = _local_core(b + (_blk(z, p1), _blk(y, p2), x), (off + 2,),
                         direction, **core_kw)
    core_y = _local_core(b + (_blk(z, p1), y, xp // p2), (off + 1,),
                         direction, **core_kw)
    zsl1 = _chunked(pipeline_chunks, zp // p1)
    xsl2 = _chunked(pipeline_chunks2, xp // p2)
    core_z = _local_core(b + (z, yp // p1, (xp // p2) // len(xsl2)), (off,),
                         direction, **core_kw)
    pre = (slice(None),) * off

    def _seg1(cr, ci):
        cr, ci = _a2a(cr, ci, a2, off + 2, off + 1)           # X <-> Y
        if uny:                          # Y locally complete: TRUE length
            cr = _slice_axis(cr, off + 1, y)
            ci = _slice_axis(ci, off + 1, y)
        cr, ci = core_y(cr, ci)
        if uny:                          # re-pad for the a1 split
            cr = _pad_axis(cr, off + 1, yp)
            ci = _pad_axis(ci, off + 1, yp)
        return cr, ci

    def _seg2(cr, ci):
        cr, ci = _a2a(cr, ci, a1, off + 1, off)               # Y <-> Z
        if unz:
            cr = _slice_axis(cr, off, z)
            ci = _slice_axis(ci, off, z)
        return core_z(cr, ci)

    def local_fn(xr, xi):
        xr, xi = core_x(xr, xi)                               # (Z/P1, Y/P2, X)
        if unx:   # X already transformed: placeholder lanes for the split
            xr = _pad_axis(xr, off + 2, xp)
            xi = _pad_axis(xi, off + 2, xp)
        if len(zsl1) == 1:
            xr, xi = _seg1(xr, xi)                            # (Z/P1, Y, X/P2)
        else:
            outs = [_seg1(xr[pre + (sl,)], xi[pre + (sl,)]) for sl in zsl1]
            xr = jnp.concatenate([o[0] for o in outs], axis=off)
            xi = jnp.concatenate([o[1] for o in outs], axis=off)
        if len(xsl2) == 1:
            xr, xi = _seg2(xr, xi)                            # (Z, Y/P1, X/P2)
        else:
            pre2 = pre + (slice(None), slice(None))
            outs = [_seg2(xr[pre2 + (sl,)], xi[pre2 + (sl,)]) for sl in xsl2]
            xr = jnp.concatenate([o[0] for o in outs], axis=off + 2)
            xi = jnp.concatenate([o[1] for o in outs], axis=off + 2)
        if not transposed_out:
            if unz:
                xr = _pad_axis(xr, off, zp)
                xi = _pad_axis(xi, off, zp)
            xr, xi = _a2a(xr, xi, a1, off, off + 1)
            xr, xi = _a2a(xr, xi, a2, off + 1, off + 2)
        return _apply_scale(xr, xi, scale)

    in_spec = P(*([None] * off), a1, a2, None)
    out_spec = P(*([None] * off), None, a1, a2) if transposed_out else in_spec
    fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                         out_specs=(out_spec, out_spec))
    if uneven:
        def fn(xr, xi):
            xr = _pad_axis(_pad_axis(xr, off, zp), off + 1, yp)
            xi = _pad_axis(_pad_axis(xi, off, zp), off + 1, yp)
            yr, yi = fn_inner(xr, xi)
            for ax, to in ((off, z), (off + 1, y), (off + 2, x)):
                yr, yi = _slice_axis(yr, ax, to), _slice_axis(yi, ax, to)
            return yr, yi
    else:
        fn = fn_inner
    desc = (f"(plan-distrib-pencil shape={shape} mesh=({p1}x{p2}) "
            f"{f'howmany={howmany} ' if off else ''}"
            f"fftX -> a2a[{a2}]"
            f"{f'/{len(zsl1)}chunks' if len(zsl1) > 1 else ''}"
            f" -> fftY -> a2a[{a1}]"
            f"{f'/{len(xsl2)}chunks' if len(xsl2) > 1 else ''}"
            f" -> fftZ"
            f"{' [transposed output]' if transposed_out else ' -> 2x a2a back'}"
            f"{f' [uneven blocks {z}->{zp}|{y}->{yp}|{x}->{xp}]' if uneven else ''})")
    flops = max(howmany, 1) * 5.0 * n_total * math.log2(max(n_total, 2))
    return DistributedFFTPlan(desc, mesh, in_spec, out_spec, fn, bshape,
                              dtype, flops, donate)


def make_plan_pencil_r2c(shape, norm=Norm.BACKWARD, dtype="complex64",
                         mesh: Optional[Mesh] = None,
                         mesh_shape: Optional[Tuple[int, int]] = None,
                         axis_names: Tuple[str, str] = ("fy", "fz"),
                         precision: str = "highest", use_3m: bool = False,
                         max_radix: int = 128, backend: str = "auto",
                         donate: bool = False):
    """Global 3-D real-input FFT, pencil-decomposed over a 2-D mesh.

    Input (Z, Y, X) real, distributed (Z/P1, Y/P2, X).  The halved axis
    (X -> X/2+1 after local r2c) never crosses a collective — all three
    all_to_alls trade Z pieces for Y pieces (sidestepping the (X/2+1)
    divisibility problem classic pencil r2c hits):

      r2c(X): (Z/P1, Y/P2, Xh)
      a2a[p1] Y->Z: (Z, Y/(P1 P2), Xh)   fft Z
      a2a[p1] Z->Y: (Z/P1, Y/P2, Xh)     (undo sandwich)
      a2a[p2] Z->Y: (Z/(P1 P2), Y, Xh)   fft Y

    requiring P1*P2 | Z and P1*P2 | Y.  Output: half-spectrum with Z
    sharded over BOTH mesh axes, P((a1, a2), None, None).
    """
    from .mesh import make_pencil_mesh
    shape = tuple(shape)
    if len(shape) != 3:
        raise ValueError("pencil r2c is for rank-3 transforms")
    if mesh is None:
        if mesh_shape is None:
            ndev = len(jax.devices())
            r = int(math.sqrt(ndev))
            while ndev % r:
                r -= 1
            mesh_shape = (r, ndev // r)
        mesh = make_pencil_mesh(mesh_shape, axis_names)
    a1, a2 = mesh.axis_names
    p1, p2 = int(mesh.shape[a1]), int(mesh.shape[a2])
    z, y, x = shape
    # Uneven blocks: Z and Y pad to P1*P2 blocks (both are split over
    # both mesh axes across the pipeline); the halved X axis never
    # crosses a collective, so it needs no padding.
    pp = p1 * p2
    zp, yp = pp * _blk(z, pp), pp * _blk(y, pp)
    uneven = (zp, yp) != (z, y)
    n_total = z * y * x
    scale = _norm_scale(n_total, Direction.FORWARD, norm)
    xh = x // 2 + 1
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend)
    from ..ops import pallas_stockham as _ps
    packed = _ps.r2c_packed_supported(x) and not uneven
    if packed:
        # Nyquist-packed transport for the pencil path: all THREE
        # all_to_alls (and the Z/Y transforms) run at x/2 lane-aligned
        # width; the final untangle's sharded reversal runs over the
        # JOINT (a1, a2)-sharded Z axis (see _rev_freq_sharded).
        m = x // 2
        core_z_p = _local_core((z, y // (p1 * p2), m), (0,),
                               Direction.FORWARD, **core_kw)
        core_y_p = _local_core((z // (p1 * p2), y, m), (1,),
                               Direction.FORWARD, **core_kw)

        def local_fn(v):
            interp = jax.default_backend() != "tpu"
            yr, yi = _ps.fft_last_r2c_stockham(v, interpret=interp,
                                               packed=True)
            yr, yi = _a2a(yr, yi, a1, 1, 0)                 # (Z, Y/(P1P2), m)
            yr, yi = core_z_p(yr, yi)
            yr, yi = _a2a(yr, yi, a1, 0, 1)                 # (Z/P1, Y/P2, m)
            yr, yi = _a2a(yr, yi, a2, 0, 1)                 # (Z/(P1P2), Y, m)
            yr, yi = core_y_p(yr, yi)
            yr, yi = _untangle_packed(yr, yi, [1], 0, (a1, a2), p1 * p2)
            return _apply_scale(yr, yi, scale)
    else:
        core_r2c = _local_core((_blk(z, p1), _blk(y, p2), x), (2,),
                               kind=Kind.R2C, **core_kw)
        core_z = _local_core((z, yp // pp, xh), (0,),
                             Direction.FORWARD, **core_kw)
        core_y = _local_core((zp // pp, y, xh), (1,),
                             Direction.FORWARD, **core_kw)

        def local_fn(v):
            xr, xi = core_r2c(v)                            # (Z/P1, Y/P2, Xh)
            xr, xi = _a2a(xr, xi, a1, 1, 0)                 # (Z, Y/(P1P2), Xh)
            if uneven:                  # Z locally complete: TRUE length
                xr = _slice_axis(xr, 0, z)
                xi = _slice_axis(xi, 0, z)
            xr, xi = core_z(xr, xi)
            if uneven:
                xr = _pad_axis(xr, 0, zp)
                xi = _pad_axis(xi, 0, zp)
            xr, xi = _a2a(xr, xi, a1, 0, 1)                 # (Z/P1, Y/P2, Xh)
            xr, xi = _a2a(xr, xi, a2, 0, 1)                 # (Z/(P1P2), Y, Xh)
            if uneven:                  # Y locally complete: TRUE length
                xr = _slice_axis(xr, 1, y)
                xi = _slice_axis(xi, 1, y)
            xr, xi = core_y(xr, xi)
            return _apply_scale(xr, xi, scale)

    in_spec = P(a1, a2, None)
    out_spec = P((a1, a2), None, None)
    fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec,),
                         out_specs=(out_spec, out_spec))
    if uneven:
        def fn(v):
            yr, yi = fn_inner(_pad_axis(_pad_axis(v, 0, zp), 1, yp))
            return _slice_axis(yr, 0, z), _slice_axis(yi, 0, z)
    else:
        fn = fn_inner
    half = (z, y, x // 2 + 1)
    desc = (f"(plan-distrib-pencil-r2c real-shape={shape} mesh=({p1}x{p2}) "
            f"r2c(X) -> a2a[{a1}] -> fft(Z) -> a2a[{a1}],a2a[{a2}] -> fft(Y); "
            f"halved axis never crosses a collective"
            f"{'; nyquist-packed transport' if packed else ''}"
            f"{f'; uneven blocks {z}->{zp}|{y}->{yp}' if uneven else ''})")
    flops = 2.5 * n_total * math.log2(max(n_total, 2))

    class _PR2CPlan(DistributedFFTPlan):
        _donate_argnums = (0,)

        def __call__(self, v):
            if self._destroyed:
                raise RuntimeError("plan was destroyed")
            v = jnp.asarray(_require_real(v, "pencil R2C plan"))
            if v.shape != shape:
                raise ValueError(f"input shape {v.shape} != planned {shape}")
            v = _constrain(v.astype(jnp.float32), self.in_sharding)
            yr, yi = self._fn(v)
            return from_split(SplitComplex(yr, yi), jnp.complex64)
        execute = __call__

    return _PR2CPlan(desc, mesh, in_spec, out_spec, fn, half, dtype, flops,
                     donate)


def make_plan_pencil_c2r(shape, norm=Norm.BACKWARD, dtype="complex64",
                         mesh: Optional[Mesh] = None,
                         mesh_shape: Optional[Tuple[int, int]] = None,
                         axis_names: Tuple[str, str] = ("fy", "fz"),
                         precision: str = "highest", use_3m: bool = False,
                         max_radix: int = 128, backend: str = "auto",
                         donate: bool = False):
    """Inverse of :func:`make_plan_pencil_r2c`: half-spectrum -> real field.

    ``shape`` is the REAL output shape; input layout is the r2c plan's
    output layout (Z/P2, Y/P1, Xh); output is (Z/P1, Y/P2, X).
    """
    from .mesh import make_pencil_mesh
    shape = tuple(shape)
    if len(shape) != 3:
        raise ValueError("pencil c2r is for rank-3 transforms")
    if mesh is None:
        if mesh_shape is None:
            ndev = len(jax.devices())
            r = int(math.sqrt(ndev))
            while ndev % r:
                r -= 1
            mesh_shape = (r, ndev // r)
        mesh = make_pencil_mesh(mesh_shape, axis_names)
    a1, a2 = mesh.axis_names
    p1, p2 = int(mesh.shape[a1]), int(mesh.shape[a2])
    z, y, x = shape
    # Uneven blocks: reverse of make_plan_pencil_r2c.
    pp = p1 * p2
    zp, yp = pp * _blk(z, pp), pp * _blk(y, pp)
    uneven = (zp, yp) != (z, y)
    n_total = z * y * x
    scale = _norm_scale(n_total, Direction.BACKWARD, norm)
    xh = x // 2 + 1
    core_kw = dict(precision=precision, use_3m=use_3m, max_radix=max_radix,
                   backend=backend)
    from ..ops import pallas_stockham as _ps
    packed = _ps.r2c_packed_supported(x) and not uneven
    if packed:
        # Nyquist-packed transport, pencil c2r side: tangle at INPUT
        # (conjugate-even projection over the JOINT-sharded Z axis plus
        # local Y), then all three all_to_alls and both inverse
        # transforms run at x/2 lane-aligned width; the packed c2r
        # kernel unpacks in-VMEM.
        m = x // 2
        core_y_p = _local_core((z // (p1 * p2), y, m), (1,),
                               Direction.BACKWARD, **core_kw)
        core_z_p = _local_core((z, y // (p1 * p2), m), (0,),
                               Direction.BACKWARD, **core_kw)

        def local_fn(xr, xi):
            xr, xi = _tangle_packed(xr, xi, [1], 0, (a1, a2), p1 * p2)
            xr, xi = core_y_p(xr, xi)                       # (Z/(P1P2), Y, m)
            xr, xi = _a2a(xr, xi, a2, 1, 0)                 # (Z/P1, Y/P2, m)
            xr, xi = _a2a(xr, xi, a1, 1, 0)                 # (Z, Y/(P1P2), m)
            xr, xi = core_z_p(xr, xi)
            xr, xi = _a2a(xr, xi, a1, 0, 1)                 # (Z/P1, Y/P2, m)
            interp = jax.default_backend() != "tpu"
            v = _ps.ifft_last_c2r_stockham(xr, xi, x, interpret=interp,
                                           packed=True)
            if scale != 1.0:
                v = v * jnp.asarray(scale, v.dtype)
            return v
    else:
        core_c2r = _local_core((_blk(z, p1), _blk(y, p2), x), (2,),
                               kind=Kind.C2R, **core_kw)
        core_y = _local_core((zp // pp, y, xh), (1,),
                             Direction.BACKWARD, **core_kw)
        core_z = _local_core((z, yp // pp, xh), (0,),
                             Direction.BACKWARD, **core_kw)

        def local_fn(xr, xi):
            # exact reverse of pencil-r2c
            xr, xi = core_y(xr, xi)                         # (Z/(P1P2), Y, Xh)
            if uneven:                  # even the a2 split of Y
                xr = _pad_axis(xr, 1, yp)
                xi = _pad_axis(xi, 1, yp)
            xr, xi = _a2a(xr, xi, a2, 1, 0)                 # (Z/P1, Y/P2, Xh)
            xr, xi = _a2a(xr, xi, a1, 1, 0)                 # (Z, Y/(P1P2), Xh)
            if uneven:                  # Z locally complete: TRUE length
                xr = _slice_axis(xr, 0, z)
                xi = _slice_axis(xi, 0, z)
            xr, xi = core_z(xr, xi)
            if uneven:
                xr = _pad_axis(xr, 0, zp)
                xi = _pad_axis(xi, 0, zp)
            xr, xi = _a2a(xr, xi, a1, 0, 1)                 # (Z/P1, Y/P2, Xh)
            v = core_c2r(xr, xi)                            # (Z/P1, Y/P2, X)
            if scale != 1.0:
                v = v * jnp.asarray(scale, v.dtype)
            return v

    in_spec = P((a1, a2), None, None)
    out_spec = P(a1, a2, None)
    fn_inner = shard_map(local_fn, mesh=mesh, in_specs=(in_spec, in_spec),
                         out_specs=out_spec)
    if uneven:
        def fn(xr, xi):
            v = fn_inner(_pad_axis(xr, 0, zp), _pad_axis(xi, 0, zp))
            return _slice_axis(_slice_axis(v, 0, z), 1, y)
    else:
        fn = fn_inner
    half = (z, y, x // 2 + 1)
    desc = (f"(plan-distrib-pencil-c2r real-shape={shape} mesh=({p1}x{p2}) "
            f"ifft(Y) -> a2a[{a2}],a2a[{a1}] -> ifft(Z) -> a2a[{a1}] -> c2r(X)"
            f"{' [nyquist-packed transport]' if packed else ''}"
            f"{f' [uneven blocks {z}->{zp}|{y}->{yp}]' if uneven else ''})")
    flops = 2.5 * n_total * math.log2(max(n_total, 2))

    class _PC2RPlan(DistributedFFTPlan):
        def __call__(self, v):
            if self._destroyed:
                raise RuntimeError("plan was destroyed")
            sx = as_split(v, jnp.float32)
            if sx.re.shape != half:
                raise ValueError(f"input shape {sx.re.shape} != planned {half}")
            xr = _constrain(sx.re, self.in_sharding)
            xi = _constrain(sx.im, self.in_sharding)
            return self._fn(xr, xi)
        execute = __call__

    return _PC2RPlan(desc, mesh, in_spec, out_spec, fn, shape, dtype, flops,
                     donate)


def destroy_plan_distrib(plan: DistributedFFTPlan):
    """Reference-parity destroy (``src/fft.rg:655-661``)."""
    plan.destroy()


# ---------------------------------------------------------------------------
# Strategy dispatch + distributed wisdom (FFTW_MEASURE for the MPI layer —
# FFTW's planner times its MPI transpose solvers like any other solver,
# ``fftw-3.3.8/mpi/transpose-alltoall.c`` vs ``transpose-pairwise.c``; the
# analog here is racing slab/pencil/chunking on the actual mesh).
# ---------------------------------------------------------------------------

# (shape, n_devices, direction, norm) -> winning strategy dict.  Exported
# and restored by utils.wisdom alongside schedule/backend wisdom.
_DISTRIB_WISDOM: dict = {}


def _distrib_key(shape, n_devices: int, direction: Direction, norm: Norm,
                 kind: Kind = Kind.C2C):
    return (tuple(shape), int(n_devices), int(direction), norm.value,
            kind.value)


def strategy_name(strategy: dict) -> str:
    """Canonical short name, e.g. ``slab/c2`` or ``pencil2x4/c1``."""
    mode = strategy["mode"]
    c = strategy.get("pipeline_chunks", 1)
    c2 = strategy.get("pipeline_chunks2", 1)
    tail = f"/c{c}" + (f"/d{c2}" if c2 > 1 else "")
    if mode == "pencil" and "mesh_shape" in strategy:
        p1, p2 = strategy["mesh_shape"]
        return f"pencil{p1}x{p2}{tail}"
    return f"{mode}{tail}"


def _default_pencil_shape(n_devices: int) -> Tuple[int, int]:
    r = int(math.isqrt(n_devices))
    while n_devices % r:
        r -= 1
    return (r, n_devices // r)


def candidate_strategies(shape, n_devices: int,
                         chunk_candidates: Sequence[int] = (1, 2, 4),
                         kind: Kind = Kind.C2C):
    """Feasible decomposition strategies for a global transform.

    C2C: slab (one collective round) for any rank >= 2 shape — since r5,
    non-divisible axes run as uneven pad-to-block distributions
    (``_blk``, FFTW mpi/block.c:39 analog), so divisibility no longer
    gates feasibility; pencil (2-D mesh, two rounds, scales past
    P <= min-extent) for rank-3 shapes.  Each mode is offered at every
    overlap-pipeline chunk count that its chunk axis admits (chunking
    needs rank >= 3).  R2C/C2R: slab needs rank >= 3; pencil rank 3
    (the halved axis never crosses a collective)."""
    shape = tuple(shape)
    nd_ = len(shape)
    p = int(n_devices)
    out = []
    if nd_ == 1:
        # rank-1 big-vector (mpi/dft-rank1-bigvec.c analog): feasible when
        # n (or n/2 for the real kinds' packed half-length transform)
        # admits an R*C split with P | R and P | C.
        n1d = shape[0] if kind == Kind.C2C else shape[0] // 2
        try:
            _slab1d_factors(n1d, p)
        except ValueError:
            return out
        if kind != Kind.C2C and shape[0] % 2:
            return out
        out.append({"mode": "slab1d"})
        return out
    if kind in (Kind.R2C, Kind.C2R):
        if nd_ >= 3:
            out.append({"mode": "slab", "pipeline_chunks": 1})
        if nd_ == 3 and p > 1:
            p1, p2 = _default_pencil_shape(p)
            if p1 > 1:
                out.append({"mode": "pencil", "mesh_shape": (p1, p2),
                            "pipeline_chunks": 1})
        return out
    if nd_ >= 2:
        for c in chunk_candidates:
            if c == 1 or (nd_ >= 3 and c <= shape[1]):
                out.append({"mode": "slab", "pipeline_chunks": int(c)})
    if nd_ == 3 and p > 1:
        p1, p2 = _default_pencil_shape(p)
        if p1 > 1:  # a 1xP pencil is just a worse slab
            z, y, x = shape
            # near-square mesh first, then its transpose — block sizes
            # are orientation-sensitive, so both orders are raced.
            for q1, q2 in dict.fromkeys([(p1, p2), (p2, p1)]):
                for c in chunk_candidates:
                    if c == 1 or c <= _blk(z, q1):
                        out.append({"mode": "pencil", "mesh_shape": (q1, q2),
                                    "pipeline_chunks": int(c)})
                # second-collective overlap (the DCN-side knob on
                # multi-slice meshes): raced on its own so the candidate
                # count stays linear in chunk_candidates
                xloc = _blk(x, q2)
                for c in chunk_candidates:
                    if 1 < c <= xloc and xloc % c == 0:
                        out.append({"mode": "pencil", "mesh_shape": (q1, q2),
                                    "pipeline_chunks": 1,
                                    "pipeline_chunks2": int(c)})
    return out


def build_strategy(strategy: dict, shape, direction=Direction.FORWARD,
                   norm=Norm.BACKWARD, n_devices: Optional[int] = None,
                   **kw) -> DistributedFFTPlan:
    """Build the distributed C2C plan a strategy dict describes.

    ``n_devices`` restricts the mesh to the first N devices (matching the
    device count the strategy was selected for); the full device set is
    used when omitted.
    """
    s = dict(strategy)
    mode = s.pop("mode")
    kind = kw.pop("kind", Kind.C2C)
    if mode in ("slab", "shards") and n_devices is not None and "mesh" not in kw:
        kw = dict(kw, mesh=make_fft_mesh(n_devices))
    if mode == "slab1d" and kind in (Kind.R2C, Kind.C2R):
        if n_devices is not None and "mesh" not in kw:
            kw = dict(kw, mesh=make_fft_mesh(n_devices))
        return make_plan_slab_1d(shape[0], norm=norm, kind=kind, **s, **kw)
    if kind in (Kind.R2C, Kind.C2R):
        s.pop("pipeline_chunks", None)
        s.pop("pipeline_chunks2", None)
        ctor = {("slab", Kind.R2C): make_plan_slab_r2c,
                ("slab", Kind.C2R): make_plan_slab_c2r,
                ("pencil", Kind.R2C): make_plan_pencil_r2c,
                ("pencil", Kind.C2R): make_plan_pencil_c2r}.get((mode, kind))
        if ctor is None:
            raise ValueError(f"no {kind} constructor for mode {mode!r}")
        if mode == "pencil":
            ms = s.pop("mesh_shape", None)
            if ms is not None:
                ms = tuple(ms)
            kw.pop("mesh", None)
            return ctor(shape, norm=norm, mesh_shape=ms, **s, **kw)
        return ctor(shape, norm=norm, **s, **kw)
    if mode == "slab1d":
        if n_devices is not None and "mesh" not in kw:
            kw = dict(kw, mesh=make_fft_mesh(n_devices))
        return make_plan_slab_1d(shape[0], direction=direction, norm=norm,
                                 **s, **kw)
    if mode == "slab":
        return make_plan_slab(shape, direction=direction, norm=norm, **s, **kw)
    if mode == "pencil":
        ms = s.pop("mesh_shape", None)
        if ms is not None:
            ms = tuple(ms)  # make_pencil_mesh takes the first p1*p2 devices
        elif n_devices is not None:
            ms = _default_pencil_shape(int(n_devices))
        return make_plan_pencil(shape, direction=direction, norm=norm,
                                mesh_shape=ms, **s, **kw)
    if mode == "shards":
        s.pop("pipeline_chunks", None)
        return make_plan_shards(shape, direction=direction, norm=norm, **kw)
    raise ValueError(f"unknown distributed strategy mode: {mode!r}")


def make_plan_distributed(shape, direction=Direction.FORWARD,
                          norm=Norm.BACKWARD, n_devices: Optional[int] = None,
                          planner: str = "estimate", kind: Kind = Kind.C2C,
                          chunk_candidates: Sequence[int] = (1, 2, 4),
                          measure_iters: int = 3, **kw) -> DistributedFFTPlan:
    """Auto-dispatching global plan: slab vs pencil vs overlap chunks.

    ``kind`` selects C2C (default) or R2C/C2R (rank-3 real pipelines;
    ``direction`` is implied by the kind there).  ``planner="estimate"``:
    use the wisdom winner when one is recorded for (shape, devices,
    direction, norm, kind); otherwise the heuristic — slab when
    divisibility allows (one ICI round beats pencil's two at equal P),
    else pencil.  ``planner="measure"``: race every feasible strategy on
    the actual device mesh (``utils.measure.measure_distributed``), record
    the winner in distributed wisdom (exported via ``export_wisdom``), and
    build it — the FFTW_MEASURE analog the reference's distributed mode
    never had (it index-launches per-node ESTIMATE plans only,
    ``src/fft.rg:513-537``).
    """
    import jax
    shape = tuple(shape)
    p = int(n_devices or len(jax.devices()))
    key = _distrib_key(shape, p, direction, norm, kind)
    if planner == "measure":
        from ..utils.measure import measure_distributed
        plans = {}
        winner, _ = measure_distributed(
            shape, direction=direction, norm=norm, n_devices=p, kind=kind,
            chunk_candidates=chunk_candidates, iters=measure_iters,
            install=True, plans_out=plans, **kw)
        # Reuse the raced plan (its executor is already compiled) rather
        # than rebuilding the identical one.
        hit = plans.get(strategy_name(winner))
        if hit is not None:
            return hit
        return build_strategy(winner, shape, direction, norm, n_devices=p,
                              kind=kind, **kw)
    hit = _DISTRIB_WISDOM.get(key)
    if hit is not None:
        return build_strategy(hit, shape, direction, norm, n_devices=p,
                              kind=kind, **kw)
    cands = candidate_strategies(shape, p, (1,), kind=kind)
    if not cands:
        raise ValueError(
            f"no feasible distributed decomposition for shape {shape} "
            f"({kind}) on {p} devices (see candidate_strategies for the "
            f"divisibility rules)")

    def pad_overhead(c):
        # Padded-volume fraction of the uneven-block realization: the
        # estimate-mode tiebreak (an exact pencil beats a 30%-padded
        # slab; a lightly-padded slab keeps its one-collective-round
        # advantage).  measure-mode races the real thing instead.
        if c["mode"] == "slab":
            n0p = p * _blk(shape[0], p)
            nlp = p * _blk(shape[-1], p) if kind == Kind.C2C \
                else p * _blk(shape[1], p)
            axes = (shape[0], shape[-1] if kind == Kind.C2C else shape[1])
            return n0p * nlp / (axes[0] * axes[1]) - 1.0
        if c["mode"] == "pencil":
            q1, q2 = c["mesh_shape"]
            if kind == Kind.C2C:
                z, y, x = shape
                lcm12 = q1 * q2 // math.gcd(q1, q2)
                return (q1 * _blk(z, q1) * lcm12 * _blk(y, lcm12)
                        * q2 * _blk(x, q2)) / (z * y * x) - 1.0
            pp = q1 * q2
            return (pp * _blk(shape[0], pp) * pp * _blk(shape[1], pp)
                    ) / (shape[0] * shape[1]) - 1.0
        return 0.0

    # slab first at equal overhead (one ICI round beats pencil's two);
    # 10% padding tax per extra collective round keeps the old exact
    # preferences intact.
    def rank_key(c):
        rounds = {"slab": 0, "slab1d": 0}.get(c["mode"], 1)
        return (pad_overhead(c) + 0.10 * rounds,
                c.get("pipeline_chunks", 1) != 1)
    return build_strategy(min(cands, key=rank_key),
                          shape, direction, norm, n_devices=p, kind=kind,
                          **kw)
