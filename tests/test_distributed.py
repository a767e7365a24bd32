"""Distributed transforms on a virtual 8-device CPU mesh.

Exercises what the reference never could (its distributed test is disabled
and CI is single-node, SURVEY.md section 4): per-shard parity mode, slab and
pencil global FFTs, transposed-output layouts, and inverse roundtrips.
"""
import numpy as np
import pytest
import jax

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Norm
from regent_fft_tpu.parallel import distributed as dist
from regent_fft_tpu.parallel.mesh import make_fft_mesh, make_pencil_mesh
from regent_fft_tpu.utils.verify import rel_l2, tolerance

RNG = np.random.default_rng(3)


def crand(shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(np.complex64)


@pytest.fixture(scope="module", autouse=True)
def _need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def test_shards_reference_parity():
    # Independent per-shard FFTs (src/fft.rg:513-537 semantics).
    x = crand((8, 4, 16))
    p = dist.make_plan_shards((8, 4, 16), direction=Direction.FORWARD)
    y = p(x)
    ref = np.fft.fftn(x, axes=(1, 2))  # each slab transformed independently
    assert rel_l2(y, ref) < tolerance(64)


def test_slab_2d():
    x = crand((16, 24))
    p = dist.make_plan_slab((16, 24))
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)


def test_slab_3d_and_inverse():
    x = crand((16, 8, 16))
    p = dist.make_plan_slab((16, 8, 16))
    y = p(x)
    assert rel_l2(y, np.fft.fftn(x)) < tolerance(x.size)
    pinv = dist.make_plan_slab((16, 8, 16), direction=Direction.BACKWARD,
                               norm=Norm.BACKWARD)
    back = pinv(y)
    assert rel_l2(back, x) < tolerance(x.size)


def test_slab_transposed_out():
    # FFTW_MPI_TRANSPOSED_OUT analog: values identical, layout X-sharded.
    x = crand((8, 8, 8))
    p = dist.make_plan_slab((8, 8, 8), transposed_out=True)
    y = p(x)
    assert rel_l2(y, np.fft.fftn(x)) < tolerance(x.size)
    assert p.out_sharding.spec[-1] == "fft"


def test_pencil_3d():
    mesh = make_pencil_mesh((2, 4))
    x = crand((8, 8, 16))
    p = dist.make_plan_pencil((8, 8, 16), mesh=mesh)
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)


def test_pencil_transposed_out():
    mesh = make_pencil_mesh((2, 4))
    x = crand((4, 8, 8))
    p = dist.make_plan_pencil((4, 8, 8), mesh=mesh, transposed_out=True)
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)


def test_pencil_inverse_roundtrip():
    mesh = make_pencil_mesh((2, 4))
    x = crand((8, 8, 8))
    fwd = dist.make_plan_pencil((8, 8, 8), mesh=mesh)
    inv = dist.make_plan_pencil((8, 8, 8), mesh=mesh, direction=Direction.BACKWARD)
    assert rel_l2(inv(fwd(x)), x) < tolerance(x.size)


def test_slab_non_divisible_uses_uneven_blocks():
    # r5: non-divisible axes no longer raise (src/fft.rg:519 hard-asserts;
    # FFTW-MPI serves them as uneven blocks, mpi/block.c:39 — so do we).
    p = dist.make_plan_slab((9, 8, 8), norm=Norm.NONE)
    assert "uneven blocks" in p.description
    x = crand((9, 8, 8))
    assert rel_l2(p(x), np.fft.fftn(x.astype(np.complex128))) < tolerance(x.size)


def test_interface_make_plan_distrib():
    iface = rft.generate_fft_interface(2, np.complex64, np.complex64)
    p = iface.make_plan_distrib((8, 4, 16))
    x = crand((8, 4, 16))
    assert rel_l2(p(x), np.fft.fftn(x, axes=(1, 2))) < tolerance(64)
    dist.destroy_plan_distrib(p)
    with pytest.raises(RuntimeError):
        p(x)


def test_shards_full_local_transform():
    # Reference semantics: each node FFTs ALL dims of its LOCAL slab
    # (make_plan_task plans fftw_plan_dft(dim, ...) on the local region).
    x = crand((16, 4))
    p = dist.make_plan_shards((16, 4), direction=Direction.FORWARD)
    ref = np.fft.fftn(x.reshape(8, 2, 4), axes=(1, 2)).reshape(16, 4)
    assert rel_l2(p(x), ref) < tolerance(8)


def test_shards_1d_local_chunks():
    x = crand((16,))
    p = dist.make_plan_shards((16,), direction=Direction.FORWARD)
    ref = np.fft.fft(x.reshape(8, 2), axis=1).reshape(16)
    assert rel_l2(p(x), ref) < tolerance(2)


def test_slab_pipelined_chunks_matches():
    # Chunked overlap pipeline (transpose-pairwise analog): identical
    # numerics to the unchunked plan at any chunk count.
    x = crand((8, 6, 16))
    ref = np.fft.fftn(x)
    for chunks in (2, 3):
        p = dist.make_plan_slab((8, 6, 16), norm=Norm.NONE,
                                pipeline_chunks=chunks)
        assert rel_l2(p(x), ref) < tolerance(x.size)
        assert f"pipelined x{chunks}" in p.description


def test_pencil_pipelined_chunks_matches():
    mesh = make_pencil_mesh((2, 4))
    x = crand((8, 8, 16))
    ref = np.fft.fftn(x)
    p = dist.make_plan_pencil((8, 8, 16), mesh=mesh, norm=Norm.NONE,
                              pipeline_chunks=2)
    assert rel_l2(p(x), ref) < tolerance(x.size)


def test_collective_logging_level2(caplog):
    # LoggingWrapper parity: REGENT_FFT_LOG=2 must show the collective
    # schedule of a distributed plan (logging_mapper.cc:129-217 analog).
    import logging
    from regent_fft_tpu.utils import plog
    plog.set_log_level(2)
    plog.logger.propagate = True  # plog defaults to its own stderr handler
    try:
        with caplog.at_level(logging.DEBUG, logger="regent_fft_tpu"):
            p = dist.make_plan_slab((8, 4, 16), norm=Norm.NONE)
            x = crand((8, 4, 16))
            p(x)  # tracing emits the collective records
        msgs = [r.getMessage() for r in caplog.records]
        assert any("all_to_all" in m for m in msgs), msgs
    finally:
        plog.logger.propagate = False
        plog.set_log_level(0)


def test_distributed_donate():
    """donate=True aliases input planes to the executor (serving analog of
    FFTW in-place plans); numerics must be identical."""
    import numpy as np
    from regent_fft_tpu.parallel import distributed as dist
    p = dist.make_plan_slab((16, 8, 16), donate=True)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((16, 8, 16))
         + 1j * rng.standard_normal((16, 8, 16))).astype(np.complex64)
    got = np.asarray(p(x))
    ref = np.fft.fftn(x.astype(np.complex128))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    r = dist.make_plan_slab_r2c((16, 8, 16), donate=True)
    y = np.asarray(r(rng.standard_normal((16, 8, 16)).astype(np.float32)))
    assert y.shape == (16, 8, 9)


def test_slab_transposed_in_chains_with_transposed_out():
    """FFTW_MPI_TRANSPOSED_OUT/IN pairing: forward leaves the spectrum
    last-axis-distributed, the transposed_in inverse consumes exactly
    that layout — two collectives total for a roundtrip."""
    shape = (16, 4, 16)
    fwd = dist.make_plan_slab(shape, norm=Norm.NONE, transposed_out=True)
    inv = dist.make_plan_slab(shape, norm=Norm.BACKWARD,
                              direction=Direction.BACKWARD,
                              transposed_in=True)
    x = crand(shape)
    X = fwd(x)
    assert rel_l2(X, np.fft.fftn(x)) < tolerance(x.size)
    back = np.asarray(inv(X))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < 1e-5
    # standalone transposed_in forward is also a correct global FFT
    p = dist.make_plan_slab(shape, norm=Norm.NONE, transposed_in=True)
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)
    with pytest.raises(ValueError):
        dist.make_plan_slab(shape, transposed_in=True, transposed_out=True)


def test_packed_c2r_matches_irfftn_on_arbitrary_spectrum():
    """The Nyquist-packed c2r path projects the endpoint slabs to their
    conjugate-even parts, matching numpy.irfftn for NON-Hermitian input
    (regression: unprojected packing diverged 6e-2 on random spectra)."""
    import regent_fft_tpu as rft
    shape = (4, 8, 256)
    h = shape[:-1] + (129,)
    rng = np.random.default_rng(9)
    y = (rng.standard_normal(h) + 1j * rng.standard_normal(h)
         ).astype(np.complex64)
    p = rft.make_plan(shape, axes=(0, 1, 2), kind=rft.Kind.C2R,
                      direction=Direction.BACKWARD, norm=Norm.BACKWARD,
                      backend="stockham")
    got = np.asarray(p(y))
    ref = np.fft.irfftn(y.astype(np.complex128), s=shape, axes=(0, 1, 2))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


def test_slab_complex32_bf16_transport():
    """complex32 slab plans carry bf16 planes end-to-end: every
    all_to_all moves half the ICI bytes.  Accuracy within the complex32
    tolerance; output dtype is the complex32 split view."""
    shape = (16, 32, 32)
    x = crand(shape)
    p = dist.make_plan_slab(shape, direction=Direction.FORWARD,
                            norm=Norm.NONE, dtype="complex32")
    y = p(x)
    ref = np.fft.fftn(x.astype(np.complex128))
    from regent_fft_tpu.utils.verify import to_numpy_complex
    got = to_numpy_complex(y)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < tolerance(int(np.prod(shape)), "complex32"), rel
    # the executor's traced planes must actually be bf16 (transport check)
    import jax.numpy as jnp
    avals = jax.eval_shape(
        lambda a, b: p._fn(a, b),
        jax.ShapeDtypeStruct(shape, jnp.bfloat16),
        jax.ShapeDtypeStruct(shape, jnp.bfloat16))
    assert avals[0].dtype == jnp.bfloat16


def test_pencil_complex32_bf16_transport():
    shape = (8, 16, 32)
    x = crand(shape)
    p = dist.make_plan_pencil(shape, direction=Direction.FORWARD,
                              norm=Norm.NONE, dtype="complex32")
    y = p(x)
    ref = np.fft.fftn(x.astype(np.complex128))
    from regent_fft_tpu.utils.verify import to_numpy_complex
    got = to_numpy_complex(y)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < tolerance(int(np.prod(shape)), "complex32"), rel


def test_multislice_mesh_and_dcn_pencil():
    """make_multislice_mesh: slice axis first (DCN), chips second (ICI);
    the pencil plan over it compiles and matches the dense reference with
    the DCN-side chunk overlap on (pipeline_chunks2)."""
    import numpy as np
    import regent_fft_tpu as rft
    from regent_fft_tpu.parallel.mesh import make_multislice_mesh

    mesh = make_multislice_mesh(2, 4)
    assert mesh.axis_names == ("slice", "chip")
    assert dict(mesh.shape) == {"slice": 2, "chip": 4}

    shape = (8, 16, 16)
    x = (np.random.default_rng(7).standard_normal(shape)
         + 1j * np.random.default_rng(8).standard_normal(shape)
         ).astype(np.complex64)
    plan = rft.make_plan_pencil(shape, mesh=mesh, transposed_out=True,
                                pipeline_chunks2=2)
    assert "a2a[slice]/2chunks" in plan.description
    got = np.asarray(plan(x))
    # transposed output: (Z, Y, X) -> result laid out as planned out_spec
    ref = np.fft.fftn(x.astype(np.complex128))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel


def test_pencil_chunks2_matches_unchunked():
    import numpy as np
    import regent_fft_tpu as rft

    shape = (8, 8, 16)
    x = (np.random.default_rng(9).standard_normal(shape)
         + 1j * np.random.default_rng(10).standard_normal(shape)
         ).astype(np.complex64)
    base = rft.make_plan_pencil(shape, mesh_shape=(2, 4))
    chunked = rft.make_plan_pencil(shape, mesh_shape=(2, 4),
                                   pipeline_chunks2=2)
    a, b = np.asarray(base(x)), np.asarray(chunked(x))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)


def test_multislice_mesh_rejects_oversubscription():
    import pytest
    from regent_fft_tpu.parallel.mesh import make_multislice_mesh
    with pytest.raises(ValueError):
        make_multislice_mesh(16)        # 16 slices > 8 devices: ici floors to 0
    with pytest.raises(ValueError):
        make_multislice_mesh(2, 8)      # 16 devices needed, have 8
    with pytest.raises(ValueError):
        make_multislice_mesh(0, 4)


def test_pencil_description_reports_clamped_chunks():
    import regent_fft_tpu as rft
    # z//p1 = 2 clamps pipeline_chunks=8 to 2; x//p2 = 8 clamps 16 to 8
    p = rft.make_plan_pencil((8, 8, 16), mesh_shape=(4, 2),
                             pipeline_chunks=8, pipeline_chunks2=16)
    assert "a2a[fz]/2chunks" in p.description \
        and "a2a[fy]/8chunks" in p.description, p.description


def test_multislice_selection_spans_slices():
    """Partial-pod selection must draw each mesh row from ONE slice
    (flat device order is slice-major; devices[:need] would collapse
    onto slice 0 and the DCN axis would be a lie)."""
    from collections import namedtuple
    from regent_fft_tpu.parallel.mesh import _select_multislice
    import pytest

    D = namedtuple("D", ["id", "slice_index"])
    # 2 slices x 8 chips, slice-major order (like jax.devices() on a pod)
    devs = [D(s * 8 + i, s) for s in range(2) for i in range(8)]
    arr = _select_multislice(devs, 2, 4)
    assert arr.shape == (2, 4)
    assert {d.slice_index for d in arr[0]} == {0}
    assert {d.slice_index for d in arr[1]} == {1}
    # uneven slices: the small one is skipped, not zero-padded
    devs_uneven = [D(i, 0) for i in range(8)] + [D(100, 1)] \
        + [D(200 + i, 2) for i in range(8)]
    arr = _select_multislice(devs_uneven, 2, 8)
    assert [row[0].slice_index for row in arr] == [0, 2]
    # too few qualifying slices
    with pytest.raises(ValueError):
        _select_multislice(devs, 3, 8)


def test_random_distributed_problem_fuzz():
    """check.pl analog for the distributed layer (the reference could
    never fuzz distributed at all — its one distrib test is disabled,
    SURVEY §4): random (shape, kind, strategy) problems on the 8-device
    mesh, every feasible strategy raced against numpy."""
    rng = np.random.default_rng(777)
    n_dev = 8
    kinds = [rft.Kind.C2C, rft.Kind.R2C, rft.Kind.C2R]
    checked = 0
    for trial in range(8):
        kind = kinds[int(rng.integers(len(kinds)))]
        # extents divisible enough that at least one strategy exists
        dims = [int(8 * rng.integers(1, 4)) for _ in range(3)]
        shape = tuple(dims)
        cands = dist.candidate_strategies(shape, n_dev, (1, 2), kind=kind)
        if not cands:
            continue
        strat = cands[int(rng.integers(len(cands)))]
        plan = dist.build_strategy(strat, shape, norm=Norm.NONE,
                                   n_devices=n_dev, kind=kind)
        if kind == rft.Kind.C2C:
            x = crand(shape)
            ref = np.fft.fftn(x.astype(np.complex128))
            got = np.asarray(plan(x))
        elif kind == rft.Kind.R2C:
            x = rng.standard_normal(shape).astype(np.float32)
            ref = np.fft.rfftn(x.astype(np.float64))
            got = np.asarray(plan(x))
        else:  # C2R
            xr = rng.standard_normal(shape).astype(np.float32)
            spec = np.fft.rfftn(xr.astype(np.float64)).astype(np.complex64)
            # backward-norm c2r inverts the unnormalized forward
            plan = dist.build_strategy(strat, shape, norm=Norm.BACKWARD,
                                       n_devices=n_dev, kind=kind)
            ref = xr.astype(np.float64)
            got = np.asarray(plan(spec))
        rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)
        assert rel < 1e-4, (trial, kind, shape, strat, rel)
        checked += 1
    assert checked >= 5, f"only {checked} feasible problems drawn"
