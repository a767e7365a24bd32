"""Round-4 distributed capabilities on the 8-device CPU mesh.

The FFTW-MPI features the repo lacked through round 3 (VERDICT r3
"missing" items): rank-1 big-vector 1-D FFT (``mpi/dft-rank1-bigvec.c``),
standalone transpose plans (``mpi/api.c:521-551``), distributed r2r
(``mpi/api.c:687-731``), and howmany-batched distributed plans
(``mpi/api.c:249-304``).
"""
import numpy as np
import pytest
import jax
import scipy.fft as sfft

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Norm
from regent_fft_tpu.parallel import distributed as dist
from regent_fft_tpu.ops.r2r import R2RKind
from regent_fft_tpu.utils.verify import rel_l2, tolerance

RNG = np.random.default_rng(11)


def crand(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


@pytest.fixture(scope="module", autouse=True)
def _need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


# ---------------------------------------------------------------------------
# distributed 1-D (rank-1 big-vector)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [1 << 13, 5184, 1 << 16])
def test_slab_1d_forward(n):
    x = crand(n)
    p = dist.make_plan_slab_1d(n)
    assert rel_l2(p(x), np.fft.fft(x)) < tolerance(n)


def test_slab_1d_large():
    n = 1 << 22  # the "too big for one chip" workload class, scaled down
    x = crand(n)
    p = dist.make_plan_slab_1d(n)
    assert rel_l2(p(x), np.fft.fft(x)) < tolerance(n)


def test_slab_1d_inverse_norm():
    n = 1 << 12
    x = crand(n)
    fwd = dist.make_plan_slab_1d(n)
    inv = dist.make_plan_slab_1d(n, direction=Direction.BACKWARD,
                                 norm=Norm.BACKWARD)
    assert rel_l2(inv(fwd(x)), x) < tolerance(n)


def test_slab_1d_scrambled_roundtrip():
    # FFTW_MPI_SCRAMBLED_OUT -> SCRAMBLED_IN: 2 collectives per direction.
    n = 1 << 12
    x = crand(n)
    fwd = dist.make_plan_slab_1d(n, scrambled_out=True)
    inv = dist.make_plan_slab_1d(n, direction=Direction.BACKWARD,
                                 scrambled_in=True, norm=Norm.BACKWARD)
    assert rel_l2(inv(fwd(x)), x) < tolerance(n)


def test_slab_1d_scrambled_in_forward():
    # forward with SCRAMBLED_IN consumes the scrambled order directly:
    # fwd_scrambled_in(fwd_scrambled_out(x)) == fft(fft(x)) natural.
    n = 1 << 12
    x = crand(n)
    a = dist.make_plan_slab_1d(n, scrambled_out=True, norm=Norm.NONE)
    b = dist.make_plan_slab_1d(n, scrambled_in=True, norm=Norm.NONE)
    assert rel_l2(b(a(x)), np.fft.fft(np.fft.fft(x))) < tolerance(n)


def test_slab_1d_explicit_factors_and_errors():
    n = 1 << 12
    x = crand(n)
    p = dist.make_plan_slab_1d(n, factors=(64, 64))
    assert rel_l2(p(x), np.fft.fft(x)) < tolerance(n)
    with pytest.raises(ValueError):
        dist.make_plan_slab_1d(n, factors=(32, 64))      # R*C != n
    with pytest.raises(ValueError):
        dist.make_plan_slab_1d(n, scrambled_in=True, scrambled_out=True)
    with pytest.raises(ValueError):
        dist.make_plan_slab_1d(2 * 8 + 1)                # P does not divide


def test_slab_1d_auto_dispatch():
    # make_plan_distributed routes rank-1 shapes to the four-step plan.
    n = 1 << 12
    x = crand(n)
    p = dist.make_plan_distributed((n,))
    assert "plan-distrib-1d" in p.description
    assert rel_l2(p(x), np.fft.fft(x)) < tolerance(n)


# ---------------------------------------------------------------------------
# standalone transpose plans
# ---------------------------------------------------------------------------

def test_plan_transpose():
    x = RNG.standard_normal((16, 24)).astype(np.float32)
    tp = rft.make_plan_transpose(16, 24)
    assert np.array_equal(np.asarray(tp(x)), x.T)


def test_plan_transpose_complex():
    x = crand((24, 16))
    tp = rft.make_plan_transpose(24, 16)
    assert np.array_equal(np.asarray(tp(x)), x.T)


def test_plan_many_transpose():
    # howmany-tuple semantics: trailing tuple axis rides along.
    x = RNG.standard_normal((16, 24, 3)).astype(np.float32)
    tp = rft.make_plan_many_transpose(16, 24, 3)
    assert np.array_equal(np.asarray(tp(x)), np.swapaxes(x, 0, 1))


def test_plan_transpose_errors_and_lifecycle():
    with pytest.raises(ValueError):
        rft.make_plan_transpose(9, 24)   # P does not divide n0
    tp = rft.make_plan_transpose(8, 8)
    with pytest.raises(ValueError):
        tp(np.zeros((8, 16), np.float32))
    tp.destroy()
    with pytest.raises(RuntimeError):
        tp(np.zeros((8, 8), np.float32))


def test_transpose_composes_pipeline():
    # The FFTW use case: transpose, per-row work, transpose back.
    x = RNG.standard_normal((16, 32)).astype(np.float32)
    t1 = rft.make_plan_transpose(16, 32)
    t2 = rft.make_plan_transpose(32, 16)
    y = np.asarray(t2(np.asarray(t1(x)) * 2.0))
    assert np.allclose(y, 2.0 * x)


# ---------------------------------------------------------------------------
# distributed r2r
# ---------------------------------------------------------------------------

def test_slab_r2r_dct2_3d():
    x = RNG.standard_normal((16, 12, 24)).astype(np.float32)
    p = rft.make_plan_slab_r2r((16, 12, 24), R2RKind.REDFT10)
    ref = sfft.dctn(x.astype(np.float64), type=2)
    assert rel_l2(p(x), ref) < tolerance(x.size)


def test_slab_r2r_mixed_kinds():
    x = RNG.standard_normal((16, 12, 24)).astype(np.float32)
    p = rft.make_plan_slab_r2r(
        (16, 12, 24), (R2RKind.RODFT10, R2RKind.REDFT10, R2RKind.DHT))
    x64 = x.astype(np.float64)
    ref = sfft.dst(sfft.dct(x64, type=2, axis=1), type=2, axis=0)
    fr = np.fft.fft(ref, axis=2)
    ref = fr.real - fr.imag
    assert rel_l2(p(x), ref) < tolerance(x.size)


def test_slab_r2r_2d_and_transposed_out():
    x = RNG.standard_normal((16, 32)).astype(np.float32)
    p = rft.make_plan_slab_r2r((16, 32), R2RKind.REDFT10,
                               transposed_out=True)
    ref = sfft.dctn(x.astype(np.float64), type=2)
    assert rel_l2(p(x), ref) < tolerance(x.size)


def test_slab_r2r_roundtrip():
    # DCT-II then DCT-III over the mesh = logical-size scaling.
    shape = (16, 8, 16)
    x = RNG.standard_normal(shape).astype(np.float32)
    fwd = rft.make_plan_slab_r2r(shape, R2RKind.REDFT10)
    inv = rft.make_plan_slab_r2r(shape, R2RKind.REDFT01)
    scale = float(np.prod([2 * s for s in shape]))
    assert rel_l2(np.asarray(inv(fwd(x))) / scale, x) < tolerance(x.size)


def test_slab_r2r_errors():
    with pytest.raises(ValueError):
        rft.make_plan_slab_r2r((16,), R2RKind.REDFT10)       # rank 1
    with pytest.raises(ValueError):
        rft.make_plan_slab_r2r((9, 16), R2RKind.REDFT10)     # P ∤ n0
    with pytest.raises(ValueError):
        rft.make_plan_slab_r2r((16, 16),
                               (R2RKind.REDFT10,) * 3)       # kind count
    p = rft.make_plan_slab_r2r((16, 16), R2RKind.REDFT10)
    with pytest.raises(TypeError):
        p(crand((16, 16)))                                   # complex input


# ---------------------------------------------------------------------------
# howmany-batched distributed plans
# ---------------------------------------------------------------------------

def test_slab_howmany():
    x = crand((3, 16, 8, 16))
    p = dist.make_plan_slab((16, 8, 16), howmany=3)
    assert p.global_shape == (3, 16, 8, 16)
    assert rel_l2(p(x), np.fft.fftn(x, axes=(1, 2, 3))) < tolerance(x.size)


def test_slab_howmany_2d():
    x = crand((4, 16, 24))
    p = dist.make_plan_slab((16, 24), howmany=4)
    assert rel_l2(p(x), np.fft.fftn(x, axes=(1, 2))) < tolerance(x.size)


def test_slab_howmany_chunks_transposed():
    x = crand((3, 16, 8, 16))
    p = dist.make_plan_slab((16, 8, 16), howmany=3, pipeline_chunks=2,
                            transposed_out=True)
    assert rel_l2(p(x), np.fft.fftn(x, axes=(1, 2, 3))) < tolerance(x.size)


def test_slab_howmany_transposed_in_roundtrip():
    x = crand((3, 16, 8, 16))
    fwd = dist.make_plan_slab((16, 8, 16), howmany=3, transposed_out=True)
    inv = dist.make_plan_slab((16, 8, 16), howmany=3, transposed_in=True,
                              direction=Direction.BACKWARD,
                              norm=Norm.BACKWARD)
    assert rel_l2(inv(fwd(x)), x) < tolerance(x.size)


def test_pencil_howmany():
    x = crand((2, 8, 16, 8))
    p = dist.make_plan_pencil((8, 16, 8), howmany=2, mesh_shape=(2, 4))
    assert rel_l2(p(x), np.fft.fftn(x, axes=(1, 2, 3))) < tolerance(x.size)


def test_pencil_howmany_chunks_transposed():
    x = crand((2, 8, 16, 8))
    p = dist.make_plan_pencil((8, 16, 8), howmany=2, mesh_shape=(2, 4),
                              pipeline_chunks=2, pipeline_chunks2=2,
                              transposed_out=True)
    assert rel_l2(p(x), np.fft.fftn(x, axes=(1, 2, 3))) < tolerance(x.size)
