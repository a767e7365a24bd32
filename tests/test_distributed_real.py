"""Distributed real-input (r2c) and real-output (c2r) slab transforms."""
import numpy as np
import pytest
import jax

from regent_fft_tpu.dtypes import Norm
from regent_fft_tpu.parallel import distributed as dist
from regent_fft_tpu.utils.verify import rel_l2, tolerance

RNG = np.random.default_rng(11)


@pytest.fixture(scope="module", autouse=True)
def _need_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")


def test_slab_r2c_matches_numpy():
    x = RNG.standard_normal((16, 8, 12)).astype(np.float32)
    p = dist.make_plan_slab_r2c((16, 8, 12), norm=Norm.NONE)
    y = p(x)
    ref = np.fft.rfftn(np.asarray(x, np.float64))
    assert rel_l2(y, ref) < tolerance(x.size)


def test_slab_r2c_transposed_out():
    x = RNG.standard_normal((8, 8, 16)).astype(np.float32)
    p = dist.make_plan_slab_r2c((8, 8, 16), norm=Norm.NONE, transposed_out=True)
    y = p(x)
    ref = np.fft.rfftn(np.asarray(x, np.float64))
    assert rel_l2(y, ref) < tolerance(x.size)
    assert p.out_sharding.spec[1] == "fft"


def test_slab_r2c_c2r_roundtrip():
    shape = (16, 8, 12)
    x = RNG.standard_normal(shape).astype(np.float32)
    fwd = dist.make_plan_slab_r2c(shape, norm=Norm.NONE)
    inv = dist.make_plan_slab_c2r(shape, norm=Norm.BACKWARD)
    back = np.asarray(inv(fwd(x)))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < tolerance(x.size)


def test_slab_r2c_c2r_transposed_pair():
    # Two collectives total instead of four (FFTW TRANSPOSED_OUT/IN pairing).
    shape = (8, 8, 8)
    x = RNG.standard_normal(shape).astype(np.float32)
    fwd = dist.make_plan_slab_r2c(shape, norm=Norm.NONE, transposed_out=True)
    inv = dist.make_plan_slab_c2r(shape, norm=Norm.BACKWARD, transposed_in=True)
    back = np.asarray(inv(fwd(x)))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < tolerance(x.size)


def test_slab_r2c_odd_last_axis():
    # The a2a never touches the halved axis, so odd X works.
    x = RNG.standard_normal((8, 8, 9)).astype(np.float32)
    p = dist.make_plan_slab_r2c((8, 8, 9), norm=Norm.NONE)
    assert rel_l2(p(x), np.fft.rfftn(np.asarray(x, np.float64))) < tolerance(x.size)


def test_slab_r2c_shape_validation():
    with pytest.raises(ValueError):
        dist.make_plan_slab_r2c((9, 8, 8))
    with pytest.raises(ValueError):
        dist.make_plan_slab_r2c((8, 16))


def test_pencil_r2c_matches_numpy():
    from regent_fft_tpu.parallel.mesh import make_pencil_mesh
    mesh = make_pencil_mesh((2, 4))
    x = RNG.standard_normal((16, 16, 12)).astype(np.float32)
    p = dist.make_plan_pencil_r2c((16, 16, 12), mesh=mesh, norm=Norm.NONE)
    assert rel_l2(p(x), np.fft.rfftn(np.asarray(x, np.float64))) < tolerance(x.size)
    assert p.out_sharding.spec[0] == ("fy", "fz")


def test_pencil_r2c_c2r_roundtrip():
    from regent_fft_tpu.parallel.mesh import make_pencil_mesh
    mesh = make_pencil_mesh((2, 4))
    x = RNG.standard_normal((8, 8, 10)).astype(np.float32)
    fwd = dist.make_plan_pencil_r2c((8, 8, 10), mesh=mesh, norm=Norm.NONE)
    inv = dist.make_plan_pencil_c2r((8, 8, 10), mesh=mesh, norm=Norm.BACKWARD)
    back = np.asarray(inv(fwd(x)))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < tolerance(x.size)


def test_pencil_r2c_divisibility():
    from regent_fft_tpu.parallel.mesh import make_pencil_mesh
    mesh = make_pencil_mesh((2, 4))
    with pytest.raises(ValueError):
        dist.make_plan_pencil_r2c((12, 16, 8), mesh=mesh)  # 12 % 8 != 0
