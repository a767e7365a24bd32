"""Property-based verification identities (FFTW verify-dft.c analogs) and
the verify_plan golden harness itself."""
import numpy as np
import pytest

import regent_fft_tpu as rft
from regent_fft_tpu.utils import verify
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.plan import PlanSpec, make_plan


@pytest.mark.parametrize("n", [16, 97, 360, 1024])
def test_identities(n):
    # impulse / linearity / time-shift, verify-dft.c:130-174 analog
    fft_fn = lambda x: rft.fft(x)
    assert verify.check_impulse(fft_fn, n, j=3) < verify.tolerance(n)
    assert verify.check_linearity(fft_fn, n) < verify.tolerance(n)
    assert verify.check_shift(fft_fn, n, s=5) < verify.tolerance(n)


@pytest.mark.parametrize("kind,direction", [
    (Kind.C2C, Direction.FORWARD),
    (Kind.C2C, Direction.BACKWARD),
    (Kind.R2C, Direction.FORWARD),
])
def test_verify_plan_golden(kind, direction):
    spec = PlanSpec(shape=(6, 32), axes=(1,), kind=kind, direction=direction,
                    norm=Norm.BACKWARD)
    res = verify.verify_plan(make_plan(spec))
    assert res["ok"], res


def test_verify_plan_3d():
    spec = PlanSpec(shape=(8, 10, 12), axes=(0, 1, 2), kind=Kind.C2C,
                    direction=Direction.FORWARD)
    res = verify.verify_plan(make_plan(spec))
    assert res["ok"], res


def test_random_problem_fuzz():
    # check.pl analog: random (shape, axes, kind, direction) problems.
    rng = np.random.default_rng(123)
    for _ in range(10):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(rng.integers(2, 33)) for _ in range(ndim))
        k = int(rng.integers(1, ndim + 1))
        axes = tuple(sorted(rng.choice(ndim, size=k, replace=False).tolist()))
        direction = Direction.FORWARD if rng.integers(2) else Direction.BACKWARD
        spec = PlanSpec(shape=shape, axes=axes, kind=Kind.C2C, direction=direction)
        res = verify.verify_plan(make_plan(spec), seed=int(rng.integers(1 << 30)))
        assert res["ok"], (spec, res)


@pytest.mark.parametrize("n", [64, 509, 1024])
def test_parseval(n):
    assert verify.check_parseval(lambda x: rft.fft(x), n) < verify.tolerance(n)


def test_random_problem_fuzz_c32_and_r2r():
    """check.pl analog over the round-3 surfaces: complex32 plans
    (pow2 shapes so the bf16 kernel tiles engage in interpret mode)
    and random r2r kinds vs scipy."""
    from scipy import fft as sfft
    from regent_fft_tpu.ops import r2r as r2r_mod
    from regent_fft_tpu.utils.verify import to_numpy_complex

    rng = np.random.default_rng(321)
    for _ in range(4):
        ndim = int(rng.integers(1, 4))
        shape = tuple(int(2 ** rng.integers(4, 8)) for _ in range(ndim))
        direction = (Direction.FORWARD if rng.integers(2)
                     else Direction.BACKWARD)
        spec = PlanSpec(shape=shape, axes=tuple(range(ndim)),
                        kind=Kind.C2C, direction=direction,
                        dtype="complex32")
        plan = make_plan(spec)
        x = (rng.standard_normal(shape)
             + 1j * rng.standard_normal(shape)).astype(np.complex64)
        got = to_numpy_complex(plan(x))
        ref = np.fft.fftn(x.astype(np.complex128))
        if direction == Direction.BACKWARD:
            ref = np.fft.ifftn(x.astype(np.complex128))
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        n_log = int(np.prod(shape))
        assert rel < verify.tolerance(n_log, "complex32"), (spec, rel)

    scipy_fns = {1: sfft.dct, 2: sfft.dct, 3: sfft.dct, 4: sfft.dct}
    for _ in range(6):
        n = int(rng.integers(4, 40))
        b = int(rng.integers(1, 5))
        typ = int(rng.integers(1, 5))
        use_dst = bool(rng.integers(2))
        x = rng.standard_normal((b, n)).astype(np.float32)
        if use_dst:
            got = np.asarray(r2r_mod.dst(x, type=typ))
            ref = sfft.dst(x.astype(np.float64), type=typ)
        else:
            got = np.asarray(r2r_mod.dct(x, type=typ))
            ref = sfft.dct(x.astype(np.float64), type=typ)
        assert np.allclose(got, ref, rtol=3e-5,
                           atol=3e-4 * np.abs(ref).max()), (n, typ, use_dst)
