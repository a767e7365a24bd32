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
