"""PlanSpec(precision="high") — the b32 MXU fast tier.

On the einsum path "high" maps to lax.Precision.HIGH; on the kernel
path it scopes the hand-built b32 bf16x3 scheme to the four-step stage
contractions (Mosaic rejects Precision.HIGH, docs/tpu_notes.md
"MXU-tail precision schemes": 512^3 axis-0 9.28 -> 6.62 ms at ~4.4e-6).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.ops import pallas_stockham as ps
from regent_fft_tpu.plan import PlanSpec, make_plan

RNG = np.random.default_rng(23)


def test_a0fs_b32_override_matches_numpy_interpret():
    # the b32 scheme through the four-step ring directly (plans guard
    # the ring to TPU; interpret mode exercises the same trace)
    shape = (64, 8, 128)
    xr = RNG.standard_normal(shape).astype(np.float32)
    xi = RNG.standard_normal(shape).astype(np.float32)
    with ps.precision_override("b32"):
        yr, yi = jax.jit(lambda a, b: ps.fft_axis0_fourstep(
            a, b, 0, Direction.FORWARD, interpret=True))(
                jnp.asarray(xr), jnp.asarray(xi))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi, axis=0)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    # 2-way bf16 split caps accuracy at ~2^-17 data representation
    assert rel < 1e-4, rel


def test_a0fs_highest_still_f32_grade_interpret():
    shape = (64, 8, 128)
    xr = RNG.standard_normal(shape).astype(np.float32)
    xi = RNG.standard_normal(shape).astype(np.float32)
    yr, yi = jax.jit(lambda a, b: ps.fft_axis0_fourstep(
        a, b, 0, Direction.FORWARD, interpret=True))(
            jnp.asarray(xr), jnp.asarray(xi))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi, axis=0)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel


def test_env_key_reflects_override():
    base = ps._env_key()
    with ps.precision_override("b32"):
        assert ps._env_key() == base + "#b32"
        assert ps._a0fs_precision() == "b32"
    assert ps._env_key() == base


def test_precision_high_plan_correct():
    # plan-level: the wrapper must not perturb correctness on any path
    shape = (8, 32, 64)
    x = (RNG.standard_normal(shape)
         + 1j * RNG.standard_normal(shape)).astype(np.complex64)
    p = make_plan(PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.C2C,
                           direction=Direction.FORWARD, norm=Norm.NONE,
                           precision="high"))
    got = np.asarray(p(x))
    ref = np.fft.fftn(x.astype(np.complex128))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4


def test_precision_high_r2c_plan_correct():
    shape = (4, 16, 256)
    x = RNG.standard_normal(shape).astype(np.float32)
    p = make_plan(PlanSpec(shape=shape, axes=(0, 1, 2), kind=Kind.R2C,
                           direction=Direction.FORWARD, norm=Norm.NONE,
                           precision="high", backend="stockham"))
    got = np.asarray(p(x))
    ref = np.fft.rfftn(x.astype(np.float64))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4
