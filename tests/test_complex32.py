"""complex32 (split-bf16) transforms — SURVEY.md hard-parts item 6."""
import numpy as np
import pytest
import jax.numpy as jnp

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import SplitComplex
from regent_fft_tpu.plan import PlanSpec
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.utils.verify import rel_l2, to_numpy_complex, tolerance

RNG = np.random.default_rng(5)


def _split32(x):
    return SplitComplex(jnp.asarray(x.real, jnp.bfloat16),
                        jnp.asarray(x.imag, jnp.bfloat16))


def test_complex32_fft_accuracy():
    n = 256
    x = (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(np.complex64)
    y = rft.fft(_split32(x))
    assert isinstance(y, SplitComplex)
    assert y.re.dtype == jnp.bfloat16
    assert rel_l2(y, np.fft.fft(x)) < tolerance(n, "complex32")


def test_complex32_spec_downgrades_precision():
    spec = PlanSpec(shape=(64,), axes=(0,), kind=Kind.C2C,
                    direction=Direction.FORWARD, dtype="complex32")
    assert spec.precision == "default"
    assert spec.use_3m


def test_complex32_roundtrip():
    n = 128
    x = (RNG.standard_normal((4, n)) + 1j * RNG.standard_normal((4, n))).astype(np.complex64)
    y = rft.ifft(rft.fft(_split32(x)))
    assert rel_l2(y, x) < tolerance(n, "complex32")


def test_complex32_3d():
    x = (RNG.standard_normal((8, 8, 8)) + 1j * RNG.standard_normal((8, 8, 8))).astype(np.complex64)
    y = rft.fftn(_split32(x))
    assert rel_l2(y, np.fft.fftn(x)) < tolerance(512, "complex32")


def test_complex32_large_axis_fourstep_tile():
    """n=1024 exceeds the direct dense-DFT tile cap (512), so bf16
    blocks fall back to the in-VMEM four-step MXU tile — cover that
    branch end-to-end (interpret mode on CPU)."""
    rng = np.random.default_rng(5)
    shape = (32, 1024)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    spec = PlanSpec(shape=shape, axes=(1,), kind=Kind.C2C,
                    direction=Direction.FORWARD, norm=Norm.NONE,
                    dtype="complex32")
    plan = rft.make_plan(spec)
    got = to_numpy_complex(plan(x))
    ref = np.fft.fft(x.astype(np.complex128), axis=1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < tolerance(1024, "complex32"), rel
