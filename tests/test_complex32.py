"""complex32 (split-bf16) transforms — SURVEY.md hard-parts item 6."""
import numpy as np
import pytest
import jax.numpy as jnp

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import SplitComplex
from regent_fft_tpu.plan import PlanSpec
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.utils.verify import rel_l2, tolerance

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
