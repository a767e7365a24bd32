"""Planner factorization unit tests."""
import numpy as np
import pytest

from regent_fft_tpu.ops import factor


def test_prime_factors():
    assert factor.prime_factors(1) == []
    assert factor.prime_factors(2) == [2]
    assert factor.prime_factors(360) == [2, 2, 2, 3, 3, 5]
    assert factor.prime_factors(97) == [97]


@pytest.mark.parametrize("n", [2, 8, 97, 120, 128, 1000, 1024, 4096, 360, 2 * 3 * 5 * 7 * 11])
def test_factorize_products(n):
    f = factor.factorize(n)
    assert f is not None
    assert int(np.prod(f)) == n
    assert all(r <= factor.DEFAULT_MAX_RADIX for r in f)
    assert list(f) == sorted(f, reverse=True)


@pytest.mark.parametrize("n", [131, 509, 2011, 131 * 4])
def test_factorize_large_prime_returns_none(n):
    assert factor.factorize(n) is None


def test_next_fast_len():
    for n in [1, 2, 7, 100, 1023, 2047, 4097, 123457]:
        m = factor.next_fast_len(n)
        assert m >= n
        assert factor.is_smooth(m, 5)
    assert factor.next_fast_len(8) == 8
    assert factor.next_fast_len(9) == 9


def test_plan_factors_dispatch():
    assert factor.plan_factors(64)[0] == "direct"
    assert factor.plan_factors(1024)[0] == "mixed"
    # 131 prime with smooth 130 -> rader (length-130 cyclic convolution)
    assert factor.plan_factors(131) == ("rader", 130)
    # 262 = 2*131: composite with a large prime factor -> bluestein
    kind, m = factor.plan_factors(262)
    assert kind == "bluestein" and m >= 2 * 262 - 1


def test_flops_convention():
    # 5 N log2 N (mflops.c:22-23); halved for real (mflops.c:26-27)
    assert factor.fft_flops_convention(1024) == pytest.approx(5 * 1024 * 10)
    assert factor.fft_flops_convention(1024, real=True) == pytest.approx(2.5 * 1024 * 10)


def test_kernel_pow2_max_matches_kernel_envelope():
    # ADVICE r4: KERNEL_POW2_MAX hand-duplicates the butterfly-kernel
    # length cap; if MAX_LAST_N ever changes, the rader-vs-bluestein
    # engine gate would silently drift from the real kernel envelope.
    from regent_fft_tpu.ops import pallas_stockham
    assert factor.KERNEL_POW2_MAX == pallas_stockham.MAX_LAST_N
