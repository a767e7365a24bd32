"""Size factorization — the static "planner" core.

FFTW's planner (``/root/reference/fftw-3.3.8/kernel/planner.c``) searches a
solver space dynamically with measurement.  On TPU the schedule is chosen
statically at plan time (XLA compilation is the measurement analog, see
SURVEY.md section 2b "planner kernel" row): we factor N into radices that map
onto MXU-sized matmul stages, and fall back to Bluestein's chirp-z algorithm
(``/root/reference/fftw-3.3.8/dft/bluestein.c`` analog) when N has a prime
factor larger than the direct-DFT threshold.

A native C++ implementation of the same search with a cost model lives in
``regent_fft_tpu/native/planner.cc``; this module is the always-available
fallback and the source of truth for semantics.
"""
from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

# Largest size we implement as a direct O(N^2) DFT matmul (one MXU pass).
# 128 matches the MXU systolic-array edge.
DEFAULT_MAX_RADIX = 128


def prime_factors(n: int) -> List[int]:
    """Prime factorization, smallest first."""
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    out = []
    d = 2
    while d * d <= n:
        while n % d == 0:
            out.append(d)
            n //= d
        d += 1 if d == 2 else 2
    if n > 1:
        out.append(n)
    return out


def is_smooth(n: int, max_prime: int = DEFAULT_MAX_RADIX) -> bool:
    """True if all prime factors of n are <= max_prime."""
    return all(p <= max_prime for p in prime_factors(n))


@functools.lru_cache(maxsize=4096)
def factorize(n: int, max_radix: int = DEFAULT_MAX_RADIX) -> Optional[Tuple[int, ...]]:
    """Factor ``n`` into radices, each <= max_radix, largest first.

    Returns None when ``n`` has a prime factor > max_radix (Bluestein
    territory).  Greedy grouping: multiply small primes together while the
    product stays <= max_radix — this keeps the number of matmul stages
    minimal and each stage's contraction dimension as close to the MXU edge
    as possible.
    """
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    if n == 1:
        return (1,)
    primes = prime_factors(n)
    if primes[-1] > max_radix:
        return None
    # Group greedily from the largest prime down.
    primes.sort(reverse=True)
    factors: List[int] = []
    cur = 1
    for p in primes:
        if cur * p <= max_radix:
            cur *= p
        else:
            factors.append(cur)
            cur = p
    factors.append(cur)
    factors.sort(reverse=True)
    return tuple(factors)


@functools.lru_cache(maxsize=4096)
def next_fast_len(n: int, max_radix: int = DEFAULT_MAX_RADIX) -> int:
    """Smallest 5-smooth (2^a 3^b 5^c) size >= n.

    Used to pad Bluestein convolutions; 5-smooth sizes always factor into
    radices <= 128 so the inner FFT never recurses into Bluestein.
    """
    if n <= 2:
        return max(n, 1)
    best = 1 << (n - 1).bit_length()  # next power of two is always valid
    p5 = 1
    while p5 < best:
        p35 = p5
        while p35 < best:
            # smallest power of two lifting p35 over n
            q = -(-n // p35)  # ceil
            p2 = 1 << max(0, (q - 1).bit_length())
            cand = p35 * p2
            if n <= cand < best:
                best = cand
            p35 *= 3
        p5 *= 5
    return best


def stage_flops(n: int, factors: Tuple[int, ...]) -> int:
    """Real-FLOP count of the matmul-form mixed-radix schedule for size n.

    Each radix-r stage is a complex (n/r, r) x (r, r) matmul: 8*n*r real
    flops, plus 6*n for the twiddle multiply between stages.  This is the
    analog of FFTW's flops accounting (``fftw-3.3.8/api/flops.c``).
    """
    fl = 0
    for i, r in enumerate(factors):
        fl += 8 * n * r
        if i + 1 < len(factors):
            fl += 6 * n
    return fl


def fft_flops_convention(n: int, real: bool = False) -> float:
    """The reporting convention: 5 N log2 N (2.5 for real transforms).

    Matches ``/root/reference/fftw-3.3.8/libbench2/mflops.c:22-27``.  This is
    what benchmarks report regardless of the algorithm's true flop count.
    """
    if n <= 1:
        return 0.0
    base = 5.0 * n * math.log2(n)
    return base / 2 if real else base


def plan_factors(n: int, max_radix: int = DEFAULT_MAX_RADIX):
    """Top-level factorization decision: ('direct'|'mixed'|'bluestein', info).

    * ('direct', n)        — one DFT-matrix matmul (n <= max_radix)
    * ('mixed', factors)   — mixed-radix matmul stages
    * ('bluestein', m)     — chirp-z with inner smooth size m >= 2n-1
    """
    if n <= max_radix:
        return ("direct", n)
    factors = factorize(n, max_radix)
    if factors is not None:
        return ("mixed", factors)
    return ("bluestein", next_fast_len(2 * n - 1, max_radix))
