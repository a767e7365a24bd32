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

# Largest power-of-two length the Pallas butterfly kernels accept
# (ops/pallas_stockham.py MAX_LAST_N); sizes in this range run ~2.4x the
# einsum path on TPU, which drives the rader-vs-bluestein choice below.
KERNEL_POW2_MAX = 2048


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


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
    """Smallest smooth size >= n for Bluestein padding.

    5-smooth (2^a 3^b 5^c) when max_radix >= 5, 3-smooth when >= 3, else
    powers of two — so the padded size is always smooth w.r.t. the caller's
    radix cap and the inner FFT never recurses into Bluestein.
    """
    if max_radix < 2:
        raise ValueError(f"max_radix must be >= 2, got {max_radix}")
    if n <= 2:
        return max(n, 1)
    best = 1 << (n - 1).bit_length()  # next power of two is always valid
    max_p5 = best if max_radix >= 5 else 1
    max_p3 = best if max_radix >= 3 else 1
    p5 = 1
    while p5 <= max_p5 and p5 < best:
        p35 = p5
        while p35 <= max_p3 * p5 and p35 < best:
            # smallest power of two lifting p35 over n
            q = -(-n // p35)  # ceil
            p2 = 1 << max(0, (q - 1).bit_length())
            cand = p35 * p2
            if n <= cand < best:
                best = cand
            if max_p3 == 1:
                break
            p35 *= 3
        if max_p5 == 1:
            break
        p5 *= 5
    return best


@functools.lru_cache(maxsize=4096)
def prev_fast_len(n: int, max_radix: int = DEFAULT_MAX_RADIX) -> int:
    """Largest smooth size <= n (scipy.fft.prev_fast_len analog).

    Same smoothness convention as :func:`next_fast_len` — sizes fast for
    THIS engine (5-smooth when the radix cap allows, so every axis hits
    the mixed-radix matmul/kernel paths, never Bluestein).
    """
    if n < 1:
        raise ValueError(f"n must be positive, got {n}")
    cap = 5 if max_radix >= 5 else (3 if max_radix >= 3 else 2)
    m = n
    while m > 1:
        if is_smooth(m, cap):
            return m
        m -= 1
    return 1


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


MIN_PALLAS_RADIX = 16


@functools.lru_cache(maxsize=4096)
def pallas_schedule(n: int, max_radix: int = DEFAULT_MAX_RADIX,
                    min_radix: int = MIN_PALLAS_RADIX):
    """Factorization with every factor in [min_radix, max_radix].

    The fused Pallas kernel's inter-stage digit-reversal transposes are
    only efficient (and supported by Mosaic on all backends) when both
    swapped dims are >= ~16, so its schedule excludes tiny radices.  A
    single-stage direct DFT (n <= max_radix) has no transpose and is
    always allowed.  Returns None when no such factorization exists —
    the caller falls back to the XLA matmul path.

    Search: fewest stages, then smallest sum of radices (fewest MXU flops).
    """
    if n < 2:
        return None
    if n <= max_radix:
        return (n,)

    best = None

    def rec(m, partial):
        nonlocal best
        if best is not None and len(partial) >= len(best):
            return
        for f in range(min(max_radix, m), min_radix - 1, -1):
            if m % f:
                continue
            rest = m // f
            if rest == 1:
                cand = tuple(sorted(partial + [f], reverse=True))
                if (best is None or len(cand) < len(best)
                        or (len(cand) == len(best) and sum(cand) < sum(best))):
                    best = cand
            elif rest >= min_radix:
                rec(rest, partial + [f])

    rec(n, [])
    return best


# Wisdom-installed schedule overrides: (n, max_radix) -> factors.
# Populated by the measure-mode autotuner and wisdom import.
_SCHEDULE_OVERRIDES: dict = {}


def set_schedule_override(n: int, factors, max_radix: int = DEFAULT_MAX_RADIX):
    """Pin the radix schedule for a size (autotune / wisdom hook)."""
    factors = tuple(int(f) for f in factors)
    prod = 1
    for f in factors:
        prod *= f
        if f > max_radix:
            raise ValueError(f"factor {f} > max_radix {max_radix}")
    if prod != n:
        raise ValueError(f"product of {factors} != {n}")
    _SCHEDULE_OVERRIDES[(n, max_radix)] = factors


def schedule(n: int, max_radix: int = DEFAULT_MAX_RADIX,
             mode: str = "estimate"):
    """Radix schedule for a smooth size (None if not smooth).

    Modes (FFTW planning-rigor analog — the reference only ever uses
    FFTW_ESTIMATE, ``src/fft.rg:313,319``):
      * estimate — greedy largest-radix-first grouping (no search)
      * model    — native C++ DP over the MXU cost model
        (``native/planner.cc``), Python-greedy fallback if unbuilt
    Wisdom overrides installed via :func:`set_schedule_override` win in
    every mode (that is how measure-mode results are applied).
    """
    ov = _SCHEDULE_OVERRIDES.get((n, max_radix))
    if ov is not None:
        return ov
    if mode == "model":
        try:
            from ..native import planner as _native
            s = _native.best_schedule(n, max_radix)
            if s:
                return tuple(sorted(s, reverse=True))
        except Exception:
            pass
    return factorize(n, max_radix)


def plan_factors(n: int, max_radix: int = DEFAULT_MAX_RADIX,
                 mode: str = "estimate"):
    """Top-level factorization decision:
    ('direct'|'mixed'|'rader'|'bluestein', info).

    * ('direct', n)        — one DFT-matrix matmul (n <= max_radix)
    * ('mixed', factors)   — mixed-radix matmul stages
    * ('rader', n-1)       — prime n with smooth n-1: cyclic convolution of
                             length n-1 (two smooth FFTs, ~half Bluestein's
                             work — ``fftw-3.3.8/dft/rader.c`` analog)
    * ('bluestein', m)     — chirp-z with inner smooth size m >= 2n-1
    """
    if n <= max_radix and (n, max_radix) not in _SCHEDULE_OVERRIDES:
        return ("direct", n)
    factors = schedule(n, max_radix, mode)
    if factors is not None:
        if len(factors) == 1:
            return ("direct", n)
        return ("mixed", factors)
    m = bluestein_pad(n, max_radix)
    if len(prime_factors(n)) == 1 and is_smooth(n - 1, max_radix):
        # Rader vs Bluestein for a prime: Rader does ~half the inner-FFT
        # work, but the ENGINE of each inner FFT dominates on TPU — a
        # pow2 size in butterfly-kernel range runs ~2.4x the einsum
        # mixed-radix path.  Measured p=1009 (BENCH r4): bluestein with
        # m=2048 kernel inners 0.085 ms vs rader's L=1008 einsum 0.156.
        # So prefer Rader only when its convolution length L = n-1 gets
        # the kernel too, or when Bluestein's m does not.
        rader_kernel = _is_pow2(n - 1) and n - 1 <= KERNEL_POW2_MAX
        bluestein_kernel = _is_pow2(m) and m <= KERNEL_POW2_MAX
        if rader_kernel or not bluestein_kernel:
            return ("rader", n - 1)
    return ("bluestein", m)


def bluestein_pad(n: int, max_radix: int = DEFAULT_MAX_RADIX) -> int:
    """Padded inner size for a Bluestein transform of length n.

    Prefers power-of-two padding when it costs <= 20% extra length: pow2
    inner sizes run the TPU butterfly kernel (~2.4x the einsum path,
    docs/tpu_notes.md) and pow2 einsum schedules are no worse elsewhere.
    (FFTW's bluestein.c pads to whatever its planner solves fastest;
    the pow2 preference is this engine's measured equivalent.)
    """
    m = next_fast_len(2 * n - 1, max_radix)
    m2 = 1 << (2 * n - 2).bit_length()
    return m2 if m2 <= 1.2 * m else m
