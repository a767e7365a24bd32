"""Self-sorting Stockham butterfly kernels (VPU path).

The matmul-form kernels (pallas_fft.py) pay the MXU's bf16 precision
passes: f32-accurate products cost 6 MXU passes (HIGHEST), so large-radix
stages are compute-bound.  Butterfly FFTs run on the VPU where f32
multiply-add is NATIVE: ~4.25*N*log2(N) real flops at full precision, no
precision passes at all (SURVEY.md hard-parts item 1 resolved in favor of
planar split re/im + VPU).

The Stockham iteration is chosen for its layout behavior, not just
self-sorting: with the transform axis on SUBLANES as (L, M, lanes),
every stage is

    top/bot = static slices of the middle axis
    butterfly = VPU adds + twiddle multiplies
    recombine = stack on a NEW LEADING axis + leading-dim reshape

None of these touch the lane dimension, which is exactly the set of ops
the Mosaic compiler handles natively (docs/tpu_notes.md layout rules):
no transposes, no gathers, no bit-reversal pass, naturally ordered output.

Kernel core operates on (n, V) blocks — transform axis 0 on sublanes,
vector payload on lanes.  N-D wrappers put any transform axis there via
free host-side reshapes (leading/middle splits only).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..dtypes import Direction
from . import twiddle as _twiddle

# Lane-tile width per kernel instance and per-call operand cap.  Hardware
# bisection (re-bisected mid round 2 — the Mosaic helper's envelope has
# LIFTED since round 1): butterfly blocks up to 256K elements compile
# (512x512 OK, 512x1024 crashes), sublane extents <= 2048 — so both
# mid-axis and last-axis kernels run n <= 2048, and the fused two-axis
# kernel covers (512, 512) blocks.  docs/tpu_notes.md "schedule rankings"
# has the measured timings behind the tile choices below.
LANE_TILE = 128
MAX_BLOCK_ELEMS = 262144   # hardware-validated per-block element cap
MAX_STOCKHAM_N = 2048      # mid-axis (column-tiled) kernels
MAX_LAST_N = 2048          # last-axis kernels (narrower row tiles)
# Per-pallas_call operand cap: calls beyond it split through lax.map,
# which SERIALIZES chunks (no cross-chunk DMA overlap — measured 1.85x
# on 65536x1024 c2c, and 57 -> 37 ms on the 1024^3 complex32 last-axis
# pass, r4).  The round-1 "compiler limits" that set the old 4M value
# no longer reproduce: 2^30-element operands (a full 1024^3 plane pair)
# compile and run at full rate, so the cap only guards anything bigger.
MAX_CALL_ELEMS = 1 << 30



# Env knobs that alter a compiled runner's body; their values join every
# runner factory's cache key so flipping one mid-process builds a fresh
# kernel instead of silently serving the stale cached variant.
_ENV_KNOBS = ("REGENT_FFT_TILE_IMPL", "REGENT_FFT_F2_SCRATCH",
              "REGENT_FFT_F2_STRIPS", "REGENT_FFT_GAP_STRIPS",
              "REGENT_FFT_LAST_STRIPS", "REGENT_FFT_R2C_IMPL",
              "REGENT_FFT_TAIL_PREC", "REGENT_FFT_A0FS_NOC",
              "REGENT_FFT_A0FS_WA", "REGENT_FFT_A0FS_WB",
              "REGENT_FFT_A0FS_VPU", "REGENT_FFT_F2_IMPL",
              "REGENT_FFT_A0FS_PREC", "REGENT_FFT_TAIL_MT",
              "REGENT_FFT_DMA_X", "REGENT_FFT_MXU_IMPL",
              "REGENT_FFT_C2R_IMPL", "REGENT_FFT_F2_PLANES",
              "REGENT_FFT_F2_VMEM_MB", "REGENT_FFT_F2_BODY",
              "REGENT_FFT_F2_TILE", "REGENT_FFT_F2_RING_STRIPS",
              "REGENT_FFT_RADIX8", "REGENT_FFT_R2C_FLIP")


# Per-plan MXU-scheme override stack (see precision_override): lets
# PlanSpec(precision="high") select the b32 four-step scheme for ONE
# plan's trace without mutating process-wide env state.
_PREC_OVERRIDE: list = []


class precision_override:
    """Context manager scoping an a0fs MXU scheme to one plan's trace.

    ``PlanSpec(precision="high")`` wraps its core in
    ``precision_override("b32")``: the measured fast tier (512^3 axis-0
    stage pair 9.28 -> 6.62 ms) at 2-way-bf16-split accuracy (~4.4e-6,
    docs/tpu_notes.md "MXU-tail precision schemes").  Applies only to
    the four-step stage contractions — fused2 tails keep 'highest'
    (b32 there overflows scoped VMEM, same doc).  Runner caches stay
    coherent because :func:`_env_key` folds the override in.
    """

    def __init__(self, scheme: str):
        self.scheme = scheme

    def __enter__(self):
        _PREC_OVERRIDE.append(self.scheme)

    def __exit__(self, *exc):
        _PREC_OVERRIDE.pop()


def _env_key() -> str:
    key = "|".join(os.environ.get(k, "") for k in _ENV_KNOBS)
    if _PREC_OVERRIDE:
        key += "#" + _PREC_OVERRIDE[-1]
    return key


class knob_override:
    """Context manager scoping kernel env knobs to one trace/race.

    The EXHAUSTIVE planner tier races knob settings (TAIL_MT, MXU_IMPL,
    F2_STRIPS, …) against each other in ONE process and pins the winner
    on the plan's executor, which re-enters this context on every call —
    so the winning knobs apply at trace time without mutating global
    state for other plans.  Runner caches stay coherent because every
    runner factory keys on :func:`_env_key`, which reads these knobs;
    table builders (:func:`_packed_tables`) are uncached and re-derive
    from the live knob values.

    Only knobs listed in ``_ENV_KNOBS`` are accepted (anything else
    would silently miss the cache key and serve stale kernels).
    """

    def __init__(self, knobs: dict):
        for k in knobs:
            if k not in _ENV_KNOBS:
                raise ValueError(f"unknown kernel knob {k!r} "
                                 f"(not in _ENV_KNOBS)")
        self.knobs = {k: str(v) for k, v in knobs.items()}
        self._saved = {}

    def __enter__(self):
        for k, v in self.knobs.items():
            self._saved[k] = os.environ.get(k)
            os.environ[k] = v
        return self

    def __exit__(self, *exc):
        for k, old in self._saved.items():
            if old is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = old
        self._saved.clear()


def _tb_for(n: int) -> int:
    """Row-tile height for a last-axis n-point kernel.

    Honest-timer sweep (512^3 pass, v5e): tb=256 is fastest (5.9 ms vs
    6.2 at tb=128, 6.0 at tb=512).  Capped so blocks stay inside the
    validated element envelope; rounded down to a lane multiple (tb
    becomes the lane extent after the in-kernel transpose) for the
    mixed-radix lengths where MAX_BLOCK_ELEMS // n is not already one
    (n=1536 -> 128), falling back to a sublane multiple below 128.
    """
    cap = MAX_BLOCK_ELEMS // n
    tb = cap // 128 * 128 if cap >= 128 else cap // 8 * 8
    return max(8, min(256, tb))


# Largest tail sub-transform finished on the MXU (see _stockham_tile).
# REGENT_FFT_TAIL_MT overrides it (env-keyed runner caches + uncached
# table builders make in-process switching coherent; the EXHAUSTIVE
# planner races it via knob_override).
# 64 (r4): with the h4 tail scheme the 64/256/1024-class sizes drop one
# radix-4 head stage in favor of a wider K=2mt MXU tail — measured
# n=1024 batch 4096 c2c 0.163 -> 0.143 ms, r2c 0.165 -> 0.147
# (scripts/probe_r2c_1d.py); 512-class schedules are unchanged (mt=32
# either way).  128 fails Mosaic compile at 512^2 blocks (tpu_notes).
TAIL_MT = 64


def _tail_mt_cap() -> int:
    import os
    return int(os.environ.get("REGENT_FFT_TAIL_MT", "0")) or TAIL_MT


def _radix8_on() -> bool:
    """Radix-8 head stages for power-of-two lengths (VERDICT r4 #1a:
    cut the butterfly VPU flop count — FFTW ships n1_8/t1_8 codelets for
    the same reason, ``fftw-3.3.8/dft/scalar/codelets/codlist.c``).  One
    radix-8 stage replaces 1.5 radix-4 stages: fewer full-slab VPU
    passes and fewer twiddle multiplies per element; n=512 collapses to
    ONE head stage + a 64-point tail.

    Measured NEUTRAL on v5e (r5 A/B, scripts/probe_radix8.py, honest
    timer): 512^3 fused2 grid 7.86 vs 7.82 ms, ring 8.01 vs 7.82, full
    512^3 plan 15.43 vs 15.51, 1-D 2048x2048 0.158 vs 0.162,
    512x8192 0.138 vs 0.143 — every delta inside the attach's noise
    band.  The head saving is cancelled by the doubled tail MACs (the
    radix-8 plans land on mt=64 where radix-4 lands on mt=32 at n=512),
    confirming the r4 attribution that the heads are NOT flop-bound.
    Default OFF to keep the r4-measured headline configs; the knob stays
    for future hardware where VPU-vs-MXU balance differs.  Split-radix
    (same flop class, irregular slabs = MORE relayout) is ruled out by
    this measurement a fortiori.  In-process switching is coherent
    (env-keyed runner caches; see knob_override)."""
    import os
    return os.environ.get("REGENT_FFT_RADIX8", "0") == "1"


@functools.lru_cache(maxsize=1024)
def _stage_radices_for(n: int, cap: int, r8: bool):
    """Head-stage radices (largest first) leaving an mt-point MXU tail.

    Power-of-two n with radix-8 enabled: minimize the stage count onto
    the largest tail <= cap — a radix-8 stages + b radix-4 stages with
    3a + 2b = log2(n) - log2(tail), maximizing a (each radix-8 stage
    saves half a full-slab VPU pass over its radix-4 expansion).
    Everything else (mixed-radix n = mt*4^s, r8 off): the classic
    divide-by-4 walk."""
    if r8 and n > cap and (n & (n - 1)) == 0:
        k = n.bit_length() - 1
        for j in range(cap.bit_length() - 1, 2, -1):   # tail 2^j, largest
            d = k - j
            if d == 1:          # 3a + 2b = 1 has no solution
                continue
            a = d // 3
            while a >= 0 and (d - 3 * a) % 2:
                a -= 1
            if a >= 0:
                return (8,) * a + (4,) * ((d - 3 * a) // 2)
    radices = []
    m = n
    while m > cap:
        radices.append(4)
        m //= 4
    return tuple(radices)


def _stage_radices(n: int):
    return _stage_radices_for(n, _tail_mt_cap(), _radix8_on())


def _plan_stages(n: int):
    """HEAD butterfly schedule: radix-4 (and radix-8 for pow2 lengths,
    :func:`_radix8_on`) stages while the remaining sub-length exceeds
    TAIL_MT (every head stage keeps its butterfly span h = m/r >= 16,
    i.e. full sublane tiles — the padded sub-8-row stages that used to
    dominate kernel time are gone)."""
    stages = []
    m = n
    for r in _stage_radices(n):
        stages.append((r, m))
        m //= r
    return stages


def _tail_mt(n: int) -> int:
    m = n
    for r in _stage_radices(n):
        m //= r
    return m


def kernel_len_ok(n: int, last: bool) -> bool:
    """Can the butterfly kernels run a length-n axis (ignoring the
    per-axis length cap, which the caller owns)?

    Any power of two (the classic path), or MIXED-RADIX n = mt * 4**s:
    the radix-4 head only needs each stage length divisible by 4 and the
    dense mt-point MXU tail only needs sublane alignment (mt % 8) — the
    tail is a full DFT matrix, so mt is NOT restricted to powers of two
    (same insight as FFTW pairing codelet leaves with generic twiddle
    stages, ``fftw-3.3.8/dft/ct.c``).  Covers 384/640/768/896/1536-class
    sizes at butterfly-kernel speed instead of the einsum mixed-radix
    path (measured n=640 batch 4096: 0.215 -> 0.121 ms).  The last-axis
    runner's in-VMEM transpose additionally needs lane-aligned rows
    (n % 128); mid-axis blocks put n on sublanes (n % 8).
    """
    if n >= 2 and (n & (n - 1)) == 0:
        return True
    if n < 16 or (n % 128 if last else n % 8):
        return False
    cap = _tail_mt_cap()
    m = n
    while m > cap:
        if m % 4:
            return False
        m //= 4
    return m >= 8 and m % 8 == 0


def _packed_tables(n: int, sign: int):
    """Head twiddles + tail DFT matrix packed into TWO operands.

    Returns (wr, wi, offsets) where wr/wi have shape (T + mt, mt):
    rows [0, T) column 0 hold the packed head-stage twiddles
    (W^j | W^2j | W^3j per radix-4 stage), rows [T, T+mt) hold the
    mt-point tail DFT matrix.  One packed pair per (n, sign) keeps the
    kernel operand count at two regardless of stage count (the Mosaic
    grid pipeline crashes with many separate table operands).
    """
    re_parts, im_parts, offsets = [], [], []
    pos = 0
    for r, m in _plan_stages(n):
        h = m // r
        j = np.arange(h, dtype=np.int64)
        offs = []
        for q in range(1, r):
            theta = (2.0 * np.pi * q / m) * j * float(sign)
            re_parts.append(np.cos(theta).astype(np.float32))
            im_parts.append(np.sin(theta).astype(np.float32))
            offs.append((pos, h))
            pos += h
        offsets.append(offs)
    mt = _tail_mt(n)
    head_r = np.zeros((pos, mt), np.float32)
    head_i = np.zeros((pos, mt), np.float32)
    if pos:
        head_r[:, 0] = np.concatenate(re_parts)
        head_i[:, 0] = np.concatenate(im_parts)
    k = np.arange(mt)
    th = 2.0 * np.pi * float(sign) * np.outer(k, k) / mt
    wr = np.concatenate([head_r, np.cos(th).astype(np.float32)], axis=0)
    wi = np.concatenate([head_i, np.sin(th).astype(np.float32)], axis=0)
    return wr, wi, offsets


def _cmul(br, bi, wr, wi):
    return br * wr - bi * wi, br * wi + bi * wr


_SQRT_HALF = 0.7071067811865476


def _bfly_core(q, r: int, s: float):
    """One r-point DFT across r pre-sliced (re, im) slab pairs — the
    butterfly of a self-sorting Stockham stage, un-twiddled (the caller
    applies the stage twiddles to outputs 1..r-1).  Output index k is
    spectral bin k of the r-point DFT (sign s), matching the Stockham
    out[k*L + l] digit order.

    radix-4: 3 adds-layers + one s*i rotation; radix-8 (the FFTW
    n1_8-codelet analog): radix-2 split into even bins = radix-4 of the
    sums and odd bins = rotated differences, costing two sqrt(1/2)
    rotator scalings — ~25% fewer VPU flops per element than the two
    radix-4 stages it replaces, in ONE slab pass instead of two."""
    if r == 4:
        (q0r, q0i), (q1r, q1i), (q2r, q2i), (q3r, q3i) = q
        t0r, t0i = q0r + q2r, q0i + q2i
        t1r, t1i = q0r - q2r, q0i - q2i
        t2r, t2i = q1r + q3r, q1i + q3i
        t3r, t3i = q1r - q3r, q1i - q3i
        it3r, it3i = -s * t3i, s * t3r
        return [(t0r + t2r, t0i + t2i), (t1r + it3r, t1i + it3i),
                (t0r - t2r, t0i - t2i), (t1r - it3r, t1i - it3i)]
    assert r == 8, r
    a = [(q[j][0] + q[j + 4][0], q[j][1] + q[j + 4][1]) for j in range(4)]
    b = [(q[j][0] - q[j + 4][0], q[j][1] - q[j + 4][1]) for j in range(4)]
    e = _bfly_core(a, 4, s)                      # even bins 0, 2, 4, 6
    (b0r, b0i), (b1r, b1i), (b2r, b2i), (b3r, b3i) = b
    ib2r, ib2i = -s * b2i, s * b2r               # s*i * B2
    ur, ui = b0r + ib2r, b0i + ib2i
    vr, vi = b0r - ib2r, b0i - ib2i
    ib3r, ib3i = -s * b3i, s * b3r               # s*i * B3
    pr, pi = b1r + ib3r, b1i + ib3i
    qr_, qi_ = b1r - ib3r, b1i - ib3i
    c = _SQRT_HALF
    # c8 * p with c8 = c*(1 + s*i); c8^3 * q with c8^3 = c*(-1 + s*i)
    cpr, cpi = c * (pr - s * pi), c * (pi + s * pr)
    cqr, cqi = c * (-qr_ - s * qi_), c * (s * qr_ - qi_)
    return [e[0], (ur + cpr, ui + cpi), e[1], (vr + cqr, vi + cqi),
            e[2], (ur - cpr, ui - cpi), e[3], (vr - cqr, vi - cqi)]


def _stockham_tile_flat(xr, xi, n: int, sign: int, wr_all, wi_all):
    """Relayout-minimal variant of :func:`_stockham_tile`.

    The stacked implementation interleaves a ``jnp.stack`` + leading-dim
    reshape after EVERY radix-4 stage; Mosaic turns each into a vector
    relayout.  Here the head stages keep the L sub-problems as a Python
    LIST of (h, v) slabs — butterflies are pure VPU slice/multiply/add
    with no shape changes — and the only relayouts are one stack into
    (L, mt, v) before the batched MXU tail and the final (mt, L, v) ->
    (n, v) merge, identical to the stacked version's last step.
    """
    v = xr.shape[-1]
    s = float(sign)
    _, _, offsets = _packed_tables(n, sign)
    slabs = [(xr, xi)]
    for (r, m), offs in zip(_plan_stages(n), offsets):
        h = m // r
        ws = [(wr_all[st:st + hh, :1], wi_all[st:st + hh, :1])
              for (st, hh) in offs]
        L = len(slabs)
        out = [None] * (r * L)
        for l, (ar, ai) in enumerate(slabs):
            q = [(ar[j * h:(j + 1) * h], ai[j * h:(j + 1) * h])
                 for j in range(r)]
            ys = _bfly_core(q, r, s)
            out[l] = ys[0]
            for k in range(1, r):
                out[k * L + l] = _pair_cmul(ys[k][0], ys[k][1],
                                            ws[k - 1][0], ws[k - 1][1])
        slabs = out
    mt = _tail_mt(n)
    L = len(slabs)
    T = wr_all.shape[0] - mt
    tr = wr_all[T:, :mt]
    ti = wi_all[T:, :mt]
    a3r = jnp.stack([sr for sr, _ in slabs], axis=0)   # (L, mt, v)
    a3i = jnp.stack([si for _, si in slabs], axis=0)
    yr, yi = _dg_3m(tr, ti, a3r, a3i)
    return yr.reshape(n, v), yi.reshape(n, v)


def _pair_cmul(br, bi, wr, wi):
    return (br * wr - bi * wi, br * wi + bi * wr)


def _mxu_split(n: int):
    """Near-square pow2 factorization (n1 <= n2) for the all-MXU tile."""
    n1 = 1 << ((n.bit_length() - 1) // 2)
    return n1, n // n1


def mxu_tile_supported(n: int) -> bool:
    n1, n2 = _mxu_split(n)
    return (n & (n - 1)) == 0 and n1 >= 8 and n2 >= 8 and n >= 64


@functools.lru_cache(maxsize=256)
def _mxu_tables(n: int, sign: int):
    """Packed DFT_n1 / DFT_n2 / inter-factor twiddle planes for
    :func:`_mxu_tile`: rows [0,n1) = W1, [n1,n1+n2) = W2,
    [n1+n2, 2*n1+n2) = twiddle(k1, j2); width max(n1, n2)."""
    n1, n2 = _mxu_split(n)
    w = max(n1, n2)
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    th1 = 2.0 * np.pi * float(sign) * np.outer(k1, k1) / n1
    th2 = 2.0 * np.pi * float(sign) * np.outer(k2, k2) / n2
    tht = 2.0 * np.pi * float(sign) * np.outer(k1, k2) / n

    def pad(a):
        return np.pad(a, ((0, 0), (0, w - a.shape[1])))
    wr = np.concatenate([pad(np.cos(th1)), pad(np.cos(th2)),
                         pad(np.cos(tht))]).astype(np.float32)
    wi = np.concatenate([pad(np.sin(th1)), pad(np.sin(th2)),
                         pad(np.sin(tht))]).astype(np.float32)
    return wr, wi


def _mxu_tile(xr, xi, n: int, sign: int, wr_all, wi_all,
              precision=jax.lax.Precision.DEFAULT):
    """All-MXU in-VMEM four-step FFT over axis 0 of (n, v) values.

    out[k2*n1 + k1] = sum_{j2} W2[k2,j2] * tw[k1,j2]
                      * sum_{j1} W1[k1,j1] x[j1*n2 + j2]
    Two dot_general stages (rhs leading-axis and middle-axis contractions
    — both Mosaic-native) + one broadcast twiddle multiply; zero VPU
    butterflies.  At HIGHEST precision this measured SLOWER than the VPU
    hybrid (r2 negative result: small-matrix f32-emulation passes), but
    at DEFAULT (one bf16 MXU pass) compute collapses ~25x — the
    complex32 fast path (error ~3e-3, within the complex32 tolerance).
    """
    n1, n2 = _mxu_split(n)
    v = xr.shape[-1]
    w1r, w1i = wr_all[:n1, :n1], wi_all[:n1, :n1]
    w2r, w2i = wr_all[n1:n1 + n2, :n2], wi_all[n1:n1 + n2, :n2]
    twr = wr_all[n1 + n2:, :n2]
    twi = wi_all[n1 + n2:, :n2]
    ar = xr.reshape(n1, n2, v)
    ai = xi.reshape(n1, n2, v)

    def dg0(m_, a_):  # contract rhs axis 0 -> (k, n2, v)
        return jax.lax.dot_general(
            m_, a_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def dg1(m_, a_):  # contract rhs axis 1 -> (k, n1, v)
        return jax.lax.dot_general(
            m_, a_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def cdot(dg, mr, mi, vr_, vi_):
        t1 = dg(mr, vr_)
        t2 = dg(mi, vi_)
        t3 = dg(mr + mi, vr_ + vi_)
        return t1 - t2, t3 - t1 - t2

    br, bi = cdot(dg0, w1r, w1i, ar, ai)           # (k1, n2, v)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    dr, di = cdot(dg1, w2r, w2i, cr, ci)           # (k2, n1, v)
    return dr.reshape(n, v), di.reshape(n, v)


def _mxu_tile_fs4m(xr, xi, n: int, sign: int, wr_all, wi_all,
                   precision=jax.lax.Precision.DEFAULT):
    """Four-step like :func:`_mxu_tile` but each complex dot uses the 4M
    shared-rhs fold (the h4 tail trick at DEFAULT): lhs = [M_r | -M_i] /
    [M_i | M_r] against ONE rhs concat [v_r ; v_i].  Karatsuba's three
    full-element VPU combines (t1-t2, t3-t1-t2, vr+vi) become a single
    rhs concat per stage — at bf16 DEFAULT the doubled-K MACs are ~free,
    the VPU passes are not.  Same :func:`_mxu_tables` planes."""
    n1, n2 = _mxu_split(n)
    v = xr.shape[-1]
    w1r, w1i = wr_all[:n1, :n1], wi_all[:n1, :n1]
    w2r, w2i = wr_all[n1:n1 + n2, :n2], wi_all[n1:n1 + n2, :n2]
    twr = wr_all[n1 + n2:, :n2]
    twi = wi_all[n1 + n2:, :n2]
    l1r = jnp.concatenate([w1r, -w1i], axis=1)     # (n1, 2n1)
    l1i = jnp.concatenate([w1i, w1r], axis=1)
    l2r = jnp.concatenate([w2r, -w2i], axis=1)     # (n2, 2n2)
    l2i = jnp.concatenate([w2i, w2r], axis=1)

    def dg0(m_, a_):  # contract rhs axis 0 -> (k, n2, v)
        return jax.lax.dot_general(
            m_, a_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def dg1(m_, a_):  # contract rhs axis 1 -> (k, n1, v)
        return jax.lax.dot_general(
            m_, a_, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    acat = jnp.concatenate([xr.reshape(n1, n2, v),
                            xi.reshape(n1, n2, v)], axis=0)  # (2n1, n2, v)
    br = dg0(l1r, acat)                            # (k1, n2, v)
    bi = dg0(l1i, acat)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    ccat = jnp.concatenate([cr, ci], axis=1)       # (n1, 2n2, v)
    dr = dg1(l2r, ccat)                            # (k2, n1, v)
    di = dg1(l2i, ccat)
    return dr.reshape(n, v), di.reshape(n, v)


@functools.lru_cache(maxsize=64)
def _mxu_tw_tables(n: int, sign: int):
    """Packed planes for :func:`_mxu_tile_tw`: rows [0, n1) = W1
    (width n1), rows [n1, n1 + n1*n2) = the twiddle-folded second-factor
    matrix W2T[k1, k2, j2] = W2[k2, j2] * tw[k1, j2] flattened to
    (k1*n2 + k2, j2) — combined angle 2*pi*sign*j2*(k2/n2 + k1/n)."""
    n1, n2 = _mxu_split(n)
    w = max(n1, n2)
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    j2 = np.arange(n2)
    th1 = 2.0 * np.pi * float(sign) * np.outer(k1, k1) / n1
    # (k1, k2, j2)
    tht = 2.0 * np.pi * float(sign) * (
        k2[None, :, None] * j2[None, None, :] / n2
        + k1[:, None, None] * j2[None, None, :] / n)

    def pad(a):
        return np.pad(a, ((0, 0), (0, w - a.shape[1])))
    wr = np.concatenate([pad(np.cos(th1)),
                         pad(np.cos(tht).reshape(n1 * n2, n2))]
                        ).astype(np.float32)
    wi = np.concatenate([pad(np.sin(th1)),
                         pad(np.sin(tht).reshape(n1 * n2, n2))]
                        ).astype(np.float32)
    return wr, wi


def _mxu_tile_tw(xr, xi, n: int, sign: int, wr_all, wi_all,
                 precision=jax.lax.Precision.DEFAULT):
    """Four-step with the inter-factor twiddle FOLDED into a k1-batched
    stage-2 ``dot_general`` (lhs (n1, n2, 2n2) = [W2T_r | -W2T_i]): the
    full-element VPU complex twiddle pass disappears into table MACs.
    Cost moved instead to one (n1, n2, v) -> (n2, n1, v) transpose of
    the batched output (batch dims lead, the DFT order needs k2 major).
    Tables from :func:`_mxu_tw_tables`."""
    n1, n2 = _mxu_split(n)
    v = xr.shape[-1]
    w1r, w1i = wr_all[:n1, :n1], wi_all[:n1, :n1]
    w2tr = wr_all[n1:, :n2].reshape(n1, n2, n2)    # [k1, k2, j2]
    w2ti = wi_all[n1:, :n2].reshape(n1, n2, n2)
    l1r = jnp.concatenate([w1r, -w1i], axis=1)
    l1i = jnp.concatenate([w1i, w1r], axis=1)
    l2r = jnp.concatenate([w2tr, -w2ti], axis=2)   # (n1, k2, 2n2)
    l2i = jnp.concatenate([w2ti, w2tr], axis=2)

    def dg0(m_, a_):
        return jax.lax.dot_general(
            m_, a_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def dgb(m_, a_):  # batch over k1, contract j2
        return jax.lax.dot_general(
            m_, a_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=precision)

    acat = jnp.concatenate([xr.reshape(n1, n2, v),
                            xi.reshape(n1, n2, v)], axis=0)
    br = dg0(l1r, acat)                            # (k1, j2, v)
    bi = dg0(l1i, acat)
    bcat = jnp.concatenate([br, bi], axis=1)       # (k1, 2n2, v)
    dr = dgb(l2r, bcat)                            # (k1, k2, v)
    di = dgb(l2i, bcat)
    dr = dr.transpose(1, 0, 2)                     # (k2, k1, v)
    di = di.transpose(1, 0, 2)
    return dr.reshape(n, v), di.reshape(n, v)


@functools.lru_cache(maxsize=64)
def _direct_tables(n: int, sign: int):
    """Dense DFT_n matrix planes for :func:`_direct_tile`."""
    k = np.arange(n)
    th = 2.0 * np.pi * float(sign) * np.outer(k, k) / n
    return np.cos(th).astype(np.float32), np.sin(th).astype(np.float32)


def _direct_tile(xr, xi, n: int, sign: int, wr, wi,
                 precision=jax.lax.Precision.DEFAULT):
    """ONE dense DFT_n matmul over axis 0 of (n, v) values — zero
    reshapes/relayouts (the four-step :func:`_mxu_tile` pays sublane
    splits + a twiddle pass).  Only sane at DEFAULT precision (bf16
    one-pass MXU: n^2 MACs are cheaper than the relayouts it removes);
    longer K accumulates more bf16 rounding, so the complex32 error
    grows ~sqrt(n/16)x vs the four-step tile."""
    def dg(m_, a_):
        return jax.lax.dot_general(
            m_, a_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
    t1 = dg(wr, xr)
    t2 = dg(wi, xi)
    t3 = dg(wr + wi, xr + xi)
    return t1 - t2, t3 - t1 - t2


def _mxu_impl() -> str:
    """complex32 block-compute tile: 'direct' (one dense DFT_n dot;
    default — measured 2.8x faster than fourstep at 256^3 AND slightly
    more accurate: one bf16 rounding stage instead of two + twiddle),
    'fourstep' (two 3M short-K dots + VPU twiddle), 'fs4m' (4M
    shared-rhs folds, no Karatsuba combines), or 'fstw' (fs4m stage 1 +
    twiddle-folded batched stage 2)."""
    import os
    return os.environ.get("REGENT_FFT_MXU_IMPL", "direct")


def _tile_impl(io: str, n: int):
    """(tile_fn, tables_fn) per block I/O dtype: bf16 (complex32) blocks
    use an all-MXU DEFAULT tile when the length admits it — the VPU
    butterfly cost doesn't shrink at bf16, the MXU's does.  Direct is
    capped at n=512 (the dense DFT_n table pair costs 8*n^2 bytes of
    VMEM; past that the four-step's packed tables win).  Above the
    direct cap the four-step scheme is selectable (REGENT_FFT_MXU_IMPL):
    'fs4m'/'fstw' trade Karatsuba's full-element VPU combines (and for
    fstw the twiddle pass) for extra MACs, which are ~free at bf16."""
    if io == "bf16" and mxu_tile_supported(n):
        impl = _mxu_impl()
        if impl == "direct" and n <= 512:
            return _direct_tile, _direct_tables
        if impl == "fs4m":
            return _mxu_tile_fs4m, _mxu_tables
        if impl == "fourstep":
            return _mxu_tile, _mxu_tables
        # default above the direct cap: twiddle-folded batched four-step
        # (measured r4: n=1024 last-axis 1.154 -> 0.652 ms vs 'fourstep',
        # mid-axis 1.945 -> 1.055; rel err 5.6e-3 -> 4.7e-3)
        return _mxu_tile_tw, _mxu_tw_tables
    return _stockham_tile, (lambda n_, s_: _packed_tables(n_, s_)[:2])


def _tail_precision() -> str:
    """MXU scheme of the tail contractions: 'h4' (4M shared-rhs fold at
    f32 HIGHEST — two dots at K=2mt; exact f32 accuracy and the default:
    measured 512^3 fused2 9.28 -> 7.96 ms, rel err unchanged at 1.5e-7,
    docs/tpu_notes.md r4), 'highest' (3M Karatsuba, 3 dots at K=mt),
    'b3' (manual bf16x3: split hi/lo, ONE K-concatenated DEFAULT dot per
    product — Mosaic rejects Precision.HIGH so the 3-pass scheme must be
    hand-built), 'b32' (bf16x3 folded into TWO shared-rhs 4M dots), or
    'default' (single bf16 pass, complex32-grade error)."""
    import os
    return os.environ.get("REGENT_FFT_TAIL_PREC", "h4")


def _bf16_hl(x):
    """Exact-leading-bits split x ~= hi + lo into two bf16 planes (the
    classic bf16x3 decomposition: hi carries the top 8 mantissa bits, lo
    the next 8; the dropped lo*lo term is ~2^-16 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bf16_hml(x):
    """3-way split x ~= h + m + l covering the full f32 mantissa (8 bits
    per bf16 plane; keeping products down to weight 2^-16 reproduces
    f32-grade ~1e-7 accuracy — the 'b6' scheme)."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _b6_operands(catm, cata, m3, a3):
    """lhs/rhs K-concats for one b6 product: all hi/mid/lo cross terms
    of weight >= 2^-16 (h*h, h*m, m*h, h*l, m*m, l*h), K = 6*mt."""
    mh, mm, ml = m3
    ah, am, al = a3
    return (catm([mh, mh, mm, mh, mm, ml]),
            cata([ah, am, ah, al, am, ah]))


def _stockham_tile(xr, xi, n: int, sign: int, wr_all, wi_all):
    """Stockham FFT over axis 0 of (n, V) VMEM values: radix-4 VPU head
    stages (butterfly spans >= 16 rows, fully tile-aligned) finished by
    ONE MXU contraction with the mt-point tail DFT matrix.

    The tail of a self-sorting Stockham *is* a plain DFT_mt applied per
    L-block: out[q*L + l] = sum_j DFT[q, j] * a[l, j], and the lhs-matrix
    ``dot_general`` form produces exactly that (q, l, v) row order.  The
    3M (Karatsuba) HIGHEST-precision product keeps f32 accuracy.
    Measured: 10.2 -> 8.3 ms for a full 512^3 axis pass (the sub-tile
    masked stages this replaces cost ~4 ms of unhidden VPU time).

    ``wr_all``/``wi_all`` are the packed (T+mt, mt) planes from
    :func:`_packed_tables`; all slices are static.

    ``REGENT_FFT_TILE_IMPL=flat`` selects the relayout-minimal list-of-
    slabs variant (:func:`_stockham_tile_flat`) for A/B measurement.
    """
    import os
    if os.environ.get("REGENT_FFT_TILE_IMPL") == "flat":
        return _stockham_tile_flat(xr, xi, n, sign, wr_all, wi_all)
    v = xr.shape[-1]
    hr, hi = _stockham_head(xr, xi, n, sign, wr_all, wi_all)
    mt = _tail_mt(n)
    T = wr_all.shape[0] - mt
    ar, ai = _dg_3m(wr_all[T:, :mt], wi_all[T:, :mt], hr, hi)
    return ar.reshape(n, v), ai.reshape(n, v)


@functools.lru_cache(maxsize=256)
def _runner_axis0(n: int, sign: int, vt: int, interpret: bool = False,
                  envkey: str = ""):
    """Kernel over (n, V) arrays: FFT along axis 0, grid over lane tiles.

    Packed twiddle planes enter as two operands with constant index maps
    (kernels cannot capture constants; many separate operands crash the
    grid pipeline).
    """
    wr_np, wi_np, _ = _packed_tables(n, sign)

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        yr, yi = _stockham_tile(xr_ref[:], xi_ref[:], n, sign,
                                wr_ref[:], wi_ref[:])
        yr_ref[:] = yr
        yi_ref[:] = yi

    def run(xr, xi):
        vdim = xr.shape[1]
        bs = pl.BlockSpec((n, vt), lambda j: (0, j), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda j: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(vdim // vt,),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((n, vdim), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * vdim),
                bytes_accessed=4 * n * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


def _odt(io: str):
    return jnp.bfloat16 if io == "bf16" else jnp.float32


def _plane_io(xr, n_second_minor: int = 128) -> str:
    """Kernel block I/O dtype for these planes: 'bf16' when the planes are
    bfloat16 AND the block's second-minor extent meets the bf16 (16, 128)
    min tile; else 'f32'.  bf16 blocks halve HBM bytes on every pass —
    the complex32 fast path (VERDICT r2 weak #3: complex32 was a storage
    format, not a fast path)."""
    return ("bf16" if xr.dtype == jnp.bfloat16 and n_second_minor >= 16
            else "f32")


@functools.lru_cache(maxsize=256)
def _runner_cols(n: int, sign: int, vt: int, scale: float = 1.0,
                 interpret: bool = False, io: str = "f32",
                 envkey: str = ""):
    """Kernel for FFT along the MIDDLE axis of (P, n, V) data.

    The array is viewed 2-D as (P*n, V); 2-D grid (P, V/vt) with block
    (n, vt): block index (i, j) selects rows [i*n, (i+1)*n) — the i-th
    pre-slice — and lane tile j.  No data movement outside the kernel:
    this is the "no normalization copies" mid-axis pass (column-tiled
    grids compile on the current Mosaic; round-1's workaround copies are
    gone).  ``scale`` (static) is fused into the output write — the norm
    multiply costs zero HBM passes.
    """
    tile, tabs = _tile_impl(io, n)
    wr_np, wi_np = tabs(n, sign)
    s = np.float32(scale)
    odt = _odt(io)

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        yr, yi = tile(xr_ref[:].astype(jnp.float32),
                      xi_ref[:].astype(jnp.float32), n, sign,
                      wr_ref[:], wi_ref[:])
        if scale != 1.0:
            yr = yr * s
            yi = yi * s
        yr_ref[:] = yr.astype(odt)
        yi_ref[:] = yi.astype(odt)

    def run(xr, xi):
        """xr, xi: (P*n, V) 2-D views; returns same-shaped planes."""
        rows, vdim = xr.shape
        assert vdim % vt == 0, (vdim, vt)
        p = rows // n
        bs = pl.BlockSpec((n, vt), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(p, vdim // vt),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((rows, vdim), odt)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * vdim * p),
                bytes_accessed=4 * rows * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


# Largest fused 2-axis block (n1 * n2 elements); hardware envelope.
# 512x512 measured: ONE 15.0 ms pass for both trailing axes vs 17.0 ms
# for separate last(9.0) + mid(8.0) passes at 512^3.
MAX_FUSED2_ELEMS = MAX_BLOCK_ELEMS


def _default_strips(n1: int, n2: int) -> int:
    """Strip count for the two-butterfly kernels: cap each butterfly's
    working strip at 64K elements so peak live VPU temporaries leave VMEM
    for the grid pipeline to double-buffer block DMAs.  Measured (512^3,
    v5e, honest timer, r3): whole-block fused2 ran with ~5 ms of UNHIDDEN
    compute (11.7 ms total); strips=4 overlaps it (9.6 ms), strips=2 is
    intermediate (11.0).  Both factor extents must admit >= 128-lane
    strips.  The bf16-emulation tail schemes keep a 3x (b3/b32) or 6x
    (b6/b62) rhs K-concat live per tail contraction, so their strips
    shrink accordingly (measured: b32 at the f32 strip size overflows
    the 16M scoped-VMEM stack by 3.4M at 512^2 blocks)."""
    cap = 65536
    p = _tail_precision()
    if p in ("b3", "b32", "high"):
        cap //= 2
    elif p in ("b6", "b62"):
        cap //= 4
    return _sane_strips(max(1, (n1 * n2) // cap), n1, n2)


def _sane_strips(strips: int, n1: int, n2: int) -> int:
    """Clamp a strip count (incl. env overrides) to one that divides both
    extents into whole >= 128-lane strips — a bad override must degrade
    to fewer strips, never to partially-written output blocks."""
    strips = max(1, min(int(strips), n2 // LANE_TILE, n1 // LANE_TILE))
    while strips > 1 and (n1 % strips or n2 % strips
                          or (n1 // strips) % LANE_TILE
                          or (n2 // strips) % LANE_TILE):
        strips -= 1
    return max(1, strips)


@functools.lru_cache(maxsize=256)
def _runner_fused2(n1: int, n2: int, sign: int, scale: float = 1.0,
                   interpret: bool = False, io: str = "f32",
                   envkey: str = ""):
    """Fused TWO-AXIS FFT kernel over (n1, n2) blocks: one HBM pass for
    both trailing axes.

    Butterfly along axis 0 (n1 on sublanes), in-VMEM 2-D transpose
    (Mosaic-native for both dims >= 16), butterfly along the former lane
    axis (n2), transpose back, write — the 3-D analog of FFTW's
    rank-geq2 solver with the intermediate kept on-chip
    (``fftw-3.3.8/dft/rank-geq2.c``), at half the HBM traffic of two
    separate passes.
    """
    tile1, tabs1 = _tile_impl(io, n1)
    tile2, tabs2 = _tile_impl(io, n2)
    w1r_np, w1i_np = tabs1(n1, sign)
    w2r_np, w2i_np = tabs2(n2, sign)
    s = np.float32(scale)
    odt = _odt(io)
    import os as _os
    use_scratch = _os.environ.get("REGENT_FFT_F2_SCRATCH") == "1"
    strips = _sane_strips(int(_os.environ.get(
        "REGENT_FFT_F2_STRIPS", str(_default_strips(n1, n2)))), n1, n2)
    # planes-per-block: amortizes per-block grid overhead for SMALL
    # (n1, n2) planes — measured at 256^3x4 f32: 1 plane 5.91 ms,
    # 2 planes 5.51, 4 planes 5.39 (4096 one-plane blocks pay ~0.13 us
    # of grid overhead each).  Default 4 within the block envelope.
    pb = max(1, int(_os.environ.get(
        "REGENT_FFT_F2_PLANES",
        str(min(4, MAX_BLOCK_ELEMS // (n1 * n2))))))
    while pb > 1 and pb * n1 * n2 > MAX_BLOCK_ELEMS:
        pb //= 2

    def kernel_strips(xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref,
                      yr_ref, yi_ref, sr, si):
        # Strip-mined variant: each butterfly runs on (n, sw)-lane strips
        # through a VMEM scratch, cutting peak live temporaries ~strips x
        # so the grid pipeline has VMEM left to double-buffer the block
        # DMAs (overlap probe: fused2's compute was ~5 ms UNHIDDEN with
        # whole-block temporaries, docs/tpu_notes.md).
        sw1 = n2 // strips
        for k in range(strips):
            sl = slice(k * sw1, (k + 1) * sw1)
            ar, ai = tile1(xr_ref[:, sl].astype(jnp.float32),
                           xi_ref[:, sl].astype(jnp.float32),
                           n1, sign, w1r_ref[:], w1i_ref[:])
            sr[sl, :] = ar.T
            si[sl, :] = ai.T
        sw2 = n1 // strips
        for k in range(strips):
            sl = slice(k * sw2, (k + 1) * sw2)
            br, bi = tile2(sr[:, sl], si[:, sl], n2, sign,
                           w2r_ref[:], w2i_ref[:])
            if scale != 1.0:
                br = br * s
                bi = bi * s
            yr_ref[sl, :] = br.T.astype(odt)
            yi_ref[sl, :] = bi.T.astype(odt)

    def kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref,
               yr_ref, yi_ref, *scratch):
        # planes per block from the CONCRETE block shape (run() may fall
        # back to one plane when rows don't divide)
        nplanes = xr_ref.shape[0] // n1
        if nplanes > 1:
            # multi-plane block: run the strip body per plane sub-slab
            for p_ in range(nplanes):
                rs = slice(p_ * n1, (p_ + 1) * n1)
                kernel_strips(xr_ref.at[rs], xi_ref.at[rs], w1r_ref,
                              w1i_ref, w2r_ref, w2i_ref, yr_ref.at[rs],
                              yi_ref.at[rs], *scratch)
            return
        if strips > 1:
            kernel_strips(xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref,
                          w2i_ref, yr_ref, yi_ref, *scratch)
            return
        ar, ai = tile1(xr_ref[:].astype(jnp.float32),
                       xi_ref[:].astype(jnp.float32), n1, sign,
                       w1r_ref[:], w1i_ref[:])
        if use_scratch:
            # Force a canonical value layout for the second butterfly by
            # round-tripping the transposed intermediate through VMEM
            # scratch (layout anomaly probe, docs/tpu_notes.md).
            sr, si = scratch
            sr[:] = ar.T
            si[:] = ai.T
            ar, ai = sr[:], si[:]
        else:
            ar, ai = ar.T, ai.T
        br, bi = tile2(ar, ai, n2, sign, w2r_ref[:], w2i_ref[:])
        br, bi = br.T, bi.T
        if scale != 1.0:
            br = br * s
            bi = bi * s
        yr_ref[:] = br.astype(odt)
        yi_ref[:] = bi.astype(odt)

    def run(xr, xi):
        """xr, xi: (P*n1, n2) 2-D views; returns same-shaped planes."""
        rows, vdim = xr.shape
        assert vdim == n2, (vdim, n2)
        pbl = pb if rows % (pb * n1) == 0 else 1
        p = rows // (pbl * n1)
        bs = pl.BlockSpec((pbl * n1, n2), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
        w1s = pl.BlockSpec(w1r_np.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
        w2s = pl.BlockSpec(w2r_np.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
        scratch_shapes = ([pltpu.VMEM((n2, n1), jnp.float32)] * 2
                          if (use_scratch or strips > 1 or pbl > 1)
                          else [])
        # The bf16-emulation tail schemes' K-concat temporaries can push
        # the scoped-VMEM stack past Mosaic's default budget at 512^2
        # blocks (measured 19.4M vs 16M); a raised limit trades pipeline
        # double-buffer headroom for compile legality (probe knob).
        vmem_mb = int(_os.environ.get("REGENT_FFT_F2_VMEM_MB", "0"))
        cparams = (pltpu.CompilerParams(vmem_limit_bytes=vmem_mb << 20)
                   if vmem_mb else None)
        return pl.pallas_call(
            kernel, grid=(p,),
            in_specs=[bs, bs, w1s, w1s, w2s, w2s], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((rows, vdim), odt)] * 2,
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n1 * n2 * np.log2(n1 * n2) * p),
                bytes_accessed=4 * rows * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(w1r_np), jnp.asarray(w1i_np),
          jnp.asarray(w2r_np), jnp.asarray(w2i_np))
    return run


@functools.lru_cache(maxsize=256)
def _runner_cols_tw(n1: int, big_n: int, sign: int, vt: int,
                    interpret: bool = False, envkey: str = ""):
    """Column-tiled mid-axis butterfly with the four-step twiddle
    W_bigN^{k1 * j2} fused into the output write.

    The twiddle is synthesized IN-KERNEL from iotas + cos/sin (j2 =
    global column = program_id(1)*vt + lane), so it costs zero extra HBM
    traffic; the phase k1*j2/big_n < 1 stays exact in f32 for
    big_n <= 2^24.  First stage of the large-N four-step
    (``fftw-3.3.8/dft/ct.c`` re-derived for lane tiling).
    """
    wr_np, wi_np, _ = _packed_tables(n1, sign)
    s2pi = 2.0 * np.pi * float(sign) / float(big_n)
    bp = max(1, LANE_TILE // n1)   # FFT rows per block: keep blocks >=128 rows

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        j = pl.program_id(1)
        k1v = jax.lax.broadcasted_iota(jnp.int32, (n1, vt), 0
                                       ).astype(jnp.float32)
        j2v = jax.lax.broadcasted_iota(jnp.int32, (n1, vt), 1
                                       ).astype(jnp.float32)
        j2v = j2v + (j * vt).astype(jnp.float32)
        th = jnp.float32(s2pi) * k1v * j2v
        tr = jnp.cos(th)
        ti = jnp.sin(th)
        for p in range(bp):
            sl = slice(p * n1, (p + 1) * n1)
            yr, yi = _stockham_tile(xr_ref[sl], xi_ref[sl], n1, sign,
                                    wr_ref[:], wi_ref[:])
            yr_ref[sl] = yr * tr - yi * ti
            yi_ref[sl] = yr * ti + yi * tr

    def run(xr, xi):
        rows, vdim = xr.shape
        p = rows // (bp * n1)
        bs = pl.BlockSpec((bp * n1, vt), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(p, vdim // vt),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((rows, vdim), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int((10 * np.log2(max(n1, 2)) + 8) * rows * vdim),
                bytes_accessed=4 * rows * vdim * 4,
                transcendentals=2 * rows * vdim),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


def _four_step_split(n: int):
    """(n1, n2) for the four-step: n1 >= 8 (sublane tile), n2 <= 2048."""
    n1 = max(8, n // MAX_LAST_N)
    return n1, n // n1


def four_step_supported(n: int) -> bool:
    """Last-axis lengths runnable as cols+twiddle -> last -> swap."""
    if n <= MAX_LAST_N or n & (n - 1):
        return False
    n1, n2 = _four_step_split(n)
    return n1 <= MAX_STOCKHAM_N and LANE_TILE <= n2 <= MAX_LAST_N


def fft_last_four_step(xr, xi, direction: Direction, scale: float = 1.0,
                       interpret: bool = False):
    """FFT along the last axis for 4096 <= n <= 2M (power of two).

    Four-step decomposition n = n1*n2: column-tiled butterfly over n1
    with the inter-factor twiddle fused into its write, last-axis
    butterfly over n2 (norm scale fused), then the single digit-reversal
    transpose of the two sub-axes.  Three HBM passes total vs the
    einsum path's ~4.5 (measured).  Mirrors ``fftw-3.3.8/dft/ct.c``.
    """
    shape = xr.shape
    n = shape[-1]
    if not four_step_supported(n):
        raise ValueError(f"four-step unsupported for n={n}")
    if xr.dtype == jnp.bfloat16:
        # four-step intermediates stay f32 (the twiddle-fused first stage
        # would compound bf16 rounding); endpoints convert.
        yr, yi = fft_last_four_step(xr.astype(jnp.float32),
                                    xi.astype(jnp.float32), direction,
                                    scale, interpret)
        return yr.astype(jnp.bfloat16), yi.astype(jnp.bfloat16)
    n1, n2 = _four_step_split(n)
    sign = int(direction)
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    xr2 = xr.reshape(b * n1, n2)
    xi2 = xi.reshape(b * n1, n2)
    bp = max(1, LANE_TILE // n1)
    padb = ((-b) % bp) * n1
    if padb:
        xr2 = jnp.pad(xr2, ((0, padb), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, padb), (0, 0)))
    vt = min(_vt_cap(n1), n2)
    run1 = _runner_cols_tw(n1, n, sign, vt, interpret, envkey=_env_key())
    ar, ai = run1(xr2, xi2)
    tb = _tb_for(n2)
    pad = (-(b * n1)) % tb
    if pad:
        ar = jnp.pad(ar, ((0, pad), (0, 0)))
        ai = jnp.pad(ai, ((0, pad), (0, 0)))
    run2 = _runner_last(n2, sign, tb, float(scale), interpret,
                        envkey=_env_key())
    br, bi = _chunk_rows_map(run2, ar, ai, tb)
    br = br[:b * n1].reshape(b, n1, n2)
    bi = bi[:b * n1].reshape(b, n1, n2)
    # Output index k = k1 + n1*k2: flatten as (k2, k1).
    yr = jnp.swapaxes(br, 1, 2).reshape(shape)
    yi = jnp.swapaxes(bi, 1, 2).reshape(shape)
    return yr, yi


@functools.lru_cache(maxsize=256)
def _runner_fused2_gap(n1: int, n2: int, sign: int, scale: float = 1.0,
                       interpret: bool = False, io: str = "f32",
                       envkey: str = ""):
    """Fused LEADING-axis + LAST-axis FFT kernel over (n1, n2) blocks.

    The indirect-transpose solver analog
    (``/root/reference/fftw-3.3.8/dft/indirect-transpose.c``): the pass
    that must touch the big-stride leading axis anyway (rows n1 apart by
    the full plane size — the measured ~210-235 GB/s gather floor,
    docs/tpu_notes.md) also transforms the last axis, so the floor is
    paid for TWO axes instead of one and the remaining mid-axis pass
    reads at small stride.  Block (i, j) of the (B*n1, Y*n2) 2-D view
    selects batch row-block i and the (Z, X) plane at y=j.
    """
    w1r_np, w1i_np, _ = _packed_tables(n1, sign)
    w2r_np, w2i_np, _ = _packed_tables(n2, sign)
    s = np.float32(scale)
    odt = _odt(io)
    import os as _os
    strips = _sane_strips(int(_os.environ.get(
        "REGENT_FFT_GAP_STRIPS", str(_default_strips(n1, n2)))), n1, n2)

    def kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, w2r_ref, w2i_ref,
               yr_ref, yi_ref, *scratch):
        if strips > 1:
            sr, si = scratch
            sw1 = n2 // strips
            for k in range(strips):
                sl = slice(k * sw1, (k + 1) * sw1)
                ar, ai = _stockham_tile(xr_ref[:, sl].astype(jnp.float32),
                                        xi_ref[:, sl].astype(jnp.float32),
                                        n1, sign, w1r_ref[:], w1i_ref[:])
                sr[sl, :] = ar.T
                si[sl, :] = ai.T
            sw2 = n1 // strips
            for k in range(strips):
                sl = slice(k * sw2, (k + 1) * sw2)
                br, bi = _stockham_tile(sr[:, sl], si[:, sl], n2, sign,
                                        w2r_ref[:], w2i_ref[:])
                if scale != 1.0:
                    br = br * s
                    bi = bi * s
                yr_ref[sl, :] = br.T.astype(odt)
                yi_ref[sl, :] = bi.T.astype(odt)
            return
        ar, ai = _stockham_tile(xr_ref[:].astype(jnp.float32),
                                xi_ref[:].astype(jnp.float32), n1, sign,
                                w1r_ref[:], w1i_ref[:])
        ar, ai = ar.T, ai.T
        br, bi = _stockham_tile(ar, ai, n2, sign, w2r_ref[:], w2i_ref[:])
        br, bi = br.T, bi.T
        if scale != 1.0:
            br = br * s
            bi = bi * s
        yr_ref[:] = br.astype(odt)
        yi_ref[:] = bi.astype(odt)

    def run(xr, xi):
        """xr, xi: (B*n1, Y*n2) 2-D views; returns same-shaped planes."""
        rows, vdim = xr.shape
        b = rows // n1
        ncols = vdim // n2
        bs = pl.BlockSpec((n1, n2), lambda i, j: (i, j),
                          memory_space=pltpu.VMEM)
        w1s = pl.BlockSpec(w1r_np.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
        w2s = pl.BlockSpec(w2r_np.shape, lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
        scratch_shapes = ([pltpu.VMEM((n2, n1), jnp.float32)] * 2
                          if strips > 1 else [])
        return pl.pallas_call(
            kernel, grid=(b, ncols),
            in_specs=[bs, bs, w1s, w1s, w2s, w2s], out_specs=[bs, bs],
            scratch_shapes=scratch_shapes,
            out_shape=[jax.ShapeDtypeStruct((rows, vdim), odt)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n1 * n2 * np.log2(n1 * n2) * b * ncols),
                bytes_accessed=4 * rows * vdim * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(w1r_np), jnp.asarray(w1i_np),
          jnp.asarray(w2r_np), jnp.asarray(w2i_np))
    return run


def fused_gap_supported(n1: int, n2: int) -> bool:
    """Can (leading, last) axes (n1, n2) run as ONE gap-fused pass?"""
    return fused2_supported(n1, n2)


def fft_axes_gap_stockham(xr, xi, direction: Direction, scale: float = 1.0,
                          interpret: bool = False):
    """FFT along axes -3 and -1 of an N-D split pair in one HBM pass."""
    shape = xr.shape
    if len(shape) < 3:
        raise ValueError("gap-fused pass needs rank >= 3")
    z, y, x = shape[-3], shape[-2], shape[-1]
    if not fused_gap_supported(z, x):
        raise ValueError(f"gap-fused unsupported for axes {(z, x)}")
    sign = int(direction)
    b = int(np.prod(shape[:-3])) if len(shape) > 3 else 1
    run = _runner_fused2_gap(z, x, sign, float(scale), interpret,
                             _plane_io(xr, z), envkey=_env_key())
    yr, yi = run(xr.reshape(b * z, y * x), xi.reshape(b * z, y * x))
    return yr.reshape(shape), yi.reshape(shape)


def _fusable_len(n: int, last: bool) -> bool:
    """Per-axis length gate for the fused trailing-pair kernels: any
    power of two (the classic path), or a mixed-radix kernel length
    (n = mt*4^s) from 128 up — the same floor below which the fused
    direct einsum wins single-axis (plan.py r4 measurements)."""
    if n >= 2 and (n & (n - 1)) == 0:
        return True
    return n >= 128 and kernel_len_ok(n, last)


def fused2_supported(n1: int, n2: int) -> bool:
    """Can the (n1, n2) trailing-axes pair run as ONE fused kernel pass?"""
    return (_fusable_len(n1, False) and _fusable_len(n2, True)
            and n1 * n2 <= MAX_FUSED2_ELEMS
            and n2 >= LANE_TILE          # lanes dim must be a lane tile
            and n1 >= 16 and n2 >= 16)   # in-VMEM transpose legality


def fft_axes2_stockham(xr, xi, direction: Direction, scale: float = 1.0,
                       interpret: bool = False):
    """FFT along the LAST TWO axes of an N-D split pair in one HBM pass."""
    shape = xr.shape
    n1, n2 = shape[-2], shape[-1]
    if not fused2_supported(n1, n2):
        raise ValueError(f"fused2 unsupported for trailing axes {(n1, n2)}")
    sign = int(direction)
    pre = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    run = _runner_fused2(n1, n2, sign, float(scale), interpret,
                         _plane_io(xr, n1), envkey=_env_key())
    yr, yi = run(xr.reshape(pre * n1, n2), xi.reshape(pre * n1, n2))
    return yr.reshape(shape), yi.reshape(shape)


@functools.lru_cache(maxsize=256)
def _runner_last(n: int, sign: int, tb: int, scale: float = 1.0,
                 interpret: bool = False, io: str = "f32",
                 envkey: str = ""):
    """Kernel over (B, n) arrays: FFT along the LAST axis.

    Blocks (tb, n) are transposed IN VMEM (2-D transposes are
    Mosaic-native) so the butterfly core still runs with the transform
    axis on sublanes; transposed back on write.  ``scale`` is fused into
    the write.
    """
    tile, tabs = _tile_impl(io, n)
    wr_np, wi_np = tabs(n, sign)
    s = np.float32(scale)
    odt = _odt(io)
    # Row-group strips: each strip's butterflies are independent, so no
    # scratch is needed; smaller live temporaries let the grid pipeline
    # double-buffer the block DMAs (same reasoning as _default_strips).
    import os as _os
    # strip rows become LANES after the in-kernel transpose, so each
    # strip must keep >= 128 rows
    strips = int(_os.environ.get(
        "REGENT_FFT_LAST_STRIPS",
        str(max(1, min(tb // 128, (tb * n) // 65536)))))
    while strips > 1 and tb % strips:
        strips //= 2
    sb = tb // strips

    def kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
        for t in range(strips):
            rs = slice(t * sb, (t + 1) * sb)
            yr, yi = tile(xr_ref[rs, :].astype(jnp.float32).T,
                          xi_ref[rs, :].astype(jnp.float32).T,
                          n, sign, wr_ref[:], wi_ref[:])
            if scale != 1.0:
                yr = yr * s
                yi = yi * s
            yr_ref[rs, :] = yr.T.astype(odt)
            yi_ref[rs, :] = yi.T.astype(odt)

    def run(xr, xi):
        b = xr.shape[0]
        bs = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wr_np.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(b // tb,),
            in_specs=[bs, bs, ws, ws], out_specs=[bs, bs],
            out_shape=[jax.ShapeDtypeStruct((b, n), odt)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(10 * n * np.log2(n) * b),
                bytes_accessed=4 * b * n * 4, transcendentals=0),
            interpret=interpret,
        )(xr, xi, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


@functools.lru_cache(maxsize=64)
def _runner_axis0_dma(n: int, x: int, ncols: int, sign: int, k: int,
                      scale: float = 1.0, strips: int = 4, pre: int = 1,
                      interpret: bool = False, io: str = "f32",
                      fuse_last: bool = False, envkey: str = ""):
    """Manual K-deep DMA-pipelined LEADING-axis FFT for big-stride reads.

    The automatic grid pipeline sustains only ~190-210 GB/s on the
    axis-0 gather pattern (rows a full plane apart), while a manual ring
    of K in-flight slab DMAs measures ~330 GB/s (scripts/probe_r3.py
    dmadeep; XLA's transpose of the same data sustains ~670, so the old
    "hardware floor" was really Mosaic's 2-deep pipelining).  One kernel
    instance loops over the Y slabs: wait slab i, butterfly it IN PLACE
    (strip-mined to keep temporaries small), DMA it back out, with reads
    running K slabs ahead.  This is the buffered-solver analog of
    ``/root/reference/fftw-3.3.8/dft/buffered.c``.

    Operands stay in ANY (HBM); ``x`` is the slab width in lanes and
    ``ncols`` the number of slabs (= trailing extent // x).

    ``fuse_last`` (plane-slab mode only, ncols == 1): each (n, x) slab
    is a complete trailing-two-axes plane, so the kernel also runs the
    x-point butterfly over the slab's lane axis (in-VMEM transpose,
    strip-mined — the fused2 body) before writing: ONE ring pass for
    both trailing axes with manual K-deep DMA overlap instead of the
    grid pipeline (``fftw-3.3.8/dft/rank-geq2.c`` + ``dft/buffered.c``).
    """
    tile, tabs = _tile_impl(io, n)
    wr_np, wi_np = tabs(n, sign)
    s = np.float32(scale)
    odt = _odt(io)
    import os as _os
    # fused2-ring probe knobs (docs/tpu_notes.md r4): body attribution
    # (noc = valid manual-ring copy floor; bf1/bf2 = one butterfly only,
    # WRONG results, timing attribution only) and tile substitution
    # (mxu = _mxu_tile HIGHEST-3M four-step for both axes; mxu2 = VPU
    # first axis, MXU second — the compute-bound ring is the one context
    # the r2 all-MXU negative did not cover).
    f2_body = _os.environ.get("REGENT_FFT_F2_BODY", "full")
    f2_tile = _os.environ.get("REGENT_FFT_F2_TILE", "auto")
    if fuse_last:
        assert ncols == 1, "fuse_last requires whole-plane slabs"
        strips = _sane_strips(int(_os.environ.get(
            "REGENT_FFT_F2_RING_STRIPS",
            str(max(1, (n * x) // 65536)))), n, x)
        tile2, tabs2 = _tile_impl(io, x)
        w2r_np, w2i_np = tabs2(x, sign)
        if f2_tile in ("mxu", "mxu2") and mxu_tile_supported(x):
            tile2 = functools.partial(_mxu_tile,
                                      precision=jax.lax.Precision.HIGHEST)
            w2r_np, w2i_np = _mxu_tables(x, sign)
        if f2_tile == "mxu" and mxu_tile_supported(n):
            tile = functools.partial(_mxu_tile,
                                     precision=jax.lax.Precision.HIGHEST)
            wr_np, wi_np = _mxu_tables(n, sign)
        if f2_tile in ("fstw", "fstw2") and mxu_tile_supported(x):
            tile2 = functools.partial(_mxu_tile_tw,
                                      precision=jax.lax.Precision.HIGHEST)
            w2r_np, w2i_np = _mxu_tw_tables(x, sign)
        if f2_tile == "fstw" and mxu_tile_supported(n):
            tile = functools.partial(_mxu_tile_tw,
                                     precision=jax.lax.Precision.HIGHEST)
            wr_np, wi_np = _mxu_tw_tables(n, sign)
    sw = x // strips if strips > 1 else x

    def kernel(xr_hbm, xi_hbm, wr_ref, wi_ref, *rest):
        if fuse_last:
            (w2r_ref, w2i_ref, yr_hbm, yi_hbm, vr, vi, ur, ui,
             tsr, tsi, sin_r, sin_i, sout_r, sout_i) = rest
        else:
            (yr_hbm, yi_hbm, vr, vi, ur, ui,
             sin_r, sin_i, sout_r, sout_i) = rest
        # separate in-ring (vr/vi) and out-ring (ur/ui) buffers: no
        # synchronous DMA wait sits between compute steps — out-writes
        # from iteration i are waited only at i+k, just before that out
        # slot is refilled, so slab reads/writes stream K-deep behind the
        # butterflies (the first cut waited each write inline and ran at
        # read+compute+write SERIAL: 12.6 ms vs the grid pipeline's 11.4).
        total = pre * ncols

        def _off(i):
            # slab i covers batch block i // ncols, column block i % ncols
            p_idx = i // ncols if ncols > 1 else i
            c_idx = jax.lax.rem(i, ncols) if ncols > 1 else 0
            if pre == 1:
                return 0, c_idx * x
            return p_idx * n, c_idx * x

        def start_in(slot, i):
            r0, c0 = _off(i)
            pltpu.make_async_copy(
                xr_hbm.at[pl.ds(r0, n), pl.ds(c0, x)], vr.at[slot],
                sin_r.at[slot]).start()
            pltpu.make_async_copy(
                xi_hbm.at[pl.ds(r0, n), pl.ds(c0, x)], vi.at[slot],
                sin_i.at[slot]).start()

        def wait_out(slot, i):
            r0, c0 = _off(i)
            pltpu.make_async_copy(
                ur.at[slot], yr_hbm.at[pl.ds(r0, n), pl.ds(c0, x)],
                sout_r.at[slot]).wait()
            pltpu.make_async_copy(
                ui.at[slot], yi_hbm.at[pl.ds(r0, n), pl.ds(c0, x)],
                sout_i.at[slot]).wait()

        for i in range(min(k, total)):
            start_in(i, i)

        def body(i, _):
            slot = jax.lax.rem(i, k)
            r0, c0 = _off(i)
            pltpu.make_async_copy(
                xr_hbm.at[pl.ds(r0, n), pl.ds(c0, x)], vr.at[slot],
                sin_r.at[slot]).wait()
            pltpu.make_async_copy(
                xi_hbm.at[pl.ds(r0, n), pl.ds(c0, x)], vi.at[slot],
                sin_i.at[slot]).wait()

            @pl.when(i >= k)
            def _():
                wait_out(slot, i - k)
            if fuse_last and f2_body == "noc":
                # manual-ring copy floor (valid, unlike grid copy-only)
                ur[slot] = vr[slot]
                ui[slot] = vi[slot]
            elif fuse_last:
                # both trailing axes on the plane slab: axis-0 strips
                # into the transposed scratch, lane-axis strips out
                for t in range(strips):
                    sl = slice(t * sw, (t + 1) * sw)
                    if f2_body == "bf2":   # attribution: skip butterfly 1
                        tsr[sl, :] = vr[slot, :, sl].astype(jnp.float32).T
                        tsi[sl, :] = vi[slot, :, sl].astype(jnp.float32).T
                        continue
                    fr, fi = tile(vr[slot, :, sl].astype(jnp.float32),
                                  vi[slot, :, sl].astype(jnp.float32),
                                  n, sign, wr_ref[:], wi_ref[:])
                    tsr[sl, :] = fr.T
                    tsi[sl, :] = fi.T
                sw2 = n // strips
                for t in range(strips):
                    sl = slice(t * sw2, (t + 1) * sw2)
                    if f2_body == "bf1":   # attribution: skip butterfly 2
                        br, bi = tsr[:, sl], tsi[:, sl]
                    else:
                        br, bi = tile2(tsr[:, sl], tsi[:, sl], x, sign,
                                       w2r_ref[:], w2i_ref[:])
                    if scale != 1.0:
                        br = br * s
                        bi = bi * s
                    ur[slot, sl, :] = br.T.astype(odt)
                    ui[slot, sl, :] = bi.T.astype(odt)
            else:
                for t in range(strips):
                    sl = slice(t * sw, (t + 1) * sw)
                    fr, fi = tile(vr[slot, :, sl].astype(jnp.float32),
                                  vi[slot, :, sl].astype(jnp.float32),
                                  n, sign, wr_ref[:], wi_ref[:])
                    if scale != 1.0:
                        fr = fr * s
                        fi = fi * s
                    ur[slot, :, sl] = fr.astype(odt)
                    ui[slot, :, sl] = fi.astype(odt)
            pltpu.make_async_copy(
                ur.at[slot], yr_hbm.at[pl.ds(r0, n), pl.ds(c0, x)],
                sout_r.at[slot]).start()
            pltpu.make_async_copy(
                ui.at[slot], yi_hbm.at[pl.ds(r0, n), pl.ds(c0, x)],
                sout_i.at[slot]).start()

            @pl.when(i + k < total)
            def _():
                start_in(slot, i + k)
            return 0

        jax.lax.fori_loop(0, total, body, 0)
        # drain the last k out-writes
        for j in range(min(k, total)):
            i = total - min(k, total) + j
            wait_out(i % k, i)

    def run(xr2, xi2):
        """xr2, xi2: (pre*n, ncols*x) 2-D views."""
        tabs_ops = [jnp.asarray(wr_np), jnp.asarray(wi_np)]
        scratch = [
            pltpu.VMEM((k, n, x), odt),
            pltpu.VMEM((k, n, x), odt),
            pltpu.VMEM((k, n, x), odt),
            pltpu.VMEM((k, n, x), odt),
        ]
        if fuse_last:
            tabs_ops += [jnp.asarray(w2r_np), jnp.asarray(w2i_np)]
            scratch += [pltpu.VMEM((x, n), jnp.float32)] * 2
        scratch += [pltpu.SemaphoreType.DMA((k,))] * 4
        lg = np.log2(n * x) if fuse_last else np.log2(n)
        return pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tabs_ops),
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_shape=[jax.ShapeDtypeStruct((pre * n, ncols * x),
                                            odt)] * 2,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=int(10 * lg * pre * n * ncols * x),
                bytes_accessed=4 * pre * n * ncols * x * 4,
                transcendentals=0),
            interpret=interpret,
        )(xr2, xi2, *tabs_ops)
    return run


def _dma_slab_x(n: int, post: int, io: str = "f32") -> int:
    """Slab lane width for the manual-DMA ring: the WHOLE trailing
    extent when the (n, post) slab fits the VMEM envelope — then every
    slab is ONE contiguous n*post*4-byte run (the mid-axis "plane slab"
    mode: both ring sides stream at the contiguous rate instead of the
    small-run strided floor) — else 512-lane column slabs.  bf16 slabs
    (complex32) double the lane count when the envelope admits it: the
    strided floor is a contiguous-RUN-SIZE effect (docs/tpu_notes.md
    round-3 late findings), so equal-BYTE runs need 2x the bf16 lanes."""
    import os
    ov = int(os.environ.get("REGENT_FFT_DMA_X", "0"))
    if ov:
        return ov if post % ov == 0 else 512
    if post <= 2048 and n * post <= MAX_BLOCK_ELEMS and post % 128 == 0:
        return post
    if (io == "bf16" and post % 1024 == 0
            and n * 1024 <= MAX_BLOCK_ELEMS):
        return 1024
    return 512


def axis0_dma_supported(n: int, post: int) -> bool:
    """Can the manual-DMA leading/mid-axis runner handle (n, post)
    planes?  Two slab modes: strided 512-lane columns (big post) or
    whole contiguous (n, post) planes (post <= 2048)."""
    if not (16 <= n <= MAX_STOCKHAM_N and _fusable_len(n, False)):
        return False
    if post % 512 == 0 and post >= 2048 and (n * 512) <= MAX_BLOCK_ELEMS:
        return True
    # plane-slab mode: the whole (n, post) extent is one slab, so the
    # column width always divides (post > 2048 with post % 512 != 0
    # would leave ncols * x != post and fail at trace time)
    return (post % 128 == 0 and 128 <= post <= 2048
            and n * post <= MAX_BLOCK_ELEMS)


def fft_axis_dma(xr, xi, axis: int, direction: Direction,
                 scale: float = 1.0, k: int = 2, interpret: bool = False):
    """FFT along ``axis`` (any leading/mid axis) via the manual K-deep
    DMA ring (TPU only); trailing batch dims fold into the slab columns,
    leading batch dims into the ring's slab schedule."""
    shape = xr.shape
    axis = axis % xr.ndim
    n = shape[axis]
    pre = int(np.prod(shape[:axis])) if axis else 1
    post = int(np.prod(shape[axis + 1:]))
    if not axis0_dma_supported(n, post):
        raise ValueError(f"axis-dma unsupported for {shape} axis {axis}")
    io = _plane_io(xr, n)
    x = _dma_slab_x(n, post, io)
    ncols = post // x
    run = _runner_axis0_dma(n, x, ncols, int(direction), k, float(scale),
                            pre=pre, interpret=interpret,
                            io=io, envkey=_env_key())
    yr, yi = run(xr.reshape(pre * n, post), xi.reshape(pre * n, post))
    return yr.reshape(shape), yi.reshape(shape)


# kept name for the probe script / external callers
def fft_axis0_dma(xr, xi, direction: Direction, scale: float = 1.0,
                  k: int = 2):
    return fft_axis_dma(xr, xi, 0, direction, scale, k)


def fused2_ring_supported(n1: int, n2: int) -> bool:
    """Can the manual plane-ring run BOTH trailing axes in one pass?
    Needs a whole (n1, n2) plane per slab plus the fused2 tile limits."""
    return (n1 >= 16 and n2 >= LANE_TILE
            and _fusable_len(n1, False) and _fusable_len(n2, True)
            and n1 <= MAX_STOCKHAM_N and n2 <= MAX_STOCKHAM_N
            and n1 * n2 <= MAX_BLOCK_ELEMS)


def fft_axes2_ring(xr, xi, direction: Direction, scale: float = 1.0,
                   k: int = 2, interpret: bool = False):
    """Fused FFT over the trailing TWO axes as ONE manual K-deep DMA-ring
    pass over whole (n1, n2) plane slabs (see ``fuse_last`` in
    :func:`_runner_axis0_dma`).  Ring alternative to the grid-pipelined
    :func:`fft_axes2_stockham`."""
    shape = xr.shape
    n1, n2 = shape[-2], shape[-1]
    if not fused2_ring_supported(n1, n2):
        raise ValueError(f"fused2-ring unsupported for {shape}")
    pre = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    run = _runner_axis0_dma(n1, n2, 1, int(direction), k, float(scale),
                            pre=pre, interpret=interpret,
                            io=_plane_io(xr, n1), fuse_last=True,
                            envkey=_env_key())
    yr, yi = run(xr.reshape(pre * n1, n2), xi.reshape(pre * n1, n2))
    return yr.reshape(shape), yi.reshape(shape)


def _a0fs_split(n: int):
    """Near-square pow2 split (r1 <= r2) for the two-pass leading-axis
    four-step: stage A transforms over r1 rows spaced r2 apart, stage B
    over r2 contiguous-group rows."""
    r1 = 1 << ((n.bit_length() - 1) // 2)
    return r1, n // r1


def _a0fs_g(r: int, x: int, mid: int, env: str, k: int = 2,
            io: str = "f32") -> int:
    """Row-group size g of a four-step stage slab (r, g, x): the DMA
    moves g*x*4-byte contiguous runs (the whole point — the measured
    "strided floor" is a function of the contiguous run size: 2 KB runs
    sustain ~225 GB/s, 32-64 KB runs ~660-700, docs/tpu_notes.md), so g
    is as large as the VMEM slab budget allows.  g stays a multiple of 8
    dividing ``mid`` so the 5-D operand view splits the array's
    second-minor dim ON (8, 128)-tile boundaries — any other view shape
    makes XLA materialize a relayout copy per pass boundary (measured:
    +9.7 ms at 512^3 for (…, 8, 2048)-minor views).  bf16 slabs double
    the element budget (equal-BYTE scratch; the run-size floor is a
    byte effect) and prefer multiples of 16 — the bf16 native tile's
    second-minor — falling back to 8-multiples when 16 doesn't divide."""
    import os
    budget = MAX_BLOCK_ELEMS * 2 // max(2, k)   # 4 ring buffers x k slabs
    if io == "bf16":
        budget *= 2
    if _a0fs_precision() in ("b6", "b62"):
        # 3-way (h/m/l) splits keep a 6x-slab bf16 rhs concat live in
        # scoped VMEM; halve the slab or the kernel stack OOMs (measured:
        # 16.41M vs the 16M scoped limit at g=32, x=512)
        budget //= 2
    want = int(os.environ.get(env, "0")) or (budget // (r * x))
    for step in ((16, 8) if io == "bf16" else (8,)):
        g = max(step, min(want, mid) // step * step)
        while g > step and mid % g:
            g -= step
        if mid % g == 0:
            return g
    return g


def _a0fs_k_auto(r1: int, r2: int, x: int) -> int:
    """bf16 (complex32) ring depth (scripts/probe_a0fs_k.py, r5).

    The deeper K=3 ring helps exactly when the K=2 slabs are already
    budget-NARROW (the pass is DMA-latency-bound): 512^3 has K=2 slabs
    of g=32 rows and measures 7.90 -> 7.37 ms at K=3.  Where the K=2
    budget grants wide slabs the deeper ring only shrinks them —
    4x256^3 (g=128 at K=2) measured 2.93 -> 3.06, so wide-slab shapes
    keep K=2.  And shapes whose K=3 budget would force g < 16 MUST keep
    K=2: _a0fs_g clamps bf16 slabs UP to 16 rows (the (16, 128) min
    tile), so the deeper ring overflows scratch VMEM instead — measured
    compile failure at 1024^3 (budget grants g=10, clamp makes 16,
    3 slabs don't fit)."""
    b2 = MAX_BLOCK_ELEMS * 2 // 2 * 2       # k=2 slabs, bf16 doubling
    b3 = MAX_BLOCK_ELEMS * 2 // 3 * 2
    narrow = min(b2 // (r1 * x), b2 // (r2 * x)) <= 32
    fits = b3 // (r1 * x) >= 16 and b3 // (r2 * x) >= 16
    return 3 if narrow and fits else 2


def axis0_fourstep_supported(n: int, post: int, x: int) -> bool:
    """Can the two-pass four-step handle a leading axis of length n over
    arrays whose trailing (minor) dim is x?"""
    if n & (n - 1) or n < 64:
        return False
    r1, r2 = _a0fs_split(n)
    mid = post // x if x else 0
    return (r1 >= 8 and 8 <= r2 <= 64
            and x % 128 == 0 and 128 <= x <= 2048
            and post % x == 0 and mid >= 8 and mid % 8 == 0)


def axis0_fourstep_hd(n: int) -> bool:
    """True when BOTH four-step stages of a bf16 (complex32) leading
    axis run the 'hd' native-bf16 stage dots (r >= 16 each — the folded
    K = 2r stays at/above Mosaic's K >= 32 layout-inference floor).
    Where this holds, two wide-run passes at ONE bf16 MXU pass per dot
    beat the single-pass DMA ring's halved bytes AND the grid
    butterfly's small-run strided floor (measured r5: 4x256^3 ring 3.84
    vs fourstep 2.93 ms; 512^3 11.51 vs 7.77; 1024^3 grid 90.2 vs
    67.2)."""
    r1, r2 = _a0fs_split(n)
    return r1 >= 16 and r2 >= 16


@functools.lru_cache(maxsize=64)
def _dft_mat(r: int, sign: int):
    """Direct (r, r) DFT matrix, f64-generated, split planes."""
    k = np.arange(r)
    th = 2.0 * np.pi * float(sign) * np.outer(k, k) / r
    return np.cos(th).astype(np.float32), np.sin(th).astype(np.float32)


@functools.lru_cache(maxsize=64)
def _a0fs_tw_mats(n: int, sign: int):
    """(r2, r1, r1) twiddle-folded stage-a matrices for the leading-axis
    four-step: M_b[k,j] = W_r1[k,j] * W_n^{k*b} = diag(tw_b) @ W_r1.
    The four-step twiddle depends only on the OUTPUT row k and the slab
    index b, so it rides the contraction's lhs — same K, zero extra
    MACs, and the full-slab VPU complex-twiddle pass disappears (the
    fstw discovery applied at f32: here the fold does not even raise the
    dot count).  f64-generated (more exact than the in-kernel f32
    cos/sin synthesis it replaces)."""
    r1, r2 = _a0fs_split(n)
    k = np.arange(r1)
    b = np.arange(r2)
    th = 2.0 * np.pi * float(sign) * (
        np.outer(k, k)[None, :, :] / r1
        + b[:, None, None] * k[None, :, None] / n)
    return np.cos(th).astype(np.float32), np.sin(th).astype(np.float32)


def _a0fs_precision() -> str:
    """MXU scheme of the four-step stage contractions — same options as
    :func:`_tail_precision` (Mosaic rejects Precision.HIGH; the 3-pass
    bf16x3 scheme is hand-built as 'b3'/'b32').  A live
    :class:`precision_override` (PlanSpec(precision="high")) wins over
    the env knob."""
    import os
    if _PREC_OVERRIDE:
        return _PREC_OVERRIDE[-1]
    # h4 default: 4M shared-rhs fold at f32 HIGHEST — measured 512^3
    # a0fs 9.21 -> 7.18 ms at rel err 1.25e-7 (docs/tpu_notes.md r4).
    return os.environ.get("REGENT_FFT_A0FS_PREC", "h4")


def _dg0_3m(mr, mi, ar, ai, scheme: str | None = None):
    """Complex contraction of an (r, r) matrix with (r, 8, w) slabs over
    the LEADING rhs axis (Mosaic-native; see _mxu_tile.dg0), scheme per
    :func:`_a0fs_precision` (or the explicit ``scheme`` override).  In
    the b3/b32 schemes the rhs hi/lo terms concatenate along the UNTILED
    leading axis — near-free in vregs — while K triples/sextuples,
    fixing the tiny-K MXU underutilization of the (r, r) stage matmuls.

    Scheme 'hd' (bf16 block I/O only): the h4 shared-rhs 4M fold issued
    at DEFAULT precision directly on the bf16 slabs — ONE bf16 MXU pass
    per dot, tables cast to the rhs dtype (the fstw lesson applied to
    the four-step stages: at complex32 accuracy the stage dots should
    cost bf16 MACs, not f32-emulation passes)."""
    p = scheme or _a0fs_precision()
    if p == "h4" and mr.shape[1] < 32:
        # Mirror _dg_3m's guard: Mosaic fails layout inference on the
        # K=2r fold below K=32 (measured at mt=16 on the tail form, same
        # fold shape); axis0_fourstep_supported admits n=64 (r1=r2=8,
        # folded K=16), a regime the 512^3 hardware validation (r=16/32)
        # never exercised.  Small stages keep the exact 3M form.
        p = "highest"
    catm = functools.partial(jnp.concatenate, axis=-1)
    cata = functools.partial(jnp.concatenate, axis=0)

    def dg(m_, a_, prec):
        return jax.lax.dot_general(
            m_, a_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    if p in ("highest", "default"):
        prec = (jax.lax.Precision.HIGHEST if p == "highest"
                else jax.lax.Precision.DEFAULT)
        t1 = dg(mr, ar, prec)
        t2 = dg(mi, ai, prec)
        t3 = dg(mr + mi, ar + ai, prec)
        return t1 - t2, t3 - t1 - t2
    if p == "h4":
        # 4M shared-rhs fold at f32 HIGHEST (see _dg_3m 'h4'): two dots
        # at K=2r instead of 3M's three at K=r — exact f32 accuracy.
        rhs = cata([ar, ai])
        yr = dg(catm([mr, -mi]), rhs, jax.lax.Precision.HIGHEST)
        yi = dg(catm([mi, mr]), rhs, jax.lax.Precision.HIGHEST)
        return yr, yi
    if p == "hd":
        # bf16 slabs: same fold, ONE DEFAULT (native bf16 MXU) pass per
        # dot; f64-generated tables round once to the rhs dtype.
        dt = ar.dtype
        rhs = cata([ar, ai])
        yr = dg(catm([mr, -mi]).astype(dt), rhs, None)
        yi = dg(catm([mi, mr]).astype(dt), rhs, None)
        return yr, yi
    if p == "b6":
        lr1, rr1 = _b6_operands(catm, cata, _bf16_hml(mr), _bf16_hml(ar))
        li1, ri1 = _b6_operands(catm, cata, _bf16_hml(mi), _bf16_hml(ai))
        ls1, rs1 = _b6_operands(catm, cata, _bf16_hml(mr + mi),
                                _bf16_hml(ar + ai))
        t1 = dg(lr1, rr1, None)
        t2 = dg(li1, ri1, None)
        t3 = dg(ls1, rs1, None)
        return t1 - t2, t3 - t1 - t2
    if p == "b62":
        lr6, rr6 = _b6_operands(catm, cata, _bf16_hml(mr), _bf16_hml(ar))
        li6, ri6 = _b6_operands(catm, cata, _bf16_hml(mi), _bf16_hml(ai))
        rhs = cata([rr6, ri6])
        yr = dg(catm([lr6, -li6]), rhs, None)
        yi = dg(catm([li6, lr6]), rhs, None)
        return yr, yi
    arh, arl = _bf16_hl(ar)
    aih, ail = _bf16_hl(ai)
    mrh, mrl = _bf16_hl(mr)
    mih, mil = _bf16_hl(mi)
    if p in ("b3", "high"):
        msh, msl = _bf16_hl(mr + mi)
        ash, asl = _bf16_hl(ar + ai)
        t1 = dg(catm([mrh, mrh, mrl]), cata([arh, arl, arh]), None)
        t2 = dg(catm([mih, mih, mil]), cata([aih, ail, aih]), None)
        t3 = dg(catm([msh, msh, msl]), cata([ash, asl, ash]), None)
        return t1 - t2, t3 - t1 - t2
    assert p == "b32", p
    rhs = cata([arh, arl, arh, aih, ail, aih])
    yr = dg(catm([mrh, mrh, mrl, -mih, -mih, -mil]), rhs, None)
    yi = dg(catm([mih, mih, mil, mrh, mrh, mrl]), rhs, None)
    return yr, yi


@functools.lru_cache(maxsize=64)
def _runner_a0fs(stage: str, n: int, r1: int, r2: int, g: int, x: int,
                 nc: int, pre: int, sign: int, k: int,
                 scale: float = 1.0, interpret: bool = False,
                 io: str = "f32", envkey: str = ""):
    """One stage of the two-pass leading-axis four-step, as a manual
    K-deep DMA ring (same deferred-wait ring as :func:`_runner_axis0_dma`).

    The single-pass leading-axis kernels read/write rows of only a few
    hundred bytes at full-plane stride and sit on the measured ~225 GB/s
    small-run floor.  Splitting n = r1 * r2 into two passes makes every
    DMA run g*x*4 bytes (tens of KB) contiguous: slabs are (r, g, x)
    cuts of a 5-D view whose int-indexed dims are UNTILED leading axes
    (Mosaic rejects sub-8 slices of tiled dims) and whose (g, x)
    trailing pair preserves the array's natural minor dim x and splits
    its second-minor on an (8,)-tile boundary, so every reshape at the
    pass interfaces is a free bitcast (see :func:`_a0fs_g`):

    stage "a": view (pre*r1, r2, mid/g, g, x); slab [p*r1:+r1, b, c] =
        rows spaced r2 apart; r1-point DFT over the slab's leading axis
        (``dot_general`` per :func:`_a0fs_precision` — leading-axis
        contraction of a 3-D operand is Mosaic-native); the four-step
        twiddle W_n^{k1 * b} is FOLDED into the per-slab lhs matrix
        (diag(tw_b) @ W_r1, :func:`_a0fs_tw_mats` — same K, no VPU
        twiddle pass); written back to the SAME rows.
    stage "b": view (pre*n, mid/g, g, x); slab [p*n + k1*r2:+r2, c] =
        one contiguous group, r2-point DFT over the leading axis; rows
        written to the 5-D view (pre*r2, r1, mid/g, g, x) at
        [p*r2:+r2, k1, c] — the digit-reversal transpose of the
        four-step absorbed into the strided write, so the output is in
        natural order.

    This is the transposed-intermediate solver FFTW ships as
    ``dft/indirect-transpose.c`` + the MPI rank-1 big-vector scheme
    (``mpi/dft-rank1-bigvec.c``), re-shaped for DMA run granularity.
    """
    r = r1 if stage == "a" else r2
    if stage == "a":
        # twiddle-folded per-slab matrices (see _a0fs_tw_mats)
        wr_np, wi_np = _a0fs_tw_mats(n, sign)
    else:
        wr_np, wi_np = _dft_mat(r, sign)
        if scale != 1.0:
            # fold the norm scale into the f64-generated stage-b matrix
            wr_np = (wr_np.astype(np.float64) * scale).astype(np.float32)
            wi_np = (wi_np.astype(np.float64) * scale).astype(np.float32)
    odt = _odt(io)
    per = (r2 if stage == "a" else r1) * nc

    def kernel(xr_hbm, xi_hbm, wr_ref, wi_ref, yr_hbm, yi_hbm,
               vr, vi, ur, ui, sin_r, sin_i, sout_r, sout_i):
        total = pre * per

        def _idx(i):
            p = i // per if pre > 1 else 0
            rem = jax.lax.rem(i, per) if pre > 1 else i
            b = rem // nc if nc > 1 else rem
            c = jax.lax.rem(rem, nc) if nc > 1 else 0
            return p, b, c

        def _src(ref, i):
            p, b, c = _idx(i)
            if stage == "a":
                return ref.at[pl.ds(p * r1, r1), b, c]
            return ref.at[pl.ds(p * n + b * r2, r2), c]

        def _dst(ref, i):
            if stage == "a":
                return _src(ref, i)
            p, k1, c = _idx(i)
            return ref.at[pl.ds(p * r2, r2), k1, c]

        def start_in(slot, i):
            pltpu.make_async_copy(_src(xr_hbm, i), vr.at[slot],
                                  sin_r.at[slot]).start()
            pltpu.make_async_copy(_src(xi_hbm, i), vi.at[slot],
                                  sin_i.at[slot]).start()

        def wait_out(slot, i):
            pltpu.make_async_copy(ur.at[slot], _dst(yr_hbm, i),
                                  sout_r.at[slot]).wait()
            pltpu.make_async_copy(ui.at[slot], _dst(yi_hbm, i),
                                  sout_i.at[slot]).wait()

        for i in range(min(k, total)):
            start_in(i, i)

        def body(i, _):
            slot = jax.lax.rem(i, k)
            pltpu.make_async_copy(_src(xr_hbm, i), vr.at[slot],
                                  sin_r.at[slot]).wait()
            pltpu.make_async_copy(_src(xi_hbm, i), vi.at[slot],
                                  sin_i.at[slot]).wait()

            @pl.when(i >= k)
            def _():
                wait_out(slot, i - k)
            import os as _os
            if _os.environ.get("REGENT_FFT_A0FS_NOC") == "1":
                # DMA-floor probe variant: the ring is a manual copy, so
                # (unlike grid kernels, which Mosaic re-tiles) this IS a
                # valid floor for the slab pattern
                ur[slot] = vr[slot]
                ui[slot] = vi[slot]
            else:
                if stage == "a":
                    # four-step twiddle rides the lhs matrix (selected
                    # per slab by b — _a0fs_tw_mats); the stage-b norm
                    # scale is likewise folded at table build
                    _, b, _ = _idx(i)
                    mr, mi = wr_ref[b], wi_ref[b]
                else:
                    mr, mi = wr_ref[:], wi_ref[:]
                if io == "bf16" and r >= 16:
                    # complex32-grade stage dots: the 'hd' fold runs ONE
                    # native bf16 MXU pass per dot on the raw bf16 slabs
                    # (no f32 cast pass, no f32-emulation MXU passes);
                    # r >= 16 keeps the folded K = 2r at/above the
                    # measured Mosaic layout-inference floor (K >= 32).
                    fr, fi = _dg0_3m(mr, mi, vr[slot], vi[slot],
                                     scheme="hd")
                else:
                    fr, fi = _dg0_3m(mr, mi,
                                     vr[slot].astype(jnp.float32),
                                     vi[slot].astype(jnp.float32))
                ur[slot] = fr.astype(odt)
                ui[slot] = fi.astype(odt)
            pltpu.make_async_copy(ur.at[slot], _dst(yr_hbm, i),
                                  sout_r.at[slot]).start()
            pltpu.make_async_copy(ui.at[slot], _dst(yi_hbm, i),
                                  sout_i.at[slot]).start()

            @pl.when(i + k < total)
            def _():
                start_in(slot, i + k)
            return 0

        jax.lax.fori_loop(0, total, body, 0)
        for j in range(min(k, total)):
            i = total - min(k, total) + j
            wait_out(i % k, i)

    # views keep every int-indexed dim UNTILED (rank >= 3 from the end)
    # and the tiled (g, x) trailing pair always fully sliced
    in_shape = ((pre * r1, r2, nc, g, x) if stage == "a"
                else (pre * n, nc, g, x))
    out_shape = ((pre * r1, r2, nc, g, x) if stage == "a"
                 else (pre * r2, r1, nc, g, x))

    def run(xr2, xi2):
        assert xr2.shape == in_shape, (xr2.shape, in_shape)
        return pl.pallas_call(
            kernel,
            grid=(),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
            out_shape=[jax.ShapeDtypeStruct(out_shape, odt)] * 2,
            scratch_shapes=[
                pltpu.VMEM((k, r, g, x), odt),
                pltpu.VMEM((k, r, g, x), odt),
                pltpu.VMEM((k, r, g, x), odt),
                pltpu.VMEM((k, r, g, x), odt),
                pltpu.SemaphoreType.DMA((k,)),
                pltpu.SemaphoreType.DMA((k,)),
                pltpu.SemaphoreType.DMA((k,)),
                pltpu.SemaphoreType.DMA((k,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            cost_estimate=pl.CostEstimate(
                flops=int(6 * r * pre * n * nc * g * x),
                bytes_accessed=4 * pre * n * nc * g * x * 4,
                transcendentals=0),
            interpret=interpret,
        )(xr2, xi2, jnp.asarray(wr_np), jnp.asarray(wi_np))
    return run


def fft_axis0_fourstep(xr, xi, axis: int, direction: Direction,
                       scale: float = 1.0, k: int = 2,
                       interpret: bool = False):
    """FFT along a leading/mid ``axis`` as TWO wide-run DMA-ring passes
    (see :func:`_runner_a0fs`); output in natural order."""
    import os
    shape = xr.shape
    axis = axis % xr.ndim
    n = shape[axis]
    pre = int(np.prod(shape[:axis])) if axis else 1
    post = int(np.prod(shape[axis + 1:]))
    x = shape[-1]
    if not axis0_fourstep_supported(n, post, x):
        raise ValueError(f"axis0-fourstep unsupported for {shape} ax {axis}")
    mid = post // x
    r1, r2 = _a0fs_split(n)
    sign = int(direction)
    io = _plane_io(xr, r1)
    if io == "f32" and xr.dtype != jnp.float32:
        # bf16 planes whose r1 misses the bf16 min tile: run the stages
        # at f32 block I/O (the caller re-casts after the axis)
        xr, xi = xr.astype(jnp.float32), xi.astype(jnp.float32)
    k_env = os.environ.get("REGENT_FFT_A0FS_K")
    if k_env:
        k = int(k_env)
    elif io == "bf16":
        k = _a0fs_k_auto(r1, r2, x)
    ga = _a0fs_g(r1, x, mid, "REGENT_FFT_A0FS_WA", k, io)
    gb = _a0fs_g(r2, x, mid, "REGENT_FFT_A0FS_WB", k, io)
    runa = _runner_a0fs("a", n, r1, r2, ga, x, mid // ga, pre, sign,
                        k, 1.0, interpret, io, envkey=_env_key())
    runb = _runner_a0fs("b", n, r1, r2, gb, x, mid // gb, pre, sign,
                        k, float(scale), interpret, io, envkey=_env_key())
    ar, ai = runa(xr.reshape(pre * r1, r2, mid // ga, ga, x),
                  xi.reshape(pre * r1, r2, mid // ga, ga, x))
    yr, yi = runb(ar.reshape(pre * n, mid // gb, gb, x),
                  ai.reshape(pre * n, mid // gb, gb, x))
    return yr.reshape(shape), yi.reshape(shape)


def _vt_cap(n: int) -> int:
    """Lane-tile width for a mid-axis n-point kernel.

    Honest-timer sweeps (512^3, v5e): vt=128/256 tie within noise and
    vt=512 is ~5% worse on the leading-axis pass (11.6/11.6/12.1 ms)
    even though the envelope admits n*vt up to 256K elements — wider
    tiles add VMEM pressure without improving anything.  Small n
    (four-step first factors) widen toward 512 lanes to keep blocks a
    sensible size.
    """
    return max(LANE_TILE, min(512, (65536 // max(n, 1)) // 128 * 128))


def _mid_apply(xr3, xi3, n: int, sign: int, scale: float, interpret: bool,
               io: str = "f32"):
    """FFT over axis 1 of (pre, n, post) split planes, ONE HBM pass.

    post is padded to a lane multiple; the 2-D grid column-tiles wide
    trailing extents directly (no normalization copies — round-1's
    swapaxes workaround is gone since column-tiled grids now compile).
    """
    pre, _, post = xr3.shape
    pad = (-post) % 128
    if pad:
        xr3 = jnp.pad(xr3, ((0, 0), (0, 0), (0, pad)))
        xi3 = jnp.pad(xi3, ((0, 0), (0, 0), (0, pad)))
    postp = xr3.shape[-1]
    vt = min(_vt_cap(n), postp)
    while postp % vt:
        vt -= 128
    run = _runner_cols(n, sign, vt, scale, interpret, io,
                       envkey=_env_key())
    yr, yi = run(xr3.reshape(pre * n, postp), xi3.reshape(pre * n, postp))
    yr = yr.reshape(pre, n, postp)
    yi = yi.reshape(pre, n, postp)
    if pad:
        yr = yr[:, :, :post]
        yi = yi[:, :, :post]
    return yr, yi


def _chunk_rows_map(run, xr2, xi2, n: int):
    """Split a (R, vc) row-blocked call into operand-size-safe pieces."""
    rows, vc = xr2.shape
    if rows * vc <= MAX_CALL_ELEMS:
        return run(xr2, xi2)
    pre = rows // n
    chunk = max(1, MAX_CALL_ELEMS // (n * vc))  # pre-slices per call
    while pre % chunk:
        chunk -= 1
    nc = pre // chunk
    xr4 = xr2.reshape(nc, chunk * n, vc)
    xi4 = xi2.reshape(nc, chunk * n, vc)
    yr4, yi4 = jax.lax.map(lambda ab: run(ab[0], ab[1]), (xr4, xi4))
    return yr4.reshape(rows, vc), yi4.reshape(rows, vc)


# Hardware-validated ceiling for the real-transform kernels: n=2048
# fails Mosaic layout inference on v5e ("unsupported shape cast" in the
# tile body at the capped tb=64 — measured r3, scripts/probe_r3.py
# repro) even though its blocks fit the element envelope.  n <= 1024 is
# exercised by the bench suite; larger real axes take the conjugate-even
# einsum path.
MAX_REAL_N = 1024


def r2c_last_supported(n: int) -> bool:
    """Can the row-pair kernel r2c/c2r path run a last axis of length n?"""
    return 2 <= n <= MAX_REAL_N and n % 2 == 0 and (n & (n - 1)) == 0


def _tb_real(n: int, w_out: int) -> int:
    """Row tile for the real-transform kernels whose OUTPUT block is
    (2*tb, w_out) and input block (tb, n): both must fit the validated
    MAX_BLOCK_ELEMS envelope (n=2048 unpacked would otherwise emit a
    524288-element block — 2x the Mosaic crash threshold)."""
    tb = min(LANE_TILE, MAX_BLOCK_ELEMS // (2 * w_out), MAX_BLOCK_ELEMS // n)
    return max(8, tb // 8 * 8)


def r2c_half_supported(n: int) -> bool:
    """Can the HALF-LENGTH kernel r2c/c2r path run a last axis of length n?

    The conjugate-even reduction (``ops/real.py``) runs one length-n/2
    complex butterfly kernel plus O(n) XLA untangle passes — the true
    work-halving FFTW ``rdft2`` scheme (the row-pair kernels pay two
    full-length transforms instead; measured 1.5x slower at 1024-point
    batches).  Needs n/2 to be a legal kernel lane extent.
    """
    m = n // 2
    return (n % 2 == 0 and (n & (n - 1)) == 0
            and LANE_TILE <= m <= MAX_LAST_N)


def _stockham_head(xr, xi, n: int, sign: int, wr_all, wi_all):
    """Head radix-4 stages only: returns (L, mt, v) planes (the value fed
    to the MXU tail in :func:`_stockham_tile`)."""
    v = xr.shape[-1]
    ar = xr.reshape(1, n, v)
    ai = xi.reshape(1, n, v)
    L = 1
    s = float(sign)
    _, _, offsets = _packed_tables(n, sign)
    for (r, m), offs in zip(_plan_stages(n), offsets):
        h = m // r
        ws = [(wr_all[st:st + hh, :1][None], wi_all[st:st + hh, :1][None])
              for (st, hh) in offs]
        q = [(ar[:, j * h:(j + 1) * h, :], ai[:, j * h:(j + 1) * h, :])
             for j in range(r)]
        ys = _bfly_core(q, r, s)
        outs = [ys[0]] + [_cmul(yr_, yi_, wr_, wi_)
                          for (yr_, yi_), (wr_, wi_) in zip(ys[1:], ws)]
        ar = jnp.stack([o[0] for o in outs], axis=0).reshape(r * L, h, v)
        ai = jnp.stack([o[1] for o in outs], axis=0).reshape(r * L, h, v)
        L *= r
    mt = _tail_mt(n)
    return ar.reshape(L, mt, v), ai.reshape(L, mt, v)


def _dg_3m(tr, ti, a3r, a3i):
    """Complex contraction of a (mt', mt) matrix with (L, mt, v) planes
    -> (mt', L, v), scheme per :func:`_tail_precision`.

    'highest' runs the 3M (Karatsuba) product at HIGHEST — 3 dots x 6
    f32-emulation passes at K=mt.  'b3' hand-builds bf16x3: each 3M
    product becomes ONE DEFAULT dot with the hi/lo terms concatenated
    along the contraction axis (K=3mt — which also fixes the M=K=mt
    MXU underutilization the emulation passes suffer).  'b32' goes
    further: the 4M real/imag forms share one K=6mt rhs, so the whole
    complex contraction is TWO DEFAULT dots.  'b62' applies the same
    shared-rhs 4M fold to the FULL 3-way (h/m/l) bf16x3 split — TWO
    DEFAULT dots at K=12mt holding f32-grade accuracy (the 2-way
    splits cap at ~2^-17 data representation error; the 3-way split
    removes it) while keeping b32's one-streaming-dot dispatch shape."""
    p = _tail_precision()
    if p == "h4" and tr.shape[1] < 32:
        # Mosaic fails layout inference on the K=2mt fold at mt=16
        # (measured: n=1024 last-axis kernel, opaque UNIMPLEMENTED
        # through the attach); small tails keep the 3M form.
        p = "highest"
    catm = functools.partial(jnp.concatenate, axis=-1)   # lhs (mt', K)
    cata = functools.partial(jnp.concatenate, axis=-2)   # rhs (L, K, v)

    def dg(m_, a_, prec):
        return jax.lax.dot_general(
            m_, a_, (((1,), (a_.ndim - 2,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    if p in ("highest", "default"):
        prec = (jax.lax.Precision.HIGHEST if p == "highest"
                else jax.lax.Precision.DEFAULT)
        t1 = dg(tr, a3r, prec)
        t2 = dg(ti, a3i, prec)
        t3 = dg(tr + ti, a3r + a3i, prec)
        return t1 - t2, t3 - t1 - t2
    if p == "h4":
        # 4M fold at full f32 HIGHEST: the real/imag forms share one
        # K=2mt rhs, so the complex contraction is TWO dots instead of
        # 3M's three.  MACs x1.33 but dispatch count x2/3 and K doubles —
        # the "dispatch shape beats MAC count at small K" lesson
        # (docs/tpu_notes.md, b32 vs b3) applied WITHOUT the bf16 split's
        # 2^-17 accuracy cap.  Exact f32 accuracy, same as 'highest'.
        rhs = cata([a3r, a3i])
        yr = dg(catm([tr, -ti]), rhs, jax.lax.Precision.HIGHEST)
        yi = dg(catm([ti, tr]), rhs, jax.lax.Precision.HIGHEST)
        return yr, yi
    if p == "b6":
        lr1, rr1 = _b6_operands(catm, cata, _bf16_hml(tr), _bf16_hml(a3r))
        li1, ri1 = _b6_operands(catm, cata, _bf16_hml(ti), _bf16_hml(a3i))
        ls1, rs1 = _b6_operands(catm, cata, _bf16_hml(tr + ti),
                                _bf16_hml(a3r + a3i))
        t1 = dg(lr1, rr1, None)
        t2 = dg(li1, ri1, None)
        t3 = dg(ls1, rs1, None)
        return t1 - t2, t3 - t1 - t2
    if p == "b62":
        lr6, rr6 = _b6_operands(catm, cata, _bf16_hml(tr), _bf16_hml(a3r))
        li6, ri6 = _b6_operands(catm, cata, _bf16_hml(ti), _bf16_hml(a3i))
        rhs = cata([rr6, ri6])
        yr = dg(catm([lr6, -li6]), rhs, None)
        yi = dg(catm([li6, lr6]), rhs, None)
        return yr, yi
    arh, arl = _bf16_hl(a3r)
    aih, ail = _bf16_hl(a3i)
    trh, trl = _bf16_hl(tr)
    tih, til = _bf16_hl(ti)
    if p in ("b3", "high"):
        tsh, tsl = _bf16_hl(tr + ti)
        ash, asl = _bf16_hl(a3r + a3i)
        t1 = dg(catm([trh, trh, trl]), cata([arh, arl, arh]), None)
        t2 = dg(catm([tih, tih, til]), cata([aih, ail, aih]), None)
        t3 = dg(catm([tsh, tsh, tsl]), cata([ash, asl, ash]), None)
        return t1 - t2, t3 - t1 - t2
    assert p == "b32", p
    rhs = cata([arh, arl, arh, aih, ail, aih])
    yr = dg(catm([trh, trh, trl, -tih, -tih, -til]), rhs, None)
    yi = dg(catm([tih, tih, til, trh, trh, trl]), rhs, None)
    return yr, yi


def _r2c_mt2(n: int) -> int:
    """Tail-matrix row count for the r2c kernel: the untangle only
    consumes bins k <= n/2, i.e. tail rows q <= mt/2 — the other half of
    each tail contraction is pure waste (the old kernel computed all mt
    rows and masked).  Rounded up to a sublane multiple for MXU-friendly
    output tiles."""
    mt = _tail_mt(n)
    return min(mt, -(-(mt // 2 + 1) // 8) * 8)


def _r2c_tables(n: int):
    """FORWARD packed tables extended with reversed-row tail matrices.

    Row layout of the returned (T + 3*mt2, mt) planes, mt2 = _r2c_mt2(n)
    (HALF-spectrum tail rows — bins k > n/2 are never consumed by the
    Hermitian untangle, so their tail rows are dropped at plan time
    instead of masked at run time):
      [0, T)             head-stage twiddles (forward sign)
      [T, T+mt2)         tail DFT rows D[0:mt2]
      [T+mt2, T+2mt2)    Drev1[q] = D[mt-q-1]   (reversal, l >= 1 columns)
      [T+2mt2, T+3mt2)   Drev0[q] = D[(mt-q) % mt]  (reversal, l = 0 column)

    These give Zrev[k] = Z[(n-k) mod n] from the SAME head value the
    normal tail consumes: for k = q*L + l, (n-k) mod n = (mt-q-1)*L +
    (L-l) when l >= 1 and ((mt-q) mod mt)*L when l = 0 — a leading-axis
    (L) flip plus row-permuted tail matrices, NO second butterfly
    transform.  This halves the r2c kernel's VPU work vs the round-2
    row-pair kernel (which ran forward AND backward full-length
    transforms to avoid data reversal; docs/tpu_notes.md "Mosaic has no
    sublane flip").

    All tail rows are pre-scaled by the untangle's 1/2 so the Hermitian
    combine in the kernel is pure add/sub.
    """
    wr, wi, _ = _packed_tables(n, -1)
    mt = _tail_mt(n)
    mt2 = _r2c_mt2(n)
    T = wr.shape[0] - mt
    tail_r, tail_i = 0.5 * wr[T:], 0.5 * wi[T:]
    rev1_r, rev1_i = tail_r[::-1], tail_i[::-1]
    rev0_r = np.roll(rev1_r, 1, axis=0)
    rev0_i = np.roll(rev1_i, 1, axis=0)
    wr_full = np.concatenate([wr[:T], tail_r[:mt2], rev1_r[:mt2],
                              rev0_r[:mt2]], axis=0)
    wi_full = np.concatenate([wi[:T], tail_i[:mt2], rev1_i[:mt2],
                              rev0_i[:mt2]], axis=0)
    return wr_full, wi_full


def _fwd_and_rev_spectra(zr, zi, n: int, wr_full, wi_full, tb: int):
    """(Z, Zrev) HALF spectra (bins [0, mt2*L), mt2*L >= n/2 + 1) of one
    complex block via ONE shared butterfly head and the reversed-row MXU
    tails (see :func:`_r2c_tables`).

    Two tail arrangements (``REGENT_FFT_R2C_FLIP``):

    - ``out`` (default, r5): the reversal's leading-axis flip
      (l -> L-l for l >= 1) commutes with the tail contraction (L is a
      batch axis), so dot FIRST on the UNFLIPPED head and flip the
      HALF-SIZE output (mt2 rows vs the head's mt).  Both spectra then
      consume the SAME rhs, so the two tail contractions stack into ONE
      dot over the contiguous [D[0:mt2]; Drev1[0:mt2]] table rows —
      half the tail dispatches and half the flip relayout traffic of:
    - ``in``: flip the head, dot per spectrum (the r4 form, kept for
      A/B timing).

    Measured (honest timer, v5e, r5, scripts/probe_r2c_flip.py —
    back-to-back A/B, same session): 4096x1024 r2c 0.123 -> 0.104 ms
    (0.73x the 0.142 c2c anchor, the VERDICT r4 <= 0.75x target),
    65536x1024 2.289 -> 2.074; 3-D 256^3x4 neutral (6.71 vs 6.75 — the
    mid passes dominate there).  Error identical (1.37e-7: the dots
    compute the same products).
    """
    mt = _tail_mt(n)
    mt2 = _r2c_mt2(n)
    L = n // mt
    S = mt2 * L
    T = wr_full.shape[0] - 3 * mt2
    hr, hi = _stockham_head(zr, zi, n, -1, wr_full, wi_full)   # (L, mt, tb)
    r0r, r0i = wr_full[T + 2 * mt2:T + 3 * mt2], \
        wi_full[T + 2 * mt2:T + 3 * mt2]
    outflip = os.environ.get("REGENT_FFT_R2C_FLIP", "out") == "out"
    if outflip:
        # ONE stacked dot for BOTH spectra: rows [T, T+2mt2) hold
        # [D[0:mt2]; Drev1[0:mt2]] contiguously (_r2c_tables layout)
        y_r, y_i = _dg_3m(wr_full[T:T + 2 * mt2],
                          wi_full[T:T + 2 * mt2], hr, hi)    # (2mt2, L, tb)
        ar3, ai3 = y_r[:mt2], y_i[:mt2]
        cmr, cmi = y_r[mt2:], y_i[mt2:]
        b0r, b0i = _dg_3m(r0r, r0i, hr[0:1], hi[0:1])        # (mt2, 1, tb)
        if L > 1:
            # middle-axis reversal as static slice-concat (Mosaic has no
            # `rev` primitive; a permutation DOT measured slower, r4):
            # b[:, l] = c[:, L-l] for l >= 1, b[:, 0] = Drev0 @ h[0]
            br3 = jnp.concatenate(
                [b0r] + [cmr[:, l:l + 1, :] for l in range(L - 1, 0, -1)],
                axis=1)
            bi3 = jnp.concatenate(
                [b0i] + [cmi[:, l:l + 1, :] for l in range(L - 1, 0, -1)],
                axis=1)
        else:
            br3, bi3 = b0r, b0i
        return (ar3.reshape(S, tb), ai3.reshape(S, tb),
                br3.reshape(S, tb), bi3.reshape(S, tb))
    tr, ti = wr_full[T:T + mt2], wi_full[T:T + mt2]
    ar3, ai3 = _dg_3m(tr, ti, hr, hi)                          # (mt2, L, tb)
    ar, ai = ar3.reshape(S, tb), ai3.reshape(S, tb)
    # reversed spectrum: leading-axis flip (l -> L-l for l >= 1) + the
    # row-permuted tail matrices; fix the l = 0 column with Drev0.
    r1r, r1i = wr_full[T + mt2:T + 2 * mt2], wi_full[T + mt2:T + 2 * mt2]
    if L > 1:
        # leading-axis reversal as static slice-concat (Mosaic has no
        # `rev` primitive, even for untiled leading dims; L = n/mt can
        # reach 64: at n=2048 _tail_mt's divide-by-4 walk under the
        # TAIL_MT=64 cap lands on mt=32).  A
        # 16x16 permutation DOT at HIGHEST was measured SLOWER (2.24 ->
        # 2.86 ms at 1024x65536 — tiny-K emulation dots lose to the
        # relayout, r4): do not retry.
        order = [slice(0, 1)] + [slice(l, l + 1)
                                 for l in range(L - 1, 0, -1)]
        hpr = jnp.concatenate([hr[sl] for sl in order], axis=0)
        hpi = jnp.concatenate([hi[sl] for sl in order], axis=0)
    else:
        hpr, hpi = hr, hi
    bmr, bmi = _dg_3m(r1r, r1i, hpr, hpi)                      # (mt2, L, tb)
    b0r, b0i = _dg_3m(r0r, r0i, hr[0:1], hi[0:1])              # (mt2, 1, tb)
    if L > 1:
        br3 = jnp.concatenate([b0r, bmr[:, 1:, :]], axis=1)
        bi3 = jnp.concatenate([b0i, bmi[:, 1:, :]], axis=1)
    else:
        br3, bi3 = b0r, b0i
    return ar, ai, br3.reshape(S, tb), bi3.reshape(S, tb)


@functools.lru_cache(maxsize=256)
def _runner_last_r2c(n: int, tb: int, interpret: bool = False,
                     packed: bool = False, narrow: bool = False,
                     envkey: str = ""):
    """Fully-fused r2c kernel over a (B, n) REAL array, one HBM pass.

    Row-block pairing via BlockSpec index maps: grid step i loads row
    blocks 2i and 2i+1 as the re/im planes of ONE complex block — the
    classic two-real-FFTs-in-one-complex-FFT trick with ZERO host-side
    data movement (round 2's ``_pair_rows`` even/odd row slicing cost an
    extra strided pass).  Per block: one shared butterfly head + two MXU
    tails (normal + reversed-row, :func:`_r2c_tables`) give Z[k] and
    Z[(n-k) mod n] without a second transform (Mosaic has no sublane
    flip), then the Hermitian untangle; the two spectra store to the
    [0:tb) / [tb:2tb) halves of the output block — original row order,
    no interleave relayout.  Replaces the reference's r2c engine
    (``rdft/``) on the hot path.

    With ``packed=True`` the output is (…, n/2): bins 0..n/2-1 with the
    REAL Nyquist bin stored in bin 0's (zero) imaginary slot — the FFTW
    halfcomplex-packing idea (``rdft/rdft.h`` R2HC avoids the n/2+1
    problem the same way) adapted to the 128-lane granularity, so every
    subsequent mid-axis pass moves exactly HALF the complex traffic.
    ``REGENT_FFT_R2C_IMPL=twotransform`` restores the round-2 fwd+bwd
    kernel for A/B timing.
    """
    import os as _os
    shared_head = _os.environ.get("REGENT_FFT_R2C_IMPL", "shared") == "shared"
    if shared_head:
        wfr_np, wfi_np = _r2c_tables(n)
        wbr_np, wbi_np = wfr_np, wfi_np  # single table pair, sliced in-kernel
    else:
        wfr_np, wfi_np, _ = _packed_tables(n, -1)
        wbr_np, wbi_np, _ = _packed_tables(n, +1)
    h = n // 2 + 1
    m = n // 2
    # narrow (rank-1): write only the lane-rounded half spectrum — the
    # full-n padded width exists for pad-free mid-axis kernel feeds,
    # which a 1-D transform doesn't have
    w_out = m if packed else (min(n, -(-h // 128) * 128) if narrow else n)

    def untangle_write(ar, ai, br, bi, yr_ref, yi_ref):
        # spectra arrive PRE-HALVED (the 1/2 is folded into the tail
        # tables, _r2c_tables), so the Hermitian combine is add/sub only
        S = ar.shape[0]   # mt2*L >= h (shared head) or n (twotransform)
        x1r = ar + br
        x1i = ai - bi
        x2r = ai + bi
        x2i = br - ar
        if packed:
            # bins 0..m-1; imag(bin 0) := re(bin m)  (both are real)
            x1i = jnp.concatenate([x1r[m:m + 1], x1i[1:m]], axis=0)
            x2i = jnp.concatenate([x2r[m:m + 1], x2i[1:m]], axis=0)
            x1r = x1r[:m]
            x2r = x2r[:m]
        else:
            def fit(x):
                # narrow: garbage bins >= h are sliced off by the caller;
                # padded feeds later kernel passes, so zero them
                if not narrow:
                    k = jax.lax.broadcasted_iota(jnp.int32, (S, tb), 0)
                    x = jnp.where(k < h, x, jnp.float32(0.0))
                if S < w_out:
                    return jnp.concatenate(
                        [x, jnp.zeros((w_out - S, tb), jnp.float32)],
                        axis=0)
                return x[:w_out]
            x1r, x1i, x2r, x2i = fit(x1r), fit(x1i), fit(x2r), fit(x2i)
        # the two row blocks store to the two halves of the output block
        # (original row order — no interleave relayout)
        yr_ref[0:tb, :] = x1r.T
        yr_ref[tb:2 * tb, :] = x2r.T
        yi_ref[0:tb, :] = x1i.T
        yi_ref[tb:2 * tb, :] = x2i.T

    if shared_head:
        def kernel(ze_ref, zo_ref, wfr_ref, wfi_ref, yr_ref, yi_ref):
            # ONE butterfly head + two MXU tails (normal + reversed-row):
            # half the VPU work of the forward+backward pair.
            ar, ai, br, bi = _fwd_and_rev_spectra(
                ze_ref[:].T, zo_ref[:].T, n, wfr_ref[:], wfi_ref[:], tb)
            untangle_write(ar, ai, br, bi, yr_ref, yi_ref)
    else:
        def kernel(ze_ref, zo_ref, wfr_ref, wfi_ref, wbr_ref, wbi_ref,
                   yr_ref, yi_ref):
            zr = ze_ref[:].T
            zi = zo_ref[:].T
            ar, ai = _stockham_tile(zr, zi, n, -1, wfr_ref[:], wfi_ref[:])
            br, bi = _stockham_tile(zr, zi, n, +1, wbr_ref[:], wbi_ref[:])
            # untangle_write expects pre-halved spectra (the shared-head
            # path folds the 1/2 into its tables)
            untangle_write(0.5 * ar, 0.5 * ai, 0.5 * br, 0.5 * bi,
                           yr_ref, yi_ref)

    def run(x2):
        """x2: (B, n) real, B a multiple of 2*tb -> (B, w_out) planes."""
        b = x2.shape[0]
        ibs_e = pl.BlockSpec((tb, n), lambda i: (2 * i, 0),
                             memory_space=pltpu.VMEM)
        ibs_o = pl.BlockSpec((tb, n), lambda i: (2 * i + 1, 0),
                             memory_space=pltpu.VMEM)
        obs = pl.BlockSpec((2 * tb, w_out), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        wfs = pl.BlockSpec(wfr_np.shape, lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
        operands = [x2, x2, jnp.asarray(wfr_np), jnp.asarray(wfi_np)]
        in_specs = [ibs_e, ibs_o, wfs, wfs]
        if not shared_head:
            wbs = pl.BlockSpec(wbr_np.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
            operands += [jnp.asarray(wbr_np), jnp.asarray(wbi_np)]
            in_specs += [wbs, wbs]
        flop_mult = 12 if shared_head else 20
        return pl.pallas_call(
            kernel, grid=(b // (2 * tb),),
            in_specs=in_specs, out_specs=[obs, obs],
            out_shape=[jax.ShapeDtypeStruct((b, w_out), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=int(flop_mult * n * np.log2(n) * b // 2),
                transcendentals=0,
                bytes_accessed=(b * n + 2 * b * w_out) * 4),
            interpret=interpret,
        )(*operands)
    return run


@functools.lru_cache(maxsize=256)
def _runner_last_c2r(n: int, tb: int, interpret: bool = False,
                     packed: bool = False, envkey: str = ""):
    """Fully-fused c2r kernel: (2*tb, n) padded half-spectrum block ->
    (2*tb, n) real block, unscaled (times N) inverse.

    Writing Z's Hermitian tail needs X[n-k]; two equivalent forms:
      pair:    v = BWD(H) + conj(BWD(G)),  H = (X1 + i X2), k <= n/2,
                                           G = (X1 - i X2), 1 <= k < n/2
               — TWO backward butterfly transforms, zero data movement;
      shared:  v = BWD(H + G'),  G'[k] = conj(G[(n-k) mod n])
               — ONE butterfly transform + a sublane reversal, halving
               the dominant VPU cost.  Mosaic has no lax.rev lowering
               (probe: scripts/probe_flip.py), so the reversal is an
               MXU dot with the permutation matrix P[k, (n-k) mod n]=1
               (k>=1) at HIGHEST — exact (0/1 entries make every
               emulation product exact) and ~n^2 MACs per plane, far
               below the butterfly it replaces.
    ``REGENT_FFT_C2R_IMPL`` selects (default measured on hardware).
    """
    wbr_np, wbi_np, _ = _packed_tables(n, +1)
    m = n // 2
    w_in = m if packed else n
    import os
    shared = os.environ.get("REGENT_FFT_C2R_IMPL", "shared") == "shared"
    if shared:
        # G is zero outside rows [1, m), so only the first m columns of
        # the (n, n) reversal permutation ever multiply a nonzero row —
        # the stored (n, m) slice halves the dot's MACs (r4)
        prev_np = np.zeros((n, m), np.float32)
        prev_np[n - np.arange(1, m), np.arange(1, m)] = 1.0

    def kernel(yr_ref, yi_ref, wbr_ref, wbi_ref, *rest):
        if shared:
            prev_ref, o_ref = rest
        else:
            (o_ref,) = rest
        # the block's two halves are two independent rows' half-spectra
        # (matches the r2c kernel's block-half pairing; no interleave)
        x1r = yr_ref[0:tb, :].T
        x2r = yr_ref[tb:2 * tb, :].T
        x1i = yi_ref[0:tb, :].T
        x2i = yi_ref[tb:2 * tb, :].T
        zrow = jnp.zeros((1, tb), jnp.float32)
        ztail = jnp.zeros((n - m - 1, tb), jnp.float32)
        if packed:
            # unpack: bin m (Nyquist, real) rides in imag(bin 0)
            x1r = jnp.concatenate([x1r, x1i[0:1], ztail], axis=0)
            x1i = jnp.concatenate([zrow, x1i[1:m], zrow, ztail], axis=0)
            x2r = jnp.concatenate([x2r, x2i[0:1], ztail], axis=0)
            x2i = jnp.concatenate([zrow, x2i[1:m], zrow, ztail], axis=0)
        k = jax.lax.broadcasted_iota(jnp.int32, (n, tb), 0)
        z = jnp.float32(0.0)
        # Hermitian endpoint bins are real (numpy.fft.irfft convention).
        ends = (k == 0) | (k == m)
        x1i = jnp.where(ends, z, x1i)
        x2i = jnp.where(ends, z, x2i)
        head = k <= m
        tail = (k >= 1) & (k < m)
        hr = jnp.where(head, x1r - x2i, z)
        hi = jnp.where(head, x1i + x2r, z)
        gr = jnp.where(tail, x1r + x2i, z)
        gi = jnp.where(tail, x1i - x2r, z)
        if shared:
            # G'[k] = conj(G[n-k]) via the permutation dot (exact at
            # HIGHEST); G is zero outside rows [1, m), so the stored
            # (n, m) slice of the permutation contracts only those rows
            # — exact, half the MACs (r4)
            def rev_dot(x):
                return jax.lax.dot_general(
                    prev_ref[:], x[:m], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            wr = hr + rev_dot(gr)
            wi = hi - rev_dot(gi)
            vr, vi = _stockham_tile(wr, wi, n, +1, wbr_ref[:], wbi_ref[:])
        else:
            vhr, vhi = _stockham_tile(hr, hi, n, +1, wbr_ref[:],
                                      wbi_ref[:])
            vgr, vgi = _stockham_tile(gr, gi, n, +1, wbr_ref[:],
                                      wbi_ref[:])
            vr = vhr + vgr
            vi = vhi - vgi
        o_ref[0:tb, :] = vr.T
        o_ref[tb:2 * tb, :] = vi.T

    def run(yr, yi):
        rows = yr.shape[0]
        ibs = pl.BlockSpec((2 * tb, w_in), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        obs = pl.BlockSpec((2 * tb, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
        ws = pl.BlockSpec(wbr_np.shape, lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
        ops = [yr, yi, jnp.asarray(wbr_np), jnp.asarray(wbi_np)]
        specs = [ibs, ibs, ws, ws]
        if shared:
            ops.append(jnp.asarray(prev_np))
            specs.append(pl.BlockSpec(prev_np.shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        return pl.pallas_call(
            kernel, grid=(rows // (2 * tb),),
            in_specs=specs, out_specs=obs,
            out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=int(20 * n * np.log2(n) * rows // 2),
                bytes_accessed=(4 * rows * w_in + 2 * rows * n) * 2,
                transcendentals=0),
            interpret=interpret,
        )(*ops)
    return run


def r2c_packed_supported(n: int) -> bool:
    """Can the PACKED (n/2-lane halfcomplex) kernel r2c path run n?"""
    return r2c_last_supported(n) and (n // 2) % LANE_TILE == 0


def fft_last_r2c_stockham(x, interpret: bool = False, padded: bool = False,
                          packed: bool = False):
    """R2C along the LAST axis of a real array, fully in-kernel.

    Two consecutive real rows pack as one complex row (free: leading-dim
    reshapes only); ONE kernel pass over half the rows computes both
    half-spectra (see :func:`_runner_last_r2c`).  This replaces the
    reference's fftw_plan_dft_r2c (``src/fft.rg:313``; FFTW ``rdft/``)
    on the hot path at ~half the traffic of a padded complex transform.

    Returns the split (..., n//2+1) half spectrum — or, with
    ``padded=True``, (..., n)-wide planes whose bins >= n//2+1 are zero
    (lane-aligned for subsequent kernel passes; slice at the end) — or,
    with ``packed=True``, (..., n/2)-wide planes with the real Nyquist
    bin packed into bin 0's imaginary slot (halves every later pass;
    unpack at the plan level after the other axes transform).
    """
    shape = x.shape
    n = shape[-1]
    if not r2c_last_supported(n):
        raise ValueError(f"kernel r2c path needs even power-of-two n <= "
                         f"{MAX_STOCKHAM_N}, got {n}")
    h = n // 2 + 1
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    x2 = x.reshape(b, n)
    narrow = not padded and not packed
    w_out = (n // 2 if packed
             else (min(n, -(-h // 128) * 128) if narrow else n))
    tb = _tb_real(n, w_out)
    pad = (-b) % (2 * tb)
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    if packed:
        if not r2c_packed_supported(n):
            raise ValueError(f"packed r2c path needs n/2 to be a lane "
                             f"multiple, got n={n}")
        run = _runner_last_r2c(n, tb, interpret, packed=True,
                               envkey=_env_key())
        yr, yi = run(x2)
        m = n // 2
        return (yr[:b].reshape(shape[:-1] + (m,)),
                yi[:b].reshape(shape[:-1] + (m,)))
    run = _runner_last_r2c(n, tb, interpret, narrow=narrow,
                           envkey=_env_key())
    yr, yi = run(x2)
    yr, yi = yr[:b], yi[:b]
    if padded:
        return yr.reshape(shape[:-1] + (n,)), yi.reshape(shape[:-1] + (n,))
    out = shape[:-1] + (h,)
    return yr[:, :h].reshape(out), yi[:, :h].reshape(out)


def ifft_last_c2r_stockham(xr, xi, n: int, interpret: bool = False,
                           packed: bool = False):
    """UNSCALED (times N) inverse of :func:`fft_last_r2c_stockham`.

    Input: split (..., n//2+1) half spectrum OR (..., n) lane-padded
    planes (extra bins ignored — the kernel masks them) OR, with
    ``packed=True``, the (..., n/2) Nyquist-packed layout.  Output
    (..., n) real.  One fused kernel pass (see :func:`_runner_last_c2r`).
    """
    if not r2c_last_supported(n):
        raise ValueError(f"kernel c2r path needs even power-of-two n <= "
                         f"{MAX_STOCKHAM_N}, got {n}")
    h = n // 2 + 1
    m = n // 2
    shape = xr.shape
    b = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    if packed:
        assert shape[-1] == m, (shape, m)
        xr2 = xr.reshape(b, m)
        xi2 = xi.reshape(b, m)
        tb = _tb_real(n, n)
        pad = (-b) % (2 * tb)
        if pad:
            xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
            xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
        run = _runner_last_c2r(n, tb, interpret, packed=True,
                               envkey=_env_key())
        y = run(xr2, xi2)
        return y[:b].reshape(shape[:-1] + (n,))
    assert shape[-1] in (h, n), (shape, h, n)
    xr2 = xr.reshape(b, shape[-1])
    xi2 = xi.reshape(b, shape[-1])
    if shape[-1] != n:  # lane-pad the half spectrum (values ignored)
        xr2 = jnp.pad(xr2, ((0, 0), (0, n - h)))
        xi2 = jnp.pad(xi2, ((0, 0), (0, n - h)))
    tb = _tb_real(n, n)
    pad = (-b) % (2 * tb)
    if pad:
        xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
        xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
    run = _runner_last_c2r(n, tb, interpret, envkey=_env_key())
    y = run(xr2, xi2)
    return y[:b].reshape(shape[:-1] + (n,))


def fft_axis_stockham(xr, xi, axis: int, direction: Direction,
                      scale: float = 1.0, interpret: bool = False):
    """FFT along ``axis`` of an N-D split pair via the butterfly kernels.

    Power-of-two lengths only; exactly ONE HBM read+write of the array.
    Last axis: row-tiled (tb, n) blocks with in-VMEM 2-D transposes.
    Other axes: column-tiled (n, vt) blocks over a 2-D grid.  ``scale``
    is fused into the kernel's output write (free normalization).
    """
    ndim = xr.ndim
    axis = axis % ndim
    n = xr.shape[axis]
    is_last = axis == ndim - 1 and ndim > 1
    cap = MAX_LAST_N if is_last else MAX_STOCKHAM_N
    if not kernel_len_ok(n, is_last) or n > cap:
        raise ValueError(
            f"stockham path needs power-of-two or mt*4^s length <= {cap}, "
            f"got {n}")
    sign = int(direction)
    scale = float(scale)
    shape = xr.shape
    if is_last:
        b = int(np.prod(shape[:-1]))
        xr2 = xr.reshape(b, n)
        xi2 = xi.reshape(b, n)
        tb = _tb_for(n)
        io = _plane_io(xr2, tb)
        pad = (-b) % tb
        if pad:
            xr2 = jnp.pad(xr2, ((0, pad), (0, 0)))
            xi2 = jnp.pad(xi2, ((0, pad), (0, 0)))
        run = _runner_last(n, sign, tb, scale, interpret, io,
                           envkey=_env_key())
        yr, yi = _chunk_rows_map(run, xr2, xi2, tb)
        return yr[:b].reshape(shape), yi[:b].reshape(shape)
    pre = int(np.prod(shape[:axis])) if axis else 1
    post = int(np.prod(shape[axis + 1:]))
    io = _plane_io(xr, n)
    if xr.dtype == jnp.bfloat16 and io == "f32":
        xr = xr.astype(jnp.float32)
        xi = xi.astype(jnp.float32)
    yr, yi = _mid_apply(xr.reshape(pre, n, post), xi.reshape(pre, n, post),
                        n, sign, scale, interpret, io)
    return yr.reshape(shape), yi.reshape(shape)
