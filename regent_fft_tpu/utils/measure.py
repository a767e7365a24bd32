"""Measure-mode planning: on-device schedule autotuning.

FFTW_MEASURE analog (``/root/reference/fftw-3.3.8/kernel/planner.c:518-623``
times candidate solver plans and memoizes the winner as wisdom; the
reference only ever plans with FFTW_ESTIMATE, ``src/fft.rg:313,319``).

Here a "solver" is a radix schedule.  ``measure_schedule`` compiles and
times each candidate on the actual device and installs the winner as a
schedule override (picked up by every later plan via wisdom).

Timing rule: one dispatch per measurement with FRESH input data and
min-of-k — repeated identical dispatches can hit execution caches on
remote-attach devices and report fiction.
"""
from __future__ import annotations

import time
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import factor as _factor


def candidate_schedules(n: int, max_radix: int = 128, cap: int = 8) -> List[Tuple[int, ...]]:
    """Distinct plausible radix schedules for n, cheapest-guess first."""
    cands = []

    def add(s):
        if s and s not in cands and int(np.prod(s)) == n:
            cands.append(tuple(s))

    add(_factor.factorize(n, max_radix))                  # greedy (estimate)
    try:
        from ..native import planner as _native
        s = _native.best_schedule(n, max_radix)
        if s:
            add(tuple(sorted(s, reverse=True)))           # cost-model DP
    except Exception:
        pass
    add(_factor.pallas_schedule(n, max_radix))            # balanced >=16
    # All 2-factor splits (f, n/f), both <= max_radix.
    f = 2
    while f * f <= n:
        if n % f == 0 and f <= max_radix and n // f <= max_radix:
            add(tuple(sorted((f, n // f), reverse=True)))
        f += 1
    if n <= max_radix:
        add((n,))
    return cands[:cap]


def time_fn(build, batch_shape, k: int = 5, seed: int = 0) -> float:
    """min-of-k seconds for one dispatch of ``build()`` on fresh inputs."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(build)
    rng = np.random.default_rng(seed)
    xr = jnp.asarray(rng.standard_normal(batch_shape), jnp.float32)
    xi = jnp.asarray(rng.standard_normal(batch_shape), jnp.float32)
    jax.block_until_ready(fn(xr, xi))  # compile
    best = float("inf")
    for i in range(k):
        a = jnp.asarray(rng.standard_normal(batch_shape), jnp.float32)
        b = jnp.asarray(rng.standard_normal(batch_shape), jnp.float32)
        jax.block_until_ready((a, b))
        t0 = time.perf_counter()
        jax.block_until_ready(fn(a, b))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_schedule(n: int, direction=None, precision: str = "highest",
                     batch: int = 1024, max_radix: int = 128,
                     k: int = 5, install: bool = True,
                     use_3m: bool = False) -> Tuple[Tuple[int, ...], dict]:
    """Time candidate schedules for a 1-D size; return (winner, timings).

    With ``install=True`` the winner becomes a schedule override, so all
    subsequent plans for this size (any rank/axis) use it — the wisdom
    write-back step of FFTW_MEASURE.
    """
    import jax
    from ..dtypes import Direction
    from ..ops.stockham import mixed_radix_fft, direct_dft

    direction = Direction.FORWARD if direction is None else direction
    sign = int(direction)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    timings = {}
    for sched in candidate_schedules(n, max_radix):
        if len(sched) == 1:
            build = lambda xr, xi: direct_dft(xr, xi, n, sign, prec, use_3m)
        else:
            build = (lambda s: lambda xr, xi: mixed_radix_fft(
                xr, xi, n, s, sign, prec, use_3m))(sched)
        try:
            timings[sched] = time_fn(build, (batch, n), k=k)
        except Exception as e:  # schedule failed to compile/run
            timings[sched] = float("inf")
    winner = min(timings, key=timings.get)
    if install and timings[winner] < float("inf"):
        _factor.set_schedule_override(n, winner, max_radix)
    return winner, {" ".join(map(str, s)): t for s, t in timings.items()}


def _time_core_honest(core, shape, iters: int = 4, reps: int = 2) -> float:
    """Fetch-timed scan chain with device-generated inputs (tpu_notes.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(a, b):
        def body(c, _):
            return core(*c), None
        out, _ = jax.lax.scan(body, (a, b), None, length=iters)
        return out

    @jax.jit
    def mk(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.normal(kr, shape, jnp.float32),
                jax.random.normal(ki, shape, jnp.float32))

    a, b = mk(0)
    out = many(a, b)
    jax.block_until_ready(out)
    _ = float(out[0].ravel()[0])
    best = float("inf")
    for i in range(reps):
        a, b = mk(i + 1)
        jax.block_until_ready((a, b))
        _ = float(a.ravel()[0])
        t0 = time.perf_counter()
        out = many(a, b)
        _ = float(out[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / iters


def measure_backends(spec, build_core, iters: int = 4, reps: int = 2):
    """Time the full plan core per backend candidate; return (winner, times).

    The cross-algorithm half of FFTW_MEASURE: the same problem is solved
    by the fused-einsum XLA path and (for power-of-two axes on TPU) the
    Stockham VPU butterfly path, and the faster one wins.
    """
    import dataclasses
    import jax

    cands = ["xla"]
    if jax.default_backend() == "tpu":
        lengths = spec.transform_lengths
        if all(n >= 2 and (n & (n - 1)) == 0 and n <= 1024 for n in lengths):
            cands.append("stockham")
        # hybrid helps iff the array's LAST axis is a transformed pow2 axis
        last_axis = len(spec.shape) - 1
        if last_axis in spec.axes:
            last = spec.shape[last_axis]
            if 2 <= last <= 1024 and (last & (last - 1)) == 0:
                cands.append("hybrid")
    timings = {}
    for b in cands:
        try:
            core = build_core(dataclasses.replace(spec, backend=b))
            timings[b] = _time_core_honest(core, spec.shape, iters, reps)
        except Exception:
            timings[b] = float("inf")
    winner = min(timings, key=timings.get)
    return winner, timings


def measure_plan_sizes(spec, batch: int = 1024, k: int = 3) -> dict:
    """Run measure-mode for every transform length of a PlanSpec."""
    results = {}
    for n in sorted(set(spec.transform_lengths)):
        if n < 2 or _factor.factorize(n, spec.max_radix) is None:
            continue  # direct trivial or Bluestein: nothing to tune yet
        winner, t = measure_schedule(
            n, spec.direction, spec.precision, batch=batch,
            max_radix=spec.max_radix, k=k, use_3m=spec.use_3m)
        results[n] = {"winner": winner, "timings": t}
    return results
