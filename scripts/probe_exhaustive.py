"""EXHAUSTIVE planner tier on hardware: does the knob grid find wins?

Runs planner="exhaustive" for two plans whose knob landscapes the r4/r5
probes mapped by hand, prints the race tables, then times the resulting
plan vs the estimate-planner default.

Usage (idle host): python scripts/probe_exhaustive.py [--big]
"""
import os
import sys
import time

sys.path.insert(0, ".")
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from regent_fft_tpu.plan import PlanSpec, make_plan
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.utils import timing


def run(name, shape, dtype="complex64", axes=None):
    axes = axes or tuple(range(len(shape)))
    base = dict(shape=shape, axes=axes, kind=Kind.C2C,
                direction=Direction.FORWARD, norm=Norm.NONE, dtype=dtype)
    t0 = time.perf_counter()
    pex = make_plan(PlanSpec(planner="exhaustive", **base))
    plan_t = time.perf_counter() - t0
    ex = pex.measurements["exhaustive"]
    print(f"[{name}] exhaustive planning took {plan_t:.1f}s; "
          f"winner={ex['winner']}", flush=True)
    if isinstance(ex["timings"], dict):
        for k, v in sorted(ex["timings"]["knobs"].items(),
                           key=lambda kv: kv[1]):
            print(f"    {k}: {v * 1e3:.3f} ms", flush=True)
    pest = make_plan(PlanSpec(planner="estimate", **base))
    for label, p in (("estimate", pest), ("exhaustive", pex)):
        t = timing.time_plan(p, iters=4, reps=3)
        print(f"[{name}] {label}: {t * 1e3:.3f} ms", flush=True)


def main():
    run("1d_1024x4096", (4096, 1024), axes=(1,))
    run("3d_256x4_c32", (4, 256, 256, 256), dtype="complex32",
        axes=(1, 2, 3))
    if "--big" in sys.argv:
        run("3d_512", (512, 512, 512))


if __name__ == "__main__":
    main()
