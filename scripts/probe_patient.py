"""Hardware validation of the PATIENT planner tier.

Races planner="measure" vs planner="patient" plans on real suite-row
shapes and prints the impl cross-product timings — the PATIENT tier must
beat (or tie) measure everywhere, since its candidate set is a superset.
Run on an IDLE host (CLAUDE.md benchmarking rules).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.plan import PlanSpec, make_plan, _PATIENT_WISDOM
from regent_fft_tpu.utils import timing as _timing

SHAPES = [
    (64, 64, 256),      # the r2 measure-mode demo shape
    (256, 256, 256),    # suite 3-D row (single batch)
    (512, 512, 512),    # headline
]


def time_plan(p, iters=4, reps=2):
    step, make_carry = _timing.core_chain(p._core, p.spec)
    return _timing.time_chain(step, make_carry, iters, reps)


def main():
    rft.forget_wisdom()
    for shape in SHAPES:
        spec_kw = dict(axes=tuple(range(len(shape))), kind=Kind.C2C,
                       direction=Direction.FORWARD, norm=Norm.NONE)
        t0 = time.time()
        pm = make_plan(PlanSpec(shape=shape, planner="measure", **spec_kw))
        tm = time_plan(pm)
        t1 = time.time()
        pp = make_plan(PlanSpec(shape=shape, planner="patient", **spec_kw))
        tp = time_plan(pp)
        t2 = time.time()
        pat = pp.measurements.get("patient", {})
        print(f"shape={shape}: measure {tm*1e3:.2f} ms "
              f"(plan {t1-t0:.0f}s) | patient {tp*1e3:.2f} ms "
              f"(plan {t2-t1:.0f}s) winner={pat.get('winner')}")
        t = pat.get("timings")
        if isinstance(t, dict):
            for k, v in sorted(t.items(), key=lambda kv: kv[1]):
                print(f"    {k}: {v*1e3:.2f} ms")


if __name__ == "__main__":
    main()
