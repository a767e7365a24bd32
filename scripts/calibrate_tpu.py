#!/usr/bin/env python
"""Hardware calibration + planner evidence run (VERDICT r1 item 5/9).

Run on a real TPU:
  python scripts/calibrate_tpu.py [--out wisdom.json]

1. Runs utils.calibrate.calibrate(install=True): measured MXU/VPU/HBM
   rates + per-stage overhead -> native DP cost model + roofline overlay.
2. For sizes where model-mode and estimate-mode disagree, times BOTH
   schedules with the executor's real code path and reports the winner
   (the FFTW "does planning rigor pay off" question, kernel/planner.c
   measurement analog).
3. Times Rader vs Bluestein for prime sizes (fftw-3.3.8/dft/rader.c
   analog): the same transform built both ways, honestly timed.
4. Exports wisdom (with the calibration section) to --out.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def schedule_comparison(sizes, batch=2048, iters=5):
    """Where do estimate and calibrated model disagree — and who wins?"""
    from regent_fft_tpu.ops import factor
    from regent_fft_tpu.utils import measure

    prec = jax.lax.Precision.HIGHEST
    rows = []
    for n in sizes:
        est = factor.schedule(n, mode="estimate")
        mod = factor.schedule(n, mode="model")
        if est is None or mod is None:
            continue
        row = {"n": n, "estimate": list(est), "model": list(mod)}
        if tuple(est) != tuple(mod):
            t_est = measure.time_fn(
                measure._schedule_step_fn(n, tuple(est), -1, prec, False),
                (batch, n), k=iters)
            t_mod = measure.time_fn(
                measure._schedule_step_fn(n, tuple(mod), -1, prec, False),
                (batch, n), k=iters)
            row.update(t_estimate_ms=round(t_est * 1e3, 4),
                       t_model_ms=round(t_mod * 1e3, 4),
                       model_speedup=round(t_est / t_mod, 3))
        rows.append(row)
    return rows


def rader_vs_bluestein(primes=(509, 1009), batch=1024, iters=5):
    from regent_fft_tpu.dtypes import Direction
    from regent_fft_tpu.ops import bluestein, factor, rader
    from regent_fft_tpu.utils import measure

    prec = jax.lax.Precision.HIGHEST
    rows = []
    for p in primes:
        if not rader.supported(p, 128):
            continue
        m = factor.next_fast_len(2 * p - 1, 128)
        fn_r = rader.build_rader_1d(p, Direction.FORWARD, 128, prec)
        fn_b = bluestein.build_bluestein_1d(p, Direction.FORWARD, m, 128, prec)
        t_r = measure.time_fn(fn_r, (batch, p), k=iters)
        t_b = measure.time_fn(fn_b, (batch, p), k=iters)
        rows.append({"p": p, "bluestein_m": m,
                     "t_rader_ms": round(t_r * 1e3, 4),
                     "t_bluestein_ms": round(t_b * 1e3, 4),
                     "rader_speedup": round(t_b / t_r, 3)})
    return rows


def main():
    ap = argparse.ArgumentParser()
    # Default to the system-wisdom autoload path so calibration STICKS
    # across processes (import-system-wisdom analog); --out '' disables.
    from regent_fft_tpu.utils.wisdom import default_wisdom_path
    ap.add_argument("--out", default=default_wisdom_path())
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from regent_fft_tpu.utils import calibrate as _cal
    from regent_fft_tpu.utils import wisdom

    cal = _cal.calibrate(install=True, quick=args.quick)
    print(json.dumps({"calibration": cal.to_dict(),
                      "derived": {"vpu_rate": cal.vpu_rate,
                                  "stage_overhead_units":
                                      cal.stage_overhead_units()}}))

    rows = schedule_comparison([1024, 2048, 4096, 640, 1000])
    print(json.dumps({"schedule_comparison": rows}))

    rows = rader_vs_bluestein()
    print(json.dumps({"rader_vs_bluestein": rows}))

    if args.out:
        wisdom.export_wisdom_to_filename(args.out)
        print(json.dumps({"wisdom_written": args.out}))


if __name__ == "__main__":
    main()
