"""One-shot hardware calibration of the planner cost model.

FFTW's planner learns per-machine truth by *timing* candidate solvers
(``/root/reference/fftw-3.3.8/kernel/planner.c:518-623``) and persists the
knowledge as wisdom (``api/export-wisdom*.c``).  The TPU analog here has two
halves: measure-mode (``utils.measure``) times whole schedules, and THIS
module calibrates the *model* planner — the native DP cost model in
``native/planner.cc`` — from three microbenchmarks run once per chip:

* ``measure_mxu_tflops``    — achieved f32 matmul rate at MXU-edge width,
* ``measure_vpu_gflops``    — achieved elementwise rate on a twiddle-shaped
                              complex multiply (6 flops/element),
* ``measure_stage_overhead``— fixed per-stage pipeline cost, extracted as
                              the timing residual between a 3-stage and a
                              2-stage schedule of the same size after the
                              matmul/twiddle flops are accounted at the
                              measured rates.

All three use the package-wide honest timing methodology
(``utils.timing.time_chain``).  ``calibrate(install=True)`` feeds the
results to ``rftp_set_cost_params`` (making model-mode planning reflect
this chip), overlays the roofline ``HardwareModel`` with measured numbers
(so reported roofline fractions stop depending on a datasheet guess), and
registers the calibration for wisdom export — a later process that imports
wisdom gets the calibrated planner without re-running the bench.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class Calibration:
    """Measured per-chip numbers + derived cost-model parameters.

    ``mxu_rate`` is fixed at 1.0: the model's time unit is "one MXU flop
    at the measured rate", so only the *ratios* below steer the DP.
    """

    device: str
    mxu_tflops: float          # achieved f32 matmul rate (TFLOP/s)
    vpu_gflops: float          # achieved elementwise VPU rate (GFLOP/s)
    hbm_gbps: float            # achievable HBM bandwidth (GB/s)
    stage_overhead_s: float    # fixed seconds per pipeline stage (per call)
    # derived cost-model parameters (native/planner.cc CostParams)
    mxu_edge: float = 128.0
    mxu_rate: float = 1.0

    @property
    def vpu_rate(self) -> float:
        """VPU flops per MXU flop per unit time (CostParams.vpu_rate)."""
        if self.mxu_tflops <= 0:
            return 0.05
        return max(self.vpu_gflops * 1e9 / (self.mxu_tflops * 1e12), 1e-6)

    @property
    def bw_unit(self) -> float:
        """HBM byte cost in MXU-flop time units (CostParams.bw_unit)."""
        if self.mxu_tflops <= 0 or self.hbm_gbps <= 0:
            return 100.0
        return self.mxu_tflops * 1e12 / (self.hbm_gbps * 1e9)

    def stage_overhead_units(self, n: int = 1024, batch: int = 1024) -> float:
        """CostParams.stage_overhead: the model charges
        ``stage_overhead * n * 0.25`` MXU-flop units per stage, per batch
        row; convert the measured fixed seconds accordingly."""
        if self.stage_overhead_s <= 0 or self.mxu_tflops <= 0:
            return 0.0
        units = self.stage_overhead_s * self.mxu_tflops * 1e12
        return units / (0.25 * n * batch)

    def to_dict(self) -> dict:
        return {"device": self.device, "mxu_tflops": self.mxu_tflops,
                "vpu_gflops": self.vpu_gflops, "hbm_gbps": self.hbm_gbps,
                "stage_overhead_s": self.stage_overhead_s,
                "mxu_edge": self.mxu_edge, "mxu_rate": self.mxu_rate}

    @staticmethod
    def from_dict(d: dict) -> "Calibration":
        return Calibration(
            device=str(d.get("device", "unknown")),
            mxu_tflops=float(d["mxu_tflops"]),
            vpu_gflops=float(d["vpu_gflops"]),
            hbm_gbps=float(d["hbm_gbps"]),
            stage_overhead_s=float(d["stage_overhead_s"]),
            mxu_edge=float(d.get("mxu_edge", 128.0)),
            mxu_rate=float(d.get("mxu_rate", 1.0)))


_CURRENT: Optional[Calibration] = None


def current() -> Optional[Calibration]:
    """The installed calibration, if any (None before calibrate/import)."""
    return _CURRENT


# ---------------------------------------------------------------------------
# Microbenchmarks (honest chained timing; ~seconds total on hardware)
# ---------------------------------------------------------------------------

def measure_mxu_tflops(m: int = 8192, k: int = 1024, iters: int = 4,
                       reps: int = 2) -> float:
    """Achieved f32 matmul rate of an (m, k) @ (k, k) chain.

    k is a multiple of the 128-wide MXU edge so the contraction runs at
    full systolic efficiency; the carry shape equals the output shape so
    the chain composes.  Weights are scaled by 1/sqrt(k) to keep values
    O(1) across iterations.  Runs at HIGHEST precision — the rate the
    executor's einsum stages actually see (the f32 emulation passes are
    the point, not an artifact).  The default shape costs ~17 GFLOP per
    iteration so the adaptive timing window is genuinely MXU-bound.
    """
    import jax
    import jax.numpy as jnp
    from . import timing as _timing

    w = (np.random.default_rng(0).standard_normal((k, k))
         / math.sqrt(k)).astype(np.float32)

    def step(c):
        return jax.lax.dot_general(
            c, jnp.asarray(w), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def make_carry(seed):
        return jax.random.normal(jax.random.PRNGKey(seed), (m, k),
                                 jnp.float32)

    t = _timing.time_chain(step, make_carry, iters, reps)
    return 2.0 * m * k * k / t / 1e12


def measure_vpu_gflops(rows: int = 1024, cols: int = 1024, iters: int = 8,
                       reps: int = 2, inner: int = 32) -> float:
    """Achieved elementwise rate on a twiddle-shaped complex multiply.

    One chain iteration applies (a+bi) * (c+di) with constant twiddle
    planes ``inner`` times in a row — exactly the inter-stage twiddle
    workload the cost model prices at 6 flops/element, with enough
    arithmetic intensity (inner*6 flops per 16 bytes) that the number
    reflects the VPU rather than HBM streaming.
    """
    import jax
    import jax.numpy as jnp
    from . import timing as _timing

    rng = np.random.default_rng(1)
    theta = rng.uniform(0, 2 * np.pi, (rows, cols))
    cr = np.cos(theta).astype(np.float32)
    ci = np.sin(theta).astype(np.float32)

    def step(c):
        a, b = c
        wr, wi = jnp.asarray(cr), jnp.asarray(ci)
        for _ in range(inner):
            a, b = a * wr - b * wi, a * wi + b * wr
        return (a, b)

    def make_carry(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.random.normal(kr, (rows, cols), jnp.float32),
                jax.random.normal(ki, (rows, cols), jnp.float32))

    t = _timing.time_chain(step, make_carry, iters, reps)
    return 6.0 * inner * rows * cols / t / 1e9


def measure_stage_overhead_s(n: int = 1024, batch: int = 1024,
                             mxu_tflops: float = 0.0,
                             vpu_gflops: float = 0.0,
                             hbm_gbps: float = 0.0,
                             iters: int = 6, reps: int = 2) -> float:
    """Fixed per-stage cost: what the rate model fails to predict.

    Times the executor's real 2-stage path (``mixed_radix_fft_axis``),
    subtracts the cost-model prediction at the measured rates (2 HBM
    passes + true matmul flops + one twiddle pass), and attributes half
    the residual to each stage.  Clamped at >= 0.  This is deliberately
    measured on the SAME executor the model plans for — an earlier
    version compared the 2-stage and flattened 3-stage executors and
    absorbed the flattened pipeline's 12x traffic penalty into
    "overhead", wrecking the calibration.
    """
    from . import measure as _measure
    from ..ops import stockham as _stockham
    from ..ops import factor as _factor
    import jax

    s2 = _stockham.best_two_factor(n, _factor.DEFAULT_MAX_RADIX)
    if s2 is None:
        raise ValueError(f"n={n} lacks a two-factor split; pick a smooth n")
    prec = jax.lax.Precision.HIGHEST
    t2 = _measure.time_fn(
        _measure._schedule_step_fn(n, s2, -1, prec, False),
        (batch, n), k=iters)
    predicted = 0.0
    if hbm_gbps > 0:
        predicted += 2 * 16.0 * n * batch / (hbm_gbps * 1e9)
    if mxu_tflops > 0:
        predicted += 8.0 * n * sum(s2) * batch / (mxu_tflops * 1e12)
    if vpu_gflops > 0:
        predicted += 6.0 * n * batch / (vpu_gflops * 1e9)
    return max(t2 - predicted, 0.0) / 2.0


# ---------------------------------------------------------------------------
# Top level
# ---------------------------------------------------------------------------

def calibrate(install: bool = True, quick: bool = False) -> Calibration:
    """Run the microbench suite; optionally install the results.

    ``install=True`` (default) pushes the derived parameters into the
    native DP planner, overlays the roofline hardware model with measured
    rates, and registers the calibration for wisdom export.  ``quick``
    shrinks every probe (CI / CPU smoke — numbers are valid but noisy).
    """
    import jax
    from . import timing as _timing

    device = "unknown"
    try:
        device = jax.devices()[0].device_kind
    except Exception:
        pass
    if quick:
        mxu = measure_mxu_tflops(m=512, k=256, iters=3, reps=2)
        vpu = measure_vpu_gflops(rows=256, cols=512, iters=3, reps=2)
        hbm = _timing.measured_copy_gbps(nbytes=1 << 25, iters=3, reps=2,
                                         min_bytes=1 << 25)
        ovh = measure_stage_overhead_s(n=256, batch=64, mxu_tflops=mxu,
                                       vpu_gflops=vpu, hbm_gbps=hbm, iters=3)
        cal = Calibration(device=device, mxu_tflops=mxu, vpu_gflops=vpu,
                          hbm_gbps=hbm, stage_overhead_s=ovh)
        if install:
            install_calibration(cal)
        return cal
    mxu = measure_mxu_tflops()
    vpu = measure_vpu_gflops()
    hbm = _timing.measured_copy_gbps()
    ovh = measure_stage_overhead_s(mxu_tflops=mxu, vpu_gflops=vpu,
                                   hbm_gbps=hbm)
    cal = Calibration(device=device, mxu_tflops=mxu, vpu_gflops=vpu,
                      hbm_gbps=hbm, stage_overhead_s=ovh)
    if install:
        install_calibration(cal)
    return cal


def install_calibration(cal: Calibration) -> None:
    """Apply a calibration (fresh or imported from wisdom) process-wide."""
    global _CURRENT
    _CURRENT = cal
    from ..native import planner as _native
    from . import flopcount as _fc
    _native.set_cost_params(cal.mxu_edge, cal.mxu_rate, cal.vpu_rate,
                            cal.stage_overhead_units(), cal.bw_unit)
    _fc.install_measured(cal.device, hbm_gbps=cal.hbm_gbps,
                         f32_tflops=cal.mxu_tflops)
    from .plog import logger
    logger.info("calibration installed: %s", cal.to_dict())


def reset_calibration() -> None:
    """Drop the installed calibration (native params back to defaults)."""
    global _CURRENT
    _CURRENT = None
    from ..native import planner as _native
    from . import flopcount as _fc
    _native.set_cost_params()
    _fc.clear_measured()
