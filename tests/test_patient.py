"""PATIENT planner tier: per-axis kernel-impl cross-product racing.

FFTW rigor-ladder analog (``kernel/planner.c:518-623``): ESTIMATE/MODEL/
MEASURE existed through round 3; PATIENT widens the race to the
axis0-impl x trailing-pair-impl cross-product (VERDICT r3 missing #5).
On the CPU mesh the kernel impl variants collapse (interpret mode), so
these tests validate the machinery — spec knobs, candidate pruning,
wisdom persistence, correctness per forced variant — and hardware
scripts validate the speedups (scripts/probe_patient.py).
"""
import dataclasses

import numpy as np
import pytest

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.plan import (PlanSpec, _PATIENT_WISDOM, _backend_key,
                                 _build_core, make_plan)
from regent_fft_tpu.utils.verify import rel_l2, tolerance

RNG = np.random.default_rng(5)


@pytest.fixture(autouse=True)
def _clean_patient_wisdom():
    # Don't leak patient winners into later test files' wisdom exports.
    yield
    _PATIENT_WISDOM.clear()


def crand(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


def _spec(shape, **kw):
    kw.setdefault("axes", tuple(range(len(shape))))
    kw.setdefault("kind", Kind.C2C)
    kw.setdefault("direction", Direction.FORWARD)
    kw.setdefault("norm", Norm.NONE)
    return PlanSpec(shape=shape, **kw)


def test_spec_impl_knobs_validate():
    with pytest.raises(ValueError):
        _spec((8, 8), axis0_impl="bogus")
    with pytest.raises(ValueError):
        _spec((8, 8), f2_impl="bogus")
    s = _spec((8, 8), axis0_impl="fourstep", f2_impl="ring")
    assert s.axis0_impl == "fourstep" and s.f2_impl == "ring"


def test_f2_off_unfuses_trailing_pair():
    # With the stockham backend, the trailing pair normally fuses into one
    # stockham2 step; f2_impl="off" must split it into two passes.
    fused = _build_core(_spec((8, 64, 128), backend="stockham"))
    unfused = _build_core(_spec((8, 64, 128), backend="stockham",
                                f2_impl="off"))
    assert any(k == "stockham2" for k, _, _ in fused._plan_steps)
    assert not any(k == "stockham2" for k, _, _ in unfused._plan_steps)
    x = crand((8, 64, 128))
    xr, xi = np.real(x).astype(np.float32), np.imag(x).astype(np.float32)
    ref = np.fft.fftn(x.astype(np.complex128))
    for core in (fused, unfused):
        yr, yi = core(xr, xi)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert rel_l2(got, ref) < tolerance(x.size)


def test_patient_planner_runs_and_persists():
    _PATIENT_WISDOM.clear()
    spec = _spec((4, 32, 32), planner="patient")
    p = make_plan(spec)
    assert "patient" in p.measurements
    w = p.measurements["patient"]["winner"]
    assert set(w) >= {"axis0_impl", "f2_impl"}
    assert _backend_key(spec) in _PATIENT_WISDOM
    x = crand((4, 32, 32))
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)
    # Second plan for the same problem reuses the cached winner.
    rft.destroy_plan(p)
    p2 = make_plan(spec)
    assert p2.measurements["patient"]["timings"] == "cached-wisdom"
    rft.destroy_plan(p2)


def test_patient_wisdom_roundtrip():
    _PATIENT_WISDOM.clear()
    spec = _spec((4, 16, 16), planner="patient")
    p = make_plan(spec)
    s = rft.export_wisdom_to_string()
    assert '"patient"' in s
    saved = dict(_PATIENT_WISDOM)
    rft.forget_wisdom()
    assert not _PATIENT_WISDOM
    rft.import_wisdom_from_string(s, build=False)
    assert _PATIENT_WISDOM == saved


def test_patient_candidates_pruned_without_kernel_steps():
    # An xla-backend 1-D plan has no stockham steps: the race must
    # degenerate to the single "auto/auto" candidate, not burn time on
    # impossible impls.
    from regent_fft_tpu.utils.measure import measure_patient
    spec = _spec((2048,), backend="xla")
    winner, timings = measure_patient(spec, _build_core, iters=2, reps=1)
    assert list(timings) == ["axis0=auto f2=auto"]
    assert winner["axis0_impl"] == "auto" and winner["f2_impl"] == "auto"


def test_forced_impls_match_auto_on_cpu():
    # interpret mode collapses the variants; results must agree exactly
    # in structure (correctness per forced variant).
    x = crand((4, 32, 32))
    ref = np.fft.fftn(x)
    for a0 in ("auto", "grid"):
        for f2 in ("auto", "off"):
            p = make_plan(_spec((4, 32, 32), backend="stockham",
                                axis0_impl=a0, f2_impl=f2))
            assert rel_l2(p(x), ref) < tolerance(x.size), (a0, f2)
