"""EXHAUSTIVE planner tier: patient + kernel-knob grid + deep schedules.

Top of the FFTW rigor ladder (``kernel/planner.c:518-623``: EXHAUSTIVE
clears the solver restrictions PATIENT keeps; VERDICT r4 missing #4).
On the CPU mesh the kernel knobs collapse (interpret/XLA paths), so
these tests validate the machinery — knob scoping, candidate grids,
deep schedule space, wisdom persistence, correctness — and hardware
scripts validate the speedups.
"""
import numpy as np
import pytest

import regent_fft_tpu as rft
from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.ops import pallas_stockham as ps
from regent_fft_tpu.plan import (PlanSpec, _EXHAUSTIVE_WISDOM,
                                 _backend_key, make_plan)
from regent_fft_tpu.utils.measure import candidate_schedules
from regent_fft_tpu.utils.verify import rel_l2, tolerance

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _clean_exhaustive_wisdom():
    yield
    _EXHAUSTIVE_WISDOM.clear()


def crand(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


def _spec(shape, **kw):
    kw.setdefault("axes", tuple(range(len(shape))))
    kw.setdefault("kind", Kind.C2C)
    kw.setdefault("direction", Direction.FORWARD)
    kw.setdefault("norm", Norm.NONE)
    return PlanSpec(shape=shape, **kw)


def test_planner_value_validated():
    with pytest.raises(ValueError):
        _spec((8, 8), planner="bogus")
    assert _spec((8, 8), planner="exhaustive").planner == "exhaustive"


def test_knob_override_scopes_and_restores():
    import os
    assert os.environ.get("REGENT_FFT_TAIL_MT") is None
    before = ps._env_key()
    with ps.knob_override({"REGENT_FFT_TAIL_MT": "32"}):
        assert os.environ["REGENT_FFT_TAIL_MT"] == "32"
        assert ps._env_key() != before          # runner caches re-key
        assert ps._tail_mt_cap() == 32
    assert os.environ.get("REGENT_FFT_TAIL_MT") is None
    assert ps._env_key() == before
    with pytest.raises(ValueError):
        ps.knob_override({"NOT_A_KNOB": "1"})


def test_tail_mt_knob_changes_tables_coherently():
    # The knob must flow through to the actual stage schedule + tables
    # in-process (no stale-cache poisoning).
    mt_default = ps._tail_mt(1024)
    with ps.knob_override({"REGENT_FFT_TAIL_MT": "32"}):
        # cap 32: the divide-by-4 walk 1024 -> 256 -> 64 -> 16
        assert ps._tail_mt(1024) == 16 != mt_default
        wr32, _, _ = ps._packed_tables(1024, -1)
    assert ps._tail_mt(1024) == mt_default
    wr_def, _, _ = ps._packed_tables(1024, -1)
    assert wr32.shape != wr_def.shape


def test_deep_schedule_space_is_wider():
    shallow = candidate_schedules(1024)
    deep = candidate_schedules(1024, deep=True)
    assert set(shallow) <= set(deep)
    assert len(deep) > len(shallow)
    # both orderings of a 2-factor split and a 3-factor split appear
    assert any(len(s) == 2 and s[0] < s[1] for s in deep)
    assert any(len(s) == 3 for s in deep)
    for s in deep:
        assert int(np.prod(s)) == 1024


def test_exhaustive_planner_runs_and_persists():
    _EXHAUSTIVE_WISDOM.clear()
    spec = _spec((4, 32, 32), planner="exhaustive")
    p = make_plan(spec)
    assert "exhaustive" in p.measurements
    w = p.measurements["exhaustive"]["winner"]
    assert set(w) >= {"axis0_impl", "f2_impl", "knobs"}
    t = p.measurements["exhaustive"]["timings"]
    assert "defaults" in t["knobs"]          # defaults always a candidate
    assert _backend_key(spec) in _EXHAUSTIVE_WISDOM
    x = crand((4, 32, 32))
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)
    # Second plan for the same problem reuses the cached winner.
    rft.destroy_plan(p)
    p2 = make_plan(spec)
    assert p2.measurements["exhaustive"]["timings"] == "cached-wisdom"
    rft.destroy_plan(p2)


def test_exhaustive_wisdom_roundtrip():
    _EXHAUSTIVE_WISDOM.clear()
    spec = _spec((4, 16, 16), planner="exhaustive")
    make_plan(spec)
    s = rft.export_wisdom_to_string()
    assert '"exhaustive"' in s
    saved = dict(_EXHAUSTIVE_WISDOM)
    rft.forget_wisdom()
    assert not _EXHAUSTIVE_WISDOM
    rft.import_wisdom_from_string(s, build=False)
    assert _EXHAUSTIVE_WISDOM == saved


def test_exhaustive_complex32_races_mxu_impl():
    from regent_fft_tpu.plan import _build_core
    from regent_fft_tpu.utils.measure import measure_exhaustive
    spec = _spec((4, 64, 64), dtype="complex32")
    winner, timings = measure_exhaustive(spec, _build_core, iters=2,
                                         reps=1)
    assert any("mxu_impl" in name for name in timings["knobs"])
    assert not any("tail_mt" in name for name in timings["knobs"])
