"""Measure-mode planning (FFTW_MEASURE analog) on CPU with tiny sizes."""
import numpy as np
import pytest

import regent_fft_tpu as rft
from regent_fft_tpu.ops import factor
from regent_fft_tpu.utils import measure
from regent_fft_tpu.utils.verify import rel_l2, tolerance


@pytest.fixture(autouse=True)
def _clean_overrides():
    yield
    factor._SCHEDULE_OVERRIDES.clear()
    rft.clear_plan_cache()


def test_candidate_schedules():
    cands = measure.candidate_schedules(1024)
    assert all(int(np.prod(c)) == 1024 for c in cands)
    assert len(set(cands)) == len(cands)
    assert (128, 8) in cands      # greedy
    assert (32, 32) in cands      # balanced


def test_measure_installs_override_and_stays_correct():
    winner, timings = measure.measure_schedule(256, batch=8, k=1)
    assert int(np.prod(winner)) == 256
    assert factor.schedule(256) == winner
    # plans built after measurement still verify
    x = (np.random.default_rng(0).standard_normal(256)
         + 1j * np.random.default_rng(1).standard_normal(256)).astype(np.complex64)
    assert rel_l2(rft.fft(x), np.fft.fft(x)) < tolerance(256)


def test_measure_mode_plan():
    p = rft.make_plan((4, 256), axes=(1,), kind=rft.Kind.C2C,
                      direction=rft.FORWARD, planner="measure")
    assert 256 in p.measurements
    x = (np.random.default_rng(2).standard_normal((4, 256))
         + 1j * np.random.default_rng(3).standard_normal((4, 256))).astype(np.complex64)
    assert rel_l2(p(x), np.fft.fft(x)) < tolerance(256)


def test_wisdom_roundtrips_schedules(tmp_path):
    factor.set_schedule_override(1024, (32, 32))
    path = str(tmp_path / "w.json")
    rft.export_wisdom_to_filename(path)
    rft.forget_wisdom()
    assert factor.schedule(1024) == factor.factorize(1024)
    rft.import_wisdom_from_filename(path)
    assert factor.schedule(1024) == (32, 32)
