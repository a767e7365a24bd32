"""bench.py suite scheduler: staleness hashing + prior-value merging.

VERDICT r4 weak #1 asked the bench to fresh-measure rows whose code
paths changed since the prior artifact before re-measuring stable ones,
and never to inherit prior values across a code change.  These tests
pin the pure-logic half of that contract (the TPU half is the driver's
bench run).  Reference model: FFTW verifies every bench run
(/root/reference/fftw-3.3.8/libbench2/bench-main.c).
"""
import importlib.util
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def test_deps_hash_deterministic_and_sensitive():
    h1 = bench._deps_hash(("plan.py", "dtypes.py"))
    h2 = bench._deps_hash(("plan.py", "dtypes.py"))
    assert h1 == h2 and len(h1) == 12
    assert bench._deps_hash(("plan.py",)) != h1
    # a missing file must not crash (hash still covers the name)
    assert bench._deps_hash(("no_such_file.py",))


def test_merge_reuses_only_hash_matching_prior():
    suite = {
        "stable": {"skipped": "bench deadline", "code_hash": "aaa"},
        "changed": {"skipped": "bench deadline", "code_hash": "bbb"},
        "fresh": {"time_ms": 1.0, "code_hash": "ccc"},
    }
    prior = {
        "stable": {"time_ms": 2.0, "code_hash": "aaa"},
        "changed": {"time_ms": 3.0, "code_hash": "OLD"},
        "fresh": {"time_ms": 9.0, "code_hash": "ccc"},
    }
    out = bench.merge_prior_suite(suite, prior)
    # hash-matching prior value is inherited, tagged
    assert out["stable"]["time_ms"] == 2.0
    assert out["stable"]["from_prior_run"] is True
    # code path changed -> prior value must NOT resurface
    assert "time_ms" not in out["changed"]
    assert "prior_not_reused" in out["changed"]
    # freshly measured rows are untouched
    assert out["fresh"]["time_ms"] == 1.0
    assert "from_prior_run" not in out["fresh"]


def test_merge_without_prior_hash_never_reuses():
    # r4-era artifacts carry no code_hash: conservatively stale
    suite = {"r": {"skipped": "bench deadline", "code_hash": "aaa"}}
    prior = {"r": {"time_ms": 5.0}}
    out = bench.merge_prior_suite(suite, prior)
    assert "time_ms" not in out["r"]
