"""Wisdom: serializable planner knowledge.

Analog of FFTW's wisdom import/export (``/root/reference/fftw-3.3.8/api/
export-wisdom*.c``, ``import-wisdom*.c``, consulted in ``api/apiplan.c:
58-60``) — unused by the reference because it plans with FFTW_ESTIMATE only
(``src/fft.rg:313,319``), but first-class here.

On TPU "wisdom" is (a) the problem specs worth pre-planning (so a service
can warm its plan cache + XLA compilation cache at startup) and (b) tuned
parameters per problem (factorization override, Pallas block sizes).  The
XLA persistent compilation cache handles compiled-binary reuse; this file
handles the planner-level knowledge.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

from ..dtypes import Direction, Kind, Norm
from ..plan import PlanSpec, make_plan, _PLAN_CACHE

WISDOM_VERSION = 1


def _spec_to_dict(spec: PlanSpec) -> dict:
    d = dataclasses.asdict(spec)
    d["kind"] = spec.kind.value
    d["direction"] = int(spec.direction)
    d["norm"] = spec.norm.value
    return d


def _spec_from_dict(d: dict) -> PlanSpec:
    d = dict(d)
    d["kind"] = Kind(d["kind"])
    d["direction"] = Direction(d["direction"])
    d["norm"] = Norm(d["norm"])
    d["shape"] = tuple(d["shape"])
    d["axes"] = tuple(d["axes"])
    return PlanSpec(**d)


def export_wisdom_to_string() -> str:
    """Serialize cached plan specs + tuned schedule overrides + measured
    backend winners (fftw_export_wisdom_to_string analog — FFTW wisdom
    stores the full solver decision, ``api/export-wisdom*.c``)."""
    from ..ops import factor as _factor
    from ..plan import (_BACKEND_WISDOM, _EXHAUSTIVE_WISDOM,
                        _PATIENT_WISDOM)
    from . import calibrate as _calibrate
    specs = [_spec_to_dict(s) for s in _PLAN_CACHE]
    overrides = [{"n": n, "max_radix": mr, "factors": list(f)}
                 for (n, mr), f in _factor._SCHEDULE_OVERRIDES.items()]
    backends = [{"spec": _spec_to_dict(k), "winner": w}
                for k, w in _BACKEND_WISDOM.items()]
    patient = [{"spec": _spec_to_dict(k), "winner": dict(w)}
               for k, w in _PATIENT_WISDOM.items()]
    exhaustive = [{"spec": _spec_to_dict(k), "winner": dict(w)}
                  for k, w in _EXHAUSTIVE_WISDOM.items()]
    from ..parallel.distributed import _DISTRIB_WISDOM
    distrib = [{"shape": list(shape), "n_devices": ndev, "direction": d,
                "norm": nv, "kind": kv, "strategy": dict(strat)}
               for (shape, ndev, d, nv, kv), strat in _DISTRIB_WISDOM.items()]
    out = {"version": WISDOM_VERSION, "library": "regent_fft_tpu",
           "plans": specs, "schedules": overrides, "backends": backends,
           "patient": patient, "exhaustive": exhaustive,
           "distrib": distrib}
    cal = _calibrate.current()
    if cal is not None:
        # Per-chip cost-model calibration rides along, so a fresh process
        # gets the calibrated model planner without re-benching.
        out["calibration"] = cal.to_dict()
    return json.dumps(out, indent=2)


def export_wisdom_to_filename(path: str) -> None:
    with open(path, "w") as f:
        f.write(export_wisdom_to_string())


def import_wisdom_from_string(s: str, build: bool = True) -> int:
    """Re-plan every recorded problem; returns the number imported.

    With ``build=True`` plans are constructed eagerly (twiddle tables on
    device); execution still compiles lazily on first call — pair with
    XLA's persistent compilation cache for full warm starts.
    """
    data = json.loads(s)
    if data.get("version") != WISDOM_VERSION:
        raise ValueError(f"unsupported wisdom version: {data.get('version')}")
    from ..ops import factor as _factor
    from ..plan import (_BACKEND_WISDOM, _EXHAUSTIVE_WISDOM,
                        _PATIENT_WISDOM, _backend_key)
    from . import calibrate as _calibrate
    n = 0
    cal = data.get("calibration")
    if cal is not None:
        _calibrate.install_calibration(_calibrate.Calibration.from_dict(cal))
        n += 1
    for o in data.get("schedules", []):
        _factor.set_schedule_override(o["n"], tuple(o["factors"]),
                                      o.get("max_radix", 128))
        n += 1
    for o in data.get("backends", []):
        _BACKEND_WISDOM[_backend_key(_spec_from_dict(o["spec"]))] = o["winner"]
        n += 1
    for o in data.get("patient", []):
        _PATIENT_WISDOM[_backend_key(_spec_from_dict(o["spec"]))] = \
            dict(o["winner"])
        n += 1
    for o in data.get("exhaustive", []):
        _EXHAUSTIVE_WISDOM[_backend_key(_spec_from_dict(o["spec"]))] = \
            dict(o["winner"])
        n += 1
    if data.get("distrib"):
        from ..parallel.distributed import _DISTRIB_WISDOM, _distrib_key
        for o in data["distrib"]:
            strat = dict(o["strategy"])
            if "mesh_shape" in strat:
                strat["mesh_shape"] = tuple(strat["mesh_shape"])
            _DISTRIB_WISDOM[_distrib_key(
                o["shape"], o["n_devices"], Direction(o["direction"]),
                Norm(o["norm"]), Kind(o.get("kind", Kind.C2C.value)))] = strat
            n += 1
    for d in data.get("plans", []):
        spec = _spec_from_dict(d)
        if build:
            make_plan(spec)
        n += 1
    return n


def import_wisdom_from_filename(path: str, build: bool = True) -> int:
    with open(path) as f:
        return import_wisdom_from_string(f.read(), build=build)


def forget_wisdom() -> None:
    """fftw_forget_wisdom analog: drop plans, schedules, backend winners,
    distributed-strategy winners, and the cost-model calibration."""
    from ..ops import factor as _factor
    from ..plan import (_BACKEND_WISDOM, _EXHAUSTIVE_WISDOM,
                        _PATIENT_WISDOM)
    from . import calibrate as _calibrate
    from ..parallel.distributed import _DISTRIB_WISDOM
    _PLAN_CACHE.clear()
    _factor._SCHEDULE_OVERRIDES.clear()
    _BACKEND_WISDOM.clear()
    _PATIENT_WISDOM.clear()
    _EXHAUSTIVE_WISDOM.clear()
    _DISTRIB_WISDOM.clear()
    _calibrate.reset_calibration()


# ---------------------------------------------------------------------------
# Cross-process wisdom sync (fftw_mpi_gather_wisdom / broadcast_wisdom,
# ``/root/reference/fftw-3.3.8/mpi/wisdom-api.c:44,86``).  On a multi-host
# pod every process races/measures independently; these move the winners
# over the jax.distributed world so one process's MEASURE/PATIENT results
# apply everywhere instead of being re-raced per host.
# ---------------------------------------------------------------------------

def _allgather_strings(s: str):
    """All processes' strings, in process order (variable lengths are
    padded to the max and sliced back — collectives need equal shapes)."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils as mhu
    b = np.frombuffer(s.encode(), np.uint8)
    lens = np.asarray(mhu.process_allgather(
        np.array([b.size], np.int32))).reshape(-1)
    mx = max(1, int(lens.max()))
    pad = np.zeros(mx, np.uint8)
    pad[:b.size] = b
    allb = np.asarray(mhu.process_allgather(pad))
    return [bytes(allb[i, :int(lens[i])].tobytes()).decode()
            for i in range(allb.shape[0])]


def gather_wisdom(build: bool = False) -> int:
    """Merge every process's wisdom into PROCESS 0 (fftw_mpi_gather_wisdom,
    ``mpi/wisdom-api.c:86-105``): after a distributed measure/patient run,
    rank 0 holds the union and can persist it (``export_wisdom_to_filename``
    + the system-wisdom autoload path).  Returns the number of entries
    imported on process 0; 0 elsewhere.  Conflicting winners resolve in
    process order (last import wins), matching FFTW's any-process-wins
    note.  No-op in single-process worlds."""
    import jax
    if jax.process_count() == 1:
        return 0
    all_w = _allgather_strings(export_wisdom_to_string())
    if jax.process_index() != 0:
        return 0
    n = 0
    for i, w in enumerate(all_w):
        if i == jax.process_index():
            continue
        n += import_wisdom_from_string(w, build=build)
    return n


def broadcast_wisdom(build: bool = False) -> int:
    """Import PROCESS 0's wisdom on every other process
    (fftw_mpi_broadcast_wisdom, ``mpi/wisdom-api.c:44-64``): pair with
    :func:`gather_wisdom` so one process measures, gathers, and the pod
    plans identically.  Returns entries imported (0 on process 0)."""
    import jax
    if jax.process_count() == 1:
        return 0
    s = (export_wisdom_to_string() if jax.process_index() == 0 else "")
    import numpy as np
    from jax.experimental import multihost_utils as mhu
    b = np.frombuffer(s.encode(), np.uint8)
    ln = int(np.asarray(mhu.broadcast_one_to_all(
        np.array([b.size], np.int32)))[0])
    pad = np.zeros(max(1, ln), np.uint8)
    pad[:b.size] = b
    allb = np.asarray(mhu.broadcast_one_to_all(pad))
    if jax.process_index() == 0:
        return 0
    return import_wisdom_from_string(bytes(allb[:ln].tobytes()).decode(),
                                     build=build)


def default_wisdom_path() -> str:
    return os.environ.get("REGENT_FFT_WISDOM",
                          os.path.expanduser("~/.regent_fft_tpu.wisdom.json"))


def autoload_system_wisdom() -> int:
    """Import-time system-wisdom load — the analog of FFTW consulting
    ``/etc/fftw/`` wisdom implicitly
    (``/root/reference/fftw-3.3.8/api/import-system-wisdom.c:21-40``).

    Consults ``$REGENT_FFT_WISDOM`` (or ``~/.regent_fft_tpu.wisdom.json``)
    so calibration, tuned schedules, backend winners, and distributed
    strategy winners from ``scripts/calibrate_tpu.py`` / measure-mode runs
    survive into fresh processes without an explicit import call.  Plans
    themselves are NOT built eagerly (``build=False``) — import stays
    cheap.  Silent no-op when the file is absent or unreadable; disabled
    entirely by ``REGENT_FFT_NO_WISDOM=1`` (hermetic tests/benchmarks).
    """
    if os.environ.get("REGENT_FFT_NO_WISDOM"):
        return 0
    path = default_wisdom_path()
    if not os.path.exists(path):
        return 0
    try:
        return import_wisdom_from_filename(path, build=False)
    except Exception:
        return 0  # corrupt/stale wisdom must never break import
