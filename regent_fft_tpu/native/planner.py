"""ctypes loader for the native C++ planner, with JIT build-on-demand.

Mirrors the reference's mapper build shim, which shells out to ``$CXX
-shared -fPIC`` at Regent compile time and links the result
(``/root/reference/test/test_mapper.rg:15-59``).  Honors ``CXX`` and
``REGENT_FFT_NATIVE`` (set to ``0`` to force the pure-Python fallback).

Every entry point has identical-semantics Python fallbacks in
``regent_fft_tpu.ops.factor``; tests assert native/Python parity.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import threading
from typing import List, Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "planner.cc")


def _src_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


# The library filename embeds a hash of planner.cc: a binary can only ever
# be loaded if it was built from the exact source present in the tree
# (review requirement — no unreviewable prebuilt blob can shadow the
# source).  Binaries are never committed (.gitignore *.so).
_SO = os.path.join(_DIR, f"libplanner-{sys.platform}-{_src_digest()}.so")

_lib = None
_lib_lock = threading.Lock()
_build_err: Optional[str] = None


def _build() -> Optional[str]:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{cmd}: {e}"
    if r.returncode != 0:
        return f"{cmd}: {r.stderr[-2000:]}"
    return None


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native planner; None on failure."""
    global _lib, _build_err
    if os.environ.get("REGENT_FFT_NATIVE", "1") == "0":
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_err is not None:
            return None
        if not os.path.exists(_SO):
            _build_err = _build()
            if _build_err is not None:
                from ..utils.plog import logger
                logger.info("native planner build failed, using Python "
                            "fallback: %s", _build_err)
                return None
        lib = ctypes.CDLL(_SO)
        lib.rftp_factorize.restype = ctypes.c_int
        lib.rftp_factorize.argtypes = [ctypes.c_uint64, ctypes.c_uint32,
                                       ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
        lib.rftp_best_schedule.restype = ctypes.c_int
        lib.rftp_best_schedule.argtypes = lib.rftp_factorize.argtypes
        lib.rftp_next_fast_len.restype = ctypes.c_uint64
        lib.rftp_next_fast_len.argtypes = [ctypes.c_uint64]
        lib.rftp_stage_flops.restype = ctypes.c_double
        lib.rftp_stage_flops.argtypes = [ctypes.c_uint64,
                                         ctypes.POINTER(ctypes.c_uint32), ctypes.c_int]
        lib.rftp_set_cost_params.restype = None
        lib.rftp_set_cost_params.argtypes = [ctypes.c_double] * 5
        lib.rftp_schedule_cost.restype = ctypes.c_double
        lib.rftp_schedule_cost.argtypes = [ctypes.c_uint64, ctypes.c_uint32]
        lib.rftp_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def factorize(n: int, max_radix: int = 128) -> Optional[Tuple[int, ...]]:
    lib = load()
    if lib is None:
        return None
    buf = (ctypes.c_uint32 * 64)()
    cnt = lib.rftp_factorize(n, max_radix, buf, 64)
    if cnt == 0:
        return None
    return tuple(buf[i] for i in range(cnt))


def best_schedule(n: int, max_radix: int = 128) -> Optional[Tuple[int, ...]]:
    lib = load()
    if lib is None:
        return None
    buf = (ctypes.c_uint32 * 64)()
    cnt = lib.rftp_best_schedule(n, max_radix, buf, 64)
    if cnt == 0:
        return None
    return tuple(buf[i] for i in range(cnt))


def next_fast_len(n: int) -> Optional[int]:
    lib = load()
    if lib is None:
        return None
    return int(lib.rftp_next_fast_len(n))


def set_cost_params(mxu_edge=128.0, mxu_rate=1.0, vpu_rate=0.05,
                    stage_overhead=64.0, bw_unit=100.0) -> bool:
    """Tune the native cost model (defaults = measured v5e ratios).

    ``bw_unit`` is HBM traffic cost in MXU-flop time units per byte:
    useful-f32-flops-per-second / HBM-bytes-per-second.
    """
    lib = load()
    if lib is None:
        return False
    lib.rftp_set_cost_params(mxu_edge, mxu_rate, vpu_rate, stage_overhead,
                             bw_unit)
    return True


def schedule_cost(n: int, max_radix: int = 128) -> Optional[float]:
    """Modeled per-batch-element cost of the best schedule (tests/inspection)."""
    lib = load()
    if lib is None:
        return None
    c = lib.rftp_schedule_cost(n, max_radix)
    return None if c < 0 else float(c)
