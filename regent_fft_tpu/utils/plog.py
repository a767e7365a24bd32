"""Observability: structured plan/shard/collective logging.

TPU analog of the reference's ``LoggingWrapper`` mapper, which logs every
mapping decision and dumps the machine model at startup
(``/root/reference/test/logging_mapper.cc:92-217``, enabled at
``-level mapper=2``).  Here the "mapping decisions" are: which schedule a
plan chose, which backend (XLA vs Pallas), and which collectives a
distributed plan will issue; the "machine model" is the device/mesh dump.

Enable with ``REGENT_FFT_LOG=2`` (mirrors ``-level mapper=2``) or
``set_log_level(2)``.
"""
from __future__ import annotations

import logging
import os
import sys

logger = logging.getLogger("regent_fft_tpu")
_handler = logging.StreamHandler(sys.stderr)
_handler.setFormatter(logging.Formatter("[%(name)s %(levelname)s] %(message)s"))
logger.addHandler(_handler)
logger.propagate = False


def _init_level():
    lvl = os.environ.get("REGENT_FFT_LOG", "0")
    try:
        set_log_level(int(lvl))
    except ValueError:
        set_log_level(0)


def set_log_level(level: int):
    """0 = silent, 1 = plan events, 2 = + shard/collective detail."""
    logger.setLevel({0: logging.WARNING, 1: logging.INFO}.get(level, logging.DEBUG))


def log_plan(plan):
    logger.info("make_plan: %r", plan)
    logger.debug("schedule:\n%s", plan.describe() if hasattr(plan, "describe")
                 else getattr(plan, "description", ""))


def log_collective(name: str, axis: str, shape):
    logger.debug("collective %s over axis %r, local shape %s", name, axis, shape)


def dump_machine_model():
    """Machine-model dump at startup (logging_mapper.cc:92-123 analog)."""
    import jax
    lines = [f"process {jax.process_index()}/{jax.process_count()}, "
             f"{jax.local_device_count()} local / {jax.device_count()} global devices"]
    for d in jax.local_devices():
        mem = getattr(d, "memory_stats", lambda: None)()
        hbm = f", hbm={mem['bytes_limit'] / 2**30:.1f}GiB" if mem and "bytes_limit" in mem else ""
        lines.append(f"  device {d.id}: {d.device_kind} (platform={d.platform}{hbm})")
    msg = "\n".join(lines)
    logger.info("machine model:\n%s", msg)
    return msg


_init_level()
