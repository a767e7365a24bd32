"""Fused Pallas TPU kernels for the FFT hot path.

Replaces the reference's cuFFT dispatch (``/root/reference/src/fft.rg:
574-580``) with hand-written kernels: the full 1-D mixed-radix pipeline runs
out of VMEM — one HBM read and one HBM write per transform instead of one
round trip per radix stage, which is what bounds the XLA-level path.

This module is imported lazily by plan.py; ``supported`` gates which specs
take the Pallas path (the XLA matmul path is the always-correct fallback).
"""
from __future__ import annotations

# Filled in by the Pallas implementation below; initially the XLA path
# handles everything.
def supported(spec) -> bool:
    return False


def build_c2c_1d_pallas(n, direction, max_radix, precision, use_3m):
    return None
