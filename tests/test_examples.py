"""The shipped examples must keep running (they double as integration
tests of the public API: convolution, Poisson solve, distributed filter,
and the reference-parity walkthrough)."""
import importlib.util
import os
import sys

import pytest

_EX = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EX, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_spectral_workflows():
    m = _load("spectral_workflows")
    m.fft_convolution()
    m.poisson_solve()
    m.distributed_filter()


def test_signal_toolkit():
    m = _load("signal_toolkit")
    m.image_deblur_fftconvolve()
    m.streaming_fir_oaconvolve()
    m.spectral_zoom_czt()
    m.dct_compression()
    m.packed_roundtrip()


def test_nufft_imaging():
    m = _load("nufft_imaging")
    m.mri_radial_type1()
    m.interferometry_type2()
    m.uneven_sampling_type3()
