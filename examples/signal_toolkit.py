"""Round-3 signal toolkit walkthrough: the scipy.signal/scipy.fft-parity
surfaces this framework adds beyond the reference wrapper.

Run: python examples/signal_toolkit.py        (any backend)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from scipy import fft as sfft
from scipy import signal as ssig

import regent_fft_tpu as rft


def image_deblur_fftconvolve():
    """PSF blur + matched-filter sharpening via fftconvolve/correlate."""
    rng = np.random.default_rng(0)
    img = rng.standard_normal((180, 200)).astype(np.float32)
    psf = np.outer(ssig.windows.gaussian(9, 2),
                   ssig.windows.gaussian(9, 2)).astype(np.float32)
    blurred = rft.fftconvolve(img, psf, mode="same")
    ref = ssig.fftconvolve(img.astype(np.float64), psf.astype(np.float64),
                           mode="same")
    assert np.allclose(np.asarray(blurred), ref, atol=1e-3 * np.abs(ref).max())
    peak = rft.correlate(blurred, psf, mode="same")
    refp = ssig.correlate(ref, psf.astype(np.float64), mode="same",
                          method="fft")
    assert np.allclose(np.asarray(peak), refp, atol=1e-3 * np.abs(refp).max())
    print("fftconvolve/correlate: OK")


def streaming_fir_oaconvolve():
    """Long-signal FIR filtering: overlap-add blocks batch through ONE
    cached plan (the TPU-native shape for streaming)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal(50000).astype(np.float32)
    fir = ssig.firwin(101, 0.2).astype(np.float32)
    y = rft.oaconvolve(x, fir, mode="same")
    ref = ssig.oaconvolve(x.astype(np.float64), fir.astype(np.float64),
                          mode="same")
    assert np.allclose(np.asarray(y), ref, atol=1e-4 * np.abs(ref).max())
    print("oaconvolve streaming FIR: OK")


def spectral_zoom_czt():
    """Resolve two closely-spaced tones with a zoom FFT: 512 output bins
    over 1% of the band instead of a million-point FFT."""
    n, fs = 8192, 2.0
    t = np.arange(n)
    x = (np.sin(2 * np.pi * 0.1003 * t / fs * 2)
         + np.sin(2 * np.pi * 0.1007 * t / fs * 2)).astype(np.float32)
    from regent_fft_tpu.utils.verify import to_numpy_complex
    z = np.abs(to_numpy_complex(rft.zoom_fft(x, [0.099, 0.102], 512, fs=fs)))
    ref = np.abs(ssig.zoom_fft(x.astype(np.float64), [0.099, 0.102], 512,
                               fs=fs))
    assert np.allclose(z, ref, atol=1e-3 * ref.max())
    print("zoom_fft tone separation: OK")


def dct_compression():
    """Block DCT-II compression roundtrip (JPEG-shaped workload) via the
    N-D r2r layer."""
    rng = np.random.default_rng(2)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    coeffs = np.asarray(rft.dctn(img))
    ref = sfft.dctn(img.astype(np.float64))
    assert np.allclose(coeffs, ref, atol=1e-3 * np.abs(ref).max())
    # keep the 25% largest coefficients, invert, check energy retained
    thresh = np.quantile(np.abs(coeffs), 0.75)
    kept = np.where(np.abs(coeffs) >= thresh, coeffs, 0.0)
    recon = np.asarray(rft.idctn(kept))  # scipy semantics: a true inverse
    rel = np.linalg.norm(recon - img) / np.linalg.norm(img)
    assert rel < 0.9, rel  # lossy but sane
    print(f"dctn compression roundtrip: OK (rel={rel:.2f} at 25% coeffs)")


def packed_roundtrip():
    """FFTW-halfcomplex analog: packed r2c -> spectral scale -> packed
    c2r without the repack passes."""
    from regent_fft_tpu.plan import PlanSpec, make_plan
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    rng = np.random.default_rng(3)
    shape = (8, 16, 256)
    x = rng.standard_normal(shape).astype(np.float32)
    kw = dict(shape=shape, axes=(1, 2), backend="stockham",
              packed_layout=True)
    fwd = make_plan(PlanSpec(kind=Kind.R2C, direction=Direction.FORWARD,
                             norm=Norm.NONE, **kw))
    inv = make_plan(PlanSpec(kind=Kind.C2R, direction=Direction.BACKWARD,
                             norm=Norm.BACKWARD, **kw))
    y = np.asarray(inv(fwd(x) * 1.0))  # identity filter
    assert np.allclose(y, x, atol=1e-4)
    print("packed halfcomplex roundtrip: OK")


if __name__ == "__main__":
    image_deblur_fftconvolve()
    streaming_fir_oaconvolve()
    spectral_zoom_czt()
    dct_compression()
    packed_roundtrip()
