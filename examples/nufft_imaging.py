"""Non-uniform FFT workflows: the workloads uniform-grid FFTW/cuFFT (the
reference's engines, ``/root/reference/src/fft.rg:12-20``) cannot serve.

Three miniature but faithful pipelines, each validated in-line:

1. radial-trajectory MRI reconstruction (type 1: nonuniform k-space
   samples -> image grid, density-compensated adjoint);
2. radio-interferometry style degridding (type 2: sky model -> measured
   visibilities at arbitrary baselines);
3. spectral analysis of unevenly-sampled time series at arbitrary
   frequencies (type 3) — the Lomb-Scargle-adjacent use case.

Run: python examples/nufft_imaging.py        (any backend)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import regent_fft_tpu as rft
from regent_fft_tpu.utils.verify import to_numpy_complex


def mri_radial_type1():
    """Density-compensated adjoint NUFFT of radial k-space samples."""
    rng = np.random.default_rng(0)
    n = 64                                     # image grid
    n_spokes, n_read = 96, 128
    theta = np.pi * np.arange(n_spokes) / n_spokes
    r = np.linspace(-np.pi, np.pi, n_read, endpoint=False)
    kx = (r[None, :] * np.cos(theta)[:, None]).ravel().astype(np.float32)
    ky = (r[None, :] * np.sin(theta)[:, None]).ravel().astype(np.float32)

    # Ground-truth image: a few off-center Gaussian blobs.
    yy, xx = np.meshgrid(np.arange(n) - n / 2, np.arange(n) - n / 2,
                         indexing="ij")
    img = np.zeros((n, n))
    for (cy, cx, s, a) in [(-10, 6, 3.0, 1.0), (8, -12, 5.0, 0.7),
                           (2, 14, 2.0, 0.5)]:
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img = img.astype(np.complex64)

    # Simulate acquisition: type-2 NUFFT (image modes -> k-space samples).
    kspace = to_numpy_complex(rft.nufft2d2(kx, ky, img, isign=-1)).astype(np.complex64)

    # Reconstruct: density compensation (|r| ramp for radial) + type-1
    # adjoint back onto the grid.
    dens = np.abs(r)
    dens[dens == 0] = dens[dens > 0].min() / 2
    w = np.tile(dens, n_spokes).astype(np.float32)
    recon = to_numpy_complex(rft.nufft2d1(kx, ky, kspace * w, n, n, isign=1))
    recon *= (img * np.conj(recon)).sum().real / (np.abs(recon) ** 2).sum()

    rel = np.linalg.norm(recon - img) / np.linalg.norm(img)
    assert rel < 0.25, rel                     # ramp-filtered adjoint recon
    print(f"  MRI radial type-1 recon: rel l2 {rel:.3f} "
          f"({n_spokes} spokes x {n_read} readout)")


def interferometry_type2():
    """Degrid a sky model to visibilities at arbitrary (u, v) baselines,
    checked against the direct sum."""
    rng = np.random.default_rng(1)
    n = 32
    sky = np.zeros((n, n), np.complex64)
    for _ in range(5):                         # point sources
        sky[rng.integers(n), rng.integers(n)] = rng.standard_normal() + 1.0
    u = rng.uniform(-np.pi, np.pi, 300).astype(np.float32)
    v = rng.uniform(-np.pi, np.pi, 300).astype(np.float32)
    vis = to_numpy_complex(rft.nufft2d2(u, v, sky, isign=-1))

    k = np.arange(-(n // 2), n // 2)
    k1, k2 = np.meshgrid(k, k, indexing="ij")
    phase = np.exp(-1j * (np.outer(u, k1.ravel()) + np.outer(v, k2.ravel())))
    ref = phase @ sky.astype(np.complex128).ravel()
    rel = np.linalg.norm(vis - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel
    print(f"  interferometry type-2 degrid: rel l2 {rel:.2e} "
          f"(300 baselines, {n}x{n} sky)")


def uneven_sampling_type3():
    """Spectrum of an unevenly-sampled signal at arbitrary frequencies:
    type 3 recovers the two injected tones at non-integer frequencies."""
    rng = np.random.default_rng(2)
    t = np.sort(rng.uniform(0.0, 20.0, 400)).astype(np.float32)  # seconds
    f1, f2 = 1.37, 3.94                                          # Hz
    sig = (np.exp(2j * np.pi * f1 * t) + 0.5 * np.exp(2j * np.pi * f2 * t)
           ).astype(np.complex64)
    freqs = np.linspace(0.0, 5.0, 501).astype(np.float32)        # Hz grid
    spec = to_numpy_complex(rft.nufft1d3(t, sig, 2 * np.pi * freqs, isign=-1))
    mag = np.abs(spec) / len(t)

    peak1 = freqs[np.argmax(mag)]
    masked = np.where(np.abs(freqs - peak1) > 0.5, mag, 0.0)
    peak2 = freqs[np.argmax(masked)]
    top2 = np.array([peak1, peak2])
    assert abs(top2 - f1).min() < 0.02 and abs(top2 - f2).min() < 0.02, top2
    # cross-check one bin against the direct sum
    k = 137
    direct = (sig.astype(np.complex128)
              * np.exp(-2j * np.pi * freqs[k] * t)).sum()
    assert abs(spec[k] - direct) / abs(direct) < 1e-4
    print(f"  uneven-sampling type-3 spectrum: tones at {sorted(top2)} "
          f"(truth [1.37, 3.94])")


def main():
    print("nufft_imaging example:")
    mri_radial_type1()
    interferometry_type2()
    uneven_sampling_type3()
    print("  all checks passed")


if __name__ == "__main__":
    main()
