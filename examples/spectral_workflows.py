"""End-to-end spectral workflows a production user runs on this framework.

Three self-contained recipes (run on any backend:
``python examples/spectral_workflows.py``):

1. FFT convolution — the serving-shaped use case: one cached r2c plan
   pair + pointwise multiply, against scipy's fftconvolve.
2. Spectral Poisson solve — the HPC-shaped use case: rfftn / eigenvalue
   divide / irfftn on a 3-D grid, residual-checked.
3. Distributed spectral filter — the scaling-shaped use case: a global
   slab-decomposed FFT over every local device, low-pass filter applied
   in the transposed-out layout (skipping one all_to_all each way).

The reference wrapper supports none of these end-to-end (forward-only,
no inverse transforms: ``/root/reference/src/fft.rg:319,580``).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import regent_fft_tpu as rft


def fft_convolution():
    """Cyclic convolution via cached plans (FFTW's flagship use case)."""
    rng = np.random.default_rng(0)
    n = 1024
    signal = rng.standard_normal(n).astype(np.float32)
    kernel = np.zeros(n, np.float32)
    kernel[:31] = np.hanning(31).astype(np.float32)

    S = np.asarray(rft.rfft(signal))
    K = np.asarray(rft.rfft(kernel))
    out = np.asarray(rft.irfft(S * K, n=n))

    ref = np.fft.irfft(np.fft.rfft(signal.astype(np.float64))
                       * np.fft.rfft(kernel.astype(np.float64)), n=n)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel
    print(f"fft_convolution        OK  rel={rel:.2e}")


def poisson_solve():
    """Solve  -lap(u) = f  on a periodic 64^3 grid spectrally."""
    rng = np.random.default_rng(1)
    n = 64
    f = rng.standard_normal((n, n, n)).astype(np.float32)
    f -= f.mean()  # solvability: zero-mean source

    F = np.asarray(rft.rfftn(f))
    k = np.fft.fftfreq(n) * 2 * np.pi * n
    kz, ky = np.meshgrid(k, k, indexing="ij")
    kx = (np.arange(n // 2 + 1) * 2 * np.pi)
    k2 = (kz ** 2)[:, :, None] + (ky ** 2)[:, :, None] + (kx ** 2)[None, None, :]
    k2[0, 0, 0] = 1.0  # zero mode: set U=0 below
    U = F / k2
    U[0, 0, 0] = 0.0
    u = np.asarray(rft.irfftn(U.astype(np.complex64), s=(n, n, n)))

    # residual check: -lap(u) ~ f (2nd-order stencil would differ; use
    # the spectral laplacian itself for an exact-identity check)
    LU = np.asarray(rft.irfftn((U * k2).astype(np.complex64), s=(n, n, n)))
    rel = np.linalg.norm(LU - (f - f.mean())) / np.linalg.norm(f)
    assert rel < 1e-4, rel
    print(f"poisson_solve          OK  residual={rel:.2e}")


def distributed_filter():
    """Low-pass filter a global field with transposed-out slab plans."""
    import jax
    from regent_fft_tpu.dtypes import Norm

    ndev = len(jax.devices())
    z = 4 * ndev
    shape = (z, 8, z)
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
         ).astype(np.complex64)

    mesh = rft.make_fft_mesh(ndev)
    # transposed_out + transposed_in pairing: the forward leaves the
    # spectrum distributed over the LAST axis (one all_to_all), the
    # inverse accepts exactly that layout (one all_to_all back) — two
    # collectives for the whole filter instead of four, the
    # FFTW_MPI_TRANSPOSED_OUT/IN pairing.
    fwd = rft.make_plan_slab(shape, mesh=mesh, norm=Norm.NONE,
                             transposed_out=True)
    inv = rft.make_plan_slab(shape, mesh=mesh, norm=Norm.BACKWARD,
                             direction=rft.BACKWARD, transposed_in=True)

    X = fwd(x)                       # distributed over the LAST axis
    keep = np.zeros(shape, np.float32)
    c = z // 4
    for kz_ in list(range(c)) + list(range(z - c, z)):
        for kx_ in list(range(c)) + list(range(z - c, z)):
            keep[kz_, :, kx_] = 1.0
    Y = X * keep                     # pointwise work in the transposed layout
    y = np.asarray(inv.execute(Y))

    ref = np.fft.ifftn(np.fft.fftn(x.astype(np.complex128)) * keep)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel
    print(f"distributed_filter     OK  rel={rel:.2e}  (P={ndev})")


def hankel_projection():
    """FFTLog Hankel transform — the cosmology/optics-shaped use case.

    An order-0 Hankel transform on a log grid, evaluated as one r2c +
    Gamma-coefficient multiply + c2r (``rft.fht``), checked against the
    analytic self-reciprocal pair

        a(r) = r exp(-r^2/2)   <->   A(k) = k exp(-k^2/2)

    (A(k) = int a(r) J_0(kr) k dr), plus the fht -> ifht round trip.
    """
    n = 512
    r = np.logspace(-4, 3, n)
    dln = float(np.log(r[1] / r[0]))
    a = (r * np.exp(-r ** 2 / 2)).astype(np.float32)

    mu = 0.0
    offset = float(rft.fhtoffset(dln, mu))
    A = np.asarray(rft.fht(a, dln, mu, offset=offset))
    # output grid: k_j = k_c exp((j - j_c) dln) with ln(k_c r_c) = offset
    j = np.arange(n)
    j_c = (n - 1) / 2
    lnrc = np.log(r[0]) + j_c * dln
    k = np.exp(offset - lnrc) * np.exp((j - j_c) * dln)
    ref = k * np.exp(-k ** 2 / 2)
    sel = (k > 1e-2) & (k < 5.0)  # where the pair is well above f32 noise
    rel = (np.linalg.norm(A[sel] - ref[sel])
           / np.linalg.norm(ref[sel]))
    assert rel < 1e-3, rel

    back = np.asarray(rft.ifht(A, dln, mu, offset=offset))
    rrel = np.linalg.norm(back - a) / np.linalg.norm(a)
    assert rrel < 1e-3, rrel
    print(f"hankel_projection      OK  rel={rel:.2e}  roundtrip={rrel:.2e}")


if __name__ == "__main__":
    fft_convolution()
    poisson_solve()
    distributed_filter()
    hankel_projection()
    print("all spectral workflows OK")
