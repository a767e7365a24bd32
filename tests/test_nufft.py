"""NUFFT types 1/2 in 1-3 dims vs the direct (dense) NDFT."""
import numpy as np
import pytest

import regent_fft_tpu as rft

RNG = np.random.default_rng(31)


def _pts(nj):
    return (RNG.uniform(-np.pi, np.pi, nj)).astype(np.float32)


def _coef(shape):
    return (RNG.standard_normal(shape)
            + 1j * RNG.standard_normal(shape)).astype(np.complex64)


def _k(n):
    return np.arange(-(n // 2), (n + 1) // 2)


def direct1d1(x, c, n, isign):
    k = _k(n)
    return (c[None, :] * np.exp(1j * isign * np.outer(k, x))).sum(axis=1)


def direct1d2(x, f, isign):
    k = _k(f.shape[-1])
    return (f[None, :] * np.exp(1j * isign * np.outer(x, k))).sum(axis=1)


@pytest.mark.parametrize("isign", [1, -1])
@pytest.mark.parametrize("n", [32, 64])
def test_nufft1d1_matches_direct(n, isign):
    nj = 200
    x = _pts(nj)
    c = _coef(nj)
    got = np.asarray(rft.nufft1d1(x, c, n, isign=isign))
    ref = direct1d1(x.astype(np.float64), c.astype(np.complex128), n, isign)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-5, rel


@pytest.mark.parametrize("isign", [1, -1])
def test_nufft1d2_matches_direct(isign):
    n, nj = 64, 200
    x = _pts(nj)
    f = _coef(n)
    got = np.asarray(rft.nufft1d2(x, f, isign=isign))
    ref = direct1d2(x.astype(np.float64), f.astype(np.complex128), isign)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-5, rel


def test_nufft1d_odd_modes():
    n, nj = 33, 100
    x = _pts(nj)
    c = _coef(nj)
    got = np.asarray(rft.nufft1d1(x, c, n))
    ref = direct1d1(x.astype(np.float64), c.astype(np.complex128), n, 1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-5


def test_nufft1d1_batched():
    n, nj, b = 32, 150, 3
    x = _pts(nj)
    c = _coef((b, nj))
    got = np.asarray(rft.nufft1d1(x, c, n))
    for i in range(b):
        ref = direct1d1(x.astype(np.float64),
                        c[i].astype(np.complex128), n, 1)
        assert np.linalg.norm(got[i] - ref) / np.linalg.norm(ref) < 2e-5


def test_nufft1d_adjointness():
    # <A c, f> == <c, A^H f> ties type 1 and type 2 together exactly
    n, nj = 32, 100
    x = _pts(nj)
    c = _coef(nj).astype(np.complex128)
    f = _coef(n).astype(np.complex128)
    Ac = np.asarray(rft.nufft1d1(x, c.astype(np.complex64), n, isign=1)
                    ).astype(np.complex128)
    Ahf = np.asarray(rft.nufft1d2(x, f.astype(np.complex64), isign=-1)
                     ).astype(np.complex128)
    lhs = np.vdot(f, Ac)
    rhs = np.vdot(Ahf, c)
    assert abs(lhs - rhs) / abs(lhs) < 2e-5


def test_nufft2d_roundtrip_vs_direct():
    n1, n2, nj = 16, 24, 120
    x, y = _pts(nj), _pts(nj)
    c = _coef(nj)
    got = np.asarray(rft.nufft2d1(x, y, c, n1, n2))
    k1, k2 = _k(n1), _k(n2)
    ph = np.exp(1j * (k1[:, None, None] * x[None, None, :]
                      + k2[None, :, None] * y[None, None, :]))
    ref = (ph * c[None, None, :].astype(np.complex128)).sum(axis=-1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-5, rel

    f = _coef((n1, n2))
    got2 = np.asarray(rft.nufft2d2(x, y, f))
    ref2 = np.einsum("kl,klj->j", f.astype(np.complex128), ph)
    rel2 = np.linalg.norm(got2 - ref2) / np.linalg.norm(ref2)
    assert rel2 < 5e-5, rel2


def test_nufft3d_matches_direct():
    n1 = n2 = n3 = 8
    nj = 80
    x, y, z = _pts(nj), _pts(nj), _pts(nj)
    c = _coef(nj)
    got = np.asarray(rft.nufft3d1(x, y, z, c, n1, n2, n3))
    k1, k2, k3 = _k(n1), _k(n2), _k(n3)
    ph = np.exp(1j * (k1[:, None, None, None] * x
                      + k2[None, :, None, None] * y
                      + k3[None, None, :, None] * z))
    ref = (ph * c.astype(np.complex128)).sum(axis=-1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-4, rel

    f = _coef((n1, n2, n3))
    got2 = np.asarray(rft.nufft3d2(x, y, z, f))
    ref2 = np.einsum("klm,klmj->j", f.astype(np.complex128), ph)
    rel2 = np.linalg.norm(got2 - ref2) / np.linalg.norm(ref2)
    assert rel2 < 1e-4, rel2


def test_nufft_eps_controls_accuracy():
    n, nj = 32, 150
    x = _pts(nj)
    c = _coef(nj)
    ref = direct1d1(x.astype(np.float64), c.astype(np.complex128), n, 1)
    e_lo = np.asarray(rft.nufft1d1(x, c, n, eps=1e-2))
    e_hi = np.asarray(rft.nufft1d1(x, c, n, eps=1e-6))
    r_lo = np.linalg.norm(e_lo - ref) / np.linalg.norm(ref)
    r_hi = np.linalg.norm(e_hi - ref) / np.linalg.norm(ref)
    assert r_hi < r_lo
    assert r_lo < 1e-2


def test_nufft_uniform_points_reduce_to_dft():
    # x on the uniform grid makes type 2 an exact inverse-DFT sampling
    n = 32
    x = (2 * np.pi * np.arange(n) / n - np.pi).astype(np.float32)
    f = _coef(n)
    got = np.asarray(rft.nufft1d2(x, f, isign=1))
    ref = direct1d2(x.astype(np.float64), f.astype(np.complex128), 1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-5


# ---------------------------------------------------------------------------
# Type 3: arbitrary points AND arbitrary frequencies, vs the direct sum.
# ---------------------------------------------------------------------------
def direct3(coords, c, freqs, isign):
    """f_k = sum_j c_j e^{isign i (s_k . x_j)} in f64."""
    phase = np.zeros((len(freqs[0]), len(coords[0])), np.float64)
    for x, s in zip(coords, freqs):
        phase += np.outer(s.astype(np.float64), x.astype(np.float64))
    return (c.astype(np.complex128)[None, :]
            * np.exp(1j * isign * phase)).sum(axis=1)


@pytest.mark.parametrize("isign", [1, -1])
def test_nufft1d3_matches_direct(isign):
    nj, nk = 150, 120
    x = RNG.uniform(-4.0, 4.0, nj).astype(np.float32)     # not [-pi, pi)
    s = RNG.uniform(-30.0, 30.0, nk).astype(np.float32)   # non-integer
    c = _coef(nj)
    got = np.asarray(rft.nufft1d3(x, c, s, isign=isign))
    ref = direct3((x,), c, (s,), isign)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 2e-5, rel


def test_nufft2d3_matches_direct():
    nj, nk = 120, 90
    x = RNG.uniform(-1.0, 1.0, nj).astype(np.float32)
    y = RNG.uniform(-7.0, 7.0, nj).astype(np.float32)
    s = RNG.uniform(-20.0, 20.0, nk).astype(np.float32)
    t = RNG.uniform(-3.0, 3.0, nk).astype(np.float32)
    c = _coef(nj)
    got = np.asarray(rft.nufft2d3(x, y, c, s, t))
    ref = direct3((x, y), c, (s, t), 1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 3e-5, rel


def test_nufft3d3_matches_direct():
    nj, nk = 80, 60
    coords = tuple(RNG.uniform(-2.0, 2.0, nj).astype(np.float32)
                   for _ in range(3))
    freqs = tuple(RNG.uniform(-10.0, 10.0, nk).astype(np.float32)
                  for _ in range(3))
    c = _coef(nj)
    got = np.asarray(rft.nufft3d3(*coords, c, *freqs))
    ref = direct3(coords, c, freqs, 1)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 5e-5, rel


def test_nufft1d3_t1_consistency():
    """Type 3 at integer target frequencies must reproduce type 1
    (sources already in [-pi, pi), s = integer mode indices)."""
    n, nj = 32, 100
    x = _pts(nj)
    c = _coef(nj)
    s = _k(n).astype(np.float32)
    via_t3 = np.asarray(rft.nufft1d3(x, c, s))
    via_t1 = np.asarray(rft.nufft1d1(x, c, n))
    rel = np.linalg.norm(via_t3 - via_t1) / np.linalg.norm(via_t1)
    assert rel < 3e-5, rel
