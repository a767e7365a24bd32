"""FFTLog fast Hankel transform vs scipy.fft.fht/ifht/fhtoffset."""
import numpy as np
import pytest

import regent_fft_tpu as rft

scipy_fft = pytest.importorskip("scipy.fft")

RNG = np.random.default_rng(17)


def _sample(n):
    # smooth positive log-spaced samples (the transform's natural inputs)
    r = np.logspace(-3, 3, n)
    return (r ** 1.5 * np.exp(-r ** 2 / 2)).astype(np.float32), r


@pytest.mark.parametrize("n", [64, 128, 100])
@pytest.mark.parametrize("mu,bias", [(0.0, 0.0), (0.5, 0.0), (2.0, 0.0),
                                     (0.5, 0.1)])
def test_fht_matches_scipy(n, mu, bias):
    a, r = _sample(n)
    dln = float(np.log(r[1] / r[0]))
    offset = float(scipy_fft.fhtoffset(dln, mu, bias=bias))
    got = np.asarray(rft.fht(a, dln, mu, offset=offset, bias=bias))
    ref = scipy_fft.fht(a.astype(np.float64), dln, mu, offset=offset,
                        bias=bias)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-5


@pytest.mark.parametrize("mu", [0.0, 0.5])
def test_ifht_roundtrip(mu):
    n = 128
    a, r = _sample(n)
    dln = float(np.log(r[1] / r[0]))
    offset = float(rft.fhtoffset(dln, mu))
    A = rft.fht(a, dln, mu, offset=offset)
    back = np.asarray(rft.ifht(A, dln, mu, offset=offset))
    assert np.linalg.norm(back - a) / np.linalg.norm(a) < 2e-4


def test_ifht_matches_scipy():
    n = 64
    a, r = _sample(n)
    dln = float(np.log(r[1] / r[0]))
    mu = 1.0
    offset = float(scipy_fft.fhtoffset(dln, mu))
    got = np.asarray(rft.ifht(a, dln, mu, offset=offset))
    ref = scipy_fft.ifht(a.astype(np.float64), dln, mu, offset=offset)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 2e-5


def test_fhtoffset_matches_scipy():
    for dln, mu, bias in [(0.1, 0.0, 0.0), (0.05, 2.5, 0.2), (0.2, -0.5, 0.0)]:
        got = rft.fhtoffset(dln, mu, bias=bias)
        ref = scipy_fft.fhtoffset(dln, mu, bias=bias)
        assert abs(got - float(ref)) < 1e-12


def test_fht_batched():
    n = 128
    a, r = _sample(n)
    dln = float(np.log(r[1] / r[0]))
    batch = np.stack([a, 2 * a, a ** 2])
    got = np.asarray(rft.fht(batch, dln, 0.5))
    for i in range(3):
        ref = scipy_fft.fht(batch[i].astype(np.float64), dln, 0.5)
        assert np.linalg.norm(got[i] - ref) / np.linalg.norm(ref) < 2e-5
