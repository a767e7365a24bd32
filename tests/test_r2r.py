"""Real-to-real transforms (FFTW r2r layer) vs scipy and definitions.

scipy.fft's unnormalized dct/dst types 1-4 match FFTW's REDFT/RODFT
conventions exactly (scipy docs; ``fftw-3.3.8/api/fftw3.h`` kinds), so
scipy in float64 is the golden reference; R2HC/HC2R/DHT are checked
against numpy's rfft and the textbook cas-kernel definition.
"""
import numpy as np
import pytest
from scipy import fft as sfft

import regent_fft_tpu as rft
from regent_fft_tpu.ops import r2r as r2r_mod
from regent_fft_tpu.ops.r2r import R2RKind, logical_size

SIZES = [4, 5, 8, 12, 16, 27, 32]


def _x(n, seed=0):
    return np.random.default_rng(seed).standard_normal(n).astype(np.float32)


def _tol(n):
    return 2e-5 * max(1.0, np.log2(max(n, 2)))


def _rel(got, ref):
    got = np.asarray(got, dtype=np.float64)
    return np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-30)


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("typ", [1, 2, 3, 4])
def test_dct_matches_scipy(n, typ):
    x = _x(n, seed=typ)
    ref = sfft.dct(x.astype(np.float64), typ)
    assert _rel(rft.dct(x, typ), ref) < _tol(n)


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("typ", [1, 2, 3, 4])
def test_dst_matches_scipy(n, typ):
    x = _x(n, seed=10 + typ)
    ref = sfft.dst(x.astype(np.float64), typ)
    assert _rel(rft.dst(x, typ), ref) < _tol(n)


@pytest.mark.parametrize("n", SIZES)
def test_dht_definition_and_involution(n):
    x = _x(n, seed=3)
    j = np.arange(n)
    ang = 2 * np.pi * np.outer(j, j) / n
    ref = (np.cos(ang) + np.sin(ang)) @ x.astype(np.float64)
    got = rft.dht(x)
    assert _rel(got, ref) < _tol(n)
    # DHT is its own inverse up to n (FFTW property)
    back = rft.dht(np.asarray(got))
    assert _rel(back, n * x.astype(np.float64)) < _tol(n)


@pytest.mark.parametrize("n", SIZES)
def test_r2hc_hc2r_roundtrip_and_layout(n):
    x = _x(n, seed=4)
    hc = np.asarray(rft.r2r(x, R2RKind.R2HC))
    h = np.fft.rfft(x.astype(np.float64))
    ref = np.concatenate([h.real[: n // 2 + 1],
                          h.imag[1:(n + 1) // 2][::-1]])
    assert _rel(hc, ref) < _tol(n)
    back = rft.r2r(hc, R2RKind.HC2R)
    assert _rel(back, n * x.astype(np.float64)) < _tol(n)


def test_redft_rodft_inverse_pairs():
    """FFTW: REDFT10∘REDFT01 = RODFT10∘RODFT01 = 2n·I; REDFT11 and
    RODFT11 are their own inverses up to 2n; REDFT00/RODFT00 up to
    their logical sizes."""
    n = 12
    x = _x(n, seed=5).astype(np.float64)
    pairs = [(R2RKind.REDFT10, R2RKind.REDFT01),
             (R2RKind.RODFT10, R2RKind.RODFT01),
             (R2RKind.REDFT11, R2RKind.REDFT11),
             (R2RKind.RODFT11, R2RKind.RODFT11),
             (R2RKind.REDFT00, R2RKind.REDFT00),
             (R2RKind.RODFT00, R2RKind.RODFT00)]
    for fwd, inv in pairs:
        y = rft.r2r(np.asarray(rft.r2r(x.astype(np.float32), fwd)), inv)
        scale = logical_size(n, fwd)
        assert _rel(y, scale * x) < _tol(n), (fwd, inv)


def test_plan_r2r_nd_and_api():
    """Rank-2 mixed-kind plan matches scipy axis-by-axis application."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((8, 12)).astype(np.float32)
    p = rft.plan_r2r(x.shape, (R2RKind.REDFT10, R2RKind.RODFT10))
    ref = sfft.dst(sfft.dct(x.astype(np.float64), 2, axis=0), 2, axis=1)
    assert _rel(p(x), ref) < _tol(12)
    assert p.flops > 0
    p.print_plan()
    p.destroy()
    with pytest.raises(RuntimeError):
        p(x)
    # single-kind broadcast + axis subset
    p2 = rft.plan_r2r(x.shape, R2RKind.DHT, axes=(1,))
    j = np.arange(12)
    ang = 2 * np.pi * np.outer(j, j) / 12
    ref2 = x.astype(np.float64) @ (np.cos(ang) + np.sin(ang))
    assert _rel(p2(x), ref2) < _tol(12)


def test_r2r_validation():
    with pytest.raises(ValueError):
        rft.plan_r2r((8,), (R2RKind.REDFT10, R2RKind.REDFT10))  # 2 kinds, 1 axis
    with pytest.raises(ValueError):
        rft.dct(np.ones(8, np.float32), 5)
    with pytest.raises(TypeError):
        rft.plan_r2r((8,), R2RKind.DHT)(np.ones(8, np.complex64))
    with pytest.raises(ValueError):
        from regent_fft_tpu.ops.r2r import build_r2r_1d
        build_r2r_1d(1, R2RKind.REDFT00)


def test_idct_idst_idht_inverses():
    import regent_fft_tpu as rft
    n = 24
    x = np.random.default_rng(3).standard_normal((3, n)).astype(np.float32)
    # scipy semantics: the inverses ARE inverses (1/logical-size included).
    for t in (1, 2, 3, 4):
        y = np.asarray(rft.idct(rft.dct(x, type=t), type=t))
        assert _rel(y, x.astype(np.float64)) < _tol(n), ("dct", t)
        y = np.asarray(rft.idst(rft.dst(x, type=t), type=t))
        assert _rel(y, x.astype(np.float64)) < _tol(n), ("dst", t)
    y = np.asarray(rft.idht(rft.dht(x)))
    assert _rel(y, x.astype(np.float64)) < _tol(n)


@pytest.mark.parametrize("typ", [1, 2, 3, 4])
def test_dctn_dstn_match_scipy(typ):
    rng = np.random.default_rng(11)
    x = rng.standard_normal((6, 8, 10)).astype(np.float32)
    got = np.asarray(r2r_mod.dctn(x, type=typ, axes=(1, 2)))
    ref = sfft.dctn(np.asarray(x, np.float64), type=typ, axes=(1, 2))
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-4 * np.abs(ref).max())
    got = np.asarray(r2r_mod.dstn(x, type=typ))
    ref = sfft.dstn(np.asarray(x, np.float64), type=typ)
    assert np.allclose(got, ref, rtol=2e-5, atol=2e-4 * np.abs(ref).max())


def test_idctn_idstn_inverses():
    rng = np.random.default_rng(12)
    x = rng.standard_normal((4, 8)).astype(np.float32)
    for fwd, inv in ((r2r_mod.dctn, r2r_mod.idctn),
                     (r2r_mod.dstn, r2r_mod.idstn)):
        y = inv(fwd(x, type=2), type=2)
        assert np.allclose(np.asarray(y), x, rtol=1e-4,
                           atol=1e-3 * np.abs(x).max())


# ---------------------------------------------------------------------------
# scipy.fft full-signature parity: norm / orthogonalize / n truncation+pad
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("typ", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_dct_dst_norms_match_scipy(typ, norm):
    x = np.random.default_rng(5 + typ).standard_normal((3, 20))
    for fam_f, fam_i, sp_f, sp_i in ((rft.dct, rft.idct, sfft.dct, sfft.idct),
                                     (rft.dst, rft.idst, sfft.dst, sfft.idst)):
        got = np.asarray(fam_f(x.astype(np.float32), type=typ, norm=norm))
        ref = sp_f(x, type=typ, norm=norm)
        assert _rel(got, ref) < _tol(20), ("fwd", norm)
        got = np.asarray(fam_i(x.astype(np.float32), type=typ, norm=norm))
        ref = sp_i(x, type=typ, norm=norm)
        assert _rel(got, ref) < _tol(20), ("inv", norm)


@pytest.mark.parametrize("typ", [1, 2, 3])
@pytest.mark.parametrize("orth", [True, False])
def test_orthogonalize_matches_scipy(typ, orth):
    x = np.random.default_rng(9).standard_normal((2, 16))
    for fam, sp in ((rft.dct, sfft.dct), (rft.dst, sfft.dst)):
        got = np.asarray(fam(x.astype(np.float32), type=typ, norm="ortho",
                             orthogonalize=orth))
        ref = sp(x, type=typ, norm="ortho", orthogonalize=orth)
        assert _rel(got, ref) < _tol(16), (fam, typ, orth)


def test_dct_n_crop_and_pad_match_scipy():
    x = np.random.default_rng(2).standard_normal((4, 18))
    for n in (12, 18, 24):
        got = np.asarray(rft.dct(x.astype(np.float32), type=2, n=n))
        ref = sfft.dct(x, type=2, n=n)
        assert got.shape == ref.shape
        assert _rel(got, ref) < _tol(n)


def test_dctn_s_axes_norm_match_scipy():
    x = np.random.default_rng(4).standard_normal((4, 6, 8))
    got = np.asarray(rft.dctn(x.astype(np.float32), type=3, s=(8, 10),
                              axes=(0, 2), norm="ortho"))
    ref = sfft.dctn(x, type=3, s=(8, 10), axes=(0, 2), norm="ortho")
    assert got.shape == ref.shape
    assert _rel(got, ref) < _tol(10)
    with pytest.raises(ValueError):
        rft.dctn(x.astype(np.float32), s=(4,), axes=(0, 1))  # length mismatch
    with pytest.raises(ValueError):
        rft.dstn(x.astype(np.float32), axes=(1, 1))  # repeated axis
    with pytest.raises(ValueError):
        rft.dct(x.astype(np.float32), norm="bogus")


def test_hfft2_hfftn_match_scipy():
    rng = np.random.default_rng(7)
    z = (rng.standard_normal((3, 6, 9))
         + 1j * rng.standard_normal((3, 6, 9))).astype(np.complex64)
    for fn, s in (("hfft2", None), ("hfftn", None), ("hfftn", (6, 6, 16))):
        ref = getattr(sfft, fn)(z.astype(np.complex128), s=s)
        out = getattr(rft, fn)(z, s=s)
        got = np.asarray(out)
        assert got.shape == ref.shape, fn
        assert _rel(got, ref) < _tol(16), fn
    xr = rng.standard_normal((3, 6, 16)).astype(np.float32)
    for fn in ("ihfft2", "ihfftn"):
        ref = getattr(sfft, fn)(xr.astype(np.float64))
        out = getattr(rft, fn)(xr)
        got = np.asarray(out.re) + 1j * np.asarray(out.im) \
            if hasattr(out, "re") else np.asarray(out)
        assert got.shape == ref.shape, fn
        assert np.abs(got - ref).max() < 1e-5, fn
