"""Guru-layer strided plans (fftw_plan_guru_dft / fftw_plan_many_dft analogs).

The reference plans batches against raw strides (``i_dist`` from accessor
byte offsets, ``/root/reference/src/fft.rg:432-437``); FFTW's guru API
(``api/plan-guru-dft.c``) generalizes to arbitrary (n, is, os) layouts.
These tests drive layouts the axes-based API cannot express.
"""
import numpy as np
import pytest

from regent_fft_tpu import IODim, plan_guru, plan_many
from regent_fft_tpu.dtypes import Direction, Kind, Norm


def _rand_c(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_guru_1d_contiguous_matches_numpy():
    n = 96
    x = _rand_c(n)
    p = plan_guru([(n, 1, 1)])
    got = np.asarray(p(x))
    ref = np.fft.fft(x.astype(np.complex128))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-6


def test_guru_strided_column_transform():
    """Transform along the COLUMNS of a row-major (r, c) buffer: stride c.

    Inexpressible in the axes API without a reshape the user would have
    to do; the guru plan does it from the flat buffer directly.
    """
    r, c = 64, 5
    a = _rand_c((r, c), seed=1)
    flat = a.reshape(-1)
    # transform dim: extent r, stride c; loop dim: extent c, stride 1
    p = plan_guru([IODim(r, c, c)], [IODim(c, 1, 1)])
    got = np.asarray(p(flat)).reshape(r, c)
    ref = np.fft.fft(a.astype(np.complex128), axis=0)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-6


def test_guru_transposing_layout():
    """is != os: read row-major, write transposed — a layout-changing FFT."""
    r, c = 8, 16
    a = _rand_c((r, c), seed=2)
    # transform the rows (extent c, in-stride 1); output written with
    # stride r (i.e. as the (c, r) transpose); loop over rows.
    p = plan_guru([IODim(c, 1, r)], [IODim(r, c, 1)])
    got = np.asarray(p(a.reshape(-1))).reshape(c, r)
    ref = np.fft.fft(a.astype(np.complex128), axis=1).T
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-6


def test_guru_interleaved_fields():
    """Two interleaved signals in one buffer (stride 2) — FFTW guru's
    classic use case; transform only field 0, loop dim selects fields."""
    n = 128
    x = _rand_c(2 * n, seed=3)
    p = plan_guru([IODim(n, 2, 2)], [IODim(2, 1, 1)])
    got = np.asarray(p(x))
    ref = np.empty(2 * n, np.complex128)
    ref[0::2] = np.fft.fft(x[0::2].astype(np.complex128))
    ref[1::2] = np.fft.fft(x[1::2].astype(np.complex128))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-6


def test_guru_r2c_and_c2r_roundtrip():
    n, b = 64, 4
    rng = np.random.default_rng(4)
    x = rng.standard_normal((b, n)).astype(np.float32)
    fwd = plan_guru([(n, 1, 1)], [(b, n, n // 2 + 1)], kind=Kind.R2C)
    y = np.asarray(fwd(x.reshape(-1)))
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    assert np.linalg.norm(y.reshape(b, -1) - ref) / np.linalg.norm(ref) < 1e-6
    inv = plan_guru([(n, 1, 1)], [(b, n // 2 + 1, n)], kind=Kind.C2R,
                    direction=Direction.BACKWARD, norm=Norm.BACKWARD)
    back = np.asarray(inv(y)).reshape(b, n)
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < 1e-6


def test_plan_many_matches_reference_batch_semantics():
    """plan_many == fftw_plan_many_dft: howmany transforms, dist apart."""
    n, howmany = 80, 6
    x = _rand_c((howmany, n), seed=5)
    p = plan_many([n], howmany)
    got = np.asarray(p(x.reshape(-1))).reshape(howmany, n)
    ref = np.fft.fft(x.astype(np.complex128), axis=1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-6


def test_plan_many_2d_strided_dist():
    """2-D transforms with a gap between batch members (dist > prod(n))."""
    n1, n2, howmany, gap = 8, 12, 3, 7
    dist = n1 * n2 + gap
    rng = np.random.default_rng(6)
    buf = (rng.standard_normal(howmany * dist)
           + 1j * rng.standard_normal(howmany * dist)).astype(np.complex64)
    p = plan_many([n1, n2], howmany, idist=dist, odist=dist)
    got = np.asarray(p(buf))
    for b in range(howmany):
        blk = buf[b * dist:b * dist + n1 * n2].reshape(n1, n2)
        ref = np.fft.fft2(blk.astype(np.complex128))
        g = got[b * dist:b * dist + n1 * n2].reshape(n1, n2)
        assert np.linalg.norm(g - ref) / np.linalg.norm(ref) < 1e-6
    # the gap elements are zero in the output buffer
    for b in range(howmany):
        assert np.all(got[b * dist + n1 * n2:(b + 1) * dist] == 0)


def test_plan_many_r2c_default_dist():
    n, howmany = 32, 5
    rng = np.random.default_rng(7)
    x = rng.standard_normal((howmany, n)).astype(np.float32)
    p = plan_many([n], howmany, kind=Kind.R2C)
    got = np.asarray(p(x.reshape(-1))).reshape(howmany, n // 2 + 1)
    ref = np.fft.rfft(x.astype(np.float64), axis=1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-6


def test_guru_rejects_overlapping_output():
    with pytest.raises(ValueError, match="overlap"):
        plan_guru([IODim(16, 1, 0)])
    with pytest.raises(ValueError, match="overlap"):
        plan_guru([IODim(8, 1, 1)], [IODim(2, 8, 4)])


def test_guru_rejects_negative_and_short_buffers():
    with pytest.raises(ValueError, match="negative"):
        plan_guru([IODim(8, -1, 1)])
    p = plan_guru([IODim(16, 1, 1)])
    with pytest.raises(ValueError, match="length"):
        p(_rand_c(8))
    with pytest.raises(ValueError, match="FLAT"):
        p(_rand_c((4, 4)))


def test_guru_describe_mentions_layout():
    p = plan_guru([IODim(16, 2, 2)], [IODim(2, 1, 1)])
    d = p.describe()
    assert "guru-c2c" in d and "is=2" in d


# ---------------------------------------------------------------------------
# guru r2r (fftw_plan_guru_r2r analog) — VERDICT r2 missing #2
# ---------------------------------------------------------------------------
def test_guru_r2r_strided_dct_matches_dense():
    import scipy.fft as sfft
    from regent_fft_tpu import plan_guru_r2r, R2RKind
    n, b = 32, 8
    # transform dim strided by b (transposed layout), batch dim stride 1
    p = plan_guru_r2r(dims=[(n, b, b)], kinds=R2RKind.REDFT10,
                      howmany_dims=[(b, 1, 1)])
    x = np.asarray(np.random.default_rng(5).standard_normal(n * b), np.float32)
    y = np.asarray(p(x))
    ref = sfft.dct(x.reshape(n, b).astype(np.float64), type=2, axis=0)
    assert np.linalg.norm(y.reshape(n, b) - ref) / np.linalg.norm(ref) < 1e-4


def test_guru_r2r_mixed_kinds_2d():
    import scipy.fft as sfft
    from regent_fft_tpu import plan_guru_r2r, R2RKind
    n1, n2 = 8, 16
    p = plan_guru_r2r(dims=[(n1, n2, n2), (n2, 1, 1)],
                      kinds=(R2RKind.REDFT10, R2RKind.RODFT10))
    x = np.random.default_rng(5).standard_normal((n1, n2)).astype(np.float32)
    y = np.asarray(p(x.ravel())).reshape(n1, n2)
    ref = sfft.dst(sfft.dct(x.astype(np.float64), type=2, axis=0),
                   type=2, axis=1)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-4


def test_guru_r2r_overlapping_output_rejected():
    from regent_fft_tpu import plan_guru_r2r, R2RKind
    with pytest.raises(ValueError):
        plan_guru_r2r(dims=[(8, 1, 0)], kinds=R2RKind.DHT)


def test_guru_transposed_layout_uses_relayout_fast_path():
    # (n, is=b, os=b) x howmany (b, 1, 1): a transposed view of a dense
    # (n, b) buffer — must compile as reshape+transpose, not gather.
    n, b = 64, 32
    p = plan_guru(dims=[IODim(n, b, b)], howmany_dims=[IODim(b, 1, 1)],
                  norm=Norm.NONE)
    assert p.in_is_transpose_view and p.out_is_transpose_view
    x = _rand_c(n * b)
    y = np.asarray(p(x))
    ref = np.fft.fft(np.asarray(x, np.complex128).reshape(n, b), axis=0)
    assert np.linalg.norm(y.reshape(n, b) - ref) / np.linalg.norm(ref) < 1e-4


def test_guru_nondense_layout_takes_gather_path():
    # stride-2 spacing leaves holes -> not a transpose view
    p = plan_guru(dims=[IODim(16, 2, 2)], norm=Norm.NONE)
    assert not p.in_is_transpose_view and not p.out_is_transpose_view
    x = _rand_c(32)
    y = np.asarray(p(x))
    ref = np.fft.fft(np.asarray(x, np.complex128)[0:32:2])
    assert np.linalg.norm(y[0:32:2] - ref) / np.linalg.norm(ref) < 1e-4


def test_guru_zero_copy_buffer_layout():
    # identical transpose view on both sides -> the inner plan runs on the
    # buffer layout directly (no gather, no relayout).
    n, b = 64, 32
    p = plan_guru(dims=[IODim(n, b, b)], howmany_dims=[IODim(b, 1, 1)],
                  norm=Norm.NONE)
    assert p.is_zero_copy
    # mismatched views cannot be zero-copy
    q = plan_guru(dims=[IODim(n, b, 1)], howmany_dims=[IODim(b, 1, n)],
                  norm=Norm.NONE)
    assert not q.is_zero_copy
    x = _rand_c(n * b)
    y = np.asarray(q(x))
    ref = np.fft.fft(np.asarray(x, np.complex128).reshape(n, b),
                     axis=0).T.reshape(-1)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-4
