"""Plan lifecycle + numpy-style API tests.

Covers the reference capability checklist (SURVEY.md section 7): plan
lifecycle, 1/2/3-D, C2C + R2C (+C2R), both precisions, batching, new-array
execute, inverse transforms, norms, wisdom cache.
"""
import numpy as np
import pytest

import regent_fft_tpu as rft
from regent_fft_tpu.utils.verify import rel_l2, to_numpy_complex, tolerance
from regent_fft_tpu.plan import PlanSpec, make_plan
from regent_fft_tpu.dtypes import Direction, Kind, Norm

RNG = np.random.default_rng(7)


def crand(shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(np.complex64)


# ---------------- numpy-style one-shots ----------------
def test_fft_matches_numpy():
    x = crand((4, 256))
    assert rel_l2(rft.fft(x), np.fft.fft(x)) < tolerance(256)


def test_ifft_roundtrip():
    x = crand((4, 250))
    assert rel_l2(rft.ifft(rft.fft(x)), x) < tolerance(250)


def test_fft_norms():
    x = crand((128,))
    for norm in [None, "ortho", "forward"]:
        assert rel_l2(rft.fft(x, norm=norm), np.fft.fft(x, norm=norm or "backward")) < tolerance(128)
        assert rel_l2(rft.ifft(x, norm=norm), np.fft.ifft(x, norm=norm or "backward")) < tolerance(128)


def test_fft_axis_and_padding():
    x = crand((8, 40))
    assert rel_l2(rft.fft(x, axis=0), np.fft.fft(x, axis=0)) < tolerance(8)
    assert rel_l2(rft.fft(x, n=64), np.fft.fft(x, n=64)) < tolerance(64)
    assert rel_l2(rft.fft(x, n=17), np.fft.fft(x, n=17)) < tolerance(17)


def test_fft_tiny_trailing_batch():
    # Trailing batch dims far below the 128-lane tile take the
    # batch-to-front route in run_steps_padded (plan.py) instead of a
    # 128/w pad blowup — (256,256,256,4) complex32 OOM'd a 16 GB chip
    # on a 1 GB problem before this route existed (r5).
    for shape, axes in (((128, 256, 4), (0, 1)), ((256, 4), (0,))):
        x = crand(shape)
        assert rel_l2(rft.fftn(x, axes=axes),
                      np.fft.fftn(x, axes=axes)) < tolerance(
                          int(np.prod([shape[a] for a in axes])))


def test_fft2_fftn():
    x = crand((12, 16, 20))
    assert rel_l2(rft.fft2(x), np.fft.fft2(x)) < tolerance(16 * 20)
    assert rel_l2(rft.fftn(x), np.fft.fftn(x)) < tolerance(x.size)
    assert rel_l2(rft.ifftn(x), np.fft.ifftn(x)) < tolerance(x.size)
    assert rel_l2(rft.fftn(x, axes=(0, 2)), np.fft.fftn(x, axes=(0, 2))) < tolerance(240)


def test_rfft_matches_numpy():
    for n in [16, 17, 256, 120]:
        x = RNG.standard_normal((3, n)).astype(np.float32)
        assert rel_l2(rft.rfft(x), np.fft.rfft(x)) < tolerance(n), n


def test_irfft_matches_numpy():
    for n in [16, 18, 256, 120]:
        x = RNG.standard_normal((3, n)).astype(np.float32)
        spec = np.fft.rfft(x).astype(np.complex64)
        got = np.asarray(rft.irfft(spec, n=n))
        assert np.linalg.norm(got - x) / np.linalg.norm(x) < tolerance(n), n


def test_irfft_default_length():
    x = RNG.standard_normal(64).astype(np.float32)
    spec = np.fft.rfft(x).astype(np.complex64)
    got = np.asarray(rft.irfft(spec))
    assert got.shape == (64,)
    assert np.linalg.norm(got - x) / np.linalg.norm(x) < tolerance(64)


def test_rfftn_irfftn():
    x = RNG.standard_normal((8, 12, 16)).astype(np.float32)
    assert rel_l2(rft.rfftn(x), np.fft.rfftn(x)) < tolerance(x.size)
    back = np.asarray(rft.irfftn(rft.rfftn(x)))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < tolerance(x.size)


def test_fftshift_helpers():
    x = crand((9,))
    np.testing.assert_allclose(np.asarray(rft.fftfreq(8)), np.fft.fftfreq(8).astype(np.float32))
    got = to_numpy_complex(rft.fftshift(x))
    np.testing.assert_allclose(got, np.fft.fftshift(x), rtol=1e-6)


# ---------------- plan lifecycle ----------------
def test_plan_new_array_execute():
    # FFTW new-array execute semantics (src/fft.rg:605-608): one plan, many arrays.
    p = rft.make_plan((4, 128), axes=(1,), kind=rft.Kind.C2C,
                      direction=rft.FORWARD)
    for _ in range(3):
        x = crand((4, 128))
        assert rel_l2(p(x), np.fft.fft(x)) < tolerance(128)


def test_plan_cache_wisdom():
    rft.clear_plan_cache()
    p1 = rft.make_plan((64,), axes=(0,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    p2 = rft.make_plan((64,), axes=(0,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    assert p1 is p2
    assert len(rft.cached_plans()) == 1


def test_destroy_plan():
    p = rft.make_plan((32,), axes=(0,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    rft.destroy_plan(p)
    with pytest.raises(RuntimeError):
        p(crand((32,)))
    # re-planning after destroy works (fresh plan)
    p2 = rft.make_plan((32,), axes=(0,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    assert p2 is not p


def test_plan_inverse():
    p = rft.make_plan((64,), axes=(0,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    x = crand((64,))
    assert rel_l2(p.inverse()(p(x)), x) < tolerance(64)


def test_plan_shape_validation():
    p = rft.make_plan((4, 64), axes=(1,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    with pytest.raises(ValueError):
        p(crand((4, 32)))


def test_plan_accounting_and_print(capsys):
    p = rft.make_plan((8, 1024), axes=(1,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    assert p.flops == pytest.approx(8 * 5 * 1024 * 10)
    assert p.algorithm_flops > 0
    assert p.bytes_ideal == 2 * 8 * 1024 * 8
    p.print_plan()
    out = capsys.readouterr().out
    assert "radix" in out or "direct" in out or "mixed2" in out


def test_wisdom_roundtrip(tmp_path):
    # Hermetic: earlier tests may leave schedule/backend/patient wisdom
    # populated, and export_wisdom serializes ALL categories.
    rft.forget_wisdom()
    rft.make_plan((4, 96), axes=(1,), kind=rft.Kind.C2C, direction=rft.FORWARD)
    path = tmp_path / "wisdom.json"
    rft.export_wisdom_to_filename(str(path))
    rft.forget_wisdom()
    assert len(rft.cached_plans()) == 0
    n = rft.import_wisdom_from_filename(str(path))
    assert n == 1
    assert len(rft.cached_plans()) == 1


# ---------------- reference-parity interface ----------------
def test_generate_fft_interface_c2c():
    # Mirrors src/fft.rg:31 generate_fft_interface + test1d (fft_test.rg:242)
    iface = rft.generate_fft_interface(1, np.complex64, np.complex64)
    p = iface.make_plan((128,))
    x = crand((128,))
    y = iface.execute_plan(p, x)
    assert rel_l2(y, np.fft.fft(x)) < tolerance(128)
    iface.destroy_plan(p)


def test_generate_fft_interface_r2c():
    # real_flag dispatch analog (src/fft.rg:36-39)
    iface = rft.generate_fft_interface(1, np.float32, np.complex64)
    assert iface.kind == rft.Kind.R2C
    p = iface.make_plan((64,))
    x = RNG.standard_normal(64).astype(np.float32)
    assert rel_l2(p(x), np.fft.rfft(x)) < tolerance(64)


def test_interface_batch_plan():
    # make_plan_batch: last axis is batch (src/fft.rg:416-504), rank-generic here
    iface = rft.generate_fft_interface(3, np.complex64, np.complex64)
    p = iface.make_plan_batch((8, 12, 5))
    x = crand((8, 12, 5))
    assert rel_l2(p(x), np.fft.fftn(x, axes=(0, 1))) < tolerance(96)


def test_interface_rejects_bad_rank():
    with pytest.raises(ValueError):
        rft.generate_fft_interface(4, np.complex64, np.complex64)


def test_fft_n_zero_raises():
    with pytest.raises(ValueError):
        rft.fft(crand((4,)), n=0)


def test_inverse_none_norm_is_mathematical():
    p = rft.make_plan((8, 12), axes=(0, 1), kind=rft.Kind.C2C,
                      direction=rft.FORWARD, norm=rft.Norm.NONE)
    x = crand((8, 12))
    assert rel_l2(p.inverse()(p(x)), x) < tolerance(96)


def test_float64_input_downcasts_without_x64():
    # numpy's default dtype is f64; without JAX_ENABLE_X64 the one-shot
    # API must take the complex64 path (like jnp.fft) instead of raising.
    import jax
    if jax.config.read("jax_enable_x64"):
        pytest.skip("x64 enabled: f64 inputs legitimately plan as c128")
    x = RNG.standard_normal(64)  # float64
    assert rel_l2(rft.fft(x), np.fft.fft(x)) < tolerance(64)
    z = RNG.standard_normal(64) + 1j * RNG.standard_normal(64)  # complex128
    assert rel_l2(rft.fft(z), np.fft.fft(z)) < tolerance(64)


# ---------------- Hermitian-input transforms (numpy.fft hfft/ihfft) -------
@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_hfft_matches_numpy(norm):
    m = 65
    x = crand((3, m))
    got = np.asarray(rft.hfft(x, norm=norm))
    ref = np.fft.hfft(x.astype(np.complex128), norm=norm or "backward")
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(128)


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_ihfft_matches_numpy(norm):
    n = 128
    x = RNG.standard_normal((3, n)).astype(np.float32)
    got = to_numpy_complex(rft.ihfft(x, norm=norm))
    ref = np.fft.ihfft(x.astype(np.float64), norm=norm or "backward")
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(n)


def test_hfft_ihfft_roundtrip():
    n = 96
    x = RNG.standard_normal((2, n)).astype(np.float32)
    assert rel_l2(rft.hfft(rft.ihfft(x), n=n), x) < tolerance(n)


def test_packed_layout_roundtrip_and_consistency():
    """FFTW-halfcomplex analog: packed-layout r2c -> c2r roundtrips
    without the repack passes; unpacking the packed spectrum matches
    numpy's rfftn."""
    import jax.numpy as jnp
    from regent_fft_tpu import plan as plan_mod
    from regent_fft_tpu.dtypes import as_split

    rng = np.random.default_rng(9)
    shape = (4, 16, 256)   # n/2 = 128: lane multiple (kernel packed path)
    x = rng.standard_normal(shape).astype(np.float32)

    fwd = make_plan(PlanSpec(shape=shape, axes=(1, 2), kind=Kind.R2C,
                             direction=Direction.FORWARD, norm=Norm.NONE,
                             backend="stockham", packed_layout=True))
    z = fwd(x)
    assert z.shape == (4, 16, 128)

    inv = make_plan(PlanSpec(shape=shape, axes=(1, 2), kind=Kind.C2R,
                             direction=Direction.BACKWARD, norm=Norm.BACKWARD,
                             backend="stockham", packed_layout=True))
    y = np.asarray(inv(z))
    assert np.allclose(y, x, atol=1e-4), np.abs(y - x).max()

    # unpack the packed spectrum and compare against numpy rfftn
    sz = as_split(z, jnp.float32)
    ur, ui = plan_mod._unpack_nyquist(sz.re, sz.im, [1])
    got = np.asarray(ur) + 1j * np.asarray(ui)
    ref = np.fft.rfftn(x.astype(np.float64), axes=(1, 2))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 1e-5, rel


def test_packed_layout_validation():
    with pytest.raises(ValueError, match="packed_layout"):
        PlanSpec(shape=(8, 64), axes=(1,), kind=Kind.C2C,
                 direction=Direction.FORWARD, packed_layout=True)
    with pytest.raises(ValueError, match="kernel real-transform"):
        make_plan(PlanSpec(shape=(4, 16, 80), axes=(1, 2), kind=Kind.R2C,
                           direction=Direction.FORWARD, backend="stockham",
                           packed_layout=True))


def test_cleanup_resets_caches_but_keeps_live_plans():
    """fftw_cleanup analog (fftw-3.3.8/api/cleanup.c): caches reset,
    held plan objects keep working."""
    import numpy as np
    import regent_fft_tpu as rft

    plan = rft.make_plan((32,), kind=rft.Kind.C2C,
                         direction=rft.Direction.FORWARD)
    x = np.random.default_rng(0).normal(size=32).astype(np.complex64)
    y0 = np.asarray(plan(x))
    assert rft.cached_plans()
    rft.cleanup()
    assert not rft.cached_plans()
    np.testing.assert_allclose(np.asarray(plan(x)), y0, rtol=1e-6)


def test_plan_cost_monotone_in_size():
    """fftw_cost analog: calibrated-model estimate, monotone in problem
    size, zero when the model has no information."""
    import regent_fft_tpu as rft
    from regent_fft_tpu.native import planner as native

    mk = lambda shape: rft.make_plan(shape, axes=(1,), kind=rft.Kind.C2C,
                                     direction=rft.Direction.FORWARD)
    small, big = mk((4, 256)), mk((4, 1024))
    if not native.available():
        assert small.cost() == 0.0
        return
    assert 0 < small.cost() < big.cost()
    # batch scales it linearly
    assert abs(mk((8, 256)).cost() / small.cost() - 2.0) < 1e-6


def test_one_shots_compose_under_user_jit():
    """The one-shot API must trace inside a USER's jax.jit (plans key on
    tracer shapes; executors nest) — the idiomatic-JAX composition
    guarantee the reference's task-launch API cannot offer."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return rft.ifft(rft.fft(x) * 2.0)

    x = crand((8, 64))
    y = np.asarray(f(jnp.asarray(x)))
    assert np.linalg.norm(y - 2 * x) / np.linalg.norm(x) < 1e-5

    @jax.jit
    def g(v):
        return rft.rfftn(v)

    v = RNG.standard_normal((8, 16, 16)).astype(np.float32)
    got = np.asarray(g(jnp.asarray(v)))
    ref = np.fft.rfftn(v.astype(np.float64))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
