"""Pallas kernels in interpreter mode (CPU): matmul-form and butterfly.

Hardware behavior is exercised by bench runs; these pin down kernel math.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from regent_fft_tpu.dtypes import Direction, Kind, Norm
from regent_fft_tpu.ops import pallas_fft as pf
from regent_fft_tpu.ops import pallas_stockham as ps
from regent_fft_tpu.utils.verify import tolerance

RNG = np.random.default_rng(17)


def crand(shape):
    return RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)


@pytest.mark.parametrize("n", [64, 128, 256, 1024, 4096])
def test_matmul_kernel_interpret(n):
    fn = pf.build_c2c_1d_pallas(n, Direction.FORWARD, 128,
                                jax.lax.Precision.HIGHEST, interpret=True)
    assert fn is not None
    x = crand((6, n))
    yr, yi = fn(jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(n)


@pytest.mark.parametrize("shape,axis", [
    ((64, 32, 128), 0), ((8, 64, 256), 1), ((4, 16, 128), 2),
    ((512, 300), 0), ((33, 256), 1),
])
def test_stockham_kernel_interpret(shape, axis):
    x = crand(shape)
    yr, yi = ps.fft_axis_stockham(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        axis, Direction.FORWARD, interpret=True)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=axis)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(shape[axis])


@pytest.mark.parametrize("prec,tol", [
    ("b6", 5e-7), ("b3", 2e-5), ("b32", 2e-5), ("b62", 5e-7),
    ("default", 5e-7),
])
def test_tail_precision_schemes(prec, tol, monkeypatch):
    # hand-built bf16 emulation schemes for the MXU tail (Mosaic rejects
    # Precision.HIGH): b6 must hold f32-grade accuracy, b3/b32 bf16x3
    # grade.  ("default" stays f32-exact in CPU interpret mode.)
    monkeypatch.setenv("REGENT_FFT_TAIL_PREC", prec)
    monkeypatch.setenv("REGENT_FFT_A0FS_PREC", prec)
    x = crand((512, 256))
    run = ps._runner_axis0(512, -1, 128, interpret=True, envkey=ps._env_key())
    yr, yi = run(jnp.asarray(x.real, jnp.float32),
                 jnp.asarray(x.imag, jnp.float32))
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=0)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tol, prec
    # a0fs stage contraction under the same schemes
    m = 32
    mat = crand((m, m)).astype(np.complex64)
    a = crand((m, 8, 128)).astype(np.complex64)
    tr, ti = jnp.asarray(mat.real), jnp.asarray(mat.imag)
    ar, ai = jnp.asarray(a.real), jnp.asarray(a.imag)
    gr, gi = jax.jit(ps._dg0_3m)(tr, ti, ar, ai)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    ref2 = np.einsum("kj,jbw->kbw", mat, a)
    assert np.linalg.norm(got - ref2) / np.linalg.norm(ref2) < max(tol, 1e-6)


def test_stockham_backward():
    x = crand((256, 130))
    yr, yi = ps.fft_axis_stockham(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        0, Direction.BACKWARD, interpret=True)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.ifft(x, axis=0) * 256
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(256)


def test_stockham_chunked_paths():
    old = ps.MAX_CALL_ELEMS
    ps.MAX_CALL_ELEMS = 32 * 1024
    try:
        for shape, axis in [((16, 64, 256), 1), ((700, 128), 1), ((512, 2048), 0)]:
            x = crand(shape)
            yr, yi = ps.fft_axis_stockham(
                jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
                axis, Direction.FORWARD, interpret=True)
            y = np.asarray(yr) + 1j * np.asarray(yi)
            ref = np.fft.fft(x, axis=axis)
            assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(shape[axis])
    finally:
        ps.MAX_CALL_ELEMS = old


def test_stockham_rejects_unsupported_length():
    # n=20 is not sublane-aligned after the radix-4 head (20 % 8 != 0)
    x = crand((20, 128))
    with pytest.raises(ValueError):
        ps.fft_axis_stockham(jnp.asarray(x.real, jnp.float32),
                             jnp.asarray(x.imag, jnp.float32),
                             0, Direction.FORWARD, interpret=True)
    # n=72 = 18*4: the head stage leaves mt=18, not sublane-aligned
    x = crand((72, 128))
    with pytest.raises(ValueError):
        ps.fft_axis_stockham(jnp.asarray(x.real, jnp.float32),
                             jnp.asarray(x.imag, jnp.float32),
                             0, Direction.FORWARD, interpret=True)


@pytest.mark.parametrize("pair", [(384, 128), (128, 384), (160, 256)])
def test_fused2_mixed_radix_pair(pair):
    """Trailing-axes pair kernel accepts mixed-radix lengths (r4):
    384^3-class scientific grids ride the one-pass fused kernel."""
    n1, n2 = pair
    assert ps.fused2_supported(n1, n2)
    x = crand((2, n1, n2))
    yr, yi = ps.fft_axes2_stockham(jnp.asarray(x.real, jnp.float32),
                                   jnp.asarray(x.imag, jnp.float32),
                                   Direction.FORWARD, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft2(x, axes=(1, 2))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(n1 * n2)


@pytest.mark.parametrize("n", [24, 96, 384, 640, 1536])
def test_stockham_mixed_radix_lengths(n):
    """n = mt*4^s with mt % 8 == 0: the radix-4 head + dense-DFT MXU
    tail handles non-pow2 lengths (r4; measured 640x4096 0.215 ->
    0.087 ms vs the einsum mixed-radix path)."""
    x = crand((2, n, 128))
    yr, yi = ps.fft_axis_stockham(jnp.asarray(x.real, jnp.float32),
                                  jnp.asarray(x.imag, jnp.float32),
                                  1, Direction.FORWARD, interpret=True)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(x, axis=1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(n)
    if n % 128 == 0:  # last-axis runner needs lane-aligned rows
        xl = crand((2, 16, n))
        yr, yi = ps.fft_axis_stockham(jnp.asarray(xl.real, jnp.float32),
                                      jnp.asarray(xl.imag, jnp.float32),
                                      2, Direction.FORWARD, interpret=True)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(xl, axis=2)
        assert (np.linalg.norm(got - ref) / np.linalg.norm(ref)
                < tolerance(n))


def test_plan_backend_stockham():
    import regent_fft_tpu as rft
    x = crand((8, 16, 32)).astype(np.complex64)
    p = rft.make_plan((8, 16, 32), axes=(0, 1, 2), kind=Kind.C2C,
                      direction=Direction.FORWARD, backend="stockham")
    from regent_fft_tpu.utils.verify import rel_l2
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)


def test_plan_backend_hybrid_cpu_interpret():
    import regent_fft_tpu as rft
    from regent_fft_tpu.utils.verify import rel_l2
    x = crand((4, 8, 16)).astype(np.complex64)
    p = rft.make_plan((4, 8, 16), axes=(0, 1, 2), kind=Kind.C2C,
                      direction=Direction.FORWARD, backend="hybrid")
    assert rel_l2(p(x), np.fft.fftn(x)) < tolerance(x.size)


def test_fused2_kernel_matches_numpy():
    from regent_fft_tpu.ops.pallas_stockham import (fft_axes2_stockham,
                                                    fused2_supported)
    # envelope (re-bisected r2): blocks up to 256K elements compile,
    # so (512, 512) is in and (1024, 512) is out
    assert fused2_supported(16, 128) and fused2_supported(512, 512)
    assert not fused2_supported(1024, 512)
    x = crand((3, 16, 128)).astype(np.complex64)
    yr, yi = fft_axes2_stockham(jnp.asarray(x.real, jnp.float32),
                                jnp.asarray(x.imag, jnp.float32),
                                Direction.FORWARD, scale=0.25, interpret=True)
    ref = 0.25 * np.fft.fftn(x, axes=(1, 2))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(x.size)


def test_kernel_scale_fusion_matches():
    x = crand((4, 64)).astype(np.complex64)
    yr, yi = ps.fft_axis_stockham(jnp.asarray(x.real, jnp.float32),
                                  jnp.asarray(x.imag, jnp.float32),
                                  1, Direction.BACKWARD, scale=1.0 / 64,
                                  interpret=True)
    ref = np.fft.ifft(x, axis=1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(64)


def test_kernel_r2c_row_pair():
    x = np.random.default_rng(3).standard_normal((6, 128)).astype(np.float32)
    yr, yi = ps.fft_last_r2c_stockham(jnp.asarray(x), interpret=True)
    ref = np.fft.rfft(x, axis=-1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(128)


def test_kernel_c2r_row_pair():
    rng = np.random.default_rng(4)
    h = rng.standard_normal((5, 33)) + 1j * rng.standard_normal((5, 33))
    h = h.astype(np.complex64)
    y = ps.ifft_last_c2r_stockham(jnp.asarray(h.real, jnp.float32),
                                  jnp.asarray(h.imag, jnp.float32),
                                  64, interpret=True)
    ref = np.fft.irfft(h, n=64, axis=-1) * 64
    assert np.linalg.norm(np.asarray(y) - ref) / np.linalg.norm(ref) < tolerance(64)


def test_plan_hybrid_r2c_c2r_kernel_path():
    import regent_fft_tpu as rft
    from regent_fft_tpu.utils.verify import rel_l2
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 16, 64)).astype(np.float32)
    p = rft.make_plan((4, 16, 64), axes=(1, 2), kind=Kind.R2C,
                      direction=Direction.FORWARD, backend="hybrid")
    y = p(x)
    assert rel_l2(y, np.fft.rfftn(x, axes=(1, 2))) < tolerance(x.size)
    back = p.inverse()(y)
    assert rel_l2(back, x) < tolerance(x.size)


def test_last_axis_2048_kernel():
    x = crand((4, 2048)).astype(np.complex64)
    yr, yi = ps.fft_axis_stockham(jnp.asarray(x.real, jnp.float32),
                                  jnp.asarray(x.imag, jnp.float32),
                                  1, Direction.FORWARD, interpret=True)
    ref = np.fft.fft(x, axis=1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(2048)


def test_four_step_large_last_axis():
    from regent_fft_tpu.ops.pallas_stockham import (fft_last_four_step,
                                                    four_step_supported)
    assert four_step_supported(4096) and four_step_supported(1 << 21)
    assert not four_step_supported(2048) and not four_step_supported(6000)
    x = crand((2, 4096)).astype(np.complex64)
    yr, yi = fft_last_four_step(jnp.asarray(x.real, jnp.float32),
                                jnp.asarray(x.imag, jnp.float32),
                                Direction.BACKWARD, scale=1.0 / 4096,
                                interpret=True)
    ref = np.fft.ifft(x, axis=1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < tolerance(4096)


def test_plan_hybrid_large_1d():
    import regent_fft_tpu as rft
    from regent_fft_tpu.utils.verify import rel_l2
    x = crand((2, 4096)).astype(np.complex64)
    p = rft.make_plan((2, 4096), axes=(1,), kind=Kind.C2C,
                      direction=Direction.FORWARD, backend="hybrid")
    assert rel_l2(p(x), np.fft.fft(x, axis=1)) < tolerance(4096)


def test_packed_nyquist_r2c_c2r_roundtrip():
    """Nyquist-packed n/2-wide halfcomplex layout (rank >= 2 kernel real
    path): r2c matches rfftn and c2r inverts it, including the bin-0 /
    Nyquist untangle across BOTH mid axes."""
    import regent_fft_tpu as rft
    from regent_fft_tpu import plan as planmod
    assert planmod._packed_real_ok(256)
    assert not planmod._packed_real_ok(128)   # m=64 below lane tile
    rng = np.random.default_rng(3)
    shape = (4, 8, 256)
    x = rng.standard_normal(shape).astype(np.float32)
    p = rft.make_plan(shape, axes=(0, 1, 2), kind=rft.Kind.R2C,
                      direction=rft.FORWARD, norm=rft.Norm.NONE,
                      backend="stockham")
    got = np.asarray(p(x))
    ref = np.fft.rfftn(x.astype(np.float64))
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
    pi = rft.make_plan(shape, axes=(0, 1, 2), kind=rft.Kind.C2R,
                       direction=rft.BACKWARD, norm=rft.Norm.BACKWARD,
                       backend="stockham")
    back = np.asarray(pi(got))
    assert np.linalg.norm(back - x) / np.linalg.norm(x) < 1e-5


def test_real_kernel_n2048_block_envelope():
    # ADVICE r2: at n=2048 a fixed tb=128 row tile emits (2*128, 2048) =
    # 524288-element blocks, 2x the validated Mosaic envelope.  The tile
    # must shrink so every block fits.
    for packed in (False, True):
        w_out = 1024 if packed else 2048
        tb = ps._tb_real(2048, w_out)
        assert tb * 2048 <= ps.MAX_BLOCK_ELEMS
        assert 2 * tb * w_out <= ps.MAX_BLOCK_ELEMS
    # n=2048 is now excluded from the kernel path entirely: hardware
    # validation (r3) found Mosaic layout-inference failures at that
    # size even with capped blocks; the einsum path takes it.
    assert not ps.r2c_last_supported(2048)
    assert ps.r2c_last_supported(ps.MAX_REAL_N)
    # correctness at the validated ceiling (interpret mode)
    n = ps.MAX_REAL_N
    x = RNG.standard_normal((8, n)).astype(np.float32)
    yr, yi = ps.fft_last_r2c_stockham(jnp.asarray(x), interpret=True)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.rfft(x, axis=-1)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(n)
    back = ps.ifft_last_c2r_stockham(yr, yi, n, interpret=True)
    assert np.linalg.norm(np.asarray(back) / n - x) / np.linalg.norm(x) \
        < tolerance(n)


def test_axis_dma_ring_interpret():
    # manual K-deep DMA-ring leading-axis kernel (round 3): correctness
    # in interpret mode, incl. batched (pre > 1) slab scheduling.
    for shape, axis in [((64, 8, 512), 0), ((2, 64, 2048), 1)]:
        x = crand(shape)
        yr, yi = ps.fft_axis_dma(
            jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
            axis, Direction.FORWARD, k=2, interpret=True)
        y = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(x, axis=axis)
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(
            shape[axis]), (shape, axis)


def test_fused2_ring_interpret():
    # manual plane-ring fused trailing-pair kernel (round 3): both
    # trailing axes in one ring pass, batched pre, fused scale.
    for shape in [(4, 64, 128), (2, 3, 32, 256)]:
        x = crand(shape)
        yr, yi = ps.fft_axes2_ring(
            jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
            Direction.FORWARD, k=2, interpret=True)
        y = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft2(x, axes=(-2, -1))
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(
            max(shape[-2:])), shape
    shape = (4, 64, 128)
    x = crand(shape)
    yr, yi = ps.fft_axes2_ring(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        Direction.BACKWARD, scale=1.0 / (64 * 128), k=2, interpret=True)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.ifft2(x, axes=(-2, -1))
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(128)
    assert not ps.fused2_ring_supported(512, 1024)   # > block envelope
    assert not ps.fused2_ring_supported(8, 512)      # n1 < 16


def test_axis0_fourstep_interpret():
    # two-pass wide-run four-step leading-axis kernel (round 3):
    # forward + scaled inverse, batched (pre > 1) and mid-axis cases,
    # natural output order (the digit-reversal transpose is absorbed
    # into stage b's strided writes).
    for shape, axis in [((64, 8, 512), 0), ((256, 16, 128), 0),
                        ((2, 64, 16, 256), 1)]:
        n = shape[axis]
        post = int(np.prod(shape[axis + 1:]))
        assert ps.axis0_fourstep_supported(n, post, shape[-1]), shape
        x = crand(shape)
        yr, yi = ps.fft_axis0_fourstep(
            jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
            axis, Direction.FORWARD, k=2, interpret=True)
        y = np.asarray(yr) + 1j * np.asarray(yi)
        ref = np.fft.fft(x, axis=axis)
        assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(
            shape[axis]), (shape, axis)
    # inverse with fused norm scale
    shape = (64, 8, 512)
    x = crand(shape)
    yr, yi = ps.fft_axis0_fourstep(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        0, Direction.BACKWARD, scale=1.0 / 64, k=2, interpret=True)
    y = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.ifft(x, axis=0)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < tolerance(64)
    # unsupported shapes raise (non-square-admissible / bad minor)
    assert not ps.axis0_fourstep_supported(32, 65536, 512)
    assert not ps.axis0_fourstep_supported(512, 512, 512)


def test_axis0_fourstep_hd_bf16_interpret():
    # 'hd' native-bf16 stage dots (r5): bf16 planes with both stage
    # radices >= 16 run _dg0_3m(scheme="hd") — one DEFAULT-precision
    # dot per stage on the raw bf16 slabs.  complex32-grade accuracy.
    assert ps.axis0_fourstep_hd(256) and ps.axis0_fourstep_hd(1024)
    assert not ps.axis0_fourstep_hd(64)   # r1 = r2 = 8: below fold floor
    shape = (256, 16, 128)
    x = crand(shape)
    yr, yi = ps.fft_axis0_fourstep(
        jnp.asarray(x.real, jnp.bfloat16), jnp.asarray(x.imag, jnp.bfloat16),
        0, Direction.FORWARD, k=2, interpret=True)
    assert yr.dtype == jnp.bfloat16
    y = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    ref = np.fft.fft(np.asarray(x, np.complex128), axis=0)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 2e-2
    # bf16 planes whose r1 misses the bf16 min tile fall back to f32
    # block I/O inside fft_axis0_fourstep rather than failing _plane_io
    shape = (64, 8, 512)
    x = crand(shape)
    yr, yi = ps.fft_axis0_fourstep(
        jnp.asarray(x.real, jnp.bfloat16), jnp.asarray(x.imag, jnp.bfloat16),
        0, Direction.FORWARD, k=2, interpret=True)
    y = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    ref = np.fft.fft(np.asarray(x, np.complex128), axis=0)
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 2e-2


def test_radix8_head_stages_numerics(monkeypatch):
    # REGENT_FFT_RADIX8=1 keeps the knob from rotting: the radix-8
    # butterfly (_bfly_core r=8) must match numpy at f32 accuracy.
    # Measured neutral on v5e (docs/tpu_notes.md r5) so default is off.
    import numpy as np
    import jax.numpy as jnp
    from regent_fft_tpu.ops import pallas_stockham as ps
    monkeypatch.setenv("REGENT_FFT_RADIX8", "1")
    assert ps._stage_radices(512) == (8,)
    assert ps._stage_radices(2048) == (8, 4)
    assert ps._stage_radices(4096) == (8, 8)
    rng = np.random.default_rng(5)
    for n, sign in ((512, -1), (2048, +1)):
        wr, wi, _ = ps._packed_tables(n, sign)
        xr = rng.standard_normal((n, 16)).astype(np.float32)
        xi = rng.standard_normal((n, 16)).astype(np.float32)
        yr, yi = ps._stockham_tile(jnp.asarray(xr), jnp.asarray(xi), n,
                                   sign, jnp.asarray(wr), jnp.asarray(wi))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        z = (xr + 1j * xi).astype(np.complex128)
        ref = (np.fft.fft(z, axis=0) if sign == -1
               else np.fft.ifft(z, axis=0) * n)
        rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        assert rel < 5e-7, (n, sign, rel)
