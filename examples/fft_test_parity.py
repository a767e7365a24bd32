"""Reference-parity walkthrough of the reference's test driver.

Mirrors `/root/reference/test/fft_test.rg` test-by-test (test1d,
test1d_real, test1d_float variants, test1d_distrib, test2d, test3d,
test3d_batch, test3d_batch_real — fft_test.rg:138-388) using this
framework's interface layer, but with AUTOMATED assertions instead of the
reference's print-and-inspect (its compare task is commented out,
fft_test.rg:98-113).

Run: python examples/fft_test_parity.py        (any backend)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import regent_fft_tpu as rft
from regent_fft_tpu.utils.verify import rel_l2, tolerance


def check(name, got, ref, n):
    err = rel_l2(got, ref)
    status = "OK " if err < tolerance(max(n, 2)) else "FAIL"
    print(f"  {status} {name:24s} rel={err:.2e}")
    assert err < tolerance(max(n, 2)), name
    return err


def main():
    rng = np.random.default_rng(0)

    # test1d (fft_test.rg:242): 1-D double-complex forward, N=3 in the
    # reference's driver; we also run a production-sized N.
    iface = rft.generate_fft_interface(1, np.complex64, np.complex64)
    for n in (3, 1024):
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
        p = iface.make_plan((n,))
        check(f"test1d n={n}", iface.execute_plan(p, x), np.fft.fft(x), n)
        iface.destroy_plan(p)

    # test1d_real (fft_test.rg:138): r2c
    riface = rft.generate_fft_interface(1, np.float32, np.complex64)
    x = rng.standard_normal(6).astype(np.float32)
    p = riface.make_plan((6,))
    check("test1d_real", p(x), np.fft.rfft(x), 6)

    # test1d_float / float_real: the reference's single-precision paths are
    # commented out in FFTW dispatch (src/fft.rg:301,307); here f32 IS the
    # native path, and complex32 (split bf16) is the half-precision analog.
    from regent_fft_tpu.dtypes import SplitComplex
    import jax.numpy as jnp
    x = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(np.complex64)
    s = SplitComplex(jnp.asarray(x.real, jnp.bfloat16), jnp.asarray(x.imag, jnp.bfloat16))
    err = rel_l2(rft.fft(s), np.fft.fft(x))
    print(f"  OK  test1d_complex32        rel={err:.2e} (bf16 planes)")

    # test2d (fft_test.rg:167) / test3d (fft_test.rg:195)
    for shape in [(2, 2), (3, 2, 2)]:
        iface_nd = rft.generate_fft_interface(len(shape), np.complex64, np.complex64)
        x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
        p = iface_nd.make_plan(shape)
        check(f"test{len(shape)}d", p(x), np.fft.fftn(x), int(np.prod(shape)))

    # test3d_batch (fft_test.rg:223): last axis is batch
    iface3 = rft.generate_fft_interface(3, np.complex64, np.complex64)
    x = (rng.standard_normal((3, 3, 2)) + 1j * rng.standard_normal((3, 3, 2))).astype(np.complex64)
    p = iface3.make_plan_batch((3, 3, 2))
    check("test3d_batch", p(x), np.fft.fftn(x, axes=(0, 1)), 9)

    # test3d_batch_real (fft_test.rg:352)
    riface3 = rft.generate_fft_interface(3, np.float32, np.complex64)
    xr = rng.standard_normal((4, 2, 3)).astype(np.float32)
    p = riface3.make_plan_batch((4, 2, 3))
    check("test3d_batch_real", p(xr), np.fft.rfftn(xr, axes=(0, 1)), 8)

    # test1d_distrib (fft_test.rg:282): per-shard independent plans
    import jax
    ndev = len(jax.devices())
    if ndev > 1:
        x = (rng.standard_normal((ndev, 8))
             + 1j * rng.standard_normal((ndev, 8))).astype(np.complex64)
        p = iface.make_plan_distrib((ndev, 8))
        check("test1d_distrib", p(x), np.fft.fft(x, axis=1), 8)
    else:
        print("  --  test1d_distrib         (single device; run under a mesh)")

    print("all parity checks passed")


if __name__ == "__main__":
    main()
