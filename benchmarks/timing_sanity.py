"""Timing-fidelity check for remote-attach TPUs.

If wall-clock of a scan-chained computation does not scale ~linearly with
chain length, block_until_ready is not observing device completion and all
sub-second timings from this harness are unreliable.  Run before trusting
any benchmark numbers from a new attach.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def chained(fn2, length):
    @jax.jit
    def many(xr, xi):
        def body(c, _):
            return fn2(*c), None
        out, _ = jax.lax.scan(body, (xr, xi), None, length=length)
        return out
    return many


def main():
    from regent_fft_tpu.ops.stockham import build_c2c_1d
    from regent_fft_tpu.dtypes import Direction
    B, N = 8192, 1024
    fn = build_c2c_1d(N, Direction.FORWARD)
    rng = np.random.default_rng(0)
    results = {}
    for length in (5, 20, 80):
        m = chained(fn, length)
        a = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
        jax.block_until_ready(m(a, b))       # compile
        best = float("inf")
        for _ in range(3):
            a = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
            b = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
            jax.block_until_ready((a, b))
            t0 = time.perf_counter()
            jax.block_until_ready(m(a, b))
            best = min(best, time.perf_counter() - t0)
        results[length] = best
        per = best / length
        gb = 4 * B * N * 4 / 1e9
        print(f"len={length:3d}: total={best*1e3:8.2f} ms  per-iter={per*1e3:7.3f} ms  "
              f"implied bw={gb/per:7.0f} GB/s", flush=True)
    r = (results[80] / results[5]) / (80 / 5)
    print(f"linearity ratio (1.0 = perfect): {r:.3f}")
    print("TIMING OK" if 0.7 < r < 1.3 else "TIMING SUSPECT")


if __name__ == "__main__":
    main()
