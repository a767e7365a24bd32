"""Distributed-transform benchmark: slab and pencil 3-D FFTs over a mesh.

On a multi-chip TPU slice this measures the real ICI all_to_all cost; on a
single chip (or CPU) it runs over virtual devices to validate the
collective schedule and report per-phase structure.  Timing follows
docs/tpu_notes.md (fetch-based, device-generated fresh inputs).

Usage:
  python benchmarks/bench_distributed.py [--size 256] [--devices 8]
         [--decomp slab|pencil|shards] [--iters 3]
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--devices", type=int, default=0, help="0 = all")
    ap.add_argument("--decomp", default="pencil",
                    choices=["slab", "pencil", "shards"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU with 8 virtual devices")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    from regent_fft_tpu.parallel import distributed as dist
    from regent_fft_tpu.parallel.mesh import make_fft_mesh, make_pencil_mesh
    from regent_fft_tpu.dtypes import Norm

    ndev = args.devices or len(jax.devices())
    s = args.size
    shape = (s, s, s)
    if args.decomp == "pencil":
        r = int(math.sqrt(ndev))
        while ndev % r:
            r -= 1
        mesh = make_pencil_mesh((r, ndev // r))
        plan = dist.make_plan_pencil(shape, mesh=mesh, norm=Norm.NONE,
                                     transposed_out=True)
    elif args.decomp == "slab":
        mesh = make_fft_mesh(ndev)
        plan = dist.make_plan_slab(shape, mesh=mesh, norm=Norm.NONE,
                                   transposed_out=True)
    else:
        mesh = make_fft_mesh(ndev)
        plan = dist.make_plan_shards(shape, mesh=mesh)
    plan.print_plan()

    @jax.jit
    def mk(seed):
        kr, ki = jax.random.split(jax.random.PRNGKey(seed))
        return (jax.lax.complex(jax.random.normal(kr, shape, jnp.float32),
                                jax.random.normal(ki, shape, jnp.float32)))

    x = mk(0)
    y = plan(x)
    jax.block_until_ready(y)
    best = float("inf")
    for i in range(args.iters):
        x = mk(i + 1)
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        y = plan(x)
        _ = float(y.re.ravel()[0]) if hasattr(y, "re") else float(
            jnp.real(y).ravel()[0])
        best = min(best, time.perf_counter() - t0)

    n = s ** 3
    print(json.dumps({
        "metric": f"distributed_{args.decomp}_{s}cubed_c2c",
        "devices": ndev,
        "time_ms": round(best * 1e3, 3),
        "gflops_convention": round(5 * n * math.log2(n) / best / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
