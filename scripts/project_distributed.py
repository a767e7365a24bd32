#!/usr/bin/env python
"""Project the north-star config: 1024^3 complex64 pencil FFT on v5e-8.

Single-chip hardware cannot measure it, so this script produces the
next-best evidence, all checkable:

1. COMPILE the real pencil plan on an 8-device virtual mesh and count
   the collectives + their payload bytes in the optimized HLO (the
   schedule is the artifact — not a claim).
2. Project wall-clock from (a) the per-chip local-FFT rates MEASURED on
   this repo's v5e attach (BENCH_DETAIL suite) and (b) the v5e ICI
   datasheet bandwidth, with every assumption printed.

Run on CPU (the compile is backend-agnostic):
    python scripts/project_distributed.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from regent_fft_tpu.parallel import distributed as dist
    from regent_fft_tpu.parallel.mesh import make_pencil_mesh
    from regent_fft_tpu.dtypes import Direction, Norm

    n = 1024
    shape = (n, n, n)
    mesh = make_pencil_mesh((2, 4))
    tout = "--transposed" in sys.argv
    plan = dist.make_plan_pencil(shape, direction=Direction.FORWARD,
                                 norm=Norm.NONE, mesh=mesh, use_3m=True,
                                 transposed_out=tout)

    # --- 1. the compiled collective schedule (tiny-shape compile would
    # distort payload sizes, so trace the FULL shape; CPU lowering of
    # the kernel-free einsum path compiles in seconds) ---
    import jax.numpy as jnp
    av = jax.ShapeDtypeStruct(shape, jnp.float32)
    lowered = jax.jit(plan._fn).lower(av, av)
    hlo = lowered.compile().as_text()
    # count actual all-to-all OPS and sum their per-chip result bytes
    # (each split plane is a separate op; shapes like f32[128,1024,512])
    import re
    ops = re.findall(r"%all-to-all[.0-9]*\s+=\s+\((.*?)\)\s+all-to-all\(",
                     hlo)
    a2a = len(ops)
    total_a2a_bytes = 0
    for shp in ops:
        for m in re.finditer(r"f32\[([0-9,]+)\]", shp):
            dims = [int(d) for d in m.group(1).split(",") if d]
            total_a2a_bytes += 4 * int(np.prod(dims))
    per_chip_bytes = int(np.prod(shape)) * 8 // 8  # local split planes
    collectives = {
        "all_to_all_op_count_in_hlo": a2a,
        "all_to_all_total_per_chip_bytes": total_a2a_bytes,
        "local_per_chip_bytes": per_chip_bytes,
    }

    # --- 2. projection ---
    # measured single-chip rates from this repo's bench artifact
    bench = {}
    bench_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    eff_gbps = 650.0  # measured achievable HBM (calibration r3)
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            bench = json.load(f)
        eff_gbps = bench.get("detail", {}).get("measured_hbm_gbps", eff_gbps)

    # Local work per chip: 1024^3/8 complex64 = 1 GiB of split planes.
    local_bytes = per_chip_bytes
    # The pencil plan runs 3 local FFT phases; measured plan efficiency
    # at 512^3 single-chip is ~5.7 HBM-pass-equivalents for 3 axes
    # (BENCH_DETAIL implied_hbm_passes) — assume the same pass economy.
    implied_passes = bench.get("detail", {}).get("implied_hbm_passes", 5.74)
    t_local_s = implied_passes * 2 * local_bytes / (eff_gbps * 1e9)

    # ICI: v5e chip has 4 links x ~50 GB/s/dir ~= 186 GB/s aggregate
    # (public v5e figure: 1600 Gbps total).  all_to_all sends
    # (p-1)/p of the payload off-chip.
    ici_gbps = 186.0
    p_total = 8
    t_a2a_s = (total_a2a_bytes * (p_total - 1) / p_total) / (ici_gbps * 1e9)

    total_s = t_local_s + t_a2a_s  # worst case: zero overlap
    total_overlap_s = max(t_local_s, t_a2a_s)  # best case: full overlap
    bytes_min = 2 * int(np.prod(shape)) * 8 / 8  # r+w complex64, per chip
    t_roofline = bytes_min / (eff_gbps * 1e9)

    # The target's physics: each logical ICI transpose moves ~the full
    # per-chip array across ICI; with T transposes the ICI floor alone is
    # T * bytes * (p-1)/p / ici_bw — compare it against the >70%-of-
    # 1-pass-HBM-roofline north star.
    n_transposes = max(1, a2a // 2)
    ici_floor_s = (per_chip_bytes * (p_total - 1) / p_total
                   * n_transposes) / (ici_gbps * 1e9)
    out = {
        "config": ("1024^3 complex64 pencil FFT, v5e-8 (2x4 mesh)"
                   + (" [transposed_out]" if tout else "")),
        "hlo_evidence": collectives,
        "assumptions": {
            "hbm_gbps_measured_single_chip": eff_gbps,
            "ici_aggregate_gbps_datasheet": ici_gbps,
            "local_pass_economy_from_512cubed": implied_passes,
        },
        "projection_ms": {
            "local_fft": round(t_local_s * 1e3, 2),
            "all_to_all_total": round(t_a2a_s * 1e3, 2),
            "serial_total": round(total_s * 1e3, 2),
            "full_overlap_total": round(total_overlap_s * 1e3, 2),
        },
        "single_chip_1pass_roofline_ms": round(t_roofline * 1e3, 2),
        "fraction_of_1pass_roofline_serial": round(t_roofline / total_s, 3),
        "ici_transpose_floor_ms": round(ici_floor_s * 1e3, 2),
        "max_achievable_fraction_even_with_perfect_local_and_overlap":
            round(t_roofline / ici_floor_s, 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
