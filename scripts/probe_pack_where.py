#!/usr/bin/env python
"""A/B: lane-shift concat vs aligned-lane ``where`` forms of the
Nyquist pack/unpack passes.

_pack_nyquist currently builds ``concat([p0, x[..., 1:m]])`` — a
shift-by-one lane copy of the bulk.  Every bulk output lane k actually
equals INPUT lane k, so ``where(lane == 0, p0, x[..., :m])`` expresses
the same values with identity lane mapping (no relayout).  Same story
for _unpack_nyquist's triple concat (append + endpoint substitution).
Measures the full 256^3x4 c2r and r2c plans both ways.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from regent_fft_tpu.utils import timing
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, _build_core, _rev_freq
    from regent_fft_tpu import plan as plan_mod

    iters = int(os.environ.get("PROBE_ITERS", "4"))
    shape = (4, 256, 256, 256)

    def run(name, spec):
        core = _build_core(spec)
        step, make_carry = timing.core_chain(core, spec)
        t = timing.time_chain(step, make_carry, iters, 2, 100)
        print(json.dumps({"probe": name, "ms": round(t * 1e3, 3)}),
              flush=True)
        return t

    def pack_where(xr, xi, axes):
        m = xr.shape[-1] - 1

        def herm(r, i):
            return (0.5 * (r + _rev_freq(r, axes)),
                    0.5 * (i - _rev_freq(i, axes)))

        x0r, x0i = herm(xr[..., 0], xi[..., 0])
        nqr, nqi = herm(xr[..., m], xi[..., m])
        p0r = x0r - nqi
        p0i = x0i + nqr
        lane = jax.lax.iota(jnp.int32, m)
        mask = lane == 0
        return (jnp.where(mask, p0r[..., None], xr[..., :m]),
                jnp.where(mask, p0i[..., None], xi[..., :m]))

    def unpack_where(yr, yi, axes):
        zr = yr[..., 0]
        zi = yi[..., 0]
        rr = _rev_freq(zr, axes)
        ri = _rev_freq(zi, axes)
        x0r = 0.5 * (zr + rr)
        x0i = 0.5 * (zi - ri)
        nqr = 0.5 * (zi + ri)
        nqi = -0.5 * (zr - rr)
        lane = jax.lax.iota(jnp.int32, yr.shape[-1] + 1)
        mask = lane == 0
        yr2 = jnp.concatenate([yr, nqr[..., None]], axis=-1)
        yi2 = jnp.concatenate([yi, nqi[..., None]], axis=-1)
        return (jnp.where(mask, x0r[..., None], yr2),
                jnp.where(mask, x0i[..., None], yi2))

    c2r_spec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.C2R,
                        direction=Direction.BACKWARD, norm=Norm.NONE,
                        use_3m=True)
    r2c_spec = PlanSpec(shape=shape, axes=(1, 2, 3), kind=Kind.R2C,
                        direction=Direction.FORWARD, norm=Norm.NONE,
                        use_3m=True)

    # correctness first (tiny shape, CPU-independent: same device)
    small = PlanSpec(shape=(2, 16, 16, 256), axes=(1, 2, 3), kind=Kind.C2R,
                     direction=Direction.BACKWARD, norm=Norm.NONE)
    rng = np.random.default_rng(0)
    hs = (2, 16, 16, 129)
    xr = rng.standard_normal(hs).astype(np.float32)
    xi = rng.standard_normal(hs).astype(np.float32)
    base = np.asarray(_build_core(small)(jnp.asarray(xr), jnp.asarray(xi)))
    orig_pack, orig_unpack = plan_mod._pack_nyquist, plan_mod._unpack_nyquist
    plan_mod._pack_nyquist = pack_where
    plan_mod._unpack_nyquist = unpack_where
    got = np.asarray(_build_core(small)(jnp.asarray(xr), jnp.asarray(xi)))
    err = float(np.abs(got - base).max() / np.abs(base).max())
    plan_mod._pack_nyquist, plan_mod._unpack_nyquist = orig_pack, orig_unpack
    print(json.dumps({"probe": "where_forms_rel_err", "err": err}),
          flush=True)
    assert err < 1e-6, err

    run("c2r_concat_pack", c2r_spec)
    run("r2c_concat_unpack", r2c_spec)
    plan_mod._pack_nyquist = pack_where
    plan_mod._unpack_nyquist = unpack_where
    try:
        run("c2r_where_pack", c2r_spec)
        run("r2c_where_unpack", r2c_spec)
    finally:
        plan_mod._pack_nyquist = orig_pack
        plan_mod._unpack_nyquist = orig_unpack


if __name__ == "__main__":
    main()
