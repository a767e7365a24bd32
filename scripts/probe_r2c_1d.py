"""Round-4 1-D r2c attribution probe (VERDICT r3 #4).

The suite measures 1d_r2c_1024_batch4096 at TIME PARITY with c2c
(0.164 vs 0.165 ms) where conjugate-even packing promises ~2x less
work+traffic (FFTW rdft/direct-r2c.c rationale).  Hypothesis: at
n=1024 the tail is mt=16 (TAIL_MT=32 cap), so each `_dg_3m` tail is
3 HIGHEST dots at K=16 — tiny-K MXU dispatches — and the shared-head
r2c kernel pays THREE of them (normal + rev1 + rev0) per block where
c2c pays one.  If tail dispatches dominate, parity follows.

Sweep (each variant in a SUBPROCESS — TAIL_MT/schemes are cached
per-process):
  c2c/r2c 1024 x 4096 at TAIL_MT in {32 (default -> mt=16), 64} x
  tail scheme {highest-3M, h4 (needs mt >= 32)}, r2c narrow vs packed.

Run on an IDLE host (axon tunnel contention corrupts timings).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = [
    # (label, kind, env)
    ("c2c mt16 3m",   "c2c", {"REGENT_FFT_TAIL_MT": "32",
                              "REGENT_FFT_TAIL_PREC": "highest"}),
    ("c2c mt64 3m",   "c2c", {"REGENT_FFT_TAIL_MT": "64",
                              "REGENT_FFT_TAIL_PREC": "highest"}),
    ("c2c mt64 h4",   "c2c", {"REGENT_FFT_TAIL_MT": "64",
                              "REGENT_FFT_TAIL_PREC": "h4"}),
    ("r2c mt16 3m",   "r2c", {"REGENT_FFT_TAIL_MT": "32",
                              "REGENT_FFT_TAIL_PREC": "highest"}),
    ("r2c mt64 3m",   "r2c", {"REGENT_FFT_TAIL_MT": "64",
                              "REGENT_FFT_TAIL_PREC": "highest"}),
    ("r2c mt64 h4",   "r2c", {"REGENT_FFT_TAIL_MT": "64",
                              "REGENT_FFT_TAIL_PREC": "h4"}),
    ("r2c mt64 h4 packed", "r2c_packed", {"REGENT_FFT_TAIL_MT": "64",
                                          "REGENT_FFT_TAIL_PREC": "h4"}),
    ("r2c mt16 3m packed", "r2c_packed", {"REGENT_FFT_TAIL_MT": "32",
                                          "REGENT_FFT_TAIL_PREC": "highest"}),
    # half-length reduction path for reference (m=512 kernel + untangle)
    ("r2c half-length", "r2c_half", {"REGENT_FFT_R2C_1D": "half"}),
]


def child(kind):
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from regent_fft_tpu.dtypes import Direction, Kind, Norm
    from regent_fft_tpu.plan import PlanSpec, make_plan
    from regent_fft_tpu.utils import timing

    b, n = 4096, 1024
    if kind == "c2c":
        spec = PlanSpec(shape=(b, n), axes=(1,), kind=Kind.C2C,
                        direction=Direction.FORWARD, norm=Norm.NONE,
                        use_3m=True)
    else:
        spec = PlanSpec(shape=(b, n), axes=(1,), kind=Kind.R2C,
                        direction=Direction.FORWARD, norm=Norm.NONE,
                        use_3m=True,
                        packed_layout=(kind == "r2c_packed"))
    plan = make_plan(spec)
    t = timing.time_plan(plan, iters=40, reps=3)
    t = min(t, timing.time_plan(plan, iters=40, reps=3, seed0=300))

    # accuracy spot-check (full planned shape; single-arg call; host
    # complex via verify helpers — axon cannot move complex buffers)
    from regent_fft_tpu.utils.verify import to_numpy_complex
    rng = np.random.default_rng(0)
    if kind == "c2c":
        x = rng.standard_normal((b, n)).astype(np.float32) \
            + 1j * rng.standard_normal((b, n)).astype(np.float32)
        gotc = to_numpy_complex(plan(x))[:8].astype(np.complex128)
        ref = np.fft.fft(x[:8].astype(np.complex128), axis=1)
    else:
        x = rng.standard_normal((b, n)).astype(np.float32)
        gotc = to_numpy_complex(plan(x))[:8].astype(np.complex128)
        ref = np.fft.rfft(x[:8].astype(np.float64), axis=1)
        if kind == "r2c_packed":
            # packed halfcomplex: bins 0..n/2-1, Nyquist in imag(bin 0)
            nyq = gotc[:, 0].imag.copy()
            gotc[:, 0] = gotc[:, 0].real
            gotc = np.concatenate([gotc, nyq[:, None]], axis=1)
    if gotc.shape != ref.shape:
        ref = ref[..., :gotc.shape[-1]]
    err = float(np.linalg.norm(gotc - ref) / np.linalg.norm(ref))
    print(json.dumps({"ms": round(t * 1e3, 4), "rel_err": err}), flush=True)


def main():
    out = {}
    for label, kind, env in VARIANTS:
        e = dict(os.environ)
        e.update(env)
        r = subprocess.run([sys.executable, __file__, "--child", kind],
                           env=e, capture_output=True, text=True,
                           timeout=900)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            out[label] = json.loads(line)
        except Exception:
            out[label] = {"error": (r.stderr or r.stdout)[-800:]}
        print(f"{label:24s} {out[label]}", flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        main()
