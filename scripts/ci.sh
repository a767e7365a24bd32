#!/usr/bin/env bash
# CI harness — the analog of the reference's test.sh (which builds the full
# Legion/FFTW stack and smoke-runs one transform; /root/reference/test.sh).
# Here: build the native planner, run the full CPU test suite on a virtual
# 8-device mesh, verify the bench CLI smoke suite, and compile-check the
# driver entry points.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native planner build =="
make -C regent_fft_tpu/native

echo "== unit + distributed tests (CPU, 8 virtual devices) =="
python -m pytest tests/ -x -q

echo "== bench CLI smoke suite with verification =="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from regent_fft_tpu import bench_cli
rc = bench_cli.main(["--suite", "smoke", "--verify", "--iters", "1"])
raise SystemExit(rc)
EOF

echo "== driver entry compile-check + multichip dryrun =="
python - <<'EOF'
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, ".")
from __graft_entry__ import entry, dryrun_multichip
fn, args = entry()
jax.block_until_ready(jax.jit(fn)(*args))
print("entry OK")
dryrun_multichip(8)
EOF

echo "CI PASSED"
