"""Test configuration: CPU backend with 8 virtual devices.

The reference cannot test its distributed mode at all (CI is single-node,
GASNet off — /root/reference/test.sh:38, SURVEY.md section 4).  We test
multi-chip sharding on a virtual 8-device CPU mesh, per the build plan.

NOTE: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
env var alone is not enough — jax.config.update must run before first use.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# Hermetic tests: never pick up a user/system wisdom file at import
# (the autoload test overrides this in its subprocesses).
os.environ.setdefault("REGENT_FFT_NO_WISDOM", "1")

import jax

jax.config.update("jax_platforms", "cpu")
