"""Device-mesh helpers.

The reference's cluster awareness is two Legion tunables — node count and
local GPU count (``/root/reference/src/fft.rg:123-153``) — plus equal
partitions.  The TPU analog is an explicit ``jax.sharding.Mesh``; these
helpers build 1-D and 2-D meshes over the available devices with ICI-aware
ordering left to ``jax.make_mesh``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_fft_mesh(n_devices: Optional[int] = None, axis_name: str = "fft",
                  devices=None) -> Mesh:
    """1-D mesh for slab / per-shard decompositions."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis_name,))


def make_pencil_mesh(shape: Tuple[int, int], axis_names: Tuple[str, str] = ("fy", "fz"),
                     devices=None) -> Mesh:
    """2-D mesh for pencil decompositions (rows x cols)."""
    if devices is None:
        devices = jax.devices()[: shape[0] * shape[1]]
    if len(devices) < shape[0] * shape[1]:
        raise ValueError(f"need {shape[0]*shape[1]} devices, have {len(devices)}")
    arr = np.asarray(devices[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(arr, axis_names)


def num_nodes() -> int:
    """DEFAULT_TUNABLE_NODE_COUNT analog (src/fft.rg:146-148)."""
    return jax.process_count()


def num_local_devices() -> int:
    """DEFAULT_TUNABLE_LOCAL_GPUS analog (src/fft.rg:151-153)."""
    return jax.local_device_count()
