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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Join (or start) a multi-process JAX runtime — multi-host readiness.

    The reference runs multi-node through Legion/GASNet startup
    (``/root/reference/src/fft.rg:513-537`` with ``USE_GASNET``); the JAX
    analog is ``jax.distributed.initialize``, after which
    ``jax.devices()`` spans every host and the mesh helpers above build
    cross-host meshes transparently (collectives ride ICI within a slice
    and DCN across slices).  On TPU pods all arguments are auto-detected;
    on CPU/GPU pass coordinator ``host:port``, world size, and rank.

    Call once, before any other JAX API.  Idempotent: repeated calls with
    the same configuration are ignored.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        raise
    from ..utils.plog import dump_machine_model
    dump_machine_model()


def num_nodes() -> int:
    """DEFAULT_TUNABLE_NODE_COUNT analog (src/fft.rg:146-148)."""
    return jax.process_count()


def num_local_devices() -> int:
    """DEFAULT_TUNABLE_LOCAL_GPUS analog (src/fft.rg:151-153)."""
    return jax.local_device_count()


def make_multislice_mesh(dcn: int, ici: Optional[int] = None,
                         axis_names: Tuple[str, str] = ("slice", "chip"),
                         devices=None) -> Mesh:
    """2-D mesh whose FIRST axis crosses slices (DCN) and second stays
    within a slice (ICI).

    Multi-slice TPU pods connect chips within a slice over ICI and
    slices over the much slower data-center network; a pencil plan over
    this mesh then pays exactly ONE collective per network tier (see
    ``make_plan_pencil``'s DCN notes).  When the runtime exposes
    multiple slices (``device.slice_index``), each mesh ROW is drawn
    from one slice — so intra-row collectives really ride ICI even for
    partial-pod selections; otherwise (CPU meshes, single slice) the
    device list is reshaped with the same axis semantics — useful for
    testing the decomposition on
    ``--xla_force_host_platform_device_count`` meshes.
    """
    if devices is None:
        devices = jax.devices()
    arr = _select_multislice(devices, dcn, ici)
    return Mesh(arr, axis_names)


def _select_multislice(devices, dcn: int, ici: Optional[int]) -> np.ndarray:
    """Pick a (dcn, ici) device array with one slice per ROW.

    Pure selection logic (unit-testable without TPU hardware): groups by
    ``device.slice_index`` so a PARTIAL selection still spans dcn
    distinct slices — the flat ``jax.devices()`` order is slice-major,
    so a naive ``devices[:need]`` would silently draw everything from
    the first slice(s) and the "slice" axis would never cross DCN.
    """
    dcn = int(dcn)
    if dcn < 1:
        raise ValueError(f"need at least one slice, got dcn={dcn}")
    if ici is None:
        ici = len(devices) // dcn
    ici = int(ici)
    need = dcn * ici
    if ici < 1 or len(devices) < need:
        raise ValueError(
            f"need {dcn}x{max(ici, 1)} devices, have {len(devices)}")
    by_slice = {}
    for d in devices:
        by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
    if len(by_slice) > 1:
        groups = [g for g in by_slice.values() if len(g) >= ici]
        if len(groups) < dcn:
            raise ValueError(
                f"need {dcn} slices with >= {ici} devices each; have "
                f"{ {k: len(v) for k, v in by_slice.items()} }")
        out = np.empty((dcn, ici), dtype=object)
        for i, g in enumerate(groups[:dcn]):
            for j in range(ici):
                out[i, j] = g[j]
        return out
    out = np.empty((dcn, ici), dtype=object)
    for k in range(need):
        out[k // ici, k % ici] = devices[k]
    return out
