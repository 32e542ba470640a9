"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel over up to
8 GPUs (modules/trainer.py:307,333-338): replicated models, batch
scatter/gather. The TPU-native equivalent is a 1-D data mesh: parameters
replicated, batches sharded on the 'data' axis, gradients all-reduced by XLA
over ICI (psum inserted automatically under jit with these shardings; DCN
across hosts after jax.distributed.initialize).

Keeping the mesh 1-D matches the model scale (11M-param generators — no need
for tensor/pipeline axes), but everything below takes the axis name as a
parameter so a 2-D mesh can be introduced without touching call sites.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SP_AXIS = "sp"


def data_mesh(n_devices: int | None = None,
              devices: Sequence[Any] | None = None) -> Mesh:
    """1-D mesh over the batch axis. Defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sp_mesh(dp: int, sp: int,
                 devices: Sequence[Any] | None = None) -> Mesh:
    """2-D (data, sp) mesh: batch rows over 'data', image rows (the H axis
    of NHWC tensors) over 'sp'. XLA's SPMD partitioner inserts the conv
    halo exchanges and turns full-image reductions (InstanceNorm statistics)
    into per-shard partials + an 'sp' all-reduce — no manual collectives.
    Spatial sharding divides the per-chip activation footprint by `sp`, the
    lever when the batch axis alone can't (latency-critical small batches,
    or activation-bound steps that would otherwise need remat)."""
    if devices is None:
        devices = jax.devices()
    if dp * sp > len(devices):
        raise ValueError(f"mesh {dp}x{sp} exceeds {len(devices)} devices")
    return Mesh(np.asarray(devices[:dp * sp]).reshape(dp, sp),
                (DATA_AXIS, SP_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis; when the mesh has
    an 'sp' axis, image-shaped arrays (ndim >= 3) also shard their H axis
    (axis 1: NHWC / NHWM) over it."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    if SP_AXIS in mesh.axis_names and ndim >= 3:
        spec[1] = SP_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch (pytree of arrays) with the leading axis
    sharded over the mesh — the single-process input feed."""
    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(_put, batch)


def mesh_process_count(mesh: Mesh) -> int:
    """Number of distinct processes whose devices participate in the mesh."""
    return len({d.process_index for d in mesh.devices.flat})


def process_row_slice(mesh: Mesh, global_batch: int) -> slice:
    """The rows of a batch-sharded global array that this process's devices
    own under `batch_sharding` (contiguous for the standard device order).

    This is the per-host input-feed contract: each host loads only these
    rows and assembles the global array with `global_shard_batch`.

    On a (data, sp) mesh, batch rows shard dp-ways while each row's H axis
    spreads over the sp devices of that mesh row; a host therefore feeds
    FULL images for the batch rows it owns, which requires its devices to
    cover whole sp rows of the mesh (the flat device order is row-major, so
    standard jax.devices()-ordered meshes satisfy this whenever the process
    count divides dp or vice versa)."""
    devs = list(mesh.devices.flat)
    n_data = int(mesh.shape.get(DATA_AXIS, len(devs)))
    sp = len(devs) // n_data  # 1 on 1-D meshes
    if global_batch % n_data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n_data} data-axis devices")
    pos = [i for i, d in enumerate(devs)
           if d.process_index == jax.process_index()]
    if not pos:
        raise ValueError("this process has no devices in the mesh")
    if pos != list(range(pos[0], pos[0] + len(pos))):
        raise ValueError("this process's mesh devices are not contiguous; "
                         "build the mesh from jax.devices() order")
    if pos[0] % sp or len(pos) % sp:
        raise ValueError(
            f"this process's devices cover a partial sp row of the "
            f"{n_data}x{sp} mesh (flat positions {pos[0]}..{pos[-1]}); the "
            "per-host feed ships full images per batch row, so each process "
            "must own whole sp rows — choose dp/sp so the process's device "
            "count is a multiple of sp")
    rows = global_batch // n_data
    first_row, n_rows = pos[0] // sp, len(pos) // sp
    return slice(first_row * rows, (first_row + n_rows) * rows)


def global_shard_batch(mesh: Mesh, local_batch: Any) -> Any:
    """Assemble globally batch-sharded arrays from each process's local rows
    (jax.make_array_from_process_local_data). With one process this is
    exactly `shard_batch`. The multi-host data-parallel input feed: hosts
    load disjoint row ranges (see `process_row_slice` / HostLoader's
    `shard`), XLA all-reduces gradients over ICI/DCN."""
    if mesh_process_count(mesh) == 1:
        return shard_batch(mesh, local_batch)
    n_proc = mesh_process_count(mesh)

    def _put(x):
        sharding = batch_sharding(mesh, np.ndim(x))
        global_shape = (x.shape[0] * n_proc,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)
    return jax.tree_util.tree_map(_put, local_batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Device-put a pytree fully replicated (parameters, opt states)."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host initialization (jax.distributed) for pod-slice training:
    gradients all-reduce over ICI within a slice and DCN across hosts once
    every host has called this. On single-host TPU VMs (or when the args are
    omitted and no cluster env is detected) this is a no-op."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (ValueError, RuntimeError):
        # single-process environment — nothing to coordinate
        pass
