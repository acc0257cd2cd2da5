"""Mesh construction and sharding helpers for data-parallel training.

Design (SURVEY.md §5): a 1-D mesh with axis ``data``; the global batch is
sharded over it, parameters and optimizer state are replicated. Jitting
the train step with these shardings makes XLA emit a gradient all-reduce
(psum) over ICI after the backward pass — the TPU-native analog of
Caffe's P2PSync/NCCL tree all-reduce, but compiled into the step program
(overlapped with backprop by the XLA scheduler, not a separate phase).

Multi-slice deployments (``num_slices > 1``) get a 2-D hierarchical mesh
with a leading ``dcn`` axis: the batch is sharded over BOTH axes and XLA
lowers the gradient all-reduce hierarchically — reduce-scatter/all-gather
over ICI within each slice, then the much smaller cross-slice hop over
DCN. On real multi-slice hardware the device grid is laid out so the
``dcn`` axis crosses slice boundaries (``mesh_utils
.create_hybrid_device_mesh``); on single-slice or virtual-CPU backends a
plain reshape gives the same program (the collectives just all ride ICI).

The same code path runs on a single chip (mesh of 1), a v5e slice, or a
virtual ``--xla_force_host_platform_device_count=N`` CPU mesh in tests.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def make_mesh(
    num_devices: int | None = None,
    devices: Sequence[Any] | None = None,
    num_slices: int = 1,
) -> Mesh:
    """Build the data-parallel mesh over the first ``num_devices`` devices.

    ``num_slices=1`` (the default): a 1-D mesh with axis ``data``.
    ``num_slices>1``: a 2-D ``(dcn, data)`` hierarchical mesh — rows are
    slices, so the inner (fast, ICI) axis is ``data`` within a slice and
    the outer axis crosses the DCN boundary. The sharding helpers below
    split the batch over both axes, so the rest of the code is
    mesh-rank-agnostic.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    if num_slices <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % num_slices:
        raise ValueError(
            f"{len(devices)} devices not divisible into {num_slices} slices"
        )
    per_slice = len(devices) // num_slices
    grid = None
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        # Real multi-slice hardware: let mesh_utils place the DCN axis
        # across actual slice boundaries (ICI stays intra-slice).
        try:
            from jax.experimental import mesh_utils

            grid = mesh_utils.create_hybrid_device_mesh(
                (1, per_slice), (num_slices, 1), devices=devices
            )
        except (ImportError, ValueError, AssertionError):
            grid = None
    if grid is None:
        # Virtual CPU mesh / single-slice backend: a reshape compiles the
        # identical hierarchical program for dryrun validation.
        grid = np.asarray(devices).reshape(num_slices, per_slice)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def _all_axes(mesh: Mesh):
    """Every mesh axis, as a PartitionSpec entry (bare name for the 1-D
    mesh, tuple for the hierarchical one — a 1-tuple is equivalent but
    keeps specs ugly in dumps/tests)."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched arrays: leading axis split over every mesh
    axis (``data``, or ``(dcn, data)`` on a hierarchical mesh)."""
    return NamedSharding(mesh, P(_all_axes(mesh)))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params/opt state: fully replicated."""
    return NamedSharding(mesh, P())


def num_processes(mesh: Mesh) -> int:
    """How many OS processes own this mesh's devices (1 single-process)."""
    return len({d.process_index for d in mesh.devices.flat})


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (pytree of np/jnp arrays) onto the mesh, batch
    axis sharded. Scalars and rank-0 leaves are replicated.

    Multi-process: the batch argument is this process's LOCAL slice
    (``parallel.distributed.local_batches``), and the global array is
    assembled via ``jax.make_array_from_process_local_data`` — each host
    only ever touches the rows its own chips consume. Requires the mesh's
    batch-axis device order to be process-contiguous, which ``make_mesh``
    over ``jax.devices()`` (process-major) guarantees.

    Shard-vs-replicate is ONE predicate shared with
    ``distributed.local_slice``: a leaf is data-sharded iff its GLOBAL
    leading axis divides the global device count — locally visible here
    as ``shape[0] % local == 0`` because ``local_slice`` already cut such
    leaves by 1/nproc, and raised on the one shape class this local test
    cannot distinguish (whole-passed leaves whose axis divides ``local``
    but not ``mesh.size``)."""
    data = batch_sharding(mesh)
    repl = replicated(mesh)
    nproc = num_processes(mesh)
    if nproc <= 1:

        def put(x):
            x = np.asarray(x)
            sh = data if x.ndim >= 1 and x.shape[0] % mesh.size == 0 else repl
            return jax.device_put(x, sh)

    else:
        local = mesh.size // nproc

        def put(x):
            x = np.asarray(x)
            sh = data if x.ndim >= 1 and x.shape[0] % local == 0 else repl
            return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, batch)


def shard_stacked_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a [K, batch, ...] stacked super-batch (scan mode) onto the
    mesh with the PER-STEP batch axis (axis 1) sharded over ``data`` —
    sharding axis 0 would split the scan axis instead and silently lose
    data parallelism. Leaves without a shardable axis 1 are replicated.
    Multi-process: same process-local assembly as :func:`shard_batch`
    (axis 1 carries this process's slice; axis 0, the scan axis, is
    identical everywhere)."""
    data = NamedSharding(mesh, P(None, _all_axes(mesh)))
    repl = replicated(mesh)
    nproc = num_processes(mesh)
    if nproc <= 1:

        def put(x):
            x = np.asarray(x)
            sh = data if x.ndim >= 2 and x.shape[1] % mesh.size == 0 else repl
            return jax.device_put(x, sh)

    else:
        local = mesh.size // nproc

        def put(x):
            x = np.asarray(x)
            sh = data if x.ndim >= 2 and x.shape[1] % local == 0 else repl
            return jax.make_array_from_process_local_data(sh, x)

    return jax.tree.map(put, batch)
