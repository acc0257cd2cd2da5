"""Mesh construction and sharding helpers for data-parallel training.

Design (SURVEY.md §5): a 1-D mesh with axis ``data``; the global batch is
sharded over it, parameters and optimizer state are replicated. Jitting
the train step with these shardings makes XLA emit a gradient all-reduce
(psum) over ICI after the backward pass — the TPU-native analog of
Caffe's P2PSync/NCCL tree all-reduce, but compiled into the step program
(overlapped with backprop by the XLA scheduler, not a separate phase).

The same code path runs on a single chip (mesh of 1), a v5e slice, or a
virtual ``--xla_force_host_platform_device_count=N`` CPU mesh in tests.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices: Sequence[Any] | None = None) -> Mesh:
    """Build a 1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for batched arrays: leading axis split over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params/opt state: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (pytree of np/jnp arrays) onto the mesh, batch
    axis sharded. Scalars and rank-0 leaves are replicated."""
    data = batch_sharding(mesh)
    repl = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        sh = data if x.ndim >= 1 and x.shape[0] % mesh.size == 0 else repl
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)


def shard_stacked_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a [K, batch, ...] stacked super-batch (scan mode) onto the
    mesh with the PER-STEP batch axis (axis 1) sharded over ``data`` —
    sharding axis 0 would split the scan axis instead and silently lose
    data parallelism. Leaves without a shardable axis 1 are replicated."""
    data = NamedSharding(mesh, P(None, DATA_AXIS))
    repl = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        sh = data if x.ndim >= 2 and x.shape[1] % mesh.size == 0 else repl
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch)
