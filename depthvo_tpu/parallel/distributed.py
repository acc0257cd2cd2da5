"""Multi-process (multi-host) execution: the rebuild's scale-out entry.

The reference's distributed story stops at single-host multi-GPU
(``P2PSync`` over NCCL; SURVEY.md §5 distributed-comm row). A real TPU
deployment is multi-PROCESS: one Python process per host, each seeing
only its local chips, coordinated through JAX's distributed runtime.
This module is everything the rest of the framework needs to run there:

- :func:`initialize` — wire the process into the cluster
  (``jax.distributed.initialize``), after which ``jax.devices()`` is
  GLOBAL and the existing ``parallel.mesh`` helpers build global meshes
  unchanged.
- :func:`local_batches` — adapt a deterministic global-batch iterator so
  each process feeds only its slice; combined with
  ``mesh.shard_batch``'s ``make_array_from_process_local_data`` path the
  global batch is assembled across processes without any process ever
  materializing data it doesn't own.

Design note (TPU-first): there is NO gradient-communication code here.
The jitted train step already carries data-parallel shardings, so XLA
emits the cross-host psum itself (ICI within a slice, DCN across
slices on a hierarchical mesh — ``parallel/mesh.py``). Multi-process
support is purely (a) runtime bring-up and (b) host-side data feeding;
the compiled program is the same SPMD program as single-process.

Tested on this machine by spawning real OS processes over the CPU
backend with Gloo collectives (``tests/test_multiprocess.py``): the
2-process loss trajectory matches single-process bit-for-bit-close on
identical data, and orbax save/restore round-trips multi-host.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator

import jax
import numpy as np

_ENV_COORDINATOR = "DEPTHVO_COORDINATOR"
_ENV_NUM_PROCESSES = "DEPTHVO_NUM_PROCESSES"
_ENV_PROCESS_ID = "DEPTHVO_PROCESS_ID"
_ENV_INIT_TIMEOUT = "DEPTHVO_MP_INIT_TIMEOUT_S"

_initialized = False


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: Any = None,
    initialization_timeout: int | None = None,
) -> bool:
    """Join the distributed runtime; returns True if it initialized.

    Resolution order per field: explicit argument, then the
    ``DEPTHVO_COORDINATOR`` / ``DEPTHVO_NUM_PROCESSES`` /
    ``DEPTHVO_PROCESS_ID`` environment (so launchers can export once and
    run the same command line on every host), then JAX's own
    auto-detection (on Cloud TPU pods ``jax.distributed.initialize()``
    resolves everything from the metadata server — pass nothing).

    If neither arguments, environment, nor a TPU pod environment specify
    a cluster, this is a no-op returning False: single-process runs pay
    nothing. Calling twice is a no-op (idempotent bring-up, so library
    users and the CLI can both call it).
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get(_ENV_COORDINATOR) or None
    if num_processes is None and os.environ.get(_ENV_NUM_PROCESSES):
        num_processes = int(os.environ[_ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(_ENV_PROCESS_ID):
        process_id = int(os.environ[_ENV_PROCESS_ID])
    explicit = (
        coordinator is not None
        or num_processes is not None
        or process_id is not None
    )
    if not explicit:
        # No cluster requested. Don't call jax.distributed.initialize()
        # blind: off-pod it raises, and on-pod auto-init is the
        # launcher's call to make (via env), not a silent side effect.
        return False
    if coordinator is None or num_processes is None or process_id is None:
        raise ValueError(
            "multi-process launch needs all three of coordinator address, "
            f"num_processes, process_id (got {coordinator!r}, "
            f"{num_processes!r}, {process_id!r}); set --coordinator/"
            f"--num-processes/--process-id or the {_ENV_COORDINATOR}/"
            f"{_ENV_NUM_PROCESSES}/{_ENV_PROCESS_ID} environment"
        )
    if initialization_timeout is None:
        try:
            initialization_timeout = int(os.environ[_ENV_INIT_TIMEOUT])
        except (KeyError, ValueError):
            initialization_timeout = 300  # jax's own default
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        initialization_timeout=initialization_timeout,
    )
    _initialized = True
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    """True on the process that should own singleton side effects
    (config.json persistence, stdout progress, TensorBoard writers)."""
    return jax.process_index() == 0


def local_slice(batch: Dict[str, np.ndarray], pid: int | None = None,
                n: int | None = None,
                divisor: int | None = None) -> Dict[str, np.ndarray]:
    """This process's contiguous slice of a globally-identical host batch.

    The multi-process data contract: every process constructs the SAME
    deterministic iterator (same lists, same shuffle seed), so the
    global batch is identical everywhere; process ``p`` keeps rows
    ``[p*B/n, (p+1)*B/n)``. This matches ``mesh.shard_batch``'s
    process-local assembly (contiguous leading-axis layout of
    ``make_array_from_process_local_data`` over a process-major device
    mesh), and makes single- vs multi-process trajectories comparable
    sample-for-sample — the property ``tests/test_multiprocess.py``
    asserts.

    Per-leaf rule — ONE predicate shared with ``mesh.shard_batch``: a
    leaf is cut (and later data-sharded) iff its leading axis divides
    ``divisor`` — the GLOBAL device count (``jax.device_count()``; the
    multi-process mesh spans all global devices), exactly the
    single-process sharding rule. Leaves that don't divide (scalars,
    rank-0, odd-size aux arrays) pass through whole and are replicated
    downstream. The one shape class the two sides cannot agree on from
    local shapes alone — leading axis divisible by the PER-PROCESS
    device count but not by the global one — raises loudly here:
    ``shard_batch`` would misread the whole-passed leaf as a cut one and
    silently assemble a corrupt global array (each process contributing
    identical rows as if they were distinct shards).
    """
    pid = jax.process_index() if pid is None else pid
    n = jax.process_count() if n is None else n
    if n <= 1:
        return batch
    divisor = jax.device_count() if divisor is None else divisor
    local = max(1, divisor // n)

    def cut(key, x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % divisor == 0:
            per = x.shape[0] // n
            return x[pid * per:(pid + 1) * per]
        if x.ndim >= 1 and x.shape[0] % local == 0:
            hint = (
                "With one device per process every nonzero leading axis "
                "trivially divides the per-process count, so replication "
                "of odd-size batched leaves is not expressible in that "
                "layout; pad it "
                if local == 1
                else "Pad it "
            )
            raise ValueError(
                f"batch leaf {key!r} has leading axis {x.shape[0]}, which "
                f"divides the per-process device count ({local}) but not "
                f"the global one ({divisor}); downstream sharding cannot "
                "distinguish this replicated leaf from a data-sharded "
                f"slice and would corrupt it silently. {hint}to a multiple "
                f"of {divisor}, or carry it outside the batch."
            )
        return x

    return {k: cut(k, v) for k, v in batch.items()}


def local_batches(
    it: Iterator[Dict[str, np.ndarray]],
    divisor: int | None = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Wrap a deterministic global-batch iterator to yield this
    process's slice (see :func:`local_slice`). No-op wrapper under a
    single process.

    ``divisor`` is the size of the mesh the batches will be sharded
    onto. Pass ``mesh.size`` whenever training runs on a subset mesh
    (``cli train --num-devices < jax.device_count()``): the default,
    the global device count, only matches meshes spanning every device,
    and the shared cut-iff-divides predicate silently diverges from
    ``mesh.shard_batch`` otherwise."""
    for batch in it:
        yield local_slice(batch, divisor=divisor)
