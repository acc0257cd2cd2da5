"""Orbax checkpointing: save/resume/staged-finetune.

Reference parity (SURVEY.md §5 "Checkpoint / resume"):
* ``Solver::Snapshot`` every N iters        -> ``make_manager`` + ``save``.
* ``caffe train --snapshot=x.solverstate``  -> ``maybe_restore`` (full
  state: params + BN stats + optimizer moments + step).
* ``caffe train --weights=x.caffemodel``    -> ``restore_weights``
  (weights-only init for the staged recipe: new optimizer, step 0).

Restart-from-latest is automatic: ``maybe_restore`` is a no-op when the
directory has no checkpoints, so crash recovery is "rerun the same
command" (SURVEY.md §5 failure-detection row).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from depthvo_tpu.train.state import TrainState


def make_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save(mgr: ocp.CheckpointManager, state: TrainState) -> None:
    mgr.save(int(state.step), args=ocp.args.StandardSave(state))


def maybe_restore(mgr: ocp.CheckpointManager, state: TrainState) -> TrainState:
    """Resume from the latest checkpoint if one exists, else return state."""
    step = mgr.latest_step()
    if step is None:
        return state
    return mgr.restore(step, args=ocp.args.StandardRestore(state))


def restore_param_subtree(directory: str, state: TrainState, key: str) -> TrainState:
    """Replace ONE top-level param subtree ('depth'/'odom'/'feat') from a
    checkpoint directory, keeping everything else — the staged-recipe
    combinator (e.g. depth+odom from stage 2, feat from pretrain-feat)."""
    mgr = make_manager(directory)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    restored = _restore_raw_resharded(mgr, step)
    r_params = restored["params"]
    if key not in r_params or not r_params[key]:
        raise KeyError(f"checkpoint in {directory} has no '{key}' params")
    new_params = dict(state.params)
    new_params[key] = jax.tree.map(
        lambda _, v: jax.numpy.asarray(v), state.params[key], r_params[key]
    )
    return state.replace(params=new_params)


def _restore_raw_resharded(mgr: ocp.CheckpointManager, step: int) -> Any:
    """Restore the raw checkpoint pytree onto the CURRENT devices.

    A checkpoint saved from an 8-device DP mesh must still load on a
    single chip (train DP -> eval/infer single-device, or staged init
    across device counts). A bare ``mgr.restore(step)`` reuses the saved
    shardings and fails when the device set changed, so rebuild the
    abstract tree from checkpoint metadata with a local sharding.
    """
    try:
        return mgr.restore(step)
    except Exception:
        pass
    from jax.sharding import SingleDeviceSharding

    sharding = SingleDeviceSharding(jax.devices()[0])
    meta = mgr.item_metadata(step)

    def abstract(m):
        if hasattr(m, "shape") and getattr(m, "dtype", None) is not None:
            return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding)
        return m

    template = jax.tree.map(abstract, meta)
    return mgr.restore(step, args=ocp.args.StandardRestore(template))


def restore_weights(directory: str, state: TrainState) -> TrainState:
    """Weights-only init from a previous stage's checkpoint directory.

    Loads params and batch_stats; keeps the fresh optimizer state and
    step 0 — the analog of ``--weights=<prev-stage>.caffemodel``.
    Param subtrees present in the checkpoint but absent from ``state``
    (or vice versa) are matched by top-level key ('depth', 'odom', 'feat'):
    stage 2 initializes 'depth' from stage 1 while 'odom' stays random.
    """
    mgr = make_manager(directory)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    restored = _restore_raw_resharded(mgr, step)
    r_params = restored["params"]
    new_params = dict(state.params)
    for key in new_params:
        if key in r_params and r_params[key]:
            target = jax.tree.map(lambda x: x, state.params[key])
            new_params[key] = jax.tree.map(
                lambda _, v: jax.numpy.asarray(v), target, r_params[key]
            )
    new_bs = state.batch_stats
    if restored.get("batch_stats"):
        new_bs = jax.tree.map(
            lambda _, v: jax.numpy.asarray(v), state.batch_stats, restored["batch_stats"]
        )
    return state.replace(params=new_params, batch_stats=new_bs)
