"""Multi-process worker for tests/test_multiprocess.py — NOT a pytest file.

Run as ``python tests/mp_worker.py PID NPROC PORT LOCAL_DEVICES OUTDIR
STEPS STEPS_PER_CALL [BATCH_SIZE]``: joins a local jax.distributed
cluster over the CPU backend (Gloo collectives), trains ``tiny_test`` on
deterministic synthetic scenes through the REAL production path
(cli-equivalent: ``distributed.initialize`` -> ``local_batches`` ->
``fit`` with orbax checkpointing), then restores the checkpoint and
writes a JSON record of the loss trajectory + a params fingerprint for
the parent test to compare across process counts.

BATCH_SIZE defaults to the cluster shape: ``max(4, nproc *
local_devices)`` — the global batch must divide the GLOBAL device count
(parallel/distributed.py's divisibility contract), so a hard-coded 4
breaks any cluster with more than 4 global devices (the round-4 bug: the
driver's 2x4 dryrun raised while every 4-global-device CI shape passed).
"""

import json
import os
import sys


def main() -> int:
    pid, nproc, port, local_devices = (int(a) for a in sys.argv[1:5])
    outdir = sys.argv[5]
    steps = int(sys.argv[6])
    steps_per_call = int(sys.argv[7]) if len(sys.argv) > 7 else 1
    batch_size = (
        int(sys.argv[8]) if len(sys.argv) > 8
        else max(4, nproc * local_devices)
    )

    import jax

    # Same bring-up contract as tests/conftest.py, but per-worker device
    # count: config API beats the axon sitecustomize and env vars.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)

    from depthvo_tpu.parallel import distributed as dist

    if nproc > 1:
        assert dist.initialize(f"localhost:{port}", nproc, pid)
        assert dist.process_count() == nproc
        assert dist.process_index() == pid

    import numpy as np

    from depthvo_tpu.configs import base as configs
    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.io import checkpoint as ckpt_io
    from depthvo_tpu.parallel import mesh as pmesh
    from depthvo_tpu.train import loop as train_loop

    # Rendezvous AFTER the heavy imports, BEFORE the first backend touch:
    # gloo's address exchange (inside the first jax.devices()) carries a
    # fixed in-library ~30 s deadline, and on a loaded 1-core host the
    # flax/orbax import skew between workers alone can exceed it (the
    # round-4/5 DEADLINE_EXCEEDED flake). A filesystem barrier bounds the
    # skew at the deadline-sensitive phase to ~0.
    if nproc > 1:
        import time

        # Port is unique per cluster attempt, so retries rendezvous
        # afresh instead of sailing through a stale barrier.
        barrier = os.path.join(outdir, f"import_barrier_{port}")
        os.makedirs(barrier, exist_ok=True)
        open(os.path.join(barrier, f"w{pid}"), "w").close()
        deadline = time.time() + 900
        while len(os.listdir(barrier)) < nproc:
            if time.time() > deadline:
                raise TimeoutError(
                    f"worker {pid}: import barrier never filled "
                    f"({os.listdir(barrier)} of {nproc})"
                )
            time.sleep(0.25)

    cfg = configs.tiny_test(batch_size=batch_size)
    mesh = pmesh.make_mesh()  # all global devices
    assert mesh.size == nproc * local_devices

    if nproc > 1:
        # Bring up EVERY Gloo communicator now, while inter-worker skew
        # is ~0 (all workers just left the import barrier). Context
        # creation is the one phase with a fixed ~30 s KV-store deadline
        # inside XLA's CPU collectives, and it happens lazily at each
        # clique's FIRST collective — which otherwise lands mid-training
        # where asymmetric compile times (e.g. one worker hitting the
        # persistent compile cache where its sibling misses) can exceed
        # the deadline (the round-5 GetKeyValue DEADLINE_EXCEEDED
        # failures). Once created, contexts are cached and later
        # collectives simply wait for their peers.
        from jax.experimental import multihost_utils

        # Host-level clique: the one orbax + per-process batch assembly
        # use (process_allgather / broadcast_one_to_all).
        multihost_utils.process_allgather(np.zeros(1))
        # All-device clique: the one the train step's gradient psum
        # uses — a trivial jitted reduction over a mesh-sharded array
        # compiles to a cross-process all-reduce in seconds.
        import jax.numpy as jnp

        # shard_batch takes this process's LOCAL rows in multi-process
        # mode (local_devices of the mesh.size global).
        sharded = pmesh.shard_batch(
            np.zeros((local_devices, 1), np.float32), mesh
        )
        jax.jit(jnp.sum)(sharded).block_until_ready()

    # The multi-process data contract: identical deterministic iterator
    # everywhere, each process keeps its slice. fixed=True pins the
    # batch so every step sees the same global data in every variant of
    # this test (1x4, 2x2), making trajectories directly comparable.
    it = dist.local_batches(
        SyntheticScenes(cfg, seed=7, num_scenes=4).iterator(
            cfg.batch_size, fixed=True
        ),
        divisor=mesh.size,
    )

    losses = []

    def log(step, metrics):
        if "loss/total" in metrics:
            losses.append((step, float(metrics["loss/total"])))

    ckpt_dir = os.path.join(outdir, "ckpt")
    state = train_loop.fit(
        cfg, it, steps, mesh=mesh, checkpoint_dir=ckpt_dir,
        log_fn=log, steps_per_call=steps_per_call, prefetch=2,
    )
    assert int(state.step) == steps, int(state.step)

    # Multi-host orbax round-trip: restore into a fresh state on the
    # same global mesh and check the step counter survived.
    from depthvo_tpu.train.state import create_state

    fresh = jax.device_put(
        create_state(cfg, jax.random.PRNGKey(0)), pmesh.replicated(mesh)
    )
    mgr = ckpt_io.make_manager(ckpt_dir)
    restored = ckpt_io.maybe_restore(mgr, fresh)
    assert int(restored.step) == steps, int(restored.step)

    # Params fingerprint: replicated, so identical on every process and
    # (if the math is right) across process layouts.
    fp = float(
        sum(float(np.abs(np.asarray(x)).sum())
            for x in jax.tree.leaves(state.params))
    )
    rfp = float(
        sum(float(np.abs(np.asarray(x)).sum())
            for x in jax.tree.leaves(restored.params))
    )
    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({
            "losses": losses,
            "final_step": int(state.step),
            "params_fingerprint": fp,
            "restored_fingerprint": rfp,
            "global_devices": mesh.size,
            "process_count": dist.process_count(),
        }, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
