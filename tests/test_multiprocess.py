"""Multi-process (multi-host) execution tests — VERDICT r3 item 1.

Spawns REAL OS processes that join a jax.distributed cluster over the
CPU backend (Gloo collectives) and run the production training path:
``parallel.distributed.initialize`` -> per-process ``local_batches`` ->
``fit`` over the global mesh -> multi-host orbax save/restore
(tests/mp_worker.py). The headline assertion: the 2-process x 2-device
loss trajectory matches the 1-process x 4-device trajectory on the same
global data — same SPMD program, different process layout.

These are subprocess tests: the parent's jax (8-device CPU from
conftest) never touches the workers' clusters.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nproc: int, local_devices: int, outdir: str,
                 steps: int = 4, steps_per_call: int = 1,
                 timeout: int = 1500, batch_size: int | None = None,
                 _retries: int = 1) -> dict:
    """Launch nproc workers, wait, return proc0's result record.

    Gloo's KV-store bring-up carries a fixed in-XLA deadline
    (~30 s) that concurrent host load can blow (DEADLINE_EXCEEDED — the
    round-4 full-suite flake); a failed or timed-out cluster is retried
    once on a fresh port before failing the test.
    """
    os.makedirs(outdir, exist_ok=True)
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=_REPO)
    # The workers pick their backend via jax.config (see mp_worker.py);
    # drop the axon trigger so a degraded TPU tunnel can't block them.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # Share a persistent compile cache across workers/clusters: the CPU
    # compiles of the tiny_test step dominate this test's wall clock.
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(outdir.rstrip("/")), "jaxcache"),
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    argv_tail = [] if batch_size is None else [str(batch_size)]
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port),
             str(local_devices), outdir, str(steps), str(steps_per_call),
             *argv_tail],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
            q.wait()
        if _retries > 0:
            return _run_cluster(nproc, local_devices, outdir, steps,
                                steps_per_call, timeout, batch_size,
                                _retries - 1)
        raise
    if any(p.returncode != 0 for p in procs) and _retries > 0:
        return _run_cluster(nproc, local_devices, outdir, steps,
                            steps_per_call, timeout, batch_size,
                            _retries - 1)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker {p.args[2]} failed (rc={p.returncode}):\n{out[-4000:]}"
        )
    with open(os.path.join(outdir, "proc0.json")) as f:
        return json.load(f)


def test_local_slice_contract():
    """local_slice shares shard_batch's divisibility predicate: cut iff
    the GLOBAL leading axis divides the global device count; whole-pass
    (replicate) otherwise; and raise loudly on the one shape class the
    downstream local-shape test cannot distinguish from a cut slice."""
    from depthvo_tpu.parallel import distributed as dist

    batch = {
        "x": np.arange(8.0).reshape(8, 1),   # 8 % 4 == 0 -> cut
        "odd": np.arange(3.0),               # 3 % 4 != 0, 3 % 2 != 0 -> whole
        "s": np.float32(2.0),                # rank-0 -> whole
    }
    out = dist.local_slice(batch, pid=1, n=2, divisor=4)
    np.testing.assert_array_equal(out["x"], batch["x"][4:8])
    np.testing.assert_array_equal(out["odd"], batch["odd"])
    assert out["s"] == batch["s"]

    # Leading axis divides local (4//2=2) but not global (4): previously
    # cut silently -> shard_batch assembled a corrupt 'replicated' array;
    # now a loud contract error.
    with pytest.raises(ValueError, match="divides the per-process"):
        dist.local_slice({"half": np.zeros((2, 3))}, pid=0, n=2, divisor=4)
    # Dual case: divides nproc but neither global nor local cleanly ->
    # also ambiguous downstream (6 % 2 == 0 local-test passes) -> raise.
    with pytest.raises(ValueError, match="divides the per-process"):
        dist.local_slice({"six": np.zeros((6, 3))}, pid=0, n=2, divisor=4)


@pytest.mark.slow
def test_two_process_trajectory_matches_single_process(tmp_path):
    """1 process x 4 devices == 2 processes x 2 devices: same global
    batch, same SPMD program, so the optimizer trajectories must agree
    (only all-reduce summation order differs -> f32 noise tolerance)."""
    single = _run_cluster(1, 4, str(tmp_path / "single"))
    double = _run_cluster(2, 2, str(tmp_path / "double"))

    assert single["global_devices"] == double["global_devices"] == 4
    assert double["process_count"] == 2
    s = dict(single["losses"])
    d = dict(double["losses"])
    assert set(s) == set(d) and len(s) >= 2
    # Step-0 losses are bit-identical (same global batch through the
    # same program before any update); later steps drift only by f32
    # all-reduce summation order (Gloo cross-process vs in-process),
    # measured ~2e-4 rel by step 3 on the loss and ~3e-6 on the params
    # fingerprint.
    np.testing.assert_allclose(d[0], s[0], rtol=1e-6)
    for step in sorted(s):
        np.testing.assert_allclose(
            d[step], s[step], rtol=1e-3,
            err_msg=f"loss diverged at step {step}",
        )
    np.testing.assert_allclose(
        double["params_fingerprint"], single["params_fingerprint"],
        rtol=5e-5,
    )


@pytest.mark.slow
def test_multiprocess_orbax_roundtrip_and_scan_mode(tmp_path):
    """Multi-host orbax save/restore (asserted inside each worker) and
    the scan-mode (steps_per_call>1) dispatch path under 2 processes,
    including the exact-steps tail (5 steps at K=4 -> 4+1)."""
    rec = _run_cluster(
        2, 2, str(tmp_path / "scan"), steps=5, steps_per_call=4
    )
    assert rec["final_step"] == 5
    np.testing.assert_allclose(
        rec["restored_fingerprint"], rec["params_fingerprint"], rtol=0
    )


@pytest.mark.slow
def test_driver_shape_two_by_four(tmp_path):
    """The driver's exact dryrun shape — 2 processes x 4 devices = 8
    global devices — through the production multi-process fit path.

    Round 4's bug: mp_worker hard-coded batch_size=4, which fails the
    batch-divisibility contract at 8 global devices; CI only ever built
    4-global-device clusters (1x4, 2x2) so the driver's shape had never
    executed. The worker now sizes the batch from the cluster
    (max(4, nproc*local) = 8 here); this test pins the shape forever."""
    rec = _run_cluster(2, 4, str(tmp_path / "d24"), steps=2)
    assert rec["global_devices"] == 8
    assert rec["process_count"] == 2
    assert rec["final_step"] == 2
    assert len(rec["losses"]) >= 1
