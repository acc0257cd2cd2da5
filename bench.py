#!/usr/bin/env python
"""Benchmark entry point for the driver: prints ONE JSON line.

Metric: depth-inference frames/sec/chip at KITTI 608x160 (the BASELINE.json
headline: ">= 5x Caffe-CPU depth fps/chip on v5e-1"). BASELINE.json
publishes no reference throughput ("published": {}), so the denominator is
a MEASURED stand-in: the same depth network at batch 1 on this machine's
CPU backend (benchmarks/cpu_baseline.json, with provenance). vs_baseline
is fps / (5 x measured_cpu_fps) — >= 1.0 means the 5x gate is met against
the measured number. Falls back to a documented 4 fps estimate only if the
measured file is missing.
"""

import json
import os
import subprocess
import sys

CAFFE_CPU_FPS_FALLBACK = 4.0  # generous single-core Caffe-CPU estimate
_PROBE_TIMEOUT_S = 180  # healthy tunnel answers a tiny matmul in ~10 s
TARGET_MULTIPLIER = 5.0
_BASELINE_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "benchmarks", "cpu_baseline.json"
)


def _baseline_fps() -> tuple:
    """(fps, source) — measured CPU-backend number if recorded."""
    try:
        with open(_BASELINE_FILE) as f:
            rec = json.load(f)
        return float(rec["value"]), "measured_cpu_backend_batch1"
    except (OSError, KeyError, ValueError):
        return CAFFE_CPU_FPS_FALLBACK, "estimate"


def _ensure_reachable_backend() -> str:
    """Guard against a down/degraded TPU tunnel hanging the benchmark.

    The axon plugin (registered whenever PALLAS_AXON_POOL_IPS is set) BLOCKS
    jax.devices() forever when the tunnel is down — even `import jax` work
    after backend selection can wedge. Probe the device in a subprocess with
    a hard timeout; on failure re-exec this script pinned to the CPU backend
    so the driver always gets its one JSON line instead of a hang.
    Returns a note for the output JSON ("" when the TPU answered).
    """
    if os.environ.get("DEPTHVO_BENCH_CPU_FALLBACK"):
        return "tpu_unreachable_fell_back_to_cpu"
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return ""  # no tunnel plugin in play; whatever backend is configured
    probe = (
        "import jax, numpy as np; x = jax.numpy.ones((128, 128));"
        "print(float(np.asarray(x @ x)[0, 0]))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=_PROBE_TIMEOUT_S,
            capture_output=True,
        )
        if r.returncode == 0:
            return ""
    except subprocess.TimeoutExpired:
        pass
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["DEPTHVO_BENCH_CPU_FALLBACK"] = "1"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)
    raise RuntimeError("unreachable")  # pragma: no cover


def main() -> int:
    fallback_note = _ensure_reachable_backend()

    from depthvo_tpu.utils.profiling import run_benchmark

    # Batch 128: measured throughput knee on v5e-1 (32 -> 1.9k fps,
    # 128 -> 5.0k fps, 256 -> 5.3k fps); latency still under 26 ms/batch.
    # The CPU fallback shrinks the workload so one JSON line still lands
    # in minutes on a 1-core host.
    result = run_benchmark(
        mode="depth_infer",
        batch_size=4 if fallback_note else 128,
        height=160,
        width=608,
        steps=3 if fallback_note else 30,
    )
    fps = result["frames_per_sec"]
    base_fps, base_src = _baseline_fps()
    out = {
        "metric": "depth_infer_frames_per_sec_per_chip_608x160",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / (base_fps * TARGET_MULTIPLIER), 3),
        "detail": {
            "backend": result["backend"],
            "device": result["device"],
            "batch_size": result["batch_size"],
            "median_step_s": result["median_s"],
            "baseline_fps": base_fps,
            "baseline_source": base_src,
        },
    }
    if fallback_note:
        out["detail"]["note"] = fallback_note
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
