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
import sys

CAFFE_CPU_FPS_FALLBACK = 4.0  # generous single-core Caffe-CPU estimate
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


def main() -> int:
    from depthvo_tpu.utils.profiling import run_benchmark

    # Batch 128: measured throughput knee on v5e-1 (32 -> 1.9k fps,
    # 128 -> 5.0k fps, 256 -> 5.3k fps); latency still under 26 ms/batch.
    result = run_benchmark(
        mode="depth_infer",
        batch_size=128,
        height=160,
        width=608,
        steps=30,
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
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
