#!/usr/bin/env python
"""Benchmark entry point for the driver: prints ONE JSON line.

Metric: depth-inference frames/sec/chip at KITTI 608x160 (the BASELINE.json
headline: ">= 5x Caffe-CPU depth fps/chip on v5e-1"). The Caffe-CPU
baseline for a ResNet50-1/2 encoder-decoder at 608x160 is ~2-4 fps/core
class hardware; BASELINE.json publishes no number ("published": {}), so
``vs_baseline`` is reported against a fixed 20 fps stand-in — i.e. 5x a
generous 4 fps Caffe-CPU estimate — until a measured reference number
exists (BASELINE.md: throughput "not published").
"""

import json
import sys


CAFFE_CPU_FPS_ESTIMATE = 4.0  # generous single-core Caffe-CPU estimate
TARGET_MULTIPLIER = 5.0


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
    out = {
        "metric": "depth_infer_frames_per_sec_per_chip_608x160",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / (CAFFE_CPU_FPS_ESTIMATE * TARGET_MULTIPLIER), 3),
        "detail": {
            "backend": result["backend"],
            "device": result["device"],
            "batch_size": result["batch_size"],
            "median_step_s": result["median_s"],
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
