#!/usr/bin/env python
"""Benchmark runners for the 5 BASELINE.json configs (SURVEY.md §7 step 6).

Each runner prints exactly ONE JSON line; ``python benchmarks/run_all.py``
runs all five in-process on whatever backend is active (the tunneled TPU
chip by default). Select a subset with ``--configs 1,4``.

The five BASELINE configs and their TPU-native measurements:

1. depth inference        — batched DepthNet forward, frames/s/chip
                            (batch 128, the measured v5e throughput knee)
                            + batch-1 latency (the reference's per-image
                            pycaffe loop analog).
2. odometry inference     — OdomNet forward + SE(3) exp over a seq-09-
                            length stream, plus host trajectory
                            composition, frames/s.
3. stereo training        — stereo-variant train step, batch 4
                            (reference experiments/depth), steps/s +
                            frames/s.
4. full_feat training     — full temporal+stereo+feature train step
                            (reference experiments/depth_odometry_feat),
                            steps/s + frames/s. This records PARITY.md's
                            train-step claim as a captured number.
5. eval sweep throughput  — the batched eval pipeline end to end:
                            depth prediction over an Eigen-sized frame
                            set + trajectory prediction/composition,
                            frames/s including host-side pre/post.

All runners use synthetic image data (the benchmark measures compute, not
disk) but real model configs at KITTI 608x160.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Runnable as a plain script: put the repo root on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(payload: dict) -> None:
    print(json.dumps(payload), flush=True)


def _device_info() -> dict:
    import jax

    return {"backend": jax.default_backend(), "device": str(jax.devices()[0])}


def config1_depth_infer(steps: int = 30) -> dict:
    from depthvo_tpu.utils.profiling import run_benchmark

    knee = run_benchmark(mode="depth_infer", batch_size=128, steps=steps)
    single = run_benchmark(mode="depth_infer", batch_size=1, steps=steps)
    return {
        "config": 1,
        "metric": "depth_infer_frames_per_sec_per_chip_608x160",
        "value": round(knee["frames_per_sec"], 2),
        "unit": "frames/s",
        "detail": {
            **_device_info(),
            "batch_size": 128,
            "median_step_s": knee["median_s"],
            "batch1_latency_ms": round(single["median_s"] * 1e3, 3),
        },
    }


def config2_odom_infer(steps: int = 30, seq_len: int = 1591) -> dict:
    """Odometry over a seq-09-length pair stream + trajectory compose.

    seq 09 has 1591 frames; the compose step is host numpy (it is a
    1591-long sequential 4x4 chain — not worth a device roundtrip).
    """
    from depthvo_tpu.eval.odometry import compose_trajectory
    from depthvo_tpu.geometry import se3
    from depthvo_tpu.utils.profiling import run_benchmark

    batch = 128
    net = run_benchmark(mode="odom_infer", batch_size=batch, steps=steps)
    # Host composition cost over the full sequence length.
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    twists = rng.normal(0, 0.01, (seq_len - 1, 6)).astype(np.float32)
    rels = np.asarray(se3.exp(jnp.asarray(twists)))
    t0 = time.perf_counter()
    compose_trajectory(rels)
    compose_s = time.perf_counter() - t0
    net_s_per_seq = (seq_len - 1) / net["frames_per_sec"]
    total_s = net_s_per_seq + compose_s
    return {
        "config": 2,
        "metric": "odom_seq09_frames_per_sec_per_chip",
        "value": round((seq_len - 1) / total_s, 2),
        "unit": "frames/s",
        "detail": {
            **_device_info(),
            "batch_size": batch,
            "net_frames_per_sec": round(net["frames_per_sec"], 2),
            "compose_s_per_seq": round(compose_s, 4),
            "seq_len": seq_len,
        },
    }


def _train_config(variant: str, config_id: int, batch_size: int = 4,
                  steps: int = 20, scan: bool = False) -> dict:
    from depthvo_tpu.utils.profiling import run_benchmark

    # Headline number: K=8 steps per dispatch via lax.scan when requested
    # (per-dispatch tunnel latency amortized; measured at conv-schedule
    # parity with the straight-line step — train/loop.make_scan_train_step).
    mode = "train_step_scan" if scan else "train_step"
    r = run_benchmark(mode=mode, batch_size=batch_size, steps=steps, variant=variant)
    detail = {
        **_device_info(),
        "batch_size": batch_size,
        "median_step_s": r["median_s"],
        "steps_per_sec": round(1.0 / r["median_s"], 3),
    }
    # Training MFU from XLA cost analysis (profiling.run_benchmark):
    # the honest per-chip throughput form (SURVEY.md §6).
    for k in ("flops_per_step", "mfu", "bf16_peak_tflops_assumed"):
        if k in r:
            detail[k] = r[k]
    if scan:
        seq = run_benchmark(
            mode="train_step", batch_size=batch_size, steps=steps, variant=variant
        )
        detail["steps_per_call"] = r["steps_per_call"]
        detail["sequential_dispatch_step_s"] = seq["median_s"]
    return {
        "config": config_id,
        "metric": f"{variant}_train_frames_per_sec_per_chip_608x160",
        "value": round(r["frames_per_sec"], 2),
        "unit": "frames/s",
        "detail": detail,
    }


def config3_stereo_train(steps: int = 20) -> dict:
    return _train_config("stereo", 3, steps=steps)


def config4_full_train(steps: int = 20) -> dict:
    return _train_config("full_feat", 4, steps=steps, scan=True)


def config5_eval_sweep(n_frames: int = 256, seq_len: int = 256) -> dict:
    """Batched eval pipeline end-to-end: depth prediction (incl. the
    host-side gt-size resize of eval/runner.py) + trajectory prediction.

    Frames are uint8 (as the eval loaders produce): uploads are 4x
    smaller than f32 and normalization runs on-device; the trajectory
    path stages the sequence once and pairs frames on-device
    (api.DepthVO.pose_sequence). Both are the shipped eval paths.
    """
    from depthvo_tpu.api import DepthVO
    from depthvo_tpu.eval.runner import predict_depths, predict_trajectory

    model = DepthVO.from_random()
    h, w = model.config.model.height, model.config.model.width
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)

    # Warm both compiled programs, then time the sweep.
    predict_depths(model, frames[:32], batch_size=16)

    class _FakeSeq:
        def __init__(self, frames):
            self._f = frames

        def frames_u8(self):
            return self._f

    seq = _FakeSeq(frames[:seq_len])
    predict_trajectory(model, seq, batch_size=16)

    t0 = time.perf_counter()
    depths = predict_depths(model, frames, batch_size=16)
    t_depth = time.perf_counter() - t0

    # Depth sweep WITH the eval protocol's per-frame resize-to-gt-size
    # (KITTI gt is ~375x1242) running as the overlapped drain-time
    # postprocess (eval/runner.py). The link/device/host split:
    #   device — compiled forward alone (run_benchmark, no transfers)
    #   link   — plain sweep minus the device share (uploads + fetches
    #            through the tunnel dominate on this machine)
    #   host   — the serial PIL resize cost, measured alone; the
    #            overlap column shows how much of it the drain hides.
    from PIL import Image

    gt_h, gt_w = 375, 1242

    def _resize(_i, p):
        im = Image.fromarray(p.astype(np.float32), mode="F")
        return np.asarray(im.resize((gt_w, gt_h), Image.BILINEAR))

    predict_depths(model, frames[:32], batch_size=16, postprocess=_resize)
    t0 = time.perf_counter()
    resized = predict_depths(model, frames, batch_size=16, postprocess=_resize)
    t_depth_post = time.perf_counter() - t0
    assert len(resized) == n_frames and resized[0].shape == (gt_h, gt_w)
    t0 = time.perf_counter()
    for i in range(n_frames):
        _resize(i, depths[i])
    t_host_serial = time.perf_counter() - t0

    from depthvo_tpu.utils.profiling import run_benchmark

    dev = run_benchmark(mode="depth_infer", batch_size=16, steps=10)
    t_device = n_frames / dev["frames_per_sec"]

    t0 = time.perf_counter()
    poses = predict_trajectory(model, seq, batch_size=16)
    t_odom = time.perf_counter() - t0
    assert depths.shape[0] == n_frames and len(poses) == seq_len
    total_frames = n_frames + (seq_len - 1)
    return {
        "config": 5,
        "metric": "eval_sweep_frames_per_sec_per_chip",
        "value": round(total_frames / (t_depth_post + t_odom), 2),
        "unit": "frames/s",
        "detail": {
            **_device_info(),
            "depth_frames_per_sec": round(n_frames / t_depth, 2),
            "depth_with_gt_resize_frames_per_sec": round(
                n_frames / t_depth_post, 2
            ),
            "odom_frames_per_sec": round((seq_len - 1) / t_odom, 2),
            "split_s": {
                "device": round(t_device, 3),
                "link": round(max(t_depth - t_device, 0.0), 3),
                "host_resize_serial": round(t_host_serial, 3),
                # Bounded by the serial cost: tunnel bandwidth varies
                # between sweeps, so the post-minus-plain difference can
                # go negative for reasons unrelated to the resize.
                "host_hidden_by_overlap": round(
                    min(
                        max(t_host_serial - (t_depth_post - t_depth), 0.0),
                        t_host_serial,
                    ),
                    3,
                ),
            },
        },
    }


RUNNERS = {
    1: config1_depth_infer,
    2: config2_odom_infer,
    3: config3_stereo_train,
    4: config4_full_train,
    5: config5_eval_sweep,
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", default="1,2,3,4,5",
                    help="comma-separated BASELINE config ids")
    args = ap.parse_args(argv)
    for cid in (int(c) for c in args.configs.split(",") if c):
        _emit(RUNNERS[cid]())
    return 0


if __name__ == "__main__":
    sys.exit(main())
