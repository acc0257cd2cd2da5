#!/usr/bin/env python
"""Measure the conv-backward levers (VERDICT r4 item 2).

The round-4 roofline put the largest train-step category — convolution
fusions, 19.7 of 37.5 ms at batch 8 — at 2.9x its byte floor and
attributed the gap to XLA's conv-backward algorithm on the
full-resolution few-channel decoder (UpConv_4 + ConvBlock_5 + Conv_3 =
7.1 of 12.1 ms backward; PERF.md per-layer table). That conclusion was
reached WITHOUT trying the controllable levers. This harness measures
them, band-experiment style: each lever is a one-line config change on
the identical training protocol (full_feat, K=8 scan, real chip), and
the verdict — win or measured negative — goes in PERF.md either way.

Levers:
- remat            : jax.checkpoint on encoder stages + decoder blocks.
                     The roofline says the step has ~12x more byte-floor
                     than compute-floor, so recomputing activations
                     instead of re-reading them is nearly free in FLOPs;
                     if backward time is bounded by activation re-reads,
                     this shows it.
- chanpad_32       : decoder widths (256,128,64,32,16) -> (...,32,32):
                     the finest full-res convs get lane-filling widths
                     (bf16 tiles are 16x128; C=16 wastes lanes in the
                     grad convolutions) at the cost of ~2x their FLOPs.
- chanpad_64_32    : one step wider (...,64,32).
- subpixel_head    : predict 4 bounded logits/pixel at 1/2 res and
                     depth-to-space to full res — removes the full-res
                     convs from BOTH passes while keeping a per-pixel
                     learned prediction (the serving head, here measured
                     as a TRAINING-graph lever).
- fast_final       : bilinear-upsample the 1/2-res disp (cheapest, blurs).

Run (real chip):  python benchmarks/conv_levers.py [--batch 8] [--steps 24]
Prints one JSON line; also writes benchmarks/conv_levers_<date>.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "baseline": {},
    "remat": {"remat": True},
    "chanpad_32": {"decoder_features": (256, 128, 64, 32, 32)},
    "chanpad_64_32": {"decoder_features": (256, 128, 64, 64, 32)},
    "subpixel_head": {"subpixel_head": True},
    "fast_final": {"fast_final_upsample": True},
    # Exact rewrite (same params/math): finest-stage convs at half res
    # with 4x channels via structured kernels — models/depth_net.py
    # _s2d_finest_stage, equivalence-tested in tests/test_models.py.
    "s2d_finest": {"s2d_finest": True},
}


def measure(batch: int, steps: int, model_overrides: dict) -> dict:
    import jax

    from depthvo_tpu import configs
    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.parallel import mesh as pmesh
    from depthvo_tpu.train import loop as train_loop
    from depthvo_tpu.train.state import create_state
    from depthvo_tpu.utils.profiling import time_fn

    cfg = configs.full_feat(batch_size=batch)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, **model_overrides)
    )
    mesh = pmesh.make_mesh(1)
    state = jax.device_put(
        create_state(cfg, jax.random.PRNGKey(0)), pmesh.replicated(mesh)
    )
    K_SCAN = 8
    batch_np = SyntheticScenes(cfg, seed=0, num_scenes=2).batch(batch)
    stacked = pmesh.shard_stacked_batch(
        train_loop.stack_batches([batch_np] * K_SCAN), mesh
    )
    step_fn = train_loop.make_scan_train_step(cfg, mesh)
    compiled = step_fn.lower(state, stacked).compile()
    mem = compiled.memory_analysis()
    holder = {"state": state}

    def fn():
        holder["state"], m = compiled(holder["state"], stacked)
        return m

    stats = time_fn(fn, steps=steps, warmup=3, chunk=4)
    ms = stats["median_s"] / K_SCAN * 1e3
    out = {
        "ms_per_step": round(ms, 2),
        "frames_per_sec": round(batch / (ms / 1e3), 1),
        "loss_sample": float(np.asarray(
            jax.tree.leaves(fn())[0], np.float32
        ).ravel()[0]),
    }
    if mem is not None:
        out["temp_hbm_mb"] = round(
            getattr(mem, "temp_size_in_bytes", 0) / 1e6, 1
        )
        out["argument_hbm_mb"] = round(
            getattr(mem, "argument_size_in_bytes", 0) / 1e6, 1
        )
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args(argv)

    import jax

    rows = {}
    for name in args.variants.split(","):
        rows[name] = measure(args.batch, args.steps, VARIANTS[name])
        print(f"  {name}: {rows[name]}", file=sys.stderr, flush=True)
    base = rows.get("baseline", {}).get("ms_per_step")
    if base:
        for name, row in rows.items():
            row["vs_baseline"] = round(row["ms_per_step"] / base, 3)
    out = {
        "metric": "conv_backward_levers_ms_per_step",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "batch": args.batch,
        "protocol": f"full_feat, K=8 scan, {args.steps} timed dispatches, "
                    "median chunk-of-4",
        "rows": rows,
    }
    line = json.dumps(out)
    print(line)
    stamp = datetime.date.today().isoformat()
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"conv_levers_{stamp}.json")
    with open(path, "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
