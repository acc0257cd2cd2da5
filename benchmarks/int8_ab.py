#!/usr/bin/env python
"""A/B: f32 vs w8a8 int8 depth inference accuracy (serving lever).

Same harness pattern as feat_ab.py / the serving-head knobs (PERF.md):
train tiny full_feat models on synthetic scenes with exact gt depth,
then evaluate the SAME trained weights through (a) the normal forward
and (b) the int8 forward calibrated on the eval frames. The delta is
the quantization cost the `calibrate_int8` serving lever pays for the
int8-MXU throughput (measured separately by `bench --int8` on the TPU).

Run: JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python benchmarks/int8_ab.py
     [--steps 300] [--seeds 0,1,2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)  # for the shared feat_ab metric


def run_seed(steps: int, seed: int):
    import jax

    from depthvo_tpu import configs
    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.train import loop as train_loop
    from depthvo_tpu.train.state import create_state

    cfg = configs.tiny_test(batch_size=4, seed=seed)
    scenes = SyntheticScenes(cfg, seed=seed, num_scenes=4)
    state = create_state(cfg, jax.random.PRNGKey(seed))
    state = train_loop.fit(
        cfg, scenes.iterator(cfg.batch_size, fixed=True), steps, state=state
    )
    # Shared metric with feat_ab.py: one protocol across A/B harnesses.
    from feat_ab import depth_abs_rel

    return (
        depth_abs_rel(state, scenes, cfg),
        depth_abs_rel(state, scenes, cfg, depth_quant="int8"),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seeds", default="1,2,3")
    args = ap.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",")]
    pairs = [run_seed(args.steps, s) for s in seeds]
    f32 = [p[0] for p in pairs]
    i8 = [p[1] for p in pairs]
    out = {
        "metric": "int8_ab_depth_abs_rel_synthetic",
        "f32": [round(x, 4) for x in f32],
        "int8": [round(x, 4) for x in i8],
        "mean_f32": round(float(np.mean(f32)), 4),
        "mean_int8": round(float(np.mean(i8)), 4),
        "rel_degradation": round(
            float((np.mean(i8) - np.mean(f32)) / max(np.mean(f32), 1e-9)), 4
        ),
        "detail": {"steps": args.steps, "seeds": seeds},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
