#!/usr/bin/env python
"""A/B: random-frozen vs contrastively-pretrained features (SURVEY §0 #3).

The reference's best model ("Full-NYUv2") uses an externally-trained
feature extractor for the feature reconstruction loss; the rebuild's
replacement is in-framework contrastive pretraining (train/feat_pretrain).
This experiment answers "does pretraining the features actually help?"
on synthetic scenes with exact gt depth:

  A. full_feat training, feat params RANDOM and frozen (the default).
  B. identical run, feat params from N contrastive pretrain steps.

Both arms share seeds, data, and step counts; the metric is depth abs-rel
against the scenes' true depth after training. Prints one JSON line.

Run: python benchmarks/feat_ab.py [--steps 300] [--pretrain-steps 300]
(CPU mesh is fine: JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def depth_abs_rel(state, scenes, cfg, depth_quant: str = "off") -> float:
    """abs-rel of the trained depth net vs the synthetic scenes' gt.

    The SHARED metric for the serving A/B harnesses (feat_ab, int8_ab):
    one protocol (fixed eval batch, median scale, mean abs-rel) so their
    PERF.md numbers stay comparable. ``depth_quant="int8"`` evaluates
    the w8a8 forward, calibrated on the same eval frames.
    """
    import jax.numpy as jnp

    from depthvo_tpu.train.state import build_models

    batch = scenes.fixed_batch(cfg.batch_size)
    gt = np.stack(
        [scenes._scenes[i % len(scenes._scenes)]["depth"]
         for i in range(cfg.batch_size)]
    )
    images = jnp.asarray(batch["image_t"])
    variables = {"params": state.params["depth"], "batch_stats": state.batch_stats}
    if depth_quant == "int8":
        calib_net, _, _ = build_models(cfg, depth_quant="calibrate")
        _, mutated = calib_net.apply(
            variables, images, train=False, mutable=["quant"]
        )
        variables = dict(variables, quant=mutated["quant"])
    depth_net, _, _ = build_models(cfg, depth_quant=depth_quant)
    disp = depth_net.apply(variables, images, train=False)[-1]
    pred = 1.0 / np.asarray(disp[..., 0])
    # Median-scale (the eval protocol) then abs-rel on the valid range.
    scale = np.median(gt) / np.median(pred)
    pred = pred * scale
    return float(np.mean(np.abs(pred - gt) / gt))


def run_arm(
    pretrained: bool,
    steps: int,
    pretrain_steps: int,
    seed: int,
    use_feature: bool = True,
    stress: dict | None = None,
) -> float:
    """Train one arm and return the depth abs-rel vs synthetic gt.

    ``use_feature=False`` trains the temporal_stereo loss graph (no
    feature reconstruction term). ``stress`` forwards the photometric-
    ambiguity kwargs to SyntheticScenes (exposure_jitter/gamma_jitter/
    repeat_texture) — VERDICT r3 item 2's test conditions."""
    import jax

    from depthvo_tpu import configs
    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.train import loop as train_loop
    from depthvo_tpu.train.feat_pretrain import pretrain_features
    from depthvo_tpu.train.state import create_state

    cfg = configs.tiny_test(batch_size=4, seed=seed, use_feature=use_feature)
    scenes = SyntheticScenes(cfg, seed=seed, num_scenes=4, **(stress or {}))
    state = create_state(cfg, jax.random.PRNGKey(seed))
    if pretrained:
        feat_params = pretrain_features(
            cfg, scenes.iterator(cfg.batch_size), pretrain_steps
        )
        params = dict(state.params)
        params["feat"] = feat_params
        state = state.replace(params=params)
    state = train_loop.fit(
        cfg, scenes.iterator(cfg.batch_size, fixed=True), steps, state=state
    )
    return depth_abs_rel(state, scenes, cfg)


STRESS = dict(exposure_jitter=0.5, gamma_jitter=0.25, repeat_texture=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--pretrain-steps", type=int, default=300)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--mode", default="pretrain",
                    choices=["pretrain", "stress"],
                    help="pretrain: random-frozen vs pretrained features "
                         "(both full_feat). stress: feature loss ON "
                         "(pretrained) vs OFF (temporal_stereo), each "
                         "clean AND under photometric-ambiguity stress "
                         f"({STRESS}) — the conditions the reference's "
                         "feature loss was designed for")
    args = ap.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",")]

    if args.mode == "stress":
        table = {}
        for cond, stress in (("clean", None), ("stress", STRESS)):
            feat = [run_arm(True, args.steps, args.pretrain_steps, s,
                            use_feature=True, stress=stress) for s in seeds]
            nofeat = [run_arm(False, args.steps, 0, s,
                              use_feature=False, stress=stress)
                      for s in seeds]
            table[cond] = {
                "full_feat_pretrained": [round(x, 4) for x in feat],
                "temporal_stereo": [round(x, 4) for x in nofeat],
                "mean_full_feat": round(float(np.mean(feat)), 4),
                "mean_temporal_stereo": round(float(np.mean(nofeat)), 4),
                "feature_loss_wins": bool(np.mean(feat) <= np.mean(nofeat)),
            }
        out = {
            "metric": "feat_ab_stress_depth_abs_rel_synthetic",
            **table,
            "detail": {"steps": args.steps,
                       "pretrain_steps": args.pretrain_steps,
                       "seeds": seeds, "stress": STRESS},
        }
        print(json.dumps(out))
        return 0

    rand = [run_arm(False, args.steps, args.pretrain_steps, s) for s in seeds]
    pre = [run_arm(True, args.steps, args.pretrain_steps, s) for s in seeds]
    out = {
        "metric": "feat_ab_depth_abs_rel_synthetic",
        "random_frozen_feat": [round(x, 4) for x in rand],
        "pretrained_feat": [round(x, 4) for x in pre],
        "mean_random": round(float(np.mean(rand)), 4),
        "mean_pretrained": round(float(np.mean(pre)), 4),
        "pretrained_wins": bool(np.mean(pre) <= np.mean(rand)),
        "detail": {"steps": args.steps, "pretrain_steps": args.pretrain_steps,
                   "seeds": seeds},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
