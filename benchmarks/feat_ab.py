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


def pose_err(state, scenes, cfg) -> tuple[float, float]:
    """(translation m, rotation deg) error of the trained odom net vs the
    scenes' ground-truth relative pose ``T_ts``.

    The targeted metric for the stress A/B: the temporal frames are the
    ONLY supervision pose gets, so photometric ambiguity between them
    corrupts pose first — depth stays pinned by the (unstressed) stereo
    term. Feature-loss rescue, if the mechanism works, shows here."""
    import jax.numpy as jnp

    from depthvo_tpu.geometry import se3
    from depthvo_tpu.train.state import build_models

    batch = scenes.fixed_batch(cfg.batch_size)
    gt_T = np.stack(
        [scenes._scenes[i % len(scenes._scenes)]["T_ts"]
         for i in range(cfg.batch_size)]
    )
    _, odom_net, _ = build_models(cfg)
    pair = jnp.concatenate(
        [jnp.asarray(batch["image_t"]), jnp.asarray(batch["image_s"])], axis=-1
    )
    twist = odom_net.apply({"params": state.params["odom"]}, pair, train=False)
    T_pred = np.asarray(se3.exp(twist))
    t_err = float(np.mean(np.linalg.norm(T_pred[:, :3, 3] - gt_T[:, :3, 3], axis=-1)))
    rel = np.einsum("bij,bkj->bik", T_pred[:, :3, :3], gt_T[:, :3, :3])
    cos = np.clip((np.trace(rel, axis1=1, axis2=2) - 1.0) * 0.5, -1.0, 1.0)
    r_err = float(np.degrees(np.mean(np.arccos(cos))))
    return t_err, r_err


def run_arm(
    pretrained: bool,
    steps: int,
    pretrain_steps: int,
    seed: int,
    use_feature: bool = True,
    stress: dict | None = None,
    with_pose: bool = False,
):
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
    abs_rel = depth_abs_rel(state, scenes, cfg)
    if with_pose:
        return (abs_rel, *pose_err(state, scenes, cfg))
    return abs_rel


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
                            use_feature=True, stress=stress, with_pose=True)
                    for s in seeds]
            nofeat = [run_arm(False, args.steps, 0, s,
                              use_feature=False, stress=stress,
                              with_pose=True)
                      for s in seeds]

            def _cols(rows):
                # rows: [(abs_rel, t_err_m, r_err_deg), ...] -> per-metric
                a = np.asarray(rows, np.float64)
                return {
                    "abs_rel": [round(x, 4) for x in a[:, 0]],
                    "pose_t_err_m": [round(x, 4) for x in a[:, 1]],
                    "pose_r_err_deg": [round(x, 4) for x in a[:, 2]],
                    # median over seeds: robust to a diverged outlier seed
                    "median": {
                        "abs_rel": round(float(np.median(a[:, 0])), 4),
                        "pose_t_err_m": round(float(np.median(a[:, 1])), 4),
                        "pose_r_err_deg": round(float(np.median(a[:, 2])), 4),
                    },
                }

            f, n = _cols(feat), _cols(nofeat)
            table[cond] = {
                "full_feat_pretrained": f,
                "temporal_stereo": n,
                "feature_loss_wins": {
                    m: bool(f["median"][m] <= n["median"][m])
                    for m in ("abs_rel", "pose_t_err_m", "pose_r_err_deg")
                },
            }
        out = {
            "metric": "feat_ab_stress_synthetic",
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
