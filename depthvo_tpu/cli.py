"""Command-line interface.

Reference parity (SURVEY.md §2b(ii) ``tools/caffe.cpp`` and §2a
``tools/evaluation_tools.py``): the reference's user-facing commands are
``caffe train --solver=...``, ``caffe time``, and the multi-function eval
script. The rebuild's subcommands:

* ``train``      — run a staged variant (stereo / temporal_stereo /
                   full_feat), with resume + staged init.
* ``eval-depth`` — Eigen-split depth metrics from a checkpoint.
* ``eval-odom``  — KITTI odometry seq: trajectory + devkit metrics + ATE.
* ``infer``      — depth maps (npy) for a directory of frames.
* ``bench``      — the `caffe time` analog: steps/s and frames/s/chip.

Usage: python -m depthvo_tpu.cli <subcommand> [flags]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--variant", default="full_feat",
                   choices=["stereo", "temporal_stereo", "full_feat", "tiny_test"])
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--width", type=int, default=608)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--checkpoint-dir", default=None)


def _make_config(args):
    from depthvo_tpu import configs

    factory = getattr(configs, args.variant)
    cfg = factory(batch_size=args.batch_size)
    if (args.height, args.width) != (160, 608):
        mc = configs.ModelConfig(height=args.height, width=args.width)
        cfg = configs.ExperimentConfig(**{**cfg.__dict__, "model": mc})
    return cfg


def cmd_train(args) -> int:
    import jax

    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.parallel import mesh as pmesh
    from depthvo_tpu.train import loop as train_loop

    if args.debug_nans:
        # SURVEY.md §5 "race detection / sanitizers": the JAX-native
        # equivalent — abort with a traceback at the first non-finite
        # value produced inside the jitted step.
        jax.config.update("jax_debug_nans", True)

    cfg = _make_config(args)
    if args.init_from:
        from depthvo_tpu import configs

        cfg = configs.ExperimentConfig(**{**cfg.__dict__, "init_from": args.init_from})

    mesh = pmesh.make_mesh(args.num_devices)
    print(f"mesh: {mesh.size} device(s) on axis 'data'; backend={jax.default_backend()}")
    if cfg.batch_size % mesh.size != 0:
        new_bs = -(-cfg.batch_size // mesh.size) * mesh.size
        print(f"global batch {cfg.batch_size} not divisible by mesh {mesh.size}; "
              f"rounding up to {new_bs}")
        from depthvo_tpu import configs

        cfg = configs.ExperimentConfig(**{**cfg.__dict__, "batch_size": new_bs})

    if args.train_list:
        from depthvo_tpu.data.kitti import load_train_list

        ds = load_train_list(
            args.kitti_root or ".", args.train_list, cfg.model.height, cfg.model.width
        )
        it = ds.iterator(cfg.batch_size)
        print(f"train list: {len(ds)} samples from {args.train_list}")
    elif args.kitti_root:
        from depthvo_tpu.data.kitti import KittiRawStereo

        drives = [d.strip() for d in args.drives.split(",") if d.strip()]
        ds = KittiRawStereo(args.kitti_root, drives, cfg.model.height, cfg.model.width)
        it = ds.iterator(cfg.batch_size)
        print(f"KITTI raw: {len(ds)} training samples from {len(drives)} drives")
    else:
        print("no --kitti-root given: training on synthetic scenes")
        it = SyntheticScenes(cfg, seed=cfg.seed).iterator(cfg.batch_size)

    def log(step, metrics):
        parts = " ".join(f"{k}={v:.5f}" for k, v in sorted(metrics.items()))
        print(f"step {step}: {parts}", flush=True)

    train_loop.fit(
        cfg, it, args.steps, mesh=mesh,
        checkpoint_dir=args.checkpoint_dir, log_fn=log,
        steps_per_call=args.steps_per_call,
    )
    return 0


def cmd_eval_depth(args) -> int:
    from depthvo_tpu.eval.runner import run_depth_eval

    metrics = run_depth_eval(
        checkpoint_dir=args.checkpoint_dir,
        kitti_root=args.kitti_root,
        split_file=args.split_file,
        max_depth=args.max_depth,
        height=args.height,
        width=args.width,
        save_preds_dir=args.save_preds,
    )
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_eval_odom(args) -> int:
    from depthvo_tpu.eval.runner import run_odometry_eval

    metrics = run_odometry_eval(
        checkpoint_dir=args.checkpoint_dir,
        kitti_odom_root=args.kitti_root,
        sequence=args.sequence,
        output_dir=args.output_dir,
        height=args.height,
        width=args.width,
    )
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_infer(args) -> int:
    from depthvo_tpu import api
    from depthvo_tpu.data.kitti import load_image

    model = (
        api.DepthVO.from_checkpoint(args.checkpoint_dir)
        if args.checkpoint_dir
        else api.DepthVO.from_random()
    )
    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(
        os.path.join(args.images, f)
        for f in os.listdir(args.images)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    for path in paths:
        img = load_image(path, args.height, args.width)
        depth = model.depth(img)[0]
        out = os.path.join(
            args.output_dir,
            os.path.splitext(os.path.basename(path))[0] + "_depth.npy",
        )
        np.save(out, depth)
        print(f"{path} -> {out} (depth range {depth.min():.2f}..{depth.max():.2f} m)")
    return 0


def cmd_prep(args) -> int:
    """Build a training sample list from a KITTI raw tree — the rebuild
    of the reference's offline data-prep scripts (SURVEY.md §3.4)."""
    from depthvo_tpu.data.kitti import KittiRawStereo, write_train_list

    drives = [d.strip() for d in args.drives.split(",") if d.strip()]
    if not drives:
        # Discover all *_sync drives under the root.
        drives = sorted(
            d
            for date in os.listdir(args.kitti_root)
            if os.path.isdir(os.path.join(args.kitti_root, date))
            for d in os.listdir(os.path.join(args.kitti_root, date))
            if d.endswith("_sync")
        )
        print(f"discovered {len(drives)} drives")
    ds = KittiRawStereo(args.kitti_root, drives, args.height, args.width)
    n = write_train_list(ds, args.output, args.kitti_root)
    print(f"wrote {n} samples to {args.output}")
    return 0


def cmd_bench(args) -> int:
    from depthvo_tpu.utils.profiling import run_benchmark

    result = run_benchmark(
        mode=args.mode,
        batch_size=args.batch_size,
        height=args.height,
        width=args.width,
        steps=args.steps,
        trace_dir=args.trace_dir,
    )
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    # Persistent XLA compilation cache (first full-model compile is
    # minutes; subsequent runs of the same shapes should not pay it).
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "depthvo_jax"),
    )
    parser = argparse.ArgumentParser(
        prog="depthvo_tpu",
        description="TPU-native Depth-VO-Feat: train/eval/infer/bench",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="staged training (reference: caffe train)")
    _add_common(p)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--kitti-root", default=None)
    p.add_argument("--drives", default="")
    p.add_argument("--train-list", default=None,
                   help="prepared sample list (see the `prep` subcommand)")
    p.add_argument("--init-from", default=None,
                   help="previous stage checkpoint (staged finetune)")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per dispatch (lax.scan)")
    p.add_argument("--debug-nans", action="store_true",
                   help="abort on the first non-finite value (diagnostics)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval-depth", help="Eigen-split depth metrics")
    _add_common(p)
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--split-file", required=True)
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--save-preds", default=None,
                   help="also write raw depth predictions (.npy) here")
    p.set_defaults(fn=cmd_eval_depth)

    p = sub.add_parser("eval-odom", help="KITTI odometry seq eval (t_err/r_err/ATE)")
    _add_common(p)
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--sequence", default="09")
    p.add_argument("--output-dir", default="./odom_out")
    p.set_defaults(fn=cmd_eval_odom)

    p = sub.add_parser("infer", help="depth maps for a directory of frames")
    _add_common(p)
    p.add_argument("--images", required=True)
    p.add_argument("--output-dir", default="./depth_out")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("prep", help="build a train-list file from KITTI raw")
    _add_common(p)
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--drives", default="", help="comma-separated; empty = discover all")
    p.add_argument("--output", default="train_list.txt")
    p.set_defaults(fn=cmd_prep)

    p = sub.add_parser("bench", help="throughput benchmark (reference: caffe time)")
    _add_common(p)
    p.add_argument("--mode", default="depth_infer",
                   choices=["depth_infer", "train_step", "odom_infer", "warp"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
