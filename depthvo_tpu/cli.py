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
    # None = keep the variant's own resolution (tiny_test is 32x96).
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--checkpoint-dir", default=None)


def _make_config(args):
    import dataclasses

    from depthvo_tpu import configs

    if getattr(args, "config", None):
        # File-driven experiment config (the `caffe train --solver=<file>`
        # analog): the JSON holds the WHOLE ExperimentConfig; the
        # variant/size/batch flags are superseded by it.
        from depthvo_tpu.configs import base as config_io

        return config_io.load_json(args.config)
    # train/convert set variant/batch_size defaults to None ("not
    # explicitly given") so net-prototxt facts can fill them; resolve
    # the documented defaults here for those parsers.
    factory = getattr(configs, args.variant or "full_feat")
    cfg = factory(batch_size=args.batch_size
                  if args.batch_size is not None else 4)
    height = args.height if args.height is not None else cfg.model.height
    width = args.width if args.width is not None else cfg.model.width
    if (height, width) != (cfg.model.height, cfg.model.width):
        # Preserve every other model field (num_scales, compute_dtype,
        # fast_final_upsample, ...) on a size override.
        mc = dataclasses.replace(cfg.model, height=height, width=width)
        cfg = dataclasses.replace(cfg, model=mc)
    return cfg


def _solver_net_path(solver_path, solver_text):
    """The solver's ``net:``/``train_net:`` pointer, resolved relative
    to the solver file; None when the solver names no net."""
    from depthvo_tpu.io.solver_prototxt import parse_solver_prototxt

    fields = parse_solver_prototxt(solver_text)
    net_path = fields.get("net") or fields.get("train_net")
    if not isinstance(net_path, str):
        return None
    if not os.path.isabs(net_path):
        net_path = os.path.join(
            os.path.dirname(os.path.abspath(solver_path)), net_path
        )
    return net_path


def _recognize_net_file(net_path):
    """Parse + classify a net prototxt; returns (facts, overrides),
    printing the report and mapping notes."""
    from depthvo_tpu.io.net_prototxt import (
        config_overrides, extract_facts, format_report, parse_prototxt,
    )

    with open(net_path) as f:
        facts = extract_facts(parse_prototxt(f.read()))
    over, notes = config_overrides(facts)
    print(format_report(facts, over))
    for n in notes:
        print(f"net: {n}")
    return facts, over


def _apply_solver_net(args, solver_text):
    """Resolve and recognize the solver's ``net:`` prototxt.

    Returns the net's config overrides (loss weights, importer-facing
    ``input_mean``/``input_scale``) and seats variant/batch/size onto
    ``args`` where the user did not pass the flag (the train parser
    defaults variant/batch_size to None so explicit flags always win).
    Missing net files warn and fall back to flags: reference solver
    files point at paths that need not exist here.
    """
    net_path = _solver_net_path(args.solver, solver_text)
    if net_path is None:
        return {}
    if not os.path.isfile(net_path):
        print(f"solver: net file {net_path} not found; "
              f"using --variant {args.variant or 'full_feat'}")
        return {}
    facts, over = _recognize_net_file(net_path)
    if facts.kind != "train_graph":
        print(f"net: {net_path} is a {facts.kind} deploy graph, not a "
              "training graph; keeping --variant "
              f"{args.variant or 'full_feat'} "
              "(pair deploy files with import-caffemodel)")
        return {}
    # Flags the user did not pass yield to the net file.
    if "variant" in over and args.variant is None:
        args.variant = over["variant"]
    if "batch_size" in over and args.batch_size is None:
        args.batch_size = over["batch_size"]
    if args.height is None and "height" in over:
        args.height = over["height"]
    if args.width is None and "width" in over:
        args.width = over["width"]
    print(f"net: -> variant={args.variant or 'full_feat'} "
          f"batch={args.batch_size if args.batch_size is not None else 4} "
          f"size={args.height or 'default'}x{args.width or 'default'}")
    return over


def _restore_or_make_config(args):
    """The checkpoint's saved config.json wins over CLI defaults (it
    records the trained architecture); else build from the CLI flags."""
    if args.checkpoint_dir:
        cfg_path = os.path.join(args.checkpoint_dir, "config.json")
        if os.path.isfile(cfg_path):
            from depthvo_tpu.configs import base as config_io

            return config_io.load_json(cfg_path)
    return _make_config(args)


def _state_with_caffe_weights(cfg, specs, input_mean=None, input_scale=1.0):
    """``caffe train --weights=x.caffemodel`` analog: seat released blobs
    into a fresh TrainState before training. ``specs`` are ``[net=]path``
    strings (repeatable flag; default net ``depth``). ``input_mean``/
    ``input_scale`` come from the solver net's ``transform_param`` when
    one was recognized — the data-layer preprocessing folds into each
    imported net's input conv, exactly as `caffe train` would apply it.

    Seating goes through the SAME audited name-map derivation as
    ``convert``/``make-name-map`` (VERDICT r3 weak #3: shape-order alone
    mis-seats ResNet-50's identically-shaped kernels under file
    permutation), and the order-trusted audit is printed so a placement
    resting on an ordering assumption is visible in the train log.
    Shape-order remains only as the fallback for files the map deriver
    cannot fully pair (the report says so, loudly)."""
    import jax

    from depthvo_tpu.io import caffemodel, import_weights
    from depthvo_tpu.io import name_map as nm
    from depthvo_tpu.train.state import create_state

    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    params = dict(state.params)
    stats = state.batch_stats
    for spec in specs:
        net, sep, path = spec.partition("=")
        if not sep:
            net, path = "depth", spec
        if net not in params:
            raise SystemExit(
                f"--weights net {net!r} not in variant {cfg.name!r} "
                f"(has: {sorted(params)})"
            )
        layers = caffemodel.parse_caffemodel(path)
        net_stats = stats if net == "depth" else None
        m, entries, problems = nm.generate_name_map(
            layers, params[net], net_stats, strict=False
        )
        print(f"--weights: {path} -> net {net!r} (audited name map)")
        print(nm.format_map_report(entries, problems))
        if m["convs"] and not problems:
            net_params, net_stats, report = import_weights.import_net(
                layers, params[net], net_stats,
                name_map=m["convs"], bn_name_map=m["bns"] or None,
                input_mean=input_mean, input_scale=input_scale,
            )
        else:
            print(f"--weights: name-map derivation incomplete for {path} "
                  "— falling back to shape-order import (inspect the "
                  "report above; `depthvo convert` refuses this case)")
            net_params, net_stats, report = import_weights.import_net(
                layers, params[net], net_stats,
                input_mean=input_mean, input_scale=input_scale,
            )
        params[net] = net_params
        if net == "depth":
            stats = net_stats
        print(f"--weights: placed {len(report)} entries from {path} "
              f"into net {net!r}")
    return state.replace(params=params, batch_stats=stats)


def _load_model(args):
    """Restore a DepthVO for eval/infer, preferring the config.json the
    train loop saved next to the checkpoint over CLI defaults."""
    from depthvo_tpu import api

    if not args.checkpoint_dir:
        return api.DepthVO.from_random(_make_config(args))
    return api.DepthVO.from_checkpoint(
        args.checkpoint_dir, _restore_or_make_config(args)
    )


def cmd_train(args) -> int:
    import jax

    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.parallel import distributed as dist
    from depthvo_tpu.parallel import mesh as pmesh
    from depthvo_tpu.train import loop as train_loop

    # Multi-process bring-up FIRST: after this, jax.devices() is global
    # and everything below (mesh, shardings, orbax) is cluster-wide.
    # No-op unless --coordinator / DEPTHVO_* env request a cluster.
    if dist.initialize(
        getattr(args, "coordinator", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    ):
        print(f"distributed: process {dist.process_index()}/"
              f"{dist.process_count()} up, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    if args.debug_nans:
        # SURVEY.md §5 "race detection / sanitizers": the JAX-native
        # equivalent — abort with a traceback at the first non-finite
        # value produced inside the jitted step.
        jax.config.update("jax_debug_nans", True)

    import dataclasses

    solver_text = None
    net_overrides = {}
    if getattr(args, "solver", None):
        with open(args.solver) as f:
            solver_text = f.read()
        # Honor the solver's `net:`/`train_net:` pointer (the missing leg
        # of the `caffe train --solver=` migration): the net prototxt is
        # RECOGNIZED, not executed (SURVEY.md §7 design stance) — it
        # selects the native variant and supplies batch / input size /
        # loss weights, which explicit CLI flags still override.
        net_overrides = _apply_solver_net(args, solver_text)
    cfg = _make_config(args)
    if solver_text is not None:
        # Caffe solver.prototxt overlay (the `caffe train --solver=` path):
        # optimizer/schedule/snapshot knobs from the reference file, model
        # and loss graph from the net prototxt / --variant / --config.
        from depthvo_tpu.io.solver_prototxt import apply_solver_prototxt

        cfg, solver_extras = apply_solver_prototxt(solver_text, cfg)
        ignored = [k for k in solver_extras["ignored"]
                   if k not in ("net", "train_net") or not net_overrides]
        if ignored:
            print(f"solver: ignoring deploy-only fields "
                  f"{ignored} from {args.solver}")
        if args.eval_every == 0 and "eval_every" in solver_extras:
            args.eval_every = solver_extras["eval_every"]
            args.eval_steps = solver_extras.get("eval_steps", args.eval_steps)
        print(f"solver: {args.solver} -> {cfg.optim.optimizer}, "
              f"lr={cfg.optim.learning_rate}, policy={cfg.optim.lr_policy}")
        loss_fields = {k: v for k, v in net_overrides.items()
                       if k.endswith("_weight")}
        if loss_fields:
            cfg = dataclasses.replace(cfg, **loss_fields)
            print(f"net: loss weights from the net prototxt: {loss_fields}")
    if args.init_from:
        cfg = dataclasses.replace(cfg, init_from=args.init_from)
    if args.init_feat_from:
        cfg = dataclasses.replace(cfg, init_feat_from=args.init_feat_from)
    init_state = None
    if getattr(args, "weights", None):
        # `caffe train --weights=x.caffemodel` analog: seat released
        # blobs into the fresh state, then train. Orthogonal to
        # --init-from (orbax checkpoints); pick one.
        if args.init_from:
            print("--weights and --init-from are exclusive: --weights "
                  "seats a .caffemodel, --init-from an orbax checkpoint "
                  "(run import-caffemodel first to convert)")
            return 2
        mean = net_overrides.get("input_mean")
        scale = net_overrides.get("input_scale", 1.0)
        if mean is None and scale != 1.0:
            mean = [0.0, 0.0, 0.0]  # scale-only transform_param
        if mean is not None:
            print(f"net: folding transform_param mean={mean} scale={scale} "
                  "into the imported input conv(s)")
        init_state = _state_with_caffe_weights(
            cfg, args.weights, input_mean=mean, input_scale=scale
        )
    if args.iter_size > 1:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, iter_size=args.iter_size)
        )
    if args.remat:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, remat=True)
        )

    mesh = pmesh.make_mesh(
        args.num_devices, num_slices=getattr(args, "num_slices", 1)
    )
    print(f"mesh: {mesh.size} device(s) as {dict(mesh.shape)}; "
          f"backend={jax.default_backend()}")
    if cfg.batch_size % mesh.size != 0:
        new_bs = -(-cfg.batch_size // mesh.size) * mesh.size
        print(f"global batch {cfg.batch_size} not divisible by mesh {mesh.size}; "
              f"rounding up to {new_bs}")
        cfg = dataclasses.replace(cfg, batch_size=new_bs)

    # Batches ship as raw uint8 (4x fewer host->device bytes; the train
    # step normalizes on-device). The C++ prefetch ring emits uint8 too,
    # so --native-ring composes with the smaller uplink — the production
    # configuration (benchmarks/host_pipeline.py).
    use_u8 = True
    if args.train_list:
        from depthvo_tpu.data.kitti import load_train_list

        ds = load_train_list(
            args.kitti_root or ".", args.train_list,
            cfg.model.height, cfg.model.width, u8=use_u8,
        )
        it = ds.iterator(cfg.batch_size)
        print(f"train list: {len(ds)} samples from {args.train_list}")
    elif args.kitti_odom_root:
        from depthvo_tpu.data.kitti import KittiOdomStereo

        seqs = [s.strip() for s in args.sequences.split(",") if s.strip()]
        ds = KittiOdomStereo(
            args.kitti_odom_root, seqs, cfg.model.height, cfg.model.width,
            u8=use_u8,
        )
        it = ds.iterator(cfg.batch_size)
        print(f"KITTI odometry: {len(ds)} training samples from seqs {seqs}")
    elif args.kitti_root:
        from depthvo_tpu.data.kitti import KittiRawStereo

        drives = [d.strip() for d in args.drives.split(",") if d.strip()]
        ds = KittiRawStereo(
            args.kitti_root, drives, cfg.model.height, cfg.model.width,
            u8=use_u8,
        )
        it = ds.iterator(cfg.batch_size, native_ring=args.native_ring)
        print(f"KITTI raw: {len(ds)} training samples from {len(drives)} drives")
    else:
        print("no --kitti-root given: training on synthetic scenes")
        it = SyntheticScenes(cfg, seed=cfg.seed, u8=True).iterator(cfg.batch_size)

    # Validation (the Caffe solver test phase: test_interval/test_iter).
    eval_it = None
    if args.eval_every > 0:
        if args.val_list:
            from depthvo_tpu.data.kitti import load_train_list

            val_ds = load_train_list(
                args.kitti_root or ".", args.val_list,
                cfg.model.height, cfg.model.width, u8=use_u8,
            )
            eval_it = val_ds.iterator(cfg.batch_size, shuffle=False)
            print(f"validation: {len(val_ds)} samples from {args.val_list} "
                  f"every {args.eval_every} steps")
        else:
            # Held-out synthetic scenes (disjoint seed from training).
            eval_it = SyntheticScenes(
                cfg, seed=cfg.seed + 1_000_003, u8=True
            ).iterator(cfg.batch_size)
            print(f"validation: held-out synthetic scenes every "
                  f"{args.eval_every} steps (pass --val-list for real data)")

    if dist.process_count() > 1:
        # Multi-process data contract (parallel/distributed.py): every
        # process built the SAME deterministic iterator above; each now
        # keeps only its slice of each global batch, and shard_batch
        # assembles the global array from the process-local pieces.
        it = dist.local_batches(it, divisor=mesh.size)
        if eval_it is not None:
            eval_it = dist.local_batches(eval_it, divisor=mesh.size)

    from depthvo_tpu.utils.logging import MetricLogger

    # Coordinator-only logging: metrics are replicated, so N processes
    # would write N identical JSONL/TensorBoard streams.
    log = MetricLogger(
        jsonl_path=args.log_jsonl, tensorboard_dir=args.tensorboard
    ) if dist.is_coordinator() else None
    try:
        train_loop.fit(
            cfg, it, args.steps, mesh=mesh,
            checkpoint_dir=args.checkpoint_dir, log_fn=log,
            steps_per_call=args.steps_per_call,
            eval_iter=eval_it, eval_every=args.eval_every,
            eval_steps=args.eval_steps,
            sigint_effect=args.sigint_effect,
            sighup_effect=args.sighup_effect,
            state=init_state,
        )
    finally:
        if log is not None:
            log.close()
    return 0


def _model_resolution(args, model) -> tuple:
    """Eval/infer resolution: explicit flags win, else the (restored)
    model config's native training resolution."""
    h = args.height if args.height is not None else model.config.model.height
    w = args.width if args.width is not None else model.config.model.width
    return h, w


def cmd_test(args) -> int:
    """`caffe test` analog: average the eval-mode LOSS graph over N
    held-out batches from a checkpoint — no training, no metric suites
    (those are `eval-depth`/`eval-odom`). Completes the reference CLI
    quartet train/test/time/device_query (SURVEY.md §2b(ii))."""
    import dataclasses

    import jax

    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.io import checkpoint as ckpt_io
    from depthvo_tpu.parallel import mesh as pmesh
    from depthvo_tpu.train import loop as train_loop
    from depthvo_tpu.train.state import create_state

    cfg = _restore_or_make_config(args)
    mesh = pmesh.make_mesh(args.num_devices)
    if cfg.batch_size % mesh.size != 0:
        new_bs = -(-cfg.batch_size // mesh.size) * mesh.size
        print(f"global batch {cfg.batch_size} not divisible by mesh "
              f"{mesh.size}; rounding up to {new_bs}")
        cfg = dataclasses.replace(cfg, batch_size=new_bs)
    state = create_state(cfg, jax.random.PRNGKey(0))
    if args.checkpoint_dir:
        state = ckpt_io.restore_weights(args.checkpoint_dir, state)
    state = jax.device_put(state, pmesh.replicated(mesh))
    if args.val_list:
        from depthvo_tpu.data.kitti import load_train_list

        ds = load_train_list(
            args.kitti_root or ".", args.val_list,
            cfg.model.height, cfg.model.width, u8=True,
        )
        it = ds.iterator(cfg.batch_size, shuffle=False)
        print(f"test phase: {len(ds)} samples from {args.val_list}")
    else:
        it = SyntheticScenes(
            cfg, seed=cfg.seed + 1_000_003, u8=True
        ).iterator(cfg.batch_size)
        print("test phase: held-out synthetic scenes "
              "(pass --val-list for real data)")
    eval_fn = train_loop.make_eval_step(cfg)
    metrics = train_loop.run_validation(
        eval_fn, state, it, args.iterations, mesh
    )
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_eval_depth(args) -> int:
    from depthvo_tpu.eval.runner import run_depth_eval

    if args.pred_path:
        # Reference's second phase alone: saved predictions (any
        # source, incl. the original Caffe tooling's dumps) through the
        # identical metric pass — no model, no device.
        metrics = run_depth_eval(
            checkpoint_dir=None,
            kitti_root=args.kitti_root,
            split_file=args.split_file,
            max_depth=args.max_depth,
            median_scale=not args.no_median_scale,
            pred_path=args.pred_path,
            pred_inverse=args.pred_inverse,
            split_sha=args.split_sha,
        )
        print(json.dumps(metrics, indent=2))
        return 0
    model = _load_model(args)
    h, w = _model_resolution(args, model)
    metrics = run_depth_eval(
        checkpoint_dir=args.checkpoint_dir,
        kitti_root=args.kitti_root,
        split_file=args.split_file,
        max_depth=args.max_depth,
        height=h,
        width=w,
        save_preds_dir=args.save_preds,
        model=model,
        num_devices=args.num_devices,
        median_scale=not args.no_median_scale,
        int8=args.int8,
        split_sha=args.split_sha,
    )
    if args.int8:
        metrics["split"]["int8"] = True
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_eval_odom(args) -> int:
    from depthvo_tpu.eval.runner import run_odometry_eval

    if args.pose_file:
        # Devkit phase alone: score an existing KITTI-format pose file
        # (any VO system's output) against ground truth — no model.
        metrics = run_odometry_eval(
            checkpoint_dir=None,
            kitti_odom_root=args.kitti_root,
            sequence=args.sequence,
            output_dir=args.output_dir,
            pose_file=args.pose_file,
        )
        print(json.dumps(metrics, indent=2))
        return 0
    model = _load_model(args)
    h, w = _model_resolution(args, model)
    metrics = run_odometry_eval(
        checkpoint_dir=args.checkpoint_dir,
        kitti_odom_root=args.kitti_root,
        sequence=args.sequence,
        output_dir=args.output_dir,
        height=h,
        width=w,
        model=model,
    )
    print(json.dumps(metrics, indent=2))
    return 0


def _save_depth_png(path: str, depth: np.ndarray) -> None:
    """Colormapped inverse-depth visualization (the reference README's
    example-figure style: near = bright). Percentile-normalized per
    image; magma colormap via matplotlib (already an eval dependency)."""
    from matplotlib import cm
    from PIL import Image

    inv = 1.0 / np.maximum(depth.astype(np.float64), 1e-6)
    lo, hi = np.percentile(inv, [2.0, 98.0])
    norm = np.clip((inv - lo) / max(hi - lo, 1e-9), 0.0, 1.0)
    rgba = cm.magma(norm)
    Image.fromarray((rgba[..., :3] * 255).astype(np.uint8)).save(path)


def cmd_infer(args) -> int:
    """Batched depth inference over a directory of frames.

    One compiled shape, async pipelined uploads/fetches, uint8 uplink —
    NOT the reference's per-image pycaffe loop (SURVEY.md §3.2 hot loop:
    the thing the rebuild exists to beat). Decode runs on a host thread
    pool; the whole directory goes through ``eval.runner.predict_depths``.
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    from depthvo_tpu.data.kitti import load_image_u8
    from depthvo_tpu.eval.runner import predict_depths

    model = _load_model(args)
    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(
        os.path.join(args.images, f)
        for f in os.listdir(args.images)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    if not paths:
        print(f"no images found under {args.images}")
        return 2
    h, w = _model_resolution(args, model)
    with ThreadPoolExecutor(max_workers=8) as pool:
        frames = np.stack(
            list(pool.map(lambda p: load_image_u8(p, h, w), paths))
        )
    bs = min(args.batch_size, len(paths))
    if args.int8:
        # w8a8 serving: calibrate on the inputs themselves (they ARE the
        # representative frames for a directory sweep).
        model.calibrate_int8(frames[: max(bs, 32)])
        print("int8: calibrated; running the quantized program")
    # One warmup batch so the printed rate is the pipeline's, not XLA's
    # one-time compile (30+ s on a tunneled chip, cached afterwards).
    t0 = time.perf_counter()
    predict_depths(model, frames[:bs], batch_size=bs)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    depths = predict_depths(model, frames, batch_size=bs)
    dt = time.perf_counter() - t0
    for path, depth in zip(paths, depths):
        stem = os.path.join(
            args.output_dir, os.path.splitext(os.path.basename(path))[0]
        )
        np.save(stem + "_depth.npy", depth)
        if args.save_png:
            _save_depth_png(stem + "_depth.png", depth)
    print(
        f"{len(paths)} frames -> {args.output_dir} "
        f"({len(paths) / max(dt, 1e-9):.1f} frames/s steady; "
        f"first-call compile {t_compile:.1f} s; depth range "
        f"{depths.min():.2f}..{depths.max():.2f} m)"
    )
    return 0


def cmd_prep(args) -> int:
    """Build a training sample list from a KITTI raw OR odometry tree —
    the rebuild of the reference's offline data-prep scripts (SURVEY.md
    §3.4: raw drives for depth, odometry seqs 00-08 for VO training)."""
    from depthvo_tpu.data.kitti import (
        KittiOdomStereo,
        KittiRawStereo,
        write_train_list,
    )

    if args.odom_root:
        seqs = [s.strip() for s in args.sequences.split(",") if s.strip()]
        ds = KittiOdomStereo(
            args.odom_root, seqs, args.height or 160, args.width or 608
        )
        n = write_train_list(ds, args.output, args.odom_root)
        print(f"wrote {n} samples from odometry seqs {seqs} to {args.output}")
        return 0

    if not args.kitti_root:
        print("prep: need --kitti-root (raw) or --odom-root (odometry)")
        return 2
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
    if args.eigen_train:
        # Split hygiene: training must never see the Eigen TEST scenes
        # (SURVEY.md §3.4 — the reference trains on the Eigen train
        # split; evaluating on scenes the model trained on silently
        # inflates every depth metric).
        from depthvo_tpu.data.eigen import EIGEN_TEST_SCENES

        before = len(drives)
        drives = [d for d in drives if d not in EIGEN_TEST_SCENES]
        print(f"--eigen-train: excluded {before - len(drives)} Eigen "
              f"test-scene drives ({len(drives)} remain)")
    ds = KittiRawStereo(
        args.kitti_root, drives, args.height or 160, args.width or 608
    )
    n = write_train_list(ds, args.output, args.kitti_root)
    print(f"wrote {n} samples to {args.output}")
    return 0


def cmd_pretrain_feat(args) -> int:
    """Contrastive feature-extractor pretraining — the in-framework
    replacement for the reference's externally-trained NYUv2 feature
    weights (SURVEY.md §0 item 3). Saves a checkpoint whose 'feat' params
    plug into stage 3 via ``train --init-feat-from <dir>``."""
    import jax

    from depthvo_tpu.data.synthetic import SyntheticScenes
    from depthvo_tpu.io import checkpoint as ckpt_io
    from depthvo_tpu.train.feat_pretrain import pretrain_features
    from depthvo_tpu.train.state import create_state

    cfg = _make_config(args)
    if args.train_list:
        from depthvo_tpu.data.kitti import load_train_list

        ds = load_train_list(
            args.kitti_root or ".", args.train_list, cfg.model.height, cfg.model.width
        )
        it = ds.iterator(cfg.batch_size)
        print(f"pretraining features on {len(ds)} frames from {args.train_list}")
    elif args.kitti_root:
        from depthvo_tpu.data.kitti import KittiRawStereo

        drives = [d.strip() for d in args.drives.split(",") if d.strip()]
        ds = KittiRawStereo(args.kitti_root, drives, cfg.model.height, cfg.model.width)
        it = ds.iterator(cfg.batch_size)
        print(f"pretraining features on {len(ds)} KITTI frames")
    else:
        print("no --kitti-root given: pretraining on synthetic scenes")
        it = SyntheticScenes(cfg, seed=cfg.seed).iterator(cfg.batch_size)

    def log(step, loss):
        if step % max(1, args.steps // 20) == 0 or step == args.steps - 1:
            print(f"pretrain step {step}: infonce={loss:.5f}", flush=True)

    feat_params = pretrain_features(cfg, it, args.steps, log_fn=log)

    # Package as a standard checkpoint (full state, pretrained 'feat').
    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    params = dict(state.params)
    params["feat"] = feat_params
    state = state.replace(params=params)
    mgr = ckpt_io.make_manager(args.checkpoint_dir or "./feat_ckpt")
    ckpt_io.save(mgr, state)
    mgr.wait_until_finished()
    print(f"saved pretrained features to {args.checkpoint_dir or './feat_ckpt'}")
    return 0


def cmd_prep_eigen(args) -> int:
    """Generate Eigen-split gt depth from raw velodyne + the eval list —
    the reference's velodyne-derived gt pipeline (SURVEY.md §3.2). After
    this, ``eval-depth --split-file <out>/eigen_list.txt`` runs from the
    raw KITTI tree alone."""
    from depthvo_tpu.data.eigen import prep_eigen

    n, list_path = prep_eigen(
        kitti_root=args.kitti_root,
        out_dir=args.output_dir,
        split_file=args.split_file,
        scenes=[s for s in args.scenes.split(",") if s] or None,
    )
    print(f"wrote {n} gt depth maps; eval list: {list_path}")
    return 0


def cmd_export_caffemodel(args) -> int:
    """Write a trained net's weights in the Caffe model-zoo format — the
    reverse of the `.caffemodel` importer, so reference-ecosystem tooling
    can consume models trained here (SURVEY.md §1 row 8 model zoo)."""
    from depthvo_tpu.io.export_weights import export_caffemodel

    model = _load_model(args)
    net = args.net
    if net not in model.params:
        print(f"net '{net}' not in checkpoint (has: {sorted(model.params)})")
        return 2
    raw = export_caffemodel(
        model.params[net],
        batch_stats=model.batch_stats if net == "depth" else None,
        path=args.output,
        net_name=f"depthvo_tpu_{net}",
    )
    print(f"wrote {args.output} ({len(raw)} bytes, net={net})")
    return 0


def cmd_import_caffemodel(args) -> int:
    """Inverse of `export-caffemodel`: seat a released `.caffemodel` into
    a fresh model of the chosen variant and write a checkpoint that
    eval-depth / eval-odom / infer consume directly — the whole fidelity
    gate (SURVEY.md §7 step 2) as one command. Nets of the variant other
    than --net stay randomly initialized (import each from its own file)."""
    import jax

    from depthvo_tpu.configs import base as config_io
    from depthvo_tpu.io import caffemodel, checkpoint, import_weights

    cfg = _make_config(args)
    from depthvo_tpu.train.state import create_state

    state = create_state(cfg, jax.random.PRNGKey(0))
    if args.net not in state.params:
        print(f"net '{args.net}' not in variant '{cfg.name}' "
              f"(has: {sorted(state.params)})")
        return 2
    layers = caffemodel.parse_caffemodel(args.caffemodel)
    name_map = bn_map = None
    if args.name_map:
        with open(args.name_map) as f:
            m = json.load(f)
        name_map = m.get("convs", m if "bns" not in m else None)
        bn_map = m.get("bns")
    mean = (
        [float(x) for x in args.input_mean.split(",")]
        if args.input_mean else None
    )
    if getattr(args, "proto", None):
        # Companion prototxt: verify the file pairs with --net and pull
        # the data layer's preprocessing when flags don't set it.
        from depthvo_tpu.io import net_prototxt

        with open(args.proto) as f:
            facts = net_prototxt.extract_facts(
                net_prototxt.parse_prototxt(f.read())
            )
        kind_for = {"depth": "depth", "odom": "odometry", "feat": "feature"}
        want = kind_for[args.net]
        if facts.kind not in (want, "train_graph"):
            print(f"--proto {args.proto} describes a {facts.kind} net, "
                  f"but --net {args.net} expects {want}; refusing "
                  "(pass the matching prototxt or drop --proto)")
            return 2
        if mean is None and facts.mean_values:
            mean = [float(v) for v in facts.mean_values]
            print(f"proto: transform_param mean_value -> {mean}")
        if args.input_scale == 1.0 and facts.scale is not None:
            args.input_scale = facts.scale
            print(f"proto: transform_param scale -> {args.input_scale}")
    stats = state.batch_stats if args.net == "depth" else None
    net_params, stats, report = import_weights.import_net(
        layers,
        state.params[args.net],
        stats,
        name_map=name_map,
        bn_name_map=bn_map,
        input_mean=mean,
        input_scale=args.input_scale,
        input_conv=args.input_conv,
        input_bn=args.input_bn,
        strict=not args.lenient,
    )
    new_params = dict(state.params)
    new_params[args.net] = net_params
    state = state.replace(
        params=new_params,
        batch_stats=stats if args.net == "depth" else state.batch_stats,
    )
    print(import_weights.format_report(report))
    print(f"placed {len(report)} entries from {args.caffemodel} "
          f"into net '{args.net}'")
    if args.checkpoint_dir:
        mgr = checkpoint.make_manager(args.checkpoint_dir)
        checkpoint.save(mgr, state)
        mgr.wait_until_finished()
        config_io.save_json(
            cfg, os.path.join(args.checkpoint_dir, "config.json")
        )
        print(f"wrote checkpoint -> {args.checkpoint_dir}")
    return 0


def cmd_convert(args) -> int:
    """One-shot migration: reference files in, native experiment out.

    solver.prototxt (+ its net:/train_net: graph) and .caffemodel weight
    files become a ready-to-run experiment directory: config.json (the
    whole ExperimentConfig), per-net audited name maps, and an orbax
    checkpoint with the weights seated (transform_param mean/scale folded
    into the input convs). Chains net-info -> make-name-map ->
    import-caffemodel -> config save, the four steps a migrating user
    would otherwise run by hand (SURVEY.md §7 step 2)."""
    import dataclasses

    import jax

    from depthvo_tpu import configs
    from depthvo_tpu.configs import base as config_io
    from depthvo_tpu.io import caffemodel, checkpoint, import_weights
    from depthvo_tpu.io import name_map as nm
    from depthvo_tpu.io.solver_prototxt import apply_solver_prototxt
    from depthvo_tpu.train.state import create_state

    os.makedirs(args.output_dir, exist_ok=True)

    # 1. Locate + recognize the net prototxt (explicit --proto wins over
    #    the solver's net: pointer).
    solver_text = None
    net_path = args.proto
    if args.proto and not os.path.isfile(args.proto):
        # An explicit, unreadable --proto must fail fast — continuing
        # without it would write a checkpoint with unfolded input convs.
        print(f"convert: --proto {args.proto} not found")
        return 2
    if args.solver:
        with open(args.solver) as f:
            solver_text = f.read()
        if net_path is None:
            net_path = _solver_net_path(args.solver, solver_text)
    over = {}
    facts = None
    if net_path and os.path.isfile(net_path):
        facts, over = _recognize_net_file(net_path)
    elif net_path:
        print(f"convert: solver net file {net_path} not found; using flags")

    # 2. Build the config: net facts fill what flags did not set (the
    #    convert parser defaults variant/batch_size to None, so explicit
    #    flags always win).
    variant = args.variant or over.get("variant", "full_feat")
    batch = (args.batch_size if args.batch_size is not None
             else over.get("batch_size", 4))
    cfg = getattr(configs, variant)(batch_size=batch)
    height = args.height or over.get("height") or cfg.model.height
    width = args.width or over.get("width") or cfg.model.width
    if (height, width) != (cfg.model.height, cfg.model.width):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, height=height, width=width
            )
        )
    loss_fields = {k: v for k, v in over.items() if k.endswith("_weight")}
    if loss_fields:
        cfg = dataclasses.replace(cfg, **loss_fields)
    eval_hint = ""
    if solver_text is not None:
        cfg, extras = apply_solver_prototxt(solver_text, cfg)
        print(f"solver: -> {cfg.optim.optimizer}, "
              f"lr={cfg.optim.learning_rate}, policy={cfg.optim.lr_policy}")
        ignored = [k for k in extras["ignored"]
                   if k not in ("net", "train_net")]
        if ignored:
            print(f"solver: ignoring deploy-only fields {ignored}")
        if "eval_every" in extras:
            # test_interval/test_iter are fit() arguments, not config
            # fields — carry them into the suggested train command so
            # the one-shot path keeps the solver's eval cadence.
            eval_hint = f" --eval-every {extras['eval_every']}"
            if "eval_steps" in extras:
                eval_hint += f" --eval-steps {extras['eval_steps']}"
    config_path = os.path.join(args.output_dir, "config.json")
    config_io.save_json(cfg, config_path)
    print(f"wrote {config_path} (variant={cfg.name}, batch={cfg.batch_size}, "
          f"{cfg.model.height}x{cfg.model.width})")

    # 3. Seat the weights: generated name maps (audited), mean/scale fold.
    state = create_state(cfg, jax.random.PRNGKey(cfg.seed))
    mean = over.get("input_mean")
    scale = over.get("input_scale", 1.0)
    if mean is None and scale != 1.0:
        mean = [0.0, 0.0, 0.0]
    params = dict(state.params)
    stats = state.batch_stats
    had_problems = False
    for spec in args.weights or []:
        net, sep, path = spec.partition("=")
        if not sep:
            net, path = "depth", spec
        if net not in params:
            print(f"--weights net {net!r} not in variant {cfg.name!r} "
                  f"(has: {sorted(params)})")
            return 2
        layers = caffemodel.parse_caffemodel(path)
        net_stats = stats if net == "depth" else None
        m, entries, problems = nm.generate_name_map(
            layers, params[net], net_stats, strict=False
        )
        map_path = os.path.join(args.output_dir, f"name_map_{net}.json")
        with open(map_path, "w") as f:
            json.dump(m, f, indent=2, sort_keys=True)
        print(f"\n{net}: {path}")
        print(nm.format_map_report(entries, problems))
        print(f"wrote {map_path}")
        if not m["convs"]:
            print(f"convert: NOTHING in {path} matches net {net!r} — "
                  "wrong file? (no checkpoint written)")
            return 2
        if problems:
            had_problems = True
            if not args.lenient:
                print(f"convert: {len(problems)} unmatched entries — "
                      "refusing to write a partially-random checkpoint "
                      "(rerun with --lenient to seat what matched; the "
                      "map JSON above is written for review)")
                return 2
            print(f"convert: {len(problems)} unmatched entries — "
                  "--lenient: seating what matched; unmatched model "
                  "params stay RANDOM")
        net_params, net_stats, report = import_weights.import_net(
            layers, params[net], net_stats,
            name_map=m["convs"],
            bn_name_map=m["bns"] or None,
            input_mean=mean, input_scale=scale,
            strict=not problems,
        )
        params[net] = net_params
        if net == "depth":
            stats = net_stats
        print(f"seated {len(report)} entries into net {net!r}"
              + (f" (mean/scale folded)" if mean is not None else ""))
    state = state.replace(params=params, batch_stats=stats)

    ckpt_dir = os.path.join(args.output_dir, "checkpoint")
    mgr = checkpoint.make_manager(ckpt_dir)
    checkpoint.save(mgr, state)
    mgr.wait_until_finished()
    config_io.save_json(cfg, os.path.join(ckpt_dir, "config.json"))
    print(f"\nwrote {ckpt_dir}")
    print("next steps:")
    print(f"  train:      depthvo train --config {config_path} "
          f"--init-from {ckpt_dir} --checkpoint-dir <run_dir>{eval_hint}")
    print(f"  eval depth: depthvo eval-depth --checkpoint-dir {ckpt_dir} "
          "--kitti-root <raw> --split-file <eigen.txt>")
    print(f"  infer:      depthvo infer --checkpoint-dir {ckpt_dir} "
          "--images <dir> --output-dir <out>")
    # Lenient runs with unmatched entries exit 1: scripts chaining
    # `convert && train` must not treat a partial seat as clean.
    return 1 if had_problems else 0


def cmd_make_name_map(args) -> int:
    """Derive the {caffe_layer -> flax path} map a released `.caffemodel`
    needs for trustworthy name-based import (SURVEY.md §7 step 2), with
    an audit report that flags every placement resting on within-shape-
    class ordering. Output feeds `import-caffemodel --name-map`."""
    import jax

    from depthvo_tpu.io import caffemodel, name_map
    from depthvo_tpu.train.state import create_state

    cfg = _make_config(args)
    state = create_state(cfg, jax.random.PRNGKey(0))
    if args.net not in state.params:
        print(f"net '{args.net}' not in variant '{cfg.name}' "
              f"(has: {sorted(state.params)})")
        return 2
    layers = caffemodel.parse_caffemodel(args.caffemodel)
    facts = None
    if args.proto:
        from depthvo_tpu.io import net_prototxt

        with open(args.proto) as f:
            facts = net_prototxt.extract_facts(
                net_prototxt.parse_prototxt(f.read())
            )
    stats = state.batch_stats if args.net == "depth" else None
    try:
        map_json, entries, problems = name_map.generate_name_map(
            layers, state.params[args.net], stats,
            proto_facts=facts, strict=not args.lenient,
        )
    except ValueError as e:
        print(e)
        return 2
    print(name_map.format_map_report(entries, problems))
    with open(args.output, "w") as f:
        json.dump(map_json, f, indent=2, sort_keys=True)
    print(f"wrote {args.output} ({len(map_json['convs'])} convs, "
          f"{len(map_json['bns'])} bns) — review the order-trusted rows, "
          "then: import-caffemodel --name-map " + args.output)
    return 0 if not problems else 1


def cmd_net_info(args) -> int:
    """Recognize a Caffe NetParameter prototxt: which of the three
    Depth-VO-Feat networks it is, input geometry, preprocessing, loss
    weights, and the native config overrides it maps to (SURVEY.md §2a
    network/training-graph rows — recognized, never executed)."""
    from depthvo_tpu.io.net_prototxt import (
        config_overrides, extract_facts, format_report, parse_prototxt,
    )

    with open(args.prototxt) as f:
        facts = extract_facts(parse_prototxt(f.read()))
    over, notes = config_overrides(facts)
    print(format_report(facts, over))
    for n in notes:
        print(f"note: {n}")
    if args.json:
        import dataclasses as _dc

        blob = _dc.asdict(facts)
        blob["overrides"] = over
        with open(args.json, "w") as f:
            json.dump(blob, f, indent=2, default=str)
        print(f"wrote {args.json}")
    return 0 if facts.kind != "unknown" else 1


def cmd_export_serving(args) -> int:
    """Freeze the depth forward into a portable, weights-embedded
    StableHLO artifact (the deploy.prototxt+caffemodel analog, lowered
    ahead-of-time for cpu+tpu; loadable with jax alone)."""
    from depthvo_tpu.io import serving

    model = _load_model(args)
    if args.int8_calib:
        # w8a8 artifact: calibrate on representative frames, then export
        # the quantized program (scales + int8 weights fold to
        # constants; the sidecar records int8=true).
        from depthvo_tpu.data.kitti import load_image_u8

        mc = model.config.model
        paths = sorted(
            os.path.join(args.int8_calib, f)
            for f in os.listdir(args.int8_calib)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if not paths:
            print(f"--int8-calib {args.int8_calib}: no images found")
            return 2
        # ALL frames, in batches (repeat calls accumulate the running
        # max) — a silent cap would calibrate on an unrepresentative
        # prefix of the directory.
        for i in range(0, len(paths), 32):
            frames = np.stack(
                [load_image_u8(p, mc.height, mc.width)
                 for p in paths[i:i + 32]]
            )
            model.calibrate_int8(frames)
        print(f"int8: calibrated on {len(paths)} frames "
              f"from {args.int8_calib}")
    sidecar = serving.export_depth(
        model,
        args.output,
        input_dtype=args.input_dtype,
        batch=args.batch,
        output=args.head,
    )
    print(json.dumps(sidecar, indent=2))
    print(f"wrote {args.output} (+ .json sidecar)")
    return 0


def cmd_zoo(args) -> int:
    """Model-zoo table + automated fidelity-gate check (README model-zoo
    analog, SURVEY.md §1 row 8; gate tolerance from BASELINE.md)."""
    from depthvo_tpu import zoo

    if args.check:
        with open(args.check) as f:
            measured = json.load(f)
        if "t_err_pct" in measured:  # eval-odom output
            report = zoo.check_odom_parity(
                measured,
                variant=args.variant_name,
                **({"rtol": args.rtol} if args.rtol is not None else {}),
            )
        else:  # eval-depth output
            report = zoo.check_parity(
                measured, variant=args.variant_name, rtol=args.rtol,
                int8=getattr(args, "int8", False),
                trust_split=getattr(args, "trust_split", False),
            )
        for row in report["rows"]:
            if row["status"] == "missing":
                print(f"{row['metric']:10s} MISSING from {args.check}")
            else:
                print(
                    f"{row['metric']:10s} published={row['published']:<8g}"
                    f" measured={row['measured']:<8g}"
                    f" rel_err={row['rel_err']:.2%}  {row['status']}"
                )
        if "warning" in report:
            print(f"WARNING: {report['warning']}")
        print(json.dumps(report))
        return 0 if report["parity"] else 1

    for name, entry in zoo.ZOO.items():
        mark = "~" if entry["approximate"] else " "
        print(f"{name:14s}{mark} {entry['title']}")
        print(f"{'':15s}nets: {', '.join(entry['nets'])}  "
              f"(training stage {entry['stage']}, "
              f"variant {entry['train_variant']})")
        dm = entry["depth_metrics"]
        if dm:
            print(f"{'':15s}depth: " + "  ".join(
                f"{k}={v:g}" for k, v in dm.items()))
        om = entry["odom_metrics"]
        if om:
            for seq, m in om.items():
                print(f"{'':15s}odom seq {seq}: "
                      f"t_err={m['t_err_pct']}%  "
                      f"r_err={m['r_err_deg_per_100m']}°/100m")
        for cmd in zoo.import_commands(name):
            print(f"{'':15s}$ {cmd}")
    print("\n~ = approximate reference row ([M]/[L] in BASELINE.md; "
          "check uses a widened tolerance)")
    print("weights ship from the reference README's links (not "
          "reachable/verifiable from this machine)")
    return 0


def cmd_device_query(args) -> int:
    """`caffe device_query` analog: enumerate accelerators + memory.

    The reference prints one block per CUDA device (name, totalGlobalMem,
    capability, ...; SURVEY.md §2b(ii) tools/caffe.cpp). Here each JAX
    device reports its platform/kind/topology plus live HBM statistics
    where the backend exposes them.
    """
    import jax

    devices = jax.devices()
    print(f"backend: {jax.default_backend()}  devices: {len(devices)}  "
          f"process: {jax.process_index()}/{jax.process_count()}")
    for d in devices:
        line = f"[{d.id}] {d.device_kind} (platform={d.platform}"
        coords = getattr(d, "coords", None)
        if coords is not None:
            line += f", coords={tuple(coords)}"
        core = getattr(d, "core_on_chip", None)
        if core is not None:
            line += f", core={core}"
        line += f", process={d.process_index})"
        print(line)
        try:
            stats = d.memory_stats()
        except (NotImplementedError, AttributeError, jax.errors.JaxRuntimeError):
            stats = None
        if stats:
            total = stats.get("bytes_limit")
            used = stats.get("bytes_in_use")
            peak = stats.get("peak_bytes_in_use")
            parts = []
            if total is not None:
                parts.append(f"hbm total {total / 2**30:.2f} GiB")
            if used is not None:
                parts.append(f"in use {used / 2**30:.3f} GiB")
            if peak is not None:
                parts.append(f"peak {peak / 2**30:.3f} GiB")
            if parts:
                print("     " + ", ".join(parts))
    return 0


def cmd_bench(args) -> int:
    from depthvo_tpu.utils.profiling import depth_layer_table, run_benchmark

    if args.mode in ("depth_layers", "odom_layers", "feat_layers"):
        from depthvo_tpu.utils.profiling import maybe_trace

        with maybe_trace(args.trace_dir):
            result = depth_layer_table(
                batch_size=args.batch_size,
                height=args.height or 160,
                width=args.width or 608,
                steps=args.steps,
                variant=args.variant,
                net=args.mode.split("_")[0],
            )
        print(f"{'layer':16s} {'forward':>10s} {'backward':>10s}"
              f" {'fwd cum':>10s} {'bwd cum':>10s}")
        for row in result["rows"]:
            bwd = row.get("backward_ms")
            bwd_c = row.get("bwd_cumulative_ms")
            print(
                f"{row['layer']:16s} {row['forward_ms']:8.3f} ms"
                f" {bwd if bwd is not None else float('nan'):8.3f} ms"
                f" {row['fwd_cumulative_ms']:10.3f}"
                f" {bwd_c if bwd_c is not None else float('nan'):10.3f}"
            )
        print(json.dumps(result))
        return 0
    if args.int8 and args.mode != "depth_infer":
        print(f"--int8 applies to --mode depth_infer only (got "
              f"{args.mode}); refusing to print an f32 number under an "
              "int8 flag")
        return 2
    result = run_benchmark(
        mode=args.mode,
        batch_size=args.batch_size,
        height=args.height or 160,
        width=args.width or 608,
        steps=args.steps,
        trace_dir=args.trace_dir,
        variant=args.variant,
        remat=args.remat,
        int8=args.int8,
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
    # None = "not explicitly set": a solver net: prototxt may then supply
    # the value; _make_config resolves the remaining Nones to the
    # defaults shown by --help (full_feat / 4).
    p.set_defaults(variant=None, batch_size=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--config", default=None,
                   help="experiment-config JSON (caffe train --solver "
                        "analog); supersedes --variant/--height/--width/"
                        "--batch-size")
    p.add_argument("--solver", default=None,
                   help="Caffe solver.prototxt to overlay on the config "
                        "(the `caffe train --solver=` migration path: "
                        "type/base_lr/lr_policy/momentum/stepvalue/"
                        "max_iter/iter_size/snapshot/test_interval)")
    p.add_argument("--iter-size", type=int, default=1,
                   help="Caffe solver iter_size: accumulate gradients over "
                        "k micro-batches per optimizer update")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize DepthNet stages (memory-for-FLOPs; "
                        "raises the per-chip batch ceiling)")
    p.add_argument("--num-slices", type=int, default=1,
                   help="multi-slice DP: hierarchical (dcn, data) mesh; "
                        "gradient reduce rides ICI within a slice, DCN across")
    p.add_argument("--coordinator", default=None,
                   metavar="HOST:PORT",
                   help="multi-process launch: coordinator address for "
                        "jax.distributed (run the same command on every "
                        "host with its own --process-id; env "
                        "DEPTHVO_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID "
                        "work too)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-process launch: total process count")
    p.add_argument("--process-id", type=int, default=None,
                   help="multi-process launch: this process's rank")
    p.add_argument("--kitti-root", default=None)
    p.add_argument("--drives", default="")
    p.add_argument("--kitti-odom-root", default=None,
                   help="KITTI odometry tree: train on sequences (ref: 00-08)")
    p.add_argument("--sequences", default="00,01,02,03,04,05,06,07,08",
                   help="odometry sequences for --kitti-odom-root")
    p.add_argument("--train-list", default=None,
                   help="prepared sample list (see the `prep` subcommand)")
    p.add_argument("--weights", action="append", default=None,
                   metavar="[NET=]FILE.caffemodel",
                   help="seat a .caffemodel into the fresh model before "
                        "training (caffe train --weights analog; "
                        "repeatable, NET in depth/odom/feat, default "
                        "depth). For name maps / mean folding use "
                        "import-caffemodel + --init-from instead")
    p.add_argument("--init-from", default=None,
                   help="previous stage checkpoint (staged finetune)")
    p.add_argument("--init-feat-from", default=None,
                   help="pretrain-feat checkpoint: overrides 'feat' params")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="optimizer steps per dispatch (lax.scan)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="validate every N steps (Caffe solver test_interval; "
                        "0 = off)")
    p.add_argument("--eval-steps", type=int, default=10,
                   help="held-out batches averaged per validation "
                        "(Caffe solver test_iter)")
    p.add_argument("--val-list", default=None,
                   help="held-out sample list for validation (see `prep`); "
                        "default: held-out synthetic scenes")
    p.add_argument("--debug-nans", action="store_true",
                   help="abort on the first non-finite value (diagnostics)")
    p.add_argument("--log-jsonl", default=None,
                   help="also append per-step metrics as JSONL here")
    p.add_argument("--tensorboard", default=None,
                   help="also write TensorBoard scalar events here")
    p.add_argument("--native-ring", default=None,
                   type=lambda s: s.lower() in ("1", "true", "yes"),
                   help="force the C++ prefetch ring on/off (default: auto)")
    p.add_argument("--sigint-effect", default="stop",
                   choices=["stop", "snapshot", "none"],
                   help="SIGINT (Ctrl-C) action: snapshot + clean exit, "
                        "snapshot + continue, or OS default (Caffe "
                        "`caffe train --sigint_effect`)")
    p.add_argument("--sighup-effect", default="snapshot",
                   choices=["stop", "snapshot", "none"],
                   help="SIGHUP action (Caffe `--sighup_effect`)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser(
        "test",
        help="average the loss over held-out batches (reference: caffe test)",
    )
    _add_common(p)
    p.add_argument("--iterations", type=int, default=10,
                   help="held-out batches to average (caffe test -iterations)")
    p.add_argument("--num-devices", type=int, default=None)
    p.add_argument("--kitti-root", default=None)
    p.add_argument("--val-list", default=None,
                   help="held-out sample list (see `prep`)")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("eval-depth", help="Eigen-split depth metrics")
    _add_common(p)
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel eval over N chips (batch sharded)")
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--split-file", required=True)
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--save-preds", default=None,
                   help="also write raw depth predictions (.npy) here")
    p.add_argument("--no-median-scale", action="store_true",
                   help="report unscaled metrics (stereo-trained models "
                        "are metric; the reference's protocol for them)")
    p.add_argument("--pred-path", default=None,
                   help="evaluate SAVED predictions instead of a model: "
                        "a (N,H,W) .npy/.npz stack or a directory "
                        "(--save-preds output, or per-frame *.npy) — the "
                        "reference's two-phase eval_depth protocol; works "
                        "on predictions from any framework")
    p.add_argument("--split-sha", default=None, metavar="SHA256",
                   help="pin the split file's SHA-256: refuse to run if "
                        "it differs, and mark the provenance 'pinned' "
                        "(zoo --check requires a pinned hash before "
                        "accepting a canonical-split claim)")
    p.add_argument("--pred-inverse", action="store_true",
                   help="stored maps are inverse depth (raw net output); "
                        "invert before the metric pass")
    p.add_argument("--int8", action="store_true",
                   help="run the w8a8 int8 serving path (calibrates on "
                        "the split's first frames); quantifies the int8 "
                        "accuracy cost on the real eval protocol")
    p.set_defaults(fn=cmd_eval_depth)

    p = sub.add_parser("eval-odom", help="KITTI odometry seq eval (t_err/r_err/ATE)")
    _add_common(p)
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--sequence", default="09")
    p.add_argument("--output-dir", default="./odom_out")
    p.add_argument("--pose-file", default=None,
                   help="score an existing KITTI-format pose file (any "
                        "VO system's output) against the sequence's "
                        "ground truth instead of running the model — "
                        "the reference's two-phase eval_odom protocol")
    p.set_defaults(fn=cmd_eval_odom)

    p = sub.add_parser("infer", help="depth maps for a directory of frames")
    _add_common(p)
    p.add_argument("--images", required=True)
    p.add_argument("--output-dir", default="./depth_out")
    p.add_argument("--save-png", action="store_true",
                   help="also write colormapped inverse-depth PNGs "
                        "(reference README figure style)")
    p.add_argument("--int8", action="store_true",
                   help="w8a8 int8 serving path (calibrates on the "
                        "input frames; v5e int8 MXU peak is 2x bf16)")
    # Inference amortizes over bigger batches than training's default.
    p.set_defaults(fn=cmd_infer, batch_size=16)

    p = sub.add_parser("prep", help="build a train-list file from KITTI raw/odometry")
    _add_common(p)
    p.add_argument("--kitti-root", default=None)
    p.add_argument("--drives", default="", help="comma-separated; empty = discover all")
    p.add_argument("--odom-root", default=None,
                   help="KITTI odometry tree (overrides --kitti-root)")
    p.add_argument("--sequences", default="00,01,02,03,04,05,06,07,08")
    p.add_argument("--output", default="train_list.txt")
    p.add_argument("--eigen-train", action="store_true",
                   help="exclude the Eigen TEST scenes from discovered "
                        "drives (train/test split hygiene)")
    p.set_defaults(fn=cmd_prep)

    p = sub.add_parser(
        "pretrain-feat",
        help="contrastive feature pretraining (replaces external NYUv2 weights)",
    )
    _add_common(p)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--kitti-root", default=None)
    p.add_argument("--drives", default="")
    p.add_argument("--train-list", default=None)
    p.set_defaults(fn=cmd_pretrain_feat)

    p = sub.add_parser(
        "prep-eigen",
        help="velodyne -> Eigen-split gt depth + eval list (reference gt protocol)",
    )
    p.add_argument("--kitti-root", required=True)
    p.add_argument("--output-dir", default="./eigen_gt")
    p.add_argument("--split-file", default=None,
                   help="canonical eigen_test_files list (either format); "
                        "default: enumerate the shipped test-scene drives")
    p.add_argument("--scenes", default="",
                   help="comma-separated drive names overriding the shipped list")
    p.set_defaults(fn=cmd_prep_eigen)

    p = sub.add_parser(
        "export-caffemodel",
        help="write weights in the Caffe model-zoo format (importer's inverse)",
    )
    _add_common(p)
    p.add_argument("--net", default="depth", choices=["depth", "odom", "feat"])
    p.add_argument("--output", default="model.caffemodel")
    p.set_defaults(fn=cmd_export_caffemodel)

    p = sub.add_parser(
        "import-caffemodel",
        help="seat released Caffe weights into a checkpoint (fidelity gate)",
    )
    _add_common(p)
    p.add_argument("--caffemodel", required=True)
    p.add_argument("--net", default="depth", choices=["depth", "odom", "feat"])
    p.add_argument("--name-map", default=None,
                   help="JSON {caffe_layer: flax.path} or "
                        "{'convs': {...}, 'bns': {...}}")
    p.add_argument("--input-mean", default=None,
                   help="Caffe transform_param mean_value per channel, BGR "
                        "order (e.g. '104,116.7,122.7'); folds the data "
                        "layer's preprocessing into the input conv")
    p.add_argument("--input-scale", type=float, default=1.0,
                   help="Caffe transform_param scale (applied after mean)")
    p.add_argument("--input-conv", default=None,
                   help="dotted flax path of the input conv (default: auto)")
    p.add_argument("--input-bn", default=None,
                   help="dotted path of the BN absorbing the fold offset")
    p.add_argument("--lenient", action="store_true",
                   help="don't fail on unmatched params")
    p.add_argument("--proto", default=None,
                   help="the weights' companion prototxt: checks it "
                        "describes the --net target and supplies "
                        "transform_param mean/scale automatically")
    p.set_defaults(fn=cmd_import_caffemodel)

    p = sub.add_parser(
        "convert",
        help="one-shot migration: solver/net prototxts + .caffemodels -> "
             "native experiment dir (config.json, name maps, checkpoint)",
    )
    _add_common(p)
    p.add_argument("--solver", default=None,
                   help="Caffe solver.prototxt (its net:/train_net: is "
                        "followed)")
    p.add_argument("--proto", default=None,
                   help="net prototxt (overrides the solver's net: pointer)")
    p.add_argument("--weights", action="append", default=None,
                   metavar="[net=]file.caffemodel",
                   help="weights to seat (repeatable; default net 'depth')")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--lenient", action="store_true",
                   help="seat what matched when some entries are "
                        "unmatched (exit 1) instead of refusing (exit 2)")
    # None = "not explicitly set" (net facts may fill them; see train).
    p.set_defaults(fn=cmd_convert, variant=None, batch_size=None)

    p = sub.add_parser(
        "make-name-map",
        help="derive the name map a released .caffemodel needs for "
             "name-based import (audit report + JSON for --name-map)",
    )
    _add_common(p)
    p.add_argument("--caffemodel", required=True)
    p.add_argument("--net", default="depth", choices=["depth", "odom", "feat"])
    p.add_argument("--proto", default=None,
                   help="companion prototxt: cross-checks declared "
                        "layers/num_output against the weights file")
    p.add_argument("--output", default="name_map.json")
    p.add_argument("--lenient", action="store_true",
                   help="report unmatched entries instead of failing")
    p.set_defaults(fn=cmd_make_name_map)

    p = sub.add_parser(
        "net-info",
        help="recognize a Caffe net prototxt (kind, input dims, "
             "preprocessing, loss weights -> native config)",
    )
    p.add_argument("prototxt")
    p.add_argument("--json", default=None,
                   help="also write the facts + overrides as JSON")
    p.set_defaults(fn=cmd_net_info)

    p = sub.add_parser(
        "device-query",
        help="enumerate accelerators + HBM stats (reference: caffe device_query)",
    )
    p.set_defaults(fn=cmd_device_query)

    p = sub.add_parser(
        "export-serving",
        help="freeze the depth net into a portable StableHLO artifact "
             "(weights embedded, cpu+tpu, any batch size)",
    )
    _add_common(p)
    p.add_argument("--output", required=True,
                   help="artifact path (a .json input-spec sidecar lands "
                        "next to it)")
    p.add_argument("--input-dtype", default="uint8",
                   choices=["uint8", "float32"])
    p.add_argument("--batch", type=int, default=None,
                   help="concrete batch size (default: symbolic — one "
                        "artifact serves every batch size)")
    p.add_argument("--head", default="depth", choices=["depth", "disparity"])
    p.add_argument("--int8-calib", default=None,
                   help="directory of representative frames: calibrate "
                        "and export the w8a8 int8 program instead of "
                        "bf16/f32 (scales + int8 weights baked in)")
    p.set_defaults(fn=cmd_export_serving)

    p = sub.add_parser(
        "zoo",
        help="released-model table + fidelity-gate check (README model zoo)",
    )
    p.add_argument("--check", default=None,
                   help="eval-depth JSON to compare against the zoo row")
    p.add_argument("--variant-name", default="full_nyuv2",
                   help="zoo row to list/check against")
    p.add_argument("--rtol", type=float, default=None,
                   help="override the gate tolerance (default: 1%% exact "
                        "rows, 5%% approximate rows)")
    p.add_argument("--int8", action="store_true",
                   help="gate an int8 (w8a8) serving run: requires the "
                        "eval JSON to declare quant=int8 (eval-depth "
                        "--int8) and widens the tolerance by the "
                        "declared serving budget (+3%% rel, from "
                        "benchmarks/int8_ab.py)")
    p.add_argument("--trust-split", action="store_true",
                   help="accept an unpinned canonical-split claim on "
                        "operator trust: the gate proceeds but the report "
                        "records split_trusted_unpinned and the split's "
                        "sha256 (default: refuse, printing the exact "
                        "commands to pin the canonical Eigen-697 list on "
                        "a networked machine)")
    p.set_defaults(fn=cmd_zoo)

    p = sub.add_parser("bench", help="throughput benchmark (reference: caffe time)")
    _add_common(p)
    p.add_argument("--mode", default="depth_infer",
                   choices=["depth_infer", "train_step", "train_step_scan",
                            "odom_infer", "warp", "depth_layers",
                            "odom_layers", "feat_layers"])
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize DepthNet stages (memory-for-FLOPs; "
                        "raises the per-chip batch ceiling)")
    p.add_argument("--int8", action="store_true",
                   help="depth_infer only: w8a8 int8 serving path "
                        "(calibrates on the benchmark batch; v5e int8 "
                        "MXU peak is 2x bf16)")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
