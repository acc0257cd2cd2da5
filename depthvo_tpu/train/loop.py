"""The train step (loss graph + update) and the host training loop.

This is the rebuild of the reference's training call stack (SURVEY.md
§3.1): what Caffe expressed as a prototxt DAG of siamese towers, geometry
layers and loss layers executed by ``Net::ForwardBackward`` is here one
pure function ``compute_losses`` traced by ``jax.jit`` — XLA owns graph
construction, scheduling, fusion, and (via the mesh shardings) the
gradient all-reduce over ICI.

Loss graph (full variant; switches select the staged subsets):

  disp_pyramid = DepthNet(I_t)                         # multi-scale
  twist        = OdomNet([I_t, I_s]);  T_ts = se3.exp(twist)
  per scale s:
    stereo:   warp(I_r -> I_t view, depth_s, T_lr)  -> masked L1
    temporal: warp(I_s -> I_t view, depth_s, T_ts)  -> masked L1
    smoothness(disp_s, I_t)
  finest scale only:
    feature:  warp(F(I_s) -> F(I_t), depth, T_ts)   -> masked L1

Conventions: images NHWC in [-1, 1]; disp = inverse depth (1/m);
T_lr maps left-cam points to right-cam coords (X_r = X_l - [b,0,0]).
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from depthvo_tpu import ops
from depthvo_tpu.configs import base as config_base
from depthvo_tpu.configs.base import ExperimentConfig
from depthvo_tpu.geometry import se3, warp as geo_warp
from depthvo_tpu.geometry.camera import scale_intrinsics
from depthvo_tpu.losses import (
    photometric_loss,
    smoothness_loss,
)
from depthvo_tpu.losses.photometric import masked_l1_chw, photometric_loss_chw
from depthvo_tpu.models.layers import resize_bilinear, resize_bilinear_chw
from depthvo_tpu.parallel import mesh as pmesh
from depthvo_tpu.utils.images import to_unit
from depthvo_tpu.train.state import TrainState, build_models, create_state, make_optimizer


def compute_losses(
    config: ExperimentConfig,
    models,
    params,
    batch_stats,
    batch: Dict[str, jax.Array],
    train: bool,
):
    """Evaluate the staged loss graph.

    Args:
      models: (depth_net, odom_net, feat_net) modules.
      batch: dict with keys
        'image_t'  (B,H,W,3) target frame (left cam, time t), in [-1,1]
                   float32 OR raw uint8 (normalized here on-device — ship
                   uint8 to move 4x fewer bytes over the host link)
        'image_r'  (B,H,W,3) stereo pair (right cam), if use_stereo
        'image_s'  (B,H,W,3) temporal source (left cam, t+1), if use_temporal
        'K'        (B,3,3) intrinsics at full resolution
        'baseline' (B,) optional per-sample stereo baseline in meters
                   (from the drive/sequence calib — KITTI rigs vary
                   ~0.53-0.54 m); falls back to config.stereo_baseline

    Returns: (total_loss, (metrics, new_batch_stats))
    """
    depth_net, odom_net, feat_net = models
    batch = {
        k: to_unit(v) if getattr(v, "dtype", None) == jnp.uint8 else v
        for k, v in batch.items()
    }
    image_t = batch["image_t"]
    K = batch["K"]
    B, H, W, _ = image_t.shape
    # Per-sample stereo baseline (B,) when the loader provides it (KITTI
    # calib); the config scalar otherwise (synthetic default).
    baseline = batch.get("baseline")
    if baseline is None:
        baseline = jnp.float32(config.stereo_baseline)

    # --- forward: depth tower (BN stats update in train mode) ---
    dvars = {"params": params["depth"], "batch_stats": batch_stats}
    if train:
        disps, mut = depth_net.apply(
            dvars, image_t, train=True, mutable=["batch_stats"]
        )
        new_batch_stats = mut["batch_stats"]
    else:
        disps = depth_net.apply(dvars, image_t, train=False)
        new_batch_stats = batch_stats

    metrics: Dict[str, jax.Array] = {}
    total = jnp.zeros((), jnp.float32)

    # --- forward: odometry tower ---
    T_ts = None
    if config.use_temporal:
        pair = jnp.concatenate([image_t, batch["image_s"]], axis=-1)
        twist = odom_net.apply({"params": params["odom"]}, pair, train=train)
        T_ts = se3.exp(twist)  # target-cam -> source-cam
        metrics["twist_norm"] = jnp.mean(jnp.linalg.norm(twist, axis=-1))

    # --- multi-scale photometric + smoothness ---
    # The photometric region runs in the warp kernels' native CHW layout:
    # each input image is transposed ONCE at full resolution and the
    # pyramid / warps / losses stay (B, C, H, W) throughout, so XLA
    # inserts no per-warp layout conversions around the custom-calls.
    # Measured effect (v5e, config 4, 2026-08-18): step time unchanged
    # (28.3 ms either way) — XLA was already hiding those transposes —
    # so this layout is kept for program hygiene (fewer layout ops in
    # the HLO, custom-VJP boundary in the kernel's own layout), not as
    # a throughput claim; see PERF.md. The conv towers above stay NHWC
    # (their fast layout); only this boundary converts.
    loss_dtype = jnp.dtype(config.loss_dtype)

    def to_chw(x):
        return jnp.transpose(x.astype(loss_dtype), (0, 3, 1, 2))

    image_t_chw = to_chw(image_t)
    image_r_chw = to_chw(batch["image_r"]) if config.use_stereo else None
    image_s_chw = to_chw(batch["image_s"]) if config.use_temporal else None

    n_scales = len(disps)
    stereo_total = jnp.zeros((), jnp.float32)
    temporal_total = jnp.zeros((), jnp.float32)
    smooth_total = jnp.zeros((), jnp.float32)
    for i, disp in enumerate(disps):  # coarsest -> finest
        h, w = disp.shape[1:3]
        Ks = scale_intrinsics(K, w / W, h / H)
        img_t = (
            image_t_chw
            if (h, w) == (H, W)
            else resize_bilinear_chw(image_t_chw, h, w)
        )
        depth = 1.0 / disp[..., 0]
        if config.use_stereo:
            img_r = (
                image_r_chw
                if (h, w) == (H, W)
                else resize_bilinear_chw(image_r_chw, h, w)
            )
            # Rectified-stereo warp: epipolar-horizontal specialization
            # (Pallas kernel on TPU) — same math as inverse_warp with
            # T_lr = [I | (-b, 0, 0)]. The disparity bound is derived
            # from the config per scale (VERDICT r2 item 6), never a
            # hardcoded constant.
            fxb = Ks[..., 0, 0] * baseline
            warped, valid = ops.stereo_warp_chw(
                img_r, depth, fxb, dmax=config_base.stereo_dmax(config, w)
            )
            stereo_total += photometric_loss_chw(
                warped, img_t, valid, config.ssim_weight
            )
        if config.use_temporal and not ((h, w) == (H, W) and config.use_feature):
            img_s = (
                image_s_chw
                if (h, w) == (H, W)
                else resize_bilinear_chw(image_s_chw, h, w)
            )
            # The source frame is constant data: the frozen-src warp's
            # backward is gather-only (Pallas kernel on TPU).
            warped, valid = ops.frozen_warp_chw(
                img_s, depth, T_ts, Ks, pad_v=config.warp_pad_v
            )
            temporal_total += photometric_loss_chw(
                warped, img_t, valid, config.ssim_weight
            )
        smooth_total += smoothness_loss(
            disp, img_t, edge_aware=config.edge_aware_smoothness,
            image_layout="chw",
        ) / (2.0**(n_scales - 1 - i))

    # --- finest-scale temporal + feature reconstruction, fused warp ---
    # Both losses sample the source view at IDENTICAL coordinates (same
    # depth, pose, intrinsics), and the gather cost is per-index, not
    # per-channel: concatenating RGB + feature channels into ONE warp
    # halves the gather work in both forward and backward — exact, free.
    feat_loss = None
    if config.use_temporal and config.use_feature:
        feat_params = params["feat"]
        if not config.train_feat:
            feat_params = jax.lax.stop_gradient(feat_params)
        feat_t = feat_net.apply({"params": feat_params}, image_t, train=False)
        feat_s = feat_net.apply(
            {"params": feat_params}, batch["image_s"], train=False
        )
        depth_full = 1.0 / disps[-1][..., 0]
        feat_t_chw = to_chw(feat_t)
        payload = jnp.concatenate([image_s_chw, to_chw(feat_s)], axis=1)
        if config.train_feat:
            # feat_s carries gradients -> needs the scatter-capable path
            # (NHWC XLA gather/scatter; transposed into the CHW loss
            # region afterwards — the non-default research path).
            warped_hwc, valid = geo_warp.inverse_warp(
                jnp.transpose(payload, (0, 2, 3, 1)), depth_full, T_ts, K
            )
            warped = jnp.transpose(warped_hwc, (0, 3, 1, 2))
        else:
            warped, valid = ops.frozen_warp_chw(
                payload, depth_full, T_ts, K, pad_v=config.warp_pad_v
            )
        temporal_total += photometric_loss_chw(
            warped[:, :3], image_t_chw, valid, config.ssim_weight
        )
        feat_loss = config.feature_weight * masked_l1_chw(
            warped[:, 3:], feat_t_chw, valid
        )
    elif config.use_feature:
        raise ValueError(
            "use_feature requires use_temporal (the feature loss warps "
            "with the predicted pose) — matching the reference's staged "
            "recipe (SURVEY.md §0)"
        )

    if config.use_stereo:
        stereo_loss = config.stereo_weight * stereo_total / n_scales
        metrics["loss/stereo"] = stereo_loss
        total += stereo_loss
    if config.use_temporal:
        temporal_loss = config.temporal_weight * temporal_total / n_scales
        metrics["loss/temporal"] = temporal_loss
        total += temporal_loss
    smooth_loss = config.smooth_weight * smooth_total / n_scales
    metrics["loss/smooth"] = smooth_loss
    total += smooth_loss
    if feat_loss is not None:
        metrics["loss/feature"] = feat_loss
        total += feat_loss

    metrics["loss/total"] = total
    metrics["disp/mean"] = jnp.mean(disps[-1])
    return total, (metrics, new_batch_stats)


def make_train_step(
    config: ExperimentConfig, mesh=None
) -> Callable[[TrainState, Dict[str, jax.Array]], tuple]:
    """Build the jitted data-parallel train step.

    With a mesh, state is replicated and the batch is sharded over the
    ``data`` axis; XLA inserts the gradient psum over ICI (SURVEY.md §5).
    """
    models = build_models(config)
    tx = make_optimizer(config)
    step_fn = _single_step(config, models, tx)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)
    repl = pmesh.replicated(mesh)
    # Batch shardings are set by pmesh.shard_batch (batch-divisible leaves
    # over 'data', the rest replicated) and inherited here — forcing 'data'
    # on every leaf would reject replicated leaves like a shared K matrix.
    return jax.jit(
        step_fn,
        donate_argnums=0,
        in_shardings=(repl, None),
        out_shardings=(repl, repl),
    )


def _single_step(config, models, tx):
    """One fwd+bwd+update step — the SHARED body of make_train_step and
    make_scan_train_step's scan (one definition, no hand-synced copies)."""

    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            return compute_losses(
                config, models, params, state.batch_stats, batch, train=True
            )

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, new_batch_stats=new_bs, tx=tx
        )
        metrics["grad/global_norm"] = _global_norm(grads)
        return new_state, metrics

    return step_fn


def make_scan_train_step(
    config: ExperimentConfig, mesh=None, unroll: int = 1
):
    """Multiple optimizer steps per dispatch via ``lax.scan``.

    K (the steps per dispatch) is the stacked batch's leading dimension —
    the returned fn runs exactly ``stacked_batch.shape[0]`` steps.

    The reference pays a Python->C++ transition per Caffe iteration
    (SURVEY.md §3.1); a naive port pays a host->device dispatch per step,
    which on a remote/tunneled TPU dominates wall clock. Scanning K steps
    inside one jitted call keeps the device busy: the host stacks K
    batches, one dispatch runs K fwd+bwd+update iterations on-device.

    Measured (v5e-1, full_feat batch 4, 2026-08-16): 35.5 ms/step at
    K=8 vs 37.1 ms/step sequential chained dispatch — scan now matches
    the straight-line conv schedules (an earlier ~3x regression no
    longer reproduces with the Pallas warp kernels on all scales) and
    additionally hides the per-dispatch tunnel latency. ``unroll > 1``
    is NOT supported at full resolution: XLA's scoped-VMEM allocation
    for the general-warp backward kernel overflows when the unrolled
    body replicates the kernel (measured OOM at unroll=8).

    The returned fn maps (state, stacked_batch[K, ...]) -> (state, metrics
    of the last step).
    """
    models = build_models(config)
    tx = make_optimizer(config)
    body = _single_step(config, models, tx)

    def multi_step(state: TrainState, batches):
        state, metrics = jax.lax.scan(body, state, batches, unroll=unroll)
        last = jax.tree.map(lambda m: m[-1], metrics)
        return state, last

    if mesh is None:
        return jax.jit(multi_step, donate_argnums=0)
    repl = pmesh.replicated(mesh)
    return jax.jit(
        multi_step,
        donate_argnums=0,
        in_shardings=(repl, None),
        out_shardings=(repl, repl),
    )


def stack_batches(batches):
    """Stack K host batches (list of dicts) into one [K, ...] pytree."""
    return {
        k: np.stack([b[k] for b in batches], axis=0) for k in batches[0]
    }


def _global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def make_eval_step(config: ExperimentConfig):
    """Jitted eval-mode loss evaluation (no update, BN running stats)."""
    models = build_models(config)

    @jax.jit
    def eval_fn(state: TrainState, batch):
        loss, (metrics, _) = compute_losses(
            config, models, state.params, state.batch_stats, batch, train=False
        )
        return metrics

    return eval_fn


def run_validation(
    eval_fn, state, eval_iter, eval_steps: int, mesh
) -> Dict[str, float]:
    """Run ``eval_steps`` held-out batches and average the loss terms —
    the rebuild of Caffe's solver test phase (``test_iter`` batches every
    ``test_interval`` iterations; SURVEY.md §5 config system: solver.prototxt).
    Returns metrics under a ``val/`` prefix."""
    totals: Dict[str, float] = {}
    for _ in range(eval_steps):
        batch = pmesh.shard_batch(next(eval_iter), mesh)
        metrics = jax.device_get(eval_fn(state, batch))
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    return {f"val/{k}": v / max(eval_steps, 1) for k, v in totals.items()}


class SolverSignals:
    """Caffe ``SignalHandler`` analog (caffe.cpp ``--sigint_effect`` /
    ``--sighup_effect``, SURVEY §2b(ii) tools/caffe.cpp row).

    Maps SIGINT/SIGHUP to a solver action checked once per step
    dispatch: ``"stop"`` finishes the current step, snapshots, and
    returns from :func:`fit` cleanly; ``"snapshot"`` writes a checkpoint
    and keeps training; ``"none"`` leaves the OS default (SIGINT raises
    KeyboardInterrupt, SIGHUP kills). Stop outranks a pending snapshot.

    Use as a context manager — previous handlers are restored on exit.
    Installation is skipped (with the prior behavior kept) off the main
    thread, where CPython forbids ``signal.signal``.
    """

    _EFFECTS = ("stop", "snapshot", "none")

    def __init__(self, sigint: str = "none", sighup: str = "none"):
        import signal as _signal

        for name, eff in (("sigint", sigint), ("sighup", sighup)):
            if eff not in self._EFFECTS:
                raise ValueError(
                    f"{name}_effect {eff!r} not in {self._EFFECTS}"
                )
        self._signal = _signal
        self._effects = {}
        if sigint != "none":
            self._effects[_signal.SIGINT] = sigint
        if sighup != "none" and hasattr(_signal, "SIGHUP"):
            self._effects[_signal.SIGHUP] = sighup
        self._prev = {}
        self._pending: str | None = None

    def _handle(self, signum, frame):
        effect = self._effects[signum]
        if self._pending != "stop":  # stop outranks snapshot
            self._pending = effect

    def __enter__(self):
        for signum in self._effects:
            try:
                self._prev[signum] = self._signal.signal(signum, self._handle)
            except ValueError:  # not the main thread
                pass
        return self

    def __exit__(self, *exc):
        for signum, prev in self._prev.items():
            self._signal.signal(signum, prev)
        self._prev.clear()
        return False

    def pending(self) -> str | None:
        """Return and clear the requested action ('stop'/'snapshot'/None)."""
        action, self._pending = self._pending, None
        return action


def fit(
    config: ExperimentConfig,
    data_iter: Iterator[Dict[str, np.ndarray]],
    num_steps: int,
    mesh=None,
    checkpoint_dir: str | None = None,
    log_fn: Callable[[int, Dict[str, float]], None] | None = None,
    state: TrainState | None = None,
    steps_per_call: int = 1,
    prefetch: int = 2,
    eval_iter: Iterator[Dict[str, np.ndarray]] | None = None,
    eval_every: int = 0,
    eval_steps: int = 10,
    sigint_effect: str = "none",
    sighup_effect: str = "none",
) -> TrainState:
    """Host training loop: the rebuild of ``Solver::Solve`` (SURVEY.md §3.1).

    Streams host batches onto the mesh, runs the jitted step, logs the
    separate loss terms (as the reference's solver display does), and
    snapshots via orbax every ``config.checkpoint_every`` steps.

    ``eval_iter`` + ``eval_every`` enable the Caffe solver test phase
    (``test_interval``/``test_iter``): every ``eval_every`` optimizer
    steps (and once at the end), average the eval-mode loss terms over
    ``eval_steps`` held-out batches and log them under ``val/``.

    ``steps_per_call > 1`` runs K optimizer steps per dispatch via
    ``lax.scan`` (see make_scan_train_step) — use on remote/tunneled
    devices where per-dispatch latency dominates.

    ``prefetch`` overlaps host batch prep + host->device transfer with
    the previous step's compute on a producer thread (the Caffe
    InternalThread analog; SURVEY.md §2b(ii)). Set 0 to disable.

    ``sigint_effect`` / ``sighup_effect`` ('stop'/'snapshot'/'none') are
    the Caffe ``caffe train --sigint_effect/--sighup_effect`` analogs —
    see :class:`SolverSignals`. The CLI passes Caffe's defaults
    (SIGINT stop, SIGHUP snapshot); the library default is 'none' so
    embedding applications keep their own signal handling.
    """
    if mesh is None:
        mesh = pmesh.make_mesh(1)
    if state is None:
        rng = jax.random.PRNGKey(config.seed)
        state = create_state(config, rng)
        if config.init_from:
            from depthvo_tpu.io import checkpoint as ckpt_io

            state = ckpt_io.restore_weights(config.init_from, state)
        if config.init_feat_from:
            from depthvo_tpu.io import checkpoint as ckpt_io

            state = ckpt_io.restore_param_subtree(
                config.init_feat_from, state, "feat"
            )
    state = jax.device_put(state, pmesh.replicated(mesh))
    if steps_per_call > 1:
        step_fn = make_scan_train_step(config, mesh)
    else:
        step_fn = make_train_step(config, mesh)
    eval_fn = None
    if eval_iter is not None and eval_every > 0:
        eval_fn = make_eval_step(config)

    ckpt_mgr = None
    if checkpoint_dir is not None:
        from depthvo_tpu.configs import base as config_io
        from depthvo_tpu.io import checkpoint as ckpt_io

        ckpt_mgr = ckpt_io.make_manager(checkpoint_dir)
        state = ckpt_io.maybe_restore(ckpt_mgr, state)
        # Persist the config so eval/infer can restore the exact model
        # (num_scales, fast_final_upsample, ...) without CLI re-specification.
        # Multi-process: every process calls orbax save/restore (they
        # coordinate internally), but the config.json write is a plain
        # file — coordinator-only, so N processes don't race on it.
        if jax.process_index() == 0:
            config_io.save_json(
                config, os.path.join(checkpoint_dir, "config.json")
            )

    # Prefetch: a producer thread decodes + device_puts the next batches
    # while the current step runs (overlaps tunnel upload with compute).
    # In scan mode the producer stacks K batches into one [K, ...] super-
    # batch per dispatch, so host batch prep overlaps the K on-device
    # steps instead of serializing between dispatches. The producer
    # follows the SAME chunk schedule as the loop below (a short tail
    # chunk of K' = num_steps - i batches), so ``--steps`` is exact:
    # scan length is the stacked batch's leading dim, and the tail
    # dispatch runs exactly the remaining optimizer steps (one extra
    # compile for the K' program — paid once, only on non-divisible
    # step counts).
    sharded_iter = None
    if prefetch > 0:
        from depthvo_tpu.data.pipeline import prefetch_to_device

        if steps_per_call == 1:
            sharded_iter = prefetch_to_device(
                data_iter, mesh, buffer_size=prefetch
            )
        else:

            def _stacked(it=data_iter, k=steps_per_call,
                         start=int(state.step), total=num_steps):
                j = start
                while j < total:
                    kk = min(k, total - j)
                    yield stack_batches([next(it) for _ in range(kk)])
                    j += kk

            sharded_iter = prefetch_to_device(
                _stacked(), mesh, buffer_size=prefetch,
                shard_fn=pmesh.shard_stacked_batch,
            )

    t0 = time.perf_counter()
    start_step = int(state.step)
    steady_t0 = None  # reset after step 1 so steps_per_sec excludes compile
    steady_base = start_step
    i = start_step
    signals = SolverSignals(sigint=sigint_effect, sighup=sighup_effect)
    with signals:
        while i < num_steps:
            action = signals.pending()
            if action is not None:
                if ckpt_mgr is None:
                    # The operator expects a snapshot ("snapshot" action,
                    # or the snapshot half of "stop") — dropping it
                    # silently while logging signal/... would fake
                    # success. Say so, loudly.
                    print(
                        f"signal {action}: NO checkpoint_dir — nothing "
                        "snapshotted (training state is not saved)",
                        flush=True,
                    )
                # Skip if the periodic snapshot just saved this exact step
                # (orbax refuses to overwrite an existing step).
                if ckpt_mgr is not None and ckpt_mgr.latest_step() != int(state.step):
                    from depthvo_tpu.io import checkpoint as ckpt_io

                    ckpt_io.save(ckpt_mgr, state)
                if log_fn is not None:
                    log_fn(i - 1, {f"signal/{action}": 1.0})
                if action == "stop":
                    break
            k = min(steps_per_call, num_steps - i)
            if steps_per_call > 1:
                # One [K, ...] super-batch per dispatch. The tail dispatch
                # stacks only the K' = num_steps - i remaining batches, so
                # ``--steps`` is exact like Caffe's max_iter: the scan
                # length is the leading dim, the K' program compiles once,
                # and no batch is ever repeated.
                if sharded_iter is not None:
                    batch = next(sharded_iter)
                else:
                    batch = pmesh.shard_stacked_batch(
                        stack_batches([next(data_iter) for _ in range(k)]),
                        mesh,
                    )
                state, metrics = step_fn(state, batch)
                i += k
            else:
                if sharded_iter is not None:
                    batch = next(sharded_iter)
                else:
                    batch = pmesh.shard_batch(next(data_iter), mesh)
                state, metrics = step_fn(state, batch)
                i += 1
            if steady_t0 is None:
                # First step included compilation; measure throughput from here.
                jax.block_until_ready(metrics["loss/total"])
                steady_t0 = time.perf_counter()
                steady_base = i
            last = i - 1
            if log_fn is not None and (
                last % config.log_every < (steps_per_call if steps_per_call > 1 else 1)
                or i >= num_steps
            ):
                metrics = jax.device_get(metrics)
                dt = time.perf_counter() - steady_t0
                metrics["steps_per_sec"] = (i - steady_base) / max(dt, 1e-9)
                log_fn(last, {k_: float(v) for k_, v in metrics.items()})
            if eval_fn is not None and (
                (last + 1) % eval_every < (steps_per_call if steps_per_call > 1 else 1)
                or i >= num_steps
            ):
                val = run_validation(eval_fn, state, eval_iter, eval_steps, mesh)
                if log_fn is not None:
                    log_fn(last, val)
            if ckpt_mgr is not None and (
                (last + 1) % config.checkpoint_every < (steps_per_call if steps_per_call > 1 else 1)
                or i >= num_steps
            ):
                from depthvo_tpu.io import checkpoint as ckpt_io

                ckpt_io.save(ckpt_mgr, state)
    if ckpt_mgr is not None:
        ckpt_mgr.wait_until_finished()
    return state
