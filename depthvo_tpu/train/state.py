"""Train state: params for the three networks + BN stats + optimizer state.

The reference's analog is the Caffe ``Solver`` holding net params and
momentum history, snapshotted as ``.caffemodel``/``.solverstate``
(SURVEY.md §5 "Checkpoint / resume"). Here it is a single flax struct —
a pure pytree, so the whole step (including the update) jits and shards.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from depthvo_tpu.configs.base import ExperimentConfig
from depthvo_tpu.models import DepthNet, FeatNet, OdomNet


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any  # {'depth': ..., 'odom': ..., 'feat': ...}
    batch_stats: Any  # depth net BN running stats
    opt_state: Any

    def apply_gradients(self, *, grads, new_batch_stats, tx):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def lr_schedule(oc) -> Callable[[jax.Array], jax.Array]:
    """Decay schedule implementing the Caffe ``lr_policy`` family.

    Formula-exact analogs of ``solver.cpp::GetLearningRate`` (SURVEY
    §2b(ii) solver row; see the OptimConfig docstring for the mapping of
    stepsize/gamma/power/max_iter onto config fields). ``iter`` is the
    optimizer-update count — with ``iter_size > 1`` optax.MultiSteps
    applies the inner chain once per accumulated batch, so the schedule
    sees Caffe's solver-iteration count, not the micro-batch count.

    Every branch is a jnp expression of the traced step so the schedule
    jits inside the training step (no Python control flow on ``iter``).
    """
    base = oc.learning_rate
    gamma = oc.lr_decay_factor
    power = oc.lr_power
    stepsize = max(1, oc.lr_decay_steps)
    max_iter = max(1, oc.total_steps)
    policy = oc.lr_policy

    if policy == "fixed":
        return lambda i: jnp.full((), base, jnp.float32)
    if policy == "step":
        return lambda i: base * gamma ** jnp.floor(i / stepsize)
    if policy == "exp":
        return lambda i: base * gamma ** jnp.asarray(i, jnp.float32)
    if policy == "inv":
        return lambda i: base * (1.0 + gamma * i) ** (-power)
    if policy == "multistep":
        values = tuple(int(v) for v in oc.lr_step_values)
        if not values:
            raise ValueError(
                "lr_policy='multistep' needs non-empty lr_step_values"
            )

        def sched(i):
            passed = sum(jnp.asarray(i >= v, jnp.float32) for v in values)
            return base * gamma ** passed

        return sched
    if policy == "poly":
        return lambda i: base * jnp.maximum(0.0, 1.0 - i / max_iter) ** power
    if policy == "sigmoid":
        return lambda i: base / (1.0 + jnp.exp(-gamma * (i - stepsize)))
    raise ValueError(
        f"unknown lr_policy {policy!r} (expected fixed/step/exp/inv/"
        f"multistep/poly/sigmoid)"
    )


def make_optimizer(config: ExperimentConfig) -> optax.GradientTransformation:
    """Optimizer chain: warmup + a Caffe lr_policy schedule, clip, Adam;
    the feature net is frozen unless ``config.train_feat`` (reference: the
    feature extractor is fixed during depth/odom training, SURVEY.md §0)."""
    oc = config.optim
    decay = lr_schedule(oc)
    if oc.warmup_steps > 0:
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, oc.learning_rate, oc.warmup_steps),
                decay,
            ],
            [oc.warmup_steps],
        )
    else:
        # No warmup (the Caffe default): full lr from the very first
        # update — a joined 1-step ramp would silently zero it.
        schedule = decay
    # The Caffe solver family (sgd_solvers.cpp; SURVEY §2b(ii) solver
    # row). Caffe's `momentum` is beta1 here (sgd/nesterov momentum,
    # adadelta rho); `rms_decay`/`delta` keep their Caffe names. Adam
    # uses decoupled decay (adamw); the classic solvers get Caffe's L2
    # weight_decay added to the gradient before the update.
    l2 = (
        [optax.add_decayed_weights(oc.weight_decay)]
        if oc.weight_decay > 0.0
        else []
    )
    if oc.optimizer == "adam":
        base = [
            optax.adamw(
                schedule, b1=oc.beta1, b2=oc.beta2, eps=oc.delta,
                weight_decay=oc.weight_decay,
            )
        ]
    elif oc.optimizer == "sgd":
        base = l2 + [optax.sgd(schedule, momentum=oc.beta1)]
    elif oc.optimizer == "nesterov":
        base = l2 + [optax.sgd(schedule, momentum=oc.beta1, nesterov=True)]
    elif oc.optimizer == "adagrad":
        base = l2 + [optax.adagrad(schedule, eps=oc.delta)]
    elif oc.optimizer == "rmsprop":
        base = l2 + [optax.rmsprop(schedule, decay=oc.rms_decay, eps=oc.delta)]
    elif oc.optimizer == "adadelta":
        base = l2 + [optax.adadelta(schedule, rho=oc.beta1, eps=oc.delta)]
    else:
        raise ValueError(
            f"unknown optimizer {oc.optimizer!r} (expected adam/sgd/"
            f"nesterov/adagrad/rmsprop/adadelta)"
        )
    tx = optax.chain(optax.clip_by_global_norm(oc.grad_clip_norm), *base)

    def label_fn(params):
        return {
            k: jax.tree.map(
                lambda _: "freeze" if (k == "feat" and not config.train_feat) else "train",
                v,
            )
            for k, v in params.items()
        }

    tx = optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label_fn
    )
    if oc.iter_size > 1:
        # Caffe solver `iter_size`: average grads over k micro-batches,
        # update on the k-th (zero updates in between). Wrapping the
        # WHOLE chain keeps clip/schedule semantics on the accumulated
        # gradient, matching Caffe's normalize-then-update order.
        tx = optax.MultiSteps(
            tx, every_k_schedule=oc.iter_size
        ).gradient_transformation()
    return tx


def build_models(config: ExperimentConfig, depth_quant: str = "off"):
    """Instantiate the three network modules from config.

    ``depth_quant``: the DepthNet quantization mode — "off" for training
    (quantized training is out of scope; the reference trains f32),
    "calibrate"/"int8" for the w8a8 serving path (api.calibrate_int8).
    """
    mc = config.model
    dt = jnp.dtype(mc.compute_dtype)
    depth = DepthNet(
        num_scales=mc.num_scales,
        max_disp=mc.max_disp,
        min_disp=mc.min_disp,
        compute_dtype=dt,
        fast_final_upsample=mc.fast_final_upsample,
        subpixel_head=mc.subpixel_head,
        # Quantized serving runs the STANDARD finest stage: the s2d
        # rewrite declares the same parameters (interchangeable
        # checkpoints) but its structured kernels are a training-speed
        # lever, while QuantConv's per-channel scales are defined on the
        # standard conv shapes.
        s2d_finest=mc.s2d_finest and depth_quant == "off",
        remat=mc.remat,
        decoder_features=tuple(mc.decoder_features),
        quant_mode=depth_quant,
    )
    odom = OdomNet(compute_dtype=dt)
    feat = FeatNet(out_features=mc.feat_channels, compute_dtype=dt)
    return depth, odom, feat


def create_state(
    config: ExperimentConfig, rng: jax.Array, tx: optax.GradientTransformation | None = None
) -> TrainState:
    """Initialize params for the nets the stage uses and the optimizer state.

    Stage gating mirrors the reference prototxts: the stereo stage's graph
    contains no odometry/feature layers, so its checkpoint must not carry
    them either (staged --weights init loads only what exists).
    """
    depth, odom, feat = build_models(config)
    mc = config.model
    img = jnp.zeros((1, mc.height, mc.width, 3), jnp.float32)
    pair = jnp.zeros((1, mc.height, mc.width, 6), jnp.float32)
    k_d, k_o, k_f = jax.random.split(rng, 3)
    dvars = depth.init(k_d, img, train=False)
    params = {"depth": dvars["params"]}
    if config.use_temporal:
        params["odom"] = odom.init(k_o, pair, train=False)["params"]
    if config.use_feature:
        params["feat"] = feat.init(k_f, img, train=False)["params"]
    batch_stats = dvars.get("batch_stats", {})
    if tx is None:
        tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
