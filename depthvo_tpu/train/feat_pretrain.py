"""Self-supervised pretraining for the dense feature extractor.

Reference parity note (SURVEY.md §0 item 3): the reference's best feature
extractor was trained *externally* on NYUv2 (Weerasekera et al.) and
shipped as fixed weights; the repo itself does not contain its training.
The rebuild closes that gap with an in-framework option: a dense
contrastive objective that makes features discriminative per-pixel while
invariant to photometric nuisance — the property the feature
reconstruction loss needs.

Objective: for two photometrically-augmented views of the same frame,
features at the same pixel should agree (positive) and differ from
features at other pixels (negatives) — InfoNCE over per-pixel feature
vectors, sampled on a sparse grid to keep the (P, P) similarity matrix
MXU-sized.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from depthvo_tpu.configs.base import ExperimentConfig
from depthvo_tpu.models import FeatNet
from depthvo_tpu.utils.images import to_unit


def photometric_augment(rng: jax.Array, images: jax.Array) -> jax.Array:
    """Brightness/contrast/channel jitter (geometry-preserving — the
    objective needs pixel correspondence to stay the identity)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    b = jax.random.uniform(k1, (images.shape[0], 1, 1, 1), minval=-0.2, maxval=0.2)
    c = jax.random.uniform(k2, (images.shape[0], 1, 1, 1), minval=0.8, maxval=1.2)
    ch = jax.random.uniform(k3, (images.shape[0], 1, 1, 3), minval=0.9, maxval=1.1)
    noise = 0.02 * jax.random.normal(k4, images.shape)
    return jnp.clip((images * c + b) * ch + noise, -1.0, 1.0)


def dense_infonce_loss(
    feat_a: jax.Array, feat_b: jax.Array, temperature: float = 0.1, grid: int = 8
) -> jax.Array:
    """InfoNCE between same-pixel features of two augmented views.

    Samples every ``grid``-th pixel; features are already L2-normalized by
    FeatNet, so similarity = dot product. The (P, P) logits matmul is the
    MXU-friendly core.
    """
    a = feat_a[:, ::grid, ::grid, :]
    b = feat_b[:, ::grid, ::grid, :]
    B = a.shape[0]
    P = a.shape[1] * a.shape[2]
    a = a.reshape(B, P, -1)
    b = b.reshape(B, P, -1)
    logits = jnp.einsum(
        "bpc,bqc->bpq", a, b, precision=jax.lax.Precision.HIGHEST
    ) / temperature
    labels = jnp.arange(P)[None, :].repeat(B, axis=0)
    loss_ab = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_ba = optax.softmax_cross_entropy_with_integer_labels(
        jnp.swapaxes(logits, 1, 2), labels
    )
    return jnp.mean(loss_ab + loss_ba) * 0.5


def make_pretrain_step(model: FeatNet, tx: optax.GradientTransformation):
    """Jitted contrastive pretrain step: (params, opt_state, rng, images)."""

    @jax.jit
    def step(params, opt_state, rng, images):
        rng, k_a, k_b = jax.random.split(rng, 3)

        def loss_fn(p):
            fa = model.apply({"params": p}, photometric_augment(k_a, images))
            fb = model.apply({"params": p}, photometric_augment(k_b, images))
            return dense_infonce_loss(fa, fb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, rng, loss

    return step


def pretrain_features(
    config: ExperimentConfig,
    data_iter: Iterator[Dict[str, np.ndarray]],
    num_steps: int,
    learning_rate: float = 1e-4,
    log_fn: Callable[[int, float], None] | None = None,
):
    """Train FeatNet contrastively over frames from ``data_iter`` (any
    iterator yielding dicts with 'image_t'). Returns trained feat params,
    pluggable into the full_feat stage via TrainState.params['feat']."""
    model = FeatNet(
        out_features=config.model.feat_channels,
        compute_dtype=jnp.dtype(config.model.compute_dtype),
    )
    rng = jax.random.PRNGKey(config.seed)
    mc = config.model
    init_img = jnp.zeros((1, mc.height, mc.width, 3), jnp.float32)
    params = model.init(rng, init_img)["params"]
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    step = make_pretrain_step(model, tx)
    for i in range(num_steps):
        batch = next(data_iter)
        images = to_unit(jnp.asarray(batch["image_t"]))
        params, opt_state, rng, loss = step(params, opt_state, rng, images)
        if log_fn is not None:
            log_fn(i, float(loss))
    return params
