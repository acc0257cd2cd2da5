"""Inverse-depth smoothness regularizer.

Reference parity: SURVEY.md §0 "Inverse-depth smoothness regularizer."
The paper penalizes spatial gradients of the predicted inverse depth;
the edge-aware variant (gradients down-weighted at image edges) is the
standard modern form and is exposed via ``edge_aware`` (default True —
SURVEY.md §7 notes the exact reference form is [L]-confidence; the paper's
stated form is matched with ``edge_aware=False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grad_x(z: jax.Array) -> jax.Array:
    return z[:, :, 1:, :] - z[:, :, :-1, :]


def _grad_y(z: jax.Array) -> jax.Array:
    return z[:, 1:, :, :] - z[:, :-1, :, :]


def smoothness_loss(
    disp: jax.Array,
    image: jax.Array | None = None,
    edge_aware: bool = True,
    normalize: bool = True,
    image_layout: str = "nhwc",
) -> jax.Array:
    """Smoothness penalty on an inverse-depth map.

    Args:
      disp: (B, H, W, 1) inverse depth.
      image: the corresponding RGB frame (required when ``edge_aware``);
        gradients are down-weighted by exp(-|dI|). (B, H, W, 3) for
        ``image_layout="nhwc"``, (B, 3, H, W) for ``"chw"`` (the train
        loss graph keeps its image pyramid in the warp kernels' CHW
        layout; the penalty is identical either way).
      edge_aware: weight disparity gradients by image-gradient magnitude.
      normalize: divide disp by its per-image mean first (prevents the
        regularizer from simply shrinking the depth scale).

    Returns: scalar mean penalty.
    """
    d = disp.astype(jnp.float32)
    if normalize:
        mean = jnp.mean(d, axis=(1, 2, 3), keepdims=True) + 1e-7
        d = d / mean
    dx, dy = jnp.abs(_grad_x(d)), jnp.abs(_grad_y(d))
    if edge_aware:
        if image is None:
            raise ValueError("edge_aware smoothness requires the image")
        img = image.astype(jnp.float32)
        if image_layout == "chw":
            # Channel mean over axis 1; spatial grads on trailing dims.
            gx = jnp.abs(img[:, :, :, 1:] - img[:, :, :, :-1])
            gy = jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :])
            wx = jnp.exp(-jnp.mean(gx, axis=1))[..., None]
            wy = jnp.exp(-jnp.mean(gy, axis=1))[..., None]
        else:
            wx = jnp.exp(-jnp.mean(jnp.abs(_grad_x(img)), axis=-1, keepdims=True))
            wy = jnp.exp(-jnp.mean(jnp.abs(_grad_y(img)), axis=-1, keepdims=True))
        dx = dx * wx
        dy = dy * wy
    return jnp.mean(dx) + jnp.mean(dy)
