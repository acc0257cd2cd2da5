"""Photometric reconstruction losses (stereo and temporal).

Reference parity: the reference computes an L1 photometric error between
the inverse-warped source view and the target view, restricted to valid
warp locations (SURVEY.md §0: "L1 photometric error"; implemented there
with AbsVal + eltwise + reduction Caffe layers, SURVEY.md §2b(ii)).

The warp itself lives in ``depthvo_tpu.geometry.warp`` / the fused Pallas
kernel; this module only scores the result. An optional SSIM term is
provided as a capability extension (off by default = reference-faithful).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean absolute error over valid pixels.

    Args:
      pred, target: (B, H, W, C).
      mask: (B, H, W) bool or float validity.

    Returns: scalar — sum(|pred-target| * mask) / (sum(mask) * C + eps).
    Normalizing by the valid count (not B*H*W) keeps the loss scale
    independent of how much of the warp footprint lands in-image.
    """
    m = mask.astype(jnp.float32)[..., None]
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)) * m
    denom = jnp.sum(m) * pred.shape[-1] + 1e-6
    return jnp.sum(err) / denom


def ssim(x: jax.Array, y: jax.Array, c1: float = 0.01**2, c2: float = 0.03**2):
    """Per-pixel SSIM over 3x3 mean-pooled neighborhoods (monodepth-style).

    Capability extension beyond the reference (which is pure L1). Returns
    (B, H-2, W-2, C) similarity in [0, 1]-ish range.
    """

    def pool(z):
        return jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
        ) / 9.0

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x * x) - mu_x * mu_x
    sig_y = pool(y * y) - mu_y * mu_y
    sig_xy = pool(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sig_x + sig_y + c2)
    return num / den


def masked_l1_chw(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """``masked_l1`` over (B, C, H, W) tensors with a (B, H, W) mask.

    The training loss graph keeps its photometric region in the warp
    kernels' CHW layout (see ops.frozen_warp_chw); same math, channel
    axis 1.
    """
    m = mask.astype(jnp.float32)[:, None]
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)) * m
    denom = jnp.sum(m) * pred.shape[1] + 1e-6
    return jnp.sum(err) / denom


def ssim_chw(x: jax.Array, y: jax.Array, c1: float = 0.01**2, c2: float = 0.03**2):
    """``ssim`` over (B, C, H, W) tensors (3x3 windows on the trailing
    spatial dims). Returns (B, C, H-2, W-2)."""

    def pool(z):
        return jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 1, 3, 3), (1, 1, 1, 1), "VALID"
        ) / 9.0

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu_x, mu_y = pool(x), pool(y)
    sig_x = pool(x * x) - mu_x * mu_x
    sig_y = pool(y * y) - mu_y * mu_y
    sig_xy = pool(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    den = (mu_x * mu_x + mu_y * mu_y + c1) * (sig_x + sig_y + c2)
    return num / den


def photometric_loss_chw(
    warped: jax.Array,
    target: jax.Array,
    valid: jax.Array,
    ssim_weight: float = 0.0,
) -> jax.Array:
    """``photometric_loss`` over (B, C, H, W) tensors with a (B, H, W)
    validity mask — identical masking semantics (see the NHWC version's
    comment for why the mask is applied BEFORE pooling and eroded)."""
    l1 = masked_l1_chw(warped, target, valid)
    if ssim_weight == 0.0:
        return l1
    mv = valid.astype(jnp.float32)[:, None]
    s = ssim_chw(warped * mv, target * mv)
    m = jax.lax.reduce_window(
        mv, 1.0, jax.lax.min, (1, 1, 3, 3), (1, 1, 1, 1), "VALID"
    )
    dssim = jnp.sum((1.0 - s) * 0.5 * m) / (jnp.sum(m) * s.shape[1] + 1e-6)
    return (1.0 - ssim_weight) * l1 + ssim_weight * dssim


def photometric_loss(
    warped: jax.Array,
    target: jax.Array,
    valid: jax.Array,
    ssim_weight: float = 0.0,
) -> jax.Array:
    """Masked L1 (+ optional SSIM mix) between warped source and target.

    ``ssim_weight=0`` reproduces the reference's pure-L1 objective;
    ``ssim_weight=a`` scores ``(1-a)*L1 + a*(1-SSIM)/2``.
    """
    l1 = masked_l1(warped, target, valid)
    if ssim_weight == 0.0:
        return l1
    # Mask BEFORE pooling, and score only fully-valid 3x3 windows:
    # invalid warp outputs are backend-dependent garbage by contract
    # (clamped gathers on the XLA path, zeros on the Pallas path — see
    # ops/warp_pallas.py "callers MUST mask"), so (a) they must not leak
    # into neighboring windows' statistics and (b) the loss must emit a
    # ZERO cotangent at them (the kernels drop those gradient taps).
    # Multiplying by the mask up front guarantees both; eroding the mask
    # to full-support windows keeps the masked zeros from biasing the
    # windows that ARE scored.
    mv = valid.astype(jnp.float32)[..., None]
    s = ssim(warped * mv, target * mv)
    m = jax.lax.reduce_window(
        mv, 1.0, jax.lax.min, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    )
    dssim = jnp.sum((1.0 - s) * 0.5 * m) / (jnp.sum(m) * s.shape[-1] + 1e-6)
    return (1.0 - ssim_weight) * l1 + ssim_weight * dssim
