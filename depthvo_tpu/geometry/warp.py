"""Differentiable inverse warping (bilinear sampling) in pure JAX.

TPU-native replacement for the reference's inverse-warping Caffe layer
(SURVEY.md §2b(i): ``caffe/src/caffe/layers/inverse_warping_layer.{cpp,cu}``
(UNVERIFIED)): given a source image, a depth map for the *target* view, a
relative transform T (target camera -> source camera) and intrinsics K,
synthesize the target view by sampling the source at the reprojected
coordinates. Gradients flow to the sampling coordinates (hence to depth and
pose) and to the source pixels — JAX AD provides both; the hand-written
CUDA backward of the reference is unnecessary.

Out-of-bounds semantics (SURVEY.md §7 "hard parts" — must be consistent
everywhere): samples whose 4-tap bilinear footprint falls fully inside the
image are valid; coordinates are clamped to the image for the actual
gather, and a ``valid`` mask (footprint-inside AND positive source depth)
is returned for the loss to consume. The warped values outside the mask
are whatever the clamped gather produced — callers MUST mask.

This module is the correctness reference for the fused Pallas kernel in
``depthvo_tpu.ops.warp_pallas`` (same signature, golden-tested against it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthvo_tpu.geometry import camera as _camera


def warp_coords(depth: jax.Array, T: jax.Array, K: jax.Array):
    """Compute source-image sampling coordinates for inverse warping.

    Fused chain: backproject (target depth) -> rigid transform ->
    pinhole project.

    Args:
      depth: (B, H, W) or (B, H, W, 1) target-view z-depth.
      T: (B, 4, 4) transform taking target-camera points to source-camera.
      K: (B, 3, 3) or (3, 3) intrinsics (shared between the two views).

    Returns:
      coords: (B, H, W, 2) pixel (u, v) in the source image.
      valid: (B, H, W) bool — source depth positive.
    """
    points = _camera.backproject(depth, K)
    points_src = _camera.transform_points(points, T)
    return _camera.project(points_src, K)


def bilinear_sample(img: jax.Array, coords: jax.Array):
    """Differentiable bilinear sampling at fractional pixel coordinates.

    Args:
      img: (B, H, W, C) source image/feature map (any float dtype; sampling
        arithmetic runs in the input dtype, weights in float32).
      coords: (B, Ho, Wo, 2) pixel (u, v) sample locations (float32); the
        output grid need not match the source resolution.

    Returns:
      sampled: (B, Ho, Wo, C) values gathered with bilinear weights.
      in_bounds: (B, Ho, Wo) bool — True where the full 4-tap footprint lies
        inside the image (the reference layer's validity-mask semantics).
    """
    B, H, W, C = img.shape
    coords = jnp.asarray(coords, jnp.float32)
    Ho, Wo = coords.shape[1:3]
    u, v = coords[..., 0], coords[..., 1]

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    # Footprint fully inside: floor >= 0 and floor + 1 <= W-1/H-1.
    in_bounds = (
        (u0 >= 0.0) & (u0 + 1.0 <= W - 1) & (v0 >= 0.0) & (v0 + 1.0 <= H - 1)
    )

    au = u - u0  # fractional parts, in [0, 1) for in-bounds samples
    av = v - v0

    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    u1i = jnp.clip(u0i + 1, 0, W - 1)
    v1i = jnp.clip(v0i + 1, 0, H - 1)

    # Flatten spatial dims: one gather per tap over a (B, H*W, C) view keeps
    # XLA's gather lowering simple (single collapsed dim, good on TPU).
    flat = img.reshape(B, H * W, C)

    def tap(vi, ui):
        idx = vi * W + ui  # (B, Ho, Wo)
        return jnp.take_along_axis(
            flat, idx.reshape(B, Ho * Wo, 1), axis=1
        ).reshape(B, Ho, Wo, C)

    w00 = ((1.0 - au) * (1.0 - av))[..., None]
    w01 = (au * (1.0 - av))[..., None]
    w10 = ((1.0 - au) * av)[..., None]
    w11 = (au * av)[..., None]

    sampled = (
        w00.astype(img.dtype) * tap(v0i, u0i)
        + w01.astype(img.dtype) * tap(v0i, u1i)
        + w10.astype(img.dtype) * tap(v1i, u0i)
        + w11.astype(img.dtype) * tap(v1i, u1i)
    )
    return sampled, in_bounds


def inverse_warp(src: jax.Array, depth: jax.Array, T: jax.Array, K: jax.Array):
    """Synthesize the target view by inverse-warping the source image.

    Args:
      src: (B, H, W, C) source view (RGB or dense features).
      depth: (B, H, W) or (B, H, W, 1) target-view z-depth.
      T: (B, 4, 4) target-cam -> source-cam transform.
      K: (B, 3, 3) or (3, 3) shared intrinsics.

    Returns:
      warped: (B, H, W, C) source sampled at reprojected coordinates.
      valid: (B, H, W) bool — in-image footprint AND in-front-of-camera.
    """
    coords, front = warp_coords(depth, T, K)
    warped, in_bounds = bilinear_sample(src, coords)
    return warped, in_bounds & front
