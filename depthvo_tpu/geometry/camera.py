"""Pinhole camera model: backprojection and projection in pure JAX.

TPU-native replacement for the reference's 3D-transform and pinhole
projection Caffe layers (SURVEY.md §2b(i): transform/grid layer and
``pin_hole_cam_proj``-style layer, UNVERIFIED paths). The math:

* backproject:  X = D(u,v) * K^{-1} [u, v, 1]^T     (per pixel)
* transform:    X' = R X + t
* project:      [u', v'] = pi(K X'),  pi([x,y,z]) = [x/z, y/z]

Layout: images are NHWC (TPU-native); intrinsics are (..., 3, 3) or the
compact (fx, fy, cx, cy) 4-vector. All geometry in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# The geometry core is precision-critical: this JAX build defaults matmuls
# to bf16-class precision (even on CPU), which injects ~1e-3 relative error
# into K^{-1} chains — 0.1+ px of warp error. Pin full f32 MXU passes.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

# Minimum depth used to guard the projective division; pixels at or behind
# the camera plane are flagged invalid rather than producing inf/NaN.
MIN_DEPTH = 1e-3


def intrinsics_matrix(fx, fy, cx, cy) -> jax.Array:
    """Build a (3, 3) intrinsics matrix from scalars (or batched arrays)."""
    fx, fy, cx, cy = (jnp.asarray(a, jnp.float32) for a in (fx, fy, cx, cy))
    batch = jnp.broadcast_shapes(fx.shape, fy.shape, cx.shape, cy.shape)
    z = jnp.zeros(batch, jnp.float32)
    o = jnp.ones(batch, jnp.float32)
    fx, fy, cx, cy = (jnp.broadcast_to(a, batch) for a in (fx, fy, cx, cy))
    row0 = jnp.stack([fx, z, cx], axis=-1)
    row1 = jnp.stack([z, fy, cy], axis=-1)
    row2 = jnp.stack([z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def scale_intrinsics(K: jax.Array, sx: float, sy: float) -> jax.Array:
    """Rescale intrinsics for an image resized by (sx, sy) = (W'/W, H'/H).

    Mirrors the reference's data-prep step of scaling K to the resized
    608x160 resolution (SURVEY.md §3.4).

    Convention: this module puts pixel CENTERS at integer coordinates
    (see :func:`pixel_grid`), while the resizes feeding the loss pyramid
    (``jax.image.resize``/PIL) use half-pixel centers — a point at pixel
    ``u`` lands at ``sx*(u+0.5)-0.5`` in the resized image, NOT ``sx*u``.
    The principal point therefore picks up a ``(s-1)/2`` offset on top of
    the naive row scaling; omitting it biases every coarse pyramid scale
    by up to ~0.44 px at 1/8 (the temporal warp's rotation flow depends
    on the principal point, so the bias does not cancel there).
    """
    K = jnp.asarray(K, jnp.float32)
    scale = jnp.array([[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], jnp.float32)
    shift = jnp.array(
        [[0.0, 0.0, (sx - 1.0) / 2.0],
         [0.0, 0.0, (sy - 1.0) / 2.0],
         [0.0, 0.0, 0.0]],
        jnp.float32,
    )
    return K * scale + shift


def pixel_grid(height: int, width: int) -> jax.Array:
    """Homogeneous pixel coordinate grid, shape (H, W, 3): (u, v, 1).

    Pixel centers at integer coordinates (Caffe/OpenCV convention: the
    center of the top-left pixel is (0, 0)).
    """
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # each (H, W)
    ones = jnp.ones_like(uu)
    return jnp.stack([uu, vv, ones], axis=-1)


def backproject(depth: jax.Array, K: jax.Array) -> jax.Array:
    """Lift a depth map to a 3D point cloud in camera coordinates.

    Args:
      depth: (..., H, W) or (..., H, W, 1) positive z-depth.
      K: (..., 3, 3) intrinsics (broadcast over batch).

    Returns:
      (..., H, W, 3) points X = depth * K^{-1} [u, v, 1]^T.
    """
    depth = jnp.asarray(depth, jnp.float32)
    if depth.shape[-1] == 1 and depth.ndim >= 3:
        depth = depth[..., 0]
    H, W = depth.shape[-2:]
    grid = pixel_grid(H, W)  # (H, W, 3)
    K_inv = jnp.linalg.inv(jnp.asarray(K, jnp.float32))
    rays = _einsum("...ij,hwj->...hwi", K_inv, grid)  # (..., H, W, 3)
    return rays * depth[..., None]


def transform_points(points: jax.Array, T: jax.Array) -> jax.Array:
    """Apply a rigid transform to points: X' = R X + t.

    Args:
      points: (..., H, W, 3).
      T: (..., 4, 4) transform (broadcast over batch).
    """
    points = jnp.asarray(points, jnp.float32)
    T = jnp.asarray(T, jnp.float32)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return (
        _einsum("...ij,...hwj->...hwi", R, points)
        + t[..., None, None, :]
    )


def project(points: jax.Array, K: jax.Array):
    """Project camera-frame points through K to pixel coordinates.

    Args:
      points: (..., H, W, 3).
      K: (..., 3, 3).

    Returns:
      coords: (..., H, W, 2) pixel (u, v); where z <= MIN_DEPTH the
        coordinates are clamped via a safe divide (garbage but finite —
        callers must apply the mask).
      valid: (..., H, W) bool, True where z > MIN_DEPTH.
    """
    points = jnp.asarray(points, jnp.float32)
    proj = _einsum("...ij,...hwj->...hwi", jnp.asarray(K, jnp.float32), points)
    z = proj[..., 2]
    valid = z > MIN_DEPTH
    z_safe = jnp.where(valid, z, 1.0)
    coords = proj[..., :2] / z_safe[..., None]
    return coords, valid
