"""se(3) Lie algebra / SE(3) Lie group operations in pure JAX.

TPU-native replacement for the reference's SE3 generator Caffe layer
(SURVEY.md §2b(i): ``caffe/src/caffe/layers/se3_generator_layer.{cpp,cu}``
(UNVERIFIED) — se(3) 6-vector -> 4x4 transform via the exponential map with
an analytic backward). Here the backward comes for free from JAX AD; the
only numerics care needed is Taylor-guarding the ``sin(t)/t``-style factors
near ``||w|| -> 0`` so both the primal and its derivatives stay finite
(SURVEY.md §7 "hard parts": exp-map numerics near ||w||->0 under jit).

Conventions
-----------
* A twist ``xi`` is a 6-vector ``[v, w]``: translation part first
  (``v = xi[:3]``), rotation part second (``w = xi[3:]``), matching the
  common SfM-learner / gvnn ordering for pose-CNN outputs.
* ``exp(xi)`` returns a 4x4 homogeneous matrix ``T = [[R, Vv], [0, 1]]``
  with ``R = exp_so3(w)`` and ``V`` the left Jacobian of SO(3).
* All functions are shape-polymorphic over leading batch dims via
  vectorized closed forms (no vmap needed, but vmap-safe).
* Everything is computed in float32 regardless of input dtype.

Taylor guards: for ``t = ||w||`` below ``_EPS`` we switch to 2nd-order
Taylor expansions of ``sin(t)/t``, ``(1-cos t)/t^2``, ``(t - sin t)/t^3``.
The switch uses `jnp.where` on BOTH branches' *safe* inputs (the classic
double-where trick) so gradients never see 0/0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Precision-critical core: pin full-f32 matmuls (this JAX build defaults to
# bf16-class matmul precision, which breaks exp/log round trips).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


def _matmul(a, b):
    return _einsum("...ij,...jk->...ik", a, b)


_EPS = 1e-4  # ||w|| below this uses the Taylor branch (f32-safe)


def _f32(x):
    return jnp.asarray(x, dtype=jnp.float32)


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    w = _f32(w)
    zeros = jnp.zeros_like(w[..., 0])
    row0 = jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1)
    row1 = jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1)
    row2 = jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def vee(W: jax.Array) -> jax.Array:
    """Inverse of :func:`hat`: (..., 3, 3) -> (..., 3)."""
    W = _f32(W)
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sin_t_over_t(t2: jax.Array) -> jax.Array:
    """sin(t)/t with t2 = t^2, Taylor-guarded near 0."""
    small = t2 < _EPS**2
    t2_safe = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2_safe)
    exact = jnp.sin(t) / t
    taylor = 1.0 - t2 / 6.0 + t2 * t2 / 120.0
    return jnp.where(small, taylor, exact)


def _one_minus_cos_over_t2(t2: jax.Array) -> jax.Array:
    """(1 - cos t)/t^2 with t2 = t^2, Taylor-guarded near 0."""
    small = t2 < _EPS**2
    t2_safe = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2_safe)
    exact = (1.0 - jnp.cos(t)) / t2_safe
    taylor = 0.5 - t2 / 24.0 + t2 * t2 / 720.0
    return jnp.where(small, taylor, exact)


def _t_minus_sin_over_t3(t2: jax.Array) -> jax.Array:
    """(t - sin t)/t^3 with t2 = t^2, Taylor-guarded near 0."""
    small = t2 < _EPS**2
    t2_safe = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2_safe)
    exact = (t - jnp.sin(t)) / (t2_safe * t)
    taylor = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0
    return jnp.where(small, taylor, exact)


def exp_so3(w: jax.Array) -> jax.Array:
    """SO(3) exponential map (Rodrigues): (..., 3) -> (..., 3, 3)."""
    w = _f32(w)
    t2 = jnp.sum(w * w, axis=-1)
    A = _sin_t_over_t(t2)[..., None, None]
    B = _one_minus_cos_over_t2(t2)[..., None, None]
    W = hat(w)
    W2 = _matmul(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), W.shape)
    return eye + A * W + B * W2


def left_jacobian_so3(w: jax.Array) -> jax.Array:
    """Left Jacobian V of SO(3): exp(xi) translation is V @ v."""
    w = _f32(w)
    t2 = jnp.sum(w * w, axis=-1)
    B = _one_minus_cos_over_t2(t2)[..., None, None]
    C = _t_minus_sin_over_t3(t2)[..., None, None]
    W = hat(w)
    W2 = _matmul(W, W)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), W.shape)
    return eye + B * W + C * W2


def exp(xi: jax.Array) -> jax.Array:
    """SE(3) exponential map: twist (..., 6) [v, w] -> transform (..., 4, 4).

    T = [[R, V v], [0, 1]] with R = exp_so3(w), V = left_jacobian_so3(w).
    """
    xi = _f32(xi)
    v, w = xi[..., :3], xi[..., 3:]
    R = exp_so3(w)
    V = left_jacobian_so3(w)
    t = _einsum("...ij,...j->...i", V, v)
    return _rt_to_mat(R, t)


def _rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous matrix."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def log_so3(R: jax.Array) -> jax.Array:
    """SO(3) logarithm: (..., 3, 3) -> (..., 3). Valid for angle < pi."""
    R = _f32(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    t = jnp.arccos(cos_t)
    t2 = t * t
    # w_hat = t / (2 sin t) * (R - R^T); guard t/(2 sin t) near 0.
    small = t2 < _EPS**2
    t_safe = jnp.where(small, 1.0, t)
    factor_exact = t_safe / (2.0 * jnp.sin(t_safe))
    factor_taylor = 0.5 + t2 / 12.0 + 7.0 * t2 * t2 / 720.0
    factor = jnp.where(small, factor_taylor, factor_exact)
    W = (R - jnp.swapaxes(R, -1, -2)) * factor[..., None, None]
    return vee(W)


def log(T: jax.Array) -> jax.Array:
    """SE(3) logarithm: (..., 4, 4) -> twist (..., 6) [v, w]."""
    T = _f32(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = log_so3(R)
    V = left_jacobian_so3(w)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)


def compose(T_a: jax.Array, T_b: jax.Array) -> jax.Array:
    """Compose two transforms: returns T_a @ T_b."""
    return _matmul(_f32(T_a), _f32(T_b))


def inverse(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse: [[R^T, -R^T t], [0, 1]]."""
    T = _f32(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -_einsum("...ij,...j->...i", Rt, t))
