"""Pallas TPU kernel for epipolar-horizontal (rectified-stereo) warping.

Why: inverse warping (SURVEY.md §2b(i), the reference's custom CUDA
layer) is gather-bound on TPU — XLA lowers image-wide gathers at ~30 ns
per index (scalar-unit bound), ~11 ms for a batch-4 608x160 RGB warp,
making the warp (not convolution) the hot op of training. Mosaic's
``tpu.dynamic_gather`` does an 8x128 *vector* gather per VPU op but only
along one axis within a single vreg, so an efficient kernel must
decompose the gather.

A general 2D bilinear gather does NOT decompose into per-axis vector
gathers: after a vertical gather keyed at output columns, a horizontal
gather evaluates the vertical coordinate at the wrong column
(src[v0[i, u0[i,j]], u0[i,j]] instead of src[v0[i,j], u0[i,j]]).
The decomposition is exact precisely when v(y, x) == y — the rectified
stereo case: the KITTI rig is rectified, so the stereo photometric loss
(present in ALL three training stages, at every pyramid scale) samples
along image rows only: u_src = u - fx*baseline/depth, v_src = v.

This module therefore provides:
* ``horizontal_warp_pallas(src, u)`` — exact bilinear sampling of each
  row at fractional column coordinates ``u`` (B, H, W), vectorized as
  lane-block dynamic_gathers (ceil(W/128)^2 select-combos per row-tile).
* ``stereo_warp(src, depth, fx_baseline)`` — the stereo inverse warp:
  disparity = fx*baseline/depth, u = x - disparity, and its validity
  mask, matching ``geometry.warp.inverse_warp`` with a pure-x-translation
  transform bit-for-bit on valid pixels (golden-tested).

Gradients: custom VJP — d/du and d/dsrc computed by the jnp reference
bilinear sample (XLA), so training semantics are unchanged; the kernel
accelerates forwards (eval/serving and the train forward pass).

The general (full 2D) warp stays on the XLA gather path
(``geometry.warp.inverse_warp``); a correct general kernel needs
per-output-row processing (future work — see the analysis above).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from depthvo_tpu.geometry import warp as ref_warp

TILE_ROWS = 8  # f32 sublane count
LANE = 128


def _hwarp_tile_kernel(src_ref, u_ref, out_ref):
    """One (batch-plane, row-tile) cell: resample 8 rows at fractional
    column coords. src_ref: (C, H, W); u_ref: (8, W); out_ref: (C, 8, W)."""
    C, H, W = src_ref.shape
    t = pl.program_id(1)

    u = u_ref[:]  # (8, W), pre-clamped to [0, W-1]
    u0f = jnp.floor(u)
    au = u - u0f
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    n_blocks = W // LANE

    for c in range(C):
        rows = src_ref[c, pl.ds(t * TILE_ROWS, TILE_ROWS), :]  # (8, W)
        # Right-neighbor plane for the u+1 tap: 1-lane left-rotate
        # (pltpu.roll requires non-negative shift; W-1 right == 1 left).
        rows_r = pltpu.roll(rows, shift=W - 1, axis=1)
        for ob in range(n_blocks):
            lo = ob * LANE
            idx = u0[:, lo : lo + LANE]
            acc = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
            for tb in range(n_blocks):
                tlo = tb * LANE
                sel = (idx >= tlo) & (idx < tlo + LANE)
                local = (idx - tlo) & (LANE - 1)
                s0 = jnp.take_along_axis(rows[:, tlo : tlo + LANE], local, axis=1)
                s1 = jnp.take_along_axis(rows_r[:, tlo : tlo + LANE], local, axis=1)
                val = (1.0 - au[:, lo : lo + LANE]) * s0 + au[:, lo : lo + LANE] * s1
                acc = jnp.where(sel, val, acc)
            out_ref[c, :, lo : lo + LANE] = acc


def _hsample(src_chw: jax.Array, u: jax.Array) -> jax.Array:
    """Kernel launch: src (B, C, H, W), u (B, H, W) -> (B, C, H, W)."""
    B, C, H, W = src_chw.shape
    assert H % TILE_ROWS == 0 and W % LANE == 0
    return pl.pallas_call(
        _hwarp_tile_kernel,
        grid=(B, H // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, H, W), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, W), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, C, TILE_ROWS, W), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
    )(src_chw, u)


def _hwarp_forward(src: jax.Array, u: jax.Array):
    """Exact bilinear row resampling. src (B,H,W,C); u (B,H,W) columns."""
    B, H, W, C = src.shape
    uc = jnp.clip(u, 0.0, W - 1)
    Wp = -(-W // LANE) * LANE
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    src_chw = jnp.transpose(src.astype(jnp.float32), (0, 3, 1, 2))
    if (Hp, Wp) != (H, W):
        src_chw = jnp.pad(src_chw, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
        uc = jnp.pad(uc, ((0, 0), (0, Hp - H), (0, Wp - W)))
    sampled = _hsample(src_chw, uc)[:, :, :H, :W]
    return jnp.transpose(sampled, (0, 2, 3, 1)).astype(src.dtype)


def _ref_hwarp(src, u):
    """jnp reference for the same op (used for the VJP and golden tests)."""
    B, H, W, _ = src.shape
    rows = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[None, :, None], u.shape
    )
    coords = jnp.stack([u, rows], axis=-1)
    sampled, _ = ref_warp.bilinear_sample(src, coords)
    return sampled


@jax.custom_vjp
def horizontal_warp_pallas(src, u):
    """Bilinear sampling of each image row at fractional columns ``u``.

    Equivalent to ``bilinear_sample(src, stack([u, row_index]))`` values;
    validity must be derived by the caller (see ``stereo_warp``).
    """
    return _hwarp_forward(src, u)


def _hwarp_fwd(src, u):
    return _hwarp_forward(src, u), (src, u)


def _hwarp_bwd(res, g):
    src, u = res
    _, vjp = jax.vjp(_ref_hwarp, src, u)
    return vjp(g)


horizontal_warp_pallas.defvjp(_hwarp_fwd, _hwarp_bwd)


def supported(src, depth=None) -> bool:
    """Kernel preconditions (any 4D NHWC image works — H/W are padded)."""
    return src.ndim == 4


def stereo_warp(src: jax.Array, depth: jax.Array, fx_baseline: jax.Array):
    """Rectified-stereo inverse warp via the Pallas kernel.

    Samples ``src`` (the other stereo view) at u' = x - fx*b/depth — the
    projection of the target pixel through depth and the pure-x-baseline
    transform. ``fx_baseline``: scalar or (B,) fx*baseline in pixels*m/m.
    Sign convention: positive warps the RIGHT image into the LEFT view
    (matching T_lr = [I | (-b, 0, 0)] in the loss graph).

    Returns (warped, valid) matching
    ``geometry.warp.inverse_warp(src, depth, T_lr, K)`` on valid pixels.
    """
    B, H, W, C = src.shape
    if depth.ndim == 4:
        depth = depth[..., 0]
    disparity = jnp.reshape(jnp.asarray(fx_baseline, jnp.float32), (-1, 1, 1)) / depth
    cols = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    u = cols - disparity
    u0 = jnp.floor(u)
    # Footprint semantics match geometry.warp.bilinear_sample: the 4-tap
    # footprint must lie inside the image, so the last row (v0+1 == H)
    # is invalid even though its vertical weight is zero.
    rows_ok = (
        jnp.arange(H, dtype=jnp.int32)[None, :, None] + 1 <= H - 1
    )
    valid = (u0 >= 0.0) & (u0 + 1.0 <= W - 1) & (depth > 0) & rows_ok
    warped = horizontal_warp_pallas(src, u)
    return warped, valid
