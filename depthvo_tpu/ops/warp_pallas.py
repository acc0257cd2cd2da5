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


# --------------------------------------------------------------------------
# Disparity-bounded stereo sampling with full Pallas forward AND backward.
#
# For the stereo loss, disparity = j - u is known to lie in [0, dmax]
# (dmax = fx*baseline * max inverse depth; the DepthNet bounds inverse
# depth, so dmax is a static config-derived constant). That bound buys:
#   * forward: each output lane-block only reads from itself and the
#     ceil(dmax/128) blocks to its left — 2 combos instead of 25.
#   * backward d/d_src WITHOUT scatter: source column x only receives
#     gradient from output columns j in [x, x + dmax + 1], so
#     d_src[x] = sum_s rolled(g * w, s) over s in [0, dmax+1] — rolls and
#     selects only, fully vectorized (XLA's scatter lowering is
#     scalar-bound on TPU, just like gather).
#   * backward d/d_u as a bounded gather: d_u = sum_c g_c * (s1_c - s0_c).
#
# Gradient semantics match the reference bilinear sampler on pixels whose
# true disparity is in [0, dmax]; out-of-range (invalid / behind-bound)
# taps drop their gradient — the losses mask those pixels, so their
# cotangent is zero anyway.
# --------------------------------------------------------------------------


def _bounded_taps(rows, rows_r, u0, ob, n_back, n_blocks):
    """Gather taps s0, s1 for output lane-block ``ob`` reading only blocks
    [ob - n_back, ob]. rows/rows_r: (8, W); u0: (8, W) int32."""
    lo = ob * LANE
    idx = u0[:, lo : lo + LANE]
    s0 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
    s1 = jnp.zeros((TILE_ROWS, LANE), jnp.float32)
    for tb in range(max(0, ob - n_back), ob + 1):
        tlo = tb * LANE
        sel = (idx >= tlo) & (idx < tlo + LANE)
        local = (idx - tlo) & (LANE - 1)
        g0 = jnp.take_along_axis(rows[:, tlo : tlo + LANE], local, axis=1)
        g1 = jnp.take_along_axis(rows_r[:, tlo : tlo + LANE], local, axis=1)
        s0 = jnp.where(sel, g0, s0)
        s1 = jnp.where(sel, g1, s1)
    return s0, s1


def _stereo_fwd_kernel(src_ref, u_ref, out_ref, *, n_back):
    C, H, W = src_ref.shape
    t = pl.program_id(1)
    u = u_ref[:]
    u0f = jnp.floor(u)
    au = u - u0f
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    n_blocks = W // LANE
    for c in range(C):
        rows = src_ref[c, pl.ds(t * TILE_ROWS, TILE_ROWS), :]
        rows_r = pltpu.roll(rows, shift=W - 1, axis=1)
        for ob in range(n_blocks):
            lo = ob * LANE
            s0, s1 = _bounded_taps(rows, rows_r, u0, ob, n_back, n_blocks)
            out_ref[c, :, lo : lo + LANE] = (
                (1.0 - au[:, lo : lo + LANE]) * s0 + au[:, lo : lo + LANE] * s1
            )


def _stereo_bwd_u_kernel(src_ref, g_ref, u_ref, out_ref, *, n_back):
    """d_u[i,j] = sum_c g[c,i,j] * (s1[c,i,j] - s0[c,i,j])."""
    C, H, W = src_ref.shape
    t = pl.program_id(1)
    u = u_ref[:]
    u0f = jnp.floor(u)
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    n_blocks = W // LANE
    acc = jnp.zeros((TILE_ROWS, W), jnp.float32)
    for c in range(C):
        rows = src_ref[c, pl.ds(t * TILE_ROWS, TILE_ROWS), :]
        rows_r = pltpu.roll(rows, shift=W - 1, axis=1)
        g = g_ref[c, :, :]
        parts = []
        for ob in range(n_blocks):
            lo = ob * LANE
            s0, s1 = _bounded_taps(rows, rows_r, u0, ob, n_back, n_blocks)
            parts.append(g[:, lo : lo + LANE] * (s1 - s0))
        acc = acc + jnp.concatenate(parts, axis=1)
    out_ref[:, :] = acc


def _stereo_bwd_src_kernel(g_ref, u_ref, out_ref, *, dmax):
    """Scatter-free d_src: d_src[c,i,x] = sum_{s=0}^{dmax+1} g[c,i,x+s] *
    ((1-au)[x+s] * [u0[x+s]==x] + au[x+s] * [u0[x+s]==x-1])."""
    C = g_ref.shape[0]
    W = g_ref.shape[2]
    u = u_ref[:]
    u0f = jnp.floor(u)
    au = u - u0f
    u0 = jnp.clip(u0f.astype(jnp.int32), 0, W - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, W), dimension=1)

    # Precompute channel-independent shift weights W_s (g is the only
    # channel-dependent factor).
    weights = []
    for s in range(dmax + 2):
        u0_s = pltpu.roll(u0, shift=(W - s) % W, axis=1)
        au_s = pltpu.roll(au, shift=(W - s) % W, axis=1)
        w = jnp.where(u0_s == cols, 1.0 - au_s, 0.0) + jnp.where(
            u0_s == cols - 1, au_s, 0.0
        )
        weights.append(w)

    for c in range(C):
        g = g_ref[c, :, :]
        acc = jnp.zeros((TILE_ROWS, W), jnp.float32)
        for s in range(dmax + 2):
            g_s = pltpu.roll(g, shift=(W - s) % W, axis=1)
            acc = acc + g_s * weights[s]
        out_ref[c, :, :] = acc


def _pad_hw(x, Hp, Wp, H, W):
    if (Hp, Wp) == (H, W):
        return x
    pads = [(0, 0)] * (x.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
    return jnp.pad(x, pads)


def _stereo_launch(kernel, out_shape, n_grid_b, num_tiles, specs, args):
    return pl.pallas_call(
        kernel,
        grid=(n_grid_b, num_tiles),
        in_specs=specs[0],
        out_specs=specs[1],
        out_shape=out_shape,
    )(*args)


def _stereo_sample_impl(src, u, dmax):
    """Forward kernel launch. src (B,H,W,C) f32; u (B,H,W) f32 clamped."""
    B, H, W, C = src.shape
    Wp = -(-W // LANE) * LANE
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    src_chw = _pad_hw(jnp.transpose(src.astype(jnp.float32), (0, 3, 1, 2)), Hp, Wp, H, W)
    up = _pad_hw(jnp.clip(u, 0.0, W - 1), Hp, Wp, H, W)
    n_back = -(-dmax // LANE)
    kernel = functools.partial(_stereo_fwd_kernel, n_back=n_back)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, Hp, Wp), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
    )(src_chw, up)
    return jnp.transpose(out[:, :, :H, :W], (0, 2, 3, 1)).astype(src.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _stereo_sample(src, u, dmax):
    return _stereo_sample_impl(src, u, dmax)


def _stereo_sample_fwd(src, u, dmax):
    return _stereo_sample_impl(src, u, dmax), (src, u)


def _stereo_sample_bwd(dmax, res, g):
    src, u = res
    B, H, W, C = src.shape
    Wp = -(-W // LANE) * LANE
    Hp = -(-H // TILE_ROWS) * TILE_ROWS
    n_back = -(-dmax // LANE)
    # g arrives masked by the loss; pad region cotangent is zero.
    g_chw = _pad_hw(jnp.transpose(g.astype(jnp.float32), (0, 3, 1, 2)), Hp, Wp, H, W)
    up = _pad_hw(jnp.clip(u, 0.0, W - 1), Hp, Wp, H, W)
    src_chw = _pad_hw(jnp.transpose(src.astype(jnp.float32), (0, 3, 1, 2)), Hp, Wp, H, W)

    d_u = pl.pallas_call(
        functools.partial(_stereo_bwd_u_kernel, n_back=n_back),
        grid=(B, Hp // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, Hp, Wp), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
    )(src_chw, g_chw, up)[:, :H, :W]

    d_src = pl.pallas_call(
        functools.partial(_stereo_bwd_src_kernel, dmax=dmax),
        grid=(B, Hp // TILE_ROWS),
        in_specs=[
            pl.BlockSpec((None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, TILE_ROWS, Wp), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, C, TILE_ROWS, Wp), lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
    )(g_chw, up)
    d_src = jnp.transpose(d_src[:, :, :H, :W], (0, 2, 3, 1)).astype(src.dtype)
    return d_src, d_u


_stereo_sample.defvjp(_stereo_sample_fwd, _stereo_sample_bwd)


def stereo_warp(
    src: jax.Array, depth: jax.Array, fx_baseline: jax.Array, dmax: int = 128
):
    """Rectified-stereo inverse warp via the Pallas kernels.

    Samples ``src`` (the other stereo view) at u' = x - fx*b/depth — the
    projection of the target pixel through depth and the pure-x-baseline
    transform. ``fx_baseline``: scalar or (B,) fx*baseline in pixels*m/m.
    Sign convention: positive warps the RIGHT image into the LEFT view
    (matching T_lr = [I | (-b, 0, 0)] in the loss graph).

    ``dmax``: static disparity bound in pixels (fx*b * the network's max
    inverse depth; 128 comfortably covers KITTI at 608 width). Pixels
    with larger disparity are masked invalid, and their gradient taps are
    dropped (the losses zero their cotangent anyway).

    Returns (warped, valid) matching
    ``geometry.warp.inverse_warp(src, depth, T_lr, K)`` on valid pixels.
    Forward AND backward run as Pallas kernels (backward d_src is
    scatter-free shift-select; see the block comment above).
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
    valid = (
        (u0 >= 0.0)
        & (u0 + 1.0 <= W - 1)
        & (depth > 0)
        & rows_ok
        & (disparity >= 0)
        & (disparity <= dmax)
    )
    warped = _stereo_sample(src, u, dmax)
    return warped, valid
