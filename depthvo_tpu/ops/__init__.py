"""Hot-path ops: warp kernels and dispatch.

The inverse warp is the framework's one custom hot op (SURVEY.md §2b(i):
backproject -> rigid transform -> project -> bilinear sample, shared by
the photometric and feature-reconstruction losses). Two paths:

* ``stereo_warp``  — rectified-stereo (epipolar-horizontal) warping with
  full custom-VJP Pallas kernels (fwd + scatter-free bwd; ~9x XLA
  fwd+bwd, bit-exact). Used by the stereo loss at every scale.
* ``frozen_warp``  — general 2D warping of a constant (non-
  differentiated) source via the per-source-row candidate kernel
  (gather-only backward; ~3x XLA fwd+bwd). Used by the temporal and
  frozen-feature losses.
* ``fused_warp``   — general 2D warping with a differentiated source;
  XLA path (scatter-shaped d_src can't be vectorized on TPU without a
  displacement bound — see warp_pallas module doc).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthvo_tpu.geometry import warp as _ref_warp


def fused_warp(src, depth, T, K, use_pallas: bool | None = None):
    """General inverse warp. See geometry.warp.inverse_warp.

    ``use_pallas`` is accepted for API stability; the general
    differentiated-source case always runs the XLA path (see module doc).
    Callers whose source needs no gradient should use ``frozen_warp``.
    """
    del use_pallas
    return _ref_warp.inverse_warp(src, depth, T, K)


def frozen_warp(src, depth, T, K, use_pallas: bool | None = None,
                pad_v: int | None = None):
    """General inverse warp of a NON-differentiated source.

    The temporal photometric and (frozen-)feature losses warp constant
    images, so their backward needs only d/d_coords — gather-shaped, no
    scatter — which the Pallas candidate-row kernel computes ~an order of
    magnitude faster than XLA's gather/scatter lowering. Gradients flow
    to depth and pose; ``src`` receives none (stop_gradient applied).

    Kernel mask addendum (TPU path): vertical displacement beyond
    ``pad_v - 1`` rows (default ``GEN_PAD_V``; see
    ``configs.base.ExperimentConfig.warp_pad_v`` for the quantified
    coverage) or horizontal beyond 127 px is invalid.

    Channel-width note (measured, v5e-1): the kernel's cost is ~linear
    in C (per-channel candidate loop) while XLA's gather is ~channel-
    flat, and an ISOLATED fwd+bwd microbenchmark has XLA ahead at C=19
    (12.6 vs 14.6 ms). In the full training graph the kernel still wins
    (34.7 vs 36.2 ms/step for the fused RGB+feature payload) — XLA's
    gather/scatter backward fuses worse in situ — so dispatch stays
    kernel-first at every payload width; revisit only with in-graph
    numbers.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and src.ndim == 4:
        from depthvo_tpu.ops import warp_pallas

        H = src.shape[1]
        Hp = -(-H // 8) * 8
        # Adaptive vertical window: coarse pyramid scales have 1/2^k the
        # vertical displacement, so a smaller pad still covers the motion.
        if pad_v is None:
            pad_v = warp_pallas.GEN_PAD_V
        if pad_v % 8:
            raise ValueError(f"pad_v must be a multiple of 8, got {pad_v}")
        while pad_v > 8 and Hp < 2 * pad_v + 8:
            pad_v = max(8, (pad_v // 2 + 7) // 8 * 8)
        if Hp >= 2 * pad_v + 8:
            return warp_pallas.general_warp_frozen_src(src, depth, T, K, pad_v=pad_v)
    return _ref_warp.inverse_warp(jax.lax.stop_gradient(src), depth, T, K)


def frozen_warp_chw(src_chw, depth, T, K, use_pallas: bool | None = None,
                    pad_v: int | None = None):
    """``frozen_warp`` over a (B,C,H,W) source, returning (B,C,H,W).

    The training loss graph keeps its photometric region in the kernel's
    CHW layout (one transpose per input image per step instead of layout
    conversions around every warp custom-call; measured step time is
    unchanged — see compute_losses — the surface exists because CHW is
    the kernel's native layout). The jnp fallback transposes to NHWC
    and back (CPU-only path; correctness, not speed).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and src_chw.ndim == 4:
        from depthvo_tpu.ops import warp_pallas

        H = src_chw.shape[2]
        Hp = -(-H // 8) * 8
        if pad_v is None:
            pad_v = warp_pallas.GEN_PAD_V
        if pad_v % 8:
            raise ValueError(f"pad_v must be a multiple of 8, got {pad_v}")
        while pad_v > 8 and Hp < 2 * pad_v + 8:
            pad_v = max(8, (pad_v // 2 + 7) // 8 * 8)
        if Hp >= 2 * pad_v + 8:
            return warp_pallas.general_warp_frozen_src_chw(
                src_chw, depth, T, K, pad_v=pad_v
            )
    src = jnp.transpose(src_chw, (0, 2, 3, 1))
    warped, valid = _ref_warp.inverse_warp(
        jax.lax.stop_gradient(src), depth, T, K
    )
    return jnp.transpose(warped, (0, 3, 1, 2)), valid


def stereo_warp(src, depth, fx_baseline, use_pallas: bool | None = None,
                dmax: int | None = None):
    """Rectified-stereo inverse warp (sample ``src`` at x - fx*b/depth).

    Args:
      src: (B, H, W, C) the other stereo view.
      depth: (B, H, W) or (B, H, W, 1) target-view depth.
      fx_baseline: scalar or (B,) fx * baseline (pixels * meters / meter).
      use_pallas: force the kernel (True) / the jnp path (False) / pick
        by backend (None).
      dmax: static disparity bound in pixels — pixels beyond it are
        masked invalid on BOTH paths (backend-identical semantics).
        Derive from the config with ``configs.base.stereo_dmax`` (the
        loss graph does); ``None`` keeps the kernel's default bound and
        leaves the jnp path unbounded.

    Returns (warped, valid).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from depthvo_tpu.ops import warp_pallas

    if use_pallas and warp_pallas.supported(src):
        if dmax is None:
            return warp_pallas.stereo_warp(src, depth, fx_baseline)
        return warp_pallas.stereo_warp(src, depth, fx_baseline, dmax=dmax)
    # jnp fallback: same coordinate/mask math (SHARED helpers — the two
    # backends cannot fork semantics) through the reference sampler.
    B, H, W, C = src.shape
    if depth.ndim == 4:
        depth = depth[..., 0]
    disparity, u = warp_pallas.stereo_disparity_u(depth, fx_baseline, W)
    rows = jnp.broadcast_to(
        jnp.arange(H, dtype=jnp.float32)[None, :, None], depth.shape
    )
    coords = jnp.stack([u, rows], axis=-1)
    warped, in_bounds = _ref_warp.bilinear_sample(src, coords)
    valid = in_bounds & warp_pallas.stereo_valid_mask(
        depth, disparity, u, H, W, dmax
    )
    return warped, valid


def stereo_warp_chw(src_chw, depth, fx_baseline,
                    use_pallas: bool | None = None, dmax: int | None = None):
    """``stereo_warp`` over a (B,C,H,W) source, returning (B,C,H,W).
    See ``frozen_warp_chw`` for why the CHW surface exists."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    from depthvo_tpu.ops import warp_pallas

    if use_pallas and src_chw.ndim == 4:
        if dmax is None:
            return warp_pallas.stereo_warp_chw(src_chw, depth, fx_baseline)
        return warp_pallas.stereo_warp_chw(
            src_chw, depth, fx_baseline, dmax=dmax
        )
    src = jnp.transpose(src_chw, (0, 2, 3, 1))
    warped, valid = stereo_warp(
        src, depth, fx_baseline, use_pallas=False, dmax=dmax
    )
    return jnp.transpose(warped, (0, 3, 1, 2)), valid
