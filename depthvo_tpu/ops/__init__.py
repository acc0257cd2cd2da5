"""Hot-path ops: the fused inverse-warp kernel dispatch.

``fused_warp`` is the single custom hot op of the framework (SURVEY.md
§2b(i)): backproject -> rigid transform -> pinhole project -> bilinear
sample, shared by the photometric and feature reconstruction losses.

Dispatch policy: the Pallas TPU kernel (``warp_pallas``) when running on
TPU and shapes qualify; the pure-jnp reference path (``geometry.warp``)
otherwise. Both implement identical semantics and are golden-tested
against each other (tests/test_warp_pallas.py).
"""

from __future__ import annotations

import jax

from depthvo_tpu.geometry import warp as _ref_warp


def fused_warp(src, depth, T, K, use_pallas: bool | None = None):
    """Inverse-warp ``src`` into the target view. See geometry.warp.inverse_warp.

    Args:
      use_pallas: force the kernel path (True), the jnp path (False), or
        auto-select by backend (None).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from depthvo_tpu.ops import warp_pallas

        if warp_pallas.supported(src, depth):
            return warp_pallas.fused_warp_pallas(src, depth, T, K)
    return _ref_warp.inverse_warp(src, depth, T, K)
