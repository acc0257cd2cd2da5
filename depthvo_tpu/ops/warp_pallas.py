"""Fused inverse-warp Pallas TPU kernel (placeholder gate, round 1).

The fused kernel is staged behind ``supported()``; until the Pallas
implementation lands, it reports unsupported and the dispatcher in
``depthvo_tpu.ops`` falls back to the pure-jnp reference path, which XLA
already fuses well. See SURVEY.md §7 build order step 6.
"""

from __future__ import annotations


def supported(src, depth) -> bool:
    return False


def fused_warp_pallas(src, depth, T, K):  # pragma: no cover
    raise NotImplementedError("Pallas warp kernel lands in a later milestone")
