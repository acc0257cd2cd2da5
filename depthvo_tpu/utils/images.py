"""Shared image-dtype contract: the single uint8 <-> [-1, 1] formula.

Raw uint8 frames cross the host->device link at 4x fewer bytes and are
normalized on-device with EXACTLY the host loaders' formula
(data/kitti.py::load_image: ``x / 127.5 - 1``). Every consumer — the
inference API, the training loss graph, feature pretraining — routes
through this helper so the 1-ulp-parity contract with the host loaders
lives in one place.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_unit(images: jax.Array) -> jax.Array:
    """[-1, 1] float32 from either pre-normalized floats or raw uint8.

    The two routes agree to 1 ulp (XLA may fuse the normalize into an
    FMA); uint8 just moves 4x fewer bytes to the device.
    """
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 127.5 - 1.0
    return images.astype(jnp.float32)
