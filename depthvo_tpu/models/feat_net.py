"""FeatNet: dense-feature extractor for the deep feature reconstruction loss.

Reference parity: the fixed feature CNN of Depth-VO-Feat (SURVEY.md §0
item 3; §2a "Feature-extractor def": a dense-feature network — the best
released variant was trained on NYUv2 — used ONLY to compute the feature
reconstruction loss; it is frozen while the depth/odometry networks train).

Design: a compact dilated conv stack producing an L2-normalized dense
feature map at full input resolution (stride-1 throughout, dilations grow
the receptive field without losing resolution — feature warping needs
per-pixel features at image resolution). Channel count defaults to 16,
padded-friendly for the VPU lane width when batched.

The reference obtained feature weights from an external training run
(NYUv2); this module supports (a) loading imported weights, (b) random
frozen features (works surprisingly well as a training signal and is the
no-external-weights default), and (c) self-supervised pretraining via the
contrastive objective in ``train/feat_pretrain.py``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from depthvo_tpu.models.layers import ConvBlock


class FeatNet(nn.Module):
    """Stride-1 dilated conv stack -> L2-normalized dense features."""

    conv_features: Sequence[int] = (32, 64, 64)
    dilations: Sequence[int] = (1, 2, 4)
    out_features: int = 16
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Args: x (B, H, W, 3) in [-1, 1].
        Returns: (B, H, W, out_features) L2-normalized along channels, f32."""
        dt = self.compute_dtype
        x = x.astype(dt)
        for feats, dil in zip(self.conv_features, self.dilations):
            x = ConvBlock(feats, 3, 1, use_bn=False, dilation=dil, dtype=dt)(
                x, train
            )
        x = nn.Conv(
            self.out_features,
            (3, 3),
            padding="SAME",
            dtype=dt,
            param_dtype=jnp.float32,
        )(x)
        x = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-8)
        return x / norm
