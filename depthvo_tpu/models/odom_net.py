"""OdomNet: two-frame visual odometry network.

Reference parity: the odometry CNN of Depth-VO-Feat (SURVEY.md §0 item 2;
§2a "Odometry network def": 6-channel two-frame input -> conv stack -> FC
head -> 6-dim se(3) twist; prototxt UNVERIFIED — built to the paper spec).

TPU-first notes: pure conv stack with stride-2 downsampling (every conv is
an MXU matmul at 608x160), global average pool, small dense head. The
output twist is scaled by ``output_scale`` so the randomly-initialized
network starts near the identity transform — standard practice for pose
CNNs and required for stable joint training with the warping loss.

Convention: the predicted twist is ``[v, w]`` (translation, rotation) and
``se3.exp(twist)`` maps points FROM the target (first) frame's camera TO
the source (second) frame's camera; training wires it accordingly.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from depthvo_tpu.models.layers import ConvBlock


class OdomNet(nn.Module):
    """Conv stack + FC head -> 6-DoF se(3) twist."""

    conv_features: Sequence[int] = (16, 32, 64, 128, 256, 256, 256)
    fc_features: Sequence[int] = (512, 512)
    output_scale: float = 0.01
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame_pair, train: bool = False):
        """Args: frame_pair (B, H, W, 6) — target and source frames
        concatenated on channels, in [-1, 1].
        Returns: (B, 6) se(3) twist [v, w] in float32."""
        dt = self.compute_dtype
        x = frame_pair.astype(dt)
        for i, feats in enumerate(self.conv_features):
            kernel = 7 if i == 0 else (5 if i == 1 else 3)
            x = ConvBlock(feats, kernel, 2, use_bn=False, dtype=dt)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, C)
        for feats in self.fc_features:
            x = nn.relu(
                nn.Dense(feats, dtype=dt, param_dtype=jnp.float32)(x)
            )
        twist = nn.Dense(6, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return self.output_scale * twist
