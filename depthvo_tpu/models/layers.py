"""Shared flax building blocks for the model family.

Conventions:
* NHWC everywhere (TPU-native layout; XLA lowers NHWC convs straight onto
  the MXU without transposes).
* Params live in float32; activations run in ``dtype`` (bfloat16 for
  training/serving speed, float32 for golden tests).
* BatchNorm follows the reference's Caffe BN+Scale semantics (train-mode
  batch stats, eval-mode running averages) via flax's BatchNorm.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class ConvBlock(nn.Module):
    """Conv -> (BN) -> activation, the basic unit of every tower."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.95,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class Bottleneck(nn.Module):
    """ResNet bottleneck block (1x1 -> 3x3 -> 1x1, x4 expansion)."""

    planes: int  # bottleneck width; output channels = 4 * planes
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = 4 * self.planes
        residual = x
        y = ConvBlock(self.planes, 1, 1, dtype=self.dtype)(x, train)
        y = ConvBlock(self.planes, 3, self.stride, dtype=self.dtype)(y, train)
        y = ConvBlock(out_ch, 1, 1, act=None, dtype=self.dtype)(y, train)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = ConvBlock(
                out_ch, 1, self.stride, act=None, dtype=self.dtype
            )(x, train)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    """A stack of bottleneck blocks; first block may downsample."""

    planes: int
    num_blocks: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = Bottleneck(
                self.planes,
                stride=self.stride if i == 0 else 1,
                dtype=self.dtype,
            )(x, train)
        return x


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsampling (cheap, fusion-friendly on TPU).

    Implemented as reshape-broadcast rather than jax.image.resize: XLA
    fuses this into the surrounding conv, no gather needed.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear resize to (h, w) via jax.image (XLA-lowered, static shapes)."""
    import jax

    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="linear")


class UpConv(nn.Module):
    """Upsample 2x then conv — the decoder unit (replaces the reference's
    deconv layers; NN-upsample+conv avoids checkerboard artifacts and maps
    better onto the MXU than strided transpose convs)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample2x(x)
        return ConvBlock(self.features, 3, 1, use_bn=False, dtype=self.dtype)(
            x, train
        )
