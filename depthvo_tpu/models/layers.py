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


class QuantConv(nn.Module):
    """int8xint8->int32 convolution for w8a8 serving (MXU int8 rate is
    2x bf16 on v5e).

    Declares the SAME parameters as ``nn.Conv`` (f32 ``kernel``/``bias``
    under the caller-given name), so trained checkpoints load unchanged;
    quantization happens in the forward:

    * weights: symmetric per-output-channel int8, scales derived from the
      kernel itself — under ``jax.export``/AOT serving the kernel is a
      constant and the whole weight-quantize folds away at compile time;
    * activations: symmetric per-tensor int8 with a STATIC scale from a
      calibration pass (``quant_mode="calibrate"`` records running
      max|x| into the ``quant`` variable collection; a static scale keeps
      the serving program free of data-dependent reductions).

    ``calibrate=True`` runs the f32 convolution and records the scale;
    otherwise the int8 path runs and requires a prior calibration: an
    uncalibrated layer (a_max == 0) deliberately evaluates to NaN so a
    missing calibration fails LOUDLY instead of returning garbage
    (``api.calibrate_int8`` is the supported flow and also checks the
    recorded scales).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = False
    dilation: int = 1
    dtype: Dtype = jnp.float32
    calibrate: bool = False

    @nn.compact
    def __call__(self, x):
        from jax import lax

        kshape = (self.kernel, self.kernel, x.shape[-1], self.features)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), kshape, jnp.float32
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        a_max = self.variable(
            "quant", "a_max", lambda: jnp.zeros((), jnp.float32)
        )
        dn = ("NHWC", "HWIO", "NHWC")
        strides = (self.stride, self.stride)
        dil = (self.dilation, self.dilation)
        if self.calibrate:
            if not self.is_initializing():
                a_max.value = jnp.maximum(
                    a_max.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                )
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                strides, "SAME", rhs_dilation=dil, dimension_numbers=dn,
            )
        else:
            # NaN (not epsilon-garbage) when uncalibrated: see docstring.
            a_scale = (
                jnp.where(a_max.value > 0, a_max.value, jnp.float32(jnp.nan))
                / 127.0
            )
            x_q = jnp.clip(
                jnp.round(x.astype(jnp.float32) / a_scale), -127, 127
            ).astype(jnp.int8)
            w_scale = (
                jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
                / 127.0
            )
            w_q = jnp.clip(
                jnp.round(kernel / w_scale), -127, 127
            ).astype(jnp.int8)
            y = lax.conv_general_dilated(
                x_q, w_q, strides, "SAME", rhs_dilation=dil,
                dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * (a_scale * w_scale)).astype(
                self.dtype
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvBlock(nn.Module):
    """Conv -> (BN) -> activation, the basic unit of every tower.

    ``quant_mode``: "off" (nn.Conv, training and default serving),
    "calibrate" (f32 conv recording activation scales into the ``quant``
    collection), "int8" (w8a8 serving via :class:`QuantConv`). The param
    tree is identical across modes.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    act: Callable | None = nn.relu
    dtype: Dtype = jnp.float32
    dilation: int = 1
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.quant_mode != "off":
            x = QuantConv(
                self.features,
                kernel=self.kernel,
                stride=self.stride,
                use_bias=not self.use_bn,
                dilation=self.dilation,
                dtype=self.dtype,
                calibrate=self.quant_mode == "calibrate",
                name="Conv_0",  # match nn.Conv's auto-name: same tree
            )(x)
        else:
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
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = 4 * self.planes
        q = self.quant_mode
        residual = x
        y = ConvBlock(self.planes, 1, 1, dtype=self.dtype, quant_mode=q)(
            x, train
        )
        y = ConvBlock(
            self.planes, 3, self.stride, dtype=self.dtype, quant_mode=q
        )(y, train)
        y = ConvBlock(
            out_ch, 1, 1, act=None, dtype=self.dtype, quant_mode=q
        )(y, train)
        if residual.shape[-1] != out_ch or self.stride != 1:
            residual = ConvBlock(
                out_ch, 1, self.stride, act=None, dtype=self.dtype,
                quant_mode=q,
            )(x, train)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    """A stack of bottleneck blocks; first block may downsample."""

    planes: int
    num_blocks: int
    stride: int
    dtype: Dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = Bottleneck(
                self.planes,
                stride=self.stride if i == 0 else 1,
                dtype=self.dtype,
                quant_mode=self.quant_mode,
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


def resize_bilinear_chw(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """``resize_bilinear`` for (B, C, H, W) tensors — same separable
    kernel on the trailing spatial dims, so values are identical to
    resizing the NHWC transpose."""
    import jax

    b, c = x.shape[:2]
    return jax.image.resize(x, (b, c, h, w), method="linear")


class UpConv(nn.Module):
    """Upsample 2x then conv — the decoder unit (replaces the reference's
    deconv layers; NN-upsample+conv avoids checkerboard artifacts and maps
    better onto the MXU than strided transpose convs)."""

    features: int
    dtype: Dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample2x(x)
        return ConvBlock(
            self.features, 3, 1, use_bn=False, dtype=self.dtype,
            quant_mode=self.quant_mode,
        )(x, train)


# ---------------------------------------------------------------------------
# Space-to-depth rewrite of full-resolution 3x3 convolutions.
#
# The finest decoder stage (UpConv_4 -> ConvBlock_5 -> disp head) runs
# 3x3 convs at full 608x160 resolution with 1-32 channels — the shapes
# the round-4 roofline measured at 2.9x their byte floor (XLA's conv
# backward tiles them poorly; PERF.md "convolution fusion" row). The
# classic TPU fix: a stride-1 3x3 conv on (H, W, C) is EXACTLY a 3x3
# conv on the space-to-depth form (H/2, W/2, 4C) whose (4C, 4C') kernel
# is a structured embedding of the original (C, C') taps:
#
#   y[2I+a, 2J+b, co] = sum_{dp,dq,ci} W[dp,dq,ci,co] x[2I+a+dp, 2J+b+dq, ci]
#   with 2u+a' = a+dp  (u in {-1,0,1} the s2d tap, a' the input phase)
#   => Y[I,J,(a,b,co)] = sum_{u,v} sum_{(a',b',ci)}
#        W2[u,v,(a',b',ci),(a,b,co)] X[I+u,J+v,(a',b',ci)]
#   where W2[u,v,...] = W[2u+a'-a, 2v+b'-b, ci, co] when both offsets
#   land in {-1,0,1}, else 0  (exactly 1/4 of W2 is non-zero).
#
# Same parameters, same function (mod float reassociation), but the
# XLA program sees half-resolution 4x-channel convs whose forward AND
# backward tile onto the MXU. Channel packing everywhere: index
# (2a + b) * C + ci with a = row phase, b = col phase — matching the
# subpixel head's depth_to_space.
# ---------------------------------------------------------------------------


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel index (2a+b)*C + ci."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth2`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def s2d_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Embed a (3,3,Ci,Co) stride-1 SAME kernel into the equivalent
    (3,3,4Ci,4Co) kernel over space-to-depth operands (see module note).
    Built at trace time from static Python loops (144 combos); the
    scatter is tiny and constant-folds around the parameter."""
    ci, co = w.shape[2], w.shape[3]
    zeros = jnp.zeros((ci, co), w.dtype)
    rows_u = []
    for u in (-1, 0, 1):
        rows_v = []
        for v in (-1, 0, 1):
            # block[(a', b', ci), (a, b, co)]
            block = [[None] * 4 for _ in range(4)]
            for ap in (0, 1):
                for bp in (0, 1):
                    for a in (0, 1):
                        for bq in (0, 1):
                            dp = 2 * u + ap - a
                            dq = 2 * v + bp - bq
                            block[2 * ap + bp][2 * a + bq] = (
                                w[dp + 1, dq + 1]
                                if -1 <= dp <= 1 and -1 <= dq <= 1
                                else zeros
                            )
            rows_v.append(
                jnp.concatenate(
                    [jnp.concatenate(r, axis=1) for r in block], axis=0
                )
            )
        rows_u.append(jnp.stack(rows_v))
    return jnp.stack(rows_u)  # (3, 3, 4Ci, 4Co)


def s2d_upconv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Embed a (3,3,Ci,Co) kernel applied AFTER nearest 2x upsampling
    into the equivalent (3,3,Ci,4Co) kernel applied directly on the
    coarse (un-upsampled) input: x_up[2I+a+dp] = x[I + floor((a+dp)/2)],
    so taps that land in the same coarse cell SUM. Fuses
    ``upsample2x -> conv3x3`` into one half-resolution conv."""
    ci, co = w.shape[2], w.shape[3]
    # taps[u][a] = list of dp with floor((a+dp)/2) == u
    taps = {(-1, 0): [-1], (0, 0): [0, 1], (1, 0): [],
            (-1, 1): [], (0, 1): [-1, 0], (1, 1): [1]}
    rows_u = []
    for u in (-1, 0, 1):
        rows_v = []
        for v in (-1, 0, 1):
            block = [None] * 4  # [(a, b, co)] over ci
            for a in (0, 1):
                for bq in (0, 1):
                    acc = jnp.zeros((ci, co), w.dtype)
                    for dp in taps[(u, a)]:
                        for dq in taps[(v, bq)]:
                            acc = acc + w[dp + 1, dq + 1]
                    block[2 * a + bq] = acc
            rows_v.append(jnp.concatenate(block, axis=1))
        rows_u.append(jnp.stack(rows_v))
    return jnp.stack(rows_u)  # (3, 3, Ci, 4Co)


def tile_phase_bias(b: jnp.ndarray) -> jnp.ndarray:
    """(Co,) bias -> (4Co,) over the phase-packed output channels."""
    return jnp.tile(b, 4)


class _ConvParams(nn.Module):
    """Parameter shell: declares an nn.Conv-compatible kernel/bias pair
    (same names, shapes, init, f32) WITHOUT running the convolution —
    the s2d finest stage consumes them through the kernel embeddings
    above, keeping its checkpoint bit-compatible with the standard
    stage."""

    shape: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )
        b = (
            self.param(
                "bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32
            )
            if self.use_bias
            else None
        )
        return k, b


class _ConvBlockParams(nn.Module):
    """ConvBlock-shaped param shell (child named Conv_0, as ConvBlock's
    anonymous nn.Conv auto-names itself)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, name="Conv_0")()


class _UpConvParams(nn.Module):
    """UpConv-shaped param shell (child chain ConvBlock_0/Conv_0)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvBlockParams(self.shape, name="ConvBlock_0")()
