"""DepthNet: single-view inverse-depth network.

Reference parity: the depth CNN of Depth-VO-Feat (SURVEY.md §0 item 1;
§2a "Depth network def": ResNet50-1by2 encoder + upsampling decoder with
skip connections, multi-scale inverse-depth output, 608x160 input;
prototxt paths UNVERIFIED — built to the paper spec).

Architecture (TPU-first re-design, not a prototxt translation):
* Encoder: ResNet-50 with halved channels ("1by2"): stem 7x7/2 (32ch) +
  maxpool, bottleneck stages [3,4,6,3] with planes [32,64,128,256]
  (stage outputs 128/256/512/1024 after the 4x expansion).
* Decoder: five NN-upsample+conv blocks with encoder skip connections,
  predicting inverse depth at 4 scales (1/8, 1/4, 1/2, 1/1) — multi-scale
  supervision as in the reference training graphs.
* Inverse-depth head: ``disp = max_disp * sigmoid(x) + min_disp`` which
  bounds predictions to a physically sane range and keeps training stable
  (the Caffe reference bounds inverse depth similarly via its loss setup).

Everything is static-shaped and jit-compiles to one XLA program; set
``compute_dtype=jnp.bfloat16`` for MXU-rate convolutions (params stay f32).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from depthvo_tpu.models.layers import ConvBlock, ResNetStage, UpConv


class DepthNet(nn.Module):
    """ResNet50-1by2 encoder / skip-decoder inverse-depth network."""

    stem_features: int = 32
    stage_planes: Sequence[int] = (32, 64, 128, 256)
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    decoder_features: Sequence[int] = (256, 128, 64, 32, 16)
    num_scales: int = 4  # inverse-depth outputs at 1/8, 1/4, 1/2, 1/1
    max_disp: float = 0.3  # upper bound on inverse depth (1/m)
    min_disp: float = 0.00625  # lower bound (max depth 160 m)
    compute_dtype: Any = jnp.float32
    # Skip the full-resolution feature convs: predict the finest inverse
    # depth at 1/2 resolution and bilinearly upsample the 1-channel map.
    # Full-res small-channel convs are VPU-bound and ~half of decoder
    # time; metric parity is gated on the synthetic-scene training check
    # (SURVEY.md §7: the gate is metric parity, not structural mimicry).
    fast_final_upsample: bool = False
    # Subpixel (depth-to-space) final head: predict FOUR inverse-depth
    # logits per 1/2-res pixel and rearrange into the full-res map —
    # the learned-upsample alternative to fast_final_upsample: same
    # full-res-conv savings, but each output pixel gets its own
    # prediction instead of a bilinear blur.
    subpixel_head: bool = False
    # Rematerialize encoder stages and decoder blocks under AD
    # (jax.checkpoint): activations inside each stage are recomputed in
    # the backward pass instead of living in HBM across the whole step.
    # Same math bit-for-bit; trades ~1 extra forward of FLOPs for the
    # activation memory that otherwise caps per-chip batch size (the
    # measured MFU lever — PERF.md batch-size scaling table).
    remat: bool = False
    # Space-to-depth rewrite of the finest decoder stage: the full-res
    # 3x3 convs (UpConv_4 / ConvBlock_5 / disp head — the conv-backward
    # hot spot, PERF.md per-layer table) run as half-res 4x-channel
    # convs with structured kernels. SAME parameters (checkpoint
    # bit-compatible with the standard stage), same function up to float
    # reassociation — only the XLA program changes (layers.py
    # s2d_conv_kernel note). Benchmarked in benchmarks/conv_levers.py.
    s2d_finest: bool = False
    # w8a8 int8 serving (v5e int8 MXU rate is 2x bf16): "off" for
    # training/default serving, "calibrate" to record activation scales
    # (apply with mutable=["quant"]), "int8" to run the quantized convs.
    # The tiny 1-channel disp heads stay un-quantized (VPU-bound, and
    # the sigmoid head is precision-sensitive). See api.calibrate_int8.
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Args: x (B, H, W, 3) in [-1, 1]. Returns: list of inverse-depth
        maps [(B, H/8, W/8, 1), (B, H/4, ...), (B, H/2, ...), (B, H, W, 1)],
        finest last, in float32."""
        dt = self.compute_dtype
        x = x.astype(dt)
        # Remat boundaries are whole stages/blocks: only the (small)
        # stage-boundary activations stay live across the backward.
        # `train` is a static python bool (index 2 counting self). The
        # wrapped classes auto-name as Checkpoint<Cls>_N, which would
        # fork the param tree from non-remat checkpoints — every wrapped
        # module gets an explicit name matching the non-remat auto-names,
        # so weights are interchangeable between the two modes.
        if self.remat:
            Stage = nn.remat(ResNetStage, static_argnums=(2,))
            Up = nn.remat(UpConv, static_argnums=(2,))
            CB = nn.remat(ConvBlock, static_argnums=(2,))
        else:
            Stage, Up, CB = ResNetStage, UpConv, ConvBlock

        # ----- encoder -----
        q = self.quant_mode
        skips = []
        x = CB(
            self.stem_features, 7, 2, dtype=dt, quant_mode=q,
            name="ConvBlock_0",
        )(x, train)  # 1/2
        skips.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")  # 1/4
        for i, (planes, blocks) in enumerate(
            zip(self.stage_planes, self.stage_blocks)
        ):
            x = Stage(
                planes, blocks, stride=1 if i == 0 else 2, dtype=dt,
                quant_mode=q, name=f"ResNetStage_{i}",
            )(x, train)
            skips.append(x)
        # skips: [1/2 (32), 1/4 (128), 1/8 (256), 1/16 (512), 1/32 (1024)]

        # ----- decoder -----
        from depthvo_tpu.models.layers import resize_bilinear

        disps = []
        x = skips[-1]
        n_up = len(self.decoder_features)
        last_stage = n_up - 1
        if sum((self.fast_final_upsample, self.subpixel_head,
                self.s2d_finest)) > 1:
            raise ValueError(
                "fast_final_upsample, subpixel_head and s2d_finest are "
                "mutually exclusive finest-stage modes"
            )
        if self.s2d_finest and q != "off":
            raise ValueError(
                "s2d_finest is a training-graph lever; int8 serving uses "
                "the standard or subpixel head (quant_mode must be 'off')"
            )
        for i, feats in enumerate(self.decoder_features):
            if self.s2d_finest and i == last_stage:
                disps.append(self._s2d_finest_stage(x, feats))
                break
            if self.subpixel_head and i == last_stage:
                # Subpixel head: 4 bounded logits per 1/2-res pixel ->
                # depth_to_space(2) -> full-res inverse depth. The convs
                # stay at 1/2 res (channel-dense, MXU-friendly); every
                # output pixel still gets its own learned prediction.
                raw = nn.Conv(
                    4, (3, 3), padding="SAME", dtype=dt,
                    param_dtype=jnp.float32,
                )(x)
                d4 = (
                    self.max_disp * nn.sigmoid(raw.astype(jnp.float32))
                    + self.min_disp
                )
                B, Hh, Wh, _ = d4.shape
                d4 = d4.reshape(B, Hh, Wh, 2, 2)
                d4 = d4.transpose(0, 1, 3, 2, 4)
                disps.append(d4.reshape(B, 2 * Hh, 2 * Wh, 1))
                break
            if self.fast_final_upsample and i == last_stage:
                # Finest scale: upsample the previous disp (1 channel)
                # instead of running full-res feature convs.
                prev = disps[-1]
                disps.append(resize_bilinear(prev, prev.shape[1] * 2, prev.shape[2] * 2))
                break
            x = Up(feats, dtype=dt, quant_mode=q, name=f"UpConv_{i}")(
                x, train
            )
            skip_idx = len(skips) - 2 - i
            if skip_idx >= 0:
                x = jnp.concatenate([x, skips[skip_idx]], axis=-1)
            x = CB(
                feats, 3, 1, use_bn=False, dtype=dt, quant_mode=q,
                name=f"ConvBlock_{i + 1}",
            )(x, train)
            # Predict inverse depth at the last `num_scales` resolutions
            # (with fast_final_upsample the second-finest stage must also
            # emit a disp to upsample from).
            scale_idx = i - (n_up - self.num_scales)
            if self.fast_final_upsample and i == last_stage - 1:
                scale_idx = max(scale_idx, 0)
            if scale_idx >= 0:
                raw = nn.Conv(
                    1,
                    (3, 3),
                    padding="SAME",
                    dtype=dt,
                    param_dtype=jnp.float32,
                )(x)
                disp = (
                    self.max_disp * nn.sigmoid(raw.astype(jnp.float32))
                    + self.min_disp
                )
                disps.append(disp)
        return disps

    def _s2d_finest_stage(self, x, feats):
        """The finest decoder stage (upsample+conv, conv, disp head) as
        half-resolution space-to-depth convolutions — exact same math and
        parameter tree as the standard stage (layers.py s2d note), but
        every conv fwd/bwd runs at (H/2, W/2) with 4x channels, the
        shapes XLA tiles onto the MXU."""
        from jax import lax

        from depthvo_tpu.models.layers import (
            _ConvBlockParams,
            _ConvParams,
            _UpConvParams,
            depth_to_space2,
            s2d_conv_kernel,
            s2d_upconv_kernel,
            tile_phase_bias,
        )

        dt = self.compute_dtype
        last = len(self.decoder_features) - 1
        dn = ("NHWC", "HWIO", "NHWC")
        # Param shells carry the STANDARD stage's names/shapes/init, so
        # checkpoints are interchangeable between the two modes.
        kup, bup = _UpConvParams(
            (3, 3, x.shape[-1], feats), name=f"UpConv_{last}"
        )()
        k5, b5 = _ConvBlockParams(
            (3, 3, feats, feats), name=f"ConvBlock_{last + 1}"
        )()
        kd, bd = _ConvParams(
            (3, 3, feats, 1), name=f"Conv_{self.num_scales - 1}"
        )()

        # UpConv: upsample2x+conv fused into one half-res conv.
        y = lax.conv_general_dilated(
            x.astype(dt), s2d_upconv_kernel(kup).astype(dt), (1, 1),
            "SAME", dimension_numbers=dn,
        )
        y = nn.relu(y + tile_phase_bias(bup).astype(y.dtype))
        # ConvBlock: full-res 3x3 as half-res structured 3x3.
        y = lax.conv_general_dilated(
            y, s2d_conv_kernel(k5).astype(dt), (1, 1), "SAME",
            dimension_numbers=dn,
        )
        y = nn.relu(y + tile_phase_bias(b5).astype(y.dtype))
        # Disp head; sigmoid/bounds are per-channel elementwise, so they
        # commute with the final depth_to_space.
        raw = lax.conv_general_dilated(
            y, s2d_conv_kernel(kd).astype(dt), (1, 1), "SAME",
            dimension_numbers=dn,
        )
        raw = raw + tile_phase_bias(bd).astype(raw.dtype)
        disp = (
            self.max_disp * nn.sigmoid(raw.astype(jnp.float32))
            + self.min_disp
        )
        return depth_to_space2(disp)

    def single_scale(self, x, train: bool = False):
        """Finest-scale inverse depth only: (B, H, W, 1)."""
        return self(x, train)[-1]
