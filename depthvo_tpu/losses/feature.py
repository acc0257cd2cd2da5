"""Deep feature reconstruction loss.

Reference parity: SURVEY.md §0 "Feature reconstruction loss — same warp
applied to dense feature maps instead of RGB, L1 error in feature space."
This is the paper's headline contribution (Zhan et al., CVPR 2018): the
photometric loss's brightness-constancy assumption is fragile; dense
features are more invariant, so warping *features* gives a stronger
training signal.

Implementation: identical machinery to the photometric loss — the warp is
shared (the fused kernel samples C-channel maps; C=3 RGB or C=16 features
is just a different inner dimension), only the sampled tensor differs.
"""

from __future__ import annotations

import jax

from depthvo_tpu.geometry import warp as _warp
from depthvo_tpu.losses.photometric import masked_l1


def feature_reconstruction_loss(
    feat_src: jax.Array,
    feat_target: jax.Array,
    depth: jax.Array,
    T: jax.Array,
    K: jax.Array,
) -> jax.Array:
    """Warp source-view features into the target view and L1-score them.

    Args:
      feat_src: (B, H, W, C) dense features of the source view.
      feat_target: (B, H, W, C) dense features of the target view.
      depth: (B, H, W) or (B, H, W, 1) target-view depth.
      T: (B, 4, 4) target-cam -> source-cam transform.
      K: intrinsics (B, 3, 3) or (3, 3).
    """
    warped, valid = _warp.inverse_warp(feat_src, depth, T, K)
    return masked_l1(warped, feat_target, valid)
