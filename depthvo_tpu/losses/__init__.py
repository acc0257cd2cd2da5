"""Self-supervision losses of Depth-VO-Feat (SURVEY.md §0):

* stereo photometric loss  — depth + known stereo baseline -> warp right
  image into left view, masked L1.
* temporal photometric loss — depth + predicted pose -> warp adjacent
  frame into the reference view, masked L1.
* feature reconstruction loss — the same warp applied to dense feature
  maps, masked L1 in feature space (implemented fused with the temporal
  warp in train/loop.py::compute_losses — the warp samples RGB and
  features in one gather, so there is no separate module for it).
* inverse-depth smoothness regularizer.

All losses consume the validity mask produced by the warp (out-of-image
footprints and behind-camera points excluded), matching the reference
inverse-warping layer's semantics.
"""

from depthvo_tpu.losses.photometric import (  # noqa: F401
    masked_l1,
    photometric_loss,
    ssim,
)
from depthvo_tpu.losses.smoothness import smoothness_loss  # noqa: F401
