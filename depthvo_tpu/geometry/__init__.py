"""Differentiable geometry core.

TPU-native equivalent of the reference's custom C++/CUDA Caffe layers
(SURVEY.md §2b(i): se3_generator / transform_3d / pin_hole_cam_proj /
inverse_warping layers). Pure-jnp implementations live here and serve as
the correctness reference for the fused Pallas kernel in
``depthvo_tpu.ops.warp_pallas``.

Numerics policy: the geometry core always computes in float32 even when
the surrounding network runs bfloat16 — se(3) exp-map and projective
division are precision-sensitive (SURVEY.md §7 "hard parts").
"""

from depthvo_tpu.geometry.se3 import (  # noqa: F401
    exp,
    log,
    compose,
    inverse,
    hat,
    vee,
)
from depthvo_tpu.geometry.camera import (  # noqa: F401
    pixel_grid,
    backproject,
    project,
    scale_intrinsics,
    intrinsics_matrix,
)
from depthvo_tpu.geometry.warp import (  # noqa: F401
    bilinear_sample,
    inverse_warp,
    warp_coords,
)
