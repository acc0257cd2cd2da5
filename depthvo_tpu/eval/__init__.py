"""Evaluation suites.

Reference parity (SURVEY.md §2a "Eval & inference tool",
``tools/evaluation_tools.py`` with --func {depth prediction, depth eval,
odom generation, odom eval}):

* ``depth_metrics``   — KITTI Eigen-split protocol: Garg crop, depth caps
  (50/80 m), median scaling, abs_rel / sq_rel / rmse / rmse_log /
  delta<1.25^k.
* ``odometry``        — trajectory composition from per-pair relative
  poses, KITTI devkit metrics (per-length t_err %, r_err deg/100m) and
  ATE (the BASELINE gate metric).
"""

from depthvo_tpu.eval.depth_metrics import (  # noqa: F401
    compute_depth_metrics,
    eigen_crop_mask,
    DEPTH_METRIC_NAMES,
)
from depthvo_tpu.eval.odometry import (  # noqa: F401
    compose_trajectory,
    ate,
    kitti_odometry_errors,
    align_scale,
)
