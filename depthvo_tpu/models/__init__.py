"""Model family: the three networks of Depth-VO-Feat (SURVEY.md §0).

1. ``DepthNet``  — single RGB frame -> multi-scale inverse depth
   (ResNet-50-with-halved-channels encoder + skip-connection decoder;
   reference: depth network prototxt, SURVEY.md §2a "Depth network def").
2. ``OdomNet``   — two concatenated RGB frames (6-channel input) -> 6-DoF
   relative camera motion as an se(3) twist (conv stack + FC head;
   reference: odometry network prototxt, SURVEY.md §2a).
3. ``FeatNet``   — dense-feature CNN used by the deep feature
   reconstruction loss (reference: feature-extractor prototxt; the
   released variant was NYUv2-trained and frozen during depth training).

TPU-first choices: NHWC layout, channel counts padded to VPU/MXU-friendly
multiples, a ``compute_dtype`` knob for bfloat16 activations with float32
params, and no data-dependent control flow anywhere (everything jits to a
single XLA program).
"""

from depthvo_tpu.models.depth_net import DepthNet  # noqa: F401
from depthvo_tpu.models.odom_net import OdomNet  # noqa: F401
from depthvo_tpu.models.feat_net import FeatNet  # noqa: F401
