"""Data subsystem.

Reference parity (SURVEY.md §2a "Data prep", §3.4): the reference walks
KITTI raw (Eigen split) and KITTI odometry seqs 00-08, resizes frames to
608x160, scales intrinsics, and emits stereo/temporal pair lists consumed
by Caffe data layers with a prefetch thread (§2b(ii) base_data_layer /
internal_thread / data_transformer).

Rebuild layout:
* ``kitti``     — KITTI raw + odometry readers (list building, intrinsics,
  PNG decode via PIL) that work when pointed at a real KITTI tree.
* ``synthetic`` — procedural multi-view scenes with exact geometry
  (known depth + pose), used by unit/integration tests and benchmarks on
  machines without KITTI (this one included).
* ``pipeline``  — host-side prefetch iterator (threaded double-buffering
  into device memory), the TPU analog of Caffe's InternalThread prefetch.
"""

from depthvo_tpu.data.pipeline import prefetch_to_device, batch_iterator  # noqa: F401
from depthvo_tpu.data.synthetic import SyntheticScenes  # noqa: F401
