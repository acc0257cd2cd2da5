"""depthvo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of Depth-VO-Feat (Zhan et al., CVPR 2018, arXiv:1803.03893):
unsupervised joint learning of single-view depth and two-frame visual
odometry with deep feature reconstruction on KITTI.

Reference parity surface (see SURVEY.md §1: the reference's user-facing
surface is prototxt+caffemodel pairs, train.sh scripts, and the
evaluation_tools.py CLI; provenance caveat: the reference mount was empty,
this is built to the paper-accurate functional spec):

- ``predict_depth``     : one RGB frame -> inverse depth / depth map
- ``predict_pose``      : a frame pair -> 6-DoF relative camera motion
- staged training       : stereo -> +temporal/odometry -> +feature loss
- evaluation            : KITTI Eigen-split depth metrics, odometry
                          seq 09/10 trajectory metrics (t_err/r_err/ATE)

Architecture is TPU-first, not a Caffe translation: the compute path is
jitted flax models + a fused Pallas inverse-warp kernel; scaling is a
``jax.sharding.Mesh`` data-parallel pjit step (gradient psum over ICI);
checkpointing is orbax; config is plain dataclasses.
"""

__version__ = "0.1.0"

_API_NAMES = ("predict_depth", "predict_pose", "load_model", "DepthVO")


def __getattr__(name):
    # Lazy: keep `import depthvo_tpu.geometry` cheap (no flax import).
    if name in _API_NAMES:
        from depthvo_tpu import api

        return getattr(api, name)
    if name == "zoo":
        # importlib, not `from depthvo_tpu import zoo`: the from-import
        # re-enters this __getattr__ while the submodule is mid-import.
        import importlib

        return importlib.import_module("depthvo_tpu.zoo")
    raise AttributeError(f"module 'depthvo_tpu' has no attribute {name!r}")
