"""Public inference API.

The reference has no library API — users drive prototxt+caffemodel pairs
through pycaffe scripts (SURVEY.md §1 "there is no library API"). The
rebuild exposes the same capabilities as a real Python API:

* ``predict_depth(params, images)``  — one RGB frame -> depth map
  (reference: evaluation_tools.py depth-prediction func, SURVEY §3.2).
* ``predict_pose(params, pairs)``    — frame pair -> 4x4 relative
  transform (reference: odom-generation func, SURVEY §3.3).
* ``DepthVO``                        — bundles config + jitted apply fns
  + weights, with ``from_checkpoint`` / ``from_random``.

All functions are jit-compiled on first call per input shape; inputs are
NHWC float32 in [-1, 1].
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from depthvo_tpu.configs.base import ExperimentConfig, full_feat
from depthvo_tpu.geometry import se3
from depthvo_tpu.train.state import build_models, create_state


class DepthVO:
    """Inference handle over trained Depth-VO-Feat weights."""

    def __init__(self, config: ExperimentConfig, params: Dict[str, Any], batch_stats: Any):
        self.config = config
        self.params = params
        self.batch_stats = batch_stats
        self._depth_net, self._odom_net, self._feat_net = build_models(config)

        @jax.jit
        def _depth_fn(params, batch_stats, images):
            variables = {"params": params["depth"], "batch_stats": batch_stats}
            disps = self._depth_net.apply(variables, images, train=False)
            return disps[-1]

        @jax.jit
        def _pose_fn(params, pairs):
            twist = self._odom_net.apply(
                {"params": params["odom"]}, pairs, train=False
            )
            return twist, se3.exp(twist)

        @jax.jit
        def _feat_fn(params, images):
            return self._feat_net.apply(
                {"params": params["feat"]}, images, train=False
            )

        self._depth_fn = _depth_fn
        self._pose_fn = _pose_fn
        self._feat_fn = _feat_fn

    # ---- constructors ----
    @classmethod
    def from_random(cls, config: ExperimentConfig | None = None, seed: int = 0) -> "DepthVO":
        config = config or full_feat()
        state = create_state(config, jax.random.PRNGKey(seed))
        return cls(config, state.params, state.batch_stats)

    @classmethod
    def from_checkpoint(cls, directory: str, config: ExperimentConfig | None = None) -> "DepthVO":
        from depthvo_tpu.io import checkpoint as ckpt_io

        config = config or full_feat()
        state = create_state(config, jax.random.PRNGKey(0))
        state = ckpt_io.restore_weights(directory, state)
        return cls(config, state.params, state.batch_stats)

    # ---- inference ----
    def depth(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) in [-1,1] -> (B, H, W) metric depth (1/disparity)."""
        images = jnp.asarray(images, jnp.float32)
        if images.ndim == 3:
            images = images[None]
        disp = self._depth_fn(self.params, self.batch_stats, images)
        return np.asarray(1.0 / disp[..., 0])

    def inverse_depth(self, images: np.ndarray) -> np.ndarray:
        images = jnp.asarray(images, jnp.float32)
        if images.ndim == 3:
            images = images[None]
        return np.asarray(
            self._depth_fn(self.params, self.batch_stats, images)[..., 0]
        )

    def pose(self, pairs: np.ndarray) -> np.ndarray:
        """(B, H, W, 6) frame pairs -> (B, 4, 4) relative transforms
        (target-cam -> source-cam coordinate transforms)."""
        pairs = jnp.asarray(pairs, jnp.float32)
        if pairs.ndim == 3:
            pairs = pairs[None]
        _, T = self._pose_fn(self.params, pairs)
        return np.asarray(T)

    def features(self, images: np.ndarray) -> np.ndarray:
        images = jnp.asarray(images, jnp.float32)
        if images.ndim == 3:
            images = images[None]
        return np.asarray(self._feat_fn(self.params, images))


def load_model(checkpoint_dir: str, config: ExperimentConfig | None = None) -> DepthVO:
    """Load a trained model from an orbax checkpoint directory."""
    return DepthVO.from_checkpoint(checkpoint_dir, config)


def predict_depth(model: DepthVO, images: np.ndarray) -> np.ndarray:
    """Functional alias: model + frames -> depth maps."""
    return model.depth(images)


def predict_pose(model: DepthVO, frame_a: np.ndarray, frame_b: np.ndarray) -> np.ndarray:
    """Functional alias: two frames (or batches) -> 4x4 relative transform."""
    a = np.asarray(frame_a, np.float32)
    b = np.asarray(frame_b, np.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    pairs = np.concatenate([a, b], axis=-1)
    return model.pose(pairs)
