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
NHWC float32 in [-1, 1] OR raw uint8 (normalized on-device — preferred
for throughput: 4x fewer bytes cross the host->device link, and the
normalization matches the loader's ``x / 127.5 - 1`` to 1 ulp).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from depthvo_tpu.configs.base import ExperimentConfig, full_feat
from depthvo_tpu.geometry import se3
from depthvo_tpu.train.state import build_models, create_state
from depthvo_tpu.utils.images import to_unit as _to_unit


def _as_batch(images: np.ndarray) -> jax.Array:
    """Device array, batch dim added, dtype preserved (u8 stays u8)."""
    arr = jnp.asarray(images)
    if arr.dtype not in (jnp.uint8, jnp.float32):
        arr = arr.astype(jnp.float32)
    return arr[None] if arr.ndim == 3 else arr


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
            disps = self._depth_net.apply(variables, _to_unit(images), train=False)
            return disps[-1]

        @jax.jit
        def _pose_fn(params, pairs):
            twist = self._odom_net.apply(
                {"params": params["odom"]}, _to_unit(pairs), train=False
            )
            return twist, se3.exp(twist)

        @jax.jit
        def _feat_fn(params, images):
            return self._feat_net.apply(
                {"params": params["feat"]}, _to_unit(images), train=False
            )

        @functools.partial(jax.jit, static_argnums=(2,))
        def _pose_seq_fn(params, frames, chunk):
            """(M+1, H, W, 3) device-resident frames -> (M, 4, 4) relative
            transforms, M a multiple of ``chunk``. Consecutive pairs are
            formed ON-DEVICE (each frame crosses the link once), batched
            through the odometry net via ``lax.map`` so peak activation
            memory stays at one chunk."""
            m = frames.shape[0] - 1
            shape = (m // chunk, chunk) + frames.shape[1:]
            a = jnp.reshape(frames[:-1], shape)
            b = jnp.reshape(frames[1:], shape)

            def body(ab):
                pairs = jnp.concatenate(
                    [_to_unit(ab[0]), _to_unit(ab[1])], axis=-1
                )
                twist = self._odom_net.apply(
                    {"params": params["odom"]}, pairs, train=False
                )
                return se3.exp(twist)

            return jnp.reshape(jax.lax.map(body, (a, b)), (m, 4, 4))

        self._depth_fn = _depth_fn
        self._pose_fn = _pose_fn
        self._feat_fn = _feat_fn
        self._pose_seq_fn = _pose_seq_fn

    # ---- constructors ----
    @classmethod
    def from_random(cls, config: ExperimentConfig | None = None, seed: int = 0) -> "DepthVO":
        config = config or full_feat()
        state = create_state(config, jax.random.PRNGKey(seed))
        return cls(config, state.params, state.batch_stats)

    @classmethod
    def from_checkpoint(cls, directory: str, config: ExperimentConfig | None = None) -> "DepthVO":
        from depthvo_tpu.io import checkpoint as ckpt_io

        if config is None:
            # The train loop / import-caffemodel save the experiment
            # config next to the weights; prefer it so a checkpoint of
            # ANY variant/resolution restores correctly without the
            # caller re-specifying the architecture.
            cfg_path = os.path.join(directory, "config.json")
            if os.path.isfile(cfg_path):
                from depthvo_tpu.configs import base as config_io

                config = config_io.load_json(cfg_path)
            else:
                config = full_feat()
        state = create_state(config, jax.random.PRNGKey(0))
        state = ckpt_io.restore_weights(directory, state)
        return cls(config, state.params, state.batch_stats)

    # ---- placement ----
    def to_mesh(self, mesh) -> "DepthVO":
        """Replicate weights over a ``jax.sharding.Mesh`` for data-parallel
        batched inference (the eval analog of training's DP: batch sharded
        on 'data', params replicated, zero code in the forward — XLA
        partitions the jitted programs). Pass the mesh to
        ``eval.runner.predict_depths(..., mesh=...)`` or shard inputs with
        ``parallel.mesh.shard_batch``. Returns self."""
        from depthvo_tpu.parallel import mesh as pmesh

        repl = pmesh.replicated(mesh)
        self.params = jax.device_put(self.params, repl)
        self.batch_stats = jax.device_put(self.batch_stats, repl)
        if getattr(self, "quant", None) is not None:
            self.quant = jax.device_put(self.quant, repl)
        return self

    # ---- quantized serving ----
    def calibrate_int8(self, images: np.ndarray) -> "DepthVO":
        """Switch depth inference to w8a8 int8 convolutions.

        Runs one f32 calibration pass over ``images`` (representative
        frames, raw uint8 or [-1,1] float) recording per-conv activation
        scales into the ``quant`` collection, then replaces the depth
        forward with the int8 program (per-output-channel int8 weights,
        static per-tensor int8 activations, int32 MXU accumulation — 2x
        the bf16 MXU rate on v5e). Repeated calls accumulate the running
        max over additional batches. The 1-channel disp heads and
        BatchNorm stay full precision. Returns self.

        Accuracy is a deployment tradeoff exactly like the serving-head
        knobs (PERF.md): validate on your eval protocol; `depth()`/
        `inverse_depth()`/eval sweeps all use the quantized program after
        this call."""
        from depthvo_tpu.train.state import build_models as _bm

        depth_cal, _, _ = _bm(self.config, depth_quant="calibrate")
        variables = {
            "params": self.params["depth"],
            "batch_stats": self.batch_stats,
        }
        if getattr(self, "quant", None) is not None:
            variables["quant"] = self.quant
        _, mutated = depth_cal.apply(
            variables, _to_unit(_as_batch(images)), train=False,
            mutable=["quant"],
        )
        self.quant = mutated["quant"]
        bad = [
            "/".join(map(str, path))
            for path, v in jax.tree_util.tree_flatten_with_path(
                self.quant
            )[0]
            if not float(v) > 0
        ]
        if bad:
            raise ValueError(
                "calibrate_int8: calibration recorded zero activation "
                f"scales at {bad} — the calibration images never reached "
                "those convs (all-zero input?)"
            )

        depth_q, _, _ = _bm(self.config, depth_quant="int8")

        @jax.jit
        def _depth_q_fn(params, batch_stats, quant, images):
            variables = {
                "params": params["depth"],
                "batch_stats": batch_stats,
                "quant": quant,
            }
            disps = depth_q.apply(variables, _to_unit(images), train=False)
            return disps[-1]

        # Keep the 3-arg _depth_fn contract (depth()/eval runners).
        self._depth_fn_f32 = getattr(
            self, "_depth_fn_f32", self._depth_fn
        )
        self._depth_fn = lambda p, b, im: _depth_q_fn(p, b, self.quant, im)
        return self

    def uncalibrate(self) -> "DepthVO":
        """Undo :meth:`calibrate_int8`: restore the f32/bf16 depth
        forward and drop the recorded scales. Returns self."""
        if getattr(self, "_depth_fn_f32", None) is not None:
            self._depth_fn = self._depth_fn_f32
        self.quant = None
        return self

    # ---- inference ----
    def depth(self, images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) in [-1,1] (or raw uint8) -> (B, H, W) metric depth
        (1/disparity)."""
        disp = self._depth_fn(self.params, self.batch_stats, _as_batch(images))
        return np.asarray(1.0 / disp[..., 0])

    def inverse_depth(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(
            self._depth_fn(self.params, self.batch_stats, _as_batch(images))[..., 0]
        )

    def pose(self, pairs: np.ndarray) -> np.ndarray:
        """(B, H, W, 6) frame pairs -> (B, 4, 4) relative transforms
        (target-cam -> source-cam coordinate transforms)."""
        _, T = self._pose_fn(self.params, _as_batch(pairs))
        return np.asarray(T)

    def pose_sequence(self, frames: np.ndarray, chunk: int = 16) -> np.ndarray:
        """(N, H, W, 3) consecutive frames -> (N-1, 4, 4) relative
        transforms, pairing frames ON-DEVICE.

        The reference loops per frame pair through pycaffe (SURVEY.md
        §3.3 hot loop); this stages the whole sequence to the device in
        one transfer (pass uint8 frames: 8x fewer link bytes than f32
        pairs) and runs one XLA program that maps the odometry net over
        ``chunk``-sized batches. The trailing partial chunk is padded by
        repeating the last frame and trimmed after the fetch.
        """
        n = frames.shape[0]
        if n < 2:
            return np.zeros((0, 4, 4), np.float32)
        m = n - 1
        pad = (-m) % chunk
        if pad:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], pad, axis=0)]
            )
        T = self._pose_seq_fn(self.params, _as_batch(frames), chunk)
        return np.asarray(T[:m])

    def features(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._feat_fn(self.params, _as_batch(images)))


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
