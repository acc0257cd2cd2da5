"""Quantify the general-warp kernel's vertical-window coverage.

The Pallas candidate-row kernel (ops/warp_pallas.py) only reaches source
rows within ``pad_v`` of the output tile, masking samples with larger
vertical displacement as invalid. These tests pin the documented coverage
claims (configs/base.py::ExperimentConfig.warp_pad_v) on KITTI-scale
synthetic scenes, exercising the exact shipped mask (``window_mask``):

* default pad_v=16 drops 0.00% of otherwise-valid (in-bounds, in-front)
  pixels at ego-motion up to 1.6 m/frame (58 km/h at 10 Hz capture) —
  including scenes with 4-10 m obstacles;
* at an extreme 2.4 m/frame (86 km/h) with close obstacles the drop stays
  under 1%, and pad_v=24 recovers it to 0.00%.

The geometric reason pad 16 suffices far beyond a naive |dv|<=15 reading:
large vertical flow concentrates at close range, i.e. near the bottom
image edge, where the per-tile window is edge-clamped upward and the
offending samples mostly leave the image entirely (already invalid).
"""

import jax
import jax.numpy as jnp
import numpy as np

from depthvo_tpu.geometry import se3, warp as ref_warp
from depthvo_tpu.ops import warp_pallas

H, W = 160, 608
FX, FY, CX, CY = 353.0, 308.0, 304.0, 80.0  # KITTI raw scaled to 608x160
CAM_HEIGHT = 1.65
K = jnp.asarray([[[FX, 0.0, CX], [0.0, FY, CY], [0.0, 0.0, 1.0]]])


def _ground_plane_depth() -> np.ndarray:
    ys = np.arange(H, dtype=np.float32)
    z = np.where(ys > CY + 1, FY * CAM_HEIGHT / np.maximum(ys - CY, 1e-3), 1e4)
    z = np.clip(z, 3.0, 80.0)
    depth = np.tile(z[:, None], (1, W))
    depth[: int(CY)] = 25.0  # sky / far structure above the horizon
    return depth


def _with_obstacles(depth: np.ndarray, rng) -> np.ndarray:
    """Ground-anchored boxes 4-10 m deep (parked cars, poles)."""
    depth = depth.copy()
    for _ in range(12):
        z = rng.uniform(4.0, 10.0)
        v_base = int(np.clip(CY + FY * CAM_HEIGHT / z, 0, H - 1))
        h_px = int(FY * rng.uniform(0.8, 1.8) / z)
        u0 = rng.integers(0, W - 80)
        w_px = int(FX * rng.uniform(0.5, 2.0) / z)
        depth[max(0, v_base - h_px) : v_base, u0 : u0 + w_px] = z
    return depth


def _drop_fraction(depth: np.ndarray, fwd_m: float, pad_v: int, yaw: float = 0.0):
    """Fraction of in-bounds/in-front samples the window mask invalidates."""
    d = jnp.asarray(depth[None])
    T = se3.exp(jnp.asarray([[0.0, 0.0, fwd_m, 0.0, yaw, 0.0]]))
    coords, front = ref_warp.warp_coords(d, T, K)
    u, v = coords[..., 0], coords[..., 1]
    u0, v0 = jnp.floor(u), jnp.floor(v)
    in_b = (
        (u0 >= 0) & (u0 + 1 <= W - 1) & (v0 >= 0) & (v0 + 1 <= H - 1) & front
    )
    wok = warp_pallas.window_mask(u, v, H, W, pad_v)
    return float(jnp.sum(in_b & ~wok) / jnp.maximum(jnp.sum(in_b), 1))


class TestWindowCoverage:
    def test_default_pad_covers_normal_motion(self):
        depth = _ground_plane_depth()
        for fwd in (0.4, 0.8, 1.6):
            for yaw in (0.0, 0.02):
                assert _drop_fraction(depth, fwd, pad_v=16, yaw=yaw) == 0.0

    def test_default_pad_covers_close_obstacles(self, rng):
        depth = _with_obstacles(_ground_plane_depth(), rng)
        assert _drop_fraction(depth, 1.6, pad_v=16) == 0.0

    def test_extreme_motion_drop_bounded_and_recoverable(self, rng):
        depth = _with_obstacles(_ground_plane_depth(), rng)
        drop16 = _drop_fraction(depth, 2.4, pad_v=16)
        assert drop16 < 0.01  # under 1% even at 86 km/h with 4 m obstacles
        assert _drop_fraction(depth, 2.4, pad_v=24) == 0.0

    def test_mask_is_live(self, rng):
        """Sanity: a too-small pad DOES drop pixels (the mask is not
        vacuously true), so the zero-drop assertions above are meaningful."""
        depth = _with_obstacles(_ground_plane_depth(), rng)
        assert _drop_fraction(depth, 2.4, pad_v=8) > 0.05


class TestFrozenWarpPadPlumbing:
    def test_pad_v_validation(self):
        from depthvo_tpu.ops import frozen_warp

        src = jnp.zeros((1, 16, 128, 1))
        depth = jnp.full((1, 16, 128), 10.0)
        T = jnp.eye(4)[None]
        k = jnp.asarray([[[74.0, 0, 64.0], [0, 16.0, 8.0], [0, 0, 1.0]]])
        try:
            frozen_warp(src, depth, T, k, use_pallas=True, pad_v=12)
        except ValueError as e:
            assert "multiple of 8" in str(e)
        else:  # pragma: no cover
            raise AssertionError("pad_v=12 should be rejected")

    def test_config_plumbs_pad_v(self):
        """compute_losses forwards config.warp_pad_v to the frozen warp.

        The loss graph runs the photometric region in the kernels' CHW
        layout, so the call under test is ``ops.frozen_warp_chw``."""
        import dataclasses
        from unittest import mock

        from depthvo_tpu import configs, ops
        from depthvo_tpu.train import loop as train_loop
        from depthvo_tpu.data.synthetic import SyntheticScenes
        from depthvo_tpu.train.state import build_models, create_state

        cfg = dataclasses.replace(configs.tiny_test(), warp_pad_v=32)
        state = create_state(cfg, jax.random.PRNGKey(0))
        batch = jax.tree.map(
            jnp.asarray, SyntheticScenes(cfg, seed=0, num_scenes=1).batch(2)
        )
        seen = []
        real = ops.frozen_warp_chw

        def spy(src, depth, T, k, use_pallas=None, pad_v=None):
            seen.append(pad_v)
            return real(src, depth, T, k, use_pallas=False, pad_v=pad_v)

        with mock.patch.object(ops, "frozen_warp_chw", side_effect=spy):
            train_loop.compute_losses(
                cfg, build_models(cfg), state.params, state.batch_stats,
                batch, train=False,
            )
        assert seen and all(p == 32 for p in seen)
