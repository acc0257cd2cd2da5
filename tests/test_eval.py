"""Tests for the eval suites: metric closed forms, pose-convention locks
(SURVEY.md §7 hard parts: trajectory composition conventions), and the
KITTI devkit metric logic on synthetic trajectories."""

import numpy as np
import pytest

from depthvo_tpu.eval.depth_metrics import compute_depth_metrics, eigen_crop_mask
from depthvo_tpu.eval.odometry import (
    align_scale,
    ate,
    compose_trajectory,
    kitti_odometry_errors,
    write_kitti_poses,
)
from depthvo_tpu.geometry import se3
import jax.numpy as jnp


class TestDepthMetrics:
    def test_perfect_prediction_zero_error(self, rng):
        gt = rng.uniform(1.0, 60.0, size=(4, 50, 100)).astype(np.float32)
        m = compute_depth_metrics(list(gt), list(gt))
        assert m["abs_rel"] == pytest.approx(0.0, abs=1e-7)
        assert m["rmse"] == pytest.approx(0.0, abs=1e-5)
        assert m["a1"] == 1.0

    def test_constant_scale_error_with_median_scaling_vanishes(self, rng):
        gt = rng.uniform(1.0, 60.0, size=(2, 50, 100)).astype(np.float32)
        preds = [0.5 * g for g in gt]  # scale error only
        m = compute_depth_metrics(preds, list(gt), median_scale=True)
        assert m["abs_rel"] == pytest.approx(0.0, abs=1e-6)

    def test_known_relative_error(self):
        gt = np.full((1, 60, 120), 10.0, np.float32)
        pred = np.full((1, 60, 120), 11.0, np.float32)
        m = compute_depth_metrics([pred[0]], [gt[0]], median_scale=False)
        assert m["abs_rel"] == pytest.approx(0.1, abs=1e-6)
        assert m["rmse"] == pytest.approx(1.0, abs=1e-5)
        assert m["a1"] == 1.0  # 1.1 < 1.25

    def test_depth_cap_excludes_far_points(self):
        gt = np.full((1, 60, 120), 100.0, np.float32)
        gt[0, 30:, :] = 10.0
        pred = np.full((1, 60, 120), 10.0, np.float32)
        # 100m points excluded by the 80m cap -> perfect on the rest
        m = compute_depth_metrics([pred[0]], [gt[0]], max_depth=80.0, median_scale=False)
        assert m["abs_rel"] == pytest.approx(0.0, abs=1e-6)

    def test_garg_crop_region(self):
        mask = eigen_crop_mask(375, 1242)
        assert mask[200, 600]
        assert not mask[100, 600]  # above crop (sky region)
        assert not mask[200, 10]  # left margin


class TestTrajectory:
    def _straight_line_transforms(self, n, step=1.0):
        """Camera moves forward +z by `step` per frame. Coordinate transform
        frame t -> t+1: points shift by -step in z... wait: source cam is
        `step` ahead, so X_{t+1} = X_t - step*z. Twist v=(0,0,-step)."""
        T = np.eye(4, dtype=np.float64)
        T[2, 3] = -step
        return np.tile(T, (n, 1, 1))

    def test_compose_straight_line(self):
        rel = self._straight_line_transforms(10)
        poses = compose_trajectory(rel)
        assert poses.shape == (11, 4, 4)
        # cam-to-world: camera k at z = +k
        np.testing.assert_allclose(poses[10][:3, 3], [0, 0, 10.0], atol=1e-9)

    def test_compose_matches_se3_exp_convention(self):
        """Lock the convention: compose_trajectory(exp(twist)) with twist
        predicting 'points move by -v' gives camera motion +v."""
        twist = jnp.array([[0.0, 0.0, -0.5, 0.0, 0.0, 0.0]] * 4)
        rel = np.asarray(se3.exp(twist))
        poses = compose_trajectory(rel)
        np.testing.assert_allclose(poses[-1][:3, 3], [0, 0, 2.0], atol=1e-5)

    def test_ate_zero_for_identical(self):
        rel = self._straight_line_transforms(20)
        poses = compose_trajectory(rel)
        assert ate(poses, poses) == pytest.approx(0.0, abs=1e-9)

    def test_ate_scale_alignment(self):
        rel = self._straight_line_transforms(20)
        poses = compose_trajectory(rel)
        scaled = poses.copy()
        scaled[:, :3, 3] *= 0.5  # half-scale trajectory
        assert ate(scaled, poses, scale_align=True) == pytest.approx(0.0, abs=1e-9)
        assert ate(scaled, poses, scale_align=False) > 1.0

    def test_align_scale(self):
        rel = self._straight_line_transforms(20)
        poses = compose_trajectory(rel)
        scaled = poses.copy()
        scaled[:, :3, 3] *= 0.25
        assert align_scale(scaled, poses) == pytest.approx(4.0, rel=1e-6)

    def test_kitti_errors_zero_for_perfect(self):
        rel = self._straight_line_transforms(300, step=2.0)  # 600 m path
        poses = compose_trajectory(rel)
        m = kitti_odometry_errors(poses, poses, lengths=(100, 200), step=10)
        assert m["t_err_pct"] == pytest.approx(0.0, abs=1e-9)
        assert m["r_err_deg_per_100m"] == pytest.approx(0.0, abs=1e-9)

    def test_kitti_errors_detect_drift(self):
        rel = self._straight_line_transforms(300, step=2.0)
        gt = compose_trajectory(rel)
        # Predicted trajectory drifts: 1% longer steps.
        rel_bad = self._straight_line_transforms(300, step=2.02)
        pred = compose_trajectory(rel_bad)
        m = kitti_odometry_errors(pred, gt, lengths=(100, 200), step=10)
        assert m["t_err_pct"] == pytest.approx(1.0, rel=0.1)

    def test_write_kitti_poses_roundtrip(self, tmp_path):
        rel = self._straight_line_transforms(5)
        poses = compose_trajectory(rel)
        path = str(tmp_path / "poses.txt")
        write_kitti_poses(poses, path)
        raw = np.loadtxt(path).reshape(-1, 3, 4)
        np.testing.assert_allclose(raw, poses[:, :3, :4], rtol=1e-6)


class TestSnippetATE:
    def test_perfect_prediction_zero(self):
        from depthvo_tpu.eval.odometry import snippet_ate

        T = np.eye(4)
        T[2, 3] = -1.0
        rel = np.tile(T, (30, 1, 1))
        poses = compose_trajectory(rel)
        m = snippet_ate(poses, poses)
        assert m["snippet_ate_mean"] == pytest.approx(0.0, abs=1e-9)
        assert m["snippets"] == 27

    def test_detects_local_error(self):
        from depthvo_tpu.eval.odometry import snippet_ate

        T = np.eye(4)
        T[2, 3] = -1.0
        rel = np.tile(T, (30, 1, 1))
        gt = compose_trajectory(rel)
        pred = gt.copy()
        pred[10, 0, 3] += 0.5  # lateral kick at frame 10
        m = snippet_ate(pred, gt)
        assert m["snippet_ate_mean"] > 0.005
        # Only snippets containing frame 10 are affected; global shape ok.
        assert m["snippet_ate_mean"] < 0.2

    def test_sfmlearner_formula_exact(self):
        """Hand-computed check of SfMLearner's compute_ate: offset to gt
        at frame 0, least-squares scale, sqrt(SUM err^2)/N (not RMSE)."""
        from depthvo_tpu.eval.odometry import _sfmlearner_compute_ate

        gt = np.zeros((5, 3))
        gt[:, 2] = np.arange(5.0)
        # pred = 2x gt + constant offset: offset+scale alignment -> 0.
        pred = 2.0 * gt + np.array([3.0, -1.0, 7.0])
        assert _sfmlearner_compute_ate(gt, pred) == pytest.approx(0.0, abs=1e-9)

        # Known residual: after offset, pred=[0,0,0],[0,0,1]; gt z=[0,2].
        gt2 = np.array([[0.0, 0, 0], [0, 0, 2.0]])
        pred2 = np.array([[1.0, 0, 0], [1.0, 0, 1.0]])
        # offset -> [[0,0,0],[0,0,1]]; scale = (g.p)/(p.p) = 2/1 = 2;
        # err = [0, 0]; sqrt(0)/2 = 0.
        assert _sfmlearner_compute_ate(gt2, pred2) == pytest.approx(0.0, abs=1e-9)
        # Orthogonal error scale can't fix: pred along x, gt along z.
        gt3 = np.array([[0.0, 0, 0], [0, 0, 1.0]])
        pred3 = np.array([[0.0, 0, 0], [1.0, 0, 0]])
        # scale = 0 -> err = gt3 -> sqrt(1)/2 = 0.5
        assert _sfmlearner_compute_ate(gt3, pred3) == pytest.approx(0.5, abs=1e-9)

    def test_no_rotation_alignment(self):
        """A pure-rotation misalignment must penalize snippet_ate (the
        SfMLearner protocol does NOT rotate) while the Umeyama variant
        absorbs it — the round-1 bug conflated the two (ADVICE.md)."""
        from depthvo_tpu.eval.odometry import snippet_ate, snippet_ate_umeyama

        T = np.eye(4)
        T[2, 3] = -1.0
        rel = np.tile(T, (20, 1, 1))
        gt = compose_trajectory(rel)
        # Rotate the whole predicted trajectory 90 deg about y.
        R = np.array([[0.0, 0, 1], [0, 1, 0], [-1, 0, 0]])
        Rot = np.eye(4)
        Rot[:3, :3] = R
        pred = Rot[None] @ gt
        m_sfm = snippet_ate(pred, gt)
        m_ume = snippet_ate_umeyama(pred, gt)
        assert m_sfm["snippet_ate_mean"] > 0.1
        assert m_ume["snippet_ate_umeyama_mean"] == pytest.approx(0.0, abs=1e-9)


class TestPoseFileEval:
    """eval-odom --pose-file: the devkit phase alone over an existing
    KITTI-format pose file (reference two-phase eval_odom, SURVEY §3.3)."""

    def _curved_poses(self, n=40, step=2.0):
        # A gently curving trajectory so devkit segments exist.
        poses = [np.eye(4)]
        T = np.eye(4)
        for i in range(n):
            d = np.eye(4)
            ang = 0.01
            d[0, 0] = d[2, 2] = np.cos(ang)
            d[0, 2] = np.sin(ang)
            d[2, 0] = -np.sin(ang)
            d[2, 3] = step
            T = T @ d
            poses.append(T.copy())
        return np.asarray(poses)

    def test_read_write_round_trip(self, tmp_path):
        from depthvo_tpu.eval.odometry import read_kitti_poses

        poses = self._curved_poses(12)
        path = tmp_path / "09.txt"
        write_kitti_poses(poses, str(path))
        back = read_kitti_poses(str(path))
        np.testing.assert_allclose(back, poses, rtol=0, atol=1e-7)

    def test_read_rejects_wrong_width(self, tmp_path):
        from depthvo_tpu.eval.odometry import read_kitti_poses

        p = tmp_path / "bad.txt"
        p.write_text("1 2 3 4\n")
        with pytest.raises(ValueError, match="12 values"):
            read_kitti_poses(str(p))

    def test_pose_file_eval_scores_against_gt(self, tmp_path):
        from depthvo_tpu.eval.runner import run_odometry_eval

        gt = self._curved_poses(80, step=2.0)
        root = tmp_path / "odom"
        (root / "poses").mkdir(parents=True)
        write_kitti_poses(gt, str(root / "poses" / "09.txt"))

        # Perfect file -> zero errors.
        pred_path = tmp_path / "pred.txt"
        write_kitti_poses(gt, str(pred_path))
        out = run_odometry_eval(
            checkpoint_dir=None, kitti_odom_root=str(root),
            sequence="09", output_dir=str(tmp_path / "plots"),
            pose_file=str(pred_path),
        )
        assert out["frames"] == 80 + 1
        assert out["ate_m"] == pytest.approx(0.0, abs=1e-9)
        assert out["pose_file"].endswith("pred.txt")
        assert (tmp_path / "plots" / "09.png").is_file()

        # Perturbed file -> positive errors.
        noisy = gt.copy()
        noisy[:, 0, 3] += np.linspace(0, 3.0, len(gt))
        write_kitti_poses(noisy, str(pred_path))
        out2 = run_odometry_eval(
            checkpoint_dir=None, kitti_odom_root=str(root),
            sequence="09", output_dir=None, pose_file=str(pred_path),
        )
        assert out2["ate_m"] > 0.05

    def test_pose_file_length_mismatch_raises(self, tmp_path):
        from depthvo_tpu.eval.runner import run_odometry_eval

        gt = self._curved_poses(20)
        root = tmp_path / "odom"
        (root / "poses").mkdir(parents=True)
        write_kitti_poses(gt, str(root / "poses" / "10.txt"))
        pred_path = tmp_path / "pred.txt"
        write_kitti_poses(gt[:-3], str(pred_path))
        with pytest.raises(ValueError, match="ground"):
            run_odometry_eval(
                checkpoint_dir=None, kitti_odom_root=str(root),
                sequence="10", output_dir=None, pose_file=str(pred_path),
            )
