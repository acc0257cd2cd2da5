"""Velodyne -> gt-depth generation + Eigen prep pipeline (SURVEY.md §3.2:
the reference's eval gt is "KITTI raw velodyne-derived"). Synthetic scans
with hand-invertible calib verify the projection protocol exactly; the
end-to-end test runs prep-eigen on a fixture raw tree and then the full
eval-depth path on its output."""

import os

import numpy as np
import pytest
from PIL import Image

from depthvo_tpu.data import velodyne as vl

# Hand-pickable calib: velodyne (x fwd, y left, z up) -> camera
# (x right, y down, z fwd) axis permutation, small lever arm.
R_VELO2CAM = np.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0]])
T_VELO2CAM = np.array([0.05, -0.08, -0.27])
FX, FY, CX, CY = 100.0, 90.0, 64.0, 20.0
H, W = 40, 128


def _cam_point_for_pixel(pu: int, pv: int, z: float) -> np.ndarray:
    """Camera-frame point projecting EXACTLY to protocol pixel (pu, pv).

    The protocol computes round(u) - 1, so target u = pu + 1 exactly.
    """
    X = (pu + 1 - CX) * z / FX
    Y = (pv + 1 - CY) * z / FY
    return np.array([X, Y, z])


def _velo_from_cam(cam_pts: np.ndarray) -> np.ndarray:
    """Invert the velo->cam extrinsics; append reflectance column."""
    velo = (cam_pts - T_VELO2CAM) @ R_VELO2CAM  # R^-1 = R^T for rotation
    return np.concatenate(
        [velo, np.ones((len(velo), 1))], axis=1
    ).astype(np.float32)


def _projection() -> np.ndarray:
    cam2cam = {
        "R_rect_00": np.eye(3).reshape(-1),
        "P_rect_02": np.array(
            [[FX, 0, CX, 0], [0, FY, CY, 0], [0, 0, 1, 0]]
        ).reshape(-1),
    }
    T = np.eye(4)
    T[:3, :3] = R_VELO2CAM
    T[:3, 3] = T_VELO2CAM
    return vl.velo_to_image_projection(cam2cam, T)


class TestDepthMapFromVelo:
    def test_known_points_land_on_pixels(self):
        targets = [(10, 5, 7.0), (100, 30, 23.5), (64, 20, 4.25)]
        cam = np.stack([_cam_point_for_pixel(*t) for t in targets])
        depth = vl.depth_map_from_velo(_velo_from_cam(cam), _projection(), (H, W))
        for pu, pv, z in targets:
            assert depth[pv, pu] == pytest.approx(z, rel=1e-5)
        # Exactly the 3 target pixels are populated.
        assert int((depth > 0).sum()) == 3

    def test_duplicate_pixel_keeps_nearest(self):
        cam = np.stack(
            [_cam_point_for_pixel(50, 15, z) for z in (31.0, 6.0, 18.0)]
        )
        depth = vl.depth_map_from_velo(_velo_from_cam(cam), _projection(), (H, W))
        assert depth[15, 50] == pytest.approx(6.0, rel=1e-5)

    def test_behind_sensor_dropped(self):
        cam = _cam_point_for_pixel(50, 15, 5.0)[None]
        velo = _velo_from_cam(cam)
        velo[:, 0] *= -1  # flip to behind the sensor (velo x < 0)
        depth = vl.depth_map_from_velo(velo, _projection(), (H, W))
        assert not (depth > 0).any()

    def test_out_of_image_dropped(self):
        cam = np.stack(
            [
                _cam_point_for_pixel(W + 40, 15, 5.0),
                _cam_point_for_pixel(50, -8, 5.0),
            ]
        )
        depth = vl.depth_map_from_velo(_velo_from_cam(cam), _projection(), (H, W))
        assert not (depth > 0).any()


class TestSplitParsing:
    def test_both_formats(self, tmp_path):
        from depthvo_tpu.data.eigen import parse_split_file

        p1 = tmp_path / "paths.txt"
        p1.write_text(
            "2011_09_26/2011_09_26_drive_0002_sync/image_02/data/0000000069.png "
            "2011_09_26/2011_09_26_drive_0002_sync/image_03/data/0000000069.png\n"
        )
        assert parse_split_file(str(p1)) == [
            ("2011_09_26_drive_0002_sync", 69)
        ]
        p2 = tmp_path / "fields.txt"
        p2.write_text("2011_09_26/2011_09_26_drive_0002_sync 0000000069 l\n")
        assert parse_split_file(str(p2)) == [
            ("2011_09_26_drive_0002_sync", 69)
        ]


@pytest.fixture(scope="module")
def raw_tree_with_velo(tmp_path_factory):
    """Raw KITTI fixture: images + velodyne scans + both calib files."""
    root = str(tmp_path_factory.mktemp("kitti_velo"))
    date = "2011_09_26"
    drive = "2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(0)
    ddir = os.path.join(root, date, drive)
    for i in range(3):
        for cam_dir in ("image_02",):
            path = os.path.join(ddir, cam_dir, "data", f"{i:010d}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            ).save(path)
        # Scan: a grid of points 4..30 m covering central pixels.
        targets = [
            (pu, pv, 4.0 + (pu + pv) % 26)
            for pu in range(8, W - 8, 8)
            for pv in range(8, H - 4, 4)
        ]
        cam = np.stack([_cam_point_for_pixel(*t) for t in targets])
        velo = _velo_from_cam(cam)
        vpath = os.path.join(ddir, "velodyne_points", "data", f"{i:010d}.bin")
        os.makedirs(os.path.dirname(vpath), exist_ok=True)
        velo.astype(np.float32).tofile(vpath)
    P = f"{FX} 0.0 {CX} 0.0 0.0 {FY} {CY} 0.0 0.0 0.0 1.0 0.0"
    with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {P}\n")
    with open(os.path.join(root, date, "calib_velo_to_cam.txt"), "w") as f:
        f.write("R: " + " ".join(str(x) for x in R_VELO2CAM.reshape(-1)) + "\n")
        f.write("T: " + " ".join(str(x) for x in T_VELO2CAM) + "\n")
    return root, drive


class TestPrepEigenEndToEnd:
    def test_generate_gt_depth(self, raw_tree_with_velo):
        root, drive = raw_tree_with_velo
        depth = vl.generate_gt_depth(root, drive, 0)
        assert depth.shape == (H, W)
        assert (depth > 0).sum() > 50
        assert 4.0 <= depth[depth > 0].min() <= depth.max() <= 30.0

    def test_prep_then_eval_depth_runs_from_raw_tree(
        self, raw_tree_with_velo, tmp_path
    ):
        """The round-1 gap: eval-depth required pre-made gt .npy files.
        Now: prep-eigen generates them from velodyne, and eval-depth runs
        off its list with a random model, producing finite metrics."""
        from depthvo_tpu.data.eigen import prep_eigen
        from depthvo_tpu.eval.runner import run_depth_eval

        root, drive = raw_tree_with_velo
        out = str(tmp_path / "eigen")
        n, list_path = prep_eigen(root, out, scenes=[drive])
        assert n == 3
        assert os.path.isfile(list_path)

        with pytest.warns(UserWarning, match="NON-CANONICAL"):
            metrics = run_depth_eval(
                checkpoint_dir=None,
                kitti_root=root,
                split_file=list_path,
                height=32,
                width=96,
            )
        for k in ("abs_rel", "rmse", "a1"):
            assert np.isfinite(metrics[k])
        # Provenance (VERDICT r2 item 9): the derived split is flagged.
        assert metrics["split"]["n_frames"] == 3
        assert metrics["split"]["canonical"] is False
        assert metrics["split"]["source"] == "derived-scene-list"

    def test_prep_eigen_cli(self, raw_tree_with_velo, tmp_path):
        from depthvo_tpu import cli

        root, drive = raw_tree_with_velo
        out = str(tmp_path / "eigen_cli")
        rc = cli.main([
            "prep-eigen", "--kitti-root", root, "--output-dir", out,
            "--scenes", drive,
        ])
        assert rc == 0
        lines = open(os.path.join(out, "eigen_list.txt")).read().splitlines()
        assert lines[0] == "# split-source: derived-scene-list"
        lines = [l for l in lines if not l.startswith("#")]
        assert len(lines) == 3
        img_rel, gt_abs = lines[0].split()
        assert os.path.isfile(os.path.join(root, img_rel))
        gt = np.load(gt_abs)
        assert gt.shape == (H, W)
