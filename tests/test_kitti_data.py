"""Tests for the KITTI readers over synthetic fixture trees (the standard
KITTI directory layouts, tiny images) — exercising list building, calib
parsing, intrinsics scaling, pairing, and the end-to-end odometry eval
runner (SURVEY.md §3.3/§3.4)."""

import os

import numpy as np
import pytest
from PIL import Image

from depthvo_tpu.data import kitti


def _write_png(path, h=40, w=128, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_raw"))
    date = "2011_09_26"
    drive = "2011_09_26_drive_0001_sync"
    for cam in ("image_02", "image_03"):
        for i in range(5):
            _write_png(
                os.path.join(root, date, drive, cam, "data", f"{i:010d}.png"),
                seed=i,
            )
    # Minimal calib_cam_to_cam.txt with P_rect_02.
    P = "7.2e+02 0.0 6.0e+02 0.0 0.0 7.2e+02 1.8e+02 0.0 0.0 0.0 1.0 0.0"
    with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write("calib_time: 09-Jan-2012 13:57:47\n")
        f.write(f"P_rect_02: {P}\n")
    return root, drive


@pytest.fixture(scope="module")
def odom_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_odom"))
    seq = "09"
    n = 12
    for i in range(n):
        for cam in ("image_2", "image_3"):
            _write_png(
                os.path.join(root, "sequences", seq, cam, f"{i:06d}.png"),
                seed=(100 if cam == "image_2" else 500) + i,
            )
    with open(os.path.join(root, "sequences", seq, "calib.txt"), "w") as f:
        f.write("P0: 7.1e+02 0.0 6.0e+02 0.0 0.0 7.1e+02 1.8e+02 0.0 0.0 0.0 1.0 0.0\n")
        f.write("P2: 7.2e+02 0.0 6.1e+02 0.0 0.0 7.3e+02 1.9e+02 0.0 0.0 0.0 1.0 0.0\n")
        # P3: right color cam, t_x = -fx * baseline (0.54 m at fx=720).
        f.write("P3: 7.2e+02 0.0 6.1e+02 -3.888e+02 0.0 7.3e+02 1.9e+02 0.0 0.0 0.0 1.0 0.0\n")
    # Ground truth: straight line, 0.8 m forward per frame.
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    with open(os.path.join(root, "poses", seq + ".txt"), "w") as f:
        for i in range(n):
            T = np.eye(4)[:3, :4].copy()
            T[2, 3] = 0.8 * i
            f.write(" ".join(str(x) for x in T.reshape(-1)) + "\n")
    return root, seq


class TestRawStereo:
    def test_sample_list_and_shapes(self, raw_tree):
        root, drive = raw_tree
        ds = kitti.KittiRawStereo(root, [drive], height=16, width=48)
        assert len(ds) == 4  # 5 frames -> 4 temporal pairs
        sample = ds.get(0)
        assert sample["image_t"].shape == (16, 48, 3)
        assert sample["image_r"].shape == (16, 48, 3)
        assert sample["image_s"].shape == (16, 48, 3)
        assert sample["K"].shape == (3, 3)
        assert -1.0 <= sample["image_t"].min() <= sample["image_t"].max() <= 1.0

    def test_intrinsics_scaled_to_output(self, raw_tree):
        """No S_rect in calib: the native size comes from frame 0's
        header (fixture PNGs are 128x40), never a hardcoded 1242x375."""
        root, drive = raw_tree
        ds = kitti.KittiRawStereo(root, [drive], height=16, width=48)
        K = ds.samples[0][3]
        assert K[0, 0] == pytest.approx(720.0 * 48 / 128, rel=1e-5)
        assert K[1, 1] == pytest.approx(720.0 * 16 / 40, rel=1e-5)
        assert K[2, 2] == 1.0

    def test_intrinsics_prefer_calib_rect_size(self, raw_tree, tmp_path):
        """With S_rect_02 recorded, the calib size wins over the header."""
        import shutil

        root, drive = raw_tree
        root2 = str(tmp_path / "raw2")
        shutil.copytree(root, root2)
        calib = os.path.join(root2, "2011_09_26", "calib_cam_to_cam.txt")
        with open(calib, "a") as f:
            f.write("S_rect_02: 1.242000e+03 3.750000e+02\n")
        ds = kitti.KittiRawStereo(root2, [drive], height=16, width=48)
        K = ds.samples[0][3]
        assert K[0, 0] == pytest.approx(720.0 * 48 / 1242, rel=1e-5)
        assert K[1, 1] == pytest.approx(720.0 * 16 / 375, rel=1e-5)

    def test_per_drive_native_sizes(self, raw_tree):
        """Drives with different native resolutions (e.g. the real
        1226x370 2011_09_28+ campaigns) get per-drive scaled K — the
        round-1 hardcoded orig_size bug (ADVICE.md)."""
        root, drive = raw_tree
        date = "2011_09_28"
        drive2 = "2011_09_28_drive_0001_sync"
        for cam in ("image_02", "image_03"):
            for i in range(2):
                _write_png(
                    os.path.join(root, date, drive2, cam, "data", f"{i:010d}.png"),
                    h=370, w=1226, seed=i,
                )
        with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
            f.write(
                "P_rect_02: 7.2e+02 0.0 6.0e+02 0.0 "
                "0.0 7.2e+02 1.8e+02 0.0 0.0 0.0 1.0 0.0\n"
            )
        ds = kitti.KittiRawStereo(root, [drive, drive2], height=16, width=48)
        K1 = ds.samples[0][3]       # 128x40 drive
        K2 = ds.samples[-1][3]      # 1226x370 drive
        assert K1[0, 0] == pytest.approx(720.0 * 48 / 128, rel=1e-5)
        assert K2[0, 0] == pytest.approx(720.0 * 48 / 1226, rel=1e-5)
        assert K2[1, 1] == pytest.approx(720.0 * 16 / 370, rel=1e-5)

    def test_iterator_batches(self, raw_tree):
        root, drive = raw_tree
        ds = kitti.KittiRawStereo(root, [drive], height=16, width=48)
        it = ds.iterator(batch_size=2, shuffle=True, seed=1)
        batch = next(it)
        assert batch["image_t"].shape == (2, 16, 48, 3)
        assert batch["K"].shape == (2, 3, 3)

    def test_missing_drive_skipped(self, raw_tree):
        root, drive = raw_tree
        ds = kitti.KittiRawStereo(root, [drive, "2011_09_26_drive_9999_sync"], 16, 48)
        assert len(ds) == 4


class TestOdometrySequence:
    def test_frames_calib_poses(self, odom_tree):
        root, seq = odom_tree
        s = kitti.KittiOdometrySequence(root, seq, height=16, width=48)
        assert len(s) == 12
        assert s.frame(0).shape == (16, 48, 3)
        # Native size read from frame 0's header (fixture PNGs 128x40).
        assert s.K[0, 0] == pytest.approx(720.0 * 48 / 128, rel=1e-4)
        assert s.gt_poses.shape == (12, 4, 4)
        np.testing.assert_allclose(s.gt_poses[3][2, 3], 2.4)

    def test_pair_iterator(self, odom_tree):
        root, seq = odom_tree
        s = kitti.KittiOdometrySequence(root, seq, height=16, width=48)
        batches = list(s.pair_iterator(batch_size=4))
        total = sum(len(b) for b in batches)
        assert total == 11  # N-1 pairs
        assert batches[0].shape == (4, 16, 48, 6)
        # First pair is frames (0, 1): channels 0-3 match frame 0.
        np.testing.assert_allclose(batches[0][0][..., :3], s.frame(0), atol=1e-6)
        np.testing.assert_allclose(batches[0][0][..., 3:], s.frame(1), atol=1e-6)


class TestOdomStereoTraining:
    """The reference's VO training data: stereo+temporal triples from
    odometry sequences 00-08 (SURVEY.md §3.4/§6) — the round-1 gap where
    KittiOdometrySequence was eval-only."""

    def test_triples_and_contract(self, odom_tree):
        root, seq = odom_tree
        ds = kitti.KittiOdomStereo(root, [seq], height=16, width=48)
        assert len(ds) == 11  # 12 frames -> 11 temporal pairs
        s = ds.get(0)
        assert s["image_t"].shape == (16, 48, 3)
        assert s["image_r"].shape == (16, 48, 3)
        assert s["image_s"].shape == (16, 48, 3)
        # image_r really is the other camera (different fixture seed).
        assert np.abs(s["image_t"] - s["image_r"]).max() > 0.1

    def test_intrinsics_and_baseline_from_calib(self, odom_tree):
        root, seq = odom_tree
        ds = kitti.KittiOdomStereo(root, [seq], height=16, width=48)
        K = ds.samples[0][3]
        # P2 fx=720 scaled by 48/128 (fixture PNG width).
        assert K[0, 0] == pytest.approx(720.0 * 48 / 128, rel=1e-5)
        # Baseline from P3's -fx*b offset: 388.8 / 720 = 0.54 m.
        assert ds.baselines[seq] == pytest.approx(0.54, rel=1e-4)

    def test_missing_sequence_skipped(self, odom_tree):
        root, seq = odom_tree
        ds = kitti.KittiOdomStereo(root, [seq, "77"], height=16, width=48)
        assert len(ds) == 11

    def test_per_sample_baseline_in_batch_contract(self, odom_tree):
        """VERDICT r2 item 2: the computed baseline is CONSUMED — every
        sample and every batch carries it."""
        root, seq = odom_tree
        ds = kitti.KittiOdomStereo(root, [seq], height=16, width=48)
        s = ds.get(0)
        assert s["baseline"] == pytest.approx(0.54, rel=1e-4)
        batch = next(ds.iterator(batch_size=3, shuffle=False, native_ring=False))
        assert batch["baseline"].shape == (3,)
        np.testing.assert_allclose(batch["baseline"], 0.54, rtol=1e-4)

    def test_nonstandard_baseline_sequence(self, tmp_path):
        """A 0.50 m rig (P3 x-offset = -fx*0.50, plus a nonzero P2
        offset that must be differenced out) produces b=0.50 samples."""
        root = str(tmp_path / "odom050")
        seq = "05"
        for i in range(3):
            for cam in ("image_2", "image_3"):
                _write_png(
                    os.path.join(root, "sequences", seq, cam, f"{i:06d}.png"),
                    seed=i,
                )
        fx = 720.0
        with open(os.path.join(root, "sequences", seq, "calib.txt"), "w") as f:
            # P2 with its own small x-offset t_x = -0.06 m -> P2[0,3] = 43.2.
            f.write(f"P2: {fx} 0.0 6.1e+02 43.2 0.0 {fx} 1.9e+02 0.0 0.0 0.0 1.0 0.0\n")
            # P3 at t_x = +0.44 m from cam0 -> baseline 0.50 from cam2.
            f.write(f"P3: {fx} 0.0 6.1e+02 {43.2 - fx * 0.50} 0.0 {fx} 1.9e+02 0.0 0.0 0.0 1.0 0.0\n")
        ds = kitti.KittiOdomStereo(root, [seq], height=16, width=48)
        assert ds.baselines[seq] == pytest.approx(0.50, rel=1e-5)
        assert ds.get(0)["baseline"] == pytest.approx(0.50, rel=1e-5)

    def test_train_list_roundtrip(self, odom_tree, tmp_path):
        from depthvo_tpu.data.kitti import load_train_list, write_train_list

        root, seq = odom_tree
        ds = kitti.KittiOdomStereo(root, [seq], height=16, width=48)
        path = str(tmp_path / "odom_list.txt")
        n = write_train_list(ds, path, root)
        assert n == 11
        ds2 = load_train_list(root, path, height=16, width=48)
        a, b = ds.get(3), ds2.get(3)
        for k in ("image_t", "image_r", "image_s"):
            np.testing.assert_array_equal(a[k], b[k])
        np.testing.assert_allclose(a["K"], b["K"], rtol=1e-5)
        # v2 list round-trips the per-sample baseline.
        assert b["baseline"] == pytest.approx(a["baseline"], rel=1e-5)

    def test_v1_list_backcompat(self, odom_tree, tmp_path):
        """A 7-column (v1, no baseline) list still loads; baseline falls
        back to the KITTI nominal 0.54."""
        from depthvo_tpu.data.kitti import load_train_list, write_train_list

        root, seq = odom_tree
        ds = kitti.KittiOdomStereo(root, [seq], height=16, width=48)
        v2 = str(tmp_path / "v2.txt")
        write_train_list(ds, v2, root)
        v1 = str(tmp_path / "v1.txt")
        with open(v2) as fin, open(v1, "w") as fout:
            for line in fin:
                fout.write(" ".join(line.split()[:7]) + "\n")
        ds1 = load_train_list(root, v1, height=16, width=48)
        assert len(ds1) == len(ds)
        assert ds1.get(0)["baseline"] == pytest.approx(0.54)

    def test_prep_cli_odom(self, odom_tree, tmp_path):
        from depthvo_tpu import cli

        root, seq = odom_tree
        out = str(tmp_path / "odom_list.txt")
        rc = cli.main([
            "prep", "--odom-root", root, "--sequences", seq,
            "--height", "16", "--width", "48", "--output", out,
        ])
        assert rc == 0
        assert len(open(out).read().splitlines()) == 11


class TestOdometryEvalRunner:
    def test_end_to_end_random_model(self, odom_tree, tmp_path):
        """Full eval path on the fixture sequence with a random model:
        trajectory composed, pose file written, metrics + ATE computed."""
        from depthvo_tpu import configs
        from depthvo_tpu.eval.runner import run_odometry_eval

        root, seq = odom_tree
        out = str(tmp_path / "odom")
        metrics = run_odometry_eval(
            checkpoint_dir=None, kitti_odom_root=root, sequence=seq,
            output_dir=out, height=32, width=96,
        )
        assert metrics["frames"] == 12
        assert np.isfinite(metrics["ate_m"])
        poses = np.loadtxt(os.path.join(out, f"{seq}.txt"))
        assert poses.shape == (12, 12)


class TestTrainList:
    def test_write_and_load_roundtrip(self, raw_tree, tmp_path):
        from depthvo_tpu.data.kitti import write_train_list, load_train_list

        root, drive = raw_tree
        ds = kitti.KittiRawStereo(root, [drive], height=16, width=48)
        list_path = str(tmp_path / "train.txt")
        n = write_train_list(ds, list_path, root)
        assert n == len(ds) == 4

        ds2 = load_train_list(root, list_path, height=16, width=48)
        assert len(ds2) == len(ds)
        a, b = ds.get(0), ds2.get(0)
        for k in ("image_t", "image_r", "image_s"):
            np.testing.assert_array_equal(a[k], b[k])
        np.testing.assert_allclose(a["K"], b["K"], rtol=1e-5)

    def test_prep_cli(self, raw_tree, tmp_path):
        from depthvo_tpu import cli

        root, drive = raw_tree
        out = str(tmp_path / "list.txt")
        rc = cli.main([
            "prep", "--kitti-root", root, "--drives", drive,
            "--height", "16", "--width", "48", "--output", out,
        ])
        assert rc == 0
        assert len(open(out).read().splitlines()) == 4


class TestNativeDecodePath:
    def test_load_image_uses_native_when_available(self, raw_tree):
        """load_image must produce identical output whether the native
        decoder kicked in or not (golden equivalence is separately tested
        in test_native_loader; here we check the dispatch wiring)."""
        from depthvo_tpu.data import native_loader

        root, drive = raw_tree
        ds = kitti.KittiRawStereo(root, [drive], height=16, width=48)
        img = ds.get(0)["image_t"]
        assert img.shape == (16, 48, 3)
        if native_loader.available():
            path = ds.samples[0][0]
            native = native_loader.load_resized(path, 16, 48)
            np.testing.assert_allclose(img, native, atol=1e-6)


def test_prep_eigen_train_excludes_test_scenes(tmp_path):
    """prep --eigen-train drops Eigen TEST scenes from discovered drives
    (split hygiene: training must never see the eval scenes)."""
    from depthvo_tpu import cli

    root = str(tmp_path / "raw")
    date = "2011_09_26"
    drives = ("2011_09_26_drive_0001_sync",   # train scene
              "2011_09_26_drive_0002_sync")   # Eigen TEST scene
    for drive in drives:
        for cam in ("image_02", "image_03"):
            for i in range(3):
                _write_png(
                    os.path.join(root, date, drive, cam, "data",
                                 f"{i:010d}.png"),
                    seed=i,
                )
    P = "7.2e+02 0.0 6.0e+02 0.0 0.0 7.2e+02 1.8e+02 0.0 0.0 0.0 1.0 0.0"
    with open(os.path.join(root, date, "calib_cam_to_cam.txt"), "w") as f:
        f.write(f"P_rect_02: {P}\n")
    out = str(tmp_path / "list.txt")
    rc = cli.main([
        "prep", "--kitti-root", root, "--height", "16", "--width", "48",
        "--output", out, "--eigen-train",
    ])
    assert rc == 0
    body = open(out).read()
    assert "drive_0001" in body and "drive_0002" not in body


def test_prefetch_propagates_producer_errors():
    """A decode error in the producer thread must re-raise in the
    consumer, not masquerade as clean end-of-iteration."""
    import pytest

    from depthvo_tpu.data.pipeline import prefetch_to_device

    def bad_iter():
        yield {"x": np.ones((2, 2), np.float32)}
        raise RuntimeError("corrupt PNG")

    it = prefetch_to_device(bad_iter(), shard_fn=lambda b, m: b)
    next(it)
    with pytest.raises(RuntimeError, match="producer thread failed"):
        next(it)


def test_prefetch_consumer_abandon_stops_producer():
    import threading
    import time as _time

    from depthvo_tpu.data.pipeline import prefetch_to_device

    produced = []

    def slow_iter():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.full((1,), i, np.float32)}

    before = threading.active_count()
    it = prefetch_to_device(slow_iter(), buffer_size=1,
                            shard_fn=lambda b, m: b)
    next(it)
    it.close()  # abandon
    _time.sleep(1.5)
    assert threading.active_count() <= before + 1
    assert len(produced) < 10  # producer stopped, not drained 1000


def test_tiny_dataset_errors_instead_of_spinning(tmp_path, raw_tree):
    import pytest

    from depthvo_tpu.data import kitti

    root, drive = raw_tree
    ds = kitti.KittiRawStereo(root, [drive], height=16, width=48)
    with pytest.raises(ValueError, match="< batch_size"):
        next(ds.iterator(batch_size=len(ds) + 1))
